"""GRPO clipped-ratio policy loss and training diagnostics.

Pure-function re-derivation of the inner-loop math of the reference trainers
(scripts/train_sd3_fast_pickscore.py:1106-1156): advantage clamping, importance
ratio, PPO-style clip, optional mean-matching KL to the adapter-disabled reference
policy, and the logged diagnostics (approx_kl, clipfrac and its one-sided splits).

Everything here is jit-safe and differentiable w.r.t. ``log_prob`` (and the KL
means); it composes into the pjitted train step in adv_grpo_tpu/train.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class GRPOLossResult(NamedTuple):
    loss: jax.Array  # scalar: policy_loss + beta * kl_loss
    policy_loss: jax.Array  # scalar
    kl_loss: jax.Array  # scalar (0 when beta == 0)
    approx_kl: jax.Array  # 0.5 * mean((lp - lp_old)^2)
    clipfrac: jax.Array  # mean(|ratio - 1| > clip_range)
    clipfrac_gt_one: jax.Array  # mean(ratio - 1 > clip_range)
    clipfrac_lt_one: jax.Array  # mean(1 - ratio > clip_range)
    ratio: jax.Array  # (B,) for debugging / tests


def grpo_loss(
    log_prob: jax.Array,
    old_log_prob: jax.Array,
    advantages: jax.Array,
    *,
    clip_range: float,
    adv_clip_max: float,
    beta: float = 0.0,
    prev_sample_mean: Optional[jax.Array] = None,
    prev_sample_mean_ref: Optional[jax.Array] = None,
) -> GRPOLossResult:
    """Clipped-ratio GRPO objective for one timestep minibatch.

    Matches reference train_sd3_fast_pickscore.py:
      advantages clamped to [-adv_clip_max, adv_clip_max]      (:1106-1110)
      ratio = exp(log_prob - old_log_prob)                     (:1111)
      loss = mean(max(-A*ratio, -A*clip(ratio, 1-eps, 1+eps))) (:1112-1119)
      kl_loss = mean(mean_{chw}((mean - mean_ref)^2))  [beta>0] (:1121-1125)

    ``advantages`` and log-probs are (B,); the means (if given) are (B, ...) latents.
    """
    lp = log_prob.astype(jnp.float32)
    lp_old = jax.lax.stop_gradient(old_log_prob).astype(jnp.float32)
    adv = jax.lax.stop_gradient(advantages).astype(jnp.float32)
    adv = jnp.clip(adv, -adv_clip_max, adv_clip_max)

    # ratio = exp(lp - lp_old), but computed via expm1: with clip_range ~1e-5 the
    # signal lives in ratio's deviation from 1, and XLA's vectorised f32 exp has
    # ~4e-6 relative error near 1.0 — expm1 is exact to f32 ulp near zero.
    ratio = 1.0 + jnp.expm1(lp - lp_old)
    unclipped = -adv * ratio
    clipped = -adv * jnp.clip(ratio, 1.0 - clip_range, 1.0 + clip_range)
    policy_loss = jnp.mean(jnp.maximum(unclipped, clipped))

    if beta > 0.0:
        if prev_sample_mean is None or prev_sample_mean_ref is None:
            raise ValueError("beta > 0 requires prev_sample_mean and prev_sample_mean_ref")
        per_sample = jnp.mean(
            (prev_sample_mean.astype(jnp.float32)
             - jax.lax.stop_gradient(prev_sample_mean_ref).astype(jnp.float32)) ** 2,
            axis=tuple(range(1, prev_sample_mean.ndim)),
        )
        kl_loss = jnp.mean(per_sample)
        loss = policy_loss + beta * kl_loss
    else:
        kl_loss = jnp.float32(0.0)
        loss = policy_loss

    approx_kl = 0.5 * jnp.mean((lp - lp_old) ** 2)
    clipfrac = jnp.mean((jnp.abs(ratio - 1.0) > clip_range).astype(jnp.float32))
    clipfrac_gt = jnp.mean((ratio - 1.0 > clip_range).astype(jnp.float32))
    clipfrac_lt = jnp.mean((1.0 - ratio > clip_range).astype(jnp.float32))
    return GRPOLossResult(
        loss, policy_loss, kl_loss, approx_kl, clipfrac, clipfrac_gt, clipfrac_lt, ratio
    )


def group_advantages(
    rewards: jax.Array,
    group_ids: jax.Array,
    num_groups: int,
    *,
    global_std: bool = False,
    eps: float = 1e-4,
) -> jax.Array:
    """Device-side GRPO advantages via segment ops (jit-safe stat-tracker core).

    Equivalent to PerPromptStatTracker.update(type='grpo') for the single-epoch case
    (reference stat_tracking.py:40-47): per-group mean, per-group (or global)
    population std + eps, advantage = (r - mean)/std. ``group_ids`` maps each reward
    to its prompt group in [0, num_groups).

    This is the fast path used inside the pjitted advantage computation; the
    host-side :class:`~adv_grpo_tpu.core.stat_tracking.PerPromptStatTracker` retains
    the reference's full cross-epoch-history and rwr/sft/dpo semantics.
    """
    r = rewards.astype(jnp.float32)
    ones = jnp.ones_like(r)
    counts = jax.ops.segment_sum(ones, group_ids, num_segments=num_groups)
    counts = jnp.maximum(counts, 1.0)
    means = jax.ops.segment_sum(r, group_ids, num_segments=num_groups) / counts
    centered = r - means[group_ids]
    if global_std:
        std = jnp.std(r) + eps
        return centered / std
    var = jax.ops.segment_sum(centered**2, group_ids, num_segments=num_groups) / counts
    std = jnp.sqrt(var) + eps
    return centered / std[group_ids]
