"""Flux / Flux-Kontext denoise rollouts with per-step log-probabilities.

TPU re-design of the reference Flux pipelines
(adv_grpo/diffusers_patch/flux_pipeline_with_logprob.py and
flux_kontext_pipeline_with_logprob.py): packed 2x2 latent tokens, resolution-
dependent dynamic timestep shifting (``calculate_shift``, reference :9-19),
every step stochastic through the ORIGINAL Flow-SDE step (reference imports
``sde_step_with_logprob``, :7), optional conditioning latents concatenated
along the sequence axis each step (Kontext, reference kontext :209-211).

The model is injected as ``velocity_fn(packed_latents, t_vec, cond_latents)``;
Flux's guidance is an embedded model input, not a CFG batch, so no uncond
branch exists here.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.core.sde import flow_sde_step_with_logprob


def calculate_shift(image_seq_len: int, base_seq_len: int = 256,
                    max_seq_len: int = 4096, base_shift: float = 0.5,
                    max_shift: float = 1.15) -> float:
    """mu for dynamic timestep shifting (reference flux_...logprob.py:9-19)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def flux_schedule(num_steps: int, image_seq_len: int,
                  num_train_timesteps: int = 1000):
    """Dynamic-shift sigma schedule: sigmas = linspace(1, 1/n, n) time-shifted
    by exp(mu) (diffusers time_shift with FluxPipeline's explicit sigmas)."""
    mu = calculate_shift(image_seq_len)
    base = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    e = math.exp(mu)
    sigmas = e / (e + (1.0 / base - 1.0))
    timesteps = (sigmas * num_train_timesteps).astype(np.float32)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return sigmas, timesteps


def pack_latents(latents: jax.Array) -> jax.Array:
    """(B, C, H, W) -> (B, H/2 * W/2, 4C) Flux token packing."""
    B, C, H, W = latents.shape
    x = latents.reshape(B, C, H // 2, 2, W // 2, 2)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(B, (H // 2) * (W // 2), C * 4)


def unpack_latents(tokens: jax.Array, height: int, width: int) -> jax.Array:
    B, S, D = tokens.shape
    C = D // 4
    x = tokens.reshape(B, height // 2, width // 2, C, 2, 2)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(B, C, height, width)


@dataclasses.dataclass(frozen=True)
class FluxSamplerConfig:
    num_steps: int = 28
    noise_level: float = 0.7
    num_train_timesteps: int = 1000


class FluxRolloutResult(NamedTuple):
    final_latents: jax.Array  # packed (B, S, D)
    all_latents: jax.Array  # (B, num_steps+1, S, D)
    log_probs: jax.Array  # (B, num_steps)
    timesteps: jax.Array  # (B, num_steps)


def flux_denoise_with_logprob(
    velocity_fn: Callable,
    packed_latents: jax.Array,
    key: jax.Array,
    cfg: FluxSamplerConfig,
    cond_latents: Optional[jax.Array] = None,
) -> FluxRolloutResult:
    """Full-SDE rollout: EVERY step stochastic, all latents/logprobs returned
    (reference flux loop :141-187). ``cond_latents`` (packed) enables the
    Kontext editing mode: concatenated along seq for the model call, the
    velocity slice for the sample tokens is used for the step (kontext
    reference :209-211)."""
    S = packed_latents.shape[1]
    sigmas_np, timesteps_np = flux_schedule(
        cfg.num_steps, S, cfg.num_train_timesteps)
    sigmas = jnp.asarray(sigmas_np)
    timesteps = jnp.asarray(timesteps_np)
    sigma_at_one = float(sigmas_np[1])
    B = packed_latents.shape[0]

    def step(carry, i):
        x, k = carry
        t = timesteps[i]
        model_in = x if cond_latents is None else jnp.concatenate(
            [x, cond_latents.astype(x.dtype)], axis=1)
        v = velocity_fn(model_in, jnp.full((B,), t))
        v = v[:, :S]
        k, sub = jax.random.split(k)
        out = flow_sde_step_with_logprob(
            v, x, sigmas[i], sigmas[i + 1], cfg.noise_level,
            sigma_at_one=sigma_at_one,
            noise=jax.random.normal(sub, x.shape, jnp.float32))
        ys = dict(x=out.prev_sample, lp=out.log_prob, t=jnp.full((B,), t))
        return (out.prev_sample, k), ys

    (final, _), ys = jax.lax.scan(
        step, (packed_latents.astype(jnp.float32), key), jnp.arange(cfg.num_steps))
    all_lat = jnp.concatenate(
        [packed_latents.astype(jnp.float32)[:, None],
         jnp.moveaxis(ys["x"], 0, 1)], axis=1)
    return FluxRolloutResult(final, all_lat, jnp.moveaxis(ys["lp"], 0, 1),
                             jnp.moveaxis(ys["t"], 0, 1))


def flux_denoise_window_with_logprob(
    velocity_fn: Callable,
    packed_latents: jax.Array,
    key: jax.Array,
    num_steps: int,
    train_num_steps: int,
    noise_level: float,
    rt,
    num_train_timesteps: int = 1000,
):
    """GRPO-trainable full-SDE rollout: every step stochastic (the reference
    flux loop, flux_pipeline_with_logprob.py:141-187), with the training
    window [rt, rt+T) extracted per sample.

    Unlike SD3's fast sampler (deterministic outside the window,
    rollout/sampler.py), Flux's lineage trains on the full-SDE trajectory —
    here ALL transitions are recorded (the packed-token trajectory is tiny:
    (B, n+1, S, 4C) fp32) and the window is gathered afterwards, so ``rt``
    can be a traced per-sample (B,) array exactly like the SD3 path.

    Returns a rollout.sampler.RolloutResult (the driver's training
    contract): latents (B, T+1, S, D), log_probs/timesteps/sigmas/
    sigmas_prev (B, T), final_latents (B, S, D).
    """
    from adv_grpo_tpu.rollout.sampler import RolloutResult

    B, S = packed_latents.shape[:2]
    T = int(train_num_steps)
    sigmas_np, timesteps_np = flux_schedule(num_steps, S, num_train_timesteps)
    sigmas = jnp.asarray(sigmas_np)
    timesteps = jnp.asarray(timesteps_np)
    sigma_at_one = float(sigmas_np[1])

    def step(carry, i):
        x, k = carry
        t = timesteps[i]
        v = velocity_fn(x, jnp.full((B,), t))
        k, sub = jax.random.split(k)
        out = flow_sde_step_with_logprob(
            v, x, sigmas[i], sigmas[i + 1], noise_level,
            sigma_at_one=sigma_at_one,
            noise=jax.random.normal(sub, x.shape, jnp.float32))
        ys = dict(x=out.prev_sample, lp=out.log_prob)
        return (out.prev_sample, k), ys

    (final, _), ys = jax.lax.scan(
        step, (packed_latents.astype(jnp.float32), key),
        jnp.arange(num_steps))
    all_lat = jnp.concatenate(
        [packed_latents.astype(jnp.float32)[:, None],
         jnp.moveaxis(ys["x"], 0, 1)], axis=1)  # (B, n+1, S, D)
    lps = jnp.moveaxis(ys["lp"], 0, 1)  # (B, n)

    rt = jnp.broadcast_to(jnp.asarray(rt, jnp.int32), (B,))
    w = rt[:, None] + jnp.arange(T)[None, :]  # (B, T)
    w_lat = rt[:, None] + jnp.arange(T + 1)[None, :]  # (B, T+1)
    lat_w = jnp.take_along_axis(all_lat, w_lat[:, :, None, None], axis=1)
    return RolloutResult(
        final_latents=final,
        latents=lat_w,
        log_probs=jnp.take_along_axis(lps, w, axis=1),
        timesteps=timesteps[w],
        sigmas=sigmas[w],
        sigmas_prev=sigmas[w + 1],
    )


def compute_flux_log_prob(velocity_fn, latents_j, next_latents_j, t_j,
                          sigma_j, sigma_prev_j, prompt_embeds, pooled_embeds,
                          neg_prompt_embeds, neg_pooled_embeds, cfg):
    """Training-side log-prob replay for one window step (the Flux analogue
    of rollout.sampler.compute_log_prob; reference imports the same
    sde_step_with_logprob for train-time replay). Flux has no CFG batch —
    guidance is an embedded input — so the negative embeddings are unused.
    ``sigma_at_one`` is re-derived from the schedule the rollout recorded
    (a trace-time constant of (num_steps, S)).

    Returns (log_prob, prev_sample_mean, std_dev_t).
    """
    del neg_prompt_embeds, neg_pooled_embeds
    S = latents_j.shape[1]
    sigmas_np, _ = flux_schedule(cfg.num_steps, S)
    v = velocity_fn(latents_j, t_j, prompt_embeds, pooled_embeds)
    out = flow_sde_step_with_logprob(
        v, latents_j, sigma_j, sigma_prev_j, cfg.noise_level,
        sigma_at_one=float(sigmas_np[1]), prev_sample=next_latents_j)
    return out.log_prob, out.prev_sample_mean, out.std_dev_t
