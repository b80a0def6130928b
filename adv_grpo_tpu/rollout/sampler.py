"""Jitted denoise rollout with stochastic training window + per-step logprobs.

TPU-native re-design of the reference's ``pipeline_with_logprob_random``
(adv_grpo/diffusers_patch/sd3_pipeline_with_logprob_fast.py:454-674):

  * the per-step Python loop becomes ONE ``lax.scan`` over a static schedule;
  * the stochastic window [random_timestep, random_timestep + train_num_steps)
    (reference :605-623) is expressed as a per-step noise-level scalar
    ``noise_level * (rt <= i < rt+T)`` — ``random_timestep`` is a TRACED scalar,
    so the per-rank randomisation (:585-587) never retraces;
  * CFG runs as one batched forward with [uncond ; cond] stacked on the batch
    axis (:625-642), uncond first;
  * every step's (input latent, output latent, logprob, timestep, sigma,
    sigma_prev) is recorded in the scan ys and the training window is extracted
    afterwards with ``dynamic_slice`` — static shapes end to end. Recording
    sigmas directly removes the scheduler's ``index_for_timestep`` search
    (sd3_sde_with_logprob.py:106-109) from the training path.

Returned latents window layout matches the reference contract
(:657-661): ``latents[:, j]`` is the window input at step j and
``latents[:, j+1]`` its output, for j in [0, train_num_steps).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from adv_grpo_tpu.core.scheduler import flow_match_schedule
from adv_grpo_tpu.core.sde import cps_step_with_logprob


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_steps: int = 10
    train_num_steps: int = 2
    guidance_scale: float = 4.5
    noise_level: float = 0.7
    shift: float = 3.0
    num_train_timesteps: int = 1000
    # Training re-forward only: run the CFG uncond/cond halves as TWO
    # sequential B-sized transformer calls instead of one 2B-batched call.
    # Same math (CFG halves are independent until the guidance combine,
    # reference sd3_pipeline_with_logprob_fast.py:625-642), but the remat
    # re-forward working set during the backward halves — the HBM lever that
    # composes with train.micro_splits to admit the richer remat tiers
    # (save_big) on 16GB v5e parts. Rollout keeps the batched form: under
    # lax.scan there is no autodiff, so the 2B batch is pure MXU win.
    cfg_sequential: bool = False

    @property
    def do_cfg(self) -> bool:
        return self.guidance_scale > 1.0


class RolloutResult(NamedTuple):
    final_latents: jax.Array  # (B, C, h, w) raw latents after the last step
    latents: jax.Array  # (B, T+1, C, h, w) training-window latents
    log_probs: jax.Array  # (B, T)
    timesteps: jax.Array  # (B, T)
    sigmas: jax.Array  # (B, T) sigma at each window step
    sigmas_prev: jax.Array  # (B, T)


def denoise_with_logprob(
    velocity_fn: Callable,
    latents: jax.Array,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    neg_prompt_embeds: Optional[jax.Array],
    neg_pooled_embeds: Optional[jax.Array],
    key: jax.Array,
    cfg: SamplerConfig,
    random_timestep=0,
    start_idx=0,
) -> RolloutResult:
    """Run the full denoise chain and extract the stochastic training window.

    velocity_fn(latents, timestep(B,), prompt_embeds, pooled) -> velocity; the
    caller closes over model params (and lora_scale). CFG batching happens here.
    """
    sched = flow_match_schedule(cfg.num_steps, shift=cfg.shift,
                                num_train_timesteps=cfg.num_train_timesteps)
    sigmas = jnp.asarray(sched.sigmas)  # (n+1,)
    timesteps = jnp.asarray(sched.timesteps)  # (n,)
    B = latents.shape[0]
    T = cfg.train_num_steps
    # random_timestep may be a scalar or a per-sample (B,) vector — the
    # reference seeds it per rank (sd3_..._fast.py:585-587); in SPMD the global
    # batch carries each rank-group's window position per sample.
    rt = jnp.broadcast_to(jnp.asarray(random_timestep, jnp.int32), (B,))

    if cfg.do_cfg:
        embeds = jnp.concatenate([neg_prompt_embeds, prompt_embeds], axis=0)
        pooled = jnp.concatenate([neg_pooled_embeds, pooled_embeds], axis=0)
    else:
        embeds, pooled = prompt_embeds, pooled_embeds

    start = jnp.asarray(start_idx, jnp.int32)

    def step(carry, i):
        x, k = carry
        t = timesteps[i]
        sig, sig_prev = sigmas[i], sigmas[i + 1]
        in_window = (i >= rt) & (i < rt + T)  # (B,)
        nl = jnp.where(in_window, cfg.noise_level, 0.0)  # per-sample

        def run_step(operands):
            x, k = operands
            if cfg.do_cfg:
                model_in = jnp.concatenate([x, x], axis=0)
                tvec = jnp.full((2 * B,), t)
            else:
                model_in = x
                tvec = jnp.full((B,), t)
            v = velocity_fn(model_in, tvec, embeds, pooled)
            if cfg.do_cfg:
                v_uncond, v_cond = jnp.split(v, 2, axis=0)
                v = v_uncond + cfg.guidance_scale * (v_cond - v_uncond)
            k2, sub = jax.random.split(k)
            noise = jax.random.normal(sub, x.shape, jnp.float32)
            out = cps_step_with_logprob(v, x, sig, sig_prev, nl, noise=noise)
            return out.prev_sample, out.log_prob, k2

        def skip_step(operands):
            # image-to-image entry (flux_to_sd3 distribution transfer,
            # reference sd3_..._fast.py:722-1081): steps before start_idx are
            # pass-through; lax.cond skips the model call at runtime.
            x, k = operands
            return x.astype(jnp.float32), jnp.zeros((B,), jnp.float32), k

        x_out, log_prob, k = jax.lax.cond(i >= start, run_step, skip_step, (x, k))
        ys = dict(x_in=x.astype(jnp.float32), x_out=x_out, log_prob=log_prob,
                  t=jnp.full((B,), t), sigma=jnp.full((B,), sig),
                  sigma_prev=jnp.full((B,), sig_prev))
        return (x_out, k), ys

    (final, _), ys = jax.lax.scan(step, (latents.astype(jnp.float32), key),
                                  jnp.arange(cfg.num_steps))

    if T == 0:
        empty = jnp.zeros((B, 0))
        return RolloutResult(final, jnp.zeros((B, 0) + final.shape[1:]),
                             empty, empty, empty, empty)

    steps_idx = rt[:, None] + jnp.arange(T)[None, :]  # (B, T)

    def window(arr):
        # (num_steps, B, ...) -> (B, T, ...) gathered at per-sample window steps
        a = jnp.moveaxis(arr, 0, 1)  # (B, num_steps, ...)
        idx = steps_idx.reshape(steps_idx.shape + (1,) * (a.ndim - 2))
        return jnp.take_along_axis(a, idx, axis=1)

    x_in_all = jnp.moveaxis(ys["x_in"], 0, 1)  # (B, num_steps, C, h, w)
    x_in0 = jnp.take_along_axis(
        x_in_all, rt.reshape(B, 1, 1, 1, 1), axis=1
    )  # (B, 1, C, h, w): window entry latent
    lat_window = jnp.concatenate([x_in0, window(ys["x_out"])], axis=1)
    return RolloutResult(
        final_latents=final,
        latents=lat_window,
        log_probs=window(ys["log_prob"]),
        timesteps=window(ys["t"]),
        sigmas=window(ys["sigma"]),
        sigmas_prev=window(ys["sigma_prev"]),
    )


def denoise_prefix(
    velocity_fn: Callable,
    latents: jax.Array,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    neg_prompt_embeds: Optional[jax.Array],
    neg_pooled_embeds: Optional[jax.Array],
    cfg: SamplerConfig,
    rt: int,
) -> jax.Array:
    """Deterministic schedule prefix: steps [0, rt) at REDUCED batch.

    The reference fast sampler keeps ONE latent per prompt until the
    stochastic window opens, then repeats it mini_num_image_per_prompt times
    (sd3_pipeline_with_logprob_fast.py:158-167) — the pre-window trajectory is
    identical across a group (noise level 0 there), so computing it once per
    group saves (1 - 1/mini) of the pre-window MMDiT forwards. ``rt`` is
    STATIC (one compile per distinct window start; there are only
    num_steps//2 + 1 of them).
    """
    if rt == 0:
        return latents.astype(jnp.float32)
    sched = flow_match_schedule(cfg.num_steps, shift=cfg.shift,
                                num_train_timesteps=cfg.num_train_timesteps)
    sigmas = jnp.asarray(sched.sigmas)
    timesteps = jnp.asarray(sched.timesteps)
    B = latents.shape[0]

    if cfg.do_cfg:
        embeds = jnp.concatenate([neg_prompt_embeds, prompt_embeds], axis=0)
        pooled = jnp.concatenate([neg_pooled_embeds, pooled_embeds], axis=0)
    else:
        embeds, pooled = prompt_embeds, pooled_embeds

    def step(x, i):
        t = timesteps[i]
        if cfg.do_cfg:
            v = velocity_fn(jnp.concatenate([x, x], axis=0),
                            jnp.full((2 * B,), t), embeds, pooled)
            v_uncond, v_cond = jnp.split(v, 2, axis=0)
            v = v_uncond + cfg.guidance_scale * (v_cond - v_uncond)
        else:
            v = velocity_fn(x, jnp.full((B,), t), embeds, pooled)
        out = cps_step_with_logprob(v, x, sigmas[i], sigmas[i + 1], 0.0,
                                    noise=jnp.zeros_like(x))
        return out.prev_sample, None

    x, _ = jax.lax.scan(step, latents.astype(jnp.float32), jnp.arange(rt))
    return x


def compute_log_prob(
    velocity_fn: Callable,
    latents_j: jax.Array,
    next_latents_j: jax.Array,
    t_j: jax.Array,
    sigma_j: jax.Array,
    sigma_prev_j: jax.Array,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    neg_prompt_embeds: Optional[jax.Array],
    neg_pooled_embeds: Optional[jax.Array],
    cfg: SamplerConfig,
):
    """Training-time re-forward of one window step under current params.

    Replays the recorded transition (prev_sample=next_latents) to score it —
    reference ``compute_log_prob`` (train_sd3_fast_pickscore.py:233-267).
    Returns (log_prob, prev_sample_mean, std_dev_t).
    """
    if cfg.do_cfg and cfg.cfg_sequential:
        # two sequential B-sized calls: identical per-sample math (no op in
        # the transformer mixes across the batch axis), half the live
        # activation working set in the backward re-forward
        v_uncond = velocity_fn(latents_j, t_j, neg_prompt_embeds,
                               neg_pooled_embeds)
        v_cond = velocity_fn(latents_j, t_j, prompt_embeds, pooled_embeds)
        v = v_uncond + cfg.guidance_scale * (v_cond - v_uncond)
    elif cfg.do_cfg:
        model_in = jnp.concatenate([latents_j, latents_j], axis=0)
        tvec = jnp.concatenate([t_j, t_j], axis=0)
        embeds = jnp.concatenate([neg_prompt_embeds, prompt_embeds], axis=0)
        pooled = jnp.concatenate([neg_pooled_embeds, pooled_embeds], axis=0)
        v = velocity_fn(model_in, tvec, embeds, pooled)
        v_uncond, v_cond = jnp.split(v, 2, axis=0)
        v = v_uncond + cfg.guidance_scale * (v_cond - v_uncond)
    else:
        v = velocity_fn(latents_j, t_j, prompt_embeds, pooled_embeds)
    out = cps_step_with_logprob(
        v, latents_j, sigma_j, sigma_prev_j, cfg.noise_level,
        prev_sample=next_latents_j,
    )
    return out.log_prob, out.prev_sample_mean, out.std_dev_t


def sample_random_timestep(key, cfg: SamplerConfig, shape=()):
    """Window start ~ U{0, num_steps//2} (reference sd3_..._fast.py:585-587,
    seeded per process; here keyed by the caller's folded PRNG key). Pass
    shape=(B,) for per-sample windows across an SPMD global batch."""
    return jax.random.randint(key, shape, 0, cfg.num_steps // 2 + 1)


def denoise_from_image(
    velocity_fn: Callable,
    encode_image_fn: Callable,
    images: jax.Array,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    neg_prompt_embeds: Optional[jax.Array],
    neg_pooled_embeds: Optional[jax.Array],
    key: jax.Array,
    cfg: SamplerConfig,
    start_idx: int,
    random_timestep=None,
) -> RolloutResult:
    """Distribution/style transfer: external image -> latent -> forward-noise at
    the schedule's ``start_idx`` -> stochastic-window denoise from there.

    Mirrors the reference ``flux_to_sd3_denoise[_random]``
    (sd3_pipeline_with_logprob_fast.py:722-1081): the reference image (e.g. a
    Qwen-Image/Flux sample) is VAE-encoded (:686-705 image_to_latent), noised
    with the flow-matching forward at sigma[start_idx]:
        x = (1 - sigma) * x0 + sigma * noise   (:766-767)
    then denoised by the windowed sampler starting at that step.
    """
    sched = flow_match_schedule(cfg.num_steps, shift=cfg.shift,
                                num_train_timesteps=cfg.num_train_timesteps)
    k_enc, k_noise, k_roll = jax.random.split(key, 3)
    x0 = encode_image_fn(images, k_enc)
    sigma0 = jnp.float32(sched.sigmas[int(start_idx)])
    noise = jax.random.normal(k_noise, x0.shape, jnp.float32)
    latents = (1.0 - sigma0) * x0.astype(jnp.float32) + sigma0 * noise
    rt = start_idx if random_timestep is None else random_timestep
    return denoise_with_logprob(
        velocity_fn, latents, prompt_embeds, pooled_embeds, neg_prompt_embeds,
        neg_pooled_embeds, k_roll, cfg, random_timestep=rt, start_idx=start_idx)
