"""WAN text-to-video RL rollout with per-step logprobs and reference-policy KL.

TPU re-design of adv_grpo/diffusers_patch/wan_pipeline_with_logprob.py:85-373:
5-D video latents denoised over a UniPC-style sigma schedule with the WAN SDE
step, optional per-step KL against the adapter-disabled reference policy
(reference :311-341: ``transformer.disable_adapter()`` -> here
``velocity_fn(..., lora_scale=0.0)``), returning (video latents, all latents,
logprobs, per-step KL).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.core.sde import wan_sde_step_with_logprob


def wan_schedule(num_steps: int, shift: float = 3.0,
                 num_train_timesteps: int = 1000):
    """UniPC flow-sigma schedule, exactly as diffusers UniPCMultistepScheduler
    .set_timesteps derives it with ``use_flow_sigmas=True`` (the WAN
    checkpoints' scheduler, reference wan_pipeline_with_logprob.py:229):

        alphas  = linspace(1, 1/T, N+1)
        sigmas  = flip(shift*(1-alphas) / (1 + (shift-1)*(1-alphas)))[:-1]
        t_i     = int(sigmas_i * T)          (int64 truncation -> model input)
        sigmas += [0.0]                      (final_sigmas_type='zero' default)

    Note the (1 - 1/T) factor baked into the base linspace and the integer
    timestep truncation — both are what pretrained WAN weights saw."""
    alphas = np.linspace(1.0, 1.0 / num_train_timesteps, num_steps + 1,
                         dtype=np.float64)
    base = 1.0 - alphas
    sigmas = np.flip(shift * base / (1.0 + (shift - 1.0) * base))[:-1]
    timesteps = np.floor(sigmas * num_train_timesteps).astype(np.float32)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return sigmas, timesteps


@dataclasses.dataclass(frozen=True)
class WanSamplerConfig:
    num_steps: int = 50
    shift: float = 3.0
    deterministic: bool = False
    kl_reward: float = 0.0  # > 0 enables per-step KL vs the reference policy
    num_train_timesteps: int = 1000


class WanRolloutResult(NamedTuple):
    final_latents: jax.Array  # (B, C, F, H, W)
    all_latents: jax.Array  # (B, num_steps+1, C, F, H, W)
    log_probs: jax.Array  # (B, num_steps)
    kl: jax.Array  # (B, num_steps), zeros when kl_reward == 0


def wan_denoise_with_logprob(
    velocity_fn: Callable,  # (latents, t_vec, lora_scale) -> velocity
    latents: jax.Array,
    key: jax.Array,
    cfg: WanSamplerConfig,
) -> WanRolloutResult:
    sigmas_np, timesteps_np = wan_schedule(cfg.num_steps, cfg.shift,
                                           cfg.num_train_timesteps)
    sigmas = jnp.asarray(sigmas_np)
    timesteps = jnp.asarray(timesteps_np)
    # reference sde_step reads sigma_min = sigmas[-1] (the APPENDED terminal
    # 0.0 under final_sigmas_type='zero') and sigma_max = sigmas[1]
    # (wan_pipeline_with_logprob.py:47-48), so std_dev_t = sigma_max * sigma
    sigma_min = float(sigmas_np[-1])
    sigma_max = float(sigmas_np[1])
    B = latents.shape[0]

    def step(carry, i):
        x, k = carry
        t = jnp.full((B,), timesteps[i])
        v = velocity_fn(x, t, 1.0)
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        out = wan_sde_step_with_logprob(
            v, x, sigmas[i], sigmas[i + 1], sigma_min=sigma_min,
            sigma_max=sigma_max, noise=noise, deterministic=cfg.deterministic)
        if cfg.kl_reward > 0:
            v_ref = jax.lax.stop_gradient(velocity_fn(x, t, 0.0))
            ref = wan_sde_step_with_logprob(
                v_ref, x, sigmas[i], sigmas[i + 1], sigma_min=sigma_min,
                sigma_max=sigma_max, prev_sample=out.prev_sample)
            kl = jnp.mean(
                (out.prev_sample_mean - ref.prev_sample_mean) ** 2
                / (2.0 * out.std_dev_t**2),
                axis=tuple(range(1, x.ndim)))
        else:
            kl = jnp.zeros((B,))
        ys = dict(x=out.prev_sample, lp=out.log_prob, kl=kl)
        return (out.prev_sample, k), ys

    (final, _), ys = jax.lax.scan(
        step, (latents.astype(jnp.float32), key), jnp.arange(cfg.num_steps))
    all_lat = jnp.concatenate(
        [latents.astype(jnp.float32)[:, None], jnp.moveaxis(ys["x"], 0, 1)], axis=1)
    return WanRolloutResult(final, all_lat, jnp.moveaxis(ys["lp"], 0, 1),
                            jnp.moveaxis(ys["kl"], 0, 1))


class WanWindowResult(NamedTuple):
    """Driver-contract window rollout (same field names as
    rollout.sampler.RolloutResult, plus the per-step KL vector)."""

    final_latents: jax.Array  # (B, C, F, H, W)
    latents: jax.Array  # (B, T+1, C, F, H, W)
    log_probs: jax.Array  # (B, T)
    timesteps: jax.Array  # (B, T)
    sigmas: jax.Array  # (B, T)
    sigmas_prev: jax.Array  # (B, T)
    kl: jax.Array  # (B, T) — zeros when kl_reward == 0


def wan_denoise_window_with_logprob(
    velocity_fn: Callable,  # (latents, t_vec, lora_scale) -> velocity
    latents: jax.Array,
    key: jax.Array,
    cfg: WanSamplerConfig,
    train_num_steps: int,
    rt,
):
    """GRPO-trainable WAN rollout: the full stochastic trajectory (reference
    wan_pipeline_with_logprob.py:229-341 — every step stochastic) with the
    training window [rt, rt+T) gathered per sample, exactly like the Flux
    window rollout. ``rt`` may be a traced (B,) array or a scalar."""
    sigmas_np, timesteps_np = wan_schedule(cfg.num_steps, cfg.shift,
                                           cfg.num_train_timesteps)
    sigmas = jnp.asarray(sigmas_np)
    timesteps = jnp.asarray(timesteps_np)
    sigma_min = float(sigmas_np[-1])
    sigma_max = float(sigmas_np[1])
    B = latents.shape[0]
    T = int(train_num_steps)

    def step(carry, i):
        x, k = carry
        t = jnp.full((B,), timesteps[i])
        v = velocity_fn(x, t, 1.0)
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        out = wan_sde_step_with_logprob(
            v, x, sigmas[i], sigmas[i + 1], sigma_min=sigma_min,
            sigma_max=sigma_max, noise=noise, deterministic=cfg.deterministic)
        if cfg.kl_reward > 0:
            v_ref = jax.lax.stop_gradient(velocity_fn(x, t, 0.0))
            ref = wan_sde_step_with_logprob(
                v_ref, x, sigmas[i], sigmas[i + 1], sigma_min=sigma_min,
                sigma_max=sigma_max, prev_sample=out.prev_sample)
            kl = jnp.mean(
                (out.prev_sample_mean - ref.prev_sample_mean) ** 2
                / (2.0 * out.std_dev_t**2),
                axis=tuple(range(1, x.ndim)))
        else:
            kl = jnp.zeros((B,))
        ys = dict(x=out.prev_sample, lp=out.log_prob, kl=kl)
        return (out.prev_sample, k), ys

    (final, _), ys = jax.lax.scan(
        step, (latents.astype(jnp.float32), key), jnp.arange(cfg.num_steps))
    all_lat = jnp.concatenate(
        [latents.astype(jnp.float32)[:, None], jnp.moveaxis(ys["x"], 0, 1)],
        axis=1)  # (B, n+1, C, F, H, W)
    lps = jnp.moveaxis(ys["lp"], 0, 1)
    kls = jnp.moveaxis(ys["kl"], 0, 1)

    rt = jnp.broadcast_to(jnp.asarray(rt, jnp.int32), (B,))
    w = rt[:, None] + jnp.arange(T)[None, :]  # (B, T)
    w_lat = rt[:, None] + jnp.arange(T + 1)[None, :]
    lat_w = jnp.take_along_axis(
        all_lat, w_lat[:, :, None, None, None, None], axis=1)
    return WanWindowResult(
        final_latents=final,
        latents=lat_w,
        log_probs=jnp.take_along_axis(lps, w, axis=1),
        timesteps=timesteps[w],
        sigmas=sigmas[w],
        sigmas_prev=sigmas[w + 1],
        kl=jnp.take_along_axis(kls, w, axis=1),
    )


def make_wan_log_prob_fn(cfg: WanSamplerConfig):
    """Training-side log-prob replay for one WAN window step (signature-
    compatible with rollout.sampler.compute_log_prob — the trainer's family
    seam). The negative embeddings are unused (no CFG batch); ``pooled`` is
    unused (WAN conditions on text states only)."""
    sigmas_np, _ = wan_schedule(cfg.num_steps, cfg.shift,
                                cfg.num_train_timesteps)
    sigma_min = float(sigmas_np[-1])
    sigma_max = float(sigmas_np[1])

    def log_prob(velocity_fn, latents_j, next_latents_j, t_j, sigma_j,
                 sigma_prev_j, prompt_embeds, pooled_embeds,
                 neg_prompt_embeds, neg_pooled_embeds, _scfg):
        del pooled_embeds, neg_prompt_embeds, neg_pooled_embeds, _scfg
        v = velocity_fn(latents_j, t_j, prompt_embeds, None)
        out = wan_sde_step_with_logprob(
            v, latents_j, sigma_j, sigma_prev_j, sigma_min=sigma_min,
            sigma_max=sigma_max, prev_sample=next_latents_j)
        return out.log_prob, out.prev_sample_mean, out.std_dev_t

    return log_prob
