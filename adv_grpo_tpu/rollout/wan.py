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
