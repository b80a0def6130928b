"""Flow-matching SDE / CPS sampling steps with Gaussian log-probabilities.

Pure JAX re-derivations of the reference step primitives
(adv_grpo/diffusers_patch/sd3_sde_with_logprob.py):

  * :func:`cps_step_with_logprob`  — "Flow-CPS", ``sde_step_with_logprob_new``
    (reference :77-139). Used by every trainer; THE parity-critical kernel.
  * :func:`flow_sde_step_with_logprob` — the original Flow-SDE step
    (reference :13-73), used by the Flux/Kontext samplers and demos.

All math runs in a float32 island regardless of input dtype: the reference notes
"bf16 can overflow here" (reference :36,100) and GRPO's clip_range of 1e-5 makes the
ratio exp(lp - lp_old) meaningful only at fp32 precision (SURVEY.md §7.3.1).

These are shape-polymorphic pure functions: ``sigma``/``sigma_prev`` may be python
scalars, 0-d arrays (scan carries) or per-sample (B,)-vectors; they are broadcast
against the sample's leading batch axis.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SDEStepResult(NamedTuple):
    prev_sample: jax.Array  # x_{t-1}, float32
    log_prob: jax.Array  # (B,) per-sample logprob (mean over non-batch dims)
    prev_sample_mean: jax.Array  # mean of the transition Gaussian, float32
    # per-sample (broadcast) noise scale. NOTE per-function semantics:
    # cps/flow steps return the pre-dt std_dev_t (the reference's field,
    # sd3_sde_with_logprob.py:64/118 — flow's actual transition std is
    # std_dev_t*sqrt(-dt)), while the WAN step returns the dt-scaled
    # step_std, which IS its transition std (its per-step KL divides by
    # this field squared, wan_pipeline_with_logprob.py:311-341).
    std_dev_t: jax.Array


def _bcast(x, ndim: int) -> jax.Array:
    """Reshape scalar/(B,) coefficient to broadcast over (B, ...) samples."""
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim == 0:
        return x
    return x.reshape(x.shape[0], *([1] * (ndim - 1)))


def _mean_over_non_batch(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def cps_step_with_logprob(
    model_output: jax.Array,
    sample: jax.Array,
    sigma,
    sigma_prev,
    noise_level: float,
    *,
    noise: Optional[jax.Array] = None,
    prev_sample: Optional[jax.Array] = None,
) -> SDEStepResult:
    """One Flow-CPS transition x_t -> x_{t-1} with its Gaussian log-probability.

    Closed form (reference sd3_sde_with_logprob.py:118-137):
        std_t   = sigma_prev * sin(noise_level * pi/2)
        x0_hat  = x - sigma * v            (predicted clean sample)
        x1_hat  = x + v * (1 - sigma)      (predicted noise endpoint)
        mean    = x0_hat * (1 - sigma_prev) + x1_hat * sqrt(sigma_prev^2 - std_t^2)
        x_{t-1} = mean + std_t * eps                       (if sampling)
        logprob = mean_{non-batch}( -(x_{t-1} - mean)^2 )  (constants dropped)

    Exactly one of ``noise`` (fresh standard normal, sampling mode) or
    ``prev_sample`` (replay mode: score an existing transition, used by the GRPO
    re-forward, reference train_sd3_fast_pickscore.py:258-265) must be provided —
    except for the fully deterministic case (noise_level == 0 via a traced zero
    std), where passing ``noise=zeros`` is equivalent.

    ``noise_level`` may be a traced scalar: the stochastic-window samplers drive it
    per step (0 outside the window) without retracing.
    """
    v = model_output.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    nl = _bcast(noise_level, x.ndim)  # scalar or per-sample (B,)

    sig = _bcast(sigma, x.ndim)
    sig_prev = _bcast(sigma_prev, x.ndim)

    std_dev_t = sig_prev * jnp.sin(nl * jnp.float32(math.pi) / 2.0)
    pred_original = x - sig * v
    noise_estimate = x + v * (1.0 - sig)
    prev_sample_mean = pred_original * (1.0 - sig_prev) + noise_estimate * jnp.sqrt(
        jnp.maximum(sig_prev**2 - std_dev_t**2, 0.0)
    )

    if prev_sample is None:
        if noise is None:
            raise ValueError("cps_step_with_logprob: provide either noise or prev_sample")
        prev_sample = prev_sample_mean + std_dev_t * noise.astype(jnp.float32)
    else:
        prev_sample = prev_sample.astype(jnp.float32)

    # prev_sample is observed data: no gradient flows through it (reference
    # detaches, :134).
    delta = jax.lax.stop_gradient(prev_sample) - prev_sample_mean
    log_prob = _mean_over_non_batch(-(delta**2))
    std_b = jnp.broadcast_to(std_dev_t, (x.shape[0],) + (1,) * (x.ndim - 1))
    return SDEStepResult(prev_sample, log_prob, prev_sample_mean, std_b)


def flow_sde_step_with_logprob(
    model_output: jax.Array,
    sample: jax.Array,
    sigma,
    sigma_prev,
    noise_level: float,
    *,
    sigma_at_one: float,
    noise: Optional[jax.Array] = None,
    prev_sample: Optional[jax.Array] = None,
) -> SDEStepResult:
    """Original Flow-SDE step with the FULL Gaussian log-probability.

    Closed form (reference sd3_sde_with_logprob.py:44-71):
        dt      = sigma_prev - sigma                  (negative)
        std_t   = sqrt(sigma / (1 - sigma')) * noise_level,
                  sigma' = sigma_at_one where sigma == 1 else sigma
        mean    = x*(1 + std_t^2/(2 sigma) * dt) + v*(1 + std_t^2 (1-sigma)/(2 sigma)) * dt
        x_{t-1} = mean + std_t * sqrt(-dt) * eps
        logprob = -(x_{t-1}-mean)^2 / (2 (std_t sqrt(-dt))^2)
                  - log(std_t sqrt(-dt)) - log(sqrt(2 pi)),  meaned over non-batch dims

    ``sigma_at_one`` is the reference's ``self.sigmas[1]`` guard value (:46,49) that
    replaces sigma at the first step where sigma == 1 to avoid division by zero.
    """
    v = model_output.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    nl = _bcast(noise_level, x.ndim)  # scalar or per-sample (B,)

    sig = _bcast(sigma, x.ndim)
    sig_prev = _bcast(sigma_prev, x.ndim)
    dt = sig_prev - sig

    sig_guard = jnp.where(sig == 1.0, jnp.float32(sigma_at_one), sig)
    std_dev_t = jnp.sqrt(sig / (1.0 - sig_guard)) * nl

    prev_sample_mean = x * (1.0 + std_dev_t**2 / (2.0 * sig) * dt) + v * (
        1.0 + std_dev_t**2 * (1.0 - sig) / (2.0 * sig)
    ) * dt

    step_std = std_dev_t * jnp.sqrt(-dt)
    if prev_sample is None:
        if noise is None:
            raise ValueError("flow_sde_step_with_logprob: provide either noise or prev_sample")
        prev_sample = prev_sample_mean + step_std * noise.astype(jnp.float32)
    else:
        prev_sample = prev_sample.astype(jnp.float32)

    delta = jax.lax.stop_gradient(prev_sample) - prev_sample_mean
    log_prob = (
        -(delta**2) / (2.0 * step_std**2)
        - jnp.log(step_std)
        - jnp.float32(math.log(math.sqrt(2.0 * math.pi)))
    )
    log_prob = _mean_over_non_batch(log_prob)
    std_b = jnp.broadcast_to(std_dev_t, (x.shape[0],) + (1,) * (x.ndim - 1))
    return SDEStepResult(prev_sample, log_prob, prev_sample_mean, std_b)


def wan_sde_step_with_logprob(
    model_output: jax.Array,
    sample: jax.Array,
    sigma,
    sigma_prev,
    *,
    sigma_min: float,
    sigma_max: float,
    noise: Optional[jax.Array] = None,
    prev_sample: Optional[jax.Array] = None,
    deterministic: bool = False,
) -> SDEStepResult:
    """WAN video Flow-SDE step over a UniPC-style sigma schedule.

    Closed form (reference adv_grpo/diffusers_patch/wan_pipeline_with_logprob.py:10-84):
        std_t = sigma_min + (sigma_max - sigma_min) * sigma   (:52)
        mean  = x*(1 + std_t^2/(2 sigma) dt) + v*(1 + std_t^2 (1-sigma)/(2 sigma)) dt
        x_{t-1} = mean + std_t*sqrt(-dt)*eps; deterministic -> plain Euler
                  x + dt*v (:72-73)
        logprob = full Gaussian, meaned over non-batch dims (:75-83)

    sigma_max is the schedule's SECOND entry (sigmas[1]) and sigma_min its last,
    per the reference (:45-46). Samples are 5-D video latents (B,C,F,H,W) but the
    math is shape-agnostic.
    """
    v = model_output.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    sig = _bcast(sigma, x.ndim)
    sig_prev = _bcast(sigma_prev, x.ndim)
    dt = sig_prev - sig

    std_dev_t = jnp.float32(sigma_min) + (jnp.float32(sigma_max) - sigma_min) * sig
    prev_sample_mean = x * (1.0 + std_dev_t**2 / (2.0 * sig) * dt) + v * (
        1.0 + std_dev_t**2 * (1.0 - sig) / (2.0 * sig)
    ) * dt

    step_std = std_dev_t * jnp.sqrt(-dt)
    if prev_sample is None:
        if noise is None:
            raise ValueError("wan_sde_step_with_logprob: provide noise or prev_sample")
        prev_sample = prev_sample_mean + step_std * noise.astype(jnp.float32)
        if deterministic:
            prev_sample = x + dt * v
    else:
        prev_sample = prev_sample.astype(jnp.float32)

    delta = jax.lax.stop_gradient(prev_sample) - prev_sample_mean
    log_prob = (
        -(delta**2) / (2.0 * step_std**2)
        - jnp.log(step_std)
        - jnp.float32(math.log(math.sqrt(2.0 * math.pi)))
    )
    log_prob = _mean_over_non_batch(log_prob)
    std_b = jnp.broadcast_to(step_std, (x.shape[0],) + (1,) * (x.ndim - 1))
    return SDEStepResult(prev_sample, log_prob, prev_sample_mean, std_b)
