"""Flow-match Euler discrete schedule (sigma/timestep tables).

Reproduces the sigma schedule the reference obtains from diffusers'
``FlowMatchEulerDiscreteScheduler`` via ``retrieve_timesteps(scheduler, n)`` with
``sigmas=None`` (reference: adv_grpo/diffusers_patch/sd3_pipeline_with_logprob_fast.py:573-579).

diffusers semantics being matched (scheduling_flow_match_euler_discrete.py):
  __init__ : base sigmas = linspace(1, N, N)[::-1] / N, then static shift
             ``s*sigma / (1 + (s-1)*sigma)``; sigma_max = 1.0, sigma_min = shifted 1/N.
  set_timesteps(n): t-grid = linspace(sigma_max*N, sigma_min*N, n) / N, then the
             static shift is applied AGAIN (this double-shift is deliberate diffusers
             behaviour that the reference inherits — we reproduce it exactly since
             logprob parity depends on the sigma values), timesteps = sigmas * N,
             and a terminal 0.0 sigma is appended.

All outputs are float32 numpy; they are tiny static tables computed on host once per
sampler configuration and closed over by the jitted scan.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _static_shift(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Static sigma/timestep tables for an n-step flow-match Euler sampler.

    Attributes:
      sigmas: (n+1,) float32, descending, terminal 0.0 appended.
      timesteps: (n,) float32, ``sigmas[:-1] * num_train_timesteps`` — the values fed
        to the transformer's timestep embedding (reference passes scheduler.timesteps).
      num_train_timesteps: the t-normalisation constant (1000 for SD3).
      shift: the static shift (3.0 for SD3/SD3.5).
    """

    sigmas: np.ndarray
    timesteps: np.ndarray
    num_train_timesteps: int
    shift: float

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def flow_match_schedule(
    num_inference_steps: int,
    shift: float = 3.0,
    num_train_timesteps: int = 1000,
    use_double_shift: bool = True,
) -> FlowMatchSchedule:
    """Build the n-step schedule.

    With ``use_double_shift=True`` this is bit-compatible (in float64 math, cast to
    float32) with diffusers' default path used by the reference. Setting it False
    gives the single-shift variant (the path taken when a pipeline passes explicit
    ``sigmas=linspace(1, 1/n, n)``), kept for experimentation.
    """
    n = int(num_inference_steps)
    if n < 1:
        raise ValueError(f"num_inference_steps must be >= 1, got {n}")
    ntt = float(num_train_timesteps)

    sigma_min_base = 1.0 / ntt
    sigma_min = _static_shift(np.array([sigma_min_base]), shift)[0]
    sigma_max = 1.0  # shift(1.0) == 1.0

    if use_double_shift:
        # set_timesteps path: linspace over t of already-shifted endpoints, re-shifted.
        t_grid = np.linspace(sigma_max * ntt, sigma_min * ntt, n, dtype=np.float64)
        sigmas = _static_shift(t_grid / ntt, shift)
    else:
        base = np.linspace(1.0, 1.0 / n, n, dtype=np.float64)
        sigmas = _static_shift(base, shift)

    timesteps = (sigmas * ntt).astype(np.float32)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return FlowMatchSchedule(
        sigmas=sigmas,
        timesteps=timesteps,
        num_train_timesteps=num_train_timesteps,
        shift=shift,
    )
