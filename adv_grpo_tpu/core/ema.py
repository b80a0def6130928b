"""Exponential moving average over parameter pytrees.

Functional re-design of the reference EMAModuleWrapper (adv_grpo/ema.py:8-88) —
same schedule and swap semantics, but as pure functions over JAX pytrees so the
update can live inside the jitted optimizer step:

  * warmup decay: ``min((1 + step) / (10 + step), decay)``            (:33-37)
  * updates applied only when ``(step + 1) % update_step_interval == 0`` (:45)
  * ``swap_in`` / ``swap_out`` mirror copy_ema_to(store_temp=True)/copy_temp_to
    (:65-77) for eval & checkpointing with EMA weights.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any  # EMA shadow pytree


def ema_init(params) -> EMAState:
    return EMAState(params=jax.tree_util.tree_map(jnp.asarray, params))


def ema_decay_at(step, decay: float):
    """Warmup-capped decay (reference ema.py:33-37). ``step`` may be traced."""
    step = jnp.asarray(step, dtype=jnp.float32)
    return jnp.minimum((1.0 + step) / (10.0 + step), jnp.float32(decay))


def ema_update(
    state: EMAState,
    params,
    step,
    *,
    decay: float,
    update_step_interval: int = 1,
) -> EMAState:
    """ema += (1 - decay_t) * (p - ema), gated on the step interval (jit-safe)."""
    one_minus = 1.0 - ema_decay_at(step, decay)
    do_update = (jnp.asarray(step, jnp.int32) + 1) % update_step_interval == 0
    scale = jnp.where(do_update, one_minus, 0.0)
    new = jax.tree_util.tree_map(
        lambda e, p: e + scale.astype(e.dtype) * (p.astype(e.dtype) - e),
        state.params,
        params,
    )
    return EMAState(params=new)


def ema_swap_in(state: EMAState, params):
    """Return (ema_params_to_use, stored_temp) — copy_ema_to(store_temp=True)."""
    return state.params, params


def ema_swap_out(stored_temp):
    """Restore the stashed live params — copy_temp_to."""
    return stored_temp
