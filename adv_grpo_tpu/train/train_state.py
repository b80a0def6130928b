"""Generator train state: LoRA-subtree AdamW + accumulation + EMA, pjit-ready.

Optimizer semantics from the reference (train_sd3_fast_pickscore.py:554-561,
:419-427, :1165-1187; note the reference's ``timestep_fraction`` computes a
``num_train_timesteps`` that the fast trainers no longer consume (:411-412) —
accumulation scales by ``train_num_steps`` exactly as here): AdamW(lr 3e-4, betas (0.9, 0.999), wd 1e-4, eps 1e-8)
over ONLY the LoRA parameters; gradient accumulation of
``gradient_accumulation_steps * train_num_steps`` microbatches per optimizer
step; global-norm clip 1.0 at the sync point; EMA of the trainable leaves with
warmup decay, stepped once per optimizer step gated by the update interval
(the reference calls ema.step per minibatch with the current global step,
ema.py:40-55 — once-per-optimizer-step is the well-defined equivalent).

TPU memory design: the state holds ONLY the trainable LoRA subtree (a flat
{path: array} dict from models.lora.lora_params) — optimizer moments, the
Multi-Steps accumulator, and the EMA shadow are all LoRA-sized (~18M params for
SD3.5-M r=32), not policy-sized (2B). The frozen tree stays a separate
replicated constant; ``merge_lora_params`` grafts live values in at trace time.
This is the JAX-native answer to DeepSpeed ZeRO state sharding (SURVEY.md §2.3):
with LoRA the state is small enough to replicate outright.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from adv_grpo_tpu.core.ema import EMAState, ema_decay_at, ema_init


class GeneratorState(struct.PyTreeNode):
    lora: Any  # flat {path: array} trainable subtree
    opt_state: Any
    ema: Optional[EMAState]  # EMA over the lora subtree
    global_step: jax.Array  # increments per optimizer (sync) step
    micro_step: jax.Array  # increments per microbatch

    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.9)
    ema_interval: int = struct.field(pytree_node=False, default=8)
    accum_steps: int = struct.field(pytree_node=False, default=1)


def make_optimizer(train_cfg, accum_steps: int) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.max_grad_norm),
        optax.adamw(
            learning_rate=train_cfg.learning_rate,
            b1=train_cfg.adam_beta1,
            b2=train_cfg.adam_beta2,
            eps=train_cfg.adam_epsilon,
            weight_decay=train_cfg.adam_weight_decay,
        ),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def create_generator_state(lora_subtree, train_cfg, train_num_steps: int,
                           use_ema: Optional[bool] = None) -> GeneratorState:
    # micro_splits multiplies the accumulation count so optimizer-step
    # boundaries land on the same SAMPLES as the unsplit schedule: each split
    # sub-microbatch contributes its per-sample-mean grad, and MultiSteps'
    # average of splits-times-more grads over splits-times-fewer samples each
    # equals the unsplit average (config/base.py train.micro_splits).
    accum = (int(train_cfg.gradient_accumulation_steps) * int(train_num_steps)
             * max(int(train_cfg.get("micro_splits", 1)), 1))
    tx = make_optimizer(train_cfg, accum)
    use_ema = bool(train_cfg.ema) if use_ema is None else use_ema
    ema = ema_init(lora_subtree) if use_ema else None
    return GeneratorState(
        lora=lora_subtree,
        opt_state=tx.init(lora_subtree),
        ema=ema,
        global_step=jnp.asarray(0, jnp.int32),
        micro_step=jnp.asarray(0, jnp.int32),
        tx=tx,
        ema_decay=float(train_cfg.ema_decay),
        ema_interval=int(train_cfg.ema_interval),
        accum_steps=accum,
    )


def apply_microbatch_grads(state: GeneratorState, grads) -> GeneratorState:
    """One microbatch: feed LoRA grads to the Multi-Steps optimizer; on sync
    steps the inner update fires and EMA advances (jit-safe throughout)."""
    updates, new_opt = state.tx.update(grads, state.opt_state, state.lora)
    new_lora = optax.apply_updates(state.lora, updates)
    micro = state.micro_step + 1
    synced = (micro % state.accum_steps) == 0
    gstep = state.global_step + synced.astype(jnp.int32)

    new_ema = state.ema
    if state.ema is not None:
        one_minus = 1.0 - ema_decay_at(state.global_step, state.ema_decay)
        do_update = synced & ((gstep % state.ema_interval) == 0)
        scale = jnp.where(do_update, one_minus, 0.0)
        new_ema = EMAState(params=jax.tree_util.tree_map(
            lambda e, p: e + scale.astype(e.dtype) * (p.astype(e.dtype) - e),
            state.ema.params, new_lora))

    return state.replace(lora=new_lora, opt_state=new_opt, ema=new_ema,
                         global_step=gstep, micro_step=micro)
