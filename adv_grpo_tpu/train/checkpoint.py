"""Orbax checkpointing: LoRA + optimizer + EMA + step (a strict superset of the
reference's weights-only LoRA save).

Reference semantics (train_sd3_fast_pickscore.py:389-398): save only the LoRA
adapter every ``save_freq`` epochs under
``{save_dir}/checkpoints/checkpoint-{global_step}/lora`` with EMA weights
swapped in for the write; optimizer/EMA/stat state is lost and resume is
weights-only via ``train.lora_path``. Here a checkpoint carries the full
GeneratorState (LoRA leaves, Adam moments, Multi-Steps accumulator, EMA shadow,
steps) plus the D-state when co-training — true resume — while
``save_lora_only`` reproduces the reference layout for interchange.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def checkpoint_dir(save_dir: str, global_step: int) -> str:
    return os.path.join(save_dir, "checkpoints", f"checkpoint-{global_step}")


def save_state(save_dir: str, global_step: int, state, extra: Optional[dict] = None):
    """Full-state save (resume-capable)."""
    ocp = _ocp()
    path = os.path.abspath(checkpoint_dir(save_dir, global_step))
    payload = {"lora": state.lora,
               "opt_state": state.opt_state,
               "ema": None if state.ema is None else state.ema.params,
               "global_step": np.asarray(state.global_step),
               "micro_step": np.asarray(state.micro_step)}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), payload, force=True)
        if extra:
            # separate item: the generator state stays template-restorable
            # whether or not a D-state rides along
            ckptr.save(os.path.join(path, "extra"), extra, force=True)
    return path


def restore_state(path: str, state):
    """Restore into an existing (template) GeneratorState."""
    ocp = _ocp()
    import jax.numpy as jnp

    template = {"lora": state.lora,
                "opt_state": state.opt_state,
                "ema": None if state.ema is None else state.ema.params,
                "global_step": np.asarray(state.global_step),
                "micro_step": np.asarray(state.micro_step)}
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, "state"), item=template)
    from adv_grpo_tpu.core.ema import EMAState

    return state.replace(
        lora=jax.tree_util.tree_map(jnp.asarray, restored["lora"]),
        opt_state=jax.tree_util.tree_map(jnp.asarray, restored["opt_state"]),
        ema=None if restored["ema"] is None else EMAState(
            jax.tree_util.tree_map(jnp.asarray, restored["ema"])),
        global_step=jnp.asarray(restored["global_step"]),
        micro_step=jnp.asarray(restored["micro_step"]),
    )


def restore_extra(path: str, extra_template: dict) -> Optional[dict]:
    """Restore the D-state (or any ``extra``) payload from a full-state
    checkpoint written with ``save_state(extra=...)``; returns None when the
    checkpoint has no extra payload (e.g. a non-adversarial run). Covers the
    reference's ``config.weight_path`` discriminator warm-start
    (train_sd3_fast_pickscore.py:518-523)."""
    ocp = _ocp()
    extra_path = os.path.join(os.path.abspath(path), "extra")
    if not os.path.isdir(extra_path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        # item=template: without it orbax returns plain nested dicts and the
        # optax opt_state loses its namedtuple structure — the first D-step
        # after a warm-start would die on a pytree mismatch
        restored = ckptr.restore(extra_path, item=extra_template)
    import jax.numpy as jnp

    def graft(template, got):
        if got is None:
            return template
        return jax.tree_util.tree_map(jnp.asarray, got)

    return {k: graft(extra_template.get(k), v) for k, v in restored.items()}


def save_lora_only(save_dir: str, global_step: int, lora_flat: dict,
                   use_ema_weights: Optional[dict] = None):
    """Reference-layout adapter-only save (checkpoint-{step}/lora); writes the
    EMA weights when provided (reference save_ckpt :389-398)."""
    ocp = _ocp()
    path = os.path.abspath(
        os.path.join(checkpoint_dir(save_dir, global_step), "lora"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, use_ema_weights if use_ema_weights is not None else lora_flat,
                   force=True)
    return path


def load_lora_only(path: str, expect_rank=None, expect_alpha=None) -> dict:
    """Load an adapter-only checkpoint: our orbax layout, or a peft adapter
    directory (adapter_config.json + adapter_model.safetensors — the format
    the reference publishes, app.py:27-44). ``expect_rank``/``expect_alpha``
    validate a peft adapter against the model it will be merged into."""
    if os.path.exists(os.path.join(path, "adapter_model.safetensors")):
        from adv_grpo_tpu.models.peft_lora import (
            import_peft_lora, validate_against_model)

        flat, cfg = import_peft_lora(path)
        if expect_rank is not None or expect_alpha is not None:
            validate_against_model(cfg, expect_rank, expect_alpha)
        return flat
    ocp = _ocp()
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Newest checkpoint-{step} dir under save_dir/checkpoints, or None."""
    root = os.path.join(save_dir, "checkpoints")
    if not os.path.isdir(root):
        return None
    ckpts = sorted(
        (d for d in os.listdir(root) if d.startswith("checkpoint-")),
        key=lambda d: int(d.split("-")[1]),
    )
    return os.path.join(root, ckpts[-1]) if ckpts else None


def prune_checkpoints(save_dir: str, keep: int):
    """Keep the newest ``keep`` checkpoints (reference num_checkpoint_limit)."""
    root = os.path.join(save_dir, "checkpoints")
    if not os.path.isdir(root):
        return
    ckpts = sorted(
        (d for d in os.listdir(root) if d.startswith("checkpoint-")),
        key=lambda d: int(d.split("-")[1]),
    )
    import shutil

    for d in ckpts[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
