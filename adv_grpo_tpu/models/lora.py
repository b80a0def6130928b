"""LoRA-augmented Dense layer and trainable-parameter filtering.

The reference wraps the MMDiT with PEFT LoRA (r=32, alpha=64, gaussian init) on
exactly the 8 joint-attention projections attn.{to_q,to_k,to_v,to_out.0,
add_q_proj,add_k_proj,add_v_proj,to_add_out}
(reference scripts/train_sd3_fast_pickscore.py:490-511). The dual-attention
blocks' attn2 projections are NOT adapted (target names are attn.-prefixed).

TPU design: LoRA params live in the same "params" pytree under ``lora_a``/
``lora_b`` leaf names; the adapter delta is computed factored
(``(x @ A) @ B * alpha/r`` — never materialising the rank-full update), and a
runtime ``lora_scale`` scalar supports the reference's disable_adapter() KL
forward (train_sd3_fast_pickscore.py:1106-1108) without retracing. Trainability
is expressed as an optax mask from :func:`lora_mask`, and EMA/checkpointing
operate on the subtree from :func:`lora_params`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import traverse_util


class LoRADense(nn.Module):
    """Dense layer with an optional low-rank adapter.

    y = x @ W + b + lora_scale * (alpha/r) * (x @ A) @ B

    A: (in, r) gaussian-init N(0, 1/r); B: (r, out) zeros — PEFT
    init_lora_weights="gaussian" semantics, so the adapter starts as identity.
    """

    features: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, lora_scale=1.0):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), self.param_dtype
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        if self.lora_rank > 0:
            r = self.lora_rank
            lora_a = self.param(
                "lora_a",
                nn.initializers.normal(stddev=1.0 / r),
                (x.shape[-1], r),
                self.param_dtype,
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (r, self.features), self.param_dtype
            )
            scaling = jnp.asarray(lora_scale, self.dtype) * (self.lora_alpha / r)
            # LoRA math in the compute dtype; delta added before downstream use.
            delta = jnp.dot(
                jnp.dot(x.astype(self.dtype), lora_a.astype(self.dtype)),
                lora_b.astype(self.dtype),
            )
            y = y + scaling * delta
        return y


def _is_lora_path(path: tuple) -> bool:
    return any(str(p) in ("lora_a", "lora_b") for p in path)


def lora_mask(params) -> Any:
    """Pytree of bools: True on LoRA leaves (optax.masked trainable mask)."""
    flat = traverse_util.flatten_dict(params)
    out = {k: _is_lora_path(k) for k in flat}
    return traverse_util.unflatten_dict(out)


def lora_params(params) -> dict:
    """Extract only the LoRA leaves (flattened dict keyed by '/'-joined path)."""
    flat = traverse_util.flatten_dict(params)
    return {"/".join(map(str, k)): v for k, v in flat.items() if _is_lora_path(k)}


def merge_lora_params(params, lora_flat: dict):
    """Write LoRA leaves (from :func:`lora_params` format) back into a full tree."""
    flat = dict(traverse_util.flatten_dict(params))
    for key, val in lora_flat.items():
        k = tuple(key.split("/"))
        if k not in flat:
            raise KeyError(f"LoRA param {key} not found in target tree")
        flat[k] = jnp.asarray(val, flat[k].dtype)
    return traverse_util.unflatten_dict(flat)


def count_params(tree) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(tree))
