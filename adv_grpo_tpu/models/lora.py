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
    # only needed for the params-only call mode (x=None), where the input
    # width cannot be read off x
    in_features: Optional[int] = None

    @nn.compact
    def __call__(self, x, lora_scale=1.0):
        """Apply the layer; with ``x=None`` only materialise and return the
        params ``(kernel, bias, lora_a, lora_b)`` — :func:`fused_qkv_proj`
        uses this to merge sibling projections into one matmul while the
        checkpoint tree stays byte-identical (same pattern as
        models.mmdit.HeadRMSNorm's weight-only call)."""
        in_dim = self.in_features if x is None else x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_dim, self.features), self.param_dtype
        )
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        lora_a = lora_b = None
        if self.lora_rank > 0:
            r = self.lora_rank
            lora_a = self.param(
                "lora_a",
                nn.initializers.normal(stddev=1.0 / r),
                (in_dim, r),
                self.param_dtype,
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (r, self.features), self.param_dtype
            )
        if x is None:
            return kernel, bias, lora_a, lora_b
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        if self.lora_rank > 0:
            scaling = jnp.asarray(lora_scale, self.dtype) * (self.lora_alpha / self.lora_rank)
            # LoRA math in the compute dtype; delta added before downstream use.
            delta = jnp.dot(
                jnp.dot(x.astype(self.dtype), lora_a.astype(self.dtype)),
                lora_b.astype(self.dtype),
            )
            y = y + scaling * delta
        return y


def fused_qkv_proj(mods, x, lora_scale=1.0):
    """Apply N sibling LoRADense projections of the SAME input as ONE matmul.

    The base kernels and LoRA A factors concatenate column-wise into a single
    ``(in, N*out + N*r)`` operand — a matmul's output columns are independent,
    so each slice of the result is numerically IDENTICAL to the separate
    ``x @ W_i`` / ``x @ A_i`` products. What changes is the memory traffic:
    the ``(B, S, in)`` activation streams from HBM once instead of 2N times
    (base + lora_a dots per module), and under a sampling ``lax.scan`` XLA
    hoists the concatenated-kernel bf16 cast exactly as it hoists the
    per-module casts (net resident bytes unchanged — the fused buffer
    REPLACES the per-projection casts).

    ``mods``: constructed-but-uncalled sibling LoRADense modules sharing the
    input width and rank (output widths may differ — e.g. Flux's single-block
    q/k/v + 4x-wide proj_mlp all read the same modulated activation); each
    must carry ``in_features`` for the params-only call. Returns the N
    projection outputs in order.
    """
    m0 = mods[0]
    dt = m0.dtype
    r = m0.lora_rank
    parts = [m(None) for m in mods]  # (kernel, bias, lora_a, lora_b) each
    blocks = [p[0] for p in parts]
    if r > 0:
        blocks += [p[2] for p in parts]
    big = jnp.concatenate(blocks, axis=1).astype(dt)
    y = jnp.dot(x.astype(dt), big)
    outs = []
    off = 0
    for m in mods:
        outs.append(y[..., off:off + m.features])
        off += m.features
    if parts[0][1] is not None:
        outs = [o + p[1].astype(dt) for o, p in zip(outs, parts)]
    if r > 0:
        scaling = jnp.asarray(lora_scale, dt) * (m0.lora_alpha / r)
        for i, p in enumerate(parts):
            h = y[..., off + i * r: off + (i + 1) * r]
            outs[i] = outs[i] + scaling * jnp.dot(h, p[3].astype(dt))
    return outs


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
