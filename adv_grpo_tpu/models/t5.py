"""T5 v1.1 encoder (XXL-class) in Flax — SD3's third text encoder.

Semantics mirror HF ``T5EncoderModel`` (the reference calls it through
``_encode_prompt_with_t5``, adv_grpo/diffusers_patch/train_dreambooth_lora_sd3.py:19-56
taking the last hidden state):
  * T5LayerNorm: RMS, no mean subtraction, no bias; applied pre-sublayer
  * relative-position bucket bias, shared from layer 0, bidirectional
  * gated-GELU feed-forward (wi_0 * gelu ⊙ wi_1 -> wo), v1.1 style, no biases
  * no absolute position embeddings; final RMS norm
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    # UMT5 (WAN's text encoder, HF UMT5EncoderModel): every layer owns its
    # relative-attention-bias table; T5 v1.1 shares layer 0's across all.
    per_layer_rel_bias: bool = False

    @classmethod
    def xxl(cls, **o):
        return cls(**o)

    @classmethod
    def umt5_xxl(cls, **o):
        d = dict(vocab_size=256384, per_layer_rel_bias=True)
        d.update(o)
        return cls(**d)

    @classmethod
    def tiny(cls, **o):
        d = dict(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                 num_heads=4, dtype=jnp.float32)
        d.update(o)
        return cls(**d)


def t5_relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional bucket mapping (HF T5 semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int32) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


class T5LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.eps) * w).astype(self.dtype)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, attn_mask, buckets=None):
        c = self.cfg
        if c.per_layer_rel_bias:
            # UMT5: a fresh bias table in every block (HF UMT5Attention)
            rel_emb = self.param(
                "relative_attention_bias", nn.initializers.normal(1.0),
                (c.relative_attention_num_buckets, c.num_heads), jnp.float32)
            pos_bias = rel_emb[jnp.asarray(buckets)].transpose(2, 0, 1)[None]
        inner = c.num_heads * c.d_kv
        h = T5LayerNorm(c.d_model, c.layer_norm_eps, c.dtype, name="ln_attn")(x)
        B, S, _ = h.shape
        dense = lambda feat, n: nn.Dense(feat, use_bias=False, dtype=c.dtype,
                                         param_dtype=jnp.float32, name=n)
        q = dense(inner, "q")(h).reshape(B, S, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        k = dense(inner, "k")(h).reshape(B, S, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        v = dense(inner, "v")(h).reshape(B, S, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        # T5: no 1/sqrt(d) scaling (folded into init)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) + pos_bias
        if attn_mask is not None:
            s = jnp.where(attn_mask[:, None, None, :], s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(B, S, inner)
        x = x + dense(c.d_model, "o")(o)

        h = T5LayerNorm(c.d_model, c.layer_norm_eps, c.dtype, name="ln_ff")(x)
        wi0 = dense(c.d_ff, "wi_0")(h)
        wi1 = dense(c.d_ff, "wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + dense(c.d_model, "wo")(h)
        return x


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        B, S = input_ids.shape
        x = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype,
                     param_dtype=jnp.float32, name="token_embedding")(input_ids)
        ctx = np.arange(S)
        buckets = t5_relative_position_bucket(
            ctx[None, :] - ctx[:, None],
            c.relative_attention_num_buckets, c.relative_attention_max_distance,
        )
        if c.per_layer_rel_bias:
            pos_bias = None  # each block builds its own (UMT5)
        else:
            # shared relative position bias (layer 0's table, T5 v1.1)
            rel_emb = self.param(
                "relative_attention_bias", nn.initializers.normal(1.0),
                (c.relative_attention_num_buckets, c.num_heads), jnp.float32,
            )
            pos_bias = rel_emb[jnp.asarray(buckets)].transpose(2, 0, 1)[None]
        for i in range(c.num_layers):
            x = T5Block(c, name=f"block_{i}")(x, pos_bias, attention_mask,
                                              buckets=buckets)
        x = T5LayerNorm(c.d_model, c.layer_norm_eps, c.dtype, name="final_ln")(x)
        return x


def encode_with_length_mask(encoder: "T5Encoder", params, input_ids, lengths):
    """UMT5/T5 prompt embedding with per-sample length masking.

    Mirrors the WAN text-embedding helper
    (adv_grpo/diffusers_patch/wan_prompt_embedding.py:4-40): positions at or
    beyond each sample's true length are attention-masked during encoding AND
    zeroed in the returned embeddings, so padded positions contribute nothing
    to cross-attention.
    """
    import numpy as np

    B, S = input_ids.shape
    pos = jnp.arange(S)[None, :]
    mask = pos < jnp.asarray(lengths)[:, None]
    hidden = encoder.apply({"params": params}, input_ids, mask)
    return jnp.where(mask[..., None], hidden, 0.0)
