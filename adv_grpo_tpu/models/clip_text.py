"""CLIP text encoder (OpenAI-L and OpenCLIP-bigG variants) in Flax.

Backs SD3's first two text encoders and the PickScore/CLIP scorer text towers.
Semantics mirror HF ``CLIPTextModelWithProjection``:
  token emb + learned pos emb -> N pre-LN transformer blocks with causal mask ->
  final LayerNorm; penultimate-layer hidden states are what SD3 consumes
  (reference adv_grpo/diffusers_patch/train_dreambooth_lora_sd3.py:59-95 takes
  ``hidden_states[-2]``); the pooled output is the final-LN hidden at each
  sequence's EOS position, through the text projection.

The ``eos_token_id`` strategy matches HF: position of the *first* occurrence of
the EOS id (robust to pad-with-eos tokenisers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"  # L: quick_gelu; bigG: gelu
    eos_token_id: int = 49407
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @classmethod
    def clip_l(cls, **o):
        return cls(**o)

    @classmethod
    def clip_g(cls, **o):
        d = dict(hidden_size=1280, intermediate_size=5120, num_layers=32,
                 num_heads=20, projection_dim=1280, hidden_act="gelu",
                 eos_token_id=49407)
        d.update(o)
        return cls(**d)

    @classmethod
    def clip_h_text(cls, **o):
        # CLIP-H text tower (PickScore CLIP-H/14: 1024-dim, 23? -> HF: 24 layers)
        d = dict(hidden_size=1024, intermediate_size=4096, num_layers=24,
                 num_heads=16, projection_dim=1024, hidden_act="gelu")
        d.update(o)
        return cls(**d)

    @classmethod
    def tiny(cls, **o):
        d = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                 num_layers=2, num_heads=2, max_position_embeddings=16,
                 projection_dim=24, eos_token_id=63)
        d.update(o)
        return cls(**d)


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         param_dtype=jnp.float32, name="layer_norm1")(x)
        B, S, D = h.shape
        nh, hd = c.num_heads, c.hidden_size // c.num_heads
        dense = lambda n: nn.Dense(D, dtype=c.dtype, param_dtype=jnp.float32, name=n)
        q = dense("q_proj")(h).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = dense("k_proj")(h).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        v = dense("v_proj")(h).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (hd ** -0.5)
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + dense("out_proj")(o)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         param_dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, param_dtype=jnp.float32,
                     name="fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """-> (last_hidden_pre_final_ln? no:) returns
        (final_hidden, penultimate_hidden, pooled_projected)."""
        c = self.cfg
        B, S = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, param_dtype=jnp.float32,
                       dtype=c.dtype, name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (c.max_position_embeddings, c.hidden_size), jnp.float32)
        x = tok + pos[None, :S].astype(c.dtype)
        causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
        penultimate = x
        for i in range(c.num_layers):
            penultimate = x
            x = CLIPEncoderLayer(c, name=f"layer_{i}")(x, causal)
        final = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                             param_dtype=jnp.float32, name="final_layer_norm")(x)
        # EOS position: first occurrence of eos_token_id (HF semantics)
        is_eos = (input_ids == c.eos_token_id).astype(jnp.int32)
        eos_pos = jnp.argmax(is_eos, axis=1)
        pooled = final[jnp.arange(B), eos_pos]
        pooled = nn.Dense(c.projection_dim, use_bias=False, dtype=c.dtype,
                          param_dtype=jnp.float32, name="text_projection")(pooled)
        return final, penultimate, pooled
