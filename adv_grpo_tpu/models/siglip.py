"""SigLIP vision/text towers for the SigLIP reward family.

Backs the reference's siglip scorers (adv_grpo/rewards.py:69-143
siglip_image_similarity_score, :299-372 siglip_cotrain_score — both use
``google/siglip-so400m-patch14-384`` image embeddings). HF SigLIP semantics:
  vision: patch conv (no CLS token), learned pos emb, pre-LN transformer,
          final LN, then a MAP attention-pooling head (learned probe token,
          one MHA over patch tokens, LN + MLP residual) -> pooled embedding
  text:   standard transformer, pooled = final-LN hidden at the LAST position,
          through a dense head
Preprocessing is mean/std 0.5 (rewards.preprocess.SIGLIP_*).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from adv_grpo_tpu.models.vit import ViTBlock, ViTConfig


@dataclasses.dataclass(frozen=True)
class SigLIPVisionConfig:
    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @classmethod
    def so400m(cls, **o):
        return cls(**o)

    @classmethod
    def tiny(cls, **o):
        d = dict(image_size=28, patch_size=14, hidden_size=32,
                 intermediate_size=64, num_layers=2, num_heads=2)
        d.update(o)
        return cls(**d)

    def as_vit(self) -> ViTConfig:
        return ViTConfig(
            image_size=self.image_size, patch_size=self.patch_size,
            hidden_size=self.hidden_size, intermediate_size=self.intermediate_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            layer_norm_eps=self.layer_norm_eps, hidden_act="gelu_pytorch_tanh",
            use_pre_ln=False, projection_dim=None, dtype=self.dtype)


class MAPHead(nn.Module):
    """Attention-pooling head: learned probe attends over all tokens."""

    cfg: SigLIPVisionConfig

    @nn.compact
    def __call__(self, tokens):
        c = self.cfg
        B, S, D = tokens.shape
        nh, hd = c.num_heads, c.hidden_size // c.num_heads
        probe = self.param("probe", nn.initializers.normal(0.02), (1, 1, D),
                           jnp.float32)
        dense = lambda feat, n: nn.Dense(feat, dtype=c.dtype,
                                         param_dtype=jnp.float32, name=n)
        q = dense(D, "q_proj")(jnp.broadcast_to(probe.astype(c.dtype), (B, 1, D)))
        k = dense(D, "k_proj")(tokens)
        v = dense(D, "v_proj")(tokens)
        q = q.reshape(B, 1, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(B, 1, D)
        o = dense(D, "out_proj")(o)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         param_dtype=jnp.float32, name="layernorm")(o)
        h = dense(c.intermediate_size, "fc1")(h)
        h = nn.gelu(h, approximate=True)  # HF gelu_pytorch_tanh
        h = dense(D, "fc2")(h)
        return (o + h)[:, 0]


class SigLIPVisionTower(nn.Module):
    cfg: SigLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        x = pixel_values.transpose(0, 2, 3, 1).astype(c.dtype)
        B = x.shape[0]
        p = c.patch_size
        gh, gw = x.shape[1] // p, x.shape[2] // p
        x = x.reshape(B, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, p * p * 3)
        x = nn.Dense(c.hidden_size, dtype=c.dtype, param_dtype=jnp.float32,
                     name="patch_embed")(x)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (gh * gw, c.hidden_size), jnp.float32)
        x = x + pos[None].astype(c.dtype)
        vit_cfg = c.as_vit()
        for i in range(c.num_layers):
            x = ViTBlock(vit_cfg, name=f"layer_{i}")(x)
        tokens = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                              param_dtype=jnp.float32, name="post_layernorm")(x)
        pooled = MAPHead(c, name="head")(tokens)
        return {"tokens": tokens, "pooled": pooled}
