"""Vision transformers: CLIP-style vision towers and DINOv2 (timm-style) ViTs.

One configurable encoder covers the reward models' backbones:
  * CLIP vision towers (PickScore CLIP-H/14, aesthetic/CLIP-L scorer): patch conv,
    class token, learned pos emb, pre-LN before the stack, LN-pooled class token
    through a visual projection (HF CLIPVisionModelWithProjection semantics;
    reference adv_grpo/pickscore_scorer.py:8-9, clip_scorer.py).
  * DINOv2 ViT-B/14 (timm vit_base_patch14_dinov2.lvd142m): LayerScale residual
    scaling, no pre-LN, forward_features -> (B, 1+N, D) tokens with CLS at 0
    (reference train_sd3_fast_dino_patch.py:585-603, rewards.py:147-203).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"  # or "quick_gelu"
    use_pre_ln: bool = True  # CLIP: True; DINOv2: False
    layer_scale_init: Optional[float] = None  # DINOv2: 1e-5
    projection_dim: Optional[int] = 1024  # CLIP visual projection; None = raw
    dtype: Any = jnp.float32

    @classmethod
    def clip_h(cls, **o):
        return cls(**o)

    @classmethod
    def clip_l(cls, **o):
        d = dict(image_size=224, patch_size=14, hidden_size=1024,
                 intermediate_size=4096, num_layers=24, num_heads=16,
                 projection_dim=768, hidden_act="quick_gelu")
        d.update(o)
        return cls(**d)

    @classmethod
    def dinov2_base(cls, **o):
        d = dict(image_size=518, patch_size=14, hidden_size=768,
                 intermediate_size=3072, num_layers=12, num_heads=12,
                 layer_norm_eps=1e-6, use_pre_ln=False, layer_scale_init=1e-5,
                 projection_dim=None)
        d.update(o)
        return cls(**d)

    @classmethod
    def tiny(cls, **o):
        d = dict(image_size=28, patch_size=14, hidden_size=32,
                 intermediate_size=64, num_layers=2, num_heads=2,
                 projection_dim=16)
        d.update(o)
        return cls(**d)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu_pytorch_tanh":  # SigLIP (HF gelu_pytorch_tanh)
        return lambda x: nn.gelu(x, approximate=True)
    return lambda x: nn.gelu(x, approximate=False)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, S, D = x.shape
        nh, hd = c.num_heads, c.hidden_size // c.num_heads
        dense = lambda feat, n: nn.Dense(feat, dtype=c.dtype,
                                         param_dtype=jnp.float32, name=n)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        q = dense(D, "q_proj")(h).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = dense(D, "k_proj")(h).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        v = dense(D, "v_proj")(h).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(B, S, D)
        o = dense(D, "out_proj")(o)
        if c.layer_scale_init is not None:
            ls1 = self.param("ls1", nn.initializers.constant(c.layer_scale_init),
                             (D,), jnp.float32)
            o = o * ls1.astype(o.dtype)
        x = x + o

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        h = dense(c.intermediate_size, "fc1")(h)
        h = _act(c.hidden_act)(h)
        h = dense(c.hidden_size, "fc2")(h)
        if c.layer_scale_init is not None:
            ls2 = self.param("ls2", nn.initializers.constant(c.layer_scale_init),
                             (D,), jnp.float32)
            h = h * ls2.astype(h.dtype)
        return x + h


class VisionTransformer(nn.Module):
    """pixel_values (B, 3, H, W) -> dict(tokens, cls, pooled_projected)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixel_values, capture_layers=()):
        c = self.cfg
        x = pixel_values.transpose(0, 2, 3, 1).astype(c.dtype)  # NHWC
        B = x.shape[0]
        p = c.patch_size
        gh, gw = x.shape[1] // p, x.shape[2] // p
        # patchify as matmul
        x = x.reshape(B, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, p * p * 3)
        x = nn.Dense(c.hidden_size, use_bias=not c.use_pre_ln or True, dtype=c.dtype,
                     param_dtype=jnp.float32, name="patch_embed")(x)

        cls_tok = self.param("class_embedding", nn.initializers.normal(0.02),
                             (c.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(c.dtype), (B, 1, c.hidden_size)), x],
            axis=1,
        )
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1 + c.num_patches, c.hidden_size), jnp.float32)
        x = x + pos[None, : x.shape[1]].astype(c.dtype)

        if c.use_pre_ln:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                             param_dtype=jnp.float32, name="pre_layernorm")(x)
        captured = {}
        for i in range(c.num_layers):
            x = ViTBlock(c, name=f"layer_{i}")(x)
            if i in capture_layers:
                # raw block output, pre final norm (the timm forward-hook view
                # the reference's multi-layer DINO reward taps,
                # rewards.py:437-461)
                captured[i] = x
        tokens = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                              param_dtype=jnp.float32, name="post_layernorm")(x)
        cls = tokens[:, 0]
        # HF CLIPVisionTransformer's last_hidden_state is PRE-post_layernorm
        # (only the pooled CLS gets the LN) — per-patch consumers that mirror
        # the reference patch scorer must read this view
        out = {"tokens": tokens, "cls": cls, "tokens_pre_norm": x}
        if captured:
            out["layer_tokens"] = captured
        if c.projection_dim is not None:
            out["pooled"] = nn.Dense(c.projection_dim, use_bias=False, dtype=c.dtype,
                                     param_dtype=jnp.float32,
                                     name="visual_projection")(cls)
        return out
