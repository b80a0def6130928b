"""BLIP text encoder + ImageReward model in Flax.

Native reimplementation of the ImageReward scorer the reference wraps through
the pip package (adv_grpo/imagereward_scorer.py:12-21 -> ImageReward.load ->
inference_rank): a BLIP med-BERT text encoder cross-attending to frozen
ViT-L/16 image tokens, CLS hidden state through a 5-layer linear MLP, score
z-normalised with the published mean/std. Weight conversion from the
ImageReward checkpoint: models.convert.convert_imagereward; text-encoder
activation parity is tested against transformers' BlipTextModel (the HF port
of the same med BERT).

Semantics (ImageReward repo, ImageReward/ImageReward.py):
  * text: BERT-base post-LN encoder, BIDIRECTIONAL self-attention, cross
    attention to image tokens in every layer ('text' mode — no causal mask)
  * image: timm ViT (pre-LN, CLS token, no LayerScale) at 224^2, CLIP
    mean/std preprocessing
  * score = MLP(txt_hidden[:, 0]) with NO activations (linear stack + the
    train-time dropouts, identity at inference); reward = (score - mean)/std
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# published z-normalisation constants (ImageReward repo, ImageReward.py)
IMAGEREWARD_MEAN = 0.16717362830052426
IMAGEREWARD_STD = 1.0333394966054072


@dataclasses.dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = 30524
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 1024  # vision hidden size (cross-attn KV)
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @classmethod
    def med_base(cls, **o):
        return cls(**o)

    @classmethod
    def tiny(cls, **o):
        d = dict(vocab_size=50, hidden_size=32, num_layers=2, num_heads=2,
                 intermediate_size=64, max_position_embeddings=16,
                 encoder_width=24)
        d.update(o)
        return cls(**d)


class _BertAttention(nn.Module):
    """Post-LN BERT attention block: out = LN(x + dense(attn(x))).
    Cross-attention = same module with kv from the image tokens."""

    cfg: BlipTextConfig

    @nn.compact
    def __call__(self, x, kv, mask):
        c = self.cfg
        D = c.hidden_size
        nh, hd = c.num_heads, D // c.num_heads
        B, S, _ = x.shape
        Sk = kv.shape[1]
        dense = lambda feat, n: nn.Dense(feat, dtype=c.dtype,
                                         param_dtype=jnp.float32, name=n)
        q = dense(D, "query")(x).reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = dense(D, "key")(kv).reshape(B, Sk, nh, hd).transpose(0, 2, 1, 3)
        v = dense(D, "value")(kv).reshape(B, Sk, nh, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * hd**-0.5
        if mask is not None:
            s = jnp.where(mask[:, None, None, :], s,
                          jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
        o = dense(D, "out_dense")(o.reshape(B, S, D))
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                            param_dtype=jnp.float32, name="out_ln")(x + o)


class BlipTextLayer(nn.Module):
    cfg: BlipTextConfig

    @nn.compact
    def __call__(self, x, image_tokens, attn_mask):
        c = self.cfg
        x = _BertAttention(c, name="self_attn")(x, x, attn_mask)
        if image_tokens is not None:
            x = _BertAttention(c, name="cross_attn")(x, image_tokens, None)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype,
                     param_dtype=jnp.float32, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, param_dtype=jnp.float32,
                     name="output")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                            param_dtype=jnp.float32, name="output_ln")(x + h)


class BlipTextEncoder(nn.Module):
    """input_ids (B, S) [+ per-layer cross-attn to image tokens] -> (B, S, D).
    Bidirectional (the med BERT 'text' mode — never causal)."""

    cfg: BlipTextConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, image_tokens=None):
        c = self.cfg
        B, S = input_ids.shape
        x = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                     param_dtype=jnp.float32, name="word_embeddings")(input_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (c.max_position_embeddings, c.hidden_size),
                         jnp.float32)
        x = x + pos[None, :S].astype(c.dtype)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         param_dtype=jnp.float32, name="embeddings_ln")(x)
        for i in range(c.num_layers):
            x = BlipTextLayer(c, name=f"layer_{i}")(x, image_tokens,
                                                    attention_mask)
        return x


class ImageRewardHead(nn.Module):
    """The ImageReward MLP: 768->1024->128->64->16->1, LINEAR (the only
    nonlinearity in the original is train-time dropout)."""

    @nn.compact
    def __call__(self, x):
        for feat, name in ((1024, "fc0"), (128, "fc1"), (64, "fc2"),
                           (16, "fc3"), (1, "out")):
            x = nn.Dense(feat, param_dtype=jnp.float32, name=name)(x)
        return x.squeeze(-1)


class ImageRewardModel:
    """Bundle: timm-style ViT image tokens -> cross-attended text CLS -> MLP.

    ``score(params, images, input_ids, attention_mask)`` returns the
    z-normalised reward (the pip package's inference_rank score)."""

    def __init__(self, text_cfg: Optional[BlipTextConfig] = None,
                 vision_cfg=None, image_size: int = 224):
        from adv_grpo_tpu.models.vit import ViTConfig, VisionTransformer

        self.text_cfg = text_cfg or BlipTextConfig.med_base()
        self.vision_cfg = vision_cfg or ViTConfig(
            image_size=image_size, patch_size=16, hidden_size=1024,
            intermediate_size=4096, num_layers=24, num_heads=16,
            layer_norm_eps=1e-6, use_pre_ln=False, layer_scale_init=None,
            projection_dim=None)
        self.image_size = image_size
        self.vision = VisionTransformer(self.vision_cfg)
        self.text = BlipTextEncoder(self.text_cfg)
        self.head = ImageRewardHead()
        self.score = jax.jit(self.score)

    def init_params(self, key):
        import numpy as np

        k1, k2, k3 = jax.random.split(key, 3)
        img = jnp.zeros((1, 3, self.image_size, self.image_size))
        ids = jnp.zeros((1, 4), jnp.int32)
        img_tokens = jnp.zeros((1, 2, self.text_cfg.encoder_width))
        return {
            "vision": self.vision.init(k1, img)["params"],
            "text": self.text.init(k2, ids, None, img_tokens)["params"],
            "head": self.head.init(
                k3, jnp.zeros((1, self.text_cfg.hidden_size)))["params"],
        }

    def score(self, params, images, input_ids, attention_mask=None):
        """images: (B, 3, H, W) in [-1, 1]; returns z-normalised rewards."""
        from adv_grpo_tpu.rewards.preprocess import (
            CLIP_MEAN, CLIP_STD, preprocess,
        )

        pix = preprocess(images, self.image_size, CLIP_MEAN, CLIP_STD)
        tokens = self.vision.apply({"params": params["vision"]}, pix)["tokens"]
        tokens = jax.lax.stop_gradient(tokens)
        hidden = self.text.apply({"params": params["text"]}, input_ids,
                                 attention_mask, tokens)
        raw = self.head.apply({"params": params["head"]}, hidden[:, 0])
        return (raw - IMAGEREWARD_MEAN) / IMAGEREWARD_STD
