"""StyleGAN2-style image discriminator for the ``discriminator`` reward.

The reference scores images with an externally trained StyleGAN/PatchGAN
discriminator: sigmoid(logits) with shape dispatch over [B] / [B,1] /
[B,1,H',W'] outputs (adv_grpo/rewards.py:611-638). This module provides a
TPU-native discriminator network (residual downsampling trunk + minibatch
stddev + dense head, the StyleGAN2 D topology) plus the same shape-dispatched
scoring rule, so both a locally trained D and imported logits behave
identically to the reference reward.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class StyleGANDConfig:
    image_size: int = 256
    base_channels: int = 32
    max_channels: int = 512
    mbstd_group_size: int = 4

    @property
    def num_blocks(self) -> int:
        # downsample to 4x4
        n, size = 0, self.image_size
        while size > 4:
            size //= 2
            n += 1
        return n

    def block_channels(self) -> Tuple[int, ...]:
        return tuple(min(self.base_channels * 2 ** i, self.max_channels)
                     for i in range(self.num_blocks + 1))


def minibatch_stddev(x: jnp.ndarray, group_size: int = 4) -> jnp.ndarray:
    """Append the cross-sample feature stddev as one constant channel
    (StyleGAN2's anti-collapse statistic). x: (B, H, W, C) -> (B, H, W, C+1)."""
    B = x.shape[0]
    g = min(group_size, B)
    g = B // (B // g)  # largest divisor <= group_size
    y = x.reshape((g, B // g) + x.shape[1:])
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)  # (B/g, H, W, C)
    y = jnp.mean(y, axis=(1, 2, 3), keepdims=True)  # (B/g, 1, 1, 1)
    y = jnp.tile(y, (g,) + x.shape[1:3] + (1,))
    return jnp.concatenate([x, y], axis=-1)


class ResidualBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        skip = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       name="skip")(x)
        skip = nn.avg_pool(skip, (2, 2), strides=(2, 2))
        h = nn.leaky_relu(nn.Conv(x.shape[-1], (3, 3), name="conv0")(x), 0.2)
        h = nn.leaky_relu(nn.Conv(self.out_channels, (3, 3), name="conv1")(h),
                          0.2)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        return (h + skip) / jnp.sqrt(2.0)


class StyleGANDiscriminator(nn.Module):
    cfg: StyleGANDConfig

    @nn.compact
    def __call__(self, images):
        """images: (B, 3, H, W) in [-1, 1] -> logits (B,)."""
        chans = self.cfg.block_channels()
        x = jnp.transpose(images.astype(jnp.float32), (0, 2, 3, 1))  # NHWC
        x = nn.leaky_relu(nn.Conv(chans[0], (1, 1), name="from_rgb")(x), 0.2)
        for i in range(self.cfg.num_blocks):
            x = ResidualBlock(chans[i + 1], name=f"block_{i}")(x)
        x = minibatch_stddev(x, self.cfg.mbstd_group_size)
        x = nn.leaky_relu(nn.Conv(chans[-1], (3, 3), name="conv_out")(x), 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(nn.Dense(chans[-1], name="fc0")(x), 0.2)
        return nn.Dense(1, name="fc_out")(x).squeeze(-1)


def logits_to_scores(logits: jnp.ndarray) -> jnp.ndarray:
    """The reference's shape dispatch (rewards.py:622-634): StyleGAN [B] or
    [B,1] -> sigmoid; PatchGAN [B,1,H',W'] -> mean(sigmoid)."""
    if logits.ndim == 1:
        return jax.nn.sigmoid(logits)
    if logits.ndim == 2 and logits.shape[1] == 1:
        return jax.nn.sigmoid(logits.squeeze(1))
    if logits.ndim == 4 and logits.shape[1] == 1:
        return jnp.mean(jax.nn.sigmoid(logits), axis=(1, 2, 3))
    raise ValueError(f"unexpected discriminator logits shape: {logits.shape}")


class StyleGANScorer:
    """The ``discriminator`` reward: sigmoid(D(images)) in [0, 1].

    Images arrive in [-1, 1] already (the rollout decode contract); inputs in
    [0, 255] or [0, 1] are renormalised like the reference (:614-618).
    """

    def __init__(self, cfg: StyleGANDConfig = None):
        self.cfg = cfg or StyleGANDConfig()
        self.model = StyleGANDiscriminator(self.cfg)
        self.score = jax.jit(self.score)

    def init_params(self, key):
        img = jnp.zeros((2, 3, self.cfg.image_size, self.cfg.image_size))
        return self.model.init(key, img)["params"]

    def _normalise(self, images):
        images = images.astype(jnp.float32)
        mx = jnp.max(jnp.abs(images))
        images = jnp.where(mx > 1.5, images / 255.0, images)  # 0..255 input
        # already-signed input stays; unsigned [0,1] is centred
        mn = jnp.min(images)
        return jnp.where(mn >= 0.0, (images - 0.5) * 2.0, images)

    def _resize(self, images):
        s = self.cfg.image_size
        if images.shape[-2:] != (s, s):
            images = jax.image.resize(
                images, images.shape[:2] + (s, s), method="bilinear")
        return images

    def score(self, params, images):
        x = self._resize(self._normalise(images))
        return logits_to_scores(self.model.apply({"params": params}, x))
