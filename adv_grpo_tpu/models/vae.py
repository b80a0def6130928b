"""SD3-class AutoencoderKL (16-channel latents) in Flax.

From-scratch TPU implementation of the VAE the reference uses for final image
decode (adv_grpo/diffusers_patch/sd3_pipeline_with_logprob_fast.py:667-670:
``latents/scaling_factor + shift_factor`` then ``vae.decode``) and for encoding
external images in the distribution-transfer path (``image_to_latent``,
:686-705: ``(posterior.sample() - shift) * scaling``).

Architecture semantics (diffusers AutoencoderKL, SD3 config: block channels
(128, 256, 512, 512), 2 enc / 3 dec resnets per block, GroupNorm(32), single
mid-attention, latent_channels 16):
  encoder: conv_in -> 4 down blocks (stride-2 conv after the first 3) -> mid
           (resnet, attn, resnet) -> GN -> silu -> conv_out -> (mean, logvar)
  decoder: conv_in -> mid -> 4 up blocks (nearest-2x upsample + conv after the
           first 3) -> GN -> silu -> conv_out -> RGB in [-1, 1]

TPU notes: NHWC internally (XLA-native conv layout); fp32 by default — the
reference keeps the VAE in fp32 (train_sd3_fast_pickscore.py:481) because
decoded pixels feed reward scorers whose values set advantages.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 1.5305
    shift_factor: float = 0.0609
    dtype: Any = jnp.float32

    @classmethod
    def sd3(cls, **overrides) -> "VAEConfig":
        return cls(**overrides)

    @classmethod
    def flux(cls, **overrides) -> "VAEConfig":
        """Flux.1 VAE: same AutoencoderKL topology as SD3 (16 latent
        channels), different latent normalisation constants (diffusers
        black-forest-labs/FLUX.1-dev vae/config.json)."""
        defaults = dict(scaling_factor=0.3611, shift_factor=0.1159)
        defaults.update(overrides)
        return cls(**defaults)

    @classmethod
    def tiny(cls, **overrides) -> "VAEConfig":
        defaults = dict(block_out_channels=(8, 16), layers_per_block=1,
                        norm_num_groups=4, latent_channels=4)
        defaults.update(overrides)
        return cls(**defaults)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def _gn(x, groups, name_scope, module):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=module.cfg.dtype,
                        param_dtype=jnp.float32, name=name_scope)(x)


class ResnetBlock(nn.Module):
    cfg: VAEConfig
    out_ch: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = _gn(x, c.norm_num_groups, "norm1", self)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=c.dtype,
                    param_dtype=jnp.float32, name="conv1")(nn.silu(h))
        h = _gn(h, c.norm_num_groups, "norm2", self)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=c.dtype,
                    param_dtype=jnp.float32, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=c.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over (H*W) tokens."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, H, W, C = x.shape
        h = _gn(x, c.norm_num_groups, "group_norm", self).reshape(B, H * W, C)
        dense = lambda n: nn.Dense(C, dtype=c.dtype, param_dtype=jnp.float32, name=n)
        q, k, v = dense("to_q")(h), dense("to_k")(h), dense("to_v")(h)
        s = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
        p = jax.nn.softmax(s * (C ** -0.5), axis=-1)
        o = jnp.einsum("bqk,bkc->bqc", p, v.astype(jnp.float32)).astype(c.dtype)
        o = dense("to_out")(o).reshape(B, H, W, C)
        return x + o


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1, dtype=c.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock(c, ch, name=f"down_{i}_res_{j}")(h)
            if i < len(c.block_out_channels) - 1:
                # diffusers Downsample2D: asymmetric pad (0,1) then stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID", dtype=c.dtype,
                            param_dtype=jnp.float32, name=f"down_{i}_downsample")(h)
        ch = c.block_out_channels[-1]
        h = ResnetBlock(c, ch, name="mid_res_0")(h)
        h = AttnBlock(c, name="mid_attn")(h)
        h = ResnetBlock(c, ch, name="mid_res_1")(h)
        h = _gn(h, c.norm_num_groups, "conv_norm_out", self)
        h = nn.Conv(2 * c.latent_channels, (3, 3), padding=1, dtype=c.dtype,
                    param_dtype=jnp.float32, name="conv_out")(nn.silu(h))
        return h  # (B, H/8, W/8, 2*latent_channels): mean ++ logvar


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        rev = tuple(reversed(c.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=c.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z)
        h = ResnetBlock(c, rev[0], name="mid_res_0")(h)
        h = AttnBlock(c, name="mid_attn")(h)
        h = ResnetBlock(c, rev[0], name="mid_res_1")(h)
        for i, ch in enumerate(rev):
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock(c, ch, name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=c.dtype,
                            param_dtype=jnp.float32, name=f"up_{i}_upsample")(h)
        h = _gn(h, c.norm_num_groups, "conv_norm_out", self)
        h = nn.Conv(c.out_channels, (3, 3), padding=1, dtype=c.dtype,
                    param_dtype=jnp.float32, name="conv_out")(nn.silu(h))
        return h


class AutoencoderKL(nn.Module):
    """decode(latents) and encode(images); NCHW at the API boundary."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def decode(self, latents):
        """Raw latents (B, C_lat, h, w) -> images (B, 3, H, W) in [-1, 1] approx.

        Callers apply the reference's scaling first:
        ``z = latents / scaling_factor + shift_factor`` (sd3_..._fast.py:667-668).
        """
        z = latents.transpose(0, 2, 3, 1)
        img = self.decoder(z)
        return img.transpose(0, 3, 1, 2)

    def encode_moments(self, images):
        """images (B, 3, H, W) in [-1, 1] -> (mean, logvar), each (B, C_lat, h, w)."""
        h = self.encoder(images.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        mean, logvar = jnp.split(h, 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images, key=None):
        """Sample (or take the mode when key is None) of the posterior, with the
        reference's latent normalisation: (z - shift) * scaling
        (sd3_..._fast.py:700-703)."""
        mean, logvar = self.encode_moments(images)
        if key is not None:
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return (mean - self.cfg.shift_factor) * self.cfg.scaling_factor

    def __call__(self, images, key=None):
        z = self.encode(images, key)
        return self.decode(z / self.cfg.scaling_factor + self.cfg.shift_factor)
