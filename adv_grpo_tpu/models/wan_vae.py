"""WAN 3D causal video VAE (encoder/decoder) in Flax.

The reference decodes WAN rollout latents through WanPipeline's
``AutoencoderKLWan`` — a causal 3D-conv autoencoder with per-channel latent
mean/std normalisation (adv_grpo/diffusers_patch/wan_pipeline_with_logprob.py:
343-371: ``latents = latents / (1/std) + mean`` then ``vae.decode``) — so
``video_ocr`` can score decoded frames. This is the TPU-native equivalent:

  * every conv is CAUSAL along time (left-pad only), so a frame never sees
    the future — streaming decode stays possible;
  * spatial compression 8x (3 stride-2 stages), temporal compression 4x
    (2 stride-2 temporal stages), z_dim 16, matching the WAN latent layout
    (B, 16, F', H/8, W/8);
  * decode applies the per-channel latents_mean/std denormalisation before
    the network, like the reference's postprocess path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    z_dim: int = 16
    base_channels: int = 96
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    # per downsample stage (len = len(channel_mults) - 1): spatial always /2,
    # temporal /2 where True -> total 8x spatial, 4x temporal like WAN
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    num_res_blocks: int = 2
    # per-channel latent normalisation (checkpoint values via convert_wan_vae)
    latents_mean: Tuple[float, ...] = (0.0,) * 16
    latents_std: Tuple[float, ...] = (1.0,) * 16
    dtype: Any = jnp.float32

    @classmethod
    def wan(cls, **o):
        return cls(**o)

    @classmethod
    def tiny(cls, **o):
        d = dict(z_dim=4, base_channels=8, channel_mults=(1, 2),
                 temporal_downsample=(True,), num_res_blocks=1,
                 latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)
        d.update(o)
        return cls(**d)

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.channel_mults) - 1)

    @property
    def temporal_factor(self) -> int:
        return 2 ** sum(self.temporal_downsample)


class CausalConv3d(nn.Module):
    """3D conv, causal on the time axis: left-pad (kt-1), SAME spatially.
    Input layout (B, F, H, W, C)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        st = self.strides[0]
        # left-pad kt - st: each output frame's window ENDS at the last input
        # frame of its stride group, so output i sees only inputs <= s*i+s-1
        # (pure kt-1 padding would right-shift windows and drop the newest
        # frame from every strided group)
        x = jnp.pad(x, ((0, 0), (kt - st, 0), (kh // 2, kh // 2),
                        (kw // 2, kw // 2), (0, 0)))
        return nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding="VALID", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class RMSNorm3d(nn.Module):
    """Per-position channel RMS norm — normalising over (F,H,W) like GroupNorm
    would couple every frame to every other and break temporal causality; the
    WAN VAE normalises the channel axis only."""

    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.eps) * w).astype(self.dtype)


class ResBlock3d(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = RMSNorm3d(x.shape[-1], dtype=self.dtype, name="norm1")(x)
        h = CausalConv3d(self.features, dtype=self.dtype,
                         name="conv1")(nn.silu(h))
        h = RMSNorm3d(self.features, dtype=self.dtype, name="norm2")(h)
        h = CausalConv3d(self.features, dtype=self.dtype,
                         name="conv2")(nn.silu(h))
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, dtype=self.dtype,
                         param_dtype=jnp.float32, name="skip")(x)
        return x + h


class WanVAEEncoder(nn.Module):
    cfg: WanVAEConfig

    @nn.compact
    def __call__(self, videos):
        """videos: (B, 3, F, H, W) -> (mean, logvar), each (B, z, F', H', W')."""
        c = self.cfg
        x = jnp.transpose(videos.astype(c.dtype), (0, 2, 3, 4, 1))  # BFHWC
        x = CausalConv3d(c.base_channels, name="conv_in")(x)
        for si, mult in enumerate(c.channel_mults):
            ch_out = c.base_channels * mult
            for bi in range(c.num_res_blocks):
                x = ResBlock3d(ch_out, name=f"block_{si}_{bi}")(x)
            if si < len(c.channel_mults) - 1:
                ts = 2 if c.temporal_downsample[si] else 1
                x = CausalConv3d(ch_out, strides=(ts, 2, 2),
                                 name=f"down_{si}")(x)
        x = ResBlock3d(x.shape[-1], name="mid")(x)
        x = RMSNorm3d(x.shape[-1], dtype=c.dtype, name="norm_out")(x)
        x = CausalConv3d(2 * c.z_dim, kernel=(1, 1, 1),
                         name="conv_out")(nn.silu(x))
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # B, 2z, F', H', W'
        mean, logvar = jnp.split(x.astype(jnp.float32), 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class WanVAEDecoder(nn.Module):
    cfg: WanVAEConfig

    @nn.compact
    def __call__(self, z):
        """z: DENORMALISED latents (B, z, F', H', W') -> frames (B,3,F,H,W)."""
        c = self.cfg
        x = jnp.transpose(z.astype(c.dtype), (0, 2, 3, 4, 1))  # BFHWC
        ch = c.base_channels * c.channel_mults[-1]
        x = CausalConv3d(ch, name="conv_in")(x)
        x = ResBlock3d(ch, name="mid")(x)
        for si in reversed(range(len(c.channel_mults))):
            ch_out = c.base_channels * c.channel_mults[si]
            for bi in range(c.num_res_blocks):
                x = ResBlock3d(ch_out, name=f"block_{si}_{bi}")(x)
            if si > 0:
                tf = 2 if c.temporal_downsample[si - 1] else 1
                x = jnp.repeat(jnp.repeat(jnp.repeat(x, tf, axis=1),
                                          2, axis=2), 2, axis=3)
                x = CausalConv3d(ch_out, name=f"up_{si}")(x)
        x = RMSNorm3d(x.shape[-1], dtype=c.dtype, name="norm_out")(x)
        x = CausalConv3d(3, name="conv_out")(nn.silu(x))
        x = jnp.transpose(x.astype(jnp.float32), (0, 4, 1, 2, 3))
        return jnp.tanh(x)  # frames in [-1, 1]


class WanVideoVAE(nn.Module):
    """Full VAE: ``encode`` returns NORMALISED latents (reference stat layout),
    ``decode`` accepts them (denormalising first, :354-363), ``__call__`` is
    the reconstruction round trip."""

    cfg: WanVAEConfig

    def setup(self):
        self.encoder = WanVAEEncoder(self.cfg)
        self.decoder = WanVAEDecoder(self.cfg)

    def _stats(self):
        c = self.cfg
        mu = jnp.asarray(c.latents_mean).reshape(1, c.z_dim, 1, 1, 1)
        std = jnp.asarray(c.latents_std).reshape(1, c.z_dim, 1, 1, 1)
        return mu, std

    def encode(self, videos, key=None):
        mean, logvar = self.encoder(videos)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, jnp.float32)
        mu, std = self._stats()
        return (mean - mu) / std

    def decode(self, latents):
        mu, std = self._stats()
        return self.decoder(latents.astype(jnp.float32) * std + mu)

    def __call__(self, videos, key=None):
        return self.decode(self.encode(videos, key))
