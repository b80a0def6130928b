"""WAN 3D causal video VAE — diffusers ``AutoencoderKLWan``-compatible.

The reference decodes WAN rollout latents through WanPipeline's pretrained
``AutoencoderKLWan`` after denormalising with the per-channel latent stats
(adv_grpo/diffusers_patch/wan_pipeline_with_logprob.py:353-363:
``latents = latents / (1/std) + mean`` then ``vae.decode``).  This module is
weight-interchangeable with that checkpoint (convert.convert_wan_vae maps the
full diffusers state dict; parity-tested against the chunked-cache torch
mirror in tests/mirrors/wan_vae_torch.py).

diffusers runs the VAE in a streaming frame-chunked mode: the encoder sees
frame 0 alone then groups of 4, the decoder one latent frame at a time, and
every causal conv carries a 2-frame cache between chunks.  On TPU we want one
static whole-sequence program, so each cached op is replaced by its exact
whole-sequence equivalent (identical outputs for any frame count ≡ 1 mod 4):

  * stride-1 causal conv, k_t=3   →  conv with 2 zero frames left-padded
    (chunk 0 pads 2 zeros; later chunks prepend the previous 2 frames —
    exactly a whole-sequence left-pad-2 conv);
  * ``downsample3d`` time conv    →  frame 0 passes through UNTOUCHED (the
    first chunk bypasses the time conv entirely and only seeds the cache),
    then a VALID stride-2 k_t=3 conv over the full sequence produces frames
    1.. (windows (0,1,2), (2,3,4), ...);
  * ``upsample3d`` time conv      →  frame 0 again bypasses (the first chunk
    marks the cache 'Rep' and is later replaced by ZEROS in the windows of
    the following chunks), so: zero frame 0, left-pad-2 causal conv, DROP
    output 0, split each 2C-channel output into an (earlier, later) frame
    pair, and prepend the untouched frame 0 — 1 + 2*(T-1) frames out.

Everything else (RMS norms over channels only, per-frame single-head spatial
attention in the mid block, nearest-2x + conv spatial resamples) is
frame-local and chunking-invariant.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    """Field names/defaults follow the diffusers AutoencoderKLWan config
    (Wan2.1 checkpoints: base_dim 96, z 16, 8x spatial / 4x temporal)."""

    z_dim: int = 16
    base_dim: int = 96
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    # per downsample stage (len = len(dim_mult) - 1); True -> temporal /2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    # per-channel latent normalisation (checkpoint values via convert_wan_vae)
    latents_mean: Tuple[float, ...] = (0.0,) * 16
    latents_std: Tuple[float, ...] = (1.0,) * 16
    dtype: Any = jnp.float32

    @classmethod
    def wan(cls, **o):
        return cls(**o)

    @classmethod
    def tiny(cls, **o):
        d = dict(z_dim=4, base_dim=8, dim_mult=(1, 2),
                 temperal_downsample=(True,), num_res_blocks=1,
                 latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)
        d.update(o)
        return cls(**d)

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @property
    def temporal_factor(self) -> int:
        return 2 ** sum(self.temperal_downsample)

    def latent_frames(self, frames: int) -> int:
        """T video frames (T ≡ 1 mod temporal_factor) -> latent frames."""
        return 1 + (frames - 1) // self.temporal_factor


class WanRMSNorm(nn.Module):
    """diffusers WanRMS_norm: F.normalize over channels * sqrt(C) * gamma,
    i.e. x / max(||x||_2, 1e-12) * sqrt(C) * gamma (channel-last here)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("gamma", nn.initializers.ones, (self.dim,),
                       jnp.float32)
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        y = xf / jnp.maximum(norm, 1e-12) * (self.dim ** 0.5) * g
        return y.astype(self.dtype)


class WanCausalConv3d(nn.Module):
    """3D conv, causal in time: left-pad (kt-1) zeros, SAME spatially.
    Input layout (B, F, H, W, C). Matches WanCausalConv3d's whole-sequence
    behaviour (2*pad_t left zeros, no right pad)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                        (kw // 2, kw // 2), (0, 0)))
        return nn.Conv(self.features, self.kernel, padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(x)


class WanResBlock(nn.Module):
    """WanResidualBlock: rms->silu->conv3 twice + (1x1x1 causal) shortcut."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        if x.shape[-1] != self.features:
            h = WanCausalConv3d(self.features, (1, 1, 1), dtype=self.dtype,
                                name="conv_shortcut")(x)
        y = WanRMSNorm(x.shape[-1], dtype=self.dtype, name="norm1")(x)
        y = WanCausalConv3d(self.features, dtype=self.dtype,
                            name="conv1")(nn.silu(y))
        y = WanRMSNorm(self.features, dtype=self.dtype, name="norm2")(y)
        y = WanCausalConv3d(self.features, dtype=self.dtype,
                            name="conv2")(nn.silu(y))
        return h + y


class WanAttnBlock(nn.Module):
    """WanAttentionBlock: per-frame single-head attention over H*W tokens
    (1x1-conv qkv/proj, rms pre-norm, residual)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        y = WanRMSNorm(C, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="to_qkv")(y).reshape(B * F, H * W, 3 * C)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = jax.nn.softmax(
            (q @ jnp.swapaxes(k, -1, -2)).astype(jnp.float32)
            / (C ** 0.5), axis=-1).astype(self.dtype)
        o = (a @ v).reshape(B, F, H, W, C)
        o = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj")(o)
        return x + o


class WanMidBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = WanResBlock(self.dim, dtype=self.dtype, name="res0")(x)
        x = WanAttnBlock(self.dim, dtype=self.dtype, name="attn0")(x)
        x = WanResBlock(self.dim, dtype=self.dtype, name="res1")(x)
        return x


def _spatial(fn, x):
    """Apply a per-frame 2D op: (B,F,H,W,C) -> fold F into batch."""
    B, F = x.shape[:2]
    y = fn(x.reshape(B * F, *x.shape[2:]))
    return y.reshape(B, F, *y.shape[1:])


class WanDownsample(nn.Module):
    """WanResample downsample2d/3d: zero-pad (right/bottom) stride-2 spatial
    conv; 3d adds the whole-sequence-equivalent time conv (frame 0 bypass +
    valid stride-2 k3)."""

    dim: int
    temporal: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="resample_conv")

        def down2d(f):
            return conv(jnp.pad(f, ((0, 0), (0, 1), (0, 1), (0, 0))))

        x = _spatial(down2d, x)
        if self.temporal:
            tc = nn.Conv(self.dim, (3, 1, 1), strides=(2, 1, 1),
                         padding="VALID", dtype=self.dtype,
                         param_dtype=jnp.float32, name="time_conv")
            # chunk 0 only seeds the cache -> frame 0 bypasses the conv;
            # remaining output j = conv(x[2j-2], x[2j-1], x[2j])
            x = jnp.concatenate([x[:, :1], tc(x)], axis=1)
        return x


class WanUpsample(nn.Module):
    """WanResample upsample2d/3d: (3d) frame-0-bypass time conv doubling
    frames, then nearest-2x + conv halving channels."""

    dim: int  # input channel count; spatial conv outputs dim // 2
    temporal: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.temporal:
            tc = nn.Conv(2 * self.dim, (3, 1, 1), padding="VALID",
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="time_conv")
            B, F, H, W, C = x.shape
            # frame 0 is cached as 'Rep' -> bypasses the conv and appears as
            # ZEROS in the windows of later frames; outputs for j>=1 split
            # channel-wise into an (earlier, later) frame pair
            z = x.at[:, :1].set(0.0)
            y = tc(jnp.pad(z, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0))))
            y = y[:, 1:].reshape(B, F - 1, H, W, 2, C)
            y = jnp.moveaxis(y, 4, 2).reshape(B, 2 * (F - 1), H, W, C)
            x = jnp.concatenate([x[:, :1], y], axis=1)
        conv = nn.Conv(self.dim // 2, (3, 3), padding="SAME",
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="resample_conv")

        def up2d(f):
            # nearest-exact at scale 2 == pixel repetition
            return conv(jnp.repeat(jnp.repeat(f, 2, axis=1), 2, axis=2))

        return _spatial(up2d, x)


class WanVAEEncoder(nn.Module):
    cfg: WanVAEConfig

    @nn.compact
    def __call__(self, videos):
        """videos (B,3,F,H,W), F ≡ 1 mod temporal_factor ->
        (mean, logvar) each (B, z, F', H/8, W/8)."""
        c = self.cfg
        dims = [c.base_dim * u for u in (1,) + tuple(c.dim_mult)]
        x = jnp.transpose(videos.astype(c.dtype), (0, 2, 3, 4, 1))  # BFHWC
        x = WanCausalConv3d(dims[0], dtype=c.dtype, name="conv_in")(x)
        n, scale = 0, 1.0
        for i, out_dim in enumerate(dims[1:]):
            for _ in range(c.num_res_blocks):
                x = WanResBlock(out_dim, dtype=c.dtype, name=f"down_{n}")(x)
                n += 1
                if scale in c.attn_scales:
                    x = WanAttnBlock(out_dim, dtype=c.dtype,
                                     name=f"down_{n}")(x)
                    n += 1
            if i != len(c.dim_mult) - 1:
                x = WanDownsample(out_dim, c.temperal_downsample[i],
                                  dtype=c.dtype, name=f"down_{n}")(x)
                n += 1
                scale /= 2.0
        x = WanMidBlock(dims[-1], dtype=c.dtype, name="mid")(x)
        x = WanRMSNorm(dims[-1], dtype=c.dtype, name="norm_out")(x)
        x = WanCausalConv3d(2 * c.z_dim, dtype=c.dtype,
                            name="conv_out")(nn.silu(x))
        x = WanCausalConv3d(2 * c.z_dim, (1, 1, 1), dtype=c.dtype,
                            name="quant_conv")(x)
        x = jnp.transpose(x.astype(jnp.float32), (0, 4, 1, 2, 3))
        mean, logvar = jnp.split(x, 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class WanVAEDecoder(nn.Module):
    cfg: WanVAEConfig

    @nn.compact
    def __call__(self, z):
        """z: DENORMALISED latents (B, z, F', H', W') -> frames (B,3,F,H,W)
        in [-1, 1] (diffusers clamps, autoencoder_kl_wan decode)."""
        c = self.cfg
        mults = tuple(c.dim_mult)
        dims = [c.base_dim * u for u in (mults[-1],) + mults[::-1]]
        t_up = tuple(c.temperal_downsample)[::-1]
        x = jnp.transpose(z.astype(c.dtype), (0, 2, 3, 4, 1))  # BFHWC
        x = WanCausalConv3d(c.z_dim, (1, 1, 1), dtype=c.dtype,
                            name="post_quant_conv")(x)
        x = WanCausalConv3d(dims[0], dtype=c.dtype, name="conv_in")(x)
        x = WanMidBlock(dims[0], dtype=c.dtype, name="mid")(x)
        n, scale = 0, 1.0 / 2 ** (len(mults) - 2)
        for i, out_dim in enumerate(dims[1:]):
            for _ in range(c.num_res_blocks + 1):
                x = WanResBlock(out_dim, dtype=c.dtype, name=f"up_{n}")(x)
                n += 1
                if scale in c.attn_scales:
                    x = WanAttnBlock(out_dim, dtype=c.dtype,
                                     name=f"up_{n}")(x)
                    n += 1
            if i != len(mults) - 1:
                x = WanUpsample(out_dim, t_up[i], dtype=c.dtype,
                                name=f"up_{n}")(x)
                n += 1
                scale *= 2.0
        x = WanRMSNorm(x.shape[-1], dtype=c.dtype, name="norm_out")(x)
        x = WanCausalConv3d(3, dtype=c.dtype, name="conv_out")(nn.silu(x))
        x = jnp.transpose(x.astype(jnp.float32), (0, 4, 1, 2, 3))
        return jnp.clip(x, -1.0, 1.0)


class WanVideoVAE(nn.Module):
    """Full VAE: ``encode`` returns NORMALISED latents (the sampler-side
    layout, (x-mean)/std), ``decode`` accepts them — denormalising first like
    wan_pipeline_with_logprob.py:354-363 — and ``__call__`` round-trips."""

    cfg: WanVAEConfig

    def setup(self):
        self.encoder = WanVAEEncoder(self.cfg)
        self.decoder = WanVAEDecoder(self.cfg)

    def _stats(self):
        c = self.cfg
        mu = jnp.asarray(c.latents_mean).reshape(1, c.z_dim, 1, 1, 1)
        std = jnp.asarray(c.latents_std).reshape(1, c.z_dim, 1, 1, 1)
        return mu, std

    def encode_raw(self, videos):
        """(mean, logvar) in the checkpoint's latent space (no stats)."""
        return self.encoder(videos)

    def encode(self, videos, key=None):
        mean, logvar = self.encoder(videos)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, jnp.float32)
        mu, std = self._stats()
        return (mean - mu) / std

    def decode_raw(self, latents):
        """Decode checkpoint-space latents (no stats)."""
        return self.decoder(latents)

    def decode(self, latents):
        mu, std = self._stats()
        return self.decoder(latents.astype(jnp.float32) * std + mu)

    def __call__(self, videos, key=None):
        return self.decode(self.encode(videos, key))
