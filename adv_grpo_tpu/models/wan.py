"""WAN-class text-to-video diffusion transformer in Flax.

The policy model behind the reference's WAN rollout
(adv_grpo/diffusers_patch/wan_pipeline_with_logprob.py — loaded from diffusers
WanPipeline; SURVEY.md marks the family phase-3). Architecture semantics
(diffusers WanTransformer3DModel, T2V):

  * 5-D latents (B, C, F, H, W) patchified (1, 2, 2) -> tokens (F * H/2 * W/2)
  * sinusoidal timestep -> MLP -> per-block 6-way modulation added to a learned
    scale-shift table
  * N blocks of [self-attention with 3-axis (t, h, w) RoPE + RMS qk-norm] ->
    [cross-attention to UMT5 text states] -> [GELU FFN], all residual
  * scale-shift output norm -> linear -> 3D unpatchify

Attention via ops.attention.mha_bshd (Pallas flash on TPU, transpose-free). The UMT5 text encoder is
models/t5.py (WAN uses the same gated-gelu UMT5 family).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.models.mmdit import (
    HeadRMSNorm, _layer_norm, _mod_ln, sincos_timestep_embedding)
from adv_grpo_tpu.models.flux import apply_rope_bshd, rope_freqs
from adv_grpo_tpu.models.lora import LoRADense, fused_qkv_proj
from adv_grpo_tpu.ops.attention import mha_bshd


@dataclasses.dataclass(frozen=True)
class WanConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_layers: int = 30
    attention_head_dim: int = 128
    num_attention_heads: int = 12
    text_dim: int = 4096
    ffn_dim: int = 8960
    rope_axes_dims: Tuple[int, ...] = (44, 42, 42)  # sums to head_dim
    cross_attn_norm: bool = True  # WAN norm2 is an AFFINE fp32 LayerNorm
    dtype: Any = jnp.bfloat16
    remat: bool = True
    attention_backend: Optional[str] = None
    # sibling projections of one activation as ONE matmul: self-attn q/k/v,
    # cross-attn k/v over text (models.lora.fused_qkv_proj)
    fused_qkv: bool = True
    # LoRA on the attention projections (self q/k/v/out + cross q/k/v/out),
    # mirroring the MMDiT/Flux coverage. rank 0 == plain Dense.
    lora_rank: int = 0
    lora_alpha: float = 1.0

    @property
    def hidden_dim(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @classmethod
    def t2v_1_3b(cls, **o):
        return cls(**o)

    @classmethod
    def tiny(cls, **o):
        d = dict(num_layers=2, attention_head_dim=16, num_attention_heads=2,
                 text_dim=32, ffn_dim=64, rope_axes_dims=(8, 4, 4),
                 dtype=jnp.float32, remat=False)
        d.update(o)
        return cls(**d)


def make_video_ids(f: int, gh: int, gw: int) -> np.ndarray:
    """(S, 3) = (frame, row, col) token ids for 3-axis RoPE."""
    t, h, w = np.meshgrid(np.arange(f), np.arange(gh), np.arange(gw),
                          indexing="ij")
    return np.stack([t, h, w], axis=-1).reshape(-1, 3).astype(np.int32)


class WanBlock(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, text, temb6, cos, sin, lora_scale=1.0):
        c = self.cfg
        H, d = c.num_attention_heads, c.attention_head_dim
        dim = c.hidden_dim
        B, S, _ = x.shape
        # learned per-block scale-shift table + time modulation (WAN style)
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (6, dim), jnp.float32)
        mods = [table[i][None].astype(c.dtype) + temb6[i] for i in range(6)]
        shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = mods

        dense = lambda n: (lambda y: LoRADense(
            dim, lora_rank=c.lora_rank, lora_alpha=c.lora_alpha,
            dtype=c.dtype, name=n)(y, lora_scale=lora_scale))

        # self-attention with 3D RoPE (transpose-free BSHD layout: pad fuses
        # into one zero-tail concat per tensor). WAN's qk-norm is
        # rms_norm_ACROSS_heads (diffusers WanTransformer3DModel: RMSNorm over
        # the full H*d inner dim, weight (H*d,)) — num_heads=1 expresses that
        # through the same fused kernel
        rms = lambda n: HeadRMSNorm(dim, num_heads=1, dtype=c.dtype, name=n)
        h = _mod_ln(x, scale_sa, shift_sa, c.dtype)
        if c.fused_qkv:
            # LoRADense(rank=0) == Dense (same kernel/bias tree + init); one
            # matmul reads the modulated activation once for q/k/v
            mk = lambda n: LoRADense(dim, lora_rank=c.lora_rank,
                                     lora_alpha=c.lora_alpha, dtype=c.dtype,
                                     in_features=h.shape[-1], name=n)
            q, k, v = fused_qkv_proj([mk("to_q"), mk("to_k"), mk("to_v")], h,
                                     lora_scale)
            q, k = rms("norm_q")(q), rms("norm_k")(k)
        else:
            q = rms("norm_q")(dense("to_q")(h))
            k = rms("norm_k")(dense("to_k")(h))
            v = dense("to_v")(h)
        pad = (-S) % 128
        if pad:
            zt = lambda a: jnp.concatenate(
                [a, jnp.zeros((B, pad, dim), a.dtype)], axis=1)
            q, k, v = zt(q), zt(k), zt(v)
        cos_p = jnp.pad(cos, ((0, pad), (0, 0))) if pad else cos
        sin_p = jnp.pad(sin, ((0, pad), (0, 0))) if pad else sin
        q = apply_rope_bshd(q, cos_p, sin_p, H)
        k = apply_rope_bshd(k, cos_p, sin_p, H)
        att = mha_bshd(q, k, v, num_heads=H, kv_len=S,
                       backend=c.attention_backend)
        x = x + gate_sa[:, None] * dense("to_out")(att[:, :S])

        # cross-attention to text (no time modulation; WAN norm2 is an
        # affine LayerNorm when cross_attn_norm, diffusers WanTransformerBlock)
        hq = _layer_norm(x, c.dtype)
        if c.cross_attn_norm:
            n2w = self.param("norm2_weight", nn.initializers.ones, (dim,),
                             jnp.float32)
            n2b = self.param("norm2_bias", nn.initializers.zeros, (dim,),
                             jnp.float32)
            hq = hq * n2w.astype(c.dtype) + n2b.astype(c.dtype)
        St = text.shape[1]
        q = rms("cross_norm_q")(dense("cross_to_q")(hq))
        if c.fused_qkv:
            mkt = lambda n: LoRADense(dim, lora_rank=c.lora_rank,
                                      lora_alpha=c.lora_alpha, dtype=c.dtype,
                                      in_features=text.shape[-1], name=n)
            k, v = fused_qkv_proj([mkt("cross_to_k"), mkt("cross_to_v")],
                                  text, lora_scale)
            k = rms("cross_norm_k")(k)
        else:
            k = rms("cross_norm_k")(dense("cross_to_k")(text))
            v = dense("cross_to_v")(text)
        padq = (-S) % 128
        padk = (-St) % 128
        if padq:
            q = jnp.concatenate(
                [q, jnp.zeros((B, padq, dim), q.dtype)], axis=1)
        if padk:
            ztk = lambda a: jnp.concatenate(
                [a, jnp.zeros((B, padk, dim), a.dtype)], axis=1)
            k, v = ztk(k), ztk(v)
        catt = mha_bshd(q, k, v, num_heads=H, kv_len=St,
                        backend=c.attention_backend)
        x = x + dense("cross_to_out")(catt[:, :S])

        # FFN
        h = _mod_ln(x, scale_ff, shift_ff, c.dtype)
        h = nn.Dense(c.ffn_dim, dtype=c.dtype, param_dtype=jnp.float32,
                     name="ffn_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                     name="ffn_fc2")(h)
        return x + gate_ff[:, None] * h


class WanTransformer(nn.Module):
    """__call__(latents (B,C,F,H,W), timestep (B,) 0..1000, text_states
    (B,S_txt,text_dim)) -> velocity (B,C,F,H,W)."""

    cfg: WanConfig

    @nn.compact
    def __call__(self, latents, timestep, text_states, lora_scale=1.0):
        c = self.cfg
        dim = c.hidden_dim
        pt, ph, pw = c.patch_size
        B, C, F, Hh, Ww = latents.shape
        f, gh, gw = F // pt, Hh // ph, Ww // pw

        x = latents.reshape(B, C, f, pt, gh, ph, gw, pw)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1).reshape(
            B, f * gh * gw, pt * ph * pw * C)
        x = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                     name="patch_embedding")(x.astype(c.dtype))

        text = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                        name="text_embedding_1")(text_states.astype(c.dtype))
        text = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                        name="text_embedding_2")(nn.gelu(text, approximate=True))

        t_emb = sincos_timestep_embedding(timestep, 256)
        t_emb = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                         name="time_embed_1")(t_emb.astype(c.dtype))
        t_emb = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                         name="time_embed_2")(nn.silu(t_emb))
        temb6 = jnp.split(
            nn.Dense(6 * dim, dtype=c.dtype, param_dtype=jnp.float32,
                     name="time_projection")(nn.silu(t_emb)), 6, axis=-1)

        ids = make_video_ids(f, gh, gw)
        angles = jnp.asarray(rope_freqs(ids, c.rope_axes_dims))
        cos = jnp.cos(angles)  # (S, d/2) — apply_rope_bshd broadcast
        sin = jnp.sin(angles)

        block = nn.remat(WanBlock) if c.remat else WanBlock
        for i in range(c.num_layers):
            x = block(c, name=f"block_{i}")(x, text, temb6, cos, sin,
                                            lora_scale)

        # output modulation: (table + t_emb) chunked into shift/scale —
        # diffusers WanTransformer3DModel adds the TIME embedding to both rows
        table = self.param("scale_shift_table_out", nn.initializers.normal(0.02),
                           (2, dim), jnp.float32)
        shift = table[0][None].astype(c.dtype) + t_emb
        scale = table[1][None].astype(c.dtype) + t_emb
        x = _mod_ln(x, scale, shift, c.dtype)
        x = nn.Dense(pt * ph * pw * c.out_channels, dtype=c.dtype,
                     param_dtype=jnp.float32, name="proj_out")(x)
        x = x.reshape(B, f, gh, gw, pt, ph, pw, c.out_channels)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(B, c.out_channels, F, Hh, Ww)
        return x
