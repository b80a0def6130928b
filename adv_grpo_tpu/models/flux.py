"""Flux.1-class rectified-flow transformer in Flax.

From-scratch implementation of the policy model behind the reference's Flux /
Flux-Kontext samplers (adv_grpo/diffusers_patch/flux_pipeline_with_logprob.py,
flux_kontext_pipeline_with_logprob.py — the reference loads diffusers
FluxPipeline; SURVEY.md §2.1 marks the model family phase-2).

Architecture semantics (diffusers FluxTransformer2DModel):
  * packed 2x2 latent tokens (64-ch) -> x_embedder; text tokens (4096) ->
    context_embedder; pooled text (768) + timestep (+ optional guidance)
    sinusoidal embeddings -> the AdaLN conditioning vector
  * 3-axis RoPE over (id_t, id_h, id_w) token ids, axes_dims (16, 56, 56)
  * N_double MMDiT-style dual-stream blocks (text stream FIRST in the joint
    sequence), then N_single parallel blocks over the fused [txt ; img]
    sequence (attention and MLP computed from one fused projection)
  * AdaLayerNormContinuous head -> linear back to packed channels

TPU notes: attention via ops.attention.mha_bshd (Pallas flash on TPU, transpose-free); RoPE tables
are trace-time constants from static ids; bf16 compute / fp32 params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.models.lora import LoRADense, fused_qkv_proj
from adv_grpo_tpu.models.mmdit import (
    AdaLNModulation, HeadRMSNorm, _layer_norm, _mod_ln,
    sincos_timestep_embedding,
)
from adv_grpo_tpu.ops.attention import mha_bshd
from adv_grpo_tpu.ops.joint_attention import joint_mha


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # packed 2x2 x 16
    num_double_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True  # Flux.1-dev; schnell: False
    rope_axes_dims: Tuple[int, ...] = (16, 56, 56)
    dtype: Any = jnp.bfloat16
    remat: bool = True
    attention_backend: Optional[str] = None
    # sibling projections of one activation computed as ONE matmul
    # (models.lora.fused_qkv_proj): q/k/v per stream in double blocks,
    # q/k/v + proj_mlp in single blocks — identical values, one HBM read
    fused_qkv: bool = True
    # LoRA on the attention projections (mirrors MMDiT's 8-projection PEFT
    # coverage; single blocks fuse q/k/v/proj_mlp into one matmul, so all
    # four share the adapter rank there). rank 0 == plain Dense.
    lora_rank: int = 0
    lora_alpha: float = 1.0

    @property
    def hidden_dim(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @classmethod
    def dev(cls, **o):
        return cls(**o)

    @classmethod
    def tiny(cls, **o):
        d = dict(in_channels=16, num_double_layers=2, num_single_layers=2,
                 attention_head_dim=16, num_attention_heads=2,
                 joint_attention_dim=32, pooled_projection_dim=24,
                 rope_axes_dims=(4, 6, 6), dtype=jnp.float32, remat=False)
        d.update(o)
        return cls(**d)


def rope_freqs(ids: np.ndarray, axes_dims) -> np.ndarray:
    """(S, 3) integer ids -> (S, head_dim/2) complex rotation angles, per the
    Flux 3-axis RoPE (theta 10000, axis dims concatenated)."""
    outs = []
    for axis, dim in enumerate(axes_dims):
        pos = ids[:, axis].astype(np.float64)
        half = dim // 2
        freqs = 1.0 / (10000 ** (np.arange(half) / half))
        outs.append(np.outer(pos, freqs))
    return np.concatenate(outs, axis=-1).astype(np.float32)  # (S, head_dim/2)


def apply_rope_bshd(x: jax.Array, cos: jax.Array, sin: jax.Array,
                    num_heads: int) -> jax.Array:
    """x: (B, S, H*D) — same rotation in the transpose-free layout; elementwise
    so it fuses and materialises no layout copy. cos/sin: (S, D/2)."""
    B, S, hd = x.shape
    d = hd // num_heads
    xf = x.reshape(B, S, num_heads, d).astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(B, S, hd).astype(x.dtype)


def make_latent_ids(gh: int, gw: int) -> np.ndarray:
    """Packed-latent token ids (t=0, row, col) — diffusers _prepare_latent_image_ids."""
    ids = np.zeros((gh, gw, 3), np.int32)
    ids[..., 1] = np.arange(gh)[:, None]
    ids[..., 2] = np.arange(gw)[None, :]
    return ids.reshape(gh * gw, 3)


class FluxAttention(nn.Module):
    """Joint attention over [txt ; img] with per-head RMS qk-norm and RoPE."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, img_mod, txt_mod, cos, sin, lora_scale=1.0):
        c = self.cfg
        H, d = c.num_attention_heads, c.attention_head_dim
        dim = c.hidden_dim
        s_txt = txt_mod.shape[1]
        dense = lambda n: LoRADense(dim, lora_rank=c.lora_rank,
                                    lora_alpha=c.lora_alpha, dtype=c.dtype,
                                    name=n)

        def qkv(x, prefix):
            hn = lambda t, n: HeadRMSNorm(d, num_heads=H, dtype=c.dtype,
                                          name=n)(t)
            if c.fused_qkv:
                # LoRADense(rank=0) == Dense (same kernel/bias tree + init);
                # one matmul reads x from HBM once for all three projections
                mk = lambda n: LoRADense(dim, lora_rank=c.lora_rank,
                                         lora_alpha=c.lora_alpha,
                                         dtype=c.dtype,
                                         in_features=x.shape[-1],
                                         name=f"{prefix}{n}")
                q, k, v = fused_qkv_proj(
                    [mk("to_q"), mk("to_k"), mk("to_v")], x, lora_scale)
            else:
                q = dense(f"{prefix}to_q")(x, lora_scale=lora_scale)
                k = dense(f"{prefix}to_k")(x, lora_scale=lora_scale)
                v = dense(f"{prefix}to_v")(x, lora_scale=lora_scale)
            return hn(q, f"{prefix}norm_q"), hn(k, f"{prefix}norm_k"), v

        iq, ik, iv = qkv(img_mod, "")
        tq, tk, tv = qkv(txt_mod, "add_")
        # RoPE positions follow the diffusers txt-first joint order: text
        # tokens take cos/sin[:s_txt], image tokens the rest. The streams are
        # never concatenated — ops.joint_attention walks them as two
        # online-softmax kv blocks (block order is irrelevant to the result).
        tq = apply_rope_bshd(tq, cos[:s_txt], sin[:s_txt], H)
        tk = apply_rope_bshd(tk, cos[:s_txt], sin[:s_txt], H)
        iq = apply_rope_bshd(iq, cos[s_txt:], sin[s_txt:], H)
        ik = apply_rope_bshd(ik, cos[s_txt:], sin[s_txt:], H)
        img_o, txt_o = joint_mha(iq, ik, iv, tq, tk, tv, num_heads=H,
                                 backend=c.attention_backend)
        return (dense("to_out")(img_o, lora_scale=lora_scale),
                dense("to_add_out")(txt_o, lora_scale=lora_scale))


class FluxDoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, temb, cos, sin, lora_scale=1.0):
        c = self.cfg
        dim = c.hidden_dim
        im = AdaLNModulation(dim, 6, dtype=c.dtype, name="norm1")(temb)
        tm = AdaLNModulation(dim, 6, dtype=c.dtype, name="norm1_context")(temb)
        img_mod = _mod_ln(img, im[1], im[0], c.dtype)
        txt_mod = _mod_ln(txt, tm[1], tm[0], c.dtype)
        img_att, txt_att = FluxAttention(c, name="attn")(
            img_mod, txt_mod, cos, sin, lora_scale=lora_scale)
        img = img + im[2][:, None] * img_att
        txt = txt + tm[2][:, None] * txt_att

        def ff(x, mods, name):
            h = _mod_ln(x, mods[4], mods[3], c.dtype)
            h = nn.Dense(dim * 4, dtype=c.dtype, param_dtype=jnp.float32,
                         name=f"{name}_fc1")(h)
            h = nn.gelu(h, approximate=True)
            h = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                         name=f"{name}_fc2")(h)
            return x + mods[5][:, None] * h

        return ff(img, im, "ff"), ff(txt, tm, "ff_context")


class FluxSingleBlock(nn.Module):
    """Parallel attention + MLP over the fused sequence (one modulation)."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, temb, cos, sin, lora_scale=1.0):
        c = self.cfg
        H, d = c.num_attention_heads, c.attention_head_dim
        dim = c.hidden_dim
        B, S, _ = x.shape
        shift, scale, gate = AdaLNModulation(dim, 3, dtype=c.dtype, name="norm")(temb)
        h = _mod_ln(x, scale, shift, c.dtype)

        if c.fused_qkv:
            # q/k/v AND the 4x-wide parallel-MLP projection all read the same
            # modulated activation: one (dim, 7*dim) matmul, one HBM read of
            # h. The fused operand concatenates every sibling's LoRA A factor,
            # so all four share the adapter rank (FluxConfig.lora_rank note).
            mk = lambda n, f: LoRADense(f, lora_rank=c.lora_rank,
                                        lora_alpha=c.lora_alpha, dtype=c.dtype,
                                        in_features=h.shape[-1], name=n)
            q, k, v, mlp_h = fused_qkv_proj(
                [mk("to_q", dim), mk("to_k", dim), mk("to_v", dim),
                 mk("proj_mlp", dim * 4)], h, lora_scale)
        else:
            mk = lambda n, f: LoRADense(f, lora_rank=c.lora_rank,
                                        lora_alpha=c.lora_alpha, dtype=c.dtype,
                                        name=n)
            q = mk("to_q", dim)(h, lora_scale=lora_scale)
            k = mk("to_k", dim)(h, lora_scale=lora_scale)
            v = mk("to_v", dim)(h, lora_scale=lora_scale)
            mlp_h = mk("proj_mlp", dim * 4)(h, lora_scale=lora_scale)
        q = HeadRMSNorm(d, num_heads=H, dtype=c.dtype, name="norm_q")(q)
        k = HeadRMSNorm(d, num_heads=H, dtype=c.dtype, name="norm_k")(k)
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
        att = att[:, :S]

        mlp = nn.gelu(mlp_h, approximate=True)
        out = LoRADense(dim, lora_rank=c.lora_rank, lora_alpha=c.lora_alpha,
                        dtype=c.dtype, name="proj_out")(
            jnp.concatenate([att, mlp], axis=-1), lora_scale=lora_scale)
        return x + gate[:, None] * out


class FluxTransformer(nn.Module):
    """__call__(packed_latents (B,S,64), timestep (B,) 0..1000,
    encoder_hidden_states (B,S_txt,4096), pooled (B,768), img_ids (S,3) np,
    txt_ids (S_txt,3) np, guidance (B,) or None) -> velocity (B,S,64)."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, latents, timestep, encoder_hidden_states, pooled,
                 img_ids: np.ndarray, txt_ids: np.ndarray, guidance=None,
                 lora_scale=1.0):
        c = self.cfg
        dim = c.hidden_dim
        img = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                       name="x_embedder")(latents.astype(c.dtype))
        txt = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                       name="context_embedder")(encoder_hidden_states.astype(c.dtype))

        def mlp_embed(x, name):
            h = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                         name=f"{name}_1")(x.astype(c.dtype))
            return nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                            name=f"{name}_2")(nn.silu(h))

        # timestep arrives on the 0..1000 (sigma*1000) scale and is embedded
        # as-is: the diffusers pipeline passes sigma and
        # FluxTransformer2DModel multiplies by 1000 before the sinusoid, so
        # the sinusoid input IS sigma*1000 (flux_pipeline_with_logprob.py:153
        # + diffusers transformer_flux forward). Guidance likewise embeds
        # guidance_scale*1000 (3.5 -> 3500).
        temb = mlp_embed(sincos_timestep_embedding(timestep, 256),
                         "time_embed")
        if c.guidance_embeds:
            g = guidance if guidance is not None else jnp.ones_like(timestep) * 3.5
            temb = temb + mlp_embed(sincos_timestep_embedding(g * 1000.0, 256),
                                    "guidance_embed")
        temb = temb + mlp_embed(pooled, "pooled_embed")

        ids = np.concatenate([np.asarray(txt_ids), np.asarray(img_ids)], axis=0)
        angles = jnp.asarray(rope_freqs(ids, c.rope_axes_dims))  # (S_tot, d/2)
        cos = jnp.cos(angles)  # (S, d/2) — apply_rope_bshd broadcast
        sin = jnp.sin(angles)

        dbl = nn.remat(FluxDoubleBlock) if c.remat else FluxDoubleBlock
        sgl = nn.remat(FluxSingleBlock) if c.remat else FluxSingleBlock
        for i in range(c.num_double_layers):
            img, txt = dbl(c, name=f"double_{i}")(img, txt, temb, cos, sin,
                                                  lora_scale)
        x = jnp.concatenate([txt, img], axis=1)
        for i in range(c.num_single_layers):
            x = sgl(c, name=f"single_{i}")(x, temb, cos, sin, lora_scale)
        img = x[:, txt.shape[1]:]

        oscale, oshift = AdaLNModulation(dim, 2, dtype=c.dtype, name="norm_out")(temb)
        img = _mod_ln(img, oscale, oshift, c.dtype)
        return nn.Dense(c.in_channels, dtype=c.dtype, param_dtype=jnp.float32,
                        name="proj_out_final")(img)
