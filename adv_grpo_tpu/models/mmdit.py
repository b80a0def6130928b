"""MMDiT (SD3/SD3.5-class joint-stream diffusion transformer) in Flax.

A from-scratch TPU-first implementation of the policy model the reference
fine-tunes: the diffusers ``SD3Transformer2DModel`` (~2B for SD3.5-Medium)
invoked at adv_grpo/diffusers_patch/sd3_pipeline_with_logprob_fast.py:630-637 as
``transformer(hidden_states, timestep, encoder_hidden_states, pooled_projections)``.

Architecture parity targets (module semantics, not code):
  * patchified 16-ch latents (patch 2) + centre-cropped fixed 2D sincos pos-embed
  * sinusoidal timestep embedding (256, flip_sin_to_cos) + pooled-text MLP,
    summed into the AdaLN conditioning vector
  * N joint transformer blocks: AdaLayerNormZero modulation on both streams,
    joint attention over [image ; text] tokens, per-head RMS qk-norm (SD3.5),
    optional dual self-attention on the image stream (SD3.5-M layers 0-12),
    4x GELU-tanh MLPs; final block drops the context stream (context_pre_only)
  * AdaLayerNormContinuous head -> linear to patch^2 * out_channels -> unpatchify

TPU design notes:
  * attention runs through adv_grpo_tpu.ops.joint_attention (Pallas flash
    kernel on TPU) directly in the (B, S, H*d) projection layout — no
    transposes, no img‖txt concat (the kernel walks the two streams as
    separate online-softmax kv blocks), and the per-head RMS qk-norm is
    fused into the q/k tile loads
  * compute dtype bf16 end-to-end, params fp32; all matmuls MXU-shaped
  * LoRA on the 8 joint-attention projections via models.lora.LoRADense with a
    runtime lora_scale (reference PEFT config train_sd3_fast_pickscore.py:490-511)
  * jax.checkpoint (remat) per block, policy-selectable, for the 2-step training
    window backward at CFG batch sizes (SURVEY.md §7.3.7)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from adv_grpo_tpu.models.lora import LoRADense, fused_qkv_proj
from adv_grpo_tpu.ops.joint_attention import joint_mha, mha_rms
from adv_grpo_tpu.ops.fused_norms import (
    layer_norm, modulated_layer_norm, rms_norm_heads)


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    """SD3.5-Medium defaults; shrink for tests."""

    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # text token width (T5 dim)
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 384
    # position scaling of the fixed sincos table (see cropped_pos_embed);
    # set from the checkpoint's persisted table at convert time
    pos_embed_base_size: Optional[int] = None
    qk_norm: bool = True
    dual_attention_layers: Tuple[int, ...] = tuple(range(13))
    sample_size: int = 128
    dtype: Any = jnp.bfloat16
    lora_rank: int = 0
    lora_alpha: float = 1.0
    remat: bool = True
    # "full" recomputes the whole block in bwd; "save_attn" keeps the three
    # attention outputs (joint x/ctx + dual) so the flash kernels don't run
    # again in the remat re-forward (~2.1GB extra live activations per
    # microstep at CFG-16/512^2 — fits v5e HBM). Richer tiers trade HBM for
    # less re-forward work (all matmul outputs carry the same D flops/byte,
    # so every extra saved byte buys the same recompute cut):
    #   "save_attn_ff"  also keeps the 4x-wide fc1 outputs (+~5.5GB @CFG-16)
    #   "save_attn_qkv" also keeps the q/k/v projections   (+~4.3GB @CFG-16)
    #   "save_big"      keeps all of the above
    # Measured (scripts/profile_train_remat.py, r4, 16GB v5e @CFG-16/512^2):
    # at train.micro_splits=1 only save_attn fits; with the sample-axis
    # micro_splits (and/or train.cfg_sequential) shrinking the live set, the
    # richer tiers fit AND pay: save_attn 1.095 s/microstep -> save_big x4
    # 0.873 s (-20%, the ~25% remat re-forward mostly removed). Single-chip
    # v5e best: save_big + micro_splits=4; multi-chip meshes need the split
    # microbatch to stay device-divisible (train/driver.py validates).
    remat_policy: str = "save_attn"
    attention_backend: Optional[str] = None  # None = auto per platform
    # q/k/v (and their LoRA A factors) projected by ONE matmul per stream —
    # numerically identical output columns, 1 HBM read of the activation
    # instead of 6 per projection group (models.lora.fused_qkv_proj)
    fused_qkv: bool = True

    @property
    def hidden_dim(self) -> int:
        return self.attention_head_dim * self.num_attention_heads

    @classmethod
    def sd35_medium(cls, **overrides) -> "MMDiTConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "MMDiTConfig":
        """4-layer toy config for CPU tests."""
        defaults = dict(
            num_layers=4, attention_head_dim=32, num_attention_heads=4,
            joint_attention_dim=64, pooled_projection_dim=48,
            pos_embed_max_size=32, dual_attention_layers=(0, 1),
            dtype=jnp.float32, remat=False,
        )
        defaults.update(overrides)
        return cls(**defaults)


def sincos_timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Diffusers `Timesteps(dim, flip_sin_to_cos=True, downscale_freq_shift=0)`.

    t is the raw timestep value (0..1000 scale for SD3).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    # flip_sin_to_cos=True -> [cos, sin]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def make_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Fixed 2D sin-cos positional table over a (grid_size, grid_size) grid."""
    g = np.arange(grid_size, dtype=np.float64)
    return _sincos_table(embed_dim, g, g).reshape(grid_size * grid_size, embed_dim)


def _sincos_table(embed_dim: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """(len(rows), len(cols), embed_dim) sincos table for given grid coords."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    hh, ww = np.meshgrid(rows, cols, indexing="ij")
    # diffusers get_2d_sincos_pos_embed concatenates [sincos(col), sincos(row)]
    # (its grid[0] is the column mesh) — order matters for weight parity since
    # the table is deterministic, not loaded.
    emb_c = _1d(embed_dim // 2, ww)
    emb_r = _1d(embed_dim // 2, hh)
    out = np.concatenate([emb_c, emb_r], axis=1).astype(np.float32)
    return out.reshape(len(rows), len(cols), embed_dim)


def cropped_pos_embed(embed_dim: int, max_size: int, gh: int, gw: int,
                      base_size: Optional[int] = None) -> np.ndarray:
    """Centre-cropped fixed table (diffusers PatchEmbed cropped_pos_embed
    semantics) computed only over the needed (gh, gw) window — avoids
    materialising the full max_size^2 table (906 MB at SD3.5-M scale).

    ``base_size``: diffusers get_2d_sincos_pos_embed scales grid positions by
    base_size/grid_size (base_size = sample_size // patch_size); None keeps
    raw integer positions (the original Stability MMDiT table). SD3
    checkpoints persist the table (PatchEmbed registers it persistent when
    pos_embed_max_size is set), so convert.detect_pos_embed_base reads the
    truth off the checkpoint and sets MMDiTConfig.pos_embed_base_size."""
    top = (max_size - gh) // 2
    left = (max_size - gw) // 2
    rows = np.arange(top, top + gh, dtype=np.float64)
    cols = np.arange(left, left + gw, dtype=np.float64)
    if base_size is not None:
        rows = rows * (base_size / max_size)
        cols = cols * (base_size / max_size)
    return _sincos_table(embed_dim, rows, cols).reshape(1, gh * gw, embed_dim)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (xf * weight).astype(self.dtype)


def _layer_norm(x, dtype):
    """LayerNorm without learned affine (elementwise_affine=False), fp32 stats.

    Delegates to the fused Pallas row-norm on TPU — XLA's stat+apply fusion
    measured at ~59 GB/s effective (~40 ms per MMDiT forward across layers);
    the one-VMEM-pass kernel runs at bandwidth (ops/fused_norms.py).
    """
    return layer_norm(x, out_dtype=dtype)


def _mod_ln(x, scale, shift, dtype):
    """AdaLN-modulated LayerNorm ``ln(x)*(1+scale)+shift`` in ONE fused pass
    (ops/fused_norms.modulated_layer_norm) — the separate elementwise
    modulation after an opaque Pallas LN cost a full extra HBM round-trip of
    the (B, S, D) activation per call (~4 calls per block)."""
    return modulated_layer_norm(x, scale, shift, out_dtype=dtype)


class HeadRMSNorm(nn.Module):
    """Per-head RMS norm applied in the (B, S, H*d) attention layout (fused
    Pallas kernel on TPU). Param tree identical to RMSNorm ('weight' (d,)).

    Called with ``x=None`` it only materialises and returns the weight — the
    attention modules use this to fold the norm INTO the flash kernel
    (ops.joint_attention) while keeping the checkpoint tree unchanged."""

    dim: int  # head dim d
    num_heads: int
    eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x=None):
        weight = self.param("weight", nn.initializers.ones, (self.dim,),
                            jnp.float32)
        if x is None:
            return weight
        return rms_norm_heads(x, weight, num_heads=self.num_heads,
                              eps=self.eps, out_dtype=self.dtype)


class AdaLNModulation(nn.Module):
    """silu(temb) -> Linear -> n_chunks modulation vectors."""

    dim: int
    n_chunks: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, temb):
        h = nn.Dense(self.n_chunks * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear")(nn.silu(temb))
        return jnp.split(h, self.n_chunks, axis=-1)


class FeedForward(nn.Module):
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 4, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        # named for the "save_attn_ff"/"save_big" remat tiers: saving the
        # pre-GELU fc1 output skips the block's single largest matmul in the
        # remat re-forward (fc2's input is then one cheap elementwise GELU)
        h = checkpoint_name(h, "ff1")
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(h)


class JointAttention(nn.Module):
    """Joint image+text attention with optional per-head RMS qk-norm and LoRA."""

    cfg: MMDiTConfig
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, x, ctx, lora_scale=1.0):
        c = self.cfg
        H, d = c.num_attention_heads, c.attention_head_dim
        dim = c.hidden_dim

        def mk(name, in_dim):
            return LoRADense(dim, lora_rank=c.lora_rank, lora_alpha=c.lora_alpha,
                             dtype=c.dtype, in_features=in_dim, name=name)

        if c.fused_qkv:
            # one matmul per stream over [Wq|Wk|Wv|Aq|Ak|Av] — same values,
            # 1 HBM read of x/ctx instead of 6 (models.lora.fused_qkv_proj)
            q, k, v = fused_qkv_proj(
                [mk("to_q", x.shape[-1]), mk("to_k", x.shape[-1]),
                 mk("to_v", x.shape[-1])], x, lora_scale)
            cq, ck, cv = fused_qkv_proj(
                [mk("add_q_proj", ctx.shape[-1]), mk("add_k_proj", ctx.shape[-1]),
                 mk("add_v_proj", ctx.shape[-1])], ctx, lora_scale)
        else:
            proj = lambda name, inp: mk(name, inp.shape[-1])(
                inp, lora_scale=lora_scale)
            q = proj("to_q", x)  # (B, s_img, dim) — BSHD layout throughout
            k = proj("to_k", x)
            v = proj("to_v", x)
            cq = proj("add_q_proj", ctx)
            ck = proj("add_k_proj", ctx)
            cv = proj("add_v_proj", ctx)
        # named for the "save_attn_qkv"/"save_big" remat tiers: the flash
        # BACKWARD kernel consumes q/k/v, so saving them skips the qkv
        # matmul recompute in the remat re-forward
        q, k, v, cq, ck, cv = (checkpoint_name(t, "qkv_out")
                               for t in (q, k, v, cq, ck, cv))

        # the two streams are never concatenated: ops.joint_attention walks
        # them as two online-softmax kv blocks, with the per-head RMS qk-norm
        # fused into the q/k tile loads (the round-2 path spent 4 RMS kernels
        # + 3 HBM concats + a slice per call on the same math)
        rms_weights = None
        if c.qk_norm:
            hn = lambda name: HeadRMSNorm(d, num_heads=H, dtype=c.dtype,
                                          name=name)()
            rms_weights = (hn("norm_q"), hn("norm_k"),
                           hn("norm_added_q"), hn("norm_added_k"))

        o_img, o_txt = joint_mha(q, k, v, cq, ck, cv, num_heads=H,
                                 rms_weights=rms_weights,
                                 backend=c.attention_backend)

        x_out = LoRADense(dim, lora_rank=c.lora_rank, lora_alpha=c.lora_alpha,
                          dtype=c.dtype, name="to_out")(o_img, lora_scale=lora_scale)
        if self.context_pre_only:
            return x_out, None
        ctx_out = LoRADense(dim, lora_rank=c.lora_rank, lora_alpha=c.lora_alpha,
                            dtype=c.dtype, name="to_add_out")(o_txt, lora_scale=lora_scale)
        return x_out, ctx_out


class DualSelfAttention(nn.Module):
    """SD3.5 extra image-stream self-attention (attn2) — no LoRA (reference
    targets are attn.-prefixed, train_sd3_fast_pickscore.py:492-501)."""

    cfg: MMDiTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        H, d = c.num_attention_heads, c.attention_head_dim
        dim = c.hidden_dim
        dense = lambda name: nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                                      name=name)
        if c.fused_qkv:
            # LoRADense(rank=0) == Dense (same kernel/bias tree + init); the
            # fused path reads x from HBM once for all three projections
            mk = lambda name: LoRADense(dim, lora_rank=0, dtype=c.dtype,
                                        in_features=x.shape[-1], name=name)
            q, k, v = fused_qkv_proj([mk("to_q"), mk("to_k"), mk("to_v")], x)
        else:
            q = dense("to_q")(x)  # (B, s, dim), BSHD layout end to end
            k = dense("to_k")(x)
            v = dense("to_v")(x)
        q, k, v = (checkpoint_name(t, "qkv_out") for t in (q, k, v))
        # qk-RMS fused into the flash kernel (ops.joint_attention.mha_rms);
        # at 512^2 the image stream is 1024 tokens — zero layout copies
        rms_weights = None
        if c.qk_norm:
            rms_weights = (
                HeadRMSNorm(d, num_heads=H, dtype=c.dtype, name="norm_q")(),
                HeadRMSNorm(d, num_heads=H, dtype=c.dtype, name="norm_k")())
        o = mha_rms(q, k, v, num_heads=H, rms_weights=rms_weights,
                    backend=c.attention_backend)
        return dense("to_out")(o)


class JointBlock(nn.Module):
    cfg: MMDiTConfig
    dual_attention: bool = False
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, x, ctx, temb, lora_scale=1.0):
        c = self.cfg
        dim = c.hidden_dim

        n_x = 9 if self.dual_attention else 6
        mods = AdaLNModulation(dim, n_x, dtype=c.dtype, name="norm1")(temb)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods[:6]
        x_pre = x  # dual attention modulates the PRE-attention norm input
        x_mod = _mod_ln(x, scale_msa, shift_msa, c.dtype)

        if self.context_pre_only:
            # AdaLayerNormContinuous on the context: chunk order [scale, shift]
            cscale, cshift = AdaLNModulation(dim, 2, dtype=c.dtype,
                                             name="norm1_context")(temb)
            ctx_mod = _mod_ln(ctx, cscale, cshift, c.dtype)
        else:
            cmods = AdaLNModulation(dim, 6, dtype=c.dtype, name="norm1_context")(temb)
            c_shift_msa, c_scale_msa, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = cmods
            ctx_mod = _mod_ln(ctx, c_scale_msa, c_shift_msa, c.dtype)

        # the save_attn remat policy keys on "attn_out" names attached to the
        # flash kernel's o/lse INSIDE the custom-VJP forwards
        # (ops/joint_attention.py) — naming here, after the output
        # projections, would still recompute the kernels in the remat
        # re-forward
        attn_out, ctx_attn_out = JointAttention(
            c, context_pre_only=self.context_pre_only, name="attn"
        )(x_mod, ctx_mod, lora_scale=lora_scale)
        x = x + gate_msa[:, None] * attn_out

        if self.dual_attention:
            # NOTE: the pre-attention x is re-normalised (2 fused passes)
            # rather than reusing one LN output + 2 elementwise passes (3) —
            # one fewer (B, S, D) HBM round-trip
            shift_msa2, scale_msa2, gate_msa2 = mods[6:]
            x_mod2 = _mod_ln(x_pre, scale_msa2, shift_msa2, c.dtype)
            x = x + gate_msa2[:, None] * DualSelfAttention(c, name="attn2")(x_mod2)

        h = _mod_ln(x, scale_mlp, shift_mlp, c.dtype)
        x = x + gate_mlp[:, None] * FeedForward(dim, dtype=c.dtype, name="ff")(h)

        if self.context_pre_only:
            return x, None
        ctx = ctx + c_gate_msa[:, None] * ctx_attn_out
        hc = _mod_ln(ctx, c_scale_mlp, c_shift_mlp, c.dtype)
        ctx = ctx + c_gate_mlp[:, None] * FeedForward(dim, dtype=c.dtype,
                                                      name="ff_context")(hc)
        return x, ctx


class MMDiT(nn.Module):
    """Velocity-prediction joint transformer.

    __call__(latents (B,C,h,w), timestep (B,) raw 0..1000, encoder_hidden_states
    (B,S_txt,joint_attention_dim), pooled_projections (B,pooled_dim),
    lora_scale) -> velocity (B,C,h,w)
    """

    cfg: MMDiTConfig

    @nn.compact
    def __call__(self, latents, timestep, encoder_hidden_states, pooled_projections,
                 lora_scale=1.0):
        c = self.cfg
        dim = c.hidden_dim
        p = c.patch_size
        B, C, h, w = latents.shape
        gh, gw = h // p, w // p

        # patchify: (B,C,h,w) -> (B, gh*gw, p*p*C) -> Dense  (conv-as-matmul: MXU)
        x = latents.reshape(B, C, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(B, gh * gw, p * p * C)
        x = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32, name="pos_embed_proj")(x)

        # centre-cropped fixed sincos position table (diffusers PatchEmbed
        # semantics); a trace-time constant — gh/gw are static under jit
        pos = jnp.asarray(cropped_pos_embed(dim, c.pos_embed_max_size, gh, gw,
                                            base_size=c.pos_embed_base_size))
        x = x + pos.astype(c.dtype)

        # conditioning vector: timestep + pooled text
        t_emb = sincos_timestep_embedding(timestep, 256)
        t_emb = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                         name="time_embed_1")(t_emb.astype(c.dtype))
        t_emb = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                         name="time_embed_2")(nn.silu(t_emb))
        p_emb = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                         name="pooled_embed_1")(pooled_projections.astype(c.dtype))
        p_emb = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                         name="pooled_embed_2")(nn.silu(p_emb))
        temb = t_emb + p_emb

        ctx = nn.Dense(dim, dtype=c.dtype, param_dtype=jnp.float32,
                       name="context_embedder")(encoder_hidden_states.astype(c.dtype))

        block_cls = JointBlock
        if c.remat:
            saved_names = {
                "save_attn": ("attn_out",),
                "save_attn_ff": ("attn_out", "ff1"),
                "save_attn_qkv": ("attn_out", "qkv_out"),
                "save_big": ("attn_out", "ff1", "qkv_out"),
                "full": None,  # recompute everything
            }
            if c.remat_policy not in saved_names:
                raise ValueError(
                    f"unknown remat_policy {c.remat_policy!r}: "
                    f"expected one of {sorted(saved_names)}")
            names = saved_names[c.remat_policy]
            policy = (jax.checkpoint_policies.save_only_these_names(*names)
                      if names else None)
            block_cls = nn.remat(JointBlock, static_argnums=(), policy=policy)
        for i in range(c.num_layers):
            x, ctx = block_cls(
                c,
                dual_attention=i in c.dual_attention_layers,
                context_pre_only=i == c.num_layers - 1,
                name=f"block_{i}",
            )(x, ctx, temb, lora_scale)

        # output head: AdaLayerNormContinuous (chunk order [scale, shift])
        oscale, oshift = AdaLNModulation(dim, 2, dtype=c.dtype, name="norm_out")(temb)
        x = _mod_ln(x, oscale, oshift, c.dtype)
        x = nn.Dense(p * p * c.out_channels, dtype=c.dtype, param_dtype=jnp.float32,
                     name="proj_out")(x)

        # unpatchify -> (B, C, h, w)
        x = x.reshape(B, gh, gw, p, p, c.out_channels)
        x = x.transpose(0, 5, 1, 3, 2, 4).reshape(B, c.out_channels, h, w)
        return x
