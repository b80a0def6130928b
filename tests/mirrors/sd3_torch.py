"""Torch mirror of diffusers ``SD3Transformer2DModel`` (MMDiT) and the SD3
``AutoencoderKL`` — minimal, eager, state-dict-name-compatible.

Mirrors the module graphs the reference loads via
``StableDiffusion3Pipeline.from_pretrained``
(/root/reference/scripts/train_sd3_fast_pickscore.py:447-486):

* diffusers.models.transformers.transformer_sd3.SD3Transformer2DModel:
  PatchEmbed (conv proj + persisted centre-croppable sincos table),
  CombinedTimestepTextProjEmbeddings, JointTransformerBlock
  (AdaLayerNormZero[X], joint attention with per-head RMS qk-norm,
  optional dual self-attention, gelu-tanh FF), AdaLayerNormContinuous
  head, unpatchify.
* diffusers.models.autoencoders.autoencoder_kl.AutoencoderKL (SD3 config:
  no quant convs): ResnetBlock2D, single-head mid attention, asymmetric-pad
  downsample, nearest-2x upsample.

Intentionally NOT a copy of diffusers code — a from-scratch eager
implementation of the same published graph, kept only as test scaffolding.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ───────────────────────── embeddings ─────────────────────────


def get_1d_sincos_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, base_size: int,
                            interpolation_scale: float = 1.0) -> np.ndarray:
    """diffusers.models.embeddings.get_2d_sincos_pos_embed: positions are
    scaled by base_size/grid_size (PixArt-style), grid built with
    meshgrid(grid_w, grid_h) so component 0 is the COLUMN mesh."""
    grid_h = (np.arange(grid_size, dtype=np.float64)
              / (grid_size / base_size) / interpolation_scale)
    grid_w = (np.arange(grid_size, dtype=np.float64)
              / (grid_size / base_size) / interpolation_scale)
    gw, gh = np.meshgrid(grid_w, grid_h)  # 'xy': gw[i,j]=grid_w[j]
    emb_w = get_1d_sincos_from_grid(embed_dim // 2, gw)
    emb_h = get_1d_sincos_from_grid(embed_dim // 2, gh)
    return np.concatenate([emb_w, emb_h], axis=1)  # (grid², D)


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """Timesteps(dim, flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class PatchEmbedMirror(nn.Module):
    def __init__(self, patch_size, in_channels, embed_dim, sample_size,
                 pos_embed_max_size):
        super().__init__()
        self.patch_size = patch_size
        self.pos_embed_max_size = pos_embed_max_size
        self.proj = nn.Conv2d(in_channels, embed_dim, kernel_size=patch_size,
                              stride=patch_size)
        base_size = sample_size // patch_size
        table = get_2d_sincos_pos_embed(embed_dim, pos_embed_max_size,
                                        base_size=base_size)
        # persistent buffer: for SD3 diffusers SAVES/LOADS this table
        self.register_buffer(
            "pos_embed",
            torch.from_numpy(table).float().unsqueeze(0), persistent=True)

    def cropped_pos_embed(self, height, width):
        h = height // self.patch_size
        w = width // self.patch_size
        top = (self.pos_embed_max_size - h) // 2
        left = (self.pos_embed_max_size - w) // 2
        table = self.pos_embed.reshape(
            1, self.pos_embed_max_size, self.pos_embed_max_size, -1)
        return table[:, top:top + h, left:left + w, :].reshape(
            1, h * w, table.shape[-1])

    def forward(self, latent):
        _, _, H, W = latent.shape
        x = self.proj(latent)          # (B, D, H/p, W/p)
        x = x.flatten(2).transpose(1, 2)  # (B, N, D)
        return x + self.cropped_pos_embed(H, W)


class TimestepTextEmbedMirror(nn.Module):
    """CombinedTimestepTextProjEmbeddings."""

    class _MLP(nn.Module):
        def __init__(self, in_dim, dim):
            super().__init__()
            self.linear_1 = nn.Linear(in_dim, dim)
            self.linear_2 = nn.Linear(dim, dim)

        def forward(self, x):
            return self.linear_2(F.silu(self.linear_1(x)))

    def __init__(self, dim, pooled_projection_dim):
        super().__init__()
        self.timestep_embedder = self._MLP(256, dim)
        self.text_embedder = self._MLP(pooled_projection_dim, dim)

    def forward(self, timestep, pooled):
        t = timestep_embedding(timestep, 256)
        return self.timestep_embedder(t) + self.text_embedder(pooled)


# ───────────────────────── norm / attention ─────────────────────────


class RMSNormMirror(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        xf = x.float()
        var = xf.pow(2).mean(-1, keepdim=True)
        return (xf * torch.rsqrt(var + self.eps) * self.weight).to(x.dtype)


class AdaLNMirror(nn.Module):
    """AdaLayerNormZero / ZeroX / Continuous share: silu -> linear -> chunk.
    The LayerNorm (no affine, eps 1e-6) is applied by the caller."""

    def __init__(self, dim, n_chunks):
        super().__init__()
        self.linear = nn.Linear(dim, n_chunks * dim)
        self.n = n_chunks

    def forward(self, temb):
        return self.linear(F.silu(temb)).chunk(self.n, dim=-1)


class JointAttentionMirror(nn.Module):
    """diffusers Attention with added_kv_proj_dim (JointAttnProcessor):
    image tokens first, text tokens appended; per-head RMS qk-norm."""

    def __init__(self, dim, heads, head_dim, context_pre_only, qk_norm=True):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.context_pre_only = context_pre_only
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        if not context_pre_only:
            self.to_add_out = nn.Linear(dim, dim)
        if qk_norm:
            self.norm_q = RMSNormMirror(head_dim)
            self.norm_k = RMSNormMirror(head_dim)
            self.norm_added_q = RMSNormMirror(head_dim)
            self.norm_added_k = RMSNormMirror(head_dim)
        self.qk_norm = qk_norm

    def _heads(self, t):
        B, S, _ = t.shape
        return t.view(B, S, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, x, ctx):
        s_img = x.shape[1]
        q, k, v = self._heads(self.to_q(x)), self._heads(self.to_k(x)), \
            self._heads(self.to_v(x))
        cq = self._heads(self.add_q_proj(ctx))
        ck = self._heads(self.add_k_proj(ctx))
        cv = self._heads(self.add_v_proj(ctx))
        if self.qk_norm:
            q, k = self.norm_q(q), self.norm_k(k)
            cq, ck = self.norm_added_q(cq), self.norm_added_k(ck)
        q = torch.cat([q, cq], dim=2)
        k = torch.cat([k, ck], dim=2)
        v = torch.cat([v, cv], dim=2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(x.shape[0], -1, self.heads * self.head_dim)
        x_o, c_o = o[:, :s_img], o[:, s_img:]
        x_o = self.to_out[0](x_o)
        if self.context_pre_only:
            return x_o, None
        return x_o, self.to_add_out(c_o)


class SelfAttentionMirror(nn.Module):
    """attn2 (SD3.5 dual attention): plain self-attention + RMS qk-norm."""

    def __init__(self, dim, heads, head_dim, qk_norm=True):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        if qk_norm:
            self.norm_q = RMSNormMirror(head_dim)
            self.norm_k = RMSNormMirror(head_dim)
        self.qk_norm = qk_norm

    def forward(self, x):
        B, S, _ = x.shape
        sh = lambda t: t.view(B, S, self.heads, self.head_dim).transpose(1, 2)
        q, k, v = sh(self.to_q(x)), sh(self.to_k(x)), sh(self.to_v(x))
        if self.qk_norm:
            q, k = self.norm_q(q), self.norm_k(k)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, S, -1)
        return self.to_out[0](o)


class FeedForwardMirror(nn.Module):
    """FeedForward(activation_fn='gelu-approximate'): net.0.proj, net.2."""

    def __init__(self, dim):
        super().__init__()

        class _GELUProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, 4 * dim)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        self.net = nn.ModuleList([_GELUProj(), nn.Identity(),
                                  nn.Linear(4 * dim, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


def _ln(x):
    return F.layer_norm(x, (x.shape[-1],), eps=1e-6)


class JointBlockMirror(nn.Module):
    def __init__(self, dim, heads, head_dim, dual, last, qk_norm=True):
        super().__init__()
        self.dual, self.last = dual, last
        self.norm1 = AdaLNMirror(dim, 9 if dual else 6)
        self.norm1_context = AdaLNMirror(dim, 2 if last else 6)
        self.attn = JointAttentionMirror(dim, heads, head_dim,
                                         context_pre_only=last, qk_norm=qk_norm)
        if dual:
            self.attn2 = SelfAttentionMirror(dim, heads, head_dim,
                                             qk_norm=qk_norm)
        self.ff = FeedForwardMirror(dim)
        if not last:
            self.ff_context = FeedForwardMirror(dim)

    def forward(self, x, ctx, temb):
        mods = self.norm1(temb)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods[:6]
        x_ln = _ln(x)
        x_mod = x_ln * (1 + scale_msa[:, None]) + shift_msa[:, None]

        if self.last:
            # AdaLayerNormContinuous: chunk order [scale, shift]
            cscale, cshift = self.norm1_context(temb)
            ctx_mod = _ln(ctx) * (1 + cscale[:, None]) + cshift[:, None]
        else:
            (c_shift_msa, c_scale_msa, c_gate_msa,
             c_shift_mlp, c_scale_mlp, c_gate_mlp) = self.norm1_context(temb)
            ctx_mod = _ln(ctx) * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]

        attn_out, ctx_attn = self.attn(x_mod, ctx_mod)
        x = x + gate_msa[:, None] * attn_out
        if self.dual:
            shift2, scale2, gate2 = mods[6:]
            x_mod2 = x_ln * (1 + scale2[:, None]) + shift2[:, None]
            x = x + gate2[:, None] * self.attn2(x_mod2)
        h = _ln(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * self.ff(h)
        if self.last:
            return x, None
        ctx = ctx + c_gate_msa[:, None] * ctx_attn
        hc = _ln(ctx) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        ctx = ctx + c_gate_mlp[:, None] * self.ff_context(hc)
        return x, ctx


class SD3TransformerMirror(nn.Module):
    """State-dict-compatible with diffusers SD3Transformer2DModel."""

    def __init__(self, cfg):
        """cfg: adv_grpo_tpu.models.mmdit.MMDiTConfig (shapes only)."""
        super().__init__()
        dim = cfg.hidden_dim
        self.cfg = cfg
        self.pos_embed = PatchEmbedMirror(
            cfg.patch_size, cfg.in_channels, dim, cfg.sample_size,
            cfg.pos_embed_max_size)
        self.time_text_embed = TimestepTextEmbedMirror(
            dim, cfg.pooled_projection_dim)
        self.context_embedder = nn.Linear(cfg.joint_attention_dim, dim)
        self.transformer_blocks = nn.ModuleList([
            JointBlockMirror(dim, cfg.num_attention_heads,
                             cfg.attention_head_dim,
                             dual=i in cfg.dual_attention_layers,
                             last=i == cfg.num_layers - 1,
                             qk_norm=cfg.qk_norm)
            for i in range(cfg.num_layers)])
        self.norm_out = AdaLNMirror(dim, 2)
        self.proj_out = nn.Linear(dim, cfg.patch_size ** 2 * cfg.out_channels)

    @torch.no_grad()
    def forward(self, latents, timestep, encoder_hidden_states, pooled):
        cfg = self.cfg
        p = cfg.patch_size
        B, C, H, W = latents.shape
        x = self.pos_embed(latents)
        temb = self.time_text_embed(timestep, pooled)
        ctx = self.context_embedder(encoder_hidden_states)
        for blk in self.transformer_blocks:
            x, ctx = blk(x, ctx, temb)
        oscale, oshift = self.norm_out(temb)
        x = _ln(x) * (1 + oscale[:, None]) + oshift[:, None]
        x = self.proj_out(x)
        # unpatchify: nhwpqc -> nchpwq
        x = x.reshape(B, H // p, W // p, p, p, cfg.out_channels)
        x = torch.einsum("nhwpqc->nchpwq", x)
        return x.reshape(B, cfg.out_channels, H, W)


# ───────────────────────── AutoencoderKL (SD3) ─────────────────────────


class ResnetMirror(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class VaeAttnMirror(nn.Module):
    """Single-head spatial attention (UNetMidBlock2D default: one head of
    dim C, scale C^-0.5)."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        o = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)).squeeze(1)
        o = self.to_out[0](o)
        return x + o.transpose(1, 2).reshape(B, C, H, W)


class _Mid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetMirror(ch, ch, groups),
                                      ResnetMirror(ch, ch, groups)])
        self.attentions = nn.ModuleList([VaeAttnMirror(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _Down(nn.Module):
    def __init__(self, cin, cout, layers, groups, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetMirror(cin if j == 0 else cout, cout, groups)
             for j in range(layers)])
        if downsample:
            conv = nn.Conv2d(cout, cout, 3, stride=2)

            class _DS(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.conv = conv

                def forward(self, x):
                    return self.conv(F.pad(x, (0, 1, 0, 1)))

            self.downsamplers = nn.ModuleList([_DS()])
        else:
            self.downsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _Up(nn.Module):
    def __init__(self, cin, cout, layers, groups, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetMirror(cin if j == 0 else cout, cout, groups)
             for j in range(layers + 1)])
        if upsample:
            conv = nn.Conv2d(cout, cout, 3, padding=1)

            class _US(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.conv = conv

                def forward(self, x):
                    return self.conv(
                        F.interpolate(x, scale_factor=2.0, mode="nearest"))

            self.upsamplers = nn.ModuleList([_US()])
        else:
            self.upsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class EncoderMirror(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.down_blocks = nn.ModuleList([
            _Down(ch[max(i - 1, 0)], ch[i], cfg.layers_per_block, g,
                  downsample=i < len(ch) - 1)
            for i in range(len(ch))])
        self.mid_block = _Mid(ch[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, ch[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(ch[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class DecoderMirror(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        rev = list(reversed(cfg.block_out_channels))
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = _Mid(rev[0], g)
        self.up_blocks = nn.ModuleList([
            _Up(rev[max(i - 1, 0)], rev[i], cfg.layers_per_block, g,
                upsample=i < len(rev) - 1)
            for i in range(len(rev))])
        self.conv_norm_out = nn.GroupNorm(g, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKLMirror(nn.Module):
    """SD3 VAE (use_quant_conv=False, use_post_quant_conv=False)."""

    def __init__(self, cfg):
        super().__init__()
        self.encoder = EncoderMirror(cfg)
        self.decoder = DecoderMirror(cfg)

    @torch.no_grad()
    def encode_moments(self, images):
        return self.encoder(images)

    @torch.no_grad()
    def decode(self, z):
        return self.decoder(z)
