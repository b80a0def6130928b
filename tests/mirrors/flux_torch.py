"""Minimal torch mirror of diffusers FluxTransformer2DModel.

State-dict-compatible with the naming convert_flux consumes
(models/convert.py:817-874); forward semantics follow the diffusers module
graph the reference loads via FluxPipeline
(adv_grpo/diffusers_patch/flux_pipeline_with_logprob.py:121-174): packed
latents + text embedder, timestep/guidance/pooled MLP embeddings (sinusoid
inputs on the sigma*1000 scale), 3-axis RoPE (theta 10000, interleaved pairs),
double (dual-stream, text first) then single (parallel attn+MLP) blocks,
AdaLayerNormContinuous head.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn

from tests.mirrors.sd3_torch import (
    AdaLNMirror, RMSNormMirror, _ln, timestep_embedding)


def rope_cos_sin(ids: torch.Tensor, axes_dims):
    """diffusers FluxPosEmbed: per-axis 1D rotary tables, concatenated, with
    cos/sin repeat_interleave(2) (interleaved-pair convention)."""
    cos_l, sin_l = [], []
    for axis, dim in enumerate(axes_dims):
        pos = ids[:, axis].double()
        freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).double() / dim))
        out = pos[:, None] * freqs[None, :]
        cos_l.append(out.cos().repeat_interleave(2, dim=-1))
        sin_l.append(out.sin().repeat_interleave(2, dim=-1))
    return (torch.cat(cos_l, dim=-1).float(), torch.cat(sin_l, dim=-1).float())


def apply_rotary_emb(x, cos, sin):
    """x: (B, H, S, D); diffusers apply_rotary_emb use_real, unbind_dim=-1."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rotated = torch.stack([-x2, x1], dim=-1).flatten(-2)
    return (x.float() * cos[None, None] + rotated.float() * sin[None, None]).to(x.dtype)


class _MLPEmbed(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TimeTextGuidanceEmbed(nn.Module):
    """CombinedTimestepGuidanceTextProjEmbeddings (guidance optional)."""

    def __init__(self, dim, pooled_dim, guidance: bool):
        super().__init__()
        self.timestep_embedder = _MLPEmbed(256, dim)
        self.text_embedder = _MLPEmbed(pooled_dim, dim)
        if guidance:
            self.guidance_embedder = _MLPEmbed(256, dim)
        self.has_guidance = guidance

    def forward(self, timestep, pooled, guidance):
        # the diffusers transformer multiplies the pipeline's sigma-scale
        # inputs by 1000 before the sinusoid
        temb = self.timestep_embedder(timestep_embedding(timestep, 256))
        if self.has_guidance:
            temb = temb + self.guidance_embedder(
                timestep_embedding(guidance * 1000.0, 256))
        return temb + self.text_embedder(pooled)


class FluxJointAttentionMirror(nn.Module):
    """Flux double-block attention: text tokens FIRST in the joint sequence,
    per-head RMS qk-norm, RoPE on q/k."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.to_add_out = nn.Linear(dim, dim)
        self.norm_q = RMSNormMirror(head_dim)
        self.norm_k = RMSNormMirror(head_dim)
        self.norm_added_q = RMSNormMirror(head_dim)
        self.norm_added_k = RMSNormMirror(head_dim)

    def _heads(self, t):
        B, S, _ = t.shape
        return t.view(B, S, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, img, txt, cos, sin):
        s_txt = txt.shape[1]
        q = self.norm_q(self._heads(self.to_q(img)))
        k = self.norm_k(self._heads(self.to_k(img)))
        v = self._heads(self.to_v(img))
        cq = self.norm_added_q(self._heads(self.add_q_proj(txt)))
        ck = self.norm_added_k(self._heads(self.add_k_proj(txt)))
        cv = self._heads(self.add_v_proj(txt))
        q = apply_rotary_emb(torch.cat([cq, q], dim=2), cos, sin)
        k = apply_rotary_emb(torch.cat([ck, k], dim=2), cos, sin)
        v = torch.cat([cv, v], dim=2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(img.shape[0], -1,
                                      self.heads * self.head_dim)
        return self.to_out[0](o[:, s_txt:]), self.to_add_out(o[:, :s_txt])


class _GELUProjFF(nn.Module):
    """FeedForward(activation_fn='gelu-approximate'): net.0.proj / net.2."""

    def __init__(self, dim):
        super().__init__()

        class _P(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, 4 * dim)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        self.net = nn.ModuleList([_P(), nn.Identity(), nn.Linear(4 * dim, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class FluxDoubleBlockMirror(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.norm1 = AdaLNMirror(dim, 6)
        self.norm1_context = AdaLNMirror(dim, 6)
        self.attn = FluxJointAttentionMirror(dim, heads, head_dim)
        self.ff = _GELUProjFF(dim)
        self.ff_context = _GELUProjFF(dim)

    def forward(self, img, txt, temb, cos, sin):
        im = self.norm1(temb)
        tm = self.norm1_context(temb)
        img_mod = _ln(img) * (1 + im[1][:, None]) + im[0][:, None]
        txt_mod = _ln(txt) * (1 + tm[1][:, None]) + tm[0][:, None]
        img_att, txt_att = self.attn(img_mod, txt_mod, cos, sin)
        img = img + im[2][:, None] * img_att
        txt = txt + tm[2][:, None] * txt_att
        h = _ln(img) * (1 + im[4][:, None]) + im[3][:, None]
        img = img + im[5][:, None] * self.ff(h)
        hc = _ln(txt) * (1 + tm[4][:, None]) + tm[3][:, None]
        txt = txt + tm[5][:, None] * self.ff_context(hc)
        return img, txt


class _SingleAttn(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = RMSNormMirror(head_dim)
        self.norm_k = RMSNormMirror(head_dim)

    def forward(self, h, cos, sin):
        B, S, _ = h.shape
        sh = lambda t: t.view(B, S, self.heads, self.head_dim).transpose(1, 2)
        q = apply_rotary_emb(self.norm_q(sh(self.to_q(h))), cos, sin)
        k = apply_rotary_emb(self.norm_k(sh(self.to_k(h))), cos, sin)
        o = F.scaled_dot_product_attention(q, k, sh(self.to_v(h)))
        return o.transpose(1, 2).reshape(B, S, -1)


class FluxSingleBlockMirror(nn.Module):
    """Parallel attn + MLP from one modulated input; proj_out over concat."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.norm = AdaLNMirror(dim, 3)
        self.attn = _SingleAttn(dim, heads, head_dim)
        self.proj_mlp = nn.Linear(dim, 4 * dim)
        self.proj_out = nn.Linear(5 * dim, dim)

    def forward(self, x, temb, cos, sin):
        shift, scale, gate = self.norm(temb)
        h = _ln(x) * (1 + scale[:, None]) + shift[:, None]
        att = self.attn(h, cos, sin)
        mlp = F.gelu(self.proj_mlp(h), approximate="tanh")
        return x + gate[:, None] * self.proj_out(torch.cat([att, mlp], dim=-1))


class FluxTransformerMirror(nn.Module):
    """cfg: models.flux.FluxConfig (shapes only; torch side is always fp32)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dim = cfg.hidden_dim
        self.x_embedder = nn.Linear(cfg.in_channels, dim)
        self.context_embedder = nn.Linear(cfg.joint_attention_dim, dim)
        self.time_text_embed = TimeTextGuidanceEmbed(
            dim, cfg.pooled_projection_dim, cfg.guidance_embeds)
        self.transformer_blocks = nn.ModuleList([
            FluxDoubleBlockMirror(dim, cfg.num_attention_heads,
                                  cfg.attention_head_dim)
            for _ in range(cfg.num_double_layers)])
        self.single_transformer_blocks = nn.ModuleList([
            FluxSingleBlockMirror(dim, cfg.num_attention_heads,
                                  cfg.attention_head_dim)
            for _ in range(cfg.num_single_layers)])
        self.norm_out = AdaLNMirror(dim, 2)
        self.proj_out = nn.Linear(dim, cfg.in_channels)

    def forward(self, latents, timestep, encoder_hidden_states, pooled,
                img_ids, txt_ids, guidance=None):
        c = self.cfg
        img = self.x_embedder(latents)
        txt = self.context_embedder(encoder_hidden_states)
        if guidance is None and c.guidance_embeds:
            guidance = torch.full_like(timestep, 3.5)
        temb = self.time_text_embed(timestep, pooled, guidance)
        ids = torch.cat([txt_ids, img_ids], dim=0)
        cos, sin = rope_cos_sin(ids, c.rope_axes_dims)
        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, cos, sin)
        x = torch.cat([txt, img], dim=1)
        for blk in self.single_transformer_blocks:
            x = blk(x, temb, cos, sin)
        img = x[:, txt.shape[1]:]
        scale, shift = self.norm_out(temb)
        img = _ln(img) * (1 + scale[:, None]) + shift[:, None]
        return self.proj_out(img)
