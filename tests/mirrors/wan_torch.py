"""Minimal torch mirror of diffusers WanTransformer3DModel (T2V).

State-dict-compatible with the naming convert_wan consumes
(models/convert.py:607-681); forward semantics follow the diffusers module
graph the reference loads via WanPipeline
(adv_grpo/diffusers_patch/wan_pipeline_with_logprob.py): Conv3d patch
embedding, condition_embedder (sinusoid timestep MLP + 6-way time projection,
gelu-tanh text projection), blocks of [RoPE self-attention with
rms-norm-ACROSS-heads qk + gated scale-shift-table modulation] ->
[cross-attention with affine norm2] -> [gelu FFN], root scale-shift output.
"""

import torch
import torch.nn.functional as F
from torch import nn

from tests.mirrors.flux_torch import rope_cos_sin, apply_rotary_emb
from tests.mirrors.sd3_torch import timestep_embedding


class FullDimRMSNorm(nn.Module):
    """RMSNorm over the concatenated H*d inner dim (qk_norm
    'rms_norm_across_heads'), applied BEFORE the head split."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        xf = x.float()
        var = xf.pow(2).mean(-1, keepdim=True)
        return (xf * torch.rsqrt(var + self.eps) * self.weight).to(x.dtype)


class _WanAttention(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.norm_q = FullDimRMSNorm(dim)
        self.norm_k = FullDimRMSNorm(dim)

    def _heads(self, t):
        B, S, _ = t.shape
        return t.view(B, S, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, x, kv, rope=None):
        q = self._heads(self.norm_q(self.to_q(x)))
        k = self._heads(self.norm_k(self.to_k(kv)))
        v = self._heads(self.to_v(kv))
        if rope is not None:
            cos, sin = rope
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(x.shape[0], -1,
                                      self.heads * self.head_dim)
        return self.to_out[0](o)


class _GELUProjFF(nn.Module):
    """FeedForward(inner_dim=ffn_dim, activation_fn='gelu-approximate')."""

    def __init__(self, dim, ffn_dim):
        super().__init__()

        class _P(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, ffn_dim)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        self.net = nn.ModuleList([_P(), nn.Identity(), nn.Linear(ffn_dim, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


def _ln(x, eps=1e-6):
    return F.layer_norm(x.float(), (x.shape[-1],), eps=eps)


class WanBlockMirror(nn.Module):
    def __init__(self, dim, heads, head_dim, ffn_dim, cross_attn_norm=True):
        super().__init__()
        self.attn1 = _WanAttention(dim, heads, head_dim)
        self.attn2 = _WanAttention(dim, heads, head_dim)
        if cross_attn_norm:
            self.norm2 = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=True)
        self.cross_attn_norm = cross_attn_norm
        self.ffn = _GELUProjFF(dim, ffn_dim)
        self.scale_shift_table = nn.Parameter(torch.randn(1, 6, dim) / dim**0.5)

    def forward(self, x, text, temb6, rope):
        # (1, 6, dim) table + (B, 6, dim) time projection, fp32 (diffusers
        # WanTransformerBlock)
        mods = (self.scale_shift_table + temb6.float()).chunk(6, dim=1)
        shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = \
            [m.squeeze(1) for m in mods]
        h = (_ln(x) * (1 + scale_sa[:, None]) + shift_sa[:, None]).to(x.dtype)
        x = x + gate_sa[:, None] * self.attn1(h, h, rope)
        hq = self.norm2(x.float()).to(x.dtype) if self.cross_attn_norm else \
            _ln(x).to(x.dtype)
        x = x + self.attn2(hq, text)
        h = (_ln(x) * (1 + scale_ff[:, None]) + shift_ff[:, None]).to(x.dtype)
        return x + gate_ff[:, None] * self.ffn(h)


class _TimestepMLP(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear_1 = nn.Linear(256, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class _TextProj(nn.Module):
    """PixArtAlphaTextProjection(act_fn='gelu_tanh')."""

    def __init__(self, text_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(text_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.gelu(self.linear_1(x), approximate="tanh"))


class ConditionEmbedder(nn.Module):
    def __init__(self, dim, text_dim):
        super().__init__()
        self.time_embedder = _TimestepMLP(dim)
        self.time_proj = nn.Linear(dim, 6 * dim)
        self.text_embedder = _TextProj(text_dim, dim)

    def forward(self, timestep, text_states):
        temb = self.time_embedder(timestep_embedding(timestep, 256))
        timestep_proj = self.time_proj(F.silu(temb)).unflatten(1, (6, -1))
        return temb, timestep_proj, self.text_embedder(text_states)


class WanTransformerMirror(nn.Module):
    """cfg: models.wan.WanConfig (shapes only; torch side always fp32)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dim = cfg.hidden_dim
        self.patch_embedding = nn.Conv3d(cfg.in_channels, dim,
                                         kernel_size=cfg.patch_size,
                                         stride=cfg.patch_size)
        self.condition_embedder = ConditionEmbedder(dim, cfg.text_dim)
        self.blocks = nn.ModuleList([
            WanBlockMirror(dim, cfg.num_attention_heads,
                           cfg.attention_head_dim, cfg.ffn_dim,
                           cfg.cross_attn_norm)
            for _ in range(cfg.num_layers)])
        self.scale_shift_table = nn.Parameter(torch.randn(1, 2, dim) / dim**0.5)
        import math
        self.proj_out = nn.Linear(
            dim, math.prod(cfg.patch_size) * cfg.out_channels)

    def forward(self, latents, timestep, text_states):
        c = self.cfg
        pt, ph, pw = c.patch_size
        B, C, Fr, Hh, Ww = latents.shape
        f, gh, gw = Fr // pt, Hh // ph, Ww // pw
        x = self.patch_embedding(latents)  # (B, dim, f, gh, gw)
        x = x.flatten(2).transpose(1, 2)  # (B, S, dim)
        temb, temb6, text = self.condition_embedder(timestep, text_states)

        from adv_grpo_tpu.models.wan import make_video_ids
        ids = torch.tensor(make_video_ids(f, gh, gw))
        rope = rope_cos_sin(ids, c.rope_axes_dims)
        for blk in self.blocks:
            x = blk(x, text, temb6, rope)

        mods = (self.scale_shift_table + temb.float().unsqueeze(1)).chunk(2, dim=1)
        shift, scale = [m.squeeze(1) for m in mods]
        x = (_ln(x) * (1 + scale[:, None]) + shift[:, None]).to(x.dtype)
        x = self.proj_out(x)
        # 3D unpatchify (diffusers: unflatten tokens to (f, gh, gw) then
        # interleave patch dims back)
        x = x.view(B, f, gh, gw, pt, ph, pw, c.out_channels)
        x = x.permute(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            B, c.out_channels, Fr, Hh, Ww)
        return x
