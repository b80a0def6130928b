"""Torch mirror of diffusers ``AutoencoderKLWan`` (the WAN 2.1 video VAE).

State-dict compatible with the diffusers naming convert_wan_vae consumes, and
— crucially — it reproduces the CHUNKED STREAMING forward the reference runs
(adv_grpo/diffusers_patch/wan_pipeline_with_logprob.py:353-363 calls
``vae.decode``, which iterates latent frames one at a time with per-conv
2-frame caches; ``encode`` sees frame 0 alone then groups of 4).  The JAX
model (adv_grpo_tpu/models/wan_vae.py) implements the whole-sequence
equivalent, so parity against THIS mirror validates both the weight mapping
and the chunk-cache-to-static-program derivation.
"""

import torch
import torch.nn.functional as F
from torch import nn

CACHE_T = 2


class WanCausalConv3d(nn.Conv3d):
    """Conv3d whose time padding is applied manually: 2*pad_t zeros on the
    LEFT only (or a cache of previous frames in streaming mode)."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0):
        super().__init__(in_ch, out_ch, kernel_size, stride=stride,
                         padding=padding)
        self._padding = (self.padding[2], self.padding[2], self.padding[1],
                         self.padding[1], 2 * self.padding[0], 0)
        self.padding = (0, 0, 0)

    def forward(self, x, cache_x=None):
        padding = list(self._padding)
        if cache_x is not None and self._padding[4] > 0:
            x = torch.cat([cache_x.to(x.device), x], dim=2)
            padding[4] -= cache_x.shape[2]
        x = F.pad(x, padding)
        return super().forward(x)


class WanRMS_norm(nn.Module):
    def __init__(self, dim, channel_first=True, images=True, bias=False):
        super().__init__()
        broadcastable_dims = (1, 1, 1) if not images else (1, 1)
        shape = (dim, *broadcastable_dims) if channel_first else (dim,)
        self.channel_first = channel_first
        self.scale = dim ** 0.5
        self.gamma = nn.Parameter(torch.ones(shape))
        self.bias = nn.Parameter(torch.zeros(shape)) if bias else 0.0

    def forward(self, x):
        return (F.normalize(x, dim=(1 if self.channel_first else -1))
                * self.scale * self.gamma + self.bias)


class WanUpsample(nn.Upsample):
    def forward(self, x):
        return super().forward(x.float()).type_as(x)


class WanResample(nn.Module):
    def __init__(self, dim, mode):
        super().__init__()
        self.dim, self.mode = dim, mode
        if mode == "upsample2d":
            self.resample = nn.Sequential(
                WanUpsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1))
        elif mode == "upsample3d":
            self.resample = nn.Sequential(
                WanUpsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1))
            self.time_conv = WanCausalConv3d(dim, dim * 2, (3, 1, 1),
                                             padding=(1, 0, 0))
        elif mode == "downsample2d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)),
                nn.Conv2d(dim, dim, 3, stride=(2, 2)))
        elif mode == "downsample3d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)),
                nn.Conv2d(dim, dim, 3, stride=(2, 2)))
            self.time_conv = WanCausalConv3d(dim, dim, (3, 1, 1),
                                             stride=(2, 1, 1), padding=(0, 0, 0))
        else:
            self.resample = nn.Identity()

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        b, c, t, h, w = x.size()
        if self.mode == "upsample3d":
            if feat_cache is not None:
                idx = feat_idx[0]
                if feat_cache[idx] is None:
                    feat_cache[idx] = "Rep"
                    feat_idx[0] += 1
                else:
                    cache_x = x[:, :, -CACHE_T:, :, :].clone()
                    if (cache_x.shape[2] < 2 and feat_cache[idx] is not None
                            and feat_cache[idx] != "Rep"):
                        cache_x = torch.cat(
                            [feat_cache[idx][:, :, -1:, :, :], cache_x], dim=2)
                    if (cache_x.shape[2] < 2 and feat_cache[idx] is not None
                            and feat_cache[idx] == "Rep"):
                        cache_x = torch.cat(
                            [torch.zeros_like(cache_x), cache_x], dim=2)
                    if feat_cache[idx] == "Rep":
                        x = self.time_conv(x)
                    else:
                        x = self.time_conv(x, feat_cache[idx])
                    feat_cache[idx] = cache_x
                    feat_idx[0] += 1
                    x = x.reshape(b, 2, c, t, h, w)
                    x = torch.stack((x[:, 0], x[:, 1]), 3)
                    x = x.reshape(b, c, t * 2, h, w)
        t = x.shape[2]
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, x.shape[-2],
                                             x.shape[-1])
        x = self.resample(x)
        x = x.view(b, t, x.size(1), x.size(2),
                   x.size(3)).permute(0, 2, 1, 3, 4)
        if self.mode == "downsample3d":
            if feat_cache is not None:
                idx = feat_idx[0]
                if feat_cache[idx] is None:
                    feat_cache[idx] = x.clone()
                    feat_idx[0] += 1
                else:
                    cache_x = x[:, :, -1:, :, :].clone()
                    x = self.time_conv(
                        torch.cat([feat_cache[idx][:, :, -1:, :, :], x], 2))
                    feat_cache[idx] = cache_x
                    feat_idx[0] += 1
        return x


def _cached_conv(conv, x, feat_cache, feat_idx):
    """The shared per-conv cache pattern (residual blocks, head convs)."""
    if feat_cache is None:
        return conv(x)
    idx = feat_idx[0]
    cache_x = x[:, :, -CACHE_T:, :, :].clone()
    if cache_x.shape[2] < 2 and feat_cache[idx] is not None:
        cache_x = torch.cat([feat_cache[idx][:, :, -1:, :, :], cache_x],
                            dim=2)
    x = conv(x, feat_cache[idx])
    feat_cache[idx] = cache_x
    feat_idx[0] += 1
    return x


class WanResidualBlock(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.norm1 = WanRMS_norm(in_dim, images=False)
        self.conv1 = WanCausalConv3d(in_dim, out_dim, 3, padding=1)
        self.norm2 = WanRMS_norm(out_dim, images=False)
        self.conv2 = WanCausalConv3d(out_dim, out_dim, 3, padding=1)
        self.conv_shortcut = (WanCausalConv3d(in_dim, out_dim, 1)
                              if in_dim != out_dim else nn.Identity())

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        h = self.conv_shortcut(x)
        x = F.silu(self.norm1(x))
        x = _cached_conv(self.conv1, x, feat_cache, feat_idx)
        x = F.silu(self.norm2(x))
        x = _cached_conv(self.conv2, x, feat_cache, feat_idx)
        return x + h


class WanAttentionBlock(nn.Module):
    """Per-frame single-head spatial attention."""

    def __init__(self, dim):
        super().__init__()
        self.dim = dim
        self.norm = WanRMS_norm(dim)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        identity = x
        b, c, t, h, w = x.size()
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.norm(x)
        qkv = self.to_qkv(x).reshape(b * t, 1, c * 3, -1)
        qkv = qkv.permute(0, 1, 3, 2).contiguous()
        q, k, v = qkv.chunk(3, dim=-1)
        x = F.scaled_dot_product_attention(q, k, v)
        x = x.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        x = self.proj(x)
        x = x.view(b, t, c, h, w).permute(0, 2, 1, 3, 4)
        return x + identity


class WanMidBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.resnets = nn.ModuleList([WanResidualBlock(dim, dim),
                                      WanResidualBlock(dim, dim)])
        self.attentions = nn.ModuleList([WanAttentionBlock(dim)])

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        x = self.resnets[0](x, feat_cache, feat_idx)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            x = attn(x)
            x = resnet(x, feat_cache, feat_idx)
        return x


class WanEncoder3d(nn.Module):
    def __init__(self, dim, z_dim, dim_mult, num_res_blocks, attn_scales,
                 temperal_downsample):
        super().__init__()
        dims = [dim * u for u in [1] + list(dim_mult)]
        scale = 1.0
        self.conv_in = WanCausalConv3d(3, dims[0], 3, padding=1)
        self.down_blocks = nn.ModuleList([])
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(num_res_blocks):
                self.down_blocks.append(WanResidualBlock(in_dim, out_dim))
                if scale in attn_scales:
                    self.down_blocks.append(WanAttentionBlock(out_dim))
                in_dim = out_dim
            if i != len(dim_mult) - 1:
                mode = ("downsample3d" if temperal_downsample[i]
                        else "downsample2d")
                self.down_blocks.append(WanResample(out_dim, mode=mode))
                scale /= 2.0
        self.mid_block = WanMidBlock(out_dim)
        self.norm_out = WanRMS_norm(out_dim, images=False)
        self.conv_out = WanCausalConv3d(out_dim, z_dim, 3, padding=1)

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        x = _cached_conv(self.conv_in, x, feat_cache, feat_idx)
        for layer in self.down_blocks:
            if isinstance(layer, WanAttentionBlock):
                x = layer(x)
            else:
                x = layer(x, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        x = F.silu(self.norm_out(x))
        x = _cached_conv(self.conv_out, x, feat_cache, feat_idx)
        return x


class WanDecoder3d(nn.Module):
    def __init__(self, dim, z_dim, dim_mult, num_res_blocks, attn_scales,
                 temperal_upsample):
        super().__init__()
        dims = [dim * u for u in [dim_mult[-1]] + list(dim_mult)[::-1]]
        scale = 1.0 / 2 ** (len(dim_mult) - 2)
        self.conv_in = WanCausalConv3d(z_dim, dims[0], 3, padding=1)
        self.mid_block = WanMidBlock(dims[0])
        self.up_blocks = nn.ModuleList([])
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            if i > 0:
                in_dim = in_dim // 2
            for _ in range(num_res_blocks + 1):
                self.up_blocks.append(WanResidualBlock(in_dim, out_dim))
                if scale in attn_scales:
                    self.up_blocks.append(WanAttentionBlock(out_dim))
                in_dim = out_dim
            if i != len(dim_mult) - 1:
                mode = "upsample3d" if temperal_upsample[i] else "upsample2d"
                self.up_blocks.append(WanResample(out_dim, mode=mode))
                scale *= 2.0
        self.norm_out = WanRMS_norm(out_dim, images=False)
        self.conv_out = WanCausalConv3d(out_dim, 3, 3, padding=1)

    def forward(self, x, feat_cache=None, feat_idx=[0]):
        x = _cached_conv(self.conv_in, x, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        for layer in self.up_blocks:
            if isinstance(layer, WanAttentionBlock):
                x = layer(x)
            else:
                x = layer(x, feat_cache, feat_idx)
        x = F.silu(self.norm_out(x))
        x = _cached_conv(self.conv_out, x, feat_cache, feat_idx)
        return x


def _count_conv3d(model):
    return sum(isinstance(m, WanCausalConv3d) for m in model.modules())


class AutoencoderKLWanMirror(nn.Module):
    """encode/decode with the exact diffusers chunking: encoder chunks are
    [1, 4, 4, ...] input frames; the decoder runs one latent frame at a
    time. Stats (latents_mean/std) live in the pipeline, not here."""

    def __init__(self, base_dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
                 num_res_blocks=2, attn_scales=(),
                 temperal_downsample=(False, True, True)):
        super().__init__()
        self.z_dim = z_dim
        self.temperal_downsample = list(temperal_downsample)
        self.temperal_upsample = list(temperal_downsample)[::-1]
        self.encoder = WanEncoder3d(base_dim, z_dim * 2, list(dim_mult),
                                    num_res_blocks, list(attn_scales),
                                    self.temperal_downsample)
        self.quant_conv = WanCausalConv3d(z_dim * 2, z_dim * 2, 1)
        self.post_quant_conv = WanCausalConv3d(z_dim, z_dim, 1)
        self.decoder = WanDecoder3d(base_dim, z_dim, list(dim_mult),
                                    num_res_blocks, list(attn_scales),
                                    self.temperal_upsample)

    def clear_cache(self):
        self._feat_map = [None] * _count_conv3d(self.decoder)
        self._enc_feat_map = [None] * _count_conv3d(self.encoder)

    @torch.no_grad()
    def encode(self, x):
        """x (B,3,T,H,W), T ≡ 1 mod 4 -> (mu, logvar)."""
        self.clear_cache()
        t = x.shape[2]
        iter_ = 1 + (t - 1) // 4
        for i in range(iter_):
            self._enc_conv_idx = [0]
            if i == 0:
                out = self.encoder(x[:, :, :1], feat_cache=self._enc_feat_map,
                                   feat_idx=self._enc_conv_idx)
            else:
                out_ = self.encoder(x[:, :, 1 + 4 * (i - 1): 1 + 4 * i],
                                    feat_cache=self._enc_feat_map,
                                    feat_idx=self._enc_conv_idx)
                out = torch.cat([out, out_], 2)
        enc = self.quant_conv(out)
        mu, logvar = enc[:, :self.z_dim], enc[:, self.z_dim:]
        return mu, logvar.clamp(-30.0, 20.0)

    @torch.no_grad()
    def decode(self, z):
        """z (B,z,T',H',W') CHECKPOINT-space latents -> frames in [-1,1]."""
        self.clear_cache()
        num_frame = z.shape[2]
        x = self.post_quant_conv(z)
        for i in range(num_frame):
            self._conv_idx = [0]
            out_ = self.decoder(x[:, :, i:i + 1], feat_cache=self._feat_map,
                                feat_idx=self._conv_idx)
            out = out_ if i == 0 else torch.cat([out, out_], 2)
        return out.clamp(-1.0, 1.0)
