"""WAN text-to-video pipeline bundle behind the GRPOTrainer family seam.

The reference ships WAN as a sampler library only
(adv_grpo/diffusers_patch/wan_pipeline_with_logprob.py — no WAN trainer);
with the window rollout + Flow-SDE replay in rollout/wan.py this bundle makes
the family GRPO-trainable the same way train/flux_pipeline.py did for Flux:

  * 5-D video latents (B, C, F, H, W); ``decode`` runs the causal 3D VAE to
    video in [-1,1] (reference decodes via AutoencoderKLWan, :353-363);
  * no CFG batch and no pooled conditioning — ``velocity_fn`` accepts the
    driver's (latents, t, embeds, pooled) signature and ignores ``pooled``;
  * per-step KL vs the adapter-disabled reference policy rides the rollout
    (reference :311-341) via ``lora_scale=0``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from adv_grpo_tpu.models.wan import WanConfig, WanTransformer
from adv_grpo_tpu.models.wan_vae import WanVAEConfig, WanVideoVAE


@dataclasses.dataclass
class WanPipeline:
    wan_cfg: WanConfig
    vae_cfg: WanVAEConfig
    transformer: WanTransformer
    vae: WanVideoVAE
    transformer_params: Any
    vae_params: Any
    text_seq_len: int = 512
    latent_frames: int = 3  # F' of the 5-D latent grid
    shift: float = 3.0  # UniPC flow-sigma shift (rollout.wan.wan_schedule)
    family: str = "wan"

    @classmethod
    def random_init(cls, key, wan_cfg: WanConfig, vae_cfg: WanVAEConfig,
                    latent_hw: int = 8, latent_frames: int = 2,
                    text_seq_len: int = 6, shift: float = 3.0):
        k1, k2 = jax.random.split(key)
        model = WanTransformer(wan_cfg)
        vae = WanVideoVAE(vae_cfg)
        lat = jnp.zeros((1, wan_cfg.in_channels, latent_frames, latent_hw,
                         latent_hw))
        txt = jnp.zeros((1, text_seq_len, wan_cfg.text_dim))
        tvars = jax.jit(model.init)(k1, lat, jnp.ones((1,)), txt)
        frames = 1 + (latent_frames - 1) * vae_cfg.temporal_factor
        img_hw = latent_hw * vae_cfg.spatial_factor
        vvars = jax.jit(vae.init)(k2, jnp.zeros((1, 3, frames, img_hw,
                                                 img_hw)))
        return cls(wan_cfg, vae_cfg, model, vae, tvars, vvars,
                   text_seq_len=text_seq_len, latent_frames=latent_frames,
                   shift=shift)

    @classmethod
    def from_pretrained(cls, model_dir: str, *, vae_dir=None, lora_rank=0,
                        lora_alpha=1.0, dtype=jnp.bfloat16,
                        attention_backend=None, remat=True,
                        latent_frames: int = 21, text_seq_len: int = 512,
                        shift: float = 3.0):
        """Load a converted diffusers WanTransformer3DModel directory + the
        AutoencoderKLWan VAE from ``vae_dir`` (defaults to
        ``<model_dir>/../vae`` — the WanPipeline checkpoint layout the
        reference loads, wan_pipeline_with_logprob.py:353-363)."""
        import os

        from adv_grpo_tpu.models import convert

        cfg, params = convert.load_wan_transformer(
            model_dir, dtype=dtype, remat=remat,
            attention_backend=attention_backend, lora_rank=lora_rank,
            lora_alpha=lora_alpha)
        vae_dir = vae_dir or os.path.join(os.path.dirname(
            os.path.normpath(model_dir)), "vae")
        vcfg, vparams = convert.load_wan_vae(vae_dir)
        return cls(cfg, vcfg, WanTransformer(cfg), WanVideoVAE(vcfg),
                   {"params": params}, {"params": vparams},
                   text_seq_len=text_seq_len, latent_frames=latent_frames,
                   shift=shift)

    def velocity_fn(self, transformer_params, lora_scale=1.0):
        """(latents (B,C,F,H,W), t (B,), embeds, pooled[ignored]) ->
        velocity. ``lora_scale=0`` is the adapter-disabled reference policy
        (the reference's transformer.disable_adapter())."""
        variables = dict(transformer_params)

        def fn(latents, t, embeds, pooled=None):
            del pooled
            return self.transformer.apply(variables, latents, t, embeds,
                                          lora_scale=lora_scale)

        return fn

    def decode(self, latents):
        """Raw 5-D latents -> video (B, F, 3, H, W) in [-1,1], frame-major —
        the rewards registry's video convention (rewards/registry.py u8():
        per-frame uint8 conversion; VideoOcrScorer samples frames). The VAE's
        latent mean/std denorm happens inside WanVideoVAE.decode."""
        vid = self.vae.apply(self.vae_params, latents,
                             method=self.vae.decode)  # (B, 3, F, H, W)
        return jnp.swapaxes(vid, 1, 2)

    def prepare_latents(self, key, batch: int,
                        latent_hw: Optional[int] = None):
        hw = latent_hw or 8
        return jax.random.normal(
            key, (batch, self.wan_cfg.in_channels, self.latent_frames, hw,
                  hw), jnp.float32)
