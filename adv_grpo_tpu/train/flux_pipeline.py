"""Flux pipeline bundle: FluxTransformer + VAE params behind the same seam
GRPOTrainer drives for SD3 (train/pipeline.py).

The reference trains only SD3 but ships Flux samplers on the same Flow-GRPO
lineage (adv_grpo/diffusers_patch/flux_pipeline_with_logprob.py); this bundle
closes the one seam between those samplers and the unified trainer, making the
Flux family GRPO-trainable (VERDICT r3 next #10). Differences from SD3 are
encapsulated here so the driver stays family-agnostic:

  * latents are PACKED 2x2 tokens (B, S, 4C) end to end — ``velocity_fn``
    and ``decode`` speak packed; RoPE ids are trace-time constants of (S,
    S_txt);
  * no CFG batch: guidance is an embedded model input
    (flux_pipeline_with_logprob.py:153), so training ignores the negative
    embeddings and the sampler never concatenates an uncond half;
  * full-SDE rollout (every step stochastic, reference :141-187) with the
    window gathered post-hoc (rollout.flux.flux_denoise_window_with_logprob).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.models.flux import (
    FluxConfig, FluxTransformer, make_latent_ids,
)
from adv_grpo_tpu.models.vae import AutoencoderKL, VAEConfig
from adv_grpo_tpu.rollout.flux import pack_latents, unpack_latents


@dataclasses.dataclass
class FluxPipeline:
    flux_cfg: FluxConfig
    vae_cfg: VAEConfig
    transformer: FluxTransformer
    vae: AutoencoderKL
    transformer_params: Any
    vae_params: Any
    text_seq_len: int = 512  # T5-XXL tokens (Flux.1-dev max_sequence_length)
    guidance: float = 3.5  # embedded guidance (Flux.1-dev)
    family: str = "flux"

    @classmethod
    def random_init(cls, key, flux_cfg: FluxConfig, vae_cfg: VAEConfig,
                    latent_hw: int = 64, text_seq_len: int = 512,
                    guidance: float = 3.5):
        k1, k2 = jax.random.split(key)
        model = FluxTransformer(flux_cfg)
        vae = AutoencoderKL(vae_cfg)
        gh = gw = latent_hw // 2
        S = gh * gw
        lat = jnp.zeros((1, S, flux_cfg.in_channels))
        ctx = jnp.zeros((1, text_seq_len, flux_cfg.joint_attention_dim))
        pooled = jnp.zeros((1, flux_cfg.pooled_projection_dim))
        img_ids = make_latent_ids(gh, gw)
        txt_ids = np.zeros((text_seq_len, 3), np.int32)
        # ids stay trace-time constants (np): close over them instead of
        # passing through jit argument tracing
        tvars = jax.jit(lambda k, a, t, c_, p: model.init(
            k, a, t, c_, p, img_ids, txt_ids))(
            k1, lat, jnp.zeros((1,)), ctx, pooled)
        img_hw = latent_hw * vae_cfg.downscale
        vvars = jax.jit(vae.init)(k2, jnp.zeros((1, 3, img_hw, img_hw)))
        return cls(flux_cfg, vae_cfg, model, vae, tvars, vvars,
                   text_seq_len=text_seq_len, guidance=guidance)

    @classmethod
    def from_pretrained(cls, model_dir: str, *, vae_dir: Optional[str] = None,
                        lora_rank: int = 0, lora_alpha: float = 1.0,
                        dtype=jnp.bfloat16, attention_backend=None,
                        remat=True, text_seq_len: int = 512,
                        guidance: float = 3.5):
        """Load a converted diffusers FluxTransformer2DModel directory (the
        TPU analogue of FluxPipeline.from_pretrained,
        flux_pipeline_with_logprob.py) + the Flux AutoencoderKL from
        ``vae_dir`` (defaults to ``<model_dir>/../vae``)."""
        import os

        from adv_grpo_tpu.models import convert

        cfg, params = convert.load_flux_transformer(
            model_dir, dtype=dtype, remat=remat,
            attention_backend=attention_backend, lora_rank=lora_rank,
            lora_alpha=lora_alpha)
        model = FluxTransformer(cfg)
        vae_dir = vae_dir or os.path.join(os.path.dirname(
            os.path.normpath(model_dir)), "vae")
        vcfg, vparams = convert.load_vae(vae_dir, base=VAEConfig.flux())
        return cls(cfg, vcfg, model, AutoencoderKL(vcfg), {"params": params},
                   {"params": vparams}, text_seq_len=text_seq_len,
                   guidance=guidance)

    # ── jit-compatible closures (the trainer seam) ─────────────────────────

    def velocity_fn(self, transformer_params, lora_scale=1.0):
        """(packed_latents (B,S,4C), t (B,) on the sigma*1000 scale, embeds,
        pooled) -> velocity, closing over params. Token ids are trace-time
        constants recovered from the static (S, S_txt) shapes."""
        variables = dict(transformer_params)
        c = self.flux_cfg

        def fn(latents, t, embeds, pooled):
            S = latents.shape[1]
            gh = int(math.isqrt(S))
            assert gh * gh == S, (
                f"packed token count {S} is not a square grid; pass gh/gw "
                "explicitly via a custom velocity_fn")
            img_ids = make_latent_ids(gh, gh)
            txt_ids = np.zeros((embeds.shape[1], 3), np.int32)
            g = (jnp.full(t.shape, self.guidance, jnp.float32)
                 if c.guidance_embeds else None)
            return self.transformer.apply(
                variables, latents, t, embeds, pooled, img_ids, txt_ids,
                guidance=g, lora_scale=lora_scale)

        return fn

    def decode(self, packed_latents):
        """Packed final latents -> images in [-1,1]: unpack the 2x2 tokens,
        undo the latent normalisation, decode fp32 (reference
        flux_pipeline_with_logprob.py unpack + vae.decode)."""
        S = packed_latents.shape[1]
        gh = int(math.isqrt(S))
        lat = unpack_latents(packed_latents, gh * 2, gh * 2)
        z = (lat.astype(jnp.float32) / self.vae_cfg.scaling_factor
             + self.vae_cfg.shift_factor)
        return self.vae.apply(self.vae_params, z, method=self.vae.decode)

    def encode_image(self, images, key=None):
        """Images -> scaled PACKED latents (Kontext conditioning entry)."""
        lat = self.vae.apply(self.vae_params, images, key,
                             method=self.vae.encode)
        return pack_latents(lat)

    def prepare_latents(self, key, batch: int,
                        latent_hw: Optional[int] = None):
        hw = latent_hw or 64
        C = self.flux_cfg.in_channels // 4
        lat = jax.random.normal(key, (batch, C, hw, hw), jnp.float32)
        return pack_latents(lat)
