"""SD3 pipeline bundle: MMDiT + VAE + text-encoder params behind one object.

The reference leans on diffusers' StableDiffusion3Pipeline
(train_sd3_fast_pickscore.py:447-486). Here the bundle owns Flax modules +
param pytrees and exposes the jit-compatible closures the rollout/trainer need.
``random_init`` builds any size from config (tests / benches);
``from_pretrained`` loads converted HF weights from a local directory
(models.convert).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
from adv_grpo_tpu.models.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass
class SD3Pipeline:
    mmdit_cfg: MMDiTConfig
    vae_cfg: VAEConfig
    mmdit: MMDiT
    vae: AutoencoderKL
    transformer_params: Any
    vae_params: Any
    text_encoder: Optional[Any] = None  # SD3TextEncoderSet (host-side tokenizers)
    text_seq_len: int = 154  # 77 clip + 77 t5 default; config-dependent

    # ── constructors ──────────────────────────────────────────────────────

    @classmethod
    def random_init(cls, key, mmdit_cfg: MMDiTConfig, vae_cfg: VAEConfig,
                    latent_hw: int = 64, text_seq_len: int = 154):
        k1, k2 = jax.random.split(key)
        mmdit = MMDiT(mmdit_cfg)
        vae = AutoencoderKL(vae_cfg)
        lat = jnp.zeros((1, mmdit_cfg.in_channels, latent_hw, latent_hw))
        ctx = jnp.zeros((1, text_seq_len, mmdit_cfg.joint_attention_dim))
        pooled = jnp.zeros((1, mmdit_cfg.pooled_projection_dim))
        tvars = jax.jit(mmdit.init)(k1, lat, jnp.zeros((1,)), ctx, pooled)
        img_hw = latent_hw * vae_cfg.downscale
        vvars = jax.jit(vae.init)(k2, jnp.zeros((1, 3, img_hw, img_hw)))
        return cls(mmdit_cfg, vae_cfg, mmdit, vae, tvars, vvars,
                   text_seq_len=text_seq_len)

    @classmethod
    def from_pretrained(cls, model_dir: str, *, lora_rank: int = 0,
                        lora_alpha: float = 1.0, dtype=jnp.bfloat16,
                        attention_backend=None, remat=True,
                        remat_policy="save_attn"):
        from adv_grpo_tpu.models import convert

        return convert.load_sd3_pipeline(
            model_dir, lora_rank=lora_rank, lora_alpha=lora_alpha, dtype=dtype,
            attention_backend=attention_backend, remat=remat,
            remat_policy=remat_policy)

    # ── jit-friendly closures ─────────────────────────────────────────────

    def velocity_fn(self, transformer_params, lora_scale=1.0) -> Callable:
        """(latents, t, embeds, pooled) -> velocity, closing over params."""
        variables = dict(transformer_params)

        def fn(latents, t, embeds, pooled):
            return self.mmdit.apply(variables, latents, t, embeds, pooled,
                                    lora_scale=lora_scale)

        return fn

    def decode(self, latents):
        """Raw final latents -> images in [-1,1] (reference sd3_..._fast.py:667-670:
        unscale by the VAE factors then decode; VAE kept fp32)."""
        z = latents.astype(jnp.float32) / self.vae_cfg.scaling_factor + self.vae_cfg.shift_factor
        return self.vae.apply(self.vae_params, z, method=self.vae.decode)

    def encode_image(self, images, key=None):
        """Images -> scaled latents (distribution-transfer entry,
        reference image_to_latent sd3_..._fast.py:686-705)."""
        return self.vae.apply(self.vae_params, images, key,
                              method=self.vae.encode)

    def prepare_latents(self, key, batch: int, latent_hw: Optional[int] = None):
        hw = latent_hw or 64
        return jax.random.normal(
            key, (batch, self.mmdit_cfg.in_channels, hw, hw), jnp.float32)
