"""Activation-parity harness vs REAL diffusers models (weights-gated).

The CLIP-text / T5 / UMT5 / SigLIP / DINOv2 converters are parity-tested in CI
against live `transformers` models (tests/test_convert.py). The SD3 MMDiT/VAE,
Flux, WAN transformer and WAN video-VAE converters target diffusers layouts,
and diffusers is not installed in the build environment — their CI check is
activation parity against hand-written torch mirrors (tests/mirrors/*), and
THIS harness retires the residual mirror-divergence risk: on any machine with
diffusers + a local checkpoint it converts the real weights and compares
activations end-to-end (VERDICT r3 #8).

Usage (needs: pip install diffusers torch; a local checkpoint directory):

  # SD3.5-medium pipeline root (transformer/ + vae/ subfolders)
  python scripts/check_sd3_parity.py --model_dir /path/to/sd3.5-medium

  # Flux.1 pipeline root (transformer/ subfolder)
  python scripts/check_sd3_parity.py --family flux --model_dir /path/to/flux

  # WAN 2.1 pipeline root (transformer/ + vae/ + scheduler/): checks the
  # transformer, the video VAE (against diffusers' own chunked streaming
  # forward), and the UniPC flow-sigma schedule (VERDICT r3 #7)
  python scripts/check_sd3_parity.py --family wan --model_dir /path/to/wan

Exit code 0 = all activations within --atol (bf16 checkpoints round-trip
through fp32 here, so 2e-2 absolute on O(1) activations is the right scale;
schedule values must match to 1e-6).
"""

from __future__ import annotations

import argparse
import os
import sys


def _setup_jax():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


def _sub(model_dir: str, name: str) -> str:
    """Resolve a pipeline subfolder, accepting a bare component dir too."""
    p = os.path.join(model_dir, name)
    return p if os.path.isdir(p) else model_dir


def check_sd3(args, failures):
    import numpy as np
    import torch
    from diffusers import AutoencoderKL, SD3Transformer2DModel

    import jax.numpy as jnp

    from adv_grpo_tpu.models import convert
    from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
    from adv_grpo_tpu.models.vae import AutoencoderKL as FlaxVAE, VAEConfig

    rng = np.random.default_rng(0)
    hw = args.latent_hw

    t_model = SD3Transformer2DModel.from_pretrained(
        _sub(args.model_dir, "transformer"),
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

    t_vae = AutoencoderKL.from_pretrained(
        _sub(args.model_dir, "vae"), torch_dtype=torch.float32).eval()
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
                                     method=fvae.encode_moments)[0])
    err = np.abs(got_mean - want_mean).max()
    print(f"VAE encode-mean max|Δ| = {err:.3e}")
    if err > args.atol:
        failures.append("vae_encode")
    got_dec = np.asarray(fvae.apply({"params": vparams},
                                    jnp.asarray(want_mean),
                                    method=fvae.decode))
    err = np.abs(got_dec - want_dec).max()
    print(f"VAE decode max|Δ| = {err:.3e}")
    if err > args.atol:
        failures.append("vae_decode")


def check_flux(args, failures):
    import numpy as np
    import torch
    from diffusers import FluxTransformer2DModel

    import jax.numpy as jnp

    from adv_grpo_tpu.models import convert
    from adv_grpo_tpu.models.flux import FluxTransformer, make_latent_ids

    tdir = _sub(args.model_dir, "transformer")
    t_model = FluxTransformer2DModel.from_pretrained(
        tdir, torch_dtype=torch.float32).eval()
    cfg, params = convert.load_flux_transformer(tdir, dtype=jnp.float32,
                                                remat=False)

    rng = np.random.default_rng(0)
    hw = args.latent_hw  # packed grid side -> S_img = hw*hw tokens
    s_txt = 32
    lat = rng.normal(0, 1, (1, hw * hw, cfg.in_channels)).astype(np.float32)
    ctx = rng.normal(0, 0.2, (1, s_txt, cfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.normal(0, 0.2, (1, cfg.pooled_projection_dim)).astype(np.float32)
    img_ids = np.asarray(make_latent_ids(hw, hw), np.float64)
    txt_ids = np.zeros((s_txt, 3), np.float64)
    sigma = 0.75  # diffusers transformer takes sigma and scales by 1000
    guidance = 3.5

    with torch.no_grad():
        want = t_model(
            hidden_states=torch.tensor(lat),
            encoder_hidden_states=torch.tensor(ctx),
            pooled_projections=torch.tensor(pooled),
            timestep=torch.tensor([sigma], dtype=torch.float32),
            img_ids=torch.tensor(img_ids, dtype=torch.float32),
            txt_ids=torch.tensor(txt_ids, dtype=torch.float32),
            guidance=(torch.tensor([guidance], dtype=torch.float32)
                      if cfg.guidance_embeds else None),
            return_dict=False)[0].numpy()
    got = np.asarray(FluxTransformer(cfg).apply(
        {"params": params}, jnp.asarray(lat),
        jnp.asarray([sigma * 1000.0], jnp.float32), jnp.asarray(ctx),
        jnp.asarray(pooled), img_ids.astype(np.int32),
        txt_ids.astype(np.int32),
        guidance=jnp.asarray([guidance], jnp.float32)), np.float32)
    err = np.abs(got - want).max()
    print(f"Flux velocity max|Δ| = {err:.3e}")
    if err > args.atol:
        failures.append("flux")


def check_wan(args, failures):
    import numpy as np
    import torch
    from diffusers import AutoencoderKLWan, WanTransformer3DModel

    import jax.numpy as jnp

    from adv_grpo_tpu.models import convert
    from adv_grpo_tpu.models.wan import WanTransformer
    from adv_grpo_tpu.models.wan_vae import WanVideoVAE
    from adv_grpo_tpu.rollout.wan import wan_schedule

    rng = np.random.default_rng(0)

    # ── transformer velocity ─────────────────────────────────────────────
    tdir = _sub(args.model_dir, "transformer")
    t_model = WanTransformer3DModel.from_pretrained(
        tdir, torch_dtype=torch.float32).eval()
    cfg, params = convert.load_wan_transformer(tdir, dtype=jnp.float32,
                                               remat=False)
    F, H, W = 3, args.latent_hw, args.latent_hw
    lat = rng.normal(0, 1, (1, cfg.in_channels, F, H, W)).astype(np.float32)
    txt = rng.normal(0, 0.2, (1, 64, cfg.text_dim)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    with torch.no_grad():
        want = t_model(
            hidden_states=torch.tensor(lat),
            timestep=torch.tensor(t),
            encoder_hidden_states=torch.tensor(txt),
            return_dict=False)[0].numpy()
    got = np.asarray(WanTransformer(cfg).apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(t),
        jnp.asarray(txt)), np.float32)
    err = np.abs(got - want).max()
    print(f"WAN velocity max|Δ| = {err:.3e}")
    if err > args.atol:
        failures.append("wan_transformer")
    del t_model

    # ── video VAE (diffusers runs its own chunked streaming forward) ────
    vdir = _sub(args.model_dir, "vae")
    t_vae = AutoencoderKLWan.from_pretrained(
        vdir, torch_dtype=torch.float32).eval()
    vcfg, vparams = convert.load_wan_vae(vdir, dtype=jnp.float32)
    fvae = WanVideoVAE(vcfg)
    frames = 1 + 2 * vcfg.temporal_factor  # e.g. 9 for the 4x WAN layout
    vid = rng.uniform(-1, 1, (1, 3, frames, 8 * vcfg.spatial_factor,
                              8 * vcfg.spatial_factor)).astype(np.float32)
    with torch.no_grad():
        want_mu = t_vae.encode(torch.tensor(vid)).latent_dist.mean.numpy()
        want_dec = t_vae.decode(torch.tensor(want_mu),
                                return_dict=False)[0].numpy()
    got_mu = np.asarray(fvae.apply({"params": vparams}, jnp.asarray(vid),
                                   method=fvae.encode_raw)[0])
    err = np.abs(got_mu - want_mu).max()
    print(f"WAN VAE encode-mean max|Δ| = {err:.3e}")
    if err > args.atol:
        failures.append("wan_vae_encode")
    got_dec = np.asarray(fvae.apply({"params": vparams}, jnp.asarray(want_mu),
                                    method=fvae.decode_raw))
    err = np.abs(got_dec - want_dec).max()
    print(f"WAN VAE decode max|Δ| = {err:.3e}")
    if err > args.atol:
        failures.append("wan_vae_decode")
    del t_vae

    # ── UniPC flow-sigma schedule (rollout/wan.py:wan_schedule) ─────────
    try:
        from diffusers import UniPCMultistepScheduler

        sched = UniPCMultistepScheduler.from_pretrained(
            _sub(args.model_dir, "scheduler"))
        for n in (10, 50):
            sched.set_timesteps(n)
            want_sig = sched.sigmas.numpy()
            want_ts = sched.timesteps.numpy().astype(np.float64)
            got_sig, got_ts = wan_schedule(
                n, shift=float(sched.config.flow_shift),
                num_train_timesteps=int(sched.config.num_train_timesteps))
            serr = np.abs(got_sig - want_sig).max()
            terr = np.abs(got_ts - want_ts).max()
            print(f"UniPC schedule n={n}: sigma max|Δ| = {serr:.3e}, "
                  f"timestep max|Δ| = {terr:.3e}")
            if serr > 1e-6 or terr > 0:
                failures.append(f"wan_schedule_{n}")
    except OSError as e:
        print(f"UniPC schedule check skipped (no scheduler dir): {e}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True,
                   help="pipeline root (with transformer/vae/scheduler "
                        "subfolders) or a bare component dir")
    p.add_argument("--family", choices=("sd3", "flux", "wan"), default="sd3")
    p.add_argument("--atol", type=float, default=2e-2)
    p.add_argument("--latent_hw", type=int, default=16)
    args = p.parse_args(argv)

    try:
        import diffusers  # noqa: F401
    except ImportError:
        print("diffusers is required for this harness (not installed in the "
              "TPU build env — run on a dev machine)")
        return 2

    _setup_jax()
    failures: list = []
    {"sd3": check_sd3, "flux": check_flux, "wan": check_wan}[args.family](
        args, failures)
    if failures:
        print(f"PARITY FAIL: {failures}")
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
