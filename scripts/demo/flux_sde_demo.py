"""Flux / Flux-Kontext full-SDE noise-level sweep demo.

Reference capability: scripts/demo/flux_sde_demo.py + flux_kontext_sde_demo.py
drive flux_pipeline_with_logprob.py / flux_kontext_pipeline_with_logprob.py at
several noise levels to visualise the stochasticity-quality tradeoff. Here the
same sweep runs through ``rollout.flux.flux_denoise_with_logprob`` (one
lax.scan, per-step Flow-SDE logprobs) on a FluxTransformer.

Weights: random-init ``FluxConfig.tiny()`` by default (path/shape smoke);
set ``FLUX_DIR`` to a local diffusers FluxTransformer2DModel directory to run
the real model (``models.convert.load_flux_transformer``). ``--kontext`` packs
a conditioning image latent and concatenates it along the token sequence each
step (reference flux_kontext_pipeline_with_logprob.py:209-211).
"""
import os
import sys

# repo-root bootstrap shared by all scripts (scripts/_path.py)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _path  # noqa: E402,F401


import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="flux_smoke")
    parser.add_argument("--noise_levels", default="0.0,0.4,0.7,0.9")
    parser.add_argument("--out_dir", default="demo_outputs/flux")
    parser.add_argument("--kontext", action="store_true",
                        help="image-conditioned (Kontext) mode: a conditioning "
                             "latent rides the token seq at each model call")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import logging
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from adv_grpo_tpu.cli.common import resolve_config
    from adv_grpo_tpu.models.flux import (
        FluxConfig, FluxTransformer, make_latent_ids,
    )
    from adv_grpo_tpu.native.lib import images_to_uint8
    from adv_grpo_tpu.rollout.flux import (
        FluxSamplerConfig, flux_denoise_with_logprob, pack_latents,
        unpack_latents,
    )

    config = resolve_config(args.config)
    model_dir = str(config.pretrained.model or "")
    key = jax.random.PRNGKey(args.seed)

    if model_dir:
        from adv_grpo_tpu.models.convert import load_flux_transformer

        cfg, params = load_flux_transformer(model_dir)
        model = FluxTransformer(cfg)
        variables = {"params": params}
    else:
        logging.getLogger(__name__).warning(
            "FLUX_DIR not set -> tiny RANDOM-INIT Flux (sampler-path demo; "
            "outputs are noise)")
        cfg = FluxConfig.tiny()
        model = FluxTransformer(cfg)

    # latent grid: resolution/8 pixels-per-latent, packed 2x2 per token
    gh = gw = max(2, int(config.resolution) // 16)
    S = gh * gw
    img_ids = make_latent_ids(gh, gw)
    S_txt = 4
    txt_ids = np.zeros((S_txt, 3), np.int32)

    key, ki = jax.random.split(key)
    C = cfg.in_channels // 4
    latents = jax.random.normal(ki, (1, C, gh * 2, gw * 2), jnp.float32)
    packed = pack_latents(latents)

    key, kt, kp = jax.random.split(key, 3)
    txt = jax.random.normal(kt, (1, S_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(kp, (1, cfg.pooled_projection_dim))

    cond = None
    all_img_ids = img_ids
    if args.kontext:
        # conditioning tokens: same grid, ids offset on the frame axis the way
        # the Kontext pipeline distinguishes sample vs conditioning tokens
        cond_ids = make_latent_ids(gh, gw).copy()
        cond_ids[:, 0] = 1
        all_img_ids = np.concatenate([img_ids, cond_ids], axis=0)
        key, kc = jax.random.split(key)
        cond = pack_latents(jax.random.normal(kc, latents.shape, jnp.float32))

    if not model_dir:
        variables = jax.jit(
            lambda k: model.init(
                k, packed if cond is None else jnp.concatenate([packed, cond], 1),
                jnp.ones((1,)), txt, pooled, all_img_ids, txt_ids)
        )(jax.random.PRNGKey(1))

    def velocity_fn(tokens, t):
        return model.apply(variables, tokens, t, txt, pooled, all_img_ids,
                           txt_ids,
                           guidance=jnp.full((tokens.shape[0],),
                                             float(config.sample.guidance_scale)))

    os.makedirs(args.out_dir, exist_ok=True)
    num_steps = int(config.sample.num_steps)
    for nl in [float(x) for x in args.noise_levels.split(",")]:
        scfg = FluxSamplerConfig(num_steps=num_steps, noise_level=nl)
        out = jax.jit(
            lambda l, k: flux_denoise_with_logprob(velocity_fn, l, k, scfg,
                                                   cond_latents=cond)
        )(packed, jax.random.PRNGKey(args.seed + 1))
        final = unpack_latents(out.final_latents, gh * 2, gw * 2)
        # channel-normalised latent visualisation (real decode needs the Flux
        # AutoencoderKL; the demo's contract is the sampler, not the VAE)
        vis = np.asarray(final[0:1, :3], np.float32)  # (1, 3, H, W)
        vis = vis / (np.abs(vis).max() + 1e-6)
        u8 = images_to_uint8(vis)[0]
        tag = "kontext_" if args.kontext else ""
        path = os.path.join(args.out_dir, f"{tag}noise_{nl:.1f}.png")
        Image.fromarray(u8).resize((256, 256), Image.NEAREST).save(path)
        # sampled logprob depends only on the noise draw (-eps^2/2 - log std);
        # at noise 0 the Gaussian is degenerate -> logprob undefined (the
        # reference's sde_step_with_logprob divides by zero there too)
        lp = ("deterministic" if nl == 0.0
              else f"{float(jnp.mean(out.log_probs)):.4f}")
        print(path, "mean logprob:", lp,
              "| latent std:", f"{float(jnp.std(out.final_latents)):.4f}")


if __name__ == "__main__":
    main()
