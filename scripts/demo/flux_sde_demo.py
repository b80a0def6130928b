"""Flux SDE noise-level sweep demo (reference scripts/demo/flux_sde_demo.py
capability; flux_kontext mode via --cond_image covers flux_kontext_sde_demo).

Drives the phase-2 Flux sampler end-to-end: load a converted diffusers
FluxTransformer2DModel directory (--model) or a tiny random-init (--tiny),
then render the same latent seed at several noise levels through the full-SDE
rollout (rollout/flux.py).

Text conditioning: Flux uses T5 + CLIP pooled embeddings; supply
precomputed embeddings via --embeds (.npz with 'ctx'/'pooled') or the demo
uses deterministic pseudo-embeddings (shape-correct, for pipeline smoke)."""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None,
                        help="converted diffusers Flux transformer dir")
    parser.add_argument("--tiny", action="store_true",
                        help="random-init tiny model (pipeline smoke)")
    parser.add_argument("--noise_levels", default="0.0,0.4,0.7")
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--grid", type=int, default=8,
                        help="packed latent grid (gh=gw)")
    parser.add_argument("--seq_txt", type=int, default=8)
    parser.add_argument("--embeds", default=None,
                        help=".npz with ctx (1,S,joint_dim), pooled (1,pooled_dim)")
    parser.add_argument("--cond_image_latents", default=None,
                        help=".npy packed cond latents -> Kontext mode")
    parser.add_argument("--out", default="flux_demo.npz")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adv_grpo_tpu.models.flux import (
        FluxConfig, FluxTransformer, make_latent_ids)
    from adv_grpo_tpu.rollout.flux import (
        FluxSamplerConfig, flux_denoise_with_logprob)

    if args.model:
        from adv_grpo_tpu.models.convert import load_flux_transformer

        cfg, params = load_flux_transformer(args.model)
    elif args.tiny:
        cfg = FluxConfig.tiny()
        params = FluxTransformer(cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.grid * args.grid, cfg.in_channels)),
            jnp.zeros((1,)), jnp.zeros((1, args.seq_txt, cfg.joint_attention_dim)),
            jnp.zeros((1, cfg.pooled_projection_dim)),
            make_latent_ids(args.grid, args.grid),
            np.zeros((args.seq_txt, 3), np.int32))["params"]
    else:
        raise SystemExit("pass --model DIR or --tiny")

    model = FluxTransformer(cfg)
    gh = gw = args.grid
    if args.embeds:
        z = np.load(args.embeds)
        ctx, pooled = jnp.asarray(z["ctx"]), jnp.asarray(z["pooled"])
    else:
        rng = np.random.default_rng(0)
        ctx = jnp.asarray(rng.normal(
            0, 0.2, (1, args.seq_txt, cfg.joint_attention_dim)).astype(np.float32))
        pooled = jnp.asarray(rng.normal(
            0, 0.2, (1, cfg.pooled_projection_dim)).astype(np.float32))
    img_ids = make_latent_ids(gh, gw)
    txt_ids = np.zeros((ctx.shape[1], 3), np.int32)
    cond = (jnp.asarray(np.load(args.cond_image_latents))
            if args.cond_image_latents else None)

    def vfn(lat, t):
        return model.apply({"params": params}, lat, t, ctx, pooled,
                           img_ids, txt_ids)

    lat0 = jax.random.normal(jax.random.PRNGKey(1),
                             (1, gh * gw, cfg.in_channels))
    results = {}
    for nl in [float(x) for x in args.noise_levels.split(",")]:
        scfg = FluxSamplerConfig(num_steps=args.steps, noise_level=nl)
        out = jax.jit(lambda l, k: flux_denoise_with_logprob(
            vfn, l, k, scfg, cond_latents=cond))(lat0, jax.random.PRNGKey(2))
        results[f"latents_{nl:.1f}"] = np.asarray(out.final_latents)
        results[f"logprobs_{nl:.1f}"] = np.asarray(out.log_probs)
        lp = float(jnp.mean(out.log_probs))
        # noise 0 is the deterministic ODE: the Gaussian density degenerates
        # (reference sde_step_with_logprob divides by std 0 the same way)
        print(f"noise {nl:.1f}: mean logprob "
              + ("n/a (deterministic)" if nl == 0 else f"{lp:+.4f}"))
    np.savez(args.out, **results)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
