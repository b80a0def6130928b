"""Noise-level sweep demo (reference scripts/demo/sd3_sde_demo.py capability):
renders the same prompt at several noise levels with the CPS sampler to
visualise the stochasticity-quality tradeoff."""
import os
import sys

# repo-root bootstrap shared by all scripts (scripts/_path.py)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _path  # noqa: E402,F401


import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="eval_sd3_fast")
    parser.add_argument("--prompts", default="a photo of a red panda")
    parser.add_argument("--noise_levels", default="0.0,0.4,0.7,0.9")
    parser.add_argument("--out_dir", default="demo_outputs")
    parser.add_argument("--latent_hw", type=int, default=None)
    args = parser.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from adv_grpo_tpu.cli.common import build_pipeline, build_text_encoder, resolve_config
    from adv_grpo_tpu.native.lib import images_to_uint8
    from adv_grpo_tpu.rollout.sampler import SamplerConfig, denoise_with_logprob

    config = resolve_config(args.config)
    pipeline = build_pipeline(config, latent_hw=args.latent_hw)
    encode = build_text_encoder(config, pipeline)
    params = pipeline.transformer_params
    hw = args.latent_hw or int(config.resolution) // 8

    embeds, pooled = encode([args.prompts])
    neg_e, neg_p = encode([""])
    os.makedirs(args.out_dir, exist_ok=True)
    for nl in [float(x) for x in args.noise_levels.split(",")]:
        cfg = SamplerConfig(num_steps=int(config.sample.num_steps),
                            train_num_steps=int(config.sample.num_steps),
                            noise_level=nl,
                            guidance_scale=float(config.sample.guidance_scale))
        key = jax.random.PRNGKey(0)
        lat = jax.random.normal(key, (1, pipeline.mmdit_cfg.in_channels, hw, hw))
        out = denoise_with_logprob(pipeline.velocity_fn(params), lat,
                                   jnp.asarray(embeds), jnp.asarray(pooled),
                                   jnp.asarray(neg_e), jnp.asarray(neg_p), key,
                                   cfg, 0)
        img = pipeline.decode(out.final_latents)
        u8 = images_to_uint8(np.asarray(img, np.float32))[0]
        path = os.path.join(args.out_dir, f"noise_{nl:.1f}.png")
        Image.fromarray(u8).save(path)
        print(path, "mean logprob:", float(jnp.mean(out.log_probs)))


if __name__ == "__main__":
    main()
