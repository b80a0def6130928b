"""Reference-image set generation driver.

Produces the prompt -> [image files] JSON + directory contract consumed by
``config.json_path`` / ``config.reference_image_path`` (reference
reference_imgs_scripts/qwen_generate_multi.py:122-136; consumer
train_sd3_fast_pickscore.py:705-707,773-799).

The reference generates with Qwen-Image; any local diffusion checkpoint works
here (the contract is the JSON + files, not the generator). Supports multi-node
splitting (--node_rank/--num_nodes via np.array_split, reference :105), N
variations per prompt, and resume-by-existence (:41-50).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    from adv_grpo_tpu.cli.common import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="eval_sd3_fast")
    parser.add_argument("--text_file", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--num_variations", type=int, default=8)
    parser.add_argument("--node_rank", type=int, default=0)
    parser.add_argument("--num_nodes", type=int, default=1)
    parser.add_argument("--latent_hw", type=int, default=None)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from adv_grpo_tpu.cli.common import build_pipeline, build_text_encoder, resolve_config
    from adv_grpo_tpu.models.lora import merge_lora_params
    from adv_grpo_tpu.native.lib import images_to_uint8
    from adv_grpo_tpu.rollout.sampler import SamplerConfig, denoise_with_logprob
    from PIL import Image

    config = resolve_config(args.config)
    pipeline = build_pipeline(config, latent_hw=args.latent_hw)
    encode = build_text_encoder(config, pipeline)
    params = pipeline.transformer_params

    with open(args.text_file) as f:
        prompts = [line.strip() for line in f if line.strip()]
    if args.limit:
        prompts = prompts[: args.limit]
    shard = np.array_split(prompts, args.num_nodes)[args.node_rank].tolist()

    hw = args.latent_hw or int(config.resolution) // 8
    cfg = SamplerConfig(num_steps=int(config.sample.eval_num_steps),
                        train_num_steps=0, noise_level=0.0,
                        guidance_scale=float(config.sample.guidance_scale))

    @jax.jit
    def generate(embeds, pooled, neg_e, neg_p, key):
        lat = jax.random.normal(
            key, (embeds.shape[0], pipeline.mmdit_cfg.in_channels, hw, hw))
        out = denoise_with_logprob(pipeline.velocity_fn(params), lat, embeds,
                                   pooled, neg_e, neg_p, key, cfg, 0)
        return pipeline.decode(out.final_latents)

    os.makedirs(args.output_dir, exist_ok=True)
    prompt2files = {}
    for p_idx, prompt in enumerate(shard):
        names = [f"p{args.node_rank}_{p_idx:06d}_v{v}.png"
                 for v in range(args.num_variations)]
        prompt2files[prompt] = names
        if all(os.path.exists(os.path.join(args.output_dir, n)) for n in names):
            continue  # resume by existence
        embeds, pooled = encode([prompt] * args.num_variations)
        neg_e, neg_p = encode([""] * args.num_variations)
        images = generate(jnp.asarray(embeds), jnp.asarray(pooled),
                          jnp.asarray(neg_e), jnp.asarray(neg_p),
                          jax.random.PRNGKey(p_idx))
        for name, arr in zip(names, images_to_uint8(np.asarray(images, np.float32))):
            Image.fromarray(arr).save(os.path.join(args.output_dir, name))

    json_path = os.path.join(args.output_dir, f"prompt2img_node{args.node_rank}.json")
    with open(json_path, "w") as f:
        json.dump(prompt2files, f, indent=1)
    print(json_path)


if __name__ == "__main__":
    main()
