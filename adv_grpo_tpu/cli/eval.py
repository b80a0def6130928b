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
    from adv_grpo_tpu.cli.common import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="eval_sd3_fast")
    parser.add_argument("--out_dir", default="eval_outputs")
    parser.add_argument("--lora", default=None)
    parser.add_argument("--latent_hw", type=int, default=None)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--rewards", action="store_true",
                        help="score generated images with config.eval_reward_fn "
                             "(reference scripts/eval.py:260-301)")
    parser.add_argument("--set", action="append", default=[],
                        metavar="K=V", help="config override")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from adv_grpo_tpu.cli.common import build_pipeline, build_text_encoder, resolve_config
    from adv_grpo_tpu.cli.train import build_trainer
    from adv_grpo_tpu.data.datasets import TextPromptDataset
    from adv_grpo_tpu.models.lora import merge_lora_params
    from adv_grpo_tpu.native.lib import images_to_uint8
    from adv_grpo_tpu.rollout.sampler import SamplerConfig, denoise_with_logprob
    from adv_grpo_tpu.train import checkpoint as ckpt_lib
    from PIL import Image

    from adv_grpo_tpu.cli.common import apply_overrides

    config = apply_overrides(resolve_config(args.config), args.set)
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

    reward_fn = None
    if args.rewards:
        from adv_grpo_tpu.cli.common import build_reward_context
        from adv_grpo_tpu.rewards.registry import multi_score

        names = dict(config.eval_reward_fn) or dict(config.reward_fn)
        if str(config.test_reference_image_path) and str(config.json_path):
            from adv_grpo_tpu.data.datasets import ReferenceImageStore

            ctx_store = ReferenceImageStore(
                str(config.json_path), str(config.test_reference_image_path),
                resolution=int(config.resolution))
        else:
            ctx_store = None
            needs_refs = {"image_similarity", "image_similarity_eval",
                          "siglip_image_similarity", "constractive_external"}
            dropped = sorted(set(names) & needs_refs)
            if dropped:
                print(f"no reference-image store configured; skipping {dropped}")
                names = {k: v for k, v in names.items() if k not in needs_refs}
        ctx = build_reward_context(config, set(names))
        reward_fn = (multi_score(names, ctx), ctx_store)

    os.makedirs(args.out_dir, exist_ok=True)
    rank = jax.process_index()
    reward_sums, reward_counts = {}, {}
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
        if reward_fn is not None:
            fn, store = reward_fn
            refs = (jnp.asarray(store.get_batch(chunk)) if store is not None
                    else None)
            details, _ = fn(images, chunk, [{}] * len(chunk), ref_images=refs)
            for k_, v_ in details.items():
                reward_sums[k_] = reward_sums.get(k_, 0.0) + float(np.sum(v_))
                reward_counts[k_] = reward_counts.get(k_, 0) + len(v_)
        u8 = images_to_uint8(np.asarray(images, np.float32))
        for i, (prompt, arr) in enumerate(zip(chunk, u8)):
            idx = start + i
            if idx >= len(prompts):
                break
            name = f"node0_rank{rank}_{idx:05d}_0.png"
            Image.fromarray(arr).save(os.path.join(args.out_dir, name))
            prompt2files.setdefault(prompt, []).append(name)

    # Merge the per-rank prompt->files maps. Strings can't ride a device
    # allgather (reference gathers tokenized prompts for the same reason,
    # scripts/eval.py:153-166) — ranks share a filesystem (the reference's
    # assumption too: all ranks write PNGs into one out_dir), so each rank
    # writes a JSON shard and rank 0 merges after a device barrier.
    shard_path = os.path.join(args.out_dir, f"prompt2img_rank{rank}.json")
    with open(shard_path, "w") as f:
        json.dump(prompt2files, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("eval_prompt2img_shards")
    if jax.process_index() == 0:
        merged = {}
        for fname in sorted(os.listdir(args.out_dir)):
            if fname.startswith("prompt2img_rank") and fname.endswith(".json"):
                with open(os.path.join(args.out_dir, fname)) as f:
                    for k, v in json.load(f).items():
                        merged.setdefault(k, []).extend(v)
        with open(os.path.join(args.out_dir, "prompt2img.json"), "w") as f:
            json.dump(merged, f, indent=1)
    print(f"wrote {sum(len(v) for v in prompt2files.values())} images to {args.out_dir}")
    for k_ in sorted(reward_sums):
        print(f"eval_reward_{k_}: {reward_sums[k_] / max(reward_counts[k_], 1):.6f}")


if __name__ == "__main__":
    main()
