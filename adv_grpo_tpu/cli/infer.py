"""Single-prompt inference CLI (reference inference_t2i.py:126-216 parity).

Usage:
  python -m adv_grpo_tpu.cli.infer --config eval_sd3_fast --prompts "a flower" \
      [--out out.png] [--lora path/to/lora]
Deterministic eval rollout (noise 0, fixed seed 0) + PNG save named
``node0_rank0_00000_{i}.png`` like the reference (:86-116).

Image-to-image distribution transfer: ``--image path.png`` (or
``config.external_image_path``) VAE-encodes the external image, forward-noises
it at ``--start_idx`` and denoises from there — the reference's
``flux_to_sd3_denoise`` entry (sd3_pipeline_with_logprob_fast.py:722-1081).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from adv_grpo_tpu.cli.common import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="eval_sd3_fast")
    parser.add_argument("--prompts", required=True)
    parser.add_argument("--out_dir", default="outputs")
    parser.add_argument("--lora", default=None)
    parser.add_argument("--latent_hw", type=int, default=None)
    parser.add_argument("--image", default=None,
                        help="external image for distribution transfer "
                             "(defaults to config.external_image_path)")
    parser.add_argument("--start_idx", type=int, default=None,
                        help="schedule step to forward-noise the external "
                             "image at (default: eval_num_steps // 2)")
    parser.add_argument("--set", action="append", default=[],
                        metavar="K=V", help="config override")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from adv_grpo_tpu.cli.common import build_pipeline, build_text_encoder, resolve_config
    from adv_grpo_tpu.models.lora import lora_params, merge_lora_params
    from adv_grpo_tpu.rollout.sampler import (
        SamplerConfig, denoise_from_image, denoise_with_logprob,
    )
    from adv_grpo_tpu.train import checkpoint as ckpt_lib

    from adv_grpo_tpu.cli.common import apply_overrides

    config = apply_overrides(resolve_config(args.config), args.set)
    pipeline = build_pipeline(config, latent_hw=args.latent_hw)
    encode = build_text_encoder(config, pipeline)

    params = pipeline.transformer_params
    lora_path = args.lora or config.train.lora_path
    if lora_path:
        lora = ckpt_lib.load_lora_only(
            lora_path, expect_rank=int(config.train.lora_rank),
            expect_alpha=float(config.train.lora_alpha))
        params = {**params, "params": merge_lora_params(params["params"], lora)}

    prompts = [args.prompts]
    embeds, pooled = encode(prompts)
    neg_e, neg_p = encode([""] * len(prompts))

    cfg = SamplerConfig(num_steps=int(config.sample.eval_num_steps),
                        train_num_steps=0, noise_level=0.0,
                        guidance_scale=float(config.sample.guidance_scale))
    hw = args.latent_hw or int(config.resolution) // 8

    image_path = args.image or str(config.get("external_image_path", ""))
    family = getattr(pipeline, "family", "sd3")
    if family == "flux" and image_path:
        raise SystemExit("--image distribution transfer is an SD3 entry "
                         "(flux_to_sd3_denoise); use an sd3 config")
    if family == "flux":
        from adv_grpo_tpu.rollout.flux import flux_denoise_window_with_logprob

        @jax.jit
        def generate(key):
            k_lat, k_roll = jax.random.split(key)
            lat0 = pipeline.prepare_latents(k_lat, len(prompts), hw)
            vfn = pipeline.velocity_fn(params)
            out = flux_denoise_window_with_logprob(
                lambda x, t: vfn(x, t, jnp.asarray(embeds),
                                 jnp.asarray(pooled)),
                lat0, k_roll, cfg.num_steps, 0, 0.0, 0)
            return pipeline.decode(out.final_latents)
    elif image_path:
        # distribution transfer: encode the external image, forward-noise at
        # start_idx, denoise the suffix deterministically
        from PIL import Image as _Image

        img_hw = hw * pipeline.vae_cfg.downscale
        pil = _Image.open(image_path).convert("RGB").resize(
            (img_hw, img_hw), _Image.BICUBIC)
        # [-1, 1] CHW: the VAE encoder's expected range (models/vae.py:175)
        ext = (np.asarray(pil, np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
        ext = np.repeat(ext, len(prompts), axis=0)
        start_idx = (args.start_idx if args.start_idx is not None
                     else int(config.sample.eval_num_steps) // 2)

        @jax.jit
        def generate(key):
            out = denoise_from_image(
                pipeline.velocity_fn(params), pipeline.encode_image,
                jnp.asarray(ext), jnp.asarray(embeds), jnp.asarray(pooled),
                jnp.asarray(neg_e), jnp.asarray(neg_p), key, cfg,
                start_idx=start_idx)
            return pipeline.decode(out.final_latents)
    else:
        @jax.jit
        def generate(key):
            lat = jax.random.normal(
                key, (len(prompts), pipeline.mmdit_cfg.in_channels, hw, hw))
            out = denoise_with_logprob(pipeline.velocity_fn(params), lat,
                                       jnp.asarray(embeds), jnp.asarray(pooled),
                                       jnp.asarray(neg_e), jnp.asarray(neg_p),
                                       key, cfg, 0)
            return pipeline.decode(out.final_latents)

    images = generate(jax.random.PRNGKey(0))
    os.makedirs(args.out_dir, exist_ok=True)
    from adv_grpo_tpu.native.lib import images_to_uint8
    from PIL import Image

    u8 = images_to_uint8(np.asarray(images, np.float32))
    paths = []
    for i, arr in enumerate(u8):
        path = os.path.join(args.out_dir, f"node0_rank0_00000_{i}.png")
        Image.fromarray(arr).save(path)
        paths.append(path)
    print("\n".join(paths))
    return paths


if __name__ == "__main__":
    main()
