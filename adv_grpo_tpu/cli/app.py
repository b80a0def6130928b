"""Gradio demo app (reference app.py parity — optional, gated on gradio).

Loads the pipeline (+ optional LoRA checkpoint), exposes a prompt box and
noise/steps controls, generates deterministically (reference app.py:137-198).
Run: python -m adv_grpo_tpu.cli.app --config eval_sd3_fast [--lora DIR]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from adv_grpo_tpu.cli.common import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="eval_sd3_fast")
    parser.add_argument("--lora", default=None)
    parser.add_argument("--latent_hw", type=int, default=None)
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args(argv)

    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover - env-gated
        raise SystemExit(
            "gradio is not installed in this environment; use "
            "`python -m adv_grpo_tpu.cli.infer` for CLI generation") from e

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adv_grpo_tpu.cli.common import build_pipeline, build_text_encoder, resolve_config
    from adv_grpo_tpu.models.lora import merge_lora_params
    from adv_grpo_tpu.native.lib import images_to_uint8
    from adv_grpo_tpu.rollout.sampler import SamplerConfig, denoise_with_logprob
    from adv_grpo_tpu.train import checkpoint as ckpt_lib

    config = resolve_config(args.config)
    pipeline = build_pipeline(config, latent_hw=args.latent_hw)
    encode = build_text_encoder(config, pipeline)
    params = pipeline.transformer_params
    if args.lora:
        lora = ckpt_lib.load_lora_only(
            args.lora, expect_rank=int(config.train.lora_rank),
            expect_alpha=float(config.train.lora_alpha))
        params = {**params, "params": merge_lora_params(params["params"], lora)}
    hw = args.latent_hw or int(config.resolution) // 8

    def generate(prompt, steps, guidance, seed):
        cfg = SamplerConfig(num_steps=int(steps), train_num_steps=0,
                            noise_level=0.0, guidance_scale=float(guidance))
        embeds, pooled = encode([prompt])
        neg_e, neg_p = encode([""])
        key = jax.random.PRNGKey(int(seed))
        lat = jax.random.normal(key, (1, pipeline.mmdit_cfg.in_channels, hw, hw))
        out = denoise_with_logprob(pipeline.velocity_fn(params), lat,
                                   jnp.asarray(embeds), jnp.asarray(pooled),
                                   jnp.asarray(neg_e), jnp.asarray(neg_p), key,
                                   cfg, 0)
        img = pipeline.decode(out.final_latents)
        return images_to_uint8(np.asarray(img, np.float32))[0]

    demo = gr.Interface(
        fn=generate,
        inputs=[gr.Textbox(label="Prompt"),
                gr.Slider(1, 50, value=40, step=1, label="Steps"),
                gr.Slider(1.0, 10.0, value=4.5, label="Guidance"),
                gr.Number(value=0, label="Seed")],
        outputs=gr.Image(label="Generated"),
        title="adv_grpo_tpu — GRPO-tuned flow-matching T2I",
    )
    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
