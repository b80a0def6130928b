"""Gradio demo app (reference app.py parity — optional, gated on gradio).

Feature parity with the reference HF-Spaces demo (/root/reference/app.py):

  * adapter download from a hub repo's subfolders (reference
    ``load_lora_from_subfolder``, app.py:27-44 — repo ``benzweijia/Adv-GRPO``
    publishes ``DINO/`` and ``PickScore/`` peft adapters); ``--hub_repo``
    also accepts a LOCAL directory with the same subfolder layout for
    zero-egress environments;
  * a DINO-vs-PickScore adapter picker in the UI (reference app.py:74-131
    hardcodes the DINO adapter at init; here every ``--adapters`` name plus
    the untuned base model is switchable per generation);
  * deterministic generation with prompt/steps/guidance/seed controls
    (reference infer, app.py:137-198).

Run: python -m adv_grpo_tpu.cli.app --config eval_sd3_fast \
         [--hub_repo benzweijia/Adv-GRPO | /local/adapters] \
         [--adapters DINO,PickScore] [--lora DIR]
"""

from __future__ import annotations

import argparse
import os


def resolve_adapter_dir(hub_repo: str, name: str,
                        cache_root: str = "/tmp/adv_grpo_adapters") -> str:
    """Adapter subfolder -> local directory with the peft pair.

    A local ``hub_repo`` directory is used in place; a hub repo id is
    downloaded file-by-file exactly like the reference
    (``hf_hub_download(repo_id, subfolder=name, filename=...)``,
    app.py:27-44) — which requires network + huggingface_hub and therefore
    fails loudly in zero-egress environments."""
    local = os.path.join(hub_repo, name)
    if os.path.isdir(local):
        return local
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover - env-gated
        raise SystemExit(
            f"--hub_repo {hub_repo!r} is not a local directory and "
            "huggingface_hub is not installed; pass a local adapter layout "
            "(<dir>/<name>/adapter_model.safetensors) instead") from e
    local_dir = os.path.join(cache_root, name)
    os.makedirs(local_dir, exist_ok=True)
    for filename in ("adapter_config.json", "adapter_model.safetensors"):
        hf_hub_download(repo_id=hub_repo, repo_type="model", subfolder=name,
                        filename=filename, local_dir=local_dir,
                        force_download=False)
    # hf_hub_download preserves the subfolder inside local_dir
    return os.path.join(local_dir, name)


def main(argv=None):
    from adv_grpo_tpu.cli.common import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="eval_sd3_fast")
    parser.add_argument("--lora", default=None,
                        help="single local adapter dir (listed as 'local')")
    parser.add_argument("--hub_repo", default=None,
                        help="hub repo id or local dir whose subfolders hold "
                             "peft adapters (reference: benzweijia/Adv-GRPO)")
    parser.add_argument("--adapters", default="DINO,PickScore",
                        help="comma-separated --hub_repo subfolder names")
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
    base_params = pipeline.transformer_params
    hw = args.latent_hw or int(config.resolution) // 8

    # adapter choices: hub/local subfolders + an optional --lora dir + base
    adapter_dirs: dict[str, str] = {}
    if args.hub_repo:
        for name in [a.strip() for a in args.adapters.split(",") if a.strip()]:
            adapter_dirs[name] = resolve_adapter_dir(args.hub_repo, name)
    if args.lora:
        adapter_dirs["local"] = args.lora
    choices = list(adapter_dirs) + ["base (untuned)"]
    _merged_cache: dict[str, dict] = {}

    def params_for(adapter: str):
        if adapter not in adapter_dirs:
            return base_params
        if adapter not in _merged_cache:
            lora = ckpt_lib.load_lora_only(
                adapter_dirs[adapter],
                expect_rank=int(config.train.lora_rank),
                expect_alpha=float(config.train.lora_alpha))
            _merged_cache[adapter] = {
                **base_params,
                "params": merge_lora_params(base_params["params"], lora)}
        return _merged_cache[adapter]

    def generate(prompt, adapter, steps, guidance, seed):
        params = params_for(adapter)
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
                gr.Dropdown(choices=choices, value=choices[0],
                            label="Adapter (reward model used for tuning)"),
                gr.Slider(1, 50, value=40, step=1, label="Steps"),
                gr.Slider(1.0, 10.0, value=4.5, label="Guidance"),
                gr.Number(value=0, label="Seed")],
        outputs=gr.Image(label="Generated"),
        title="adv_grpo_tpu — GRPO-tuned flow-matching T2I",
    )
    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
