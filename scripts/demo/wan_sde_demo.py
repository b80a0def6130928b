"""WAN text-to-video SDE rollout demo.

Reference capability: wan_pipeline_with_logprob.py — a UniPC-schedule SDE
rollout over 5-D video latents with per-step logprobs, optional per-step KL
against the adapter-free reference policy (``lora_scale=0``), and a
deterministic mode. Here the same rollout runs through
``rollout.wan.wan_denoise_with_logprob`` on a WanTransformer, decoded by the
3D causal video VAE into a frame strip PNG.

Weights: random-init ``WanConfig.tiny()`` + ``WanVAEConfig.tiny()`` by
default; set ``WAN_DIR`` to a local diffusers WanTransformer3DModel directory
(``models.convert.load_wan_transformer``) — the tiny VAE still decodes unless
a converted WAN VAE is wired in by the caller.
"""
import os
import sys

# repo-root bootstrap shared by all scripts (scripts/_path.py)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _path  # noqa: E402,F401


import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="wan_smoke")
    parser.add_argument("--kl_reward", type=float, default=None,
                        help="override config.sample.kl_reward (>0 records "
                             "per-step KL vs the lora_scale=0 policy)")
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--out_dir", default="demo_outputs/wan")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import logging
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from adv_grpo_tpu.cli.common import resolve_config
    from adv_grpo_tpu.models.wan import WanConfig, WanTransformer
    from adv_grpo_tpu.models.wan_vae import WanVAEConfig, WanVideoVAE
    from adv_grpo_tpu.native.lib import images_to_uint8
    from adv_grpo_tpu.rollout.wan import WanSamplerConfig, wan_denoise_with_logprob

    config = resolve_config(args.config)
    model_dir = str(config.pretrained.model or "")
    key = jax.random.PRNGKey(args.seed)

    if model_dir:
        from adv_grpo_tpu.models.convert import load_wan_transformer

        cfg, params = load_wan_transformer(model_dir)
        model = WanTransformer(cfg)
        variables = {"params": params}
    else:
        logging.getLogger(__name__).warning(
            "WAN_DIR not set -> tiny RANDOM-INIT WAN (sampler-path demo; "
            "outputs are noise)")
        cfg = WanConfig.tiny()
        model = WanTransformer(cfg)

    vcfg = WanVAEConfig.tiny(z_dim=cfg.in_channels,
                             latents_mean=(0.0,) * cfg.in_channels,
                             latents_std=(1.0,) * cfg.in_channels)
    vae = WanVideoVAE(vcfg)

    hw = max(vcfg.spatial_factor * 2, int(config.resolution))
    frames = int(config.sample.get("num_frames", 9))
    # WAN frame counts are 1 mod temporal_factor (first frame is the image
    # frame); latent F' = 1 + (F-1)/tf like diffusers AutoencoderKLWan
    lat_f = vcfg.latent_frames(max(vcfg.temporal_factor + 1, frames))
    lat_hw = hw // vcfg.spatial_factor
    # latent F/H/W must tile the transformer patch size
    pt, ph, pw = cfg.patch_size
    lat_f, lat_hw = max(pt, lat_f - lat_f % pt), max(ph, lat_hw - lat_hw % ph)

    key, kl_, kt_, kv_ = jax.random.split(key, 4)
    latents = jax.random.normal(kl_, (1, cfg.in_channels, lat_f, lat_hw, lat_hw))
    txt = jax.random.normal(kt_, (1, 6, cfg.text_dim))
    if not model_dir:
        variables = jax.jit(
            lambda k: model.init(k, latents, jnp.ones((1,)), txt)
        )(jax.random.PRNGKey(1))
    vae_vars = jax.jit(vae.init)(
        kv_, jnp.zeros((1, 3, 1 + (lat_f - 1) * vcfg.temporal_factor,
                        lat_hw * vcfg.spatial_factor,
                        lat_hw * vcfg.spatial_factor)))

    def velocity_fn(lat, t, lora_scale):
        # lora_scale=0 is the adapter-free reference policy; random-init demo
        # has no adapter, so both policies coincide (KL == 0) unless real
        # weights carry a LoRA — the rollout path is identical either way
        return model.apply(variables, lat, t, txt)

    kl_reward = (args.kl_reward if args.kl_reward is not None
                 else float(config.sample.get("kl_reward", 0.0)))
    scfg = WanSamplerConfig(num_steps=int(config.sample.num_steps),
                            deterministic=args.deterministic,
                            kl_reward=kl_reward)
    out = jax.jit(
        lambda l, k: wan_denoise_with_logprob(velocity_fn, l, k, scfg)
    )(latents, jax.random.PRNGKey(args.seed + 1))

    video = vae.apply(vae_vars, out.final_latents, method=vae.decode)
    vid = np.asarray(video[0], np.float32)  # (3, F, H, W) in [-1, 1]
    strip = np.concatenate(list(vid.transpose(1, 0, 2, 3)), axis=-1)  # (3, H, F*W)
    u8 = images_to_uint8(strip[None])[0]

    os.makedirs(args.out_dir, exist_ok=True)
    tag = "det" if args.deterministic else f"sde_kl{kl_reward:g}"
    path = os.path.join(args.out_dir, f"wan_{tag}.png")
    Image.fromarray(u8).save(path)
    print(path, "mean logprob:", float(jnp.mean(out.log_probs)),
          "mean KL:", float(jnp.mean(out.kl)))


if __name__ == "__main__":
    main()
