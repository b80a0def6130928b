"""Per-phase rollout breakdown on the real chip: MMDiT step vs VAE decode.

Times (a) one CFG MMDiT forward at rollout batch, (b) the 10-step denoise scan
without decode, (c) the fp32 VAE decode alone, (d) same decode in bf16 — to
locate headroom behind bench.py's headline MFU.
"""

from __future__ import annotations

import os
import sys

# repo-root bootstrap shared by all scripts (scripts/_path.py)
import _path  # noqa: F401

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3):
    fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def main():
    from adv_grpo_tpu.models.lora import lora_params, merge_lora_params
    from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
    from adv_grpo_tpu.models.vae import AutoencoderKL, VAEConfig
    from adv_grpo_tpu.rollout.sampler import SamplerConfig, denoise_with_logprob
    from adv_grpo_tpu.train.pipeline import SD3Pipeline

    batch, latent_hw, seq_txt = 8, 64, 154
    mcfg = MMDiTConfig.sd35_medium(lora_rank=32, lora_alpha=64.0)
    vcfg = VAEConfig.sd3()
    mmdit, vae = MMDiT(mcfg), AutoencoderKL(vcfg)
    key = jax.random.PRNGKey(0)

    lat1 = jnp.zeros((1, mcfg.in_channels, latent_hw, latent_hw), jnp.bfloat16)
    ctx1 = jnp.zeros((1, seq_txt, mcfg.joint_attention_dim), jnp.bfloat16)
    pooled1 = jnp.zeros((1, mcfg.pooled_projection_dim), jnp.bfloat16)
    t_shapes = jax.eval_shape(mmdit.init, key, lat1, jnp.zeros((1,)), ctx1, pooled1)
    img_hw = latent_hw * vcfg.downscale
    v_shapes = jax.eval_shape(vae.init, key, jnp.zeros((1, 3, img_hw, img_hw)))

    @jax.jit
    def materialise():
        fill = lambda s, d: jnp.full(s.shape, 0.01, d) if s.dtype == jnp.float32 \
            else jnp.zeros(s.shape, s.dtype)
        tv = jax.tree_util.tree_map(lambda s: fill(s, jnp.bfloat16), t_shapes)
        vv = jax.tree_util.tree_map(lambda s: fill(s, jnp.float32), v_shapes)
        return tv, vv

    tvars, vvars = materialise()
    pipe = SD3Pipeline(mcfg, vcfg, mmdit, vae, tvars, vvars, text_seq_len=seq_txt)
    frozen = pipe.transformer_params
    lora = lora_params(frozen["params"])
    scfg = SamplerConfig(num_steps=10, train_num_steps=2, guidance_scale=4.5,
                         noise_level=0.8)

    embeds = jnp.full((batch, seq_txt, mcfg.joint_attention_dim), 0.01, jnp.bfloat16)
    pooled = jnp.full((batch, mcfg.pooled_projection_dim), 0.01, jnp.bfloat16)
    neg_e, neg_p = jnp.zeros_like(embeds), jnp.zeros_like(pooled)

    # (a) one CFG MMDiT forward (batch 16)
    @jax.jit
    def one_step(lora_flat, x2, t2, e2, p2):
        params = {**frozen, "params": merge_lora_params(frozen["params"], lora_flat)}
        return pipe.velocity_fn(params)(x2, t2, e2, p2)

    x2 = jnp.zeros((2 * batch, mcfg.in_channels, latent_hw, latent_hw), jnp.float32)
    t2 = jnp.full((2 * batch,), 500.0)
    e2 = jnp.concatenate([neg_e, embeds], axis=0)
    p2 = jnp.concatenate([neg_p, pooled], axis=0)

    def run_step():
        return float(jnp.sum(one_step(lora, x2, t2, e2, p2).astype(jnp.float32)))

    dt_step = timeit(run_step)
    print(f"mmdit_cfg_fwd_b16: {dt_step*1e3:.1f} ms  (x10 = {dt_step*10:.3f} s)")

    # (b) 10-step scan without decode
    @jax.jit
    def scan_only(lora_flat, k, rt):
        params = {**frozen, "params": merge_lora_params(frozen["params"], lora_flat)}
        vfn = pipe.velocity_fn(params)
        lat0 = jax.random.normal(k, (batch, mcfg.in_channels, latent_hw, latent_hw),
                                 jnp.float32)
        out = denoise_with_logprob(vfn, lat0, embeds, pooled, neg_e, neg_p, k,
                                   scfg, rt)
        return out.final_latents

    rt = jnp.zeros((batch,), jnp.int32)

    def run_scan():
        return float(jnp.sum(scan_only(lora, key, rt)))

    dt_scan = timeit(run_scan)
    print(f"denoise_scan_10steps (no decode): {dt_scan:.3f} s")

    # (c) fp32 VAE decode
    lat_f = jnp.full((batch, vcfg.latent_channels, latent_hw, latent_hw), 0.1,
                     jnp.float32)

    @jax.jit
    def dec32(lat):
        return pipe.decode(lat)

    def run_dec32():
        return float(jnp.sum(dec32(lat_f).astype(jnp.float32)))

    dt_dec32 = timeit(run_dec32)
    print(f"vae_decode_fp32_b8: {dt_dec32:.3f} s")

    # (d) bf16 VAE decode (params cast once; activations bf16)
    vv16 = jax.jit(lambda v: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v))(vvars)

    @jax.jit
    def dec16(vv, lat):
        z = lat.astype(jnp.bfloat16) / vcfg.scaling_factor + vcfg.shift_factor
        img = vae.apply(vv, z, method=vae.decode)
        return jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

    def run_dec16():
        return float(jnp.sum(dec16(vv16, lat_f).astype(jnp.float32)))

    dt_dec16 = timeit(run_dec16)
    print(f"vae_decode_bf16_b8: {dt_dec16:.3f} s")

    # (e) the full production sample_fn (scan + logprob recording + window
    # extraction + decode) — bench.py's exact path, for apples-to-apples
    from adv_grpo_tpu.train.grpo_trainer import make_sample_fn

    sample_fn = make_sample_fn(pipe, scfg, latent_hw)

    def run_sample():
        out, images = sample_fn(lora, frozen, embeds, pooled, neg_e, neg_p,
                                key, rt)
        return float(jnp.sum(images.astype(jnp.float32))
                     + jnp.sum(out.log_probs))

    dt_sample = timeit(run_sample)
    print(f"full_sample_fn (scan+logprob+window+decode): {dt_sample:.3f} s")

    # (f) scan WITH logprobs kept live (no decode) — isolates the logprob and
    # ys-recording cost from the window-extraction/decode cost
    @jax.jit
    def scan_lp(lora_flat, k, rt):
        params = {**frozen, "params": merge_lora_params(frozen["params"], lora_flat)}
        vfn = pipe.velocity_fn(params)
        lat0 = jax.random.normal(k, (batch, mcfg.in_channels, latent_hw, latent_hw),
                                 jnp.float32)
        out = denoise_with_logprob(vfn, lat0, embeds, pooled, neg_e, neg_p, k,
                                   scfg, rt)
        return out.final_latents, out.log_probs

    def run_scan_lp():
        a, b = scan_lp(lora, key, rt)
        return float(jnp.sum(a) + jnp.sum(b))

    dt_scan_lp = timeit(run_scan_lp)
    print(f"denoise_scan+logprob (no decode): {dt_scan_lp:.3f} s")

    total = dt_scan + dt_dec32
    print(f"scan+decode32 = {total:.3f} s vs full sample_fn {dt_sample:.3f} s; "
          f"decode share {dt_dec32/total*100:.0f}%; "
          f"logprob+record cost {dt_scan_lp - dt_scan:.3f} s; "
          f"window+misc {dt_sample - dt_scan_lp - dt_dec32:.3f} s")


if __name__ == "__main__":
    main()
