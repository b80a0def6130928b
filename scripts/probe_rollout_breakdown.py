"""Decompose the headline rollout's 2.83s into its phases on the real chip.

Times, each as K iterations inside one jit (bench.py methodology):
  a) full production sample_fn (10-step CFG scan + CPS/logprob + window
     gather + fp32 VAE decode)  — the bench headline;
  b) the same rollout WITHOUT the VAE decode (final latents only);
  c) the VAE decode alone (fp32, batch 8 @ 64x64 latents);
  d) the VAE decode alone in bf16 (the candidate saving — bf16 keeps fp32's
     exponent range, so the SD3-VAE fp16-overflow hazard does not apply);
  e) 10 bare CFG MMDiT forwards (no SDE step / recording / gather) — the
     MXU floor.

(a) - (b) ~= (c) isolates the decode; (b) - (e) prices the CPS step +
per-step recording + window gather. Prints one JSON line.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_rollout_breakdown.py
"""

from __future__ import annotations

import _path  # noqa: F401

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from adv_grpo_tpu.models.lora import lora_params, merge_lora_params
    from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
    from adv_grpo_tpu.models.vae import AutoencoderKL, VAEConfig
    from adv_grpo_tpu.rollout.sampler import SamplerConfig, denoise_with_logprob
    from adv_grpo_tpu.train.grpo_trainer import make_sample_fn
    from adv_grpo_tpu.train.pipeline import SD3Pipeline

    batch, latent_hw, seq_txt = 8, 64, 154
    key = jax.random.PRNGKey(0)
    mcfg = MMDiTConfig.sd35_medium(lora_rank=32, lora_alpha=64.0)
    vcfg = VAEConfig.sd3()
    mmdit, vae = MMDiT(mcfg), AutoencoderKL(vcfg)
    lat1 = jnp.zeros((1, mcfg.in_channels, latent_hw, latent_hw), jnp.bfloat16)
    ctx1 = jnp.zeros((1, seq_txt, mcfg.joint_attention_dim), jnp.bfloat16)
    pld1 = jnp.zeros((1, mcfg.pooled_projection_dim), jnp.bfloat16)
    t_shapes = jax.eval_shape(mmdit.init, key, lat1, jnp.zeros((1,)), ctx1,
                              pld1)
    img_hw = latent_hw * vcfg.downscale
    v_shapes = jax.eval_shape(vae.init, key,
                              jnp.zeros((1, 3, img_hw, img_hw)))

    @jax.jit
    def materialise():
        fill = lambda s, d: (jnp.full(s.shape, 0.01, d)
                             if s.dtype == jnp.float32
                             else jnp.zeros(s.shape, s.dtype))
        return (jax.tree_util.tree_map(lambda s: fill(s, jnp.bfloat16),
                                       t_shapes),
                jax.tree_util.tree_map(lambda s: fill(s, jnp.float32),
                                       v_shapes))

    tvars, vvars = materialise()
    pipe = SD3Pipeline(mcfg, vcfg, mmdit, vae, tvars, vvars,
                       text_seq_len=seq_txt)
    lora = lora_params(tvars["params"])
    scfg = SamplerConfig(num_steps=10, train_num_steps=2, guidance_scale=4.5,
                         noise_level=0.8)
    embeds = jnp.full((batch, seq_txt, mcfg.joint_attention_dim), 0.01,
                      jnp.bfloat16)
    pooled = jnp.full((batch, mcfg.pooled_projection_dim), 0.01, jnp.bfloat16)
    neg_e, neg_p = jnp.zeros_like(embeds), jnp.zeros_like(pooled)
    rt = jnp.zeros((batch,), jnp.int32)
    K = 4
    out = {}

    def timed(name, fn, *args):
        float(fn(*args))  # compile + warm
        ts = []
        for rep in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        out[name] = round(sorted(ts)[1] / K, 4)
        print(f"[probe] {name}: {out[name]}s", flush=True)

    # a) full production sample_fn
    sample_fn = make_sample_fn(pipe, scfg, latent_hw)

    @jax.jit
    def full_k(lora, tv, e, p, ne, np_, k, rt):
        def body(acc, i):
            o, images = sample_fn(lora, tv, e, p, ne, np_,
                                  jax.random.fold_in(k, i), rt)
            return acc + jnp.sum(images.astype(jnp.float32)) + jnp.sum(
                o.log_probs), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return acc

    timed("full", full_k, lora, tvars, embeds, pooled, neg_e, neg_p, key, rt)

    # b) rollout without decode
    @jax.jit
    def nodecode_k(lora, tv, e, p, ne, np_, k, rt):
        params = {**tvars, "params": merge_lora_params(tvars["params"], lora)}
        vfn = pipe.velocity_fn(params)

        def body(acc, i):
            kk = jax.random.fold_in(k, i)
            lat0 = jax.random.normal(
                kk, (batch, mcfg.in_channels, latent_hw, latent_hw))
            o = denoise_with_logprob(vfn, lat0, e, p, ne, np_, kk, scfg, rt)
            return acc + jnp.sum(o.final_latents) + jnp.sum(o.log_probs), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return acc

    timed("rollout_nodecode", nodecode_k, lora, tvars, embeds, pooled, neg_e,
          neg_p, key, rt)

    # c/d) decode alone, fp32 vs bf16 weights+activations
    lat_f = jnp.full((batch, mcfg.in_channels, latent_hw, latent_hw), 0.1,
                     jnp.float32)

    @jax.jit
    def dec32_k(vv, z):
        def body(acc, i):
            img = pipe.decode(z + 0.01 * i.astype(jnp.float32))
            return acc + jnp.sum(img.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return acc

    timed("decode_fp32", dec32_k, vvars, lat_f)

    vv16 = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t))(vvars)

    @jax.jit
    def dec16_k(vv, z):
        def body(acc, i):
            zz = ((z + 0.01 * i.astype(jnp.float32)).astype(jnp.bfloat16)
                  / vcfg.scaling_factor + vcfg.shift_factor)
            img = vae.apply(vv, zz, method=vae.decode)
            return acc + jnp.sum(img.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return acc

    timed("decode_bf16", dec16_k, vv16, lat_f)

    # e) bare CFG forwards x10 — the MXU floor
    @jax.jit
    def bare_k(lora, tv, e, p, ne, np_, k):
        params = {**tvars, "params": merge_lora_params(tvars["params"], lora)}
        vfn = pipe.velocity_fn(params)
        ee = jnp.concatenate([ne, e], axis=0)
        pp = jnp.concatenate([np_, p], axis=0)

        def body(acc, i):
            kk = jax.random.fold_in(k, i)
            x = jax.random.normal(
                kk, (batch, mcfg.in_channels, latent_hw, latent_hw),
                jnp.float32)

            def inner(x, j):
                v = vfn(jnp.concatenate([x, x], axis=0),
                        jnp.full((2 * batch,), 500.0), ee, pp)
                vu, vc = jnp.split(v, 2, axis=0)
                return (x - 0.05 * (vu + 4.5 * (vc - vu))).astype(
                    jnp.float32), None
            x, _ = jax.lax.scan(inner, x, jnp.arange(10))
            return acc + jnp.sum(x), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return acc

    timed("bare_cfg_x10", bare_k, lora, tvars, embeds, pooled, neg_e, neg_p,
          key)

    out["decode_delta"] = round(out["full"] - out["rollout_nodecode"], 4)
    out["sde_overhead"] = round(out["rollout_nodecode"] - out["bare_cfg_x10"],
                                4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
