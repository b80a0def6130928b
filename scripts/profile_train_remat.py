"""Train-microstep remat-policy shootout on the real chip.

The GRPO microstep's standard-convention MFU gap (0.48 vs 0.65
remat-inclusive, BENCH_r02/r03) is pure remat re-forward work. Every matmul
output carries the same D flops/byte of recompute value, so richer
save-policies trade HBM linearly for re-forward cuts:

  save_attn      (default)  attention o/lse only          (~2.1GB saved acts)
  save_attn_qkv  + q/k/v projections                      (+~4.3GB)
  save_attn_ff   + pre-GELU fc1 outputs                   (+~5.5GB)
  save_big       all of the above                         (likely OOM on v5e)

This probe times ONE production-shape microstep (CFG-16, 512^2, window 2)
per policy and prints device memory stats, so the config default is chosen
from measurement, not estimates. Policies are ordered smallest-first and
individually guarded — an OOM on a rich tier still reports the cheaper ones.

Measured (virtualized v5e, 16GB, 2026-08-19): save_attn 1.088 s/microstep;
save_attn_qkv / save_attn_ff / save_big all RESOURCE_EXHAUSTED at this shape
— the v5e default stays save_attn. The richer tiers are for larger-HBM parts
(v5p 95GB, v6e 32GB), where the ~25% remat re-forward is recoverable.
"""

from __future__ import annotations

import os
import sys

# runnable as `python scripts/<name>.py` from anywhere: the repo root (the
# adv_grpo_tpu package parent) is not on sys.path in that invocation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import ml_collections


def device_mem_gb():
    try:
        stats = jax.devices()[0].memory_stats()
        return {k: round(v / 2**30, 2) for k, v in stats.items()
                if k in ("bytes_in_use", "peak_bytes_in_use",
                         "bytes_limit", "largest_alloc_size")}
    except Exception:
        return {}


def main():
    from adv_grpo_tpu.models.lora import lora_params
    from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
    from adv_grpo_tpu.models.vae import AutoencoderKL, VAEConfig
    from adv_grpo_tpu.rollout.sampler import SamplerConfig
    from adv_grpo_tpu.train.grpo_trainer import make_train_epoch_fn
    from adv_grpo_tpu.train.pipeline import SD3Pipeline
    from adv_grpo_tpu.train.train_state import create_generator_state

    batch, latent_hw, seq_txt, train_T = 8, 64, 154, 2
    vcfg = VAEConfig.sd3()
    key = jax.random.PRNGKey(0)

    # one shared param tree (policy only changes the compiled graph)
    mcfg0 = MMDiTConfig.sd35_medium(lora_rank=32, lora_alpha=64.0)
    mmdit0, vae = MMDiT(mcfg0), AutoencoderKL(vcfg)
    lat1 = jnp.zeros((1, mcfg0.in_channels, latent_hw, latent_hw), jnp.bfloat16)
    ctx1 = jnp.zeros((1, seq_txt, mcfg0.joint_attention_dim), jnp.bfloat16)
    pooled1 = jnp.zeros((1, mcfg0.pooled_projection_dim), jnp.bfloat16)
    t_shapes = jax.eval_shape(mmdit0.init, key, lat1, jnp.zeros((1,)), ctx1,
                              pooled1)
    img_hw = latent_hw * vcfg.downscale
    v_shapes = jax.eval_shape(vae.init, key, jnp.zeros((1, 3, img_hw, img_hw)))

    @jax.jit
    def materialise():
        fill = lambda s, d: (jnp.full(s.shape, 0.01, d)
                             if s.dtype == jnp.float32
                             else jnp.zeros(s.shape, s.dtype))
        tv = jax.tree_util.tree_map(lambda s: fill(s, jnp.bfloat16), t_shapes)
        vv = jax.tree_util.tree_map(lambda s: fill(s, jnp.float32), v_shapes)
        return tv, vv

    tvars, vvars = materialise()
    lora = lora_params(tvars["params"])
    print("after materialise:", device_mem_gb(), flush=True)

    scfg = SamplerConfig(num_steps=10, train_num_steps=train_T,
                         guidance_scale=4.5, noise_level=0.8)
    train_cfg = ml_collections.ConfigDict(dict(
        learning_rate=3e-4, adam_beta1=0.9, adam_beta2=0.999,
        adam_epsilon=1e-8, adam_weight_decay=1e-4, max_grad_norm=1.0,
        gradient_accumulation_steps=1, clip_range=1e-5, adv_clip_max=5.0,
        ema=True, ema_decay=0.9, ema_interval=8, beta=0.0))

    C = mcfg0.in_channels
    N_MINI = 2
    embeds = jnp.full((batch, seq_txt, mcfg0.joint_attention_dim), 0.01,
                      jnp.bfloat16)
    pooled = jnp.full((batch, mcfg0.pooled_projection_dim), 0.01, jnp.bfloat16)
    neg_e, neg_p = jnp.zeros_like(embeds), jnp.zeros_like(pooled)
    tile = lambda a: jnp.broadcast_to(a[None], (N_MINI,) + a.shape)
    samples = dict(
        latents=jnp.zeros((N_MINI, batch, train_T + 1, C, latent_hw,
                           latent_hw)),
        log_probs=jnp.zeros((N_MINI, batch, train_T)),
        timesteps=jnp.full((N_MINI, batch, train_T), 500.0),
        sigmas=jnp.full((N_MINI, batch, train_T), 0.5),
        sigmas_prev=jnp.full((N_MINI, batch, train_T), 0.4),
        advantages=jnp.ones((N_MINI, batch)),
        embeds=tile(embeds), pooled=tile(pooled))

    for policy in ("save_attn", "save_attn_qkv", "save_attn_ff", "save_big"):
        try:
            mcfg = MMDiTConfig.sd35_medium(lora_rank=32, lora_alpha=64.0,
                                           remat_policy=policy)
            pipe = SD3Pipeline(mcfg, vcfg, MMDiT(mcfg), vae, tvars, vvars,
                               text_seq_len=seq_txt)
            state = create_generator_state(lora, train_cfg, train_T)
            train_fn = make_train_epoch_fn(pipe, scfg, train_cfg)

            def once(st):
                new_state, info = train_fn(st, pipe.transformer_params,
                                           samples, neg_e, neg_p)
                float(info["loss"])
                return new_state

            st = once(state)  # compile + warmup
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                st = once(st)
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[1] / (N_MINI * train_T)
            print(f"{policy:15s} microstep {dt:.3f} s   mem {device_mem_gb()}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and try the next tier
            print(f"{policy:15s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
