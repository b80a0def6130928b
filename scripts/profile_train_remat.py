"""Train-microstep (remat policy x micro_splits) shootout on the real chip.

The GRPO microstep's standard-convention MFU gap (0.48 vs 0.65
remat-inclusive, BENCH_r02/r03) is pure remat re-forward work. Every matmul
output carries the same D flops/byte of recompute value, so richer
save-policies trade HBM linearly for re-forward cuts:

  save_attn      (default)  attention o/lse only          (~2.1GB saved acts)
  save_attn_qkv  + q/k/v projections                      (+~4.3GB)
  save_attn_ff   + pre-GELU fc1 outputs                   (+~5.5GB)
  save_big       all of the above

Round 3 measured all three richer tiers RESOURCE_EXHAUSTED at the production
CFG-16 shape on a 16GB v5e. The round-4 lever is ``train.micro_splits``
(config/base.py): splitting every microbatch into S sequential sub-batches
along the SAMPLE axis divides BOTH the saved residuals and the re-forward
working set by S with mathematically identical gradients (the GRPO loss is a
per-sample mean and MultiSteps averages micro-grads; equivalence is
CI-asserted in tests/test_trainer_e2e.py). This beats sequencing the
uncond/cond CFG halves (VERDICT r3's suggestion): the halves stay coupled
through the guidance combine, so their saved residuals persist jointly
through the backward — sequencing them halves only the working set, while
the sample split halves the residuals too.

This probe times production-shape microsteps (CFG-16-equivalent, 512^2,
window 2) over a (policy, splits) grid and prints device memory stats, so
the config default is chosen from measurement. Grid points are individually
guarded — an OOM on a rich tier still reports the cheaper ones — and each
point's buffers are deleted before the next compiles (an OOM verdict must
not be skewed by the previous tier's leftovers).

All reported times are per CFG-16-EQUIVALENT microstep (total / (N_MINI*T)
with the ORIGINAL minibatch count), so splits>1 rows compare directly
against the splits=1 baseline.
"""

from __future__ import annotations

# repo-root bootstrap shared by all scripts (scripts/_path.py)
import _path  # noqa: F401

import dataclasses
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

    C = mcfg0.in_channels
    N_MINI = 2  # ORIGINAL minibatch count — all times normalised to it

    def make_samples(splits: int):
        """(N_MINI*splits, batch//splits, ...) sub-microbatches — exactly what
        driver.train_phase produces via rebatch_for_training at micro_splits."""
        n_mini, bs = N_MINI * splits, batch // splits
        embeds = jnp.full((bs, seq_txt, mcfg0.joint_attention_dim), 0.01,
                          jnp.bfloat16)
        pooled = jnp.full((bs, mcfg0.pooled_projection_dim), 0.01, jnp.bfloat16)
        tile = lambda a: jnp.broadcast_to(a[None], (n_mini,) + a.shape)
        samples = dict(
            latents=jnp.zeros((n_mini, bs, train_T + 1, C, latent_hw,
                               latent_hw)),
            log_probs=jnp.zeros((n_mini, bs, train_T)),
            timesteps=jnp.full((n_mini, bs, train_T), 500.0),
            sigmas=jnp.full((n_mini, bs, train_T), 0.5),
            sigmas_prev=jnp.full((n_mini, bs, train_T), 0.4),
            advantages=jnp.ones((n_mini, bs)),
            embeds=tile(embeds), pooled=tile(pooled))
        neg_e = jnp.zeros((bs, seq_txt, mcfg0.joint_attention_dim),
                          jnp.bfloat16)
        neg_p = jnp.zeros((bs, mcfg0.pooled_projection_dim), jnp.bfloat16)
        return samples, neg_e, neg_p

    # third axis: train.cfg_sequential — re-forward the uncond/cond CFG
    # halves as two sequential B-sized calls (rollout/sampler.py:242-249).
    # Halves the live working set per transformer call without shrinking the
    # saved-residual footprint, so it composes with (not replaces) the
    # sample-axis micro_splits.
    GRID = [("save_attn", 1, False), ("save_attn", 1, True),
            ("save_attn", 2, False), ("save_attn_qkv", 1, True),
            ("save_attn_qkv", 2, False), ("save_attn_qkv", 2, True),
            ("save_attn_ff", 2, True), ("save_big", 1, True),
            ("save_big", 2, False), ("save_big", 2, True),
            ("save_big", 4, False), ("save_big", 4, True)]
    # resume/trim: ADV_GRPO_REMAT_GRID="save_big,2,1;save_big,4,1" runs only
    # those rows (the full grid costs ~1h of tunnel compiles)
    import os
    grid_env = os.environ.get("ADV_GRPO_REMAT_GRID", "")
    if grid_env:
        GRID = [(p, int(s), bool(int(q)))
                for p, s, q in (row.split(",")
                                for row in grid_env.split(";") if row)]

    for policy, splits, cfg_seq in GRID:
        st = state = train_fn = pipe = samples = None
        try:
            train_cfg = ml_collections.ConfigDict(dict(
                learning_rate=3e-4, adam_beta1=0.9, adam_beta2=0.999,
                adam_epsilon=1e-8, adam_weight_decay=1e-4, max_grad_norm=1.0,
                gradient_accumulation_steps=1, micro_splits=splits,
                clip_range=1e-5, adv_clip_max=5.0, ema=True, ema_decay=0.9,
                ema_interval=8, beta=0.0))
            samples, neg_e, neg_p = make_samples(splits)
            mcfg = MMDiTConfig.sd35_medium(lora_rank=32, lora_alpha=64.0,
                                           remat_policy=policy)
            pipe = SD3Pipeline(mcfg, vcfg, MMDiT(mcfg), vae, tvars, vvars,
                               text_seq_len=seq_txt)
            state = create_generator_state(lora, train_cfg, train_T)
            scfg_pt = dataclasses.replace(scfg, cfg_sequential=cfg_seq)
            train_fn = make_train_epoch_fn(pipe, scfg_pt, train_cfg)

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
            dt = sorted(ts)[1] / (N_MINI * train_T)  # CFG-16-equivalent
            print(f"{policy:15s} x{splits} seq={int(cfg_seq)}  "
                  f"microstep(eq) {dt:.3f} s   mem {device_mem_gb()}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and try the next tier
            print(f"{policy:15s} x{splits} seq={int(cfg_seq)}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            # free this tier's device objects BEFORE the next one compiles —
            # leftover allocations would skew the next tier's OOM verdict
            del st, state, train_fn, pipe, samples
            jax.clear_caches()


if __name__ == "__main__":
    main()
