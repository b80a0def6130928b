"""Measure ONE steady-state GRPOTrainer.run() epoch at the production shape.

Runs standalone with a CLEAN device heap (bench.py subprocesses it BEFORE
initialising its own TPU context): 12 sampling batches x 8 images at 512^2 on
random SD3.5-M weights, resident jitted PickScore reward, pinned window start
rt=2 (~E[rt]), the measured-best train combo first with a save_attn fallback.
Prints ONE JSON line:

  {"trainer_epoch_wall_sec": W, "trainer_epoch_phase_sec": {...}}

Reference bar: the epoch loop at train_sd3_fast_pickscore.py:709-1190
(VERDICT r3 next #3 — the only way to surface host-side gaps: text encode,
tunnel pulls in sample_phase, reward-future overlap, advantage gather).
"""

from __future__ import annotations

# repo-root bootstrap shared by all scripts (scripts/_path.py)
import _path  # noqa: F401

import json
import sys
import time


def run_once(combo):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adv_grpo_tpu.config import grpo as grpo_presets
    from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
    from adv_grpo_tpu.models.vae import AutoencoderKL, VAEConfig
    from adv_grpo_tpu.rewards.scorers import PickScoreScorer
    from adv_grpo_tpu.train.driver import GRPOTrainer
    from adv_grpo_tpu.train.pipeline import SD3Pipeline
    from adv_grpo_tpu.utils.metrics import StepTimer

    batch, latent_hw, seq_txt, num_steps, train_T = 8, 64, 154, 10, 2
    key = jax.random.PRNGKey(0)

    tcfg = grpo_presets.pickscore_sd3_fast(replica_count=8)
    tcfg.wandb_init = False
    tcfg.save_dir = ""
    tcfg.max_global_step = 10**9
    tcfg.sample.num_image_per_prompt = batch
    tcfg.sample.mini_num_image_per_prompt = batch
    tcfg.sample.num_batches_per_epoch = 12
    tcfg.train.gradient_accumulation_steps = 6
    tcfg.sample.random_timestep = 2  # one sample_fn compile (~E[rt]=2.5)
    tcfg.sample.num_steps = num_steps
    tcfg.sample.train_num_steps = train_T
    tcfg.train.micro_splits = int(combo["micro_splits"])
    tcfg.train.cfg_sequential = bool(combo["cfg_sequential"])
    tcfg.tpu.remat_policy = str(combo["remat_policy"])

    mcfg = MMDiTConfig.sd35_medium(
        lora_rank=32, lora_alpha=64.0,
        remat_policy=str(combo["remat_policy"]))
    vcfg = VAEConfig.sd3()
    mmdit, vae = MMDiT(mcfg), AutoencoderKL(vcfg)
    lat = jnp.zeros((1, mcfg.in_channels, latent_hw, latent_hw), jnp.bfloat16)
    ctx = jnp.zeros((1, seq_txt, mcfg.joint_attention_dim), jnp.bfloat16)
    pooled1 = jnp.zeros((1, mcfg.pooled_projection_dim), jnp.bfloat16)
    t_shapes = jax.eval_shape(mmdit.init, key, lat, jnp.zeros((1,)), ctx,
                              pooled1)
    img_hw = latent_hw * vcfg.downscale
    v_shapes = jax.eval_shape(vae.init, key,
                              jnp.zeros((1, 3, img_hw, img_hw)))

    @jax.jit
    def materialise():
        fill = lambda s, d: (jnp.full(s.shape, 0.01, d)
                             if s.dtype == jnp.float32
                             else jnp.zeros(s.shape, s.dtype))
        return (jax.tree_util.tree_map(
                    lambda s: fill(s, jnp.bfloat16), t_shapes),
                jax.tree_util.tree_map(
                    lambda s: fill(s, jnp.float32), v_shapes))

    tvars, vvars = materialise()
    pipe = SD3Pipeline(mcfg, vcfg, mmdit, vae, tvars, vvars,
                       text_seq_len=seq_txt)

    ps = PickScoreScorer()
    ps_shapes = jax.eval_shape(ps.init_params, key)

    @jax.jit
    def ps_materialise():
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16)
            if s.dtype == jnp.float32 else jnp.zeros(s.shape, s.dtype),
            ps_shapes)

    ps_params = ps_materialise()

    def reward_fn(images, prompts, metadata, ref_images=None):
        ids_b = jnp.full((len(prompts), 77), 3, jnp.int32)
        s = np.asarray(ps.score(ps_params, jnp.asarray(images, jnp.float32),
                                ids_b), np.float32)
        return {"avg": s, "pickscore": s}, {}

    dataset = [dict(prompt=f"a photo of test object number {i}",
                    metadata={}) for i in range(16)]
    emb_rng = np.random.default_rng(0)
    emb_cache: dict = {}

    def text_encode_fn(prompts):
        # production uses the precomputed memmap store (data/embed_store.py);
        # deterministic random embeds have comparable host cost
        outs = []
        for p in prompts:
            if p not in emb_cache:
                emb_cache[p] = (
                    emb_rng.standard_normal(
                        (1, seq_txt, mcfg.joint_attention_dim),
                        np.float32) * 0.01,
                    emb_rng.standard_normal(
                        (1, mcfg.pooled_projection_dim), np.float32) * 0.01)
            outs.append(emb_cache[p])
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))

    class CaptureLogger:
        def log(self, metrics, step=0):
            pass

        def log_image_grid(self, *a, **k):
            pass

    class SnapshotTimer(StepTimer):
        def __init__(self):
            super().__init__()
            self.last_totals: dict = {}

        def reset(self):
            self.last_totals = dict(self.totals)
            super().reset()

    print(f"[tepoch] building trainer ({combo})", file=sys.stderr, flush=True)
    trainer = GRPOTrainer(tcfg, pipe, dataset, text_encode_fn, reward_fn,
                          latent_hw=latent_hw, logger=CaptureLogger())
    trainer.timer = SnapshotTimer()
    try:
        print("[tepoch] epoch 0 (compile)", file=sys.stderr, flush=True)
        trainer.run(max_epochs=1)  # epoch 0: compile everything
        print("[tepoch] epoch 1 (timed)", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        trainer.run(max_epochs=2)  # epoch 1: steady state
        wall = time.perf_counter() - t0
        phases = {k: round(v, 2)
                  for k, v in trainer.timer.last_totals.items()}
        phases["train_config"] = combo
        return wall, phases
    finally:
        trainer.executor.shutdown(wait=False)


def main():
    combos = [
        dict(remat_policy="save_big", micro_splits=4, cfg_sequential=False),
        dict(remat_policy="save_attn", micro_splits=1, cfg_sequential=False),
    ]
    errors = {}
    for combo in combos:
        try:
            wall, phases = run_once(combo)
            print(json.dumps({"trainer_epoch_wall_sec": round(wall, 2),
                              "trainer_epoch_phase_sec": phases,
                              "errors": errors or None}))
            return 0
        except Exception as e:  # noqa: BLE001 — try the cheaper combo
            errors[combo["remat_policy"]] = f"{type(e).__name__}: {e}"[:200]
            import jax

            jax.clear_caches()
    print(json.dumps({"trainer_epoch_wall_sec": None,
                      "trainer_epoch_phase_sec": None, "errors": errors}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
