"""Per-kernel breakdown of the CFG MMDiT forward from a real device trace.

Captures a jax.profiler perfetto trace of K jitted CFG forwards at the rollout
shape (batch 16, 64x64 latents, 154 text tokens) and aggregates XLA op run
times by fusion name — the ground truth behind bench.py's MFU headline, at a
resolution scripts/profile_kernels.py's isolated probes can't reach (they miss
in-context scheduling and fusion effects).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_trace.py
  ... --mode train   # trace the 2-step training-window microstep instead
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import tempfile
import time

import jax
import jax.numpy as jnp


def build_forward(batch=8):
    from adv_grpo_tpu.models.lora import lora_params, merge_lora_params
    from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
    from adv_grpo_tpu.models.vae import AutoencoderKL, VAEConfig
    from adv_grpo_tpu.train.pipeline import SD3Pipeline

    latent_hw, seq_txt = 64, 154
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

    embeds = jnp.full((batch, seq_txt, mcfg.joint_attention_dim), 0.01, jnp.bfloat16)
    pooled = jnp.full((batch, mcfg.pooled_projection_dim), 0.01, jnp.bfloat16)
    neg_e, neg_p = jnp.zeros_like(embeds), jnp.zeros_like(pooled)

    @jax.jit
    def cfg_forward(lora_flat, x2, t2, e2, p2):
        params = {**frozen, "params": merge_lora_params(frozen["params"], lora_flat)}
        return pipe.velocity_fn(params)(x2, t2, e2, p2)

    x2 = jnp.zeros((2 * batch, mcfg.in_channels, latent_hw, latent_hw), jnp.float32)
    t2 = jnp.full((2 * batch,), 500.0)
    e2 = jnp.concatenate([neg_e, embeds], axis=0)
    p2 = jnp.concatenate([neg_p, pooled], axis=0)

    def run():
        return jnp.sum(cfg_forward(lora, x2, t2, e2, p2).astype(jnp.float32)
                       ).block_until_ready()

    return run


def build_train(batch=8, train_T=2):
    """One compiled GRPO inner epoch of 1 minibatch x train_T window steps —
    the CFG re-forward + logprob + clip loss + bwd + optimizer graph whose
    per-microstep cost bench.py reports as train_microstep_sec."""
    import ml_collections

    from adv_grpo_tpu.models.lora import lora_params
    from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
    from adv_grpo_tpu.models.vae import AutoencoderKL, VAEConfig
    from adv_grpo_tpu.rollout.sampler import SamplerConfig
    from adv_grpo_tpu.train.grpo_trainer import make_train_epoch_fn
    from adv_grpo_tpu.train.pipeline import SD3Pipeline
    from adv_grpo_tpu.train.train_state import create_generator_state

    latent_hw, seq_txt = 64, 154
    mcfg = MMDiTConfig.sd35_medium(lora_rank=32, lora_alpha=64.0)
    vcfg = VAEConfig.sd3()
    mmdit, vae = MMDiT(mcfg), AutoencoderKL(vcfg)
    key = jax.random.PRNGKey(0)

    lat1 = jnp.zeros((1, mcfg.in_channels, latent_hw, latent_hw), jnp.bfloat16)
    ctx1 = jnp.zeros((1, seq_txt, mcfg.joint_attention_dim), jnp.bfloat16)
    pooled1 = jnp.zeros((1, mcfg.pooled_projection_dim), jnp.bfloat16)
    t_shapes = jax.eval_shape(mmdit.init, key, lat1, jnp.zeros((1,)), ctx1,
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
    pipe = SD3Pipeline(mcfg, vcfg, mmdit, vae, tvars, vvars,
                       text_seq_len=seq_txt)
    frozen = pipe.transformer_params
    lora = lora_params(frozen["params"])

    scfg = SamplerConfig(num_steps=10, train_num_steps=train_T,
                         guidance_scale=4.5, noise_level=0.8)
    train_cfg = ml_collections.ConfigDict(dict(
        learning_rate=3e-4, adam_beta1=0.9, adam_beta2=0.999,
        adam_epsilon=1e-8, adam_weight_decay=1e-4, max_grad_norm=1.0,
        gradient_accumulation_steps=1, clip_range=1e-5, adv_clip_max=5.0,
        ema=True, ema_decay=0.9, ema_interval=8, beta=0.0))
    state = create_generator_state(lora, train_cfg, train_T)
    train_fn = make_train_epoch_fn(pipe, scfg, train_cfg)

    embeds = jnp.full((batch, seq_txt, mcfg.joint_attention_dim), 0.01,
                      jnp.bfloat16)
    pooled = jnp.full((batch, mcfg.pooled_projection_dim), 0.01, jnp.bfloat16)
    neg_e, neg_p = jnp.zeros_like(embeds), jnp.zeros_like(pooled)
    C = mcfg.in_channels
    samples = dict(
        latents=jnp.zeros((1, batch, train_T + 1, C, latent_hw, latent_hw)),
        log_probs=jnp.zeros((1, batch, train_T)),
        timesteps=jnp.full((1, batch, train_T), 500.0),
        sigmas=jnp.full((1, batch, train_T), 0.5),
        sigmas_prev=jnp.full((1, batch, train_T), 0.4),
        advantages=jnp.ones((1, batch)),
        embeds=embeds[None], pooled=pooled[None])

    box = {"state": state}

    def run():
        new_state, info = train_fn(box["state"], frozen, samples, neg_e,
                                   neg_p)
        box["state"] = new_state
        return float(info["loss"])

    return run


_CATEGORIES = [
    ("flash_attn", re.compile(r"bshd_fwd|flash|_fwd_kernel|mha")),
    ("fused_ln", re.compile(r"ln_kernel|lnmod|layer_norm|ln_mod")),
    ("fused_rms", re.compile(r"rms")),
    ("matmul", re.compile(r"dot|matmul|conv")),
    ("copy/concat", re.compile(r"copy|concatenate|transpose|pad|slice|dynamic")),
    ("elementwise", re.compile(r"fusion|add|mul|broadcast|convert|select")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in _CATEGORIES:
        if pat.search(low):
            return cat
    return "other"


def parse_trace(trace_dir: str, min_ms=0.01):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no perfetto trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device-lane track ids (TensorCore op lanes, not host threads)
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device:" in n or "Chip" in n}
    tot = collections.Counter()
    cnt = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        tot[name] += dur
        cnt[name] += 1
    return tot, cnt, pid_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--mode", choices=("forward", "train"), default="forward",
                    help="forward: one CFG MMDiT forward; train: the "
                         "2-step training-window inner epoch (fwd+bwd+opt)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir for manual inspection")
    args = ap.parse_args()

    if args.mode == "train":
        run = build_train(args.batch)
        label = f"train_epoch b{args.batch} (1 mini x 2 steps)"
    else:
        run = build_forward(args.batch)
        label = f"cfg_forward b{2*args.batch}"
    run()  # compile
    t0 = time.perf_counter()
    run()
    print(f"{label}: {(time.perf_counter()-t0)*1e3:.1f} ms wall")

    trace_dir = tempfile.mkdtemp(prefix="advgrpo_trace_")
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for _ in range(args.reps):
            run()

    tot, cnt, pid_names = parse_trace(trace_dir)
    per_rep = {k: v / args.reps for k, v in tot.items()}
    total = sum(per_rep.values())
    print(f"\ndevice total: {total:.1f} ms per forward "
          f"({len(per_rep)} distinct ops)")
    cats = collections.Counter()
    for name, ms in per_rep.items():
        cats[categorize(name)] += ms
    print("\nby category (ms / forward):")
    for cat, ms in cats.most_common():
        print(f"  {cat:12s} {ms:8.2f}  ({ms/total*100:4.1f}%)")
    print(f"\ntop {args.top} ops (ms / forward, count / forward):")
    for name, ms in sorted(per_rep.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms:8.3f} ms  x{cnt[name]//args.reps:<4d} "
              f"[{categorize(name):10s}] {name[:110]}")
    if args.keep:
        print(f"\ntrace kept at {trace_dir}")
    else:
        import shutil
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
