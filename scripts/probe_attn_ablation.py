"""How much of the real CFG MMDiT forward is attention? Ablation probe.

profile_trace.py's per-op spans and probe_attention.py's standalone kernel
timings disagree with the forward's overall MFU (the three numbers are
mutually inconsistent), so this measures the attention share directly:
build the production cfg_forward twice — stock, and with joint_mha/mha_rms
monkeypatched to a trivial non-attention stand-in (returns v) — and compare
wall times. The delta IS the attention cost in context (kernels + their
layout overhead), immune to trace-lane semantics.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_attn_ablation.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed(run, reps=5):
    run()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import adv_grpo_tpu.models.mmdit as mmdit_mod
    from scripts.profile_trace import build_forward

    run = build_forward(batch=8)
    t_full = timed(run)
    print(f"cfg_forward stock       : {t_full * 1e3:7.1f} ms")

    real_joint, real_mha = mmdit_mod.joint_mha, mmdit_mod.mha_rms
    try:
        mmdit_mod.joint_mha = lambda q_i, k_i, v_i, q_t, k_t, v_t, **kw: (v_i, v_t)
        mmdit_mod.mha_rms = lambda q, k, v, **kw: v
        run_noattn = build_forward(batch=8)
        t_noattn = timed(run_noattn)
    finally:
        mmdit_mod.joint_mha, mmdit_mod.mha_rms = real_joint, real_mha
    print(f"cfg_forward no-attention: {t_noattn * 1e3:7.1f} ms")
    d = t_full - t_noattn
    print(f"attention delta         : {d * 1e3:7.1f} ms "
          f"({d / t_full * 100:.1f}% of forward; "
          f"{d * 1e3 / 37:.2f} ms per call over 24 joint + 13 dual)")
    # matmul MFU of the attention-free remainder (analytic: token matmuls)
    img_tok, txt_tok = 16 * 1024, 16 * 154
    img_params = 24 * 28.3e6 + 13 * 9.44e6  # qkv/out+ffn per block + dual qkv
    txt_params = 24 * 28.3e6
    fl = 2 * (img_tok * img_params + txt_tok * txt_params)
    print(f"no-attn matmul MFU      : {fl / t_noattn / 197e12 * 100:7.1f}% "
          f"({fl / 1e12:.1f} TF analytic)")


if __name__ == "__main__":
    main()
