"""Does batching head-groups per grid window fix the 3x attention-matmul gap?

probe_softmax_cost.py showed the whole-tile attention kernel is matmul-bound
at 32 TF/s when the d=64 MXU floor is ~98 TF/s — and softmax is free. With
grid (B, H/hpb) = 192 windows of only 537 MFLOP each, fixed per-window cost
(~11 us: prologue, DMA issue, pipeline drain) would explain the gap exactly.

This probe runs the same whole-tile body with `gpw` 128-lane groups per
window (grid (B, G/gpw), block lane-width 128*gpw) for gpw in {1, 2, 3, 6,
12}, in matmul-only and full-softmax modes, plus a copy-only kernel as the
pure-overhead floor.

CAVEAT (post-hoc): the fixed ~1.4 ms 'copy floor' this probe chased is
the axon tunnel's ~30 ms/call host dispatch cost divided by REPS=20, not
per-window overhead (see probe_launch_overhead.py). At REPS=500 the
copy kernel costs ~0 and the matmul body runs near the d=64 MXU floor;
window batching is (correctly) a no-op.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_window_batching.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, D = 16, 24, 64
S = 1024
HD = H * D
HPB = 128 // D
NG = H // HPB  # 12 groups of 128 lanes
REPS = 500
FLOPS = 4.0 * B * H * S * S * D


def kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, mode, gpw):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    outs = []
    for sub in range(gpw * HPB):
        qi = q[:, sub * D:(sub + 1) * D]
        ki = k[:, sub * D:(sub + 1) * D]
        if mode == "copy":
            outs.append(v[:, sub * D:(sub + 1) * D])
            continue
        s = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if mode == "matmul":
            p, l = s, jnp.float32(1.0)
        else:
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot(p.astype(v.dtype), v[:, sub * D:(sub + 1) * D],
                         preferred_element_type=jnp.float32)
        outs.append(pv / l if mode != "matmul" else pv)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def build(mode, gpw):
    lanes = 128 * gpw
    spec = pl.BlockSpec((1, S, lanes), lambda b_, g_: (b_, 0, g_),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(kernel, sm_scale=D ** -0.5, mode=mode, gpw=gpw),
        grid=(B, NG // gpw),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, S, HD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )

    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            return c + call(c, k, v) * 0.0, jnp.float32(0)
        c, _ = jax.lax.scan(body, q, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    return loop


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, S, HD), jnp.bfloat16) for kk in ks)
    for mode in ("copy", "matmul", "full"):
        for gpw in ((1,) if mode == "copy" else (1, 2, 3, 6, 12)):
            try:
                loop = build(mode, gpw)
                float(loop(q, k, v))
                t0 = time.perf_counter()
                float(loop(q, k, v))
                dt = (time.perf_counter() - t0) / REPS
                msg = (f"{mode:7s} gpw={gpw:<2d} {dt * 1e3:7.3f} ms")
                if mode != "copy":
                    msg += (f"  {FLOPS / dt / 1e12:6.1f} TF/s "
                            f"({FLOPS / dt / 197e12 * 100:4.1f}% peak)")
                print(msg, flush=True)
            except Exception as e:
                print(f"{mode:7s} gpw={gpw:<2d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
