"""Where do the ~3.7 ms per attention call go? Kernel-variant bisection.

probe_attn_ablation.py pins attention at 48.5% of the CFG forward running at
~18% of peak while the surrounding matmuls hit ~80%. The matmul floor at
d=64 (K resp. N padded to 128 on the MXU) is ~98 TF/s, so the gap must be
VPU/EUP work — prime suspect: `exp` on the (S_q, S_kv) score tile.

This probe times whole-tile single-stream attention bodies (the mha_rms
geometry: grid (B, G), hpb subheads per 128-lane group) in four variants:

  full        exact production softmax (max, exp, sum, div)
  exp2        softmax via exp2 with log2(e) folded into sm_scale (splash-
              attention trick; exact same math up to 1-ulp rounding)
  noexp       exp replaced by a multiply — timing-only, measures everything
              BUT the transcendental
  matmul      p = s (no softmax at all) — the pure MXU floor

CAVEAT (post-hoc): the original REPS=20 run of this probe was dominated
by the ~30 ms/call axon tunnel dispatch floor (see
probe_launch_overhead.py), which made all variants look equal (~3.2-3.5
ms) and softmax look free. At REPS=500 the floor amortises out and the
softmax VPU passes are ~45% of the whole-tile kernel (matmul-only 0.84
ms vs full 1.53 ms at S=1024) - which motivated folding sm_scale*log2e
into the q tile and running the softmax in base 2 (joint_attention.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_softmax_cost.py
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
REPS = 500
FLOPS = 4.0 * B * H * S * S * D
LOG2E = 1.4426950408889634


def kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, mode):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    outs = []
    for i in range(HPB):
        qi = q[:, i * D:(i + 1) * D]
        ki = k[:, i * D:(i + 1) * D]
        s = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        if mode == "matmul":
            p, l = s, jnp.float32(1.0)
        else:
            m = jnp.max(s, axis=1, keepdims=True)
            if mode == "full":
                p = jnp.exp(s - m)
            elif mode == "exp2":
                # sm_scale already multiplied by log2(e); exp2(x) == exp(x/log2e)
                p = jnp.exp2(s - m)
            else:  # noexp: same dataflow, no transcendental
                p = (s - m) * 0.999
            l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot(p.astype(v.dtype), v[:, i * D:(i + 1) * D],
                         preferred_element_type=jnp.float32)
        outs.append(pv / l if mode != "matmul" else pv)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def build(mode):
    scale = D ** -0.5
    if mode == "exp2":
        scale *= LOG2E
    spec = pl.BlockSpec((1, S, 128), lambda b_, g_: (b_, 0, g_),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(kernel, sm_scale=scale, mode=mode),
        grid=(B, H // HPB),
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
    base = None
    for mode in ("full", "exp2", "noexp", "matmul"):
        loop = build(mode)
        float(loop(q, k, v))
        t0 = time.perf_counter()
        float(loop(q, k, v))
        dt = (time.perf_counter() - t0) / REPS
        if base is None:
            base = dt
        print(f"{mode:8s} {dt * 1e3:7.3f} ms  {FLOPS / dt / 1e12:6.1f} TF/s "
              f"({FLOPS / dt / 197e12 * 100:4.1f}% peak)  "
              f"vs full: {(base - dt) * 1e3:+6.3f} ms")
    # exact-value check: exp2 with folded log2(e) must match full softmax
    import numpy as np

    def once(mode):
        scale = D ** -0.5 * (LOG2E if mode == "exp2" else 1.0)
        spec = pl.BlockSpec((1, S, 128), lambda b_, g_: (b_, 0, g_),
                            memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            functools.partial(kernel, sm_scale=scale, mode=mode),
            grid=(B, H // HPB),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, S, HD), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )
        return np.asarray(jax.jit(call)(q, k, v), dtype=np.float32)

    diff = np.abs(once("full") - once("exp2")).max()
    print(f"exp2-vs-full max abs diff: {diff:.2e}")


if __name__ == "__main__":
    main()
