"""Is the qk^T "NT" contraction the reason attention matmuls run at 42 TF/s?

probe_window_batching.py showed the whole-tile attention body is stuck at
~42 TF/s (d=64 MXU floor ~98) in matmul-only mode, with softmax free and
per-window overhead ruled out. Remaining suspect: `dot_general(q, k,
(((1,),(1,)), ...))` contracts the minor dim of BOTH operands ("NT"), which
Mosaic may lower with an implicit transpose at reduced rate.

This probe times the identical body with K supplied pre-transposed as
(B, HD, S) so qk^T becomes a standard "NN" `dot` — plus qk-only and pv-only
variants to see which matmul carries the cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_kt_layout.py
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
HPB = 128 // D  # heads per 128-lane group
NG = H // HPB
REPS = 20
FLOPS = 4.0 * B * H * S * S * D  # both matmuls


def kernel(q_ref, k_ref, v_ref, o_ref, *, mode):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    outs = []
    for sub in range(HPB):
        qi = q[:, sub * D:(sub + 1) * D]
        vi = v[:, sub * D:(sub + 1) * D]
        if mode.startswith("kt"):
            kti = k[sub * D:(sub + 1) * D, :]  # [D, S]
            s = jax.lax.dot(qi, kti, preferred_element_type=jnp.float32)
        else:
            ki = k[:, sub * D:(sub + 1) * D]
            s = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if mode.endswith("qk_only"):
            # reduce s without a second matmul: cheap row-slice
            outs.append(s[:, :D].astype(o_ref.dtype))
            continue
        pv = jax.lax.dot(s.astype(vi.dtype), vi,
                         preferred_element_type=jnp.float32)
        outs.append(pv.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def pv_only_kernel(p_ref, v_ref, o_ref):
    p, v = p_ref[0], v_ref[0]
    outs = []
    for sub in range(HPB):
        vi = v[:, sub * D:(sub + 1) * D]
        pv = jax.lax.dot(p.astype(vi.dtype), vi,
                         preferred_element_type=jnp.float32)
        outs.append(pv.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def timed(loop, *args):
    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / REPS


def run(mode):
    spec = pl.BlockSpec((1, S, 128), lambda b_, g_: (b_, 0, g_),
                        memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((1, 128, S), lambda b_, g_: (b_, g_, 0),
                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(B, NG),
        in_specs=[spec, kt_spec if mode.startswith("kt") else spec, spec],
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

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, v = (jax.random.normal(kk, (B, S, HD), jnp.bfloat16) for kk in ks[:2])
    if mode.startswith("kt"):
        k = jax.random.normal(ks[2], (B, HD, S), jnp.bfloat16)
    else:
        k = jax.random.normal(ks[2], (B, S, HD), jnp.bfloat16)
    dt = timed(loop, q, k, v)
    fl = FLOPS / 2 if mode.endswith("qk_only") else FLOPS
    print(f"{mode:12s} {dt * 1e3:7.3f} ms  {fl / dt / 1e12:6.1f} TF/s "
          f"({fl / dt / 197e12 * 100:4.1f}% peak)", flush=True)


def run_pv_only():
    # p is a full [S, S] fp32 score block per (b, g) window; feed it bf16 to
    # match the cast the real kernel performs before the pv matmul.
    p_spec = pl.BlockSpec((1, S, S), lambda b_, g_: (b_, 0, 0),
                          memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((1, S, 128), lambda b_, g_: (b_, 0, g_),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        pv_only_kernel,
        grid=(B, NG),
        in_specs=[p_spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, S, HD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )

    @jax.jit
    def loop(p, v):
        def body(c, _):
            return c + call(p, c) * 0.0, jnp.float32(0)
        c, _ = jax.lax.scan(body, v, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    p = jax.random.normal(ks[0], (B, S, S), jnp.bfloat16)
    v = jax.random.normal(ks[1], (B, S, HD), jnp.bfloat16)
    dt = timed(loop, p, v)
    fl = FLOPS / 2
    print(f"{'pv_only':12s} {dt * 1e3:7.3f} ms  {fl / dt / 1e12:6.1f} TF/s "
          f"({fl / dt / 197e12 * 100:4.1f}% peak)", flush=True)


def main():
    for mode in ("nt", "kt", "nt_qk_only", "kt_qk_only"):
        try:
            run(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:12s} FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
    try:
        run_pv_only()
    except Exception as e:  # noqa: BLE001
        print(f"{'pv_only':12s} FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)


if __name__ == "__main__":
    main()
