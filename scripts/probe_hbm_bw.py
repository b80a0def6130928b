"""Measure this chip's real streaming HBM bandwidth.

probe_kt_layout.py ruled out matmul layout as the attention bottleneck; the
remaining explanation for the ~1.4 ms copy-only floor (137 GB/s apparent) is
that the virtualized v5e simply does not deliver the 819 GB/s spec. This
probe times pure elementwise streaming passes (read + write) at several
sizes, via XLA and via a trivial whole-row Pallas kernel, to pin the number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_hbm_bw.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20


def bw_xla(nbytes):
    n = nbytes // 2  # bf16
    x = jnp.ones((n // 1024, 1024), jnp.bfloat16)

    @jax.jit
    def loop(x):
        def body(c, _):
            return c * jnp.bfloat16(1.0009765625), None
        c, _ = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / REPS
    gbs = 2 * nbytes / dt / 1e9  # read + write per pass
    print(f"xla    {nbytes / 1e6:7.1f} MB  {dt * 1e3:7.3f} ms/pass "
          f"{gbs:7.1f} GB/s", flush=True)


def bw_pallas(nbytes, rows_per_block):
    n = nbytes // 2
    rows = n // 1024
    x = jnp.ones((rows, 1024), jnp.bfloat16)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * jnp.bfloat16(1.0009765625)

    spec = pl.BlockSpec((rows_per_block, 1024), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern, grid=(rows // rows_per_block,), in_specs=[spec],
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((rows, 1024), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )

    @jax.jit
    def loop(x):
        def body(c, _):
            return call(c), None
        c, _ = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / REPS
    gbs = 2 * nbytes / dt / 1e9
    print(f"pallas {nbytes / 1e6:7.1f} MB  {dt * 1e3:7.3f} ms/pass "
          f"{gbs:7.1f} GB/s  (block rows={rows_per_block})", flush=True)


def main():
    for mb in (48, 192, 512):
        try:
            bw_xla(mb * 1024 * 1024)
        except Exception as e:  # noqa: BLE001
            print(f"xla {mb}MB FAILED: {type(e).__name__}: {str(e)[:80]}")
    for rpb in (256, 1024, 4096):
        try:
            bw_pallas(192 * 1024 * 1024, rpb)
        except Exception as e:  # noqa: BLE001
            print(f"pallas rpb={rpb} FAILED: {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
