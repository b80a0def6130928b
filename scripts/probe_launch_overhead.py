"""Is the ~1.5 ms floor per KERNEL or per SCAN ITERATION on this setup?

probe_hbm_bw.py found every scan iteration costs ~1.5 ms regardless of data
size (50 MB and 537 MB passes both ~1.53 ms) — a fixed launch/sync floor,
not bandwidth. If the floor is per kernel, every pallas_call in the model
pays it and kernel-count reduction is the lever; if per scan iteration, all
the microbenchmarks were inflated by a constant and the in-model numbers
need re-reading.

Bodies (all over a 48 MB bf16 array, chained/dependent):
  xla1   one multiply            xla4   four dependent multiplies
  pl1    one pallas copy-scale   pl4    four dependent pallas copy-scales
  mixed  pallas + xla + pallas + xla

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_launch_overhead.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 50
ROWS, COLS = 24576, 1024  # 48 MB bf16
C = jnp.bfloat16(1.0009765625)


def make_pl_op():
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * C

    spec = pl.BlockSpec((1024, COLS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(ROWS // 1024,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )


def bench(tag, body):
    @jax.jit
    def loop(x):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    x = jnp.ones((ROWS, COLS), jnp.bfloat16)
    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag:6s} {dt * 1e3:7.3f} ms/iter", flush=True)


def main():
    pl_op = make_pl_op()
    bench("xla1", lambda c: c * C)
    bench("xla4", lambda c: ((c * C) * C * C) * C)
    # force 4 separate kernels: interleave with a reduction-ish reshape barrier
    bench("pl1", pl_op)
    bench("pl2", lambda c: pl_op(pl_op(c)))
    bench("pl4", lambda c: pl_op(pl_op(pl_op(pl_op(c)))))
    bench("mixed", lambda c: pl_op(pl_op(c) * C) * C)


if __name__ == "__main__":
    main()
