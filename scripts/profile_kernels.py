"""Kernel-level MFU probes at MMDiT hot shapes (v5e): big matmuls vs flash
attention vs the elementwise/LN overhead — locates the gap behind the ~42%
rollout MFU that scripts/profile_rollout.py measures end-to-end.
"""

from __future__ import annotations

import os
import sys

# repo-root bootstrap shared by all scripts (scripts/_path.py)
import _path  # noqa: F401

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


PEAK = 197e12  # v5e bf16


def probe_matmul(m, k, n, tag):
    a = jnp.full((m, k), 0.01, jnp.bfloat16)
    b = jnp.full((k, n), 0.01, jnp.bfloat16)

    @jax.jit
    def f(a, b):
        return jnp.dot(a, b)

    def run():
        return float(jnp.sum(f(a, b).astype(jnp.float32)))

    # loop the matmul 20x on-device to amortize dispatch
    @jax.jit
    def f20(a, b):
        def body(c, _):
            return c + jnp.dot(a, b).astype(jnp.float32) * 1e-6, None
        c, _ = jax.lax.scan(body, jnp.zeros((m, n), jnp.float32), None, length=20)
        return c

    def run20():
        return float(jnp.sum(f20(a, b)))

    dt = timeit(run20) / 20
    fl = 2.0 * m * k * n
    print(f"{tag}: matmul ({m}x{k}x{n}) {dt*1e3:.2f} ms -> "
          f"{fl/dt/1e12:.0f} TF/s ({fl/dt/PEAK*100:.0f}% MFU)")


def probe_attention(b, h, s, d, tag, kv_len=None):
    from adv_grpo_tpu.ops.attention import mha

    q = jnp.full((b, h, s, d), 0.01, jnp.bfloat16)
    k = jnp.full((b, h, s, d), 0.01, jnp.bfloat16)
    v = jnp.full((b, h, s, d), 0.01, jnp.bfloat16)

    @jax.jit
    def f20(q, k, v):
        def body(c, _):
            o = mha(q, k, v, kv_len=kv_len)
            return c + jnp.sum(o.astype(jnp.float32)) * 1e-6, None
        c, _ = jax.lax.scan(body, 0.0, None, length=20)
        return c

    def run20():
        return float(f20(q, k, v))

    dt = timeit(run20) / 20
    fl = 4.0 * b * h * s * s * d  # QK^T + AV
    print(f"{tag}: mha ({b},{h},{s},{d}) {dt*1e3:.2f} ms -> "
          f"{fl/dt/1e12:.0f} TF/s ({fl/dt/PEAK*100:.0f}% MFU of attn FLOPs)")


def probe_layernorm(b, s, dim, tag):
    x = jnp.full((b, s, dim), 0.01, jnp.bfloat16)

    @jax.jit
    def f20(x):
        def body(c, _):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            y = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)
            return c + jnp.sum(y.astype(jnp.float32)) * 1e-6, None
        c, _ = jax.lax.scan(body, 0.0, None, length=20)
        return c

    def run20():
        return float(f20(x))

    dt = timeit(run20) / 20
    traffic = b * s * dim * 2 * 2  # bf16 read + write
    print(f"{tag}: layernorm ({b},{s},{dim}) {dt*1e3:.3f} ms -> "
          f"{traffic/dt/1e9:.0f} GB/s effective")


def probe_fused_vs_split_qkv():
    """One (M, D) x (D, 3D) matmul vs three (M, D) x (D, D): is fusing QKV
    worth a param-layout change?"""
    m, dim = 16384, 1536
    x = jnp.full((m, dim), 0.01, jnp.bfloat16)
    w = jnp.full((dim, dim), 0.01, jnp.bfloat16)
    w3 = jnp.full((dim, 3 * dim), 0.01, jnp.bfloat16)

    @jax.jit
    def split20(x, w):
        def body(c, _):
            q = jnp.dot(x, w)
            k = jnp.dot(x, w)
            v = jnp.dot(x, w)
            return c + (jnp.sum(q) + jnp.sum(k) + jnp.sum(v)).astype(jnp.float32) * 1e-6, None
        c, _ = jax.lax.scan(body, 0.0, None, length=20)
        return c

    @jax.jit
    def fused20(x, w3):
        def body(c, _):
            qkv = jnp.dot(x, w3)
            return c + jnp.sum(qkv.astype(jnp.float32)) * 1e-6, None
        c, _ = jax.lax.scan(body, 0.0, None, length=20)
        return c

    float(split20(x, w)); float(fused20(x, w3))
    t0 = time.perf_counter(); float(split20(x, w)); dt_s = (time.perf_counter() - t0) / 20
    t0 = time.perf_counter(); float(fused20(x, w3)); dt_f = (time.perf_counter() - t0) / 20
    fl = 2.0 * m * dim * 3 * dim
    print(f"qkv split: {dt_s*1e3:.2f} ms ({fl/dt_s/PEAK*100:.0f}% MFU)  "
          f"fused: {dt_f*1e3:.2f} ms ({fl/dt_f/PEAK*100:.0f}% MFU)")


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    # MLP shapes (x-stream): (16*1024, 1536) x (1536, 6144)
    probe_matmul(16384, 1536, 6144, "mlp_fc1_x")
    probe_matmul(16384, 6144, 1536, "mlp_fc2_x")
    # qkv proj
    probe_matmul(16384, 1536, 1536, "qkv_proj_x")
    # ctx-stream small-M matmul
    probe_matmul(2464, 1536, 6144, "mlp_fc1_ctx")
    probe_fused_vs_split_qkv()
    # attention at joint shape (padded to 1280)
    probe_attention(16, 24, 1280, 64, "joint_attn", kv_len=1178)
    # dual attention (image tokens only, 1024 = no padding)
    probe_attention(16, 24, 1024, 64, "dual_attn")
    probe_layernorm(16, 1024, 1536, "x_layernorm")


if __name__ == "__main__":
    main()
