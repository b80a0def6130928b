"""Attention-kernel shootout at the MMDiT production shape.

profile_trace.py shows each joint-attention call costing ~3.9 ms at
(B16, H24, S 1024+160, d64) — ~18% MFU when the matmul ideal (with the
d=64 MXU half-rate penalty) is ~1.4 ms. This probe times our kernels
against jax's official pallas flash_attention and a pure-XLA einsum
attention at the same shape to locate the gap.

Each variant runs K back-to-back iterations inside one jit (lax.scan with
a dependency through q) so tunnel dispatch overhead amortises out.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_attention.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

B, H, D = 16, 24, 64
S_IMG, S_TXT = 1024, 160
S = S_IMG + S_TXT
HD = H * D
# probe_launch_overhead.py: each jit *call* through the axon tunnel costs
# ~30 ms host-side regardless of device work, so REPS must be large enough
# to amortise it below the signal (500 -> 0.06 ms of bias per iteration).
REPS = 500
PEAK = 197e12

ATTN_FLOPS = 4.0 * B * H * S * S * D  # qk + pv, joint (S_IMG+S_TXT) shape
# single-stream variants compute only the (S_IMG, S_IMG) score tile — charging
# them the joint count would overstate their TF/s by (S/S_IMG)^2 = 1.34x
ATTN_FLOPS_S1024 = 4.0 * B * H * S_IMG * S_IMG * D


def bench(name, fn, *args, flops=ATTN_FLOPS):
    """fn: (q_like, *rest) -> array summed into the carry; scanned REPS times."""

    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            # feed a tiny function of the output back into q so steps chain
            return carry + out * 0.0, jnp.float32(0)

        c, _ = jax.lax.scan(body, a[0], None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(*args))  # compile
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt * 1e3:7.3f} ms   {flops / dt / 1e12:6.1f} TF/s "
          f"({flops / dt / PEAK * 100:4.1f}% peak)")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    bshd = lambda k, s: jax.random.normal(k, (B, s, HD), jnp.bfloat16)
    q_i, k_i, v_i = bshd(ks[0], S_IMG), bshd(ks[1], S_IMG), bshd(ks[2], S_IMG)
    q_t, k_t, v_t = bshd(ks[3], S_TXT), bshd(ks[4], S_TXT), bshd(ks[5], S_TXT)
    w = [jnp.ones((D,), jnp.float32) * 1.0 for _ in range(4)]

    from adv_grpo_tpu.ops.attention import mha_bshd
    from adv_grpo_tpu.ops.joint_attention import joint_mha, mha_rms

    # 1) production path: fused joint kernel (rms fused)
    bench("joint_mha fused-rms", lambda q, *a: joint_mha(
        q, *a, num_heads=H, rms_weights=tuple(w))[0],
        q_i, k_i, v_i, q_t, k_t, v_t)

    # 2) joint kernel, no rms fusion
    bench("joint_mha no-rms", lambda q, *a: joint_mha(
        q, *a, num_heads=H)[0], q_i, k_i, v_i, q_t, k_t, v_t)

    # 3) round-2 path: concat + mha_bshd whole-tile
    def concat_path(q, k_i, v_i, q_t, k_t, v_t):
        pad = (-S) % 128
        cat = lambda a, b: jnp.concatenate(
            [a, b, jnp.zeros((B, pad, HD), a.dtype)], axis=1)
        o = mha_bshd(cat(q, q_t), cat(k_i, k_t), cat(v_i, v_t),
                     num_heads=H, kv_len=S)
        return o[:, :S_IMG]
    bench("concat + mha_bshd", concat_path, q_i, k_i, v_i, q_t, k_t, v_t)

    # 4) single-stream at 1024 (dual self-attention shape)
    bench("mha_rms s1024", lambda q, k, v: mha_rms(
        q, k, v, num_heads=H, rms_weights=(w[0], w[1])), q_i, k_i, v_i,
        flops=ATTN_FLOPS_S1024)

    # 5) official pallas flash_attention (BHSD), padded to 1280
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    SP = 1280
    to4 = lambda a, s: a.reshape(B, s, H, D).transpose(0, 2, 1, 3)
    padq = jnp.concatenate([to4(q_i, S_IMG), to4(q_t, S_TXT),
                            jnp.zeros((B, H, SP - S, D), jnp.bfloat16)], axis=2)
    padk = jnp.concatenate([to4(k_i, S_IMG), to4(k_t, S_TXT),
                            jnp.zeros((B, H, SP - S, D), jnp.bfloat16)], axis=2)
    padv = jnp.concatenate([to4(v_i, S_IMG), to4(v_t, S_TXT),
                            jnp.zeros((B, H, SP - S, D), jnp.bfloat16)], axis=2)
    for bq, bkv in ((512, 1280),):
        try:
            bs = BlockSizes(block_q=bq, block_k_major=bkv, block_k=bkv,
                            block_b=1)
            bench(f"official flash bq{bq} bkv{bkv}",
                  functools.partial(flash_attention, block_sizes=bs,
                                    sm_scale=D ** -0.5),
                  padq, padk, padv)
        except Exception as e:
            print(f"official flash bq{bq} bkv{bkv}: {type(e).__name__}: "
                  f"{str(e)[:120]}")

    # 6) pure-XLA einsum attention (scores materialised, bf16 softmax in f32)
    def xla_attn(q, k, v):
        q4, k4, v4 = to4(q, S_IMG), to4(k, S_IMG), to4(v, S_IMG)
        s = jnp.einsum("bhqd,bhkd->bhqk", q4, k4,
                       preferred_element_type=jnp.float32) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v4)
        return o.transpose(0, 2, 1, 3).reshape(B, S_IMG, HD)
    flops_ratio = (S_IMG * S_IMG) / (S * S)
    dt = bench("XLA einsum s1024 (no flash)", xla_attn, q_i, k_i, v_i,
               flops=ATTN_FLOPS_S1024)
    print(f"  (s1024 ideal-scaled: equivalent joint time "
          f"{dt / flops_ratio * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
