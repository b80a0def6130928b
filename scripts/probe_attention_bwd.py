"""Attention BACKWARD shootout at the MMDiT production shape.

Times jax.grad through the attention paths the train microstep executes:

  1) fused joint bwd  — _joint_bwd_kernel: streams unconcatenated, qk-RMS
     recomputed in registers, s/p/dp computed once (one grid cell per
     (batch, head-group)).
  2) the round-2 composition it replaced — 4 rms_norm_heads launches +
     5 stream concats to a 128-padded joint layout + blocked BSHD backward
     + splits, rebuilt here explicitly for the comparison.
  3) fused single-stream bwd (mha_rms, the dual self-attention path).

Same methodology as probe_attention.py: K back-to-back grads inside one jit
(lax.scan chained through q) so tunnel dispatch amortises out.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_attention_bwd.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

B, H, D = 16, 24, 64
S_IMG, S_TXT = 1024, 160
S = S_IMG + S_TXT
HD = H * D
REPS = 100
PEAK = 197e12

# jax.grad of the custom_vjp runs fwd once (2 scores-sized matmuls: qk, pv)
# + bwd once (5: s-recompute, dv, dp, dk, dq) = 7 matmuls x 2*S*S*D FLOPs
# each per (batch, head) — same un-halved convention as probe_attention.py.
ATTN_BWD_FLOPS = 7.0 * 2.0 * B * H * S * S * D
# the single-stream variant computes only the (S_IMG, S_IMG) tile — charging
# it the joint count would overstate its TF/s by (S/S_IMG)^2 = 1.34x
ATTN_BWD_FLOPS_S1024 = 7.0 * 2.0 * B * H * S_IMG * S_IMG * D


def bench(name, loss_fn, q, *rest, flops=ATTN_BWD_FLOPS):
    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def loop(q0, *a):
        def body(carry, _):
            g = grad_fn(carry, *a)
            return carry + g * 0.0, jnp.float32(0)

        c, _ = jax.lax.scan(body, q0, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(q, *rest))  # compile
    t0 = time.perf_counter()
    float(loop(q, *rest))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt * 1e3:7.3f} ms   "
          f"{flops / dt / 1e12:6.1f} TF/s "
          f"({flops / dt / PEAK * 100:4.1f}% peak)")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    bshd = lambda k, s: jax.random.normal(k, (B, s, HD), jnp.bfloat16)
    q_i, k_i, v_i = bshd(ks[0], S_IMG), bshd(ks[1], S_IMG), bshd(ks[2], S_IMG)
    q_t, k_t, v_t = bshd(ks[3], S_TXT), bshd(ks[4], S_TXT), bshd(ks[5], S_TXT)
    w = tuple(jnp.ones((D,), jnp.float32) for _ in range(4))

    from adv_grpo_tpu.ops.attention import mha_bshd
    from adv_grpo_tpu.ops.fused_norms import rms_norm_heads
    from adv_grpo_tpu.ops.joint_attention import joint_mha, mha_rms

    # 1) production path: fused joint bwd (rms fused)
    def loss_fused(q, *a):
        o_i, o_t = joint_mha(q, *a, num_heads=H, rms_weights=w)
        return (jnp.sum(o_i.astype(jnp.float32) ** 2)
                + jnp.sum(o_t.astype(jnp.float32) ** 2))

    bench("grad joint_mha fused", loss_fused, q_i, k_i, v_i, q_t, k_t, v_t)

    # 2) round-2 composition: rms launches + concat + blocked bshd bwd
    def loss_concat(q, k_i, v_i, q_t, k_t, v_t):
        kw = dict(num_heads=H, eps=1e-6)
        yq_i = rms_norm_heads(q, w[0], **kw)
        yk_i = rms_norm_heads(k_i, w[1], **kw)
        yq_t = rms_norm_heads(q_t, w[2], **kw)
        yk_t = rms_norm_heads(k_t, w[3], **kw)
        pad = (-S) % 128
        cat = lambda a, b: jnp.concatenate(
            [a, b, jnp.zeros((B, pad, HD), a.dtype)], axis=1)
        o = mha_bshd(cat(yq_i, yq_t), cat(yk_i, yk_t), cat(v_i, v_t),
                     num_heads=H, kv_len=S, block_q=256, block_kv=1280)
        return jnp.sum(o[:, :S].astype(jnp.float32) ** 2)

    bench("grad concat+rms+blocked", loss_concat,
          q_i, k_i, v_i, q_t, k_t, v_t)

    # 2b) concat + whole-tile fused bshd bwd (isolates concat cost from the
    # blocked-vs-fused kernel cost)
    def loss_concat_fused(q, k_i, v_i, q_t, k_t, v_t):
        kw = dict(num_heads=H, eps=1e-6)
        yq_i = rms_norm_heads(q, w[0], **kw)
        yk_i = rms_norm_heads(k_i, w[1], **kw)
        yq_t = rms_norm_heads(q_t, w[2], **kw)
        yk_t = rms_norm_heads(k_t, w[3], **kw)
        pad = (-S) % 128
        cat = lambda a, b: jnp.concatenate(
            [a, b, jnp.zeros((B, pad, HD), a.dtype)], axis=1)
        o = mha_bshd(cat(yq_i, yq_t), cat(yk_i, yk_t), cat(v_i, v_t),
                     num_heads=H, kv_len=S)
        return jnp.sum(o[:, :S].astype(jnp.float32) ** 2)

    bench("grad concat+rms+fused-bshd", loss_concat_fused,
          q_i, k_i, v_i, q_t, k_t, v_t)

    # 3) single-stream fused bwd (dual self-attention shape)
    def loss_single(q, k, v):
        o = mha_rms(q, k, v, num_heads=H, rms_weights=(w[0], w[1]))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    bench("grad mha_rms s1024 fused", loss_single, q_i, k_i, v_i,
          flops=ATTN_BWD_FLOPS_S1024)


if __name__ == "__main__":
    main()
