"""Parity tests for ops.joint_attention: the two-stream fused-qk-RMS flash
kernel (joint_mha) and the single-stream variant (mha_rms), in Pallas
interpret mode against the jnp reference — values and gradients.

The fused kernels walk the streams as separate online-softmax kv blocks, so
values match the reference up to f32 renormalisation rounding (tight in f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adv_grpo_tpu.ops.joint_attention import joint_mha, mha_rms


def _mk(key, b, s, hd, dtype=jnp.float32):
    return jax.random.normal(key, (b, s, hd), dtype) * 0.5


def _mk_inputs(seed, b, s_i, s_t, hd, d):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    qi, ki, vi = (_mk(ks[j], b, s_i, hd) for j in range(3))
    qt, kt, vt = (_mk(ks[j], b, s_t, hd) for j in range(3, 6))
    ws = tuple(1.0 + 0.1 * jax.random.normal(ks[6 + j], (d,)) for j in range(4))
    return qi, ki, vi, qt, kt, vt, ws


@pytest.mark.parametrize("h,d", [(4, 32), (2, 64)])
@pytest.mark.parametrize("use_rms", [True, False])
def test_joint_mha_matches_reference(h, d, use_rms):
    hd = h * d
    b, s_i, s_t = 2, 32, 12
    qi, ki, vi, qt, kt, vt, ws = _mk_inputs(0, b, s_i, s_t, hd, d)
    rms = ws if use_rms else None
    o_ref = joint_mha(qi, ki, vi, qt, kt, vt, num_heads=h, rms_weights=rms,
                      backend="reference")
    o_pal = joint_mha(qi, ki, vi, qt, kt, vt, num_heads=h, rms_weights=rms,
                      backend="pallas_interpret")
    for a, r in zip(o_pal, o_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_rms", [True, False])
def test_joint_mha_gradients(use_rms):
    h, d = 4, 32
    hd = h * d
    b, s_i, s_t = 2, 24, 8
    qi, ki, vi, qt, kt, vt, ws = _mk_inputs(1, b, s_i, s_t, hd, d)
    rms = ws if use_rms else None
    cot_i = jax.random.normal(jax.random.PRNGKey(42), (b, s_i, hd))
    cot_t = jax.random.normal(jax.random.PRNGKey(43), (b, s_t, hd))

    def loss(backend, *args):
        o_i, o_t = joint_mha(*args[:6], num_heads=h,
                             rms_weights=args[6:] if use_rms else None,
                             backend=backend)
        return jnp.sum(o_i * cot_i) + jnp.sum(o_t * cot_t)

    args = (qi, ki, vi, qt, kt, vt) + (ws if use_rms else ())
    argnums = tuple(range(len(args)))
    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums)(*args)
    g_pal = jax.grad(lambda *a: loss("pallas_interpret", *a), argnums)(*args)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)


def test_joint_mha_unaligned_text_gradients():
    # s_t=10 is not 8-aligned -> wrapper zero-pads + kernel masks the kv tail;
    # gradients must flow only through the real rows
    h, d = 4, 32
    hd = h * d
    b, s_i, s_t = 2, 24, 10
    qi, ki, vi, qt, kt, vt, ws = _mk_inputs(7, b, s_i, s_t, hd, d)
    cot_i = jax.random.normal(jax.random.PRNGKey(45), (b, s_i, hd))
    cot_t = jax.random.normal(jax.random.PRNGKey(46), (b, s_t, hd))

    def loss(backend, *args):
        o_i, o_t = joint_mha(*args[:6], num_heads=h, rms_weights=args[6:],
                             backend=backend)
        return jnp.sum(o_i * cot_i) + jnp.sum(o_t * cot_t)

    args = (qi, ki, vi, qt, kt, vt) + ws
    argnums = tuple(range(len(args)))
    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums)(*args)
    g_pal = jax.grad(lambda *a: loss("pallas_interpret", *a), argnums)(*args)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)


def test_joint_mha_geometry_fallback_matches_reference():
    # head_dim 96 does not tile into 128-wide groups -> unfused fallback path
    h, d = 2, 96
    hd = h * d
    b, s_i, s_t = 2, 16, 8
    qi, ki, vi, qt, kt, vt, ws = _mk_inputs(2, b, s_i, s_t, hd, d)
    o_ref = joint_mha(qi, ki, vi, qt, kt, vt, num_heads=h, rms_weights=ws,
                      backend="reference")
    o_pal = joint_mha(qi, ki, vi, qt, kt, vt, num_heads=h, rms_weights=ws,
                      backend="pallas_interpret")
    for a, r in zip(o_pal, o_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_rms", [True, False])
def test_mha_rms_matches_reference(use_rms):
    h, d = 4, 32
    hd = h * d
    b, s = 2, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    q, k, v = (_mk(ks[j], b, s, hd) for j in range(3))
    ws = tuple(1.0 + 0.1 * jax.random.normal(ks[3 + j], (d,)) for j in range(2))
    rms = ws if use_rms else None
    o_ref = mha_rms(q, k, v, num_heads=h, rms_weights=rms, backend="reference")
    o_pal = mha_rms(q, k, v, num_heads=h, rms_weights=rms,
                    backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)


def test_mha_rms_gradients():
    h, d = 4, 32
    hd = h * d
    b, s = 2, 24
    ks = jax.random.split(jax.random.PRNGKey(4), 5)
    q, k, v = (_mk(ks[j], b, s, hd) for j in range(3))
    ws = tuple(1.0 + 0.1 * jax.random.normal(ks[3 + j], (d,)) for j in range(2))
    cot = jax.random.normal(jax.random.PRNGKey(44), (b, s, hd))

    def loss(backend, q, k, v, wq, wk):
        o = mha_rms(q, k, v, num_heads=h, rms_weights=(wq, wk),
                    backend=backend)
        return jnp.sum(o * cot)

    args = (q, k, v) + ws
    argnums = (0, 1, 2, 3, 4)
    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums)(*args)
    g_pal = jax.grad(lambda *a: loss("pallas_interpret", *a), argnums)(*args)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3)


def test_mha_rms_unaligned_seq_falls_back():
    # S=20 is 8-aligned but fine; S=18 is not 8-aligned -> unfused fallback
    h, d = 4, 32
    hd = h * d
    b, s = 2, 18
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    q, k, v = (_mk(ks[j], b, s, hd) for j in range(3))
    ws = tuple(jnp.ones((d,)) for _ in range(2))
    o_ref = mha_rms(q, k, v, num_heads=h, rms_weights=ws, backend="reference")
    o_pal = mha_rms(q, k, v, num_heads=h, rms_weights=ws,
                    backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
