"""Pallas flash-attention kernel vs reference math (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.ops.attention import attention_reference, mha

B, H, S, D = 1, 2, 256, 64
KV_LEN = 200


def _qkv():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (B, H, S, D), jnp.float32) for k in ks)


class TestFlashAttention:
    def test_forward_parity_with_mask(self):
        q, k, v = _qkv()
        o_ref = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
        o_pal = mha(q, k, v, kv_len=KV_LEN, block_q=128, block_kv=128,
                    backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                                   atol=5e-3)  # DEFAULT-precision MXU dots

    def test_backward_parity(self):
        q, k, v = _qkv()

        def loss_pal(q, k, v):
            o = mha(q, k, v, kv_len=KV_LEN, block_q=128, block_kv=128,
                    backend="pallas_interpret")
            return jnp.sum(o[:, :, :KV_LEN] ** 2)

        def loss_ref(q, k, v):
            o = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
            return jnp.sum(o[:, :, :KV_LEN] ** 2)

        gp = jax.grad(loss_pal, (0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a[:, :, :KV_LEN]),
                                       np.asarray(b[:, :, :KV_LEN]), atol=2e-2)

    def test_auto_backend_cpu_is_reference(self):
        q, k, v = _qkv()
        o_auto = mha(q, k, v, kv_len=KV_LEN)
        o_ref = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
        np.testing.assert_allclose(np.asarray(o_auto), np.asarray(o_ref))
