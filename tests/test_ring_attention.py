"""Ring / context-parallel attention vs single-device reference on the 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from adv_grpo_tpu.ops.attention import attention_reference
from adv_grpo_tpu.ops.ring_attention import context_parallel_attention, ring_attention

B, H, S, D = 1, 2, 256, 32  # S sharded 8-way -> 32 per device


def _qkv():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (B, H, S, D), jnp.float32) for k in ks)


class TestRingAttention:
    def test_matches_reference(self):
        q, k, v = _qkv()
        ref = attention_reference(q, k, v, sm_scale=D**-0.5)
        mesh = Mesh(np.array(jax.devices()), ("sp",))
        f = shard_map(
            lambda q, k, v: ring_attention(q, k, v, axis_name="sp"),
            mesh=mesh,
            in_specs=(P(None, None, "sp", None),) * 3,
            out_specs=P(None, None, "sp", None), check_rep=False)
        out = f(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)

    def test_allgather_variant_matches(self):
        q, k, v = _qkv()
        ref = attention_reference(q, k, v, sm_scale=D**-0.5)
        mesh = Mesh(np.array(jax.devices()), ("sp",))
        f = shard_map(
            lambda q, k, v: context_parallel_attention(q, k, v, axis_name="sp"),
            mesh=mesh,
            in_specs=(P(None, None, "sp", None),) * 3,
            out_specs=P(None, None, "sp", None), check_rep=False)
        out = f(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)
