"""Ring attention: context-parallel attention over a mesh axis.

The reference holds its ~1.2k-token image+text sequence per-GPU with stock
attention (SURVEY.md §5 "long-context: absent"). For TPU scale-out to video
(WAN: 81-frame 5-D latents) and high resolutions, this implements the
documented extension point: shard the sequence over a mesh axis and rotate KV
blocks around the ring with ``jax.lax.ppermute`` while accumulating an online
softmax — communication rides ICI and overlaps compute (see
/opt/skills/guides/boom_attention_tricks.md §16).

Use inside shard_map:
    out = shard_map(lambda q, k, v: ring_attention(q, k, v, axis_name="sp"),
                    mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
                    out_specs=P(None, None, "sp", None), check_rep=False)(q, k, v)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp



def ring_attention(q, k, v, axis_name: str, *, sm_scale: Optional[float] = None):
    """Bidirectional full attention with seq-sharded q/k/v (B, H, S_local, D)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n = jax.lax.psum(1, axis_name)

    qf = q.astype(jnp.float32)
    B, H, S, D = qf.shape
    m = jnp.full((B, H, S, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, S, 1), jnp.float32)
    o = jnp.zeros((B, H, S, D), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        m, l, o, k_blk, v_blk = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32)) * sm_scale
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o = alpha * o + jnp.einsum("bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32))
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_next, l, o, k_blk, v_blk), None

    (m, l, o, _, _), _ = jax.lax.scan(step, (m, l, o, k, v), None, length=n)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    return (o * l_inv).astype(q.dtype)


def context_parallel_attention(q, k, v, axis_name: str, *,
                               sm_scale: Optional[float] = None,
                               kv_len: Optional[int] = None):
    """All-gather-KV variant (cheaper at moderate context): gather the KV
    shards, run local flash attention on the local Q shard (guide §15.1)."""
    from adv_grpo_tpu.ops.attention import mha

    k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    return mha(q, k_full, v_full, sm_scale=sm_scale, kv_len=kv_len)
