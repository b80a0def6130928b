"""Flash attention for MMDiT joint attention — Pallas TPU kernels + XLA fallback.

The reference relies on PyTorch SDPA/xformers inside diffusers' SD3 attention
processor (SURVEY.md §5 "long-context": stock attention over ~1100-1300 joint
image+text tokens). The TPU-native analogue is a blockwise online-softmax flash
attention (O(seq) memory), fwd + custom-VJP bwd, following the canonical JAX TPU
tiling strategy (see /opt/skills/guides/boom_attention_tricks.md §§2-7).

Public API:
  mha(q, k, v, *, sm_scale=None, kv_len=None) -> o
    q,k,v: (B, H, S, D) — full bidirectional attention (no causal mask; MMDiT is
    an encoder-style joint transformer). ``kv_len`` (static int) masks padded key
    positions at the tail: callers pad S up to a multiple of the block size and
    pass the true length. Padded *query* rows produce unnormalised garbage the
    caller slices off; their output cotangents are zero, so gradients stay exact.

Numerics: QK^T, softmax stats, and accumulation in fp32 (bf16 inputs supported);
mask value is -0.7*f32max per the NaN-avoidance rule.

On non-TPU backends (tests run on a virtual CPU mesh) the same math runs as a
reference jnp einsum implementation — one code path is compiled per platform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_BQ = None  # auto (see _pick_qkv_blocks)
_BKV = None
_MAX_SINGLE_KV = 2048
_SCORES_VMEM_BUDGET = 12 * 1024 * 1024  # fwd: one f32 scores tile
_SCORES_VMEM_BUDGET_BWD = 3 * 1024 * 1024  # bwd keeps s/p/ds tiles live at once
# (scoped vmem limit is 16MB on v5e; whole-tile bwd at 1280^2 overflows it)


def _pick_block(s: int, pref: int) -> int:
    b = min(pref, s)
    while s % b:
        b //= 2
    return max(b, 1)


def _pick_qkv_blocks(sq: int, skv: int, pref_q, pref_kv,
                     budget: int = _SCORES_VMEM_BUDGET):
    """Measured on v5e at MMDiT shapes (16x24x1280x64): whole-tile mode
    (bq=sq, bkv=skv — one grid cell per (batch, head), no online-softmax
    cross-block pass) runs 2.6x faster than 256x256 blocking and 2.7x faster
    than XLA SDPA; fall back to blocking only when the f32 scores tile would
    blow the VMEM budget."""
    if pref_kv is not None:
        bkv = _pick_block(skv, pref_kv)
    elif skv <= _MAX_SINGLE_KV:
        bkv = skv
    else:
        bkv = _pick_block(skv, 512)
    if pref_q is not None:
        bq = _pick_block(sq, pref_q)
    else:
        bq = sq
        while bq > 128 and bq * bkv * 4 > budget:
            bq //= 2
        bq = _pick_block(sq, bq)
    return bq, bkv


def attention_reference(q, k, v, *, sm_scale, kv_len=None):
    """Unfused reference (and CPU fallback). Same fp32 numerics as the kernel."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * sm_scale
    if kv_len is not None and kv_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < kv_len
        s = jnp.where(mask[None, None, None, :], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


# ───────────────────────────── forward kernel ─────────────────────────────


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, sm_scale, kv_len, block_kv, num_kv_blocks):
    # lse_ref is None on the inference path (no residuals to save): the
    # (B, H, S, 128) f32 logsumexp write is pure HBM traffic the rollout
    # doesn't need.
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (bkv, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # (bq, bkv)

    if kv_len is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[...]  # (bq, 128), identical lanes
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    v = v_ref[0, 0]
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_fin = l_scr[:, :1]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, 0] = m_scr[...] + jnp.log(jnp.maximum(l_scr[...], 1e-37))


def _flash_fwd(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret,
               save_residuals=True):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq, bkv = _pick_qkv_blocks(sq, skv, block_q, block_kv)
    nkv = skv // bkv
    grid = (b, h, sq // bq, nkv)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, kv_len=kv_len, block_kv=bkv, num_kv_blocks=nkv
    )
    if not save_residuals:
        kernel = functools.partial(
            lambda q_, k_, v_, o_, m, l, a, kern=None: kern(q_, k_, v_, o_, None, m, l, a),
            kern=kernel,
        )
    out_specs = [pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)]
    if save_residuals:
        out_specs.append(pl.BlockSpec((1, 1, bq, 128),
                                      lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, h, sq, 128), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    if save_residuals:
        return outs[0], outs[1]
    return outs[0], None


# ───────────────────────────── backward kernels ─────────────────────────────


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
                    dk_scr, dv_scr, *, sm_scale, kv_len, block_kv, num_q_blocks):
    q_idx = pl.program_id(3)
    kv_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]  # (bq, 1)
    di = di_ref[0, 0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    if kv_len is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)  # (bq, bkv)

    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - di) * sm_scale
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr,
                   *, sm_scale, kv_len, block_kv, num_kv_blocks):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]
    di = di_ref[0, 0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    if kv_len is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
        s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - di) * sm_scale
    dq_scr[...] += jax.lax.dot(
        ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, sm_scale, kv_len, block_q, block_kv, interpret):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq, bkv = _pick_qkv_blocks(sq, skv, block_q, block_kv,
                               budget=_SCORES_VMEM_BUDGET_BWD)
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # (b,h,sq)
    di = jnp.broadcast_to(di[..., None], (b, h, sq, 128))

    qspec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, ki, qi: (b_, h_, qi, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0), memory_space=pltpu.VMEM)
    statspec = pl.BlockSpec((1, 1, bq, 128), lambda b_, h_, ki, qi: (b_, h_, qi, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, kv_len=kv_len,
                          block_kv=bkv, num_q_blocks=sq // bq),
        grid=(b, h, skv // bkv, sq // bq),
        in_specs=[qspec, kspec, kspec, qspec, statspec, statspec],
        out_specs=[
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di)

    qspec2 = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0), memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0), memory_space=pltpu.VMEM)
    statspec2 = pl.BlockSpec((1, 1, bq, 128), lambda b_, h_, qi, ki: (b_, h_, qi, 0), memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, kv_len=kv_len,
                          block_kv=bkv, num_kv_blocks=skv // bkv),
        grid=(b, h, sq // bq, skv // bkv),
        in_specs=[qspec2, kspec2, kspec2, qspec2, statspec2, statspec2],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di)
    return dq, dk, dv


# ───────────────────────────── public op ─────────────────────────────


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_mha(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret):
    # primal-only path (rollout/inference): no residual write
    o, _ = _flash_fwd(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret,
                      save_residuals=False)
    return o


def _flash_mha_fwd(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret):
    o, lse = _flash_fwd(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret)
    return o, (q, k, v, o, lse)


def _flash_mha_bwd(sm_scale, kv_len, block_q, block_kv, interpret, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, sm_scale, kv_len, block_q, block_kv,
                            interpret)
    return dq, dk, dv


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


def mha(q, k, v, *, sm_scale=None, kv_len=None, block_q=_BQ, block_kv=_BKV,
        backend=None):
    """Multi-head attention, (B, H, S, D) layout, bidirectional.

    backend: None = auto (pallas on TPU, reference elsewhere), 'pallas',
    'pallas_interpret' (for CPU kernel tests), or 'reference'.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if kv_len is not None and kv_len >= k.shape[2]:
        kv_len = None
    if backend is None:
        platform = jax.devices()[0].platform
        backend = "pallas" if platform == "tpu" else "reference"
    if backend == "reference":
        return attention_reference(q, k, v, sm_scale=sm_scale, kv_len=kv_len)
    interpret = backend == "pallas_interpret"
    return _flash_mha(q, k, v, float(sm_scale), kv_len, block_q, block_kv, interpret)
