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

  mha_bshd(q, k, v, *, num_heads, sm_scale=None, kv_len=None) -> o
    q,k,v: (B, S, H*D) — the layout qkv projections produce. The kernel grid
    indexes head h as a D-wide column block, so NO transpose to (B, H, S, D)
    and no per-tensor pad/unpad copies are materialised. Device traces showed
    the layout churn around mha() costing ~25% of an MMDiT forward; this
    entry point eliminates it.

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


def _tile(ref):
    """Block tile as 2D — blocks are (1, 1, s, d) in BHSD mode and (1, s, d)
    in BSHD mode; the kernel math is layout-agnostic."""
    a = ref[...]
    return a.reshape(a.shape[-2], a.shape[-1])


def _store_tile(ref, val):
    ref[...] = val.reshape(ref.shape).astype(ref.dtype)


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

    q = _tile(q_ref)  # (bq, d)
    k = _tile(k_ref)  # (bkv, d)
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

    v = _tile(v_ref)
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_fin = l_scr[:, :1]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        _store_tile(o_ref, acc_scr[...] * l_inv)
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

    q = _tile(q_ref)
    k = _tile(k_ref)
    v = _tile(v_ref)
    do = _tile(do_ref).astype(jnp.float32)
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
        _store_tile(dk_ref, dk_scr[...])
        _store_tile(dv_ref, dv_scr[...])


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr,
                   *, sm_scale, kv_len, block_kv, num_kv_blocks):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = _tile(q_ref)
    k = _tile(k_ref)
    v = _tile(v_ref)
    do = _tile(do_ref).astype(jnp.float32)
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
        _store_tile(dq_ref, dq_scr[...])


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


# ─────────────────────── BSHD (transpose-free) entry ───────────────────────
# q/k/v stay in the (B, S, H*D) projection layout. Mosaic requires block
# last-dims divisible by 128, so the grid walks head GROUPS of 128 columns
# (= 128//D heads, e.g. 2 for D=64) and the kernels unroll a static loop over
# the sub-heads of the group. lse/di use a (B, H, S, LSE_LANES) stat layout —
# 8 lanes (the minimum sublane tile), NOT 128: the lse residual is saved
# through the remat backward, and 128 broadcast lanes made it 240MB per
# attention (8.9GB across a microstep — an HBM OOM).

LSE_LANES = 8


def _bshd_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                     acc_scr, *, sm_scale, kv_len, block_kv, num_kv_blocks,
                     d, hpb):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, hpb*d)
    k = k_ref[0]  # (bkv, hpb*d)
    v = v_ref[0]
    for i in range(hpb):
        qi = q[:, i * d:(i + 1) * d]
        ki = k[:, i * d:(i + 1) * d]
        s = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (bq, bkv)
        if kv_len is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
            s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
        m_prev = m_scr[i]  # (bq, 128)
        l_prev = l_scr[i]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[i] = m_next
        l_scr[i] = l_next
        pv = jax.lax.dot(p.astype(v.dtype), v[:, i * d:(i + 1) * d],
                         preferred_element_type=jnp.float32)
        acc_scr[i] = acc_scr[i] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        outs = []
        for i in range(hpb):
            l_fin = l_scr[i][:, :1]
            l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
            outs.append(acc_scr[i] * l_inv)
            if lse_ref is not None:
                lse_ref[0, i] = (m_scr[i] + jnp.log(
                    jnp.maximum(l_scr[i], 1e-37)))[:, :LSE_LANES]
        o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _bshd_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref,
                         dv_ref, dk_scr, dv_scr, *, sm_scale, kv_len,
                         block_kv, num_q_blocks, d, hpb):
    q_idx = pl.program_id(3)
    kv_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    for i in range(hpb):
        qi = q[:, i * d:(i + 1) * d]
        ki = k[:, i * d:(i + 1) * d]
        vi = v[:, i * d:(i + 1) * d]
        doi = do[:, i * d:(i + 1) * d]
        lse = lse_ref[0, i][:, :1]  # (bq, 1)
        di = di_ref[0, i][:, :1]
        s = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if kv_len is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
            s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)  # (bq, bkv)
        dv_scr[i] += jax.lax.dot_general(
            p, doi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doi, vi.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - di) * sm_scale
        dk_scr[i] += jax.lax.dot_general(
            ds, qi.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0] = jnp.concatenate([dk_scr[i] for i in range(hpb)],
                                    axis=1).astype(dk_ref.dtype)
        dv_ref[0] = jnp.concatenate([dv_scr[i] for i in range(hpb)],
                                    axis=1).astype(dv_ref.dtype)


def _bshd_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
                        dq_scr, *, sm_scale, kv_len, block_kv, num_kv_blocks,
                        d, hpb):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    for i in range(hpb):
        qi = q[:, i * d:(i + 1) * d]
        ki = k[:, i * d:(i + 1) * d]
        vi = v[:, i * d:(i + 1) * d]
        doi = do[:, i * d:(i + 1) * d]
        lse = lse_ref[0, i][:, :1]
        di = di_ref[0, i][:, :1]
        s = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if kv_len is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_kv
            s = jnp.where(col < kv_len, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            doi, vi.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - di) * sm_scale
        dq_scr[i] += jax.lax.dot(
            ds, ki.astype(jnp.float32), preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        dq_ref[0] = jnp.concatenate([dq_scr[i] for i in range(hpb)],
                                    axis=1).astype(dq_ref.dtype)


_LOG2E = 1.4426950408889634

# fused single-pass bwd: s/p/dp/ds score-space tiles live at once per subhead
_SCORES_VMEM_BUDGET_BWD_FUSED = 8 * 1024 * 1024


def _bshd_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                           dq_ref, dk_ref, dv_ref, *, sm_scale, kv_len, d,
                           hpb):
    """Whole-tile fused backward: dq, dk, dv in ONE pass; grid (B, G).

    The split dkv/dq kernels each recompute s, p (and dp in the dq kernel) —
    7 scores-sized matmuls total vs the 5 a flash backward needs. Whole-tile
    mode has no kv/q blocking conflict (dkv wants a kv-major grid, dq a
    q-major one), so one grid cell per (batch, head-group) computes p once
    and feeds all three cotangent contractions. Score-space elementwise work
    is minimised the same way as the fused fwd: q pre-multiplies
    sm_scale*log2(e) on the (S, d) tile so p = exp2(s2 - lse2), and the
    trailing *sm_scale of ds folds into the (S, d) q/k operands of the dk/dq
    dots instead of a pass over the (S, S) tile.
    """
    q = q_ref[0]  # (sq, hpb*d)
    k = k_ref[0]  # (skv, hpb*d)
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    dqs, dks, dvs = [], [], []
    for i in range(hpb):
        sl = slice(i * d, (i + 1) * d)
        qi = q[:, sl]
        ki = k[:, sl]
        vi = v[:, sl]
        doi = do[:, sl]
        lse2 = lse_ref[0, i][:, :1] * _LOG2E  # (sq, 1), base-2 row lse
        di = di_ref[0, i][:, :1]
        qi2 = (qi.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(qi.dtype)
        s2 = jax.lax.dot_general(
            qi2, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (sq, skv), base-2 scores
        if kv_len is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
            s2 = jnp.where(col < kv_len, s2, -jnp.inf)
        # NOTE padded q rows: the forward lse there is log(kv_len) (finite)
        # and p recomputes as a uniform 1/kv_len — NOT zero. Their dk/dv
        # contributions vanish only because every caller slices the padded
        # attention output, so the slice VJP zero-pads `do` (doi == 0 ⇒
        # dv_i rows 0, dp 0, di 0, t 0). A caller consuming UNSLICED padded
        # output would get wrong dk/dv from these rows.
        p = jnp.exp2(s2 - lse2)
        dv_i = jax.lax.dot_general(
            p, doi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doi, vi.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = p * (dp - di)  # ds without the *sm_scale (folded into q/k below)
        tb = t.astype(q.dtype)
        dk_i = jax.lax.dot_general(
            tb, (qi.astype(jnp.float32) * sm_scale).astype(q.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dq_i = jax.lax.dot(
            tb, (ki.astype(jnp.float32) * sm_scale).astype(k.dtype),
            preferred_element_type=jnp.float32)
        dqs.append(dq_i)
        dks.append(dk_i)
        dvs.append(dv_i)
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)


def _bshd_bwd_fused(q, k, v, do, lse, di, sm_scale, kv_len, interpret,
                    num_heads, d, hpb):
    b, sq, hd = q.shape
    skv = k.shape[1]
    ngroups = num_heads // hpb
    qspec = pl.BlockSpec((1, sq, 128), lambda b_, g_: (b_, 0, g_),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, skv, 128), lambda b_, g_: (b_, 0, g_),
                         memory_space=pltpu.VMEM)
    statspec = pl.BlockSpec((1, hpb, sq, LSE_LANES),
                            lambda b_, g_: (b_, g_, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bshd_bwd_fused_kernel, sm_scale=sm_scale,
                          kv_len=kv_len, d=d, hpb=hpb),
        grid=(b, ngroups),
        in_specs=[qspec, kspec, kspec, qspec, statspec, statspec],
        out_specs=[qspec, kspec, kspec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # ~4 score-space f32 tiles live per subhead (26MB at the 1280
            # production shape) — past Mosaic's 16MB default (v5e VMEM: 128MB)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di)


def _bshd_group_geometry(hd: int, num_heads: int):
    d = hd // num_heads
    if d > 128 or 128 % d or hd % 128:
        return None  # fall back to the BHSD layout path
    hpb = 128 // d  # heads per 128-wide column group
    return d, hpb


def bwd_row_stats(o, do, lse_small, num_heads):
    """(lse, di) residuals in the (B, H, S, LSE_LANES) bwd-kernel stat layout.

    di = sum_d(o * do) per (batch, head, row) — a tiny reduce + transpose;
    lse arrives squeezed to (B, H, S) (remat residual, see _flash_mha_bshd_fwd)
    and is lane-broadcast back. Shared by every fused backward entry.
    """
    b, s, hd = o.shape
    d = hd // num_heads
    di = jnp.sum((o.astype(jnp.float32) * do.astype(jnp.float32))
                 .reshape(b, s, num_heads, d), axis=-1)
    di = jnp.broadcast_to(di.transpose(0, 2, 1)[..., None],
                          (b, num_heads, s, LSE_LANES))
    lse = jnp.broadcast_to(lse_small[..., None],
                           lse_small.shape + (LSE_LANES,))
    return lse, di


def _bshd_fwd(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret,
              save_residuals, num_heads):
    b, sq, hd = q.shape
    d, hpb = _bshd_group_geometry(hd, num_heads)
    skv = k.shape[1]
    bq, bkv = _pick_qkv_blocks(sq, skv, block_q, block_kv,
                               budget=_SCORES_VMEM_BUDGET // hpb)
    nkv = skv // bkv
    ngroups = num_heads // hpb
    grid = (b, ngroups, sq // bq, nkv)
    kernel = functools.partial(
        _bshd_fwd_kernel, sm_scale=sm_scale, kv_len=kv_len, block_kv=bkv,
        num_kv_blocks=nkv, d=d, hpb=hpb)
    if not save_residuals:
        kernel = functools.partial(
            lambda q_, k_, v_, o_, m, l, a, kern=None: kern(q_, k_, v_, o_, None, m, l, a),
            kern=kernel,
        )
    qspec = pl.BlockSpec((1, bq, 128), lambda b_, g_, qi, ki: (b_, qi, g_),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, bkv, 128), lambda b_, g_, qi, ki: (b_, ki, g_),
                          memory_space=pltpu.VMEM)
    out_specs = [qspec]
    out_shape = [jax.ShapeDtypeStruct((b, sq, hd), q.dtype)]
    if save_residuals:
        out_specs.append(pl.BlockSpec(
            (1, hpb, bq, LSE_LANES), lambda b_, g_, qi, ki: (b_, g_, qi, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, num_heads, sq, LSE_LANES),
                                              jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((hpb, bq, 128), jnp.float32),
            pltpu.VMEM((hpb, bq, 128), jnp.float32),
            pltpu.VMEM((hpb, bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    if save_residuals:
        return outs[0], outs[1]
    return outs[0], None


def _bshd_bwd(q, k, v, lse, di, do, sm_scale, kv_len, block_q, block_kv,
              interpret, num_heads):
    b, sq, hd = q.shape
    d, hpb = _bshd_group_geometry(hd, num_heads)
    skv = k.shape[1]
    ngroups = num_heads // hpb

    if (block_q is None and block_kv is None
            and sq * skv * 4 <= _SCORES_VMEM_BUDGET_BWD_FUSED):
        return _bshd_bwd_fused(q, k, v, do, lse, di, sm_scale, kv_len,
                               interpret, num_heads, d, hpb)

    bq, bkv = _pick_qkv_blocks(sq, skv, block_q, block_kv,
                               budget=_SCORES_VMEM_BUDGET_BWD // hpb)

    qspec = pl.BlockSpec((1, bq, 128), lambda b_, g_, ki, qi: (b_, qi, g_),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bkv, 128), lambda b_, g_, ki, qi: (b_, ki, g_),
                         memory_space=pltpu.VMEM)
    statspec = pl.BlockSpec((1, hpb, bq, LSE_LANES),
                            lambda b_, g_, ki, qi: (b_, g_, qi, 0),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bshd_bwd_dkv_kernel, sm_scale=sm_scale,
                          kv_len=kv_len, block_kv=bkv, num_q_blocks=sq // bq,
                          d=d, hpb=hpb),
        grid=(b, ngroups, skv // bkv, sq // bq),
        in_specs=[qspec, kspec, kspec, qspec, statspec, statspec],
        out_specs=[
            pl.BlockSpec((1, bkv, 128), lambda b_, g_, ki, qi: (b_, ki, g_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, 128), lambda b_, g_, ki, qi: (b_, ki, g_),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((hpb, bkv, d), jnp.float32),
            pltpu.VMEM((hpb, bkv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di)

    qspec2 = pl.BlockSpec((1, bq, 128), lambda b_, g_, qi, ki: (b_, qi, g_),
                          memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bkv, 128), lambda b_, g_, qi, ki: (b_, ki, g_),
                          memory_space=pltpu.VMEM)
    statspec2 = pl.BlockSpec((1, hpb, bq, LSE_LANES),
                             lambda b_, g_, qi, ki: (b_, g_, qi, 0),
                             memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bshd_bwd_dq_kernel, sm_scale=sm_scale,
                          kv_len=kv_len, block_kv=bkv,
                          num_kv_blocks=skv // bkv, d=d, hpb=hpb),
        grid=(b, ngroups, sq // bq, skv // bkv),
        in_specs=[qspec2, kspec2, kspec2, qspec2, statspec2, statspec2],
        out_specs=qspec2,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((hpb, bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_mha_bshd(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret,
                    num_heads):
    o, _ = _bshd_fwd(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret,
                     save_residuals=False, num_heads=num_heads)
    return o


def _flash_mha_bshd_fwd(q, k, v, sm_scale, kv_len, block_q, block_kv,
                        interpret, num_heads):
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _bshd_fwd(q, k, v, sm_scale, kv_len, block_q, block_kv, interpret,
                       save_residuals=True, num_heads=num_heads)
    # named for remat save_only_these_names("attn_out"): keeping o AND lse
    # lets the remat re-forward skip re-running the flash kernel entirely —
    # the bwd's residuals (q,k,v) rebuild from the cheap projections.
    # lse is saved SQUEEZED to (B, H, S): any trailing stat-lane dim gets
    # padded back to 128 lanes by the tiled layout (16x memory) — measured
    # as an HBM OOM when 37 of them were saved per microstep.
    o = checkpoint_name(o, "attn_out")
    lse_small = checkpoint_name(lse[..., 0], "attn_out")
    return o, (q, k, v, o, lse_small)


def _flash_mha_bshd_bwd(sm_scale, kv_len, block_q, block_kv, interpret,
                        num_heads, res, do):
    q, k, v, o, lse_small = res
    lse, di = bwd_row_stats(o, do, lse_small, num_heads)
    return _bshd_bwd(q, k, v, lse, di, do, sm_scale, kv_len, block_q,
                     block_kv, interpret, num_heads)


_flash_mha_bshd.defvjp(_flash_mha_bshd_fwd, _flash_mha_bshd_bwd)


def mha_bshd(q, k, v, *, num_heads, sm_scale=None, kv_len=None, block_q=_BQ,
             block_kv=_BKV, backend=None):
    """Multi-head attention on (B, S, H*D) tensors — no layout transposes.

    S must be a multiple of the chosen block size (callers concat a zero tail
    once); ``kv_len`` masks the padded keys. Semantics identical to mha().
    Falls back to transpose + BHSD kernels when head_dim doesn't tile into
    128-wide column groups.
    """
    b, sq, hd = q.shape
    d = hd // num_heads
    skv = k.shape[1]
    if sm_scale is None:
        sm_scale = d**-0.5
    if kv_len is not None and kv_len >= skv:
        kv_len = None
    if backend is None:
        platform = jax.devices()[0].platform
        backend = "pallas" if platform == "tpu" else "reference"
    to4 = lambda a, s: a.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    if backend == "reference":
        o = attention_reference(to4(q, sq), to4(k, skv), to4(v, skv),
                                sm_scale=sm_scale, kv_len=kv_len)
        return o.transpose(0, 2, 1, 3).reshape(b, sq, hd)
    interpret = backend == "pallas_interpret"
    if _bshd_group_geometry(hd, num_heads) is None:
        o = _flash_mha(to4(q, sq), to4(k, skv), to4(v, skv), float(sm_scale),
                       kv_len, block_q, block_kv, interpret)
        return o.transpose(0, 2, 1, 3).reshape(b, sq, hd)
    return _flash_mha_bshd(q, k, v, float(sm_scale), kv_len, block_q, block_kv,
                           interpret, num_heads)


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
