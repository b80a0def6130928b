"""Joint two-stream flash attention with fused qk-RMS (Pallas TPU).

MMDiT's joint attention concatenates image and text token streams, runs
bidirectional attention, and splits the result back (reference: diffusers
JointAttnProcessor inside SD3Transformer2DModel — the torch path materialises
``torch.cat([x, ctx])`` exactly the same way). The round-1/2 TPU port did the
same: 4 per-head RMS kernels (q/k per stream), then 3 HBM concats (q,k,v with
a zero tail to a 128-multiple), the flash kernel, and a slice — every one of
those a full (B, S, H*d) HBM round-trip that XLA cannot fuse into the opaque
``pallas_call``.

This kernel removes all of them. The two streams stay separate in HBM and
both kv blocks are visited in a SINGLE pass: the whole (S_q, S_img) and
(S_q, S_txt) score tiles live in VMEM simultaneously, softmax normalises
over their joint row max, and the two p·v products accumulate into one f32
tile. So:

  * no concatenated q/k/v is ever materialised,
  * no zero tail / kv-length mask is needed (both blocks are fully valid),
  * the per-stream per-head RMS qk-norm folds into the q/k tile loads
    (read once from HBM, normalise in VMEM registers, feed the MXU),
  * no online-softmax carry state: grid is a flat ``(B, head_groups)`` with
    every (batch, head-group) window independent — no scratch buffers, no
    ``alpha`` rescaling passes, no serialized q/kv grid dims. (The first cut
    of this kernel walked the streams as two sequential kv grid steps with
    (hpb, S, 128) f32 scratch carries; tunnel-corrected microbenchmarks —
    scripts/probe_attention.py — measured it at 4.05 ms vs 1.54 ms for the
    equivalent single-pass single-stream kernel at the production shape, so
    the carry machinery itself was ~2x the kernel cost.)

Backward is fused the same way (_joint_bwd_kernel): one grid cell per
(batch, head-group) recomputes the per-stream qk-RMS on (S, d) tiles in
registers, computes each score-space tensor (s, p, dp, ds) ONCE, and emits
all six cotangents (dyq/dyk/dv per stream) — no q/k/v/o/do concats, no
128-pad, no separate RMS kernel launches. The RMS input gradients go through
the closed form outside (ops.fused_norms.rms_bwd_closed).

``mha_rms`` is the single-stream variant (SD3.5's dual self-attention): same
fused qk-RMS, one kv stream.

Numerics: identical op sequence to HeadRMSNorm + mha_bshd (fp32 stats, bf16
cast before the MXU dot); the softmax normalises over the joint row max of
both score tiles — the same single-max softmax the concatenated reference
computes — so results differ from the unfused path only by the summation
order of the two l-terms (tests bound it at ~1e-2 in bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adv_grpo_tpu.ops.attention import (
    LSE_LANES, _bshd_group_geometry, attention_reference, bwd_row_stats,
    mha_bshd)
from adv_grpo_tpu.ops.fused_norms import (
    _rms_reference, rms_bwd_closed as _rms_bwd_closed, rms_norm_heads)

# whole-tile f32 scores budget: (S_q, S_kv) per subhead live in VMEM.
# 1024^2 * 4B = 4MB at the 512^2 production shape.
_SCORES_BUDGET = 8 * 1024 * 1024
_LOG2E = 1.4426950408889634  # softmax in base 2: fold into the q pre-scale
_LN2 = 0.6931471805599453


# ───────────────────────────── forward kernel ─────────────────────────────


def _joint_fwd_kernel(qi_ref, ki_ref, vi_ref, qt_ref, kt_ref, vt_ref,
                      wq_ref, wk_ref,
                      oi_ref, ot_ref, lsei_ref, lset_ref,
                      *, sm_scale, eps, d, hpb, fuse_rms, t_valid):
    """One (batch, head-group) window: the FULL joint attention, single pass.

    Per subhead, both score tiles — (S_q, S_img) and (S_q, S_txt) — are
    computed back to back, softmax-normalised over their joint row max, and
    contracted against the two v tiles into one f32 accumulator. No carry
    state crosses grid steps.

    wq_ref/wk_ref: (2, 128) — row 0 the image-stream weight, row 1 the text
    (``add_*``) weight, each tiled across the group's hpb subheads.

    ``t_valid``: None, or the number of REAL text tokens when the text stream
    was zero-padded to an 8-multiple by the wrapper (SD3's 154-token prompt
    embeds) — padded kv columns are masked to -inf before the softmax.
    """

    def norm(x, w_ref, stream, i, scale=None):
        # per-subhead RMS in fp32 then bf16 cast — the HeadRMSNorm op
        # sequence. Q rows additionally pre-multiply sm_scale*log2(e) here,
        # on the (S, d) tile, so the softmax runs in base 2 with NO multiply
        # pass over the 16x larger (S_q, S_kv) score tiles (the splash-kernel
        # trick; scores-space elementwise passes measured ~45% of the fwd
        # kernel in scripts/probe_softmax_cost.py).
        xf = x.astype(jnp.float32)
        if fuse_rms:
            m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
            w = w_ref[stream:stream + 1, i * d:(i + 1) * d].astype(jnp.float32)
            xf = (xf * jax.lax.rsqrt(m2 + eps)) * w
        elif scale is None:
            return x
        if scale is not None:
            xf = xf * scale
        return xf.astype(x.dtype)

    qscale = sm_scale * _LOG2E
    q_img = qi_ref[0]
    k_img = ki_ref[0]
    v_img = vi_ref[0]
    q_txt = qt_ref[0]
    k_txt = kt_ref[0]
    v_txt = vt_ref[0]

    outs_i = []
    outs_t = []
    for i in range(hpb):
        sl = slice(i * d, (i + 1) * d)
        ki_n = norm(k_img[:, sl], wk_ref, 0, i)
        kt_n = norm(k_txt[:, sl], wk_ref, 1, i)
        vi_s = v_img[:, sl]
        vt_s = v_txt[:, sl]

        for q_full, q_stream, outs, lse_ref in (
                (q_img, 0, outs_i, lsei_ref), (q_txt, 1, outs_t, lset_ref)):
            qn = norm(q_full[:, sl], wq_ref, q_stream, i, scale=qscale)
            # scores are in base-2 space: qn carries sm_scale*log2(e)
            s1 = jax.lax.dot_general(
                qn, ki_n, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s2 = jax.lax.dot_general(
                qn, kt_n, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if t_valid is not None:
                col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
                s2 = jnp.where(col < t_valid, s2, -jnp.inf)
            m = jnp.maximum(jnp.max(s1, axis=1, keepdims=True),
                            jnp.max(s2, axis=1, keepdims=True))
            p1 = jnp.exp2(s1 - m)
            p2 = jnp.exp2(s2 - m)
            l = (jnp.sum(p1, axis=1, keepdims=True)
                 + jnp.sum(p2, axis=1, keepdims=True))
            pv = (jax.lax.dot(p1.astype(vi_s.dtype), vi_s,
                              preferred_element_type=jnp.float32)
                  + jax.lax.dot(p2.astype(vt_s.dtype), vt_s,
                                preferred_element_type=jnp.float32))
            outs.append(pv / l)
            if lse_ref is not None:
                # natural-log lse for the backward: ln(sum e^s) = ln2 * lse2
                lse_ref[0, i] = jnp.broadcast_to(
                    (m + jnp.log2(jnp.maximum(l, 1e-37))) * _LN2,
                    (qn.shape[0], LSE_LANES))

    oi_ref[0] = jnp.concatenate(outs_i, axis=1).astype(oi_ref.dtype)
    ot_ref[0] = jnp.concatenate(outs_t, axis=1).astype(ot_ref.dtype)


def _joint_fwd(q_i, k_i, v_i, q_t, k_t, v_t, wq2, wk2, num_heads, sm_scale,
               eps, fuse_rms, interpret, save_residuals, t_valid=None):
    b, s_i, hd = q_i.shape
    s_t = q_t.shape[1]
    d, hpb = _bshd_group_geometry(hd, num_heads)
    ngroups = num_heads // hpb
    grid = (b, ngroups)

    kernel = functools.partial(
        _joint_fwd_kernel, sm_scale=sm_scale, eps=eps, d=d, hpb=hpb,
        fuse_rms=fuse_rms, t_valid=t_valid)
    if not save_residuals:
        kernel = functools.partial(
            lambda qi_, ki_, vi_, qt_, kt_, vt_, wq_, wk_, oi_, ot_,
            kern=None: kern(
                qi_, ki_, vi_, qt_, kt_, vt_, wq_, wk_, oi_, ot_, None, None),
            kern=kernel)

    img_spec = pl.BlockSpec((1, s_i, 128), lambda b_, g_: (b_, 0, g_),
                            memory_space=pltpu.VMEM)
    txt_spec = pl.BlockSpec((1, s_t, 128), lambda b_, g_: (b_, 0, g_),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((2, 128), lambda b_, g_: (0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [img_spec, txt_spec]
    out_shape = [jax.ShapeDtypeStruct((b, s_i, hd), q_i.dtype),
                 jax.ShapeDtypeStruct((b, s_t, hd), q_t.dtype)]
    if save_residuals:
        lse_i_spec = pl.BlockSpec(
            (1, hpb, s_i, LSE_LANES), lambda b_, g_: (b_, g_, 0, 0),
            memory_space=pltpu.VMEM)
        lse_t_spec = pl.BlockSpec(
            (1, hpb, s_t, LSE_LANES), lambda b_, g_: (b_, g_, 0, 0),
            memory_space=pltpu.VMEM)
        out_specs += [lse_i_spec, lse_t_spec]
        out_shape += [
            jax.ShapeDtypeStruct((b, num_heads, s_i, LSE_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, num_heads, s_t, LSE_LANES), jnp.float32)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec, img_spec, img_spec, txt_spec, txt_spec, txt_spec,
                  w_spec, w_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # both whole-tile score matrices + their exp2 images live at once;
            # with the lse residual outputs (training jvp) that peaks ~18MB,
            # past Mosaic's 16MB default scoped-vmem limit (v5e VMEM is 128MB)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_i, k_i, v_i, q_t, k_t, v_t, wq2, wk2)
    if save_residuals:
        return outs[0], outs[1], outs[2], outs[3]
    return outs[0], outs[1], None, None


# ───────────────────────── fused two-stream backward ─────────────────────────


def _joint_bwd_kernel(qi_ref, ki_ref, vi_ref, qt_ref, kt_ref, vt_ref,
                      wq_ref, wk_ref, doi_ref, dot_ref,
                      lsei_ref, lset_ref, dii_ref, dit_ref,
                      dyqi_ref, dyki_ref, dvi_ref, dyqt_ref, dykt_ref,
                      dvt_ref, *, sm_scale, eps, d, hpb, fuse_rms, t_valid):
    """One (batch, head-group) window: the FULL joint backward, single pass.

    Mirrors _joint_fwd_kernel: the streams stay separate in HBM (no q/k/v/o/do
    concats, no 128-pad, no pad-lse guard rows), the per-stream qk-RMS is
    recomputed on the (S, d) tiles in registers, and every score-space tensor
    (s, p, dp, ds) is computed ONCE and feeds all three cotangent
    contractions. Outputs are gradients wrt the NORMALISED q/k (dyq/dyk — the
    wrapper pushes them through the closed-form RMS backward) and v.

    Scale folding as in the fused single-stream bwd: q pre-multiplies
    sm_scale*log2(e) so p = exp2(s2 - lse2), and ds's trailing *sm_scale
    folds into the (S, d) q/k operands of the dk/dq dots.
    """

    def norm(x, w_ref, stream, i):
        xf = x.astype(jnp.float32)
        if not fuse_rms:
            return xf
        m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
        w = w_ref[stream:stream + 1, i * d:(i + 1) * d].astype(jnp.float32)
        return (xf * jax.lax.rsqrt(m2 + eps)) * w

    q_img = qi_ref[0]
    k_img = ki_ref[0]
    v_img = vi_ref[0]
    q_txt = qt_ref[0]
    k_txt = kt_ref[0]
    v_txt = vt_ref[0]
    do_img = doi_ref[0]
    do_txt = dot_ref[0]
    dt = q_img.dtype

    dyq_i, dyk_i, dv_i = [], [], []
    dyq_t, dyk_t, dv_t = [], [], []
    for i in range(hpb):
        sl = slice(i * d, (i + 1) * d)
        yki = norm(k_img[:, sl], wk_ref, 0, i).astype(dt)
        ykt = norm(k_txt[:, sl], wk_ref, 1, i).astype(dt)
        vi_s = v_img[:, sl]
        vt_s = v_txt[:, sl]

        dki_acc = None
        dkt_acc = None
        for q_full, do_full, lse_ref, di_ref, stream, dyqs in (
                (q_img, do_img, lsei_ref, dii_ref, 0, dyq_i),
                (q_txt, do_txt, lset_ref, dit_ref, 1, dyq_t)):
            yq = norm(q_full[:, sl], wq_ref, stream, i)  # (S_q, d) f32
            qs2 = (yq * (sm_scale * _LOG2E)).astype(dt)
            yq_s = (yq * sm_scale).astype(dt)
            lse2 = lse_ref[0, i][:, :1] * _LOG2E
            di = di_ref[0, i][:, :1]

            s1 = jax.lax.dot_general(
                qs2, yki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s2 = jax.lax.dot_general(
                qs2, ykt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if t_valid is not None:
                col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
                s2 = jnp.where(col < t_valid, s2, -jnp.inf)
            p1 = jnp.exp2(s1 - lse2)
            p2 = jnp.exp2(s2 - lse2)

            do_qb = do_full[:, sl]
            dv1 = jax.lax.dot_general(
                p1.astype(dt), do_qb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv2 = jax.lax.dot_general(
                p2.astype(dt), do_qb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp1 = jax.lax.dot_general(
                do_qb, vi_s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp2 = jax.lax.dot_general(
                do_qb, vt_s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            t1 = (p1 * (dp1 - di)).astype(dt)
            t2 = (p2 * (dp2 - di)).astype(dt)

            dk1 = jax.lax.dot_general(
                t1, yq_s, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk2 = jax.lax.dot_general(
                t2, yq_s, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dyq = (jax.lax.dot(t1, (yki.astype(jnp.float32) * sm_scale)
                               .astype(dt),
                               preferred_element_type=jnp.float32)
                   + jax.lax.dot(t2, (ykt.astype(jnp.float32) * sm_scale)
                                 .astype(dt),
                                 preferred_element_type=jnp.float32))
            dyqs.append(dyq)
            if stream == 0:
                dki_acc, dkt_acc = dk1, dk2
                dvi_a, dvt_a = dv1, dv2
            else:
                dki_acc = dki_acc + dk1
                dkt_acc = dkt_acc + dk2
                dvi_a = dvi_a + dv1
                dvt_a = dvt_a + dv2
        dyk_i.append(dki_acc)
        dyk_t.append(dkt_acc)
        dv_i.append(dvi_a)
        dv_t.append(dvt_a)

    dyqi_ref[0] = jnp.concatenate(dyq_i, axis=1).astype(dyqi_ref.dtype)
    dyki_ref[0] = jnp.concatenate(dyk_i, axis=1).astype(dyki_ref.dtype)
    dvi_ref[0] = jnp.concatenate(dv_i, axis=1).astype(dvi_ref.dtype)
    dyqt_ref[0] = jnp.concatenate(dyq_t, axis=1).astype(dyqt_ref.dtype)
    dykt_ref[0] = jnp.concatenate(dyk_t, axis=1).astype(dykt_ref.dtype)
    dvt_ref[0] = jnp.concatenate(dv_t, axis=1).astype(dvt_ref.dtype)


def _joint_bwd_fused(q_i, k_i, v_i, q_t, k_t, v_t, wq2, wk2, do_i, do_t,
                     lse_i, lse_t, di_i, di_t, num_heads, sm_scale, eps,
                     fuse_rms, interpret, t_valid):
    b, s_i, hd = q_i.shape
    s_t = q_t.shape[1]
    d, hpb = _bshd_group_geometry(hd, num_heads)
    ngroups = num_heads // hpb
    img_spec = pl.BlockSpec((1, s_i, 128), lambda b_, g_: (b_, 0, g_),
                            memory_space=pltpu.VMEM)
    txt_spec = pl.BlockSpec((1, s_t, 128), lambda b_, g_: (b_, 0, g_),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((2, 128), lambda b_, g_: (0, 0),
                          memory_space=pltpu.VMEM)
    stat_i = pl.BlockSpec((1, hpb, s_i, LSE_LANES),
                          lambda b_, g_: (b_, g_, 0, 0),
                          memory_space=pltpu.VMEM)
    stat_t = pl.BlockSpec((1, hpb, s_t, LSE_LANES),
                          lambda b_, g_: (b_, g_, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_joint_bwd_kernel, sm_scale=sm_scale, eps=eps, d=d,
                          hpb=hpb, fuse_rms=fuse_rms, t_valid=t_valid),
        grid=(b, ngroups),
        in_specs=[img_spec, img_spec, img_spec, txt_spec, txt_spec, txt_spec,
                  w_spec, w_spec, img_spec, txt_spec, stat_i, stat_t, stat_i,
                  stat_t],
        out_specs=[img_spec, img_spec, img_spec, txt_spec, txt_spec, txt_spec],
        out_shape=[jax.ShapeDtypeStruct(q_i.shape, q_i.dtype),
                   jax.ShapeDtypeStruct(k_i.shape, k_i.dtype),
                   jax.ShapeDtypeStruct(v_i.shape, v_i.dtype),
                   jax.ShapeDtypeStruct(q_t.shape, q_t.dtype),
                   jax.ShapeDtypeStruct(k_t.shape, k_t.dtype),
                   jax.ShapeDtypeStruct(v_t.shape, v_t.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # ~4 score-space f32 tensors live per (stream, subhead) — ~25MB
            # at the 1024+160 production shape (v5e VMEM is 128MB)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_i, k_i, v_i, q_t, k_t, v_t, wq2, wk2, do_i, do_t, lse_i, lse_t,
      di_i, di_t)


def _single_bwd_kernel(q_ref, k_ref, v_ref, wq_ref, wk_ref, do_ref, lse_ref,
                       di_ref, dyq_ref, dyk_ref, dv_ref, *, sm_scale, eps, d,
                       hpb, fuse_rms):
    """Single-stream fused backward w/ in-kernel qk-RMS recompute; grid (B, G).

    The whole-tile geometry (no kv mask — the wrapper falls back for
    unaligned S) makes this the _joint_bwd_kernel specialised to one stream.
    """

    def norm(x, w_ref, i):
        xf = x.astype(jnp.float32)
        if not fuse_rms:
            return xf
        m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
        w = w_ref[0:1, i * d:(i + 1) * d].astype(jnp.float32)
        return (xf * jax.lax.rsqrt(m2 + eps)) * w

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    dt = q.dtype
    dyqs, dyks, dvs = [], [], []
    for i in range(hpb):
        sl = slice(i * d, (i + 1) * d)
        yk = norm(k[:, sl], wk_ref, i)
        yq = norm(q[:, sl], wq_ref, i)
        qs2 = (yq * (sm_scale * _LOG2E)).astype(dt)
        ykb = yk.astype(dt)
        lse2 = lse_ref[0, i][:, :1] * _LOG2E
        di = di_ref[0, i][:, :1]
        s = jax.lax.dot_general(
            qs2, ykb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp2(s - lse2)
        do_qb = do[:, sl]
        dv_i = jax.lax.dot_general(
            p.astype(dt), do_qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do_qb, v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = (p * (dp - di)).astype(dt)
        dyks.append(jax.lax.dot_general(
            t, (yq * sm_scale).astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dyqs.append(jax.lax.dot(
            t, (yk * sm_scale).astype(dt),
            preferred_element_type=jnp.float32))
        dvs.append(dv_i)
    dyq_ref[0] = jnp.concatenate(dyqs, axis=1).astype(dyq_ref.dtype)
    dyk_ref[0] = jnp.concatenate(dyks, axis=1).astype(dyk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)


def _single_bwd_fused(q, k, v, wq2, wk2, do, lse, di, num_heads, sm_scale,
                      eps, fuse_rms, interpret):
    b, s, hd = q.shape
    d, hpb = _bshd_group_geometry(hd, num_heads)
    ngroups = num_heads // hpb
    spec = pl.BlockSpec((1, s, 128), lambda b_, g_: (b_, 0, g_),
                        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 128), lambda b_, g_: (0, 0),
                          memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, hpb, s, LSE_LANES), lambda b_, g_: (b_, g_, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_single_bwd_kernel, sm_scale=sm_scale, eps=eps, d=d,
                          hpb=hpb, fuse_rms=fuse_rms),
        grid=(b, ngroups),
        in_specs=[spec, spec, spec, w_spec, w_spec, spec, stat, stat],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, wq2, wk2, do, lse, di)


# ──────────────────────── custom VJP (joint, 2-stream) ────────────────────────


def _tile_w2(w_img, w_txt, hpb):
    """(d,) weights -> (2, 128) f32: per-stream rows, tiled across subheads."""
    return jnp.stack([jnp.tile(w_img.astype(jnp.float32), hpb),
                      jnp.tile(w_txt.astype(jnp.float32), hpb)], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def _joint_mha_p(q_i, k_i, v_i, q_t, k_t, v_t, wq_i, wk_i, wq_t, wk_t,
                 num_heads, sm_scale, eps, fuse_rms, interpret, t_valid):
    hd = q_i.shape[-1]
    hpb = 128 // (hd // num_heads)
    wq2 = _tile_w2(wq_i, wq_t, hpb)
    wk2 = _tile_w2(wk_i, wk_t, hpb)
    o_i, o_t, _, _ = _joint_fwd(q_i, k_i, v_i, q_t, k_t, v_t, wq2, wk2,
                                num_heads, sm_scale, eps, fuse_rms, interpret,
                                save_residuals=False, t_valid=t_valid)
    return o_i, o_t


def _joint_mha_p_fwd(q_i, k_i, v_i, q_t, k_t, v_t, wq_i, wk_i, wq_t, wk_t,
                     num_heads, sm_scale, eps, fuse_rms, interpret, t_valid):
    from jax.ad_checkpoint import checkpoint_name

    hd = q_i.shape[-1]
    hpb = 128 // (hd // num_heads)
    wq2 = _tile_w2(wq_i, wq_t, hpb)
    wk2 = _tile_w2(wk_i, wk_t, hpb)
    o_i, o_t, lse_i, lse_t = _joint_fwd(
        q_i, k_i, v_i, q_t, k_t, v_t, wq2, wk2, num_heads, sm_scale, eps,
        fuse_rms, interpret, save_residuals=True, t_valid=t_valid)
    # save_attn remat contract (see ops.attention._flash_mha_bshd_fwd): name
    # o + squeezed lse so the remat re-forward skips the flash kernel
    o_i = checkpoint_name(o_i, "attn_out")
    o_t = checkpoint_name(o_t, "attn_out")
    lse_i_small = checkpoint_name(lse_i[..., 0], "attn_out")
    lse_t_small = checkpoint_name(lse_t[..., 0], "attn_out")
    res = (q_i, k_i, v_i, q_t, k_t, v_t, wq_i, wk_i, wq_t, wk_t,
           o_i, o_t, lse_i_small, lse_t_small)
    return (o_i, o_t), res


def _joint_mha_p_bwd(num_heads, sm_scale, eps, fuse_rms, interpret, t_valid,
                     res, cot):
    # Fused two-stream backward: no q/k/v/o/do concats, no 128-pad, no
    # pad-lse guard rows, and the qk-RMS recompute happens in-kernel on the
    # (S, d) tiles (the wrapper already guaranteed the whole-tile geometry
    # before taking the kernel path in fwd). ``t_valid`` masks the text kv
    # columns the wrapper zero-padded to an 8-multiple; their t2 columns are
    # 0 so the padded dk/dv rows the wrapper slices off stay 0.
    (q_i, k_i, v_i, q_t, k_t, v_t, wq_i, wk_i, wq_t, wk_t,
     o_i, o_t, lse_i_small, lse_t_small) = res
    do_i, do_t = cot
    hpb = 128 // (q_i.shape[-1] // num_heads)
    wq2 = _tile_w2(wq_i, wq_t, hpb)
    wk2 = _tile_w2(wk_i, wk_t, hpb)

    lse_i, di_i = bwd_row_stats(o_i, do_i, lse_i_small, num_heads)
    lse_t, di_t = bwd_row_stats(o_t, do_t, lse_t_small, num_heads)

    dyq_i, dyk_i, dv_i, dyq_t, dyk_t, dv_t = _joint_bwd_fused(
        q_i, k_i, v_i, q_t, k_t, v_t, wq2, wk2, do_i, do_t, lse_i, lse_t,
        di_i, di_t, num_heads, sm_scale, eps, fuse_rms, interpret, t_valid)

    if fuse_rms:
        dq_i, dwq_i = _rms_bwd_closed(q_i, wq_i, dyq_i, num_heads, eps)
        dk_i, dwk_i = _rms_bwd_closed(k_i, wk_i, dyk_i, num_heads, eps)
        dq_t, dwq_t = _rms_bwd_closed(q_t, wq_t, dyq_t, num_heads, eps)
        dk_t, dwk_t = _rms_bwd_closed(k_t, wk_t, dyk_t, num_heads, eps)
    else:
        dq_i, dk_i, dq_t, dk_t = dyq_i, dyk_i, dyq_t, dyk_t
        dwq_i = jnp.zeros_like(wq_i)
        dwk_i = jnp.zeros_like(wk_i)
        dwq_t = jnp.zeros_like(wq_t)
        dwk_t = jnp.zeros_like(wk_t)
    return (dq_i, dk_i, dv_i, dq_t, dk_t, dv_t, dwq_i, dwk_i, dwq_t, dwk_t)


_joint_mha_p.defvjp(_joint_mha_p_fwd, _joint_mha_p_bwd)


def joint_mha(q_img, k_img, v_img, q_txt, k_txt, v_txt, *, num_heads,
              rms_weights=None, eps: float = 1e-6, sm_scale=None,
              backend=None):
    """Two-stream joint attention -> (o_img, o_txt), streams never concatenated.

    ``rms_weights``: None, or (wq_img, wk_img, wq_txt, wk_txt) each (d,) — the
    SD3.5 per-head qk-RMS weights (norm_q / norm_k / norm_added_q /
    norm_added_k), applied fused inside the kernel.

    Semantics == HeadRMSNorm on q/k per stream, concat [img ; txt], full
    bidirectional attention, split (the diffusers JointAttnProcessor contract).
    """
    b, s_i, hd = q_img.shape
    s_t = q_txt.shape[1]
    d = hd // num_heads
    if sm_scale is None:
        sm_scale = d**-0.5
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "reference"

    fuse_rms = rms_weights is not None
    if backend == "reference":
        if fuse_rms:
            wq_i, wk_i, wq_t, wk_t = rms_weights
            q_img = _rms_reference(q_img, wq_i, num_heads, eps, q_img.dtype)
            k_img = _rms_reference(k_img, wk_i, num_heads, eps, k_img.dtype)
            q_txt = _rms_reference(q_txt, wq_t, num_heads, eps, q_txt.dtype)
            k_txt = _rms_reference(k_txt, wk_t, num_heads, eps, k_txt.dtype)
        to4 = lambda a: a.reshape(b, a.shape[1], num_heads, d).transpose(0, 2, 1, 3)
        q = jnp.concatenate([to4(q_img), to4(q_txt)], axis=2)
        k = jnp.concatenate([to4(k_img), to4(k_txt)], axis=2)
        v = jnp.concatenate([to4(v_img), to4(v_txt)], axis=2)
        o = attention_reference(q, k, v, sm_scale=sm_scale)
        o = o.transpose(0, 2, 1, 3).reshape(b, s_i + s_t, hd)
        return o[:, :s_i], o[:, s_i:]

    # geometry / VMEM guards -> unfused composition fallback (identical
    # semantics, the round-2 path)
    geo = _bshd_group_geometry(hd, num_heads)
    # single-pass kernel: both score tiles (S_q, S_img) + (S_q, S_txt) are
    # live at once for the widest q stream
    scores_bytes = max(s_i, s_t) * (s_i + s_t) * 4
    if geo is None or s_i % 8 or scores_bytes > _SCORES_BUDGET:
        if fuse_rms:
            wq_i, wk_i, wq_t, wk_t = rms_weights
            kw = dict(num_heads=num_heads, eps=eps, backend=backend)
            q_img = rms_norm_heads(q_img, wq_i, **kw)
            k_img = rms_norm_heads(k_img, wk_i, **kw)
            q_txt = rms_norm_heads(q_txt, wq_t, **kw)
            k_txt = rms_norm_heads(k_txt, wk_t, **kw)
        s_tot = s_i + s_t
        pad = (-s_tot) % 128

        def joint(a, ca):
            parts = [a, ca]
            if pad:
                parts.append(jnp.zeros((b, pad, hd), a.dtype))
            return jnp.concatenate(parts, axis=1)

        o = mha_bshd(joint(q_img, q_txt), joint(k_img, k_txt),
                     joint(v_img, v_txt), num_heads=num_heads,
                     sm_scale=sm_scale, kv_len=s_tot, backend=backend)
        return o[:, :s_i], o[:, s_i:s_tot]

    if fuse_rms:
        wq_i, wk_i, wq_t, wk_t = rms_weights
    else:
        wq_i = wk_i = wq_t = wk_t = jnp.ones((d,), jnp.float32)

    # sublane alignment: zero-pad an unaligned text stream (SD3's 154-token
    # prompt embeds) to an 8-multiple and mask the padded kv columns in-kernel
    t_valid = None
    t_pad = (-s_t) % 8
    if t_pad:
        t_valid = s_t
        zt = lambda a: jnp.concatenate(
            [a, jnp.zeros((b, t_pad, hd), a.dtype)], axis=1)
        q_txt, k_txt, v_txt = zt(q_txt), zt(k_txt), zt(v_txt)

    o_img, o_txt = _joint_mha_p(
        q_img, k_img, v_img, q_txt, k_txt, v_txt, wq_i, wk_i, wq_t, wk_t,
        num_heads, float(sm_scale), float(eps), fuse_rms,
        backend == "pallas_interpret", t_valid)
    if t_pad:
        o_txt = o_txt[:, :s_t]
    return o_img, o_txt


# ──────────────────── single-stream variant (dual attention) ────────────────────


def _single_fwd_kernel(q_ref, k_ref, v_ref, wq_ref, wk_ref, o_ref, lse_ref,
                       *, sm_scale, eps, d, hpb, fuse_rms):
    """Whole-tile single-stream attention with fused qk-RMS; grid (B, G)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    outs = []
    for i in range(hpb):
        qi = q[:, i * d:(i + 1) * d]
        ki = k[:, i * d:(i + 1) * d]

        def norm(x, w_ref, scale=None):
            # q rows pre-multiply sm_scale*log2(e) on the (S, d) tile so the
            # softmax runs in base 2 with no multiply pass over the scores
            xf = x.astype(jnp.float32)
            if fuse_rms:
                m2 = jnp.mean(xf * xf, axis=1, keepdims=True)
                w = w_ref[0:1, i * d:(i + 1) * d].astype(jnp.float32)
                xf = (xf * jax.lax.rsqrt(m2 + eps)) * w
            elif scale is None:
                return x
            if scale is not None:
                xf = xf * scale
            return xf.astype(x.dtype)

        qi = norm(qi, wq_ref, scale=sm_scale * _LOG2E)
        ki = norm(ki, wk_ref)
        s = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot(p.astype(v.dtype), v[:, i * d:(i + 1) * d],
                         preferred_element_type=jnp.float32)
        outs.append(pv / l)
        if lse_ref is not None:
            lse_ref[0, i] = jnp.broadcast_to(
                (m + jnp.log2(jnp.maximum(l, 1e-37))) * _LN2,
                (q.shape[0], LSE_LANES))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _single_fwd(q, k, v, wq2, wk2, num_heads, sm_scale, eps, fuse_rms,
                interpret, save_residuals):
    b, s, hd = q.shape
    d, hpb = _bshd_group_geometry(hd, num_heads)
    ngroups = num_heads // hpb
    grid = (b, ngroups)
    kernel = functools.partial(_single_fwd_kernel, sm_scale=sm_scale, eps=eps,
                               d=d, hpb=hpb, fuse_rms=fuse_rms)
    if not save_residuals:
        kernel = functools.partial(
            lambda q_, k_, v_, wq_, wk_, o_, kern=None: kern(
                q_, k_, v_, wq_, wk_, o_, None),
            kern=kernel)
    spec = pl.BlockSpec((1, s, 128), lambda b_, g_: (b_, 0, g_),
                        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 128), lambda b_, g_: (0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [spec]
    out_shape = [jax.ShapeDtypeStruct((b, s, hd), q.dtype)]
    if save_residuals:
        out_specs.append(pl.BlockSpec(
            (1, hpb, s, LSE_LANES), lambda b_, g_: (b_, g_, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, num_heads, s, LSE_LANES),
                                              jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, w_spec, w_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, wq2, wk2)
    if save_residuals:
        return outs[0], outs[1]
    return outs[0], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _mha_rms_p(q, k, v, wq, wk, num_heads, sm_scale, eps, fuse_rms, interpret):
    hpb = 128 // (q.shape[-1] // num_heads)
    wq2 = jnp.tile(wq.astype(jnp.float32), hpb)[None]
    wk2 = jnp.tile(wk.astype(jnp.float32), hpb)[None]
    o, _ = _single_fwd(q, k, v, wq2, wk2, num_heads, sm_scale, eps, fuse_rms,
                       interpret, save_residuals=False)
    return o


def _mha_rms_p_fwd(q, k, v, wq, wk, num_heads, sm_scale, eps, fuse_rms,
                   interpret):
    from jax.ad_checkpoint import checkpoint_name

    hpb = 128 // (q.shape[-1] // num_heads)
    wq2 = jnp.tile(wq.astype(jnp.float32), hpb)[None]
    wk2 = jnp.tile(wk.astype(jnp.float32), hpb)[None]
    o, lse = _single_fwd(q, k, v, wq2, wk2, num_heads, sm_scale, eps, fuse_rms,
                         interpret, save_residuals=True)
    o = checkpoint_name(o, "attn_out")
    lse_small = checkpoint_name(lse[..., 0], "attn_out")
    return o, (q, k, v, wq, wk, o, lse_small)


def _mha_rms_p_bwd(num_heads, sm_scale, eps, fuse_rms, interpret, res, do):
    # fused single-pass backward: qk-RMS recomputed in-kernel, no separate
    # normalised-q/k HBM materialisation, s/p/dp computed once
    q, k, v, wq, wk, o, lse_small = res
    hpb = 128 // (q.shape[-1] // num_heads)
    wq2 = jnp.tile(wq.astype(jnp.float32), hpb)[None]
    wk2 = jnp.tile(wk.astype(jnp.float32), hpb)[None]
    lse, di = bwd_row_stats(o, do, lse_small, num_heads)
    dyq, dyk, dv = _single_bwd_fused(q, k, v, wq2, wk2, do, lse, di,
                                     num_heads, sm_scale, eps, fuse_rms,
                                     interpret)
    if fuse_rms:
        dq, dwq = _rms_bwd_closed(q, wq, dyq, num_heads, eps)
        dk, dwk = _rms_bwd_closed(k, wk, dyk, num_heads, eps)
    else:
        dq, dk = dyq, dyk
        dwq, dwk = jnp.zeros_like(wq), jnp.zeros_like(wk)
    return dq, dk, dv, dwq, dwk


_mha_rms_p.defvjp(_mha_rms_p_fwd, _mha_rms_p_bwd)


def mha_rms(q, k, v, *, num_heads, rms_weights=None, eps: float = 1e-6,
            sm_scale=None, backend=None):
    """Single-stream (B, S, H*d) attention with fused per-head qk-RMS —
    SD3.5's dual self-attention path. S must be 8-aligned and the scores tile
    must fit VMEM; otherwise falls back to the unfused composition."""
    b, s, hd = q.shape
    d = hd // num_heads
    if sm_scale is None:
        sm_scale = d**-0.5
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "reference"
    fuse_rms = rms_weights is not None

    def unfused(backend_):
        qq, kk = q, k
        if fuse_rms:
            wq, wk = rms_weights
            kw = dict(num_heads=num_heads, eps=eps, backend=backend_)
            qq = rms_norm_heads(q, wq, **kw)
            kk = rms_norm_heads(k, wk, **kw)
        pad = (-s) % 128
        if pad:
            zt = lambda a: jnp.concatenate(
                [a, jnp.zeros((b, pad, hd), a.dtype)], axis=1)
            return mha_bshd(zt(qq), zt(kk), zt(v), num_heads=num_heads,
                            sm_scale=sm_scale, kv_len=s,
                            backend=backend_)[:, :s]
        return mha_bshd(qq, kk, v, num_heads=num_heads, sm_scale=sm_scale,
                        backend=backend_)

    if backend == "reference":
        return unfused("reference")
    geo = _bshd_group_geometry(hd, num_heads)
    if geo is None or s % 8 or s * s * 4 > _SCORES_BUDGET:
        return unfused(backend)
    if fuse_rms:
        wq, wk = rms_weights
    else:
        wq = wk = jnp.ones((d,), jnp.float32)
    return _mha_rms_p(q, k, v, wq, wk, num_heads, float(sm_scale), float(eps),
                      fuse_rms, backend == "pallas_interpret")
