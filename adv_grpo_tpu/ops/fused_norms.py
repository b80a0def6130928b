"""Fused row-norm kernels (Pallas TPU) — LayerNorm and per-head RMSNorm.

Device traces of the MMDiT forward (scripts/profile_rollout.py + jax.profiler)
show XLA's LayerNorm stat+apply fusions running at ~59 GB/s effective on a
(16, 1024, 1536) bf16 tensor — ~1.7 ms each, ~40 ms per forward across 24
layers, with another ~24 ms in the per-head qk RMS norms. These kernels do
the whole row-normalisation in one VMEM pass (read x once, write y once):

  layer_norm(x)                    — no-affine LN over the last dim, fp32
                                     stats (diffusers elementwise_affine=False
                                     semantics, = models.mmdit._layer_norm)
  rms_norm_heads(x, w, num_heads)  — RMS over each head's D-wide column group
                                     of a (B, S, H*D) tensor, scaled by the
                                     shared (D,) weight (SD3.5 qk-norm)

Both are jax.custom_vjp: the backward runs as plain-XLA closed forms (exact,
recomputes stats from the saved input) — the rollout is forward-only 10 of
every 12 steps, so the fwd kernel is where the time is. On CPU (tests) the
reference jnp path runs instead; 'pallas_interpret' exercises the kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(s: int, tile_bytes_per_row: int) -> int:
    """Largest row-block that divides s, is 8-aligned (or = s), and keeps the
    fp32 working tile small enough that the kernel's whole VMEM footprint
    (double-buffered in/out tiles + f32 temps, ~5x the tile) stays under the
    16MB scoped limit. Returns 0 when no divisor keeps the tile within VMEM
    (e.g. a huge prime row count) — callers fall back to the XLA path."""
    budget = 2 * 1024 * 1024
    bs = s
    while bs > 8 and (bs % 8 == 0) and bs * tile_bytes_per_row > budget:
        if s % (bs // 2) or (bs // 2) % 8:
            break
        bs //= 2
    # footprint ~5x the f32 tile (double-buffered in/out + temps) must stay
    # under the 16MB scoped limit -> tile cap ~3MB
    if bs * tile_bytes_per_row > 3 * 1024 * 1024:
        return 0
    return bs


# ───────────────────────────── layer norm ─────────────────────────────


def _ln_kernel(x_ref, y_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # (bs, D)
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y_ref[0] = (xc * jax.lax.rsqrt(var + eps)).astype(y_ref.dtype)


def _ln_reference(x, eps, out_dtype):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _layer_norm_p(x, eps, out_dtype, interpret):
    b, s, d = x.shape
    bs = _pick_rows(s, d * 4)
    # lane-alignment guard (compiled mode only): non-128-multiple feature
    # dims would rely on Mosaic's implicit lane masking, which tests only
    # exercise in interpret mode — route them to the XLA path on real TPUs
    # (production callers all use aligned d); interpret keeps the kernel so
    # tests still cover it
    if not bs or (d % 128 and not interpret):
        return _ln_reference(x, eps, out_dtype)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(b, s // bs),
        in_specs=[pl.BlockSpec((1, bs, d), lambda b_, si: (b_, si, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bs, d), lambda b_, si: (b_, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), out_dtype),
        interpret=interpret,
    )(x)


def _layer_norm_p_fwd(x, eps, out_dtype, interpret):
    return _layer_norm_p(x, eps, out_dtype, interpret), x


def _layer_norm_p_bwd(eps, out_dtype, interpret, x, dy):
    # dx = (dy - mean(dy) - xhat * mean(dy * xhat)) / sigma   (no affine)
    xf = x.astype(jnp.float32)
    g = dy.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = xc * rsig
    dx = rsig * (g - jnp.mean(g, axis=-1, keepdims=True)
                 - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True))
    return (dx.astype(x.dtype),)


_layer_norm_p.defvjp(_layer_norm_p_fwd, _layer_norm_p_bwd)


def layer_norm(x, *, eps: float = 1e-6, out_dtype=None, backend=None):
    """No-affine LayerNorm over the last dim of (B, S, D), fp32 stats."""
    out_dtype = out_dtype or x.dtype
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "reference"
    if backend == "reference" or x.ndim != 3:
        return _ln_reference(x, eps, out_dtype)
    return _layer_norm_p(x, float(eps), out_dtype,
                         backend == "pallas_interpret")


# ─────────────────────────── per-head RMS norm ───────────────────────────


def _rms_kernel(x_ref, w_ref, y_ref, *, eps, d, hpb):
    x = x_ref[0]  # (bs, hpb*d)
    w = w_ref[...].astype(jnp.float32)  # (1, hpb*d): weight tiled per subhead
    outs = []
    for i in range(hpb):
        xi = x[:, i * d:(i + 1) * d].astype(jnp.float32)
        m2 = jnp.mean(xi * xi, axis=1, keepdims=True)
        outs.append(xi * jax.lax.rsqrt(m2 + eps))
    y = jnp.concatenate(outs, axis=1) * w
    y_ref[0] = y.astype(y_ref.dtype)


def _rms_row_kernel(x_ref, w_ref, y_ref, *, eps):
    # whole-row RMS (num_heads == 1, d any 128-multiple): WAN's across-heads
    # qk-norm, where the "head" is the full H*d inner dim
    x = x_ref[0].astype(jnp.float32)  # (bs, d)
    w = w_ref[...].astype(jnp.float32)  # (1, d)
    m2 = jnp.mean(x * x, axis=1, keepdims=True)
    y_ref[0] = (x * jax.lax.rsqrt(m2 + eps) * w).astype(y_ref.dtype)


def _rms_reference(x, w, num_heads, eps, out_dtype):
    b, s, hd = x.shape
    d = hd // num_heads
    xf = x.reshape(b, s, num_heads, d).astype(jnp.float32)
    m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(m2 + eps) * w.astype(jnp.float32)
    return y.reshape(b, s, hd).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _rms_heads_p(x, w, num_heads, eps, out_dtype, interpret):
    b, s, hd = x.shape
    d = hd // num_heads
    if num_heads == 1 and hd % 128 == 0:
        # across-heads RMS (WAN qk-norm): the whole row is one head, so the
        # small-d subhead kernel below can't tile it — use a full-row block
        bs = _pick_rows(s, hd * 4)
        if not bs:
            return _rms_reference(x, w, num_heads, eps, out_dtype)
        return pl.pallas_call(
            functools.partial(_rms_row_kernel, eps=eps),
            grid=(b, s // bs),
            in_specs=[
                pl.BlockSpec((1, bs, hd), lambda b_, si: (b_, si, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd), lambda b_, si: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bs, hd), lambda b_, si: (b_, si, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, s, hd), out_dtype),
            interpret=interpret,
        )(x, w.astype(jnp.float32)[None])
    if d > 128 or 128 % d or hd % 128:
        return _rms_reference(x, w, num_heads, eps, out_dtype)
    hpb = 128 // d
    bs = _pick_rows(s, 128 * 4)
    if not bs:
        return _rms_reference(x, w, num_heads, eps, out_dtype)
    w_tiled = jnp.tile(w.astype(jnp.float32), hpb)[None]  # (1, 128)
    return pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps, d=d, hpb=hpb),
        grid=(b, hd // 128, s // bs),
        in_specs=[
            pl.BlockSpec((1, bs, 128), lambda b_, g_, si: (b_, si, g_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, g_, si: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, 128), lambda b_, g_, si: (b_, si, g_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), out_dtype),
        interpret=interpret,
    )(x, w_tiled)


def _rms_heads_p_fwd(x, w, num_heads, eps, out_dtype, interpret):
    return _rms_heads_p(x, w, num_heads, eps, out_dtype, interpret), (x, w)


def rms_bwd_closed(x, w, dy, num_heads, eps):
    """Closed-form per-head RMS backward (shared by the rms_norm_heads VJP
    and the fused attention backwards in ops.joint_attention, where the
    forward RMS is recomputed in-kernel and only dy is produced):
      r = rsqrt(mean(x^2)+eps); y = x * r * w
      dx = r * (w*dy) - x * r^3/d * sum(x * (w*dy));  dw = sum(dy * x * r)
    """
    b, s, hd = x.shape
    d = hd // num_heads
    xf = x.reshape(b, s, num_heads, d).astype(jnp.float32)
    g = dy.reshape(b, s, num_heads, d).astype(jnp.float32)
    wf = w.astype(jnp.float32)
    m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(m2 + eps)
    gw = g * wf
    dx = r * gw - xf * (r ** 3 / d) * jnp.sum(xf * gw, axis=-1, keepdims=True)
    dw = jnp.sum(g * xf * r, axis=(0, 1, 2))
    return dx.reshape(b, s, hd).astype(x.dtype), dw.astype(w.dtype)


def _rms_heads_p_bwd(num_heads, eps, out_dtype, interpret, res, dy):
    x, w = res
    return rms_bwd_closed(x, w, dy, num_heads, eps)


_rms_heads_p.defvjp(_rms_heads_p_fwd, _rms_heads_p_bwd)


def rms_norm_heads(x, w, *, num_heads: int, eps: float = 1e-6, out_dtype=None,
                   backend=None):
    """Per-head RMS norm of (B, S, H*D) with a shared (D,) weight — the SD3.5
    qk-norm in the transpose-free attention layout."""
    out_dtype = out_dtype or x.dtype
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "reference"
    if backend == "reference":
        return _rms_reference(x, w, num_heads, eps, out_dtype)
    return _rms_heads_p(x, w, num_heads, float(eps), out_dtype,
                        backend == "pallas_interpret")


# ──────────────────────── modulated layer norm ────────────────────────


def _lnmod_kernel(x_ref, sc_ref, sh_ref, y_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # (bs, D)
    sc = sc_ref[0].astype(jnp.float32)  # (1, D) — this batch row's scale
    sh = sh_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * (1.0 + sc) + sh
    y_ref[0] = y.astype(y_ref.dtype)


def _lnmod_reference(x, scale, shift, eps, out_dtype):
    y = _ln_reference(x, eps, jnp.float32)
    y = y * (1.0 + scale.astype(jnp.float32)[:, None]) \
        + shift.astype(jnp.float32)[:, None]
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln_mod_p(x, scale, shift, eps, out_dtype, interpret):
    b, s, d = x.shape
    bs = _pick_rows(s, d * 4)
    if not bs or (d % 128 and not interpret):
        return _lnmod_reference(x, scale, shift, eps, out_dtype)
    # (B, 1, D) layout: Mosaic requires the sublane (second-to-last) block dim
    # to be 8-divisible OR equal to the array dim — a (1, D) block over (B, D)
    # violates that; (1, 1, D) over (B, 1, D) satisfies it exactly
    return pl.pallas_call(
        functools.partial(_lnmod_kernel, eps=eps),
        grid=(b, s // bs),
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda b_, si: (b_, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b_, si: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b_, si: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda b_, si: (b_, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), out_dtype),
        interpret=interpret,
    )(x, scale[:, None, :], shift[:, None, :])


def _ln_mod_p_fwd(x, scale, shift, eps, out_dtype, interpret):
    return _ln_mod_p(x, scale, shift, eps, out_dtype, interpret), (x, scale)


def _ln_mod_p_bwd(eps, out_dtype, interpret, res, dy):
    # y = xhat * (1+sc) + sh  ->  d_xhat = dy*(1+sc); dsc = sum_s dy*xhat;
    # dsh = sum_s dy; dx via the no-affine LN closed form on d_xhat.
    x, scale = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = xc * rsig
    g = dyf * (1.0 + scale.astype(jnp.float32)[:, None])
    dx = rsig * (g - jnp.mean(g, axis=-1, keepdims=True)
                 - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True))
    dscale = jnp.sum(dyf * xhat, axis=1)
    dshift = jnp.sum(dyf, axis=1)
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dshift.astype(scale.dtype))


_ln_mod_p.defvjp(_ln_mod_p_fwd, _ln_mod_p_bwd)


def modulated_layer_norm(x, scale, shift, *, eps: float = 1e-6,
                         out_dtype=None, backend=None):
    """Fused ``ln(x) * (1 + scale[:, None]) + shift[:, None]`` — the AdaLN
    modulation applied inside the one-VMEM-pass LayerNorm kernel. Unfused,
    the elementwise modulation is a separate full HBM read+write of the
    (B, S, D) activation after the opaque Pallas LN (XLA cannot fuse into a
    pallas_call); at ~4 modulated norms per MMDiT block this pass was ~5% of
    the CFG forward. x: (B, S, D); scale/shift: (B, D)."""
    out_dtype = out_dtype or x.dtype
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "reference"
    if backend == "reference" or x.ndim != 3:
        return _lnmod_reference(x, scale, shift, eps, out_dtype)
    return _ln_mod_p(x, scale, shift, float(eps), out_dtype,
                     backend == "pallas_interpret")
