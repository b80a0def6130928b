"""On-device image preprocessing for neural reward scorers — PIL-faithful.

The reference round-trips decoded images through uint8 numpy + PIL + torchvision
transforms per scorer (e.g. rewards.py:567-570 PickScore CLIPProcessor, :170-173
DINO 518-bicubic+ImageNet-normalise). Scorer values feed advantages, so the
resize must match PIL's, not merely be "bicubic": PIL antialiases on downscale
(filter support scaled by the scale factor), quantises its filter weights to
int16 fixed point (PRECISION_BITS=22 for 8-bit images), and rounds each
separable pass back to uint8 (round-half-up, horizontal pass first).

TPU-first we express that exact pipeline as two small matmuls (MXU-friendly,
no gathers) with trace-time PIL weight matrices plus per-pass uint8 snapping.
Measured parity vs transformers' CLIPImageProcessor (PIL inside): ≤1 uint8
level everywhere, bit-equal on >99.99% of pixels (float32 accumulation-order
knife edges account for the rest) — see tests/test_preprocess_parity.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)

_PRECISION_BITS = 22  # PIL normalize_coeffs_8bpc: 32 - 8 - 2


def _bicubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic, a=-0.5 (PIL's BICUBIC filter)."""
    x = np.abs(x)
    return np.where(
        x < 1, ((a + 2) * x - (a + 3)) * x * x + 1,
        np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0))


@functools.lru_cache(maxsize=64)
def pil_resample_weights(in_size: int, out_size: int,
                         fixed_point: bool = True) -> np.ndarray:
    """(out_size, in_size) PIL ImagingResampleHorizontal coefficient matrix.

    Reproduces PIL precompute_coeffs: per output pixel, center = (i+0.5)*scale,
    support = 2*max(scale,1) (antialias on downscale), normalised bicubic taps;
    ``fixed_point`` additionally snaps weights to the int16 grid PIL uses for
    8-bit images.
    """
    scale = in_size / out_size
    fs = max(scale, 1.0)
    support = 2.0 * fs
    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax)
        w = _bicubic_kernel((xs - center + 0.5) / fs)
        w = w / w.sum()
        if fixed_point:
            w = np.round(w * (1 << _PRECISION_BITS)) / (1 << _PRECISION_BITS)
        W[i, xmin:xmax] = w
    return W.astype(np.float32)


def to_unit(images):
    """[-1, 1] -> [0, 1], clipped (reference tensor_to_pil_list,
    train_sd3_fast_pickscore.py:133-148)."""
    return jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)


def quantize_uint8(images01):
    """Snap to the uint8 grid the reference's PIL round-trip imposes.

    PIL's clip8((ss + half) >> bits) is round-half-up, not round-half-even."""
    return jnp.clip(jnp.floor(images01 * 255.0 + 0.5), 0.0, 255.0) / 255.0


def resize_bicubic(images, size: int, *, pil_rounding: bool = True):
    """(B, 3, H, W) in [0,1] -> (B, 3, size, size), PIL-BICUBIC-faithful.

    Separable matmuls over trace-time PIL weight matrices; ``pil_rounding``
    snaps each pass to uint8 exactly as PIL's 8-bit path does (horizontal
    first). fp32 islands: the negative-lobe sums need the full mantissa."""
    B, C, H, W = images.shape
    ww = jnp.asarray(pil_resample_weights(W, size, pil_rounding))
    wh = jnp.asarray(pil_resample_weights(H, size, pil_rounding))
    x = images.astype(jnp.float32)
    h = jnp.einsum("bchW,wW->bchw", x, ww, precision="highest")
    if pil_rounding:
        h = quantize_uint8(h)
    v = jnp.einsum("bcHw,hH->bchw", h, wh, precision="highest")
    if pil_rounding:
        v = quantize_uint8(v)
    return jnp.clip(v, 0.0, 1.0)


def preprocess(images, size: int, mean, std, *, from_range=(-1.0, 1.0),
               quantize: bool = True):
    """Full scorer pipeline: to [0,1], uint8 snap (the PNG/PIL grid), PIL
    resize (with per-pass rounding), normalise — the exact value chain of the
    reference's tensor->PIL->CLIPProcessor/torchvision path."""
    if from_range == (-1.0, 1.0):
        x = to_unit(images)
    else:
        x = jnp.clip(images, 0.0, 1.0)
    if quantize:
        x = quantize_uint8(x)
    x = resize_bicubic(x, size, pil_rounding=quantize)
    mean = jnp.asarray(mean).reshape(1, 3, 1, 1)
    std = jnp.asarray(std).reshape(1, 3, 1, 1)
    return (x - mean) / std
