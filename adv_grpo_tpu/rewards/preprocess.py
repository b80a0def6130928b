"""On-device image preprocessing for neural reward scorers.

The reference round-trips decoded images through uint8 numpy + PIL + torchvision
transforms per scorer (e.g. rewards.py:567-570 PickScore processor, :170-173
DINO 518-bicubic+ImageNet-normalise). TPU-first we keep images on device as
float (B, 3, H, W) in [-1, 1] straight from the VAE and express each scorer's
preprocessing as jitted resize+normalise. An optional uint8 quantisation stage
reproduces the reference's value grid (images pass through uint8 PNG/PIL in the
reference pipeline) so scorer inputs match to ~1/255.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


def to_unit(images):
    """[-1, 1] -> [0, 1], clipped (reference tensor_to_pil_list,
    train_sd3_fast_pickscore.py:133-148)."""
    return jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)


def quantize_uint8(images01):
    """Snap to the uint8 grid the reference's PIL round-trip imposes."""
    return jnp.round(images01 * 255.0) / 255.0


def resize_bicubic(images, size: int):
    """(B, 3, H, W) -> (B, 3, size, size), bicubic (PIL/torchvision analogue)."""
    B, C, H, W = images.shape
    return jax.image.resize(images, (B, C, size, size), method="cubic")


def preprocess(images, size: int, mean, std, *, from_range=(-1.0, 1.0),
               quantize: bool = True):
    """Full scorer pipeline: to [0,1], optional uint8 snap, resize, normalise."""
    if from_range == (-1.0, 1.0):
        x = to_unit(images)
    else:
        x = jnp.clip(images, 0.0, 1.0)
    if quantize:
        x = quantize_uint8(x)
    x = resize_bicubic(x, size)
    mean = jnp.asarray(mean).reshape(1, 3, 1, 1)
    std = jnp.asarray(std).reshape(1, 3, 1, 1)
    return (x - mean) / std
