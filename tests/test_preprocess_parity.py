"""Scorer-preprocessing parity vs the reference's PIL/CLIPProcessor path.

The reference feeds scorers through uint8 PIL + CLIPProcessor / torchvision
bicubic (rewards.py:567-570, :170-173). Our on-device pipeline must reproduce
that value chain: these tests assert ≤1 uint8 level everywhere and near-total
bit-equality against transformers' CLIPImageProcessor (PIL inside) and against
direct PIL resize for the DINO 518 transform (VERDICT r2 weak #4).
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from adv_grpo_tpu.rewards import preprocess as pp


def _images():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (64, 64, 3))
    smooth = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
        (512, 512), Image.BILINEAR)).astype(np.uint8)
    noise = rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
    return [smooth, noise]


def _levels_off(got, want, std):
    return np.abs(got - want) * np.asarray(std).reshape(3, 1, 1) * 255.0


class TestCLIPProcessorParity:
    def test_downscale_512_to_224(self):
        from transformers import CLIPImageProcessor

        proc = CLIPImageProcessor(do_center_crop=True, crop_size=224,
                                  size={"shortest_edge": 224})
        for u8 in _images():
            want = proc(images=Image.fromarray(u8),
                        return_tensors="np")["pixel_values"][0]
            x = jnp.asarray(u8.astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
            got = np.asarray(pp.preprocess(x, 224, pp.CLIP_MEAN, pp.CLIP_STD,
                                           from_range=(0.0, 1.0)))[0]
            lv = _levels_off(got, want, pp.CLIP_STD)
            assert lv.max() <= 1.01, lv.max()
            # bit-equal on ~all pixels; float32 accumulation knife-edges only
            assert (lv > 0.5).mean() < 1e-4, (lv > 0.5).mean()

    def test_from_minus_one_one_range(self):
        """VAE output range: [-1,1] -> same grid as uint8 PIL round-trip."""
        from transformers import CLIPImageProcessor

        u8 = _images()[0]
        proc = CLIPImageProcessor(do_center_crop=True, crop_size=224,
                                  size={"shortest_edge": 224})
        want = proc(images=Image.fromarray(u8),
                    return_tensors="np")["pixel_values"][0]
        x = jnp.asarray(u8.astype(np.float32).transpose(2, 0, 1)[None]
                        / 255.0 * 2.0 - 1.0)
        got = np.asarray(pp.preprocess(x, 224, pp.CLIP_MEAN, pp.CLIP_STD))[0]
        assert _levels_off(got, want, pp.CLIP_STD).max() <= 1.01


class TestDINO518Parity:
    def test_upscale_512_to_518(self):
        """DINO transform (rewards.py:170-173): 518 bicubic UPSCALE (support 2,
        no antialias) + ImageNet normalise, against PIL directly."""
        for u8 in _images():
            ref = np.asarray(Image.fromarray(u8).resize(
                (518, 518), Image.BICUBIC)).astype(np.float32) / 255.0
            want = ((ref.transpose(2, 0, 1)
                     - np.asarray(pp.IMAGENET_MEAN).reshape(3, 1, 1))
                    / np.asarray(pp.IMAGENET_STD).reshape(3, 1, 1))
            x = jnp.asarray(u8.astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
            got = np.asarray(pp.preprocess(x, 518, pp.IMAGENET_MEAN,
                                           pp.IMAGENET_STD,
                                           from_range=(0.0, 1.0)))[0]
            lv = _levels_off(got, want, pp.IMAGENET_STD)
            assert lv.max() <= 1.01, lv.max()
            # upscale weights hit exact-half ties more often; still <0.05%
            assert (lv > 0.5).mean() < 5e-4


class TestWeights:
    def test_rows_normalised(self):
        for in_s, out_s in [(512, 224), (512, 518), (64, 224), (224, 224)]:
            w = pp.pil_resample_weights(in_s, out_s)
            assert w.shape == (out_s, in_s)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=2e-5)

    def test_identity_resize(self):
        """Same-size resize through the PIL kernel is (near-)identity."""
        rng = np.random.default_rng(1)
        u8 = rng.integers(0, 256, (1, 3, 32, 32))
        x = jnp.asarray(u8.astype(np.float32) / 255.0)
        out = np.asarray(pp.resize_bicubic(x, 32))
        np.testing.assert_allclose(out * 255.0, u8.astype(np.float64),
                                   atol=0.51)

    def test_round_half_up(self):
        """PIL's clip8 is round-half-up, not banker's rounding."""
        x = jnp.asarray([[0.5 / 255.0, 1.5 / 255.0, 2.5 / 255.0]])
        got = np.asarray(pp.quantize_uint8(x)) * 255.0
        np.testing.assert_array_equal(got, [[1.0, 2.0, 3.0]])
