"""Host-side reward scorers: JPEG compressibility and OCR (remote HTTP judges
live in rewards.remote with the reference pickle/sglang protocols).

These are CPU/IO-bound and run asynchronously off the TPU step (the reference
dispatches them through a ThreadPoolExecutor, train_sd3_fast_pickscore.py:668,
816-818; our trainer keeps that overlap pattern).
"""

from __future__ import annotations

import io
import logging
from typing import List

import numpy as np

from adv_grpo_tpu.native.lib import levenshtein, images_to_uint8


def jpeg_incompressibility(images_u8: np.ndarray) -> np.ndarray:
    """JPEG(quality 95) byte size / 1000 per image (reference rewards.py:13-26).

    images_u8: (N, H, W, 3) uint8, or (N, T, H, W, 3) video clips (scored
    per frame, mean per clip — the video_ocr frame-mean convention).
    """
    from PIL import Image

    if images_u8.ndim == 5:
        return np.asarray([np.mean(jpeg_incompressibility(clip))
                           for clip in images_u8], dtype=np.float64)
    sizes = []
    for arr in images_u8:
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        sizes.append(buf.tell() / 1000)
    return np.asarray(sizes, dtype=np.float64)


def jpeg_compressibility(images_u8: np.ndarray) -> np.ndarray:
    """-size/500 (reference rewards.py:28-35)."""
    return -jpeg_incompressibility(images_u8) / 500.0


def ocr_reward_from_text(recognized: str, target: str) -> float:
    """Edit-distance reward for one (recognized, target) pair.

    Normalisation per reference adv_grpo/ocr.py:45-61: spaces stripped,
    lowercase, substring -> distance 0, distance capped at len(target),
    reward = 1 - dist/len(target).
    """
    recognized = recognized.replace(" ", "").lower()
    target = target.replace(" ", "").lower()
    if not target:
        return 0.0
    if target in recognized:
        dist = 0
    else:
        dist = levenshtein(recognized, target)
    dist = min(dist, len(target))
    return 1.0 - dist / len(target)


class OcrScorer:
    """OCR reward: engine-pluggable (PaddleOCR when importable — reference
    adv_grpo/ocr.py:14-19 — else an injected callable for tests/other engines).

    Target text = the quoted span of the prompt: ``prompt.split('"')[1]``
    (reference :31)."""

    def __init__(self, engine=None):
        if engine is None:
            try:
                from paddleocr import PaddleOCR  # pragma: no cover - env-gated

                ocr = PaddleOCR(use_angle_cls=False, lang="en", use_gpu=False,
                                show_log=False)

                def engine(img_u8):
                    result = ocr.ocr(img_u8, cls=False)
                    if not result or not result[0]:
                        return ""
                    return "".join(r[1][0] if r[1][1] > 0 else "" for r in result[0])

            except ImportError:
                engine = None
        self.engine = engine

    def __call__(self, images, prompts: List[str]) -> np.ndarray:
        if self.engine is None:
            raise RuntimeError(
                "No OCR engine available: install paddleocr or inject engine="
            )
        # quoted-span target (reference ocr.py:31); a prompt with no quoted
        # span gets the max penalty instead of crashing the reward future
        def target_of(p):
            parts = p.split('"')
            return parts[1] if len(parts) >= 2 else None

        targets = [target_of(p) for p in prompts]
        n_missing = sum(t is None for t in targets)
        if n_missing and not getattr(self, "_warned_unquoted", False):
            self._warned_unquoted = True
            logging.getLogger(__name__).warning(
                "OCR reward: %d/%d prompts have no quoted target span — "
                "they score 0.0 (max penalty). If this persists, the "
                "prompt_fn/dataset pairing is likely misconfigured.",
                n_missing, len(targets))
        if images.ndim == 4 and images.shape[1] == 3:  # float CHW
            images = images_to_uint8(np.asarray(images, np.float32))
        rewards = []
        for img, target in zip(images, targets):
            if target is None:
                rewards.append(0.0)  # max penalty: no target to match
                continue
            try:
                text = self.engine(img)
                rewards.append(ocr_reward_from_text(text, target))
            except Exception:
                rewards.append(1.0 - 1.0)  # max penalty: dist == len
        return np.asarray(rewards, dtype=np.float64)


class VideoOcrScorer(OcrScorer):
    """Video variant: every-4th-frame sampling, mean reward per clip
    (reference adv_grpo/ocr.py:67-127)."""

    def __call__(self, videos, prompts: List[str]) -> np.ndarray:
        out = []
        for vid, prompt in zip(videos, prompts):
            frames = vid[::4]
            r = super().__call__(np.asarray(frames), [prompt] * len(frames))
            out.append(float(np.mean(r)))
        return np.asarray(out, dtype=np.float64)


