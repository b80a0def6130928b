"""Metrics / logging / profiling.

The reference logs to wandb only (main process, SURVEY.md §5 observability).
Here: a MetricLogger that always appends JSONL to ``{save_dir}/metrics.jsonl``
(greppable, survives offline runs), mirrors to wandb when importable+enabled,
and prints a compact line. Plus jax.profiler trace helpers and step timers —
first-class, where the reference had only tqdm.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def _to_scalar(v):
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    arr = np.asarray(v)
    if arr.size == 1:
        return float(arr)
    return arr.tolist()


class MetricLogger:
    def __init__(self, save_dir: str = "", wandb_init: bool = False,
                 project: str = "adv_grpo_tpu", run_name: str = "",
                 is_main: bool = True):
        self.is_main = is_main
        self.path = None
        self._wandb = None
        if not is_main:
            return
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self.path = os.path.join(save_dir, "metrics.jsonl")
        if wandb_init:
            try:
                import wandb

                wandb.init(project=project, name=run_name or None)
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        if not self.is_main:
            return
        record = {k: _to_scalar(v) for k, v in metrics.items()}
        if step is not None:
            record["step"] = int(step)
        record["time"] = time.time()
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items()
                             if isinstance(v, (int, float))}, step=step)

    def log_image_grid(self, name: str, images_u8, captions=None,
                       step: Optional[int] = None, save_dir: str = ""):
        """Image-grid observability: a horizontal JPEG strip on disk and, when
        live, individual captioned wandb.Images (the reference's eval/train
        grids, train_sd3_fast_pickscore.py:352-380, :869-924)."""
        if not self.is_main or len(images_u8) == 0:
            return None
        import numpy as np

        imgs = np.asarray(images_u8)[:8]
        path = None
        out_dir = save_dir or (os.path.dirname(self.path) if self.path else "")
        if out_dir:
            try:
                from PIL import Image

                n, h, w, _ = imgs.shape
                grid = imgs.transpose(1, 0, 2, 3).reshape(h, n * w, 3)
                os.makedirs(out_dir, exist_ok=True)
                path = os.path.join(out_dir, f"{name}_{step or 0:05d}.jpg")
                Image.fromarray(grid).save(path, quality=90)
            except Exception:
                path = None  # grid saving is best-effort observability
        if self._wandb is not None:
            try:
                wb = [self._wandb.Image(
                    img, caption=None if captions is None else str(captions[i]))
                    for i, img in enumerate(imgs)]
                self._wandb.log({name: wb}, step=step)
            except Exception:
                pass
        return path


class StepTimer:
    """Per-phase wall-clock accumulation: timer('rollout'), timer('reward')..."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[phase] = self.totals.get(phase, 0.0) + dt
            self.counts[phase] = self.counts.get(phase, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {f"time/{k}": self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def maybe_profile(profile_dir: str, step: int, first: int = 2, last: int = 4):
    """Capture a jax.profiler trace for steps in [first, last)."""
    if profile_dir and first <= step < last:
        import jax

        jax.profiler.start_trace(profile_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


def finite_check(name: str, tree, enabled: bool = True):
    """NaN/Inf guard on logprobs/losses — the TPU answer to the reference's
    torch.autograd.set_detect_anomaly(True) (train_sd3_fast_pickscore.py:42)."""
    if not enabled:
        return
    import jax

    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
