"""Tune the learning-curve regression (tests/test_learning_curve.py): sweep
learning rates over the fixed-seed pinned-noise tiny SD3/Flux brightness runs
and print each curve (optionally with negated advantages), so the committed
test uses an lr with a clearly discriminative rise and a falling control.

Usage: python scripts/probe_learning_curve.py [sd3|flux] [epochs] [lr,lr,...]
           [--negate]
"""

from __future__ import annotations

import _path  # noqa: F401

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

# sitecustomize imports jax (axon backend) at interpreter startup; force the
# 8-device virtual CPU mesh the tests use (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    from tests.test_learning_curve import run_family

    ap = argparse.ArgumentParser()
    ap.add_argument("family", nargs="?", default="sd3")
    ap.add_argument("epochs", nargs="?", type=int, default=8)
    ap.add_argument("lrs", nargs="?", default="2e-3,5e-3,1e-2,2e-2")
    ap.add_argument("--negate", action="store_true")
    a = ap.parse_args()
    for lr in [float(x) for x in a.lrs.split(",")]:
        curve = run_family(a.family, lr=lr, epochs=a.epochs, negate=a.negate)
        early, late = float(np.mean(curve[:2])), float(np.mean(curve[-2:]))
        print(json.dumps({"family": a.family, "lr": lr, "negate": a.negate,
                          "early": round(early, 4), "late": round(late, 4),
                          "rise": round(late - early, 4),
                          "curve": [round(float(c), 4) for c in curve]}),
              flush=True)


if __name__ == "__main__":
    main()
