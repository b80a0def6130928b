"""bench.py smoke flow: the round-end artifact must always emit its JSON line.

Runs the real bench main() in a subprocess with ADV_GRPO_BENCH_SMOKE=1
(toy-sized models, same control flow: phase guards, fallback rebuilds, JSON
emission) and asserts the contract the driver consumes — one JSON line with
the headline keys and no phase errors.
"""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_bench_smoke_emits_contract_json():
    env = dict(os.environ)
    env["ADV_GRPO_BENCH_SMOKE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU-plugin stall on CPU
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + env.get("PYTHONPATH", "").split(os.pathsep))
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], env=env, text=True,
        capture_output=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    payload = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "mfu",
                "train_microstep_sec", "reward_evals_per_sec_resident",
                "rollout_shared_prefix_img_s", "epoch_interleaved_sec",
                "wan_mfu", "flux_midgeom_mfu"):
        assert key in payload, key
    assert payload["metric"] == "rollout_images_per_sec_per_chip"
    assert payload["value"] and payload["value"] > 0
    # every phase must have succeeded on the smoke path
    assert "errors" not in payload, payload.get("errors")
    # incremental emission (VERDICT r4 weak #1): the partial sidecar must
    # exist and already contain the completed phases' values
    partial = json.loads((REPO / "BENCH_PARTIAL.json").read_text())
    assert partial["value"] == payload["value"]
    assert "bench_elapsed_sec" in partial
