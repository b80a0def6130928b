"""The phase-2/3 family demo CLIs are drivable end-to-end.

Reference ships Flux/Kontext/WAN as library samplers plus demo scripts
(scripts/demo/flux_sde_demo.py, flux_kontext_sde_demo.py,
wan_pipeline_with_logprob.py); these tests run our equivalents as real
subprocesses on tiny random-init models and assert they produce outputs.
"""

import pytest

pytestmark = pytest.mark.slow

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(script, *args, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("FLUX_DIR", None)
    env.pop("WAN_DIR", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + env.get("PYTHONPATH", "").split(os.pathsep))
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "demo" / script),
         "--out_dir", str(tmp_path), *args],
        env=env, text=True, capture_output=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_presets_resolve():
    from adv_grpo_tpu.cli.common import resolve_config

    flux = resolve_config("flux_smoke")
    assert flux.model_family == "flux" and flux.smoke_test
    wan = resolve_config("wan_smoke")
    # 9 = 4k+1 pixel frames (WAN causal-VAE temporal stride contract,
    # config/grpo.py wan_smoke)
    assert wan.model_family == "wan" and wan.sample.num_frames == 9


def test_flux_demo_sweep(tmp_path):
    stdout = _run("flux_sde_demo.py", "--noise_levels", "0.0,0.7",
                  tmp_path=tmp_path)
    assert (tmp_path / "noise_0.0.png").exists()
    assert (tmp_path / "noise_0.7.png").exists()
    assert "mean logprob" in stdout


def test_flux_demo_kontext(tmp_path):
    _run("flux_sde_demo.py", "--kontext", "--noise_levels", "0.7",
         tmp_path=tmp_path)
    assert (tmp_path / "kontext_noise_0.7.png").exists()


def test_wan_demo_sde_and_deterministic(tmp_path):
    stdout = _run("wan_sde_demo.py", "--kl_reward", "0.5", tmp_path=tmp_path)
    assert (tmp_path / "wan_sde_kl0.5.png").exists()
    assert "mean KL" in stdout
    _run("wan_sde_demo.py", "--deterministic", tmp_path=tmp_path)
    assert (tmp_path / "wan_det.png").exists()
