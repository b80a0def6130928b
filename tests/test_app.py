"""Gradio demo app parity (reference app.py:27-44,74-131): hub-layout adapter
resolution + the DINO-vs-PickScore adapter picker, driven through the real
``cli.app.main`` with a faked gradio module (the library is not installed
here, exactly like the reference's HF-Spaces-only deps)."""

import sys
import types

import numpy as np
import pytest


@pytest.fixture()
def fake_gradio(monkeypatch):
    captured = {}
    fake = types.ModuleType("gradio")

    class Interface:
        def __init__(self, fn=None, inputs=None, outputs=None, title=None):
            captured["fn"] = fn
            captured["inputs"] = inputs

        def launch(self, server_port=None):
            captured["port"] = server_port

    fake.Interface = Interface
    for name in ("Textbox", "Dropdown", "Slider", "Number", "Image"):
        setattr(fake, name,
                lambda *a, __n=name, **k: types.SimpleNamespace(
                    kind=__n, args=a, kwargs=k))
    monkeypatch.setitem(sys.modules, "gradio", fake)
    return captured


def _make_adapter(hub_dir, name, flat, rank, alpha, scale):
    from adv_grpo_tpu.models.peft_lora import export_peft_lora

    mod = {k: (np.full_like(np.asarray(v), scale)
               if k.endswith("lora_b") else np.asarray(v))
           for k, v in flat.items()}
    export_peft_lora(str(hub_dir / name), mod, rank=rank, alpha=alpha)


class TestAppAdapterPicker:
    def test_local_hub_layout_and_picker(self, tmp_path, fake_gradio):
        from adv_grpo_tpu.cli import app
        from adv_grpo_tpu.cli.common import build_pipeline, resolve_config
        from adv_grpo_tpu.models.lora import lora_params

        cfg = resolve_config("smoke_sd3_fast")
        pipe = build_pipeline(cfg, latent_hw=8)
        flat = lora_params(pipe.transformer_params["params"])
        rank, alpha = int(cfg.train.lora_rank), float(cfg.train.lora_alpha)
        hub = tmp_path / "hub"
        # two distinguishable adapters, the published-repo subfolder layout
        _make_adapter(hub, "DINO", flat, rank, alpha, 0.05)
        _make_adapter(hub, "PickScore", flat, rank, alpha, -0.05)

        app.main(["--config", "smoke_sd3_fast", "--hub_repo", str(hub),
                  "--latent_hw", "8"])
        assert fake_gradio["port"] == 7860
        picker = next(i for i in fake_gradio["inputs"]
                      if getattr(i, "kind", "") == "Dropdown")
        assert picker.kwargs["choices"] == ["DINO", "PickScore",
                                            "base (untuned)"]

        gen = fake_gradio["fn"]
        img_dino = gen("a cat", "DINO", 2, 1.0, 0)
        img_pick = gen("a cat", "PickScore", 2, 1.0, 0)
        img_base = gen("a cat", "base (untuned)", 2, 1.0, 0)
        assert img_base.dtype == np.uint8 and img_base.shape[-1] == 3
        # the picker must actually swap the merged weights
        assert not np.array_equal(img_dino, img_base)
        assert not np.array_equal(img_pick, img_dino)
        # deterministic per (adapter, seed)
        np.testing.assert_array_equal(gen("a cat", "DINO", 2, 1.0, 0),
                                      img_dino)

    def test_remote_repo_without_hub_lib_fails_loudly(self, tmp_path,
                                                      fake_gradio,
                                                      monkeypatch):
        from adv_grpo_tpu.cli import app

        monkeypatch.setitem(sys.modules, "huggingface_hub", None)
        with pytest.raises((SystemExit, ImportError)):
            app.resolve_adapter_dir("benzweijia/Adv-GRPO", "DINO",
                                    cache_root=str(tmp_path))
