"""peft LoRA adapter interchange tests against the REAL peft library.

The reference publishes trained adapters as peft directories
(app.py:27-44 + save_pretrained at train_sd3_fast_pickscore.py:389-398).
Gold test: wrap the torch SD3 mirror with peft using the reference's exact
LoraConfig (train_sd3_fast_pickscore.py:490-505), randomise the adapter,
save_pretrained, import with our converter, and assert the Flax forward with
merged LoRA matches the peft forward. Plus the reverse: export our adapter and
load it back through ``PeftModel.from_pretrained``.
"""

import copy
import dataclasses
import json
import os

import numpy as np
import pytest
import torch

from adv_grpo_tpu.models import convert, peft_lora
from adv_grpo_tpu.models.lora import lora_params, merge_lora_params
from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
from adv_grpo_tpu.train import checkpoint as ckpt_lib
from tests.mirrors.sd3_torch import SD3TransformerMirror
from tests.test_mirror_parity import randomize, to_numpy_sd

# the reference's target list verbatim (train_sd3_fast_pickscore.py:490-499)
TARGET_MODULES = [
    "attn.add_k_proj", "attn.add_q_proj", "attn.add_v_proj",
    "attn.to_add_out", "attn.to_k", "attn.to_out.0", "attn.to_q", "attn.to_v",
]
R, ALPHA = 4, 8.0


def _randomize_lora(peft_model, seed=7):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for n, p in peft_model.named_parameters():
            if "lora_" in n:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)


@pytest.fixture(scope="module")
def peft_setup(tmp_path_factory):
    from peft import LoraConfig, get_peft_model

    cfg = MMDiTConfig.tiny(lora_rank=0)
    import jax.numpy as jnp
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    mirror = randomize(SD3TransformerMirror(cfg), seed=0).eval()
    base_sd = to_numpy_sd(mirror)  # BEFORE peft rewrites module names

    lc = LoraConfig(r=R, lora_alpha=ALPHA, init_lora_weights="gaussian",
                    target_modules=TARGET_MODULES)
    pm = get_peft_model(copy.deepcopy(mirror), lc)
    _randomize_lora(pm)
    adapter_dir = str(tmp_path_factory.mktemp("peft_adapter"))
    pm.save_pretrained(adapter_dir)
    # save_pretrained nests under the adapter name when not "default"-rooted
    if not os.path.exists(os.path.join(adapter_dir, "adapter_model.safetensors")):
        adapter_dir = os.path.join(adapter_dir, "default")
    return cfg, mirror, base_sd, pm, adapter_dir


def _flax_with_adapter(cfg, base_sd, flat):
    base = convert.detect_pos_embed_base(
        base_sd, cfg.hidden_dim, cfg.pos_embed_max_size, cfg.sample_size,
        cfg.patch_size)
    cfg_l = dataclasses.replace(cfg, pos_embed_base_size=base,
                                lora_rank=R, lora_alpha=ALPHA)
    params = convert.convert_mmdit(base_sd, cfg_l)
    params = convert._add_lora_leaves(params, cfg_l)
    return cfg_l, merge_lora_params(params, flat)


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 1, (2, cfg.in_channels, 8, 8)).astype(np.float32),
            np.asarray([41.0, 700.0], np.float32),
            rng.normal(0, 1, (2, 6, cfg.joint_attention_dim)).astype(np.float32),
            rng.normal(0, 1, (2, cfg.pooled_projection_dim)).astype(np.float32))


class TestImport:
    def test_forward_parity_vs_peft(self, peft_setup):
        import jax.numpy as jnp

        cfg, _, base_sd, pm, adapter_dir = peft_setup
        flat, acfg = peft_lora.import_peft_lora(adapter_dir)
        assert acfg["r"] == R and float(acfg["lora_alpha"]) == ALPHA
        cfg_l, params = _flax_with_adapter(cfg, base_sd, flat)
        lat, t, ctx, pooled = _inputs(cfg)
        with torch.no_grad():
            want = pm(torch.tensor(lat), torch.tensor(t), torch.tensor(ctx),
                      torch.tensor(pooled)).numpy()
        got = np.asarray(MMDiT(cfg_l).apply(
            {"params": params}, jnp.asarray(lat), jnp.asarray(t),
            jnp.asarray(ctx), jnp.asarray(pooled)))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)

    def test_expected_leaf_naming(self, peft_setup):
        cfg, *_, adapter_dir = peft_setup
        flat, _ = peft_lora.import_peft_lora(adapter_dir)
        # 8 projections x 2 leaves per block with a context stream; the final
        # context_pre_only block has no add-projections/to_add_out... the tiny
        # config's layer count decides, so just check structure invariants
        assert all(k.startswith("block_") for k in flat)
        a = {k for k in flat if k.endswith("lora_a")}
        b = {k for k in flat if k.endswith("lora_b")}
        assert len(a) == len(b) and len(flat) == len(a) + len(b)
        for k in a:
            assert flat[k].shape == (cfg.hidden_dim, R)
        for k in b:
            assert flat[k].shape == (R, cfg.hidden_dim)
        # ModuleList index flattened
        assert any("/to_out/" in k for k in flat)
        assert not any(".0" in k for k in flat)

    def test_default_infix_variant(self, tmp_path, peft_setup):
        """Older peft exports keep '.default.' in keys — same mapping."""
        *_, adapter_dir = peft_setup
        from safetensors.numpy import save_file

        sd = convert.load_torch_state_dict(adapter_dir)
        renamed = {k.replace(".lora_A.weight", ".lora_A.default.weight")
                    .replace(".lora_B.weight", ".lora_B.default.weight"): v
                   for k, v in sd.items()}
        d = str(tmp_path / "variant")
        os.makedirs(d)
        save_file(renamed, os.path.join(d, "adapter_model.safetensors"))
        with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
            cfgj = f.read()
        with open(os.path.join(d, "adapter_config.json"), "w") as f:
            f.write(cfgj)
        flat1, _ = peft_lora.import_peft_lora(adapter_dir)
        flat2, _ = peft_lora.import_peft_lora(d)
        assert set(flat1) == set(flat2)
        for k in flat1:
            np.testing.assert_array_equal(flat1[k], flat2[k])

    def test_rank_alpha_validation(self, peft_setup):
        *_, adapter_dir = peft_setup
        _, acfg = peft_lora.import_peft_lora(adapter_dir)
        with pytest.raises(ValueError, match="lora_rank"):
            peft_lora.validate_against_model(acfg, lora_rank=32)
        with pytest.raises(ValueError, match="lora_alpha"):
            peft_lora.validate_against_model(acfg, lora_rank=R, lora_alpha=64.0)
        peft_lora.validate_against_model(acfg, lora_rank=R, lora_alpha=ALPHA)

    def test_load_lora_only_dispatch(self, peft_setup):
        """ckpt_lib.load_lora_only auto-detects a peft directory, so
        cli.infer/app/eval can run published reference adapters."""
        *_, adapter_dir = peft_setup
        flat = ckpt_lib.load_lora_only(adapter_dir, expect_rank=R,
                                       expect_alpha=ALPHA)
        direct, _ = peft_lora.import_peft_lora(adapter_dir)
        assert set(flat) == set(direct)
        with pytest.raises(ValueError):
            ckpt_lib.load_lora_only(adapter_dir, expect_rank=32)


class TestExport:
    def test_roundtrip_through_real_peft(self, tmp_path, peft_setup):
        """our leaves -> export -> PeftModel.from_pretrained -> same forward."""
        import jax.numpy as jnp
        from peft import PeftModel

        cfg, mirror, base_sd, _, adapter_dir = peft_setup
        flat, _ = peft_lora.import_peft_lora(adapter_dir)
        out_dir = str(tmp_path / "exported")
        peft_lora.export_peft_lora(out_dir, flat, rank=R, alpha=ALPHA)
        with open(os.path.join(out_dir, "adapter_config.json")) as f:
            cfgj = json.load(f)
        assert cfgj["r"] == R and cfgj["lora_alpha"] == ALPHA
        assert sorted(cfgj["target_modules"]) == sorted(TARGET_MODULES)

        pm2 = PeftModel.from_pretrained(copy.deepcopy(mirror), out_dir)
        cfg_l, params = _flax_with_adapter(cfg, base_sd, flat)
        lat, t, ctx, pooled = _inputs(cfg, seed=5)
        with torch.no_grad():
            want = pm2(torch.tensor(lat), torch.tensor(t), torch.tensor(ctx),
                       torch.tensor(pooled)).numpy()
        got = np.asarray(MMDiT(cfg_l).apply(
            {"params": params}, jnp.asarray(lat), jnp.asarray(t),
            jnp.asarray(ctx), jnp.asarray(pooled)))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)

    def test_export_import_identity(self, tmp_path, peft_setup):
        *_, adapter_dir = peft_setup
        flat, _ = peft_lora.import_peft_lora(adapter_dir)
        out_dir = str(tmp_path / "rt")
        peft_lora.export_peft_lora(out_dir, flat, rank=R, alpha=ALPHA)
        back, _ = peft_lora.import_peft_lora(out_dir)
        assert set(back) == set(flat)
        for k in flat:
            np.testing.assert_array_equal(back[k], flat[k])
