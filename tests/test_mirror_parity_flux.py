"""Flux converter activation-parity vs a torch mirror of the diffusers graph
(VERDICT r2 #1 extension — same technique as tests/test_mirror_parity.py).

Timestep convention: both sides take the 0..1000 (sigma*1000) scale — the
diffusers pipeline passes sigma and FluxTransformer2DModel multiplies by 1000
before the sinusoid (flux_pipeline_with_logprob.py:153)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

import jax.numpy as jnp

from adv_grpo_tpu.models import convert
from adv_grpo_tpu.models.flux import (
    FluxConfig, FluxTransformer, make_latent_ids)
from tests.test_mirror_parity import randomize, to_numpy_sd


@pytest.fixture(scope="module", params=[True, False],
                ids=["guidance", "no_guidance"])
def flux_pair(request):
    from tests.mirrors.flux_torch import FluxTransformerMirror

    cfg = FluxConfig.tiny(guidance_embeds=request.param)
    mirror = randomize(FluxTransformerMirror(cfg), seed=2).eval()
    params = convert.convert_flux(to_numpy_sd(mirror), cfg)
    return cfg, mirror, params


def _inputs(cfg, gh=4, gw=4, s_txt=6, B=2, seed=0):
    rng = np.random.default_rng(seed)
    img_ids = make_latent_ids(gh, gw)
    txt_ids = np.zeros((s_txt, 3), np.int32)
    lat = rng.normal(0, 1, (B, gh * gw, cfg.in_channels)).astype(np.float32)
    t = np.linspace(30.0, 950.0, B).astype(np.float32)
    ctx = rng.normal(0, 1, (B, s_txt, cfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.normal(0, 1, (B, cfg.pooled_projection_dim)).astype(np.float32)
    return lat, t, ctx, pooled, img_ids, txt_ids


def test_forward_parity(flux_pair):
    cfg, mirror, params = flux_pair
    lat, t, ctx, pooled, img_ids, txt_ids = _inputs(cfg)
    g = np.asarray([1.5, 4.0], np.float32)
    with torch.no_grad():
        want = mirror(torch.tensor(lat), torch.tensor(t), torch.tensor(ctx),
                      torch.tensor(pooled), torch.tensor(img_ids),
                      torch.tensor(txt_ids),
                      torch.tensor(g) if cfg.guidance_embeds else None).numpy()
    got = np.asarray(FluxTransformer(cfg).apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(pooled), img_ids, txt_ids,
        guidance=jnp.asarray(g) if cfg.guidance_embeds else None))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_non_square_grid_rope(flux_pair):
    """gh != gw exercises the 3-axis RoPE id layout on both sides."""
    cfg, mirror, params = flux_pair
    lat, t, ctx, pooled, img_ids, txt_ids = _inputs(cfg, gh=6, gw=3, s_txt=4,
                                                    seed=3)
    with torch.no_grad():
        want = mirror(torch.tensor(lat), torch.tensor(t), torch.tensor(ctx),
                      torch.tensor(pooled), torch.tensor(img_ids),
                      torch.tensor(txt_ids), None).numpy()
    got = np.asarray(FluxTransformer(cfg).apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(pooled), img_ids, txt_ids))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_all_weights_consumed(flux_pair):
    """convert_flux must account for every key in the checkpoint (the _Taken
    guard raises on unconsumed/missing keys at convert time)."""
    cfg, mirror, _ = flux_pair
    sd = to_numpy_sd(mirror)
    sd["garbage.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(Exception):
        convert.convert_flux(sd, cfg)


def test_load_flux_transformer_dir(tmp_path, flux_pair):
    """load_flux_transformer reads a diffusers-layout dir (config.json +
    safetensors) and reproduces the mirror forward."""
    from safetensors.numpy import save_file

    import jax.numpy as jnp

    cfg, mirror, _ = flux_pair
    d = str(tmp_path / "flux")
    os.makedirs(d)
    sd = to_numpy_sd(mirror)
    save_file(sd, os.path.join(d, "model.safetensors"))
    import json
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({
            "in_channels": cfg.in_channels, "num_layers": cfg.num_double_layers,
            "num_single_layers": cfg.num_single_layers,
            "attention_head_dim": cfg.attention_head_dim,
            "num_attention_heads": cfg.num_attention_heads,
            "joint_attention_dim": cfg.joint_attention_dim,
            "pooled_projection_dim": cfg.pooled_projection_dim,
            "guidance_embeds": cfg.guidance_embeds,
            "axes_dims_rope": list(cfg.rope_axes_dims),
        }, f)
    from adv_grpo_tpu.models.convert import load_flux_transformer

    lcfg, params = load_flux_transformer(d, dtype=jnp.float32, remat=False)
    assert lcfg.num_double_layers == cfg.num_double_layers
    lat, t, ctx, pooled, img_ids, txt_ids = _inputs(cfg)
    with torch.no_grad():
        want = mirror(torch.tensor(lat), torch.tensor(t), torch.tensor(ctx),
                      torch.tensor(pooled), torch.tensor(img_ids),
                      torch.tensor(txt_ids), None).numpy()
    got = np.asarray(FluxTransformer(lcfg).apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(pooled), img_ids, txt_ids))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)
