"""WAN GRPO trainability: the unified driver trains the text-to-video family
end-to-end on the 8-device mesh — stochastic video trajectory (reference
wan_pipeline_with_logprob.py:229-341), per-sample window gather, WAN Flow-SDE
log-prob replay, LoRA policy update. The reference ships WAN as a sampler
library only; this closes the trainer seam like tests/test_flux_trainer.py
does for Flux."""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adv_grpo_tpu.config import grpo as grpo_config
from adv_grpo_tpu.cli.common import make_hash_text_encoder
from adv_grpo_tpu.models.lora import lora_params, merge_lora_params
from adv_grpo_tpu.models.wan import WanConfig
from adv_grpo_tpu.models.wan_vae import WanVAEConfig
from adv_grpo_tpu.rollout.wan import (
    WanSamplerConfig, make_wan_log_prob_fn, wan_denoise_window_with_logprob,
)
from adv_grpo_tpu.train.driver import GRPOTrainer
from adv_grpo_tpu.train.wan_pipeline import WanPipeline


class _ToyDataset:
    def __init__(self, n=16):
        self.prompts = [f"wan prompt {i}" for i in range(n)]

    def __len__(self):
        return len(self.prompts)

    def __getitem__(self, i):
        return {"prompt": self.prompts[i], "metadata": {}}


def brightness_reward(videos, prompts, metadata=None, ref_images=None):
    arr = jnp.asarray(videos, jnp.float32)
    scores = np.asarray(jnp.mean(arr, axis=tuple(range(1, arr.ndim))))
    noise = np.array([zlib.crc32(p.encode()) % 7 / 70.0
                      for p in prompts])  # crc32: process-stable
    avg = scores + noise
    return {"brightness": avg, "avg": avg}, {}


def wan_test_config(**overrides):
    cfg = grpo_config.wan_smoke()
    cfg.sample.num_steps = 3
    cfg.sample.train_num_steps = 1
    cfg.sample.mini_num_image_per_prompt = 2
    cfg.sample.num_image_per_prompt = 4  # k = 2 replicas per prompt group
    cfg.sample.train_batch_size = 2
    cfg.train.batch_size = 2
    cfg.sample.num_batches_per_epoch = 2
    cfg.train.gradient_accumulation_steps = 1
    cfg.save_dir = ""
    cfg.wandb_init = False
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


@pytest.fixture(scope="module")
def wan_pipeline():
    wcfg = WanConfig.tiny(lora_rank=4, lora_alpha=8.0)
    vcfg = WanVAEConfig.tiny(z_dim=wcfg.in_channels,
                             latents_mean=(0.0,) * wcfg.in_channels,
                             latents_std=(1.0,) * wcfg.in_channels)
    return WanPipeline.random_init(jax.random.PRNGKey(0), wcfg, vcfg,
                                   latent_hw=4, latent_frames=2,
                                   text_seq_len=6)


def make_trainer(wan_pipeline, cfg, **kw):
    encode = make_hash_text_encoder(6, wan_pipeline.wan_cfg.text_dim, 8)
    return GRPOTrainer(cfg, wan_pipeline, _ToyDataset(), encode,
                       brightness_reward, latent_hw=4, **kw)


class TestWanTrainer:
    def test_two_epochs_update_policy(self, wan_pipeline):
        trainer = make_trainer(wan_pipeline, wan_test_config())
        assert trainer.family == "wan"
        assert not trainer.shared_prefix
        lora_before = jax.tree_util.tree_map(np.asarray, trainer.state.lora)
        trainer.run(max_epochs=2)
        assert trainer.epoch == 2
        for loss in trainer.last_inner_losses:
            assert np.isfinite(loss)
        delta = max(float(np.max(np.abs(np.asarray(b) - lora_before[k])))
                    for k, b in trainer.state.lora.items())
        assert delta > 0

    def test_window_replay_identity(self, wan_pipeline):
        """The WAN training-side Flow-SDE log-prob replay must reproduce the
        rollout's recorded log-probs exactly (same params, recorded
        transitions) — the sigma_min/max guards come from the same UniPC
        flow-sigma schedule the rollout used."""
        pipe = wan_pipeline
        wcfg = WanSamplerConfig(num_steps=4)
        B, T = 4, 2
        frozen = pipe.transformer_params
        lora = lora_params(frozen["params"])
        params = {**frozen,
                  "params": merge_lora_params(frozen["params"], lora)}
        vfn = pipe.velocity_fn(params)
        embeds = jax.random.normal(jax.random.PRNGKey(1),
                                   (B, 6, pipe.wan_cfg.text_dim)) * 0.1
        lat0 = pipe.prepare_latents(jax.random.PRNGKey(2), B, 4)
        rt = jnp.array([0, 1, 2, 1], jnp.int32)
        out = wan_denoise_window_with_logprob(
            lambda x, t, s: vfn(x, t, embeds), lat0, jax.random.PRNGKey(3),
            wcfg, T, rt)
        log_prob = make_wan_log_prob_fn(wcfg)
        for j in range(T):
            lp, _, _ = log_prob(
                vfn, out.latents[:, j], out.latents[:, j + 1],
                out.timesteps[:, j], out.sigmas[:, j], out.sigmas_prev[:, j],
                embeds, None, None, None, None)
            np.testing.assert_allclose(np.asarray(lp),
                                       np.asarray(out.log_probs[:, j]),
                                       rtol=2e-4, atol=2e-4)
