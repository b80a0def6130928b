"""GRPO preset configurations — same preset names & hyperparameters as the
reference (config/grpo.py), resolved via ``get_config(name)``.

Canonical numbers (SURVEY.md §3.1 / BASELINE.md): SD3.5-M, bf16, 512², 10-step
rollout / 2-step window / 40-step eval, cfg 4.5, 16 imgs per prompt group split
8-per-replica, 12 sampling batches/epoch, grad-accum 6, clip 1e-5, noise 0.8,
EMA(0.9, interval 8), stop at global step 1000. Replica count is a parameter
(the reference hard-codes gpu_number=8, config/grpo.py:103).
"""

from __future__ import annotations

import os

from adv_grpo_tpu.config import base


def compressibility():
    config = base.get_config()
    config.reward_fn = {"jpeg_compressibility": 1}
    config.per_prompt_stat_tracking = True
    return config


def _sd3_fast_common(config, replica_count=8):
    config.dataset = os.path.join(os.getcwd(), "dataset/pickscore")
    config.mixed_precision = "bf16"
    config.wandb_init = True
    config.pretrained.model = "stabilityai/stable-diffusion-3.5-medium"
    config.sample.num_steps = 10
    config.sample.train_num_steps = 2
    config.sample.eval_num_steps = 40
    config.sample.guidance_scale = 4.5
    config.resolution = 512
    config.sample.train_batch_size = 1
    config.sample.num_image_per_prompt = 16
    config.sample.mini_num_image_per_prompt = 8
    config.sample.num_batches_per_epoch = int(
        48 / (replica_count * config.sample.mini_num_image_per_prompt
              / config.sample.num_image_per_prompt))
    config.sample.test_batch_size = 16
    config.sample.random_timestep = 0
    config.train.batch_size = config.sample.mini_num_image_per_prompt
    config.train.gradient_accumulation_steps = config.sample.num_batches_per_epoch // 2
    config.train.num_inner_epochs = 1
    config.train.timestep_fraction = 0.99
    config.train.clip_range = 1e-5
    config.train.beta = 0.0
    config.sample.global_std = True
    config.sample.noise_level = 0.8
    config.train.ema = True
    config.save_freq = 60
    config.eval_freq = 60
    return config


def pickscore_sd3_fast(replica_count=8):
    """Frozen-reward multi-reward preset (reference config/grpo.py:379-427)."""
    config = _sd3_fast_common(compressibility(), replica_count)
    config.dataset = os.path.join(os.getcwd(), "dataset/ocr")
    config.case_name = "fast_1node_16_8_multireward_11"
    config.sample.random_timestep = None
    config.save_dir = "logs/pickscore/sd3.5-M-fast_multireward"
    config.reward_fn = {"pickscore": 0.5, "ocr": 0.5}
    config.prompt_fn = "general_ocr"
    return config


def pickscore_cotrain_sd3_fast(replica_count=8):
    """Adversarial PickScore co-training (reference config/grpo.py:315-376)."""
    config = _sd3_fast_common(compressibility(), replica_count)
    config.discriminator = "pickscore"
    config.d_times = 20
    config.d_lr = 5e-6
    config.tune_layer = -1
    config.train_d = True
    config.json_path = "data/reference_images/prompt2img_merged_pickscore.json"
    config.reference_image_path = "data/reference_images/qwen_images_pickscore"
    config.case_name = "fast_pickscore_cotrain_lr_5e6_last1_16_8"
    config.save_dir = "logs/pickscore/sd3.5-M-fast_pickscore_cotrain"
    config.reward_fn = {"pickscore_cotrain": 1}
    config.eval_reward_fn = {"pickscore": 1}
    config.prompt_fn = "general_ocr"
    return config


def dino_cotrain_sd3_fast(replica_count=8):
    """DINO CLS-only co-training (reference config/grpo.py:31-99)."""
    config = _sd3_fast_common(compressibility(), replica_count)
    config.discriminator = "dino"
    config.d_times = 10
    config.d_lr = 1e-4
    config.tune_layer = -2
    config.train_d = True
    config.json_path = "data/reference_images/prompt2img_merged_pickscore.json"
    config.reference_image_path = "data/reference_images/qwen_images_pickscore"
    config.test_reference_image_path = "data/reference_images/qwen_images_pickscore_test"
    config.case_name = "fast_dino_cotrain_16_8"
    config.save_dir = "logs/dino/sd3.5-M-fast_dino_cotrain"
    config.reward_fn = {"dino_cotrain": 1}
    config.eval_reward_fn = {"pickscore": 1}
    config.prompt_fn = "general_ocr"
    return config


def dino_cotrain_sd3_patch_fast(replica_count=8):
    """DINO CLS+patch co-training — the paper's headline config
    (reference config/grpo.py:102-174)."""
    config = dino_cotrain_sd3_fast(replica_count)
    config.discriminator = "dino_patch"
    config.case_name = "fast_dino_cotrain_16_8_patch_image_loss_73"
    config.save_dir = "logs/dino/sd3.5-M-fast_dino_patch_cotrain"
    config.reward_fn = {"dino_patch_cotrain": 1}
    config.eval_reward_fn = {"pickscore": 1, "image_similarity": 1}
    config.limit = None
    return config


def dino_cotrain_sd3_multi_fast(replica_count=8):
    """Multi-layer DINO heads+fusion co-training
    (reference config/grpo.py:176-246)."""
    config = _sd3_fast_common(compressibility(), replica_count)
    config.sample.num_image_per_prompt = 8  # k = 1 (ref :194-195)
    config.sample.mini_num_image_per_prompt = 8
    config.sample.num_batches_per_epoch = int(
        48 / (replica_count * config.sample.mini_num_image_per_prompt
              / config.sample.num_image_per_prompt))
    config.train.batch_size = config.sample.mini_num_image_per_prompt
    config.train.gradient_accumulation_steps = \
        config.sample.num_batches_per_epoch // 2
    config.sample.random_timestep = 0
    config.discriminator = "dino_multi"
    config.d_times = 10
    config.d_lr = 1e-4
    config.tune_layer = -1
    config.dino_multi_layer_ids = (11,)  # ref tune_layer=(11,) (:219)
    config.temperature = 2.0
    config.train_d = True
    config.json_path = "data/reference_images/prompt2img_merged_pickscore.json"
    config.reference_image_path = "data/reference_images/qwen_images_pickscore"
    config.test_reference_image_path = \
        "data/reference_images/qwen_images_pickscore_test"
    config.case_name = "fast_dino_cotrain_16_8_multi_image_loss"
    config.save_dir = "logs/dino/sd3.5-M-fast_dino_multi_cotrain"
    config.reward_fn = {"dino_multi_cotrain": 1}
    config.eval_reward_fn = {"pickscore": 1, "image_similarity": 1}
    config.prompt_fn = "general_ocr"
    return config


def smoke_sd3_fast(replica_count=1):
    """Explicit random-init smoke preset: tiny model, 2 sampling batches, no
    reference weights — the ONLY sanctioned weightless training config (real
    presets now fail loudly when pretrained.model isn't a local dir)."""
    config = _sd3_fast_common(compressibility(), replica_count)
    config.smoke_test = True
    config.pretrained.model = ""
    config.dataset = os.path.join(os.getcwd(), "dataset/pickscore_small")
    config.wandb_init = False
    config.sample.num_steps = 3
    config.sample.train_num_steps = 2
    config.sample.eval_num_steps = 3
    config.sample.num_image_per_prompt = 4
    config.sample.mini_num_image_per_prompt = 2
    config.sample.num_batches_per_epoch = 2
    config.sample.test_batch_size = 2
    config.sample.random_timestep = None
    config.train.gradient_accumulation_steps = 1
    config.train_d = False
    config.json_path = ""
    config.reward_fn = {"jpeg_compressibility": 1}
    config.eval_reward_fn = {}
    config.save_dir = "logs/smoke"
    config.save_freq = 1000
    config.eval_freq = 1000
    config.case_name = "smoke"
    return config


def flux_smoke():
    """Flux / Flux-Kontext full-SDE demo preset (phase-2 family). Drives
    ``scripts/demo/flux_sde_demo.py`` the way the reference ships Flux: as a
    library sampler plus a demo script (flux_pipeline_with_logprob.py +
    scripts/demo/{flux,flux_kontext}_sde_demo.py). Random-init tiny model by
    default; set FLUX_DIR to a diffusers FluxTransformer2DModel directory for
    real weights (load_flux_transformer)."""
    config = base.get_config()
    config.model_family = "flux"
    config.smoke_test = True
    config.pretrained.model = os.environ.get("FLUX_DIR", "")
    config.resolution = 64  # tiny random-init default; real Flux: 512+
    config.sample.num_steps = 4
    config.sample.eval_num_steps = 4
    config.sample.noise_level = 0.7
    config.sample.guidance_scale = 3.5
    config.wandb_init = False
    config.save_dir = "logs/flux_smoke"
    config.case_name = "flux_smoke"
    # GRPO-trainable (round 4): the full-SDE window [rt, rt+2), 2 batches of
    # one 4-image group per epoch, compressibility reward — a CI-sized run
    # of cli.train --config flux_smoke (the Flow-GRPO lineage's Flux config)
    config.dataset = os.path.join(os.getcwd(), "dataset/pickscore_small")
    config.prompt_fn = "general_ocr"
    config.sample.train_num_steps = 2
    config.sample.train_batch_size = 1
    config.sample.num_image_per_prompt = 4
    config.sample.mini_num_image_per_prompt = 4
    config.sample.num_batches_per_epoch = 2
    config.train.batch_size = 4
    config.train.gradient_accumulation_steps = 1
    config.reward_fn = {"jpeg_compressibility": 1}
    return config


def wan_smoke():
    """WAN text-to-video SDE demo preset (phase-3 family). Drives
    ``scripts/demo/wan_sde_demo.py``; mirrors how the reference ships WAN as
    a library sampler (wan_pipeline_with_logprob.py) with per-step KL. Tiny
    random-init transformer + 3D causal VAE by default; set WAN_DIR to a
    diffusers WanTransformer3DModel dir for real weights."""
    config = base.get_config()
    config.model_family = "wan"
    config.smoke_test = True
    config.pretrained.model = os.environ.get("WAN_DIR", "")
    config.resolution = 32  # tiny default frame size (multiple of VAE factor)
    config.sample.num_steps = 4
    config.sample.eval_num_steps = 4
    config.sample.noise_level = 0.7  # WAN SDE noise is schedule-driven
    config.sample.guidance_scale = 0.0  # reference WAN rollout is uncond CFG-free
    config.sample.kl_reward = 0.0
    # pixel frames, 1 mod temporal_factor (latent F' = 1 + (F-1)/tf; WAN
    # checkpoints use 4k+1 frame counts, e.g. 81)
    config.sample.num_frames = 9
    config.wandb_init = False
    config.save_dir = "logs/wan_smoke"
    config.case_name = "wan_smoke"
    # GRPO-trainable (round 4): window [rt, rt+2) of the stochastic video
    # trajectory, 2 one-group batches/epoch, compressibility on the decoded
    # frames — a CI-sized run of cli.train --config wan_smoke
    config.dataset = os.path.join(os.getcwd(), "dataset/pickscore_small")
    config.prompt_fn = "general_ocr"
    config.sample.train_num_steps = 2
    config.sample.train_batch_size = 1
    config.sample.num_image_per_prompt = 2
    config.sample.mini_num_image_per_prompt = 2
    config.sample.num_batches_per_epoch = 2
    config.train.batch_size = 2
    config.train.gradient_accumulation_steps = 1
    config.reward_fn = {"jpeg_compressibility": 1}
    return config


def eval_sd3_fast(replica_count=8):
    """Deterministic batch-eval preset (reference config/grpo.py:247-312)."""
    config = _sd3_fast_common(compressibility(), replica_count)
    config.sample.noise_level = 0.0
    config.train.lora_path = None
    config.eval_reward_fn = {"pickscore": 1, "image_similarity": 1}
    config.reward_fn = {"pickscore": 1}
    config.prompt_fn = "general_ocr"
    config.save_dir = "logs/eval/sd3.5-M-fast"
    return config


_PRESETS = {
    "compressibility": compressibility,
    "pickscore_sd3_fast": pickscore_sd3_fast,
    "pickscore_cotrain_sd3_fast": pickscore_cotrain_sd3_fast,
    "dino_cotrain_sd3_fast": dino_cotrain_sd3_fast,
    "dino_cotrain_sd3_patch_fast": dino_cotrain_sd3_patch_fast,
    "dino_cotrain_sd3_multi_fast": dino_cotrain_sd3_multi_fast,
    "smoke_sd3_fast": smoke_sd3_fast,
    "eval_sd3_fast": eval_sd3_fast,
    "flux_smoke": flux_smoke,
    "wan_smoke": wan_smoke,
}


def get_config(name: str):
    """Resolve ``--config .../grpo.py:<preset>`` (reference config/grpo.py:432-434)."""
    return _PRESETS[name]()
