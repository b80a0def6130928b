"""adv_grpo_tpu — TPU-native RL post-training for flow-matching text-to-image models.

A from-scratch JAX/XLA/Pallas framework with the capabilities of showlab/Adv-GRPO
(reference mounted at /root/reference): GRPO fine-tuning of MMDiT flow-matching
transformers (SD3.5-class) with LoRA, few-step stochastic-window SDE sampling with
per-step log-probabilities, a multi-reward scoring registry, and adversarially
co-trained reward models (PickScore CLIP / DINOv2 discriminator heads).

Layering (see SURVEY.md §1/§7):
  core/        pure-function numerics: flow-match schedule, CPS/SDE steps + logprob,
               GRPO loss, per-prompt advantage statistics, EMA
  models/      Flax modules: MMDiT, VAE, CLIP-L/G + T5 text encoders, CLIP-H
               (PickScore), DINOv2 ViT, aesthetic MLP; HF->Flax weight converters
  ops/         Pallas TPU kernels (flash attention) with XLA fallbacks
  rollout/     jitted lax.scan denoise sampler with stochastic training window
  rewards/     reward registry (multi_score) + device/host scorers
  adversarial/ CLIP preference criterion + DINO hinge discriminator steps
  train/       GRPO trainer orchestration (sampling/reward/advantage/update phases)
  parallel/    mesh construction, sharding specs, host gathers
  data/        prompt datasets, K-repeat distributed sampler, reference-image store
  config/      named presets mirroring the reference config system
  cli/         train / eval / infer / generate-refs entry points
  native/      C++ host-side helpers (Levenshtein, image preprocessing)
"""

__version__ = "0.1.0"
