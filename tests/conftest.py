"""Test harness config: force an 8-device virtual CPU mesh before JAX import.

Multi-device sharding logic (gather -> advantage -> slice, pjit train steps) is
exercised on a host-platform mesh, per the TPU-less CI strategy in SURVEY.md §4.
"""

import os

# FORCE cpu: the build VM exports JAX_PLATFORMS=axon globally AND its
# sitecustomize imports jax at interpreter startup, so the env default is
# already baked into jax.config by the time conftest runs — update both.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert all(d.platform == "cpu" for d in jax.devices()), (
    "tests must run on the virtual CPU mesh, got: " + str(jax.devices()))
assert len(jax.devices()) == 8, jax.devices()


# ---------------------------------------------------------------------------
# Fast-lane curation (VERDICT r4 weak #2): the default dev lane is
# `pytest -m "not slow"` and must finish <10 min on a 1-core box. Whole-file
# heavyweights carry `pytestmark = pytest.mark.slow` in their own module;
# individual long-tail tests (>~20 s measured via `--durations=0` on this box,
# dominated by XLA CPU compiles of pjit train steps) are centrally marked here
# so the tier policy lives in one reviewable place. Every entry still runs in
# the full lane (`pytest tests/`).
# Matching is by substring of the node id, so a class name covers the class.
_SLOW_NODE_PARTS = [
    # embed-store end-to-end (516 s combined: full precompute CLI + trainer)
    "test_embed_store.py::TestEndToEnd",
    # trainer e2e long tail (each spins extra trainers => extra pjit compiles)
    "test_trainer_e2e.py::TestTrainerE2E::test_micro_splits_gradient_equivalence",
    "test_trainer_e2e.py::TestTrainerE2E::test_cfg_sequential_gradient_equivalence",
    "test_trainer_e2e.py::TestTrainerE2E::test_resume_continues_from_step",
    "test_trainer_e2e.py::TestTrainerE2E::test_warm_start_lora",
    "test_trainer_e2e.py::TestTrainerE2E::test_checkpoint_roundtrip",
    "test_trainer_e2e.py::TestTrainerE2E::test_pickscore_adaptive_gate",
    "test_trainer_e2e.py::TestTrainerE2E::test_metrics_written",
    "test_trainer_e2e.py::TestTrainerE2E::test_dino_periodic_gate",
    "test_trainer_e2e.py::TestSharding::test_same_latent_shared_prefix_epoch",
    "test_trainer_e2e.py::TestAlternativeAlgorithms::test_one_epoch_updates_policy",
    "test_trainer_e2e.py::TestInnerEpochPermutation",
    # model-level compile heavies
    "test_models.py::TestMMDiT::test_remat_policies_preserve_values_and_grads",
    "test_models.py::TestVAE::test_roundtrip_shapes",
    "test_models.py::TestVAE::test_encode_deterministic_vs_sampled",
    # adversarial / reward long tail
    "test_rewards_adversarial.py::TestDinoMultiDStep::test_trainer_gate_drives_multi",
    "test_convert.py::TestCLIPTextParity::test_clip_text_matches_hf",
    "test_misc.py::TestGlobalAdvantageBranch",
    "test_misc.py::TestFlopsModel::test_trainer_logs_rollout_tflops",
    "test_misc.py::TestInferImageToImage::test_cli_distribution_transfer",
    # rollout long tail (shared-prefix replay compiles a second sampler)
    "test_rollout.py::TestSharedPrefixSampler",
    "test_rollout.py::TestSameLatent::test_group_shares_initial_latent",
    # WAN video VAE (3D conv chains are slow to compile on CPU)
    "test_flux_wan.py::TestWanVideoVAE",
    # whole-file e2e heavies
    "test_eval_cli.py",
    "test_wan_trainer.py",
    "test_flux_trainer.py::TestFluxTrainer::test_checkpoint_roundtrip",
    "test_flux_trainer.py::TestFluxTrainer::test_window_replay_identity",
    # pass-2 tail (measured via `pytest -m "not slow" --durations=30`: the
    # curated lane was 1017s; these marks + the shared TestMMDiT fixture
    # bring it under the 10-min promise). The canonical e2e per family
    # (sd3 two_epochs, flux window_gather, learning-curve sd3 rise) stays
    # in the fast lane.
    "test_app.py::TestAppAdapterPicker::test_local_hub_layout_and_picker",
    "test_learning_curve.py::TestLearningCurve::test_sd3_sign_error_does_not_rise",
    "test_misc.py::TestFlopsModel::test_wan_trainer_logs_rollout_tflops",
    "test_flux_trainer.py::TestFluxTrainer::test_two_epochs_update_policy",
    "test_trainer_e2e.py::TestSharding::test_inner_epochs_multiply_microsteps",
    "test_trainer_e2e.py::TestTrainerE2E::test_micro_splits_divisibility_errors",
    "test_remote_rewards.py::TestStyleGANDiscriminator::test_scores_and_shape_dispatch",
    "test_finetune_pickscore.py::TestFinetuneCLI::test_finetune_improves_preference_accuracy",
    "test_joint_attention.py::test_joint_mha_gradients",
    "test_joint_attention.py::test_joint_mha_unaligned_text_gradients",
    "test_flux_wan.py::TestFluxTransformer::test_fused_qkv_matches_unfused",
    "test_flux_wan.py::TestWanTransformer::test_fused_qkv_matches_unfused",
    "test_finetune_pickscore.py::TestFinetuneCLI::test_msgpack_warm_starts_trainer_d",
    "test_convert.py::TestT5Parity::test_t5_encoder_matches_hf",
    "test_convert.py::TestImageRewardNative::test_model_and_converter",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(part in item.nodeid for part in _SLOW_NODE_PARTS):
            item.add_marker(pytest.mark.slow)
