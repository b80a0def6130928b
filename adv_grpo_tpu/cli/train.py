"""Training CLI — the reference's two trainer scripts as one preset-driven
entry point (scripts/grpo_pickscore.sh / grpo_dino.sh equivalents).

Usage:
  python -m adv_grpo_tpu.cli.train --config pickscore_cotrain_sd3_fast \
      [--max_epochs N] [--latent_hw 64]

Discriminator kind, rewards, gates, budgets all come from the preset
(adv_grpo_tpu/config/grpo.py). Multi-host: launch one process per host with
JAX_COORDINATOR/... env set; jax.distributed.initialize is called when
process-count env vars are present.
"""

from __future__ import annotations

import argparse
import os


def maybe_init_distributed():
    if os.environ.get("JAX_PROCESS_COUNT") or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        # jax only env-reads the coordinator address; process count/id come
        # from cluster auto-detect (SLURM etc.), so support explicit env for
        # plain multi-host launches (and the 2-process CPU test)
        kw = {}
        n = (os.environ.get("JAX_PROCESS_COUNT")
             or os.environ.get("JAX_NUM_PROCESSES"))
        if n:
            kw["num_processes"] = int(n)
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is not None:
            kw["process_id"] = int(pid)
        if jax.distributed.is_initialized():
            return  # idempotent: already initialized by the harness
        jax.distributed.initialize(**kw)


def build_trainer(config, latent_hw=None, dataset=None):
    import jax

    from adv_grpo_tpu.cli.common import build_pipeline, build_text_encoder
    from adv_grpo_tpu.data.datasets import (
        GenevalPromptDataset, ReferenceImageStore, TextPromptDataset,
    )
    from adv_grpo_tpu.rewards.registry import multi_score
    from adv_grpo_tpu.train.driver import DiscriminatorBundle, GRPOTrainer
    from adv_grpo_tpu.train.grpo_trainer import (
        make_dino_d_step, make_dino_multi_d_step, make_pickscore_d_step,
    )

    pipeline = build_pipeline(config, latent_hw=latent_hw)
    encode = build_text_encoder(config, pipeline)

    if dataset is None:
        ds_dir = str(config.dataset)
        limit = config.get("limit", None)
        # config.prompt_fn selects the dataset flavour (reference
        # train_sd3_fast_pickscore.py:569 general_ocr -> TextPromptDataset,
        # :601 geneval -> GenevalPromptDataset); file-presence detection stays
        # the fallback for other prompt_fn values.
        pf = str(config.get("prompt_fn", ""))
        if pf == "geneval" or (pf != "general_ocr" and os.path.exists(
                os.path.join(ds_dir, "train_metadata.jsonl"))):
            dataset = GenevalPromptDataset(ds_dir, "train", limit=limit)
        else:
            dataset = TextPromptDataset(ds_dir, "train", limit=limit)

    ref_store = None
    if str(config.json_path) and os.path.exists(str(config.json_path)):
        ref_store = ReferenceImageStore(
            str(config.json_path), str(config.reference_image_path),
            resolution=int(config.resolution))

    # reward context with the scorers the preset needs
    from adv_grpo_tpu.cli.common import build_reward_context

    reward_names = set(dict(config.reward_fn)) | set(dict(config.eval_reward_fn))
    ctx = build_reward_context(config, reward_names)
    disc = None

    disc_kind = str(config.discriminator)
    if bool(config.train_d) and disc_kind:
        if disc_kind == "pickscore":
            make = make_pickscore_d_step(ctx.pickscore, int(config.tune_layer),
                                         float(config.d_lr))
            step_fn, opt_state = make(ctx.pickscore_params)
            disc = DiscriminatorBundle("pickscore", step_fn, opt_state,
                                       ctx.pickscore_params, tokenize=ctx.tokenize)
        elif disc_kind == "dino_multi":
            make = make_dino_multi_d_step(ctx.dino_multi, float(config.d_lr))
            step_fn, opt_state = make(ctx.dino_multi_params)
            disc = DiscriminatorBundle("dino_multi", step_fn, opt_state,
                                       ctx.dino_multi_params,
                                       backbone_params=ctx.dino_backbone_params)
        else:
            make = make_dino_d_step(ctx.dino, float(config.d_lr))
            step_fn, opt_state = make(ctx.dino_head_params)
            disc = DiscriminatorBundle(disc_kind, step_fn, opt_state,
                                       ctx.dino_head_params,
                                       backbone_params=ctx.dino_backbone_params)

    reward_fn = multi_score(dict(config.reward_fn), ctx)
    eval_reward_fn = multi_score(dict(config.eval_reward_fn), ctx) \
        if dict(config.eval_reward_fn) else None

    trainer = GRPOTrainer(
        config, pipeline, dataset, encode, reward_fn,
        eval_reward_fn=eval_reward_fn, reference_store=ref_store,
        discriminator=disc, latent_hw=latent_hw or int(config.resolution) // 8,
        reward_ctx=ctx)
    weight_path = config.get("weight_path", None)
    if disc is not None and weight_path:
        # discriminator warm-start from a prior adversarial checkpoint
        # (reference config.weight_path, train_sd3_fast_pickscore.py:518-523)
        trainer.restore_discriminator(str(weight_path))
    return trainer


def main(argv=None):
    from adv_grpo_tpu.cli.common import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--latent_hw", type=int, default=None)
    parser.add_argument("--set", action="append", default=[], metavar="K=V",
                        help="config override, e.g. --set train.learning_rate=1e-4")
    parser.add_argument("--resume", default=None, metavar="PATH|latest",
                        help="resume full training state from a checkpoint "
                             "dir, or 'latest' for the newest one under "
                             "save_dir/checkpoints")
    args = parser.parse_args(argv)

    maybe_init_distributed()
    from adv_grpo_tpu.cli.common import apply_overrides, resolve_config

    config = apply_overrides(resolve_config(args.config), args.set)
    if not str(config.save_dir):
        # reference run layout: logdir/run_name(+unique timestamp)
        # (train_sd3_fast_pickscore.py:405-414)
        import datetime

        unique = datetime.datetime.now().strftime("%Y.%m.%d_%H.%M.%S")
        import jax

        if jax.process_count() > 1:
            # every process must agree on the directory: take process 0's
            # timestamp (now() can cross a second boundary between hosts)
            import numpy as _np
            from jax.experimental import multihost_utils

            buf = _np.frombuffer(unique.encode().ljust(32), dtype=_np.uint8)
            buf = multihost_utils.broadcast_one_to_all(buf)
            unique = bytes(buf).decode().strip()
        run = str(config.run_name)
        config.run_name = (run + "_" + unique) if run else unique
        config.save_dir = os.path.join(str(config.logdir), config.run_name)
    trainer = build_trainer(config, latent_hw=args.latent_hw)
    # generator warm-start from a LoRA adapter (reference
    # train_sd3_fast_pickscore.py:506-509 via config.train.lora_path) —
    # --resume (full state incl. optimizer/EMA/step) supersedes it
    if args.resume:
        from adv_grpo_tpu.train import checkpoint as ckpt_lib

        path = args.resume
        if path == "latest":
            path = ckpt_lib.latest_checkpoint(str(config.save_dir))
            if path is None:
                raise FileNotFoundError(
                    f"--resume latest: no checkpoints under "
                    f"{config.save_dir}/checkpoints")
        trainer.restore(path)
    elif config.train.get("lora_path", None):
        trainer.warm_start_lora(str(config.train.lora_path))
    eval_prompts = None
    try:
        from adv_grpo_tpu.data.datasets import TextPromptDataset

        test_ds = TextPromptDataset(str(config.dataset), "test")
        eval_prompts = test_ds.prompts[: int(config.sample.test_batch_size)]
    except (FileNotFoundError, OSError):
        pass
    trainer.run(max_epochs=args.max_epochs, eval_prompts=eval_prompts)


if __name__ == "__main__":
    main()
