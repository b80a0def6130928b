"""Precompute text embeddings for a dataset (then train without encoders).

Usage:
    python -m adv_grpo_tpu.cli.precompute_embeds --config pickscore_cotrain_sd3_fast \
        --out embeds_store [--splits train,test] [--batch 32]

Then train/eval with ``--set text_embeds_dir=embeds_store``: the trainer swaps
the tri-encoder stack for the memmap store, so CLIP-L/G + T5 never occupy HBM
next to the policy (SURVEY §7.3.7 memory hard-part; the reference holds the
full stack per GPU under ZeRO-2 on 80GB cards).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from adv_grpo_tpu.cli.common import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--splits", default="train,test")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--set", action="append", default=[], metavar="K=V")
    ap.add_argument("--allow-fallback", action="store_true",
                    help="permit the deterministic hash pseudo-encoder when "
                         "the model dir has no text_encoder/ (tests/smoke "
                         "only — the store would NOT hold real embeddings)")
    args = ap.parse_args(argv)

    import os

    from adv_grpo_tpu.cli.common import (
        apply_overrides, build_pipeline, build_text_encoder, resolve_config)
    from adv_grpo_tpu.data.datasets import TextPromptDataset, GenevalPromptDataset
    from adv_grpo_tpu.data.embed_store import write_store

    config = apply_overrides(resolve_config(args.config), args.set)
    # guard the silent-fallback chain in build_text_encoder: precomputing
    # FROM an existing store or from the hash pseudo-encoder would write a
    # store of garbage that trains without any error anywhere
    if str(config.get("text_embeds_dir", "")):
        ap.error("config.text_embeds_dir is set — precompute would re-read "
                 "the existing store instead of encoding; unset it "
                 "(--set text_embeds_dir=)")
    model_dir = str(config.pretrained.model)
    if not (model_dir and os.path.isdir(os.path.join(model_dir, "text_encoder"))):
        if not args.allow_fallback:
            ap.error(
                f"no text_encoder/ under {model_dir!r}: the real tri-encoder "
                "stack is unavailable, so the store would hold hash-based "
                "pseudo-embeddings. Point config.pretrained.model at a full "
                "SD3 diffusers dir, or pass --allow-fallback for smoke runs")
        print("WARNING: writing hash pseudo-embeddings (--allow-fallback)")
    pipeline = build_pipeline(config)
    encode = build_text_encoder(config, pipeline)

    prompts = [""]  # the negative prompt is part of every batch
    ds_dir = str(config.dataset)
    for split in args.splits.split(","):
        try:
            if str(config.prompt_fn) == "geneval":
                ds = GenevalPromptDataset(ds_dir, split)
            else:
                ds = TextPromptDataset(ds_dir, split)
        except (FileNotFoundError, OSError):
            print(f"split {split!r}: not found under {ds_dir}, skipping")
            continue
        prompts.extend(ds.prompts)
        print(f"split {split!r}: {len(ds.prompts)} prompts")
    out = write_store(args.out, prompts, encode, batch_size=args.batch,
                      progress=True)
    print(f"wrote {out} ({len(set(prompts))} unique prompts)")


if __name__ == "__main__":
    main()
