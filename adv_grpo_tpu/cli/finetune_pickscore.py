"""Standalone offline PickScore preference finetune + accuracy eval.

TPU-native equivalent of the reference's self-contained reward-model
pretraining loop ``finetune_pickscore_distributed``
(adv_grpo/pick_score_training.py:314-373) with its ``QwenSD3JsonDataset``
(:228-282) and ``evaluate_pickscore`` (:19-73):

  * dataset: ``prompt2img.json`` {prompt: filename} shared by a good
    (Qwen render) and a bad (SD3 render) directory — PreferencePairDataset;
  * loss: the same CLIPCriterion preference cross-entropy over
    (text, good, bad) logit pairs, labels (1, 0), as ONE jitted
    AdamW(lr, reference default 1e-6) step over the FULL CLIP tree
    (the reference optimizes model.parameters(); pass --tune_layer to
    restrict to the last N ViT blocks like the in-trainer D-step instead);
  * eval: mean good/bad scores (the reference prints these) PLUS preference
    accuracy — the fraction of pairs ranked good > bad — before training and
    after every epoch;
  * output: ``pickscore_finetuned.msgpack`` (flax serialization) consumable
    as the trainer's D warm-start via ``config.weight_path``
    (train/driver.py restore_discriminator), mirroring the reference's
    save_pretrained -> config.weight_path flow (:518-523).

The reference's DDP/DistributedSampler shell is the torch answer to data
parallelism; here the loop is single-controller and the batch shards over
the mesh implicitly through jit ("computation follows data") — multi-chip
scale-out needs no code change, only more devices.
"""

from __future__ import annotations

import argparse
import json
import os
import zlib

import numpy as np


def main(argv=None):
    from adv_grpo_tpu.cli.common import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--json_file", required=True,
                        help="prompt2img.json {prompt: filename}")
    parser.add_argument("--good_dir", required=True,
                        help="preferred renders (reference: Qwen-Image)")
    parser.add_argument("--bad_dir", required=True,
                        help="dispreferred renders (reference: SD3)")
    parser.add_argument("--out", default="pickscore_finetune_out")
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-6)
    parser.add_argument("--max_eval", type=int, default=100)
    parser.add_argument("--resolution", type=int, default=None,
                        help="image load size (default: scorer input size)")
    parser.add_argument("--in_batch_negatives", action="store_true",
                        help="CLIPCriterion in-batch mode (reference "
                             "CLIPCriterionConfig.in_batch_negatives)")
    parser.add_argument("--tune_layer", type=int, default=None,
                        help="restrict training to the last N vision blocks "
                             "(default: full model, like the reference loop)")
    parser.add_argument("--tokenizer", default=os.environ.get("TOKENIZER_DIR", ""),
                        help="local CLIPTokenizer dir (zero-egress)")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny random-init scorer (CI / plumbing runs)")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from adv_grpo_tpu.adversarial.clip_criterion import (
        pickscore_d_step_loss_and_acc)
    from adv_grpo_tpu.data.datasets import PreferencePairDataset
    from adv_grpo_tpu.rewards.scorers import PickScoreScorer
    from adv_grpo_tpu.train.grpo_trainer import scorer_trainable_mask

    if args.smoke:
        from adv_grpo_tpu.models.clip_text import CLIPTextConfig
        from adv_grpo_tpu.models.vit import ViTConfig

        scorer = PickScoreScorer(CLIPTextConfig.tiny(projection_dim=16),
                                 ViTConfig.tiny(projection_dim=16),
                                 image_size=28)
    else:
        scorer = PickScoreScorer()

    ps_dir = os.environ.get("PICKSCORE_DIR", "")
    if ps_dir and os.path.exists(ps_dir):
        from adv_grpo_tpu.models import convert

        sd = convert.load_torch_state_dict(ps_dir)
        params = convert.convert_clip_model(
            sd, scorer.clip.text_cfg.num_layers,
            scorer.clip.vision_cfg.num_layers)
    else:
        if not args.smoke:
            import warnings

            warnings.warn("PickScore CLIP-H is RANDOM-INIT: set PICKSCORE_DIR "
                          "to a local checkpoint dir", stacklevel=2)
        params = scorer.init_params(jax.random.PRNGKey(args.seed))

    if args.tokenizer and os.path.isdir(args.tokenizer):
        import transformers

        tok = transformers.CLIPTokenizer.from_pretrained(args.tokenizer)

        def tokenize(prompts):
            return tok(prompts, padding="max_length", max_length=77,
                       truncation=True, return_tensors="np").input_ids
    else:
        max_len = scorer.clip.text_cfg.max_position_embeddings

        def tokenize(prompts):
            # deterministic hash ids (no tokenizer on disk): prompts still
            # separate in embedding space, values are not PickScore-parity.
            # crc32, NOT hash() — hash() is PYTHONHASHSEED-randomised per
            # process and would make offline finetunes irreproducible
            rng = [zlib.crc32(p.encode()) for p in prompts]
            return np.stack([
                np.asarray([(h + i * 2654435761) % 1000 % max(
                    scorer.clip.text_cfg.vocab_size - 2, 2) + 1
                    for i in range(max_len)], np.int32)
                for h in rng])

    resolution = args.resolution or scorer.image_size
    dataset = PreferencePairDataset(args.json_file, args.good_dir,
                                    args.bad_dir, resolution=resolution)
    if len(dataset) == 0:
        raise ValueError(f"{args.json_file} has no prompts")

    inner = optax.adamw(args.lr)
    if args.tune_layer is not None:
        tx = optax.masked(inner, scorer_trainable_mask(params, -abs(args.tune_layer)))
    else:
        tx = inner
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, good, bad, ids):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: pickscore_d_step_loss_and_acc(
                scorer, p, good, bad, ids,
                in_batch_negatives=args.in_batch_negatives),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    @jax.jit
    def eval_scores(params, good, bad, ids):
        return (scorer.score(params, good, ids),
                scorer.score(params, bad, ids))

    def evaluate(params, tag):
        """Preference accuracy + mean scores over the first max_eval pairs
        (reference evaluate_pickscore, pick_score_training.py:19-73)."""
        n = min(args.max_eval, len(dataset))
        goods, bads, total = [], [], 0
        correct = 0.0
        for start in range(0, n, args.batch):
            idx = list(range(start, min(start + args.batch, n)))
            prompts, good, bad = dataset.get_batch(idx)
            ids = jnp.asarray(tokenize(prompts))
            sg, sb = eval_scores(params, jnp.asarray(good), jnp.asarray(bad),
                                 ids)
            sg, sb = np.asarray(sg), np.asarray(sb)
            goods.append(sg)
            bads.append(sb)
            correct += float((sg > sb).sum())
            total += len(idx)
        m = dict(pref_accuracy=correct / max(total, 1),
                 good_score_mean=float(np.concatenate(goods).mean()),
                 bad_score_mean=float(np.concatenate(bads).mean()),
                 n_pairs=total)
        print(f"[eval {tag}] pref_accuracy={m['pref_accuracy']:.4f} "
              f"good={m['good_score_mean']:.4f} bad={m['bad_score_mean']:.4f} "
              f"({total} pairs)")
        return m

    os.makedirs(args.out, exist_ok=True)
    history = [dict(epoch=-1, **evaluate(params, "before"))]
    order_rng = np.random.default_rng(args.seed)
    steps_per_epoch = len(dataset) // args.batch or 1
    for epoch in range(args.epochs):
        perm = order_rng.permutation(len(dataset))
        losses, accs = [], []
        for b in range(steps_per_epoch):
            idx = perm[b * args.batch:(b + 1) * args.batch].tolist()
            if not idx:
                break
            prompts, good, bad = dataset.get_batch(idx)
            ids = jnp.asarray(tokenize(prompts))
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(good), jnp.asarray(bad), ids)
            losses.append(float(loss))
            accs.append(float(acc))
        m = evaluate(params, f"epoch {epoch}")
        history.append(dict(epoch=epoch, train_loss=float(np.mean(losses)),
                            train_pref_accuracy=float(np.mean(accs)), **m))
        print(f"===> epoch {epoch} | loss {np.mean(losses):.4f} "
              f"| train_acc {np.mean(accs):.4f}")

    out_path = os.path.join(args.out, "pickscore_finetuned.msgpack")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(args.out, "finetune_metrics.json"), "w") as f:
        json.dump(history, f, indent=1)
    print(f"saved finetuned PickScore to {out_path}")
    return {"params_path": out_path, "history": history}


if __name__ == "__main__":
    main()
