"""Adversarial PickScore training: CLIP preference cross-entropy (JAX).

Re-derivation of the reference CLIPCriterion (adv_grpo/pick_score_training.py:89-224)
as a pure loss function over a CLIP dual encoder:

  features: L2-normalised text / image embeddings; images stacked [good ; bad]
  logits  : logit_scale * text @ images^T
  pairwise mode (in_batch_negatives=False, the trainers' mode,
  :176-189): per-sample 2-way CE over (own-good, own-bad) logits, weighted by
  (label_0, label_1); tie term adds log(0.5) (:183-185)
  in-batch mode (:148-165): CE against all images + image-side CE, averaged

Distributed: the reference all-gathers features differentiably across ranks
(:107-110 torch.distributed.nn.all_gather). Here the loss runs inside a
shard_map'd D-step; pass ``axis_name`` to apply ``jax.lax.all_gather`` with
gradient flow (JAX collectives are differentiable by construction).

The D-step objective (train_pickscore, train_sd3_fast_pickscore.py:151-183):
real = Qwen reference images (label 1), fake = policy samples (label 0).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CLIPCriterionBatch(NamedTuple):
    text_features: jax.Array  # (B, D) normalised
    image_0_features: jax.Array  # (B, D) normalised ("good"/real)
    image_1_features: jax.Array  # (B, D) normalised ("bad"/fake)
    label_0: jax.Array  # (B,)
    label_1: jax.Array  # (B,)


def clip_criterion_loss(
    batch: CLIPCriterionBatch,
    logit_scale,
    *,
    in_batch_negatives: bool = False,
    axis_name: Optional[str] = None,
):
    t, i0, i1 = batch.text_features, batch.image_0_features, batch.image_1_features
    l0, l1 = batch.label_0.astype(jnp.float32), batch.label_1.astype(jnp.float32)
    if axis_name is not None:
        gather = lambda x: jax.lax.all_gather(x, axis_name, tiled=True)
        t, i0, i1, l0, l1 = gather(t), gather(i0), gather(i1), gather(l0), gather(l1)

    all_img = jnp.concatenate([i0, i1], axis=0)  # (2B, D)
    text_logits = logit_scale * t @ all_img.T  # (B, 2B)
    B = t.shape[0]
    idx = jnp.arange(B)

    if in_batch_negatives:
        img_logits = logit_scale * all_img @ t.T  # (2B, B)
        img0_logits, img1_logits = jnp.split(img_logits, 2, axis=0)
        text_labels = idx
        ce = lambda logits, labels: -jax.nn.log_softmax(logits, axis=-1)[
            jnp.arange(logits.shape[0]), labels]
        image_loss = l0 * ce(img0_logits, text_labels) + l1 * ce(img1_logits, text_labels)
        text_0_loss = ce(text_logits, idx)  # label: own image_0 (index i)
        text_1_loss = ce(text_logits, idx + B)  # own image_1 (index B+i)
    else:
        t0, t1 = text_logits[:, :B], text_logits[:, B:]
        pair = jnp.stack([t0[idx, idx], t1[idx, idx]], axis=-1)  # (B, 2)
        logp = jax.nn.log_softmax(pair, axis=-1)
        text_0_loss = -logp[:, 0]
        text_1_loss = -logp[:, 1]

    text_loss = l0 * text_0_loss + l1 * text_1_loss
    # tie correction: ideal tie loss is 0 (reference :183-185)
    is_tie = (l0 == l1).astype(jnp.float32) * jnp.log(jnp.float32(0.5))
    text_loss = text_loss + is_tie
    if in_batch_negatives:
        return jnp.mean((image_loss + text_loss) / 2.0)
    return jnp.mean(text_loss)


def pickscore_d_step_loss(scorer, params, images_real, images_fake, input_ids,
                          *, axis_name=None):
    """Full D-step loss: featurise through the live scorer then the criterion
    with labels (1, 0) (reference train_pickscore, :151-183)."""
    loss, _ = pickscore_d_step_loss_and_acc(
        scorer, params, images_real, images_fake, input_ids,
        axis_name=axis_name)
    return loss


def pickscore_d_step_loss_and_acc(scorer, params, images_real, images_fake,
                                  input_ids, *, axis_name=None,
                                  in_batch_negatives=False):
    """D-step loss plus preference accuracy: the fraction of pairs where the
    scorer ranks the real (reference) image above the generated one — the
    D-health metric the reference's PickScore branch never logs (it reports
    only loss, train_sd3_fast_pickscore.py:1032-1034; the DINO branch reports
    accuracy, ..._dino_patch.py:156-232) and evaluate_pickscore approximates
    offline (pick_score_training.py:19-73). Accuracy is computed on this
    shard's pairs (no gather) — it is a diagnostic, not a loss term."""
    img_r, txt = scorer.features(params, images_real, input_ids)
    img_f, _ = scorer.features(params, images_fake, input_ids)
    batch = CLIPCriterionBatch(
        text_features=txt, image_0_features=img_r, image_1_features=img_f,
        label_0=jnp.ones(txt.shape[0]), label_1=jnp.zeros(txt.shape[0]),
    )
    loss = clip_criterion_loss(batch, jnp.exp(params["logit_scale"]),
                               axis_name=axis_name,
                               in_batch_negatives=in_batch_negatives)
    s_r = jnp.sum(txt * img_r, axis=-1)  # logit_scale cancels in the compare
    s_f = jnp.sum(txt * img_f, axis=-1)
    acc = jnp.mean((s_r > s_f).astype(jnp.float32))
    return loss, jax.lax.stop_gradient(acc)
