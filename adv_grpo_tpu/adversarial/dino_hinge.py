"""DINO discriminator-head hinge loss (CLS + random-patch level).

Re-derivation of the reference ``train_dino``
(scripts/train_sd3_fast_dino_patch.py:156-232): frozen DINOv2 backbone, a small
trainable head scored on real (reference) vs fake (generated) images:

  image_loss = 0.5 * (mean relu(1 - head(cls_real)) + mean relu(1 + head(cls_fake)))
  patch_loss = same over ``n_patches`` randomly sampled patch tokens per image
  d_loss     = image_loss + patch_loss_weight * patch_loss
  accuracy   = 0.5 * (mean(head(cls_real) > 0) + mean(head(cls_fake) < 0))
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DinoDStepResult(NamedTuple):
    loss: jax.Array
    image_loss: jax.Array
    patch_loss: jax.Array
    accuracy: jax.Array


def dino_hinge_loss(head_apply, head_params, tokens_real, tokens_fake, key,
                    n_patches: int = 64, patch_loss_weight: float = 0.3
                    ) -> DinoDStepResult:
    """tokens_*: (B, 1+N, D) frozen backbone features (CLS at index 0)."""
    cls_r, patch_r = tokens_real[:, 0], tokens_real[:, 1:]
    cls_f, patch_f = tokens_fake[:, 0], tokens_fake[:, 1:]

    logit_r = head_apply(head_params, cls_r)
    logit_f = head_apply(head_params, cls_f)
    image_loss = 0.5 * (jnp.mean(jax.nn.relu(1.0 - logit_r))
                        + jnp.mean(jax.nn.relu(1.0 + logit_f)))

    B, N, D = patch_r.shape
    n_sel = min(n_patches, N)
    k1, k2 = jax.random.split(key)
    idx_r = jax.random.randint(k1, (B, n_sel), 0, N)
    idx_f = jax.random.randint(k2, (B, n_sel), 0, N)
    sel_r = jnp.take_along_axis(patch_r, idx_r[..., None], axis=1)
    sel_f = jnp.take_along_axis(patch_f, idx_f[..., None], axis=1)
    pl_r = head_apply(head_params, sel_r)
    pl_f = head_apply(head_params, sel_f)
    patch_loss = 0.5 * (jnp.mean(jax.nn.relu(1.0 - pl_r))
                        + jnp.mean(jax.nn.relu(1.0 + pl_f)))

    loss = image_loss + patch_loss_weight * patch_loss
    acc = 0.5 * (jnp.mean((logit_r > 0).astype(jnp.float32))
                 + jnp.mean((logit_f < 0).astype(jnp.float32)))
    return DinoDStepResult(loss, image_loss, patch_loss, acc)


def dino_multi_hinge_loss(head_apply, fusion_apply, multi_params,
                          layer_tokens_real, layer_tokens_fake,
                          topk_tau: float = 0.2) -> DinoDStepResult:
    """Hinge D-loss through the dino_multi scoring topology: per-layer patch
    logits -> in-layer top-k pooling -> linear fusion -> +/-1 hinge on
    real/fake. Trains heads AND fusion jointly so the D-step optimises exactly
    the quantity the reward reads (reference scorer contract
    adv_grpo/rewards.py:437-559; the reference ships no multi D-step — this is
    the hinge analogue of its single-head train_dino,
    train_sd3_fast_dino_patch.py:156-232).

    layer_tokens_*: list of (B, 1+N, D) frozen per-layer token stacks, one per
    configured layer id, in layer order (matching multi_params['heads']).
    """

    def fused_logit(tokens_list):
        pooled_layers = []
        for head_params, tokens in zip(multi_params["heads"], tokens_list):
            patch = tokens[:, 1:]
            logits = head_apply(head_params, patch)  # (B, N)
            k = max(1, int(patch.shape[1] * topk_tau))
            pooled_layers.append(jnp.mean(jax.lax.top_k(logits, k)[0], axis=1))
        stacked = jnp.stack(pooled_layers, axis=1)  # (B, T)
        return fusion_apply(multi_params["fusion"], stacked)  # (B,)

    logit_r = fused_logit(layer_tokens_real)
    logit_f = fused_logit(layer_tokens_fake)
    loss = 0.5 * (jnp.mean(jax.nn.relu(1.0 - logit_r))
                  + jnp.mean(jax.nn.relu(1.0 + logit_f)))
    acc = 0.5 * (jnp.mean((logit_r > 0).astype(jnp.float32))
                 + jnp.mean((logit_f < 0).astype(jnp.float32)))
    return DinoDStepResult(loss, loss, jnp.zeros_like(loss), acc)
