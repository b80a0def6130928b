"""Device-side neural reward scorers (batched, jitted).

Each scorer owns its Flax modules + params and exposes
``score(images, text_ids or embeds, ...) -> (B,) float`` plus the feature hooks
the adversarial D-steps need. Parity targets in adv_grpo/rewards.py (file:line
per class). Weights load via models.convert from local HF checkpoints; tests run
tiny random-init configs — scorer VALUES are weight-dependent, scorer MATH is
what these classes pin down.
"""

from __future__ import annotations

import dataclasses
import functools


import jax
import jax.numpy as jnp

from adv_grpo_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from adv_grpo_tpu.models.vit import ViTConfig, VisionTransformer
from adv_grpo_tpu.models.aesthetic import AestheticHead
from adv_grpo_tpu.rewards.preprocess import (
    preprocess, CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD,
)


def _l2norm(x, axis=-1):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


@dataclasses.dataclass
class CLIPDualEncoder:
    """A CLIP text+vision pair with a learnable logit scale (the trainable unit
    of the adversarial PickScore loop)."""

    text_cfg: CLIPTextConfig
    vision_cfg: ViTConfig
    image_size: int = 224

    def __post_init__(self):
        self.text_model = CLIPTextEncoder(self.text_cfg)
        self.vision_model = VisionTransformer(self.vision_cfg)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        ids = jnp.zeros((1, self.text_cfg.max_position_embeddings), jnp.int32)
        img = jnp.zeros((1, 3, self.image_size, self.image_size))
        return {
            "text": self.text_model.init(k1, ids)["params"],
            "vision": self.vision_model.init(k2, img)["params"],
            "logit_scale": jnp.asarray(4.6052, jnp.float32),  # log(100)
        }

    def text_features(self, params, input_ids):
        _, _, pooled = self.text_model.apply({"params": params["text"]}, input_ids)
        return pooled

    def image_features(self, params, pixel_values):
        out = self.vision_model.apply({"params": params["vision"]}, pixel_values)
        return out["pooled"]


class PickScoreScorer:
    """PickScore CLIP-H: score = logit_scale * (text . image) / 26
    (reference adv_grpo/pickscore_scorer.py:47-51; /26 keeps scores ~0-1)."""

    def __init__(self, text_cfg=None, vision_cfg=None, image_size=224):
        self.clip = CLIPDualEncoder(
            text_cfg or CLIPTextConfig.clip_h_text(),
            vision_cfg or ViTConfig.clip_h(),
            image_size=image_size,
        )
        self.image_size = image_size
        # compile the hot paths once per shape: the reward loop calls these
        # every sampling batch, and eager per-op dispatch would dominate the
        # epoch (params stay ARGUMENTS so live co-trained weights flow through)
        self.score = jax.jit(self.score)
        self.features = jax.jit(self.features)

    def init_params(self, key):
        return self.clip.init_params(key)

    def preprocess(self, images):
        return preprocess(images, self.image_size, CLIP_MEAN, CLIP_STD)

    def features(self, params, images, input_ids):
        pix = self.preprocess(images)
        img = _l2norm(self.clip.image_features(params, pix))
        txt = _l2norm(self.clip.text_features(params, input_ids))
        return img, txt

    def score(self, params, images, input_ids):
        img, txt = self.features(params, images, input_ids)
        logit_scale = jnp.exp(params["logit_scale"])
        return logit_scale * jnp.sum(txt * img, axis=-1) / 26.0


class CLIPScorer:
    """CLIP-L text-image score /30 + image-image similarity
    (reference adv_grpo/clip_scorer.py:47-71)."""

    def __init__(self, text_cfg=None, vision_cfg=None, image_size=224):
        self.clip = CLIPDualEncoder(
            text_cfg or CLIPTextConfig.clip_l(),
            vision_cfg or ViTConfig.clip_l(),
            image_size=image_size,
        )
        self.image_size = image_size
        self.score = jax.jit(self.score)
        self.image_similarity = jax.jit(self.image_similarity)

    def init_params(self, key):
        return self.clip.init_params(key)

    def score(self, params, images, input_ids):
        pix = preprocess(images, self.image_size, CLIP_MEAN, CLIP_STD)
        img = _l2norm(self.clip.image_features(params, pix))
        txt = _l2norm(self.clip.text_features(params, input_ids))
        logit_scale = jnp.exp(params["logit_scale"])
        return logit_scale * jnp.sum(txt * img, axis=-1) / 30.0

    def image_similarity(self, params, images_a, images_b):
        pa = preprocess(images_a, self.image_size, CLIP_MEAN, CLIP_STD)
        pb = preprocess(images_b, self.image_size, CLIP_MEAN, CLIP_STD)
        fa = _l2norm(self.clip.image_features(params, pa))
        fb = _l2norm(self.clip.image_features(params, pb))
        return jnp.sum(fa * fb, axis=-1)


class AestheticScorer:
    """CLIP-L image embedding -> LAION MLP head
    (reference adv_grpo/aesthetic_scorer.py:33-53)."""

    def __init__(self, vision_cfg=None, image_size=224):
        self.vision_cfg = vision_cfg or ViTConfig.clip_l()
        self.vision = VisionTransformer(self.vision_cfg)
        self.head = AestheticHead()
        self.image_size = image_size
        self.score = jax.jit(self.score)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        img = jnp.zeros((1, 3, self.image_size, self.image_size))
        vparams = self.vision.init(k1, img)["params"]
        dim = self.vision_cfg.projection_dim
        hparams = self.head.init(k2, jnp.zeros((1, dim)))["params"]
        return {"vision": vparams, "head": hparams}

    def score(self, params, images):
        pix = preprocess(images, self.image_size, CLIP_MEAN, CLIP_STD)
        emb = self.vision.apply({"params": params["vision"]}, pix)["pooled"]
        return self.head.apply({"params": params["head"]}, emb)


class DINOScorer:
    """DINOv2 backbone feature extraction + similarity / discriminator scores.

    Covers reference scorers:
      * image_similarity_score (rewards.py:147-203): cosine(CLS, refs).max over
        per-prompt reference images, 518px ImageNet preprocessing
      * dino_cotrain_score (:266-294): trained head on frozen CLS
      * dino_patch_cotrain_score (:375-434): 0.7 * head(CLS) + 0.3 *
        mean(head(random patches))
    """

    def __init__(self, vision_cfg=None, image_size=518, head_hidden=512):
        self.vision_cfg = vision_cfg or ViTConfig.dinov2_base()
        self.vision = VisionTransformer(self.vision_cfg)
        self.image_size = image_size
        self.head_hidden = head_hidden
        import flax.linen as nn

        class DINOHead(nn.Module):
            hidden: int

            @nn.compact
            def __call__(self, x):
                h = nn.Dense(self.hidden, param_dtype=jnp.float32, name="fc1")(x)
                h = nn.gelu(h, approximate=False)
                return nn.Dense(1, param_dtype=jnp.float32, name="fc2")(h).squeeze(-1)

        self.head = DINOHead(self.head_hidden)
        self.features = jax.jit(self.features)
        self.similarity_to_refs = jax.jit(self.similarity_to_refs)
        self.similarity_to_refs_with_feats = jax.jit(
            self.similarity_to_refs_with_feats)
        self.cotrain_score = jax.jit(self.cotrain_score)
        self.patch_cotrain_score = jax.jit(
            self.patch_cotrain_score,
            static_argnames=("n_patches", "cls_weight", "patch_weight"))

    def init_backbone(self, key):
        img = jnp.zeros((1, 3, self.image_size, self.image_size))
        return self.vision.init(key, img)["params"]

    def init_head(self, key):
        dim = self.vision_cfg.hidden_size
        return self.head.init(key, jnp.zeros((1, dim)))["params"]

    def preprocess(self, images):
        return preprocess(images, self.image_size, IMAGENET_MEAN, IMAGENET_STD)

    def features(self, backbone_params, images):
        """-> (B, 1+N, D) tokens (CLS at 0), frozen backbone."""
        pix = self.preprocess(images)
        out = self.vision.apply({"params": backbone_params}, pix)
        return jax.lax.stop_gradient(out["tokens"])

    def similarity_to_refs(self, backbone_params, images, ref_images):
        """cosine(CLS(img), CLS(ref)).max over refs. ref_images: (B, R, 3, H, W)."""
        cls = _l2norm(self.features(backbone_params, images)[:, 0])
        B, R = ref_images.shape[:2]
        refs = ref_images.reshape((B * R,) + ref_images.shape[2:])
        ref_cls = _l2norm(self.features(backbone_params, refs)[:, 0])
        ref_cls = ref_cls.reshape(B, R, -1)
        sims = jnp.einsum("bd,brd->br", cls, ref_cls)
        return jnp.max(sims, axis=1)

    def similarity_to_refs_with_feats(self, backbone_params, images,
                                      ref_images):
        """Like similarity_to_refs, but also returns the CLS embeddings
        (reference image_similarity_score_eval, rewards.py:208-262, returns
        feat/ref_feat into score_details for eval observability)."""
        cls = _l2norm(self.features(backbone_params, images)[:, 0])
        B, R = ref_images.shape[:2]
        refs = ref_images.reshape((B * R,) + ref_images.shape[2:])
        ref_cls = _l2norm(self.features(backbone_params, refs)[:, 0])
        ref_cls = ref_cls.reshape(B, R, -1)
        sims = jnp.einsum("bd,brd->br", cls, ref_cls)
        return jnp.max(sims, axis=1), cls, ref_cls

    def cotrain_score(self, backbone_params, head_params, images):
        cls = self.features(backbone_params, images)[:, 0]
        return self.head.apply({"params": head_params}, cls)

    def patch_cotrain_score(self, backbone_params, head_params, images, key,
                            n_patches=64, cls_weight=0.7, patch_weight=0.3):
        toks = self.features(backbone_params, images)
        cls, patches = toks[:, 0], toks[:, 1:]
        B, N, D = patches.shape
        n_sel = min(n_patches, N)
        idx = jax.random.randint(key, (B, n_sel), 0, N)
        sel = jnp.take_along_axis(patches, idx[..., None], axis=1)
        cls_logit = self.head.apply({"params": head_params}, cls)
        patch_logit = self.head.apply({"params": head_params}, sel)
        return cls_weight * cls_logit + patch_weight * jnp.mean(patch_logit, axis=1)


class SigLIPScorer:
    """SigLIP vision-tower scorers.

    * image_similarity (reference rewards.py:69-143): cosine(pooled(img),
      pooled(ref)).max over a shared reference pool, 0.5/0.5 preprocessing.
    * cotrain (reference :299-372): trainable head on the frozen pooled
      embedding scoring real-vs-fake (the reference adds a tiny color jitter
      during its D-step; deterministic scoring path here — jitter belongs to
      the D-step's data augmentation, not the reward).
    """

    def __init__(self, vision_cfg=None, image_size=None, head_hidden=512):
        from adv_grpo_tpu.models.siglip import SigLIPVisionConfig, SigLIPVisionTower
        import flax.linen as nn

        self.vision_cfg = vision_cfg or SigLIPVisionConfig.so400m()
        self.vision = SigLIPVisionTower(self.vision_cfg)
        self.image_size = image_size or self.vision_cfg.image_size

        class Head(nn.Module):
            hidden: int

            @nn.compact
            def __call__(self, x):
                h = nn.Dense(self.hidden, param_dtype=jnp.float32, name="fc1")(x)
                h = nn.gelu(h, approximate=False)
                return nn.Dense(1, param_dtype=jnp.float32, name="fc2")(h).squeeze(-1)

        self.head = Head(head_hidden)
        self.pooled = jax.jit(self.pooled)
        self.similarity_to_refs = jax.jit(self.similarity_to_refs)
        self.cotrain_score = jax.jit(self.cotrain_score)

    def init_backbone(self, key):
        img = jnp.zeros((1, 3, self.image_size, self.image_size))
        return self.vision.init(key, img)["params"]

    def init_head(self, key):
        return self.head.init(key, jnp.zeros((1, self.vision_cfg.hidden_size)))["params"]

    def pooled(self, backbone_params, images):
        from adv_grpo_tpu.rewards.preprocess import preprocess, SIGLIP_MEAN, SIGLIP_STD

        pix = preprocess(images, self.image_size, SIGLIP_MEAN, SIGLIP_STD)
        out = self.vision.apply({"params": backbone_params}, pix)
        return jax.lax.stop_gradient(out["pooled"])

    def similarity_to_refs(self, backbone_params, images, ref_images):
        """cosine to a SHARED reference pool, max over refs (reference :133-139
        computes an [N, M] matrix against all refs). ref_images: (M, 3, H, W)."""
        emb = _l2norm(self.pooled(backbone_params, images))
        ref = _l2norm(self.pooled(backbone_params, ref_images))
        return jnp.max(emb @ ref.T, axis=1)

    def cotrain_score(self, backbone_params, head_params, images):
        return self.head.apply({"params": head_params},
                               self.pooled(backbone_params, images))


@functools.partial(jax.jit, static_argnums=0)
def pickscore_patch_score(scorer: "PickScoreScorer", params, images, input_ids):
    """Per-patch PickScore: project ALL vision tokens through the visual
    projection, average text-patch cosine, * logit_scale / 26
    (reference adv_grpo/pickscore_scorer_patch.py:42-60)."""
    pix = scorer.preprocess(images)
    out = scorer.clip.vision_model.apply({"params": params["vision"]}, pix)
    proj = params["vision"]["visual_projection"]["kernel"]
    # pre-post_layernorm tokens: HF's last_hidden_state, which the reference
    # projects (pickscore_scorer_patch.py:42-46) — the LN'd view would skew
    # every patch embedding
    patch_emb = out["tokens_pre_norm"] @ proj  # (B, 1+N, proj_dim)
    patch_emb = _l2norm(patch_emb)
    txt = _l2norm(scorer.clip.text_features(params, input_ids))
    patch_scores = jnp.einsum("bd,bnd->bn", txt, patch_emb)
    return jnp.exp(params["logit_scale"]) * jnp.mean(patch_scores, axis=1) / 26.0


@functools.partial(jax.jit, static_argnums=0,
                   static_argnames=("beta", "top_n"))
def contrastive_external_reward(scorer: "PickScoreScorer", params, images,
                                ref_images, input_ids, ref_input_ids=None,
                                beta: float = 0.5, top_n: int = 2):
    """Reward-hacking correction by contrastive embedding shift
    (reference adv_grpo/rewards.py:709-758): if the external (reference-image)
    mean score doesn't dominate the top generated scores, push scores toward
    the external anchor and away from the suspected-hack embeddings:
        adjusted = score + beta * (cos(img, anchor) - mean_j cos(img, hack_j))
    """
    img_emb, txt = scorer.features(params, images, input_ids)
    pix_ref = scorer.preprocess(ref_images)
    ref_emb = _l2norm(scorer.clip.image_features(params, pix_ref))
    logit_scale = jnp.exp(params["logit_scale"])
    scores = logit_scale * jnp.sum(txt * img_emb, axis=-1) / 26.0
    # external score per reference image: mean text-similarity over the batch's
    # prompts (the ref pool is shared; batch prompts are its judges)
    ref_scores = logit_scale * jnp.mean(txt @ ref_emb.T, axis=0) / 26.0

    anchor = _l2norm(jnp.mean(ref_emb, axis=0, keepdims=True))
    ext_score = jnp.mean(ref_scores)
    k = min(top_n, scores.shape[0])
    top_idx = jax.lax.top_k(scores, k)[1]
    hack_embeds = img_emb[top_idx]  # (k, D)
    hack_max = jnp.max(scores[top_idx])

    sim_to_ext = jnp.sum(img_emb * anchor, axis=-1)
    sim_to_hack = jnp.mean(img_emb @ hack_embeds.T, axis=1)
    adjusted = scores + beta * (sim_to_ext - sim_to_hack)
    # gate: no correction when the external anchor already dominates (:737-738)
    out = jnp.where(ext_score >= hack_max, scores, adjusted)
    return out, {"raw_scores": scores, "ref_scores": ref_scores}


class DINOMultiScorer:
    """Multi-layer DINO discriminator reward: per-layer heads on intermediate
    block outputs, top-k patch-logit pooling, linear fusion, sigmoid calibration
    (reference adv_grpo/rewards.py:437-559 dino_multi_cotrain_score)."""

    def __init__(self, dino: "DINOScorer", layer_ids=(8,), head_hidden=512,
                 topk_tau: float = 0.2, temperature: float = 0.2):
        import flax.linen as nn

        self.dino = dino
        self.layer_ids = tuple(layer_ids)
        self.topk_tau = float(topk_tau)
        self.temperature = float(temperature)  # preset config.temperature

        class Fusion(nn.Module):
            @nn.compact
            def __call__(self, x):  # (B, T) -> (B,)
                return nn.Dense(1, param_dtype=jnp.float32,
                                name="fuse")(x).squeeze(-1)

        self.fusion = Fusion()
        self.score = jax.jit(self.score, static_argnames=(
            "topk_tau", "temperature", "apply_sigmoid"))

    def init_heads(self, key):
        keys = jax.random.split(key, len(self.layer_ids) + 1)
        heads = [self.dino.head.init(
            k, jnp.zeros((1, self.dino.vision_cfg.hidden_size)))["params"]
            for k in keys[:-1]]
        fusion = self.fusion.init(
            keys[-1], jnp.zeros((1, len(self.layer_ids))))["params"]
        return {"heads": heads, "fusion": fusion}

    def score(self, backbone_params, multi_params, images, *, topk_tau=None,
              temperature=None, apply_sigmoid=True):
        topk_tau = self.topk_tau if topk_tau is None else topk_tau
        temperature = self.temperature if temperature is None else temperature
        pix = self.dino.preprocess(images)
        out = self.dino.vision.apply({"params": backbone_params}, pix,
                                     capture_layers=self.layer_ids)
        per_layer = []
        for head_params, lid in zip(multi_params["heads"], self.layer_ids):
            tokens = jax.lax.stop_gradient(out["layer_tokens"][lid])
            patch = tokens[:, 1:]
            logits = self.dino.head.apply({"params": head_params}, patch)  # (B, N)
            k = max(1, int(patch.shape[1] * topk_tau))
            pooled = jnp.mean(jax.lax.top_k(logits, k)[0], axis=1)
            per_layer.append(pooled)
        stacked = jnp.stack(per_layer, axis=1)  # (B, T)
        logits = self.fusion.apply({"params": multi_params["fusion"]}, stacked)
        if apply_sigmoid:
            return jax.nn.sigmoid(logits / temperature)
        return logits
