"""Multi-reward registry: weighted scorer ensembles.

Mirrors the reference ``multi_score`` contract (adv_grpo/rewards.py:1012-1095):
``multi_score(score_dict, ctx) -> fn(images, prompts, metadata, ref_images=...,
...) -> (score_details, {})`` where score_details maps each scorer name to its
per-sample scores and ``'avg'`` to the weight-summed ensemble. The same scorer
names are kept so reference configs port verbatim.

TPU re-design: device scorers (pickscore, clipscore, aesthetic, dino/similarity
families) consume the on-device image batch and run as jitted model calls;
host scorers (jpeg, ocr, remote judges) take the uint8 copy. A RewardContext
carries the live scorer objects + params (the co-trained discriminator state
the reference threads through ``scorer=``/``head=`` args, :1047-1081).
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from adv_grpo_tpu.native.lib import images_to_uint8


@dataclasses.dataclass
class RewardContext:
    """Everything scorers may need. Populate only what the preset uses."""

    pickscore: Optional[Any] = None  # PickScoreScorer
    pickscore_params: Optional[Any] = None  # live (possibly co-trained) params
    # frozen copy for the plain 'pickscore' metric: the reference keeps the
    # original CLIP-H separate from the co-trained scorer (rewards.py:561-589)
    pickscore_frozen_params: Optional[Any] = None
    clip: Optional[Any] = None  # CLIPScorer
    clip_params: Optional[Any] = None
    aesthetic: Optional[Any] = None  # AestheticScorer
    aesthetic_params: Optional[Any] = None
    dino: Optional[Any] = None  # DINOScorer
    dino_backbone_params: Optional[Any] = None
    dino_head_params: Optional[Any] = None  # live co-trained head
    dino_multi: Optional[Any] = None  # DINOMultiScorer
    dino_multi_params: Optional[Any] = None
    siglip: Optional[Any] = None  # SigLIPScorer
    siglip_backbone_params: Optional[Any] = None
    siglip_head_params: Optional[Any] = None
    tokenize: Optional[Callable[[List[str]], np.ndarray]] = None  # CLIP 77-tok
    ocr: Optional[Any] = None  # OcrScorer
    stylegan: Optional[Any] = None  # StyleGANScorer ('discriminator' reward)
    stylegan_params: Optional[Any] = None
    remote: Dict[str, Callable] = dataclasses.field(default_factory=dict)
    rng: Optional[Any] = None  # jax PRNG key for patch sampling
    # reward futures run in a thread pool: rng splits must be atomic
    rng_lock: Any = dataclasses.field(default_factory=threading.Lock)


def _require(obj, name, what):
    if obj is None:
        raise RuntimeError(f"reward '{name}' needs {what} in RewardContext")
    return obj


def multi_score(score_dict: Dict[str, float], ctx: RewardContext):
    """Build the weighted ensemble fn for the given {name: weight} dict."""

    def _device_scores(name, images, prompts, metadata, ref_images):
        import jax.numpy as jnp
        import jax

        if name == "pickscore":
            # FROZEN weights: must not drift with the co-trained scorer
            s = _require(ctx.pickscore, name, "pickscore scorer")
            ids = _require(ctx.tokenize, name, "tokenize")(prompts)
            params = (ctx.pickscore_frozen_params
                      if ctx.pickscore_frozen_params is not None
                      else ctx.pickscore_params)
            return np.asarray(s.score(params, images, jnp.asarray(ids)))
        if name == "pickscore_cotrain":
            # live co-trained params — same math, current weights (rewards.py:577-589)
            s = _require(ctx.pickscore, name, "pickscore scorer")
            ids = _require(ctx.tokenize, name, "tokenize")(prompts)
            return np.asarray(s.score(ctx.pickscore_params, images, jnp.asarray(ids)))
        if name == "clipscore":
            s = _require(ctx.clip, name, "clip scorer")
            ids = _require(ctx.tokenize, name, "tokenize")(prompts)
            return np.asarray(s.score(ctx.clip_params, images, jnp.asarray(ids)))
        if name == "aesthetic":
            s = _require(ctx.aesthetic, name, "aesthetic scorer")
            return np.asarray(s.score(ctx.aesthetic_params, images))
        if name == "image_similarity":
            s = _require(ctx.dino, name, "dino scorer")
            refs = _require(ref_images, name, "ref_images")
            return np.asarray(s.similarity_to_refs(ctx.dino_backbone_params,
                                                   images, refs))
        if name == "image_similarity_eval":
            # eval variant also surfaces the DINO CLS embeddings into
            # score_details (reference rewards.py:1061-1064 stores
            # feat/ref_feat from image_similarity_score_eval, :208-262)
            s = _require(ctx.dino, name, "dino scorer")
            refs = _require(ref_images, name, "ref_images")
            scores, feat, ref_feat = s.similarity_to_refs_with_feats(
                ctx.dino_backbone_params, images, refs)
            return (np.asarray(scores), np.asarray(feat),
                    np.asarray(ref_feat))
        if name == "dino_cotrain":
            s = _require(ctx.dino, name, "dino scorer")
            return np.asarray(s.cotrain_score(ctx.dino_backbone_params,
                                              ctx.dino_head_params, images))
        if name == "dino_patch_cotrain":
            s = _require(ctx.dino, name, "dino scorer")
            _require(ctx.rng, name, "rng key")
            with ctx.rng_lock:  # reward futures race on the shared key
                key, ctx.rng = jax.random.split(ctx.rng)
            return np.asarray(s.patch_cotrain_score(
                ctx.dino_backbone_params, ctx.dino_head_params, images, key))
        if name == "dino_multi_cotrain":
            s = _require(ctx.dino_multi, name, "dino_multi scorer")
            return np.asarray(s.score(ctx.dino_backbone_params,
                                      ctx.dino_multi_params, images))
        if name == "pickscore_patch":
            from adv_grpo_tpu.rewards.scorers import pickscore_patch_score

            s = _require(ctx.pickscore, name, "pickscore scorer")
            ids = _require(ctx.tokenize, name, "tokenize")(prompts)
            return np.asarray(pickscore_patch_score(
                s, ctx.pickscore_params, images, jnp.asarray(ids)))
        if name == "constractive_external":
            from adv_grpo_tpu.rewards.scorers import contrastive_external_reward

            s = _require(ctx.pickscore, name, "pickscore scorer")
            refs = _require(ref_images, name, "ref_images")
            refs = refs.reshape((-1,) + refs.shape[-3:]) if refs.ndim == 5 else refs
            ids = _require(ctx.tokenize, name, "tokenize")(prompts)
            scores, _ = contrastive_external_reward(
                s, ctx.pickscore_params, images, refs, jnp.asarray(ids))
            return np.asarray(scores)
        if name == "siglip_image_similarity":
            s = _require(ctx.siglip, name, "siglip scorer")
            refs = _require(ref_images, name, "ref_images")
            refs = refs.reshape((-1,) + refs.shape[-3:]) if refs.ndim == 5 else refs
            return np.asarray(s.similarity_to_refs(
                ctx.siglip_backbone_params, images, refs))
        if name == "siglip_cotrain":
            s = _require(ctx.siglip, name, "siglip scorer")
            return np.asarray(s.cotrain_score(
                ctx.siglip_backbone_params, ctx.siglip_head_params, images))
        raise KeyError(name)

    DEVICE = {"pickscore", "pickscore_cotrain", "clipscore", "aesthetic",
              "image_similarity", "image_similarity_eval", "dino_cotrain",
              "dino_patch_cotrain", "dino_multi_cotrain", "pickscore_patch",
              "constractive_external", "siglip_image_similarity",
              "siglip_cotrain"}
    HOST = {"jpeg_compressibility", "jpeg_incompressibility", "ocr", "video_ocr"}
    REMOTE = {"geneval", "deqa", "unifiedreward", "qwenvl", "imagereward",
              "discriminator"}

    for name in score_dict:
        if name not in DEVICE | HOST | REMOTE:
            raise KeyError(
                f"unknown reward '{name}' (known: {sorted(DEVICE | HOST | REMOTE)})"
            )

    def _fn(images, prompts, metadata=None, ref_images=None, only_strict=True):
        """images: device array (B,3,H,W) in [-1,1] (or numpy). Returns
        (score_details incl. 'avg', {})."""
        score_details: Dict[str, Any] = {}
        total = None
        images_u8 = None

        def u8():
            nonlocal images_u8
            if images_u8 is None:
                arr = np.asarray(images, np.float32)
                if arr.ndim == 5:  # video (B, T, C, H, W): per-frame convert
                    flat = images_to_uint8(arr.reshape((-1,) + arr.shape[-3:]))
                    images_u8 = flat.reshape(arr.shape[:2] + flat.shape[1:])
                else:
                    images_u8 = images_to_uint8(arr)
            return images_u8

        for name, weight in score_dict.items():
            if name == "geneval":
                # GenEval returns per-sample scores PLUS accuracy
                # decompositions that are surfaced into score_details
                # (reference rewards.py:1048-1054; only_strict skips the
                # non-strict pass during training, :1042)
                fn = _require(ctx.remote.get(name), name,
                              f"remote['{name}'] client")
                scores, rewards_g, strict, group_r, group_s = fn(
                    u8(), prompts, metadata or [{}] * len(prompts),
                    only_strict)
                score_details["accuracy"] = np.asarray(rewards_g, np.float64)
                score_details["strict_accuracy"] = np.asarray(strict,
                                                              np.float64)
                for key, value in group_s.items():
                    score_details[f"{key}_strict_accuracy"] = value
                for key, value in group_r.items():
                    score_details[f"{key}_accuracy"] = value
            elif name == "image_similarity_eval":
                scores, feat, ref_feat = _device_scores(
                    name, images, prompts, metadata, ref_images)
                score_details["feat"] = feat
                score_details["ref_feat"] = ref_feat
            elif name in DEVICE:
                scores = _device_scores(name, images, prompts, metadata, ref_images)
            elif name == "jpeg_compressibility":
                from adv_grpo_tpu.rewards.host import jpeg_compressibility
                scores = jpeg_compressibility(u8())
            elif name == "jpeg_incompressibility":
                from adv_grpo_tpu.rewards.host import jpeg_incompressibility
                scores = jpeg_incompressibility(u8())
            elif name in ("ocr", "video_ocr"):
                scorer = _require(ctx.ocr, name, "ocr scorer")
                scores = scorer(u8(), prompts)
            elif name == "discriminator" and ctx.stylegan is not None:
                # on-device StyleGAN D reward: sigmoid(D(images))
                # (reference rewards.py:611-638; remote hook as fallback)
                scores = np.asarray(ctx.stylegan.score(
                    ctx.stylegan_params, images))
            else:  # remote judges
                fn = ctx.remote.get(name)
                scores = _require(fn, name, f"remote['{name}'] client")(
                    u8(), prompts, metadata)
            scores = np.asarray(scores, dtype=np.float64)
            score_details[name] = scores
            total = weight * scores if total is None else total + weight * scores

        score_details["avg"] = total
        return score_details, {}

    return _fn
