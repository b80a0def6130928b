"""Host-side VLM judge rewards: Qwen2.5-VL aesthetic rubric + ImageReward.

These run on host (or a separate serving job) like the reference
(adv_grpo/qwenvl.py, adv_grpo/imagereward_scorer.py) — they are autoregressive
VLMs, not batched TPU scorers. Model loading is gated: environments without the
checkpoints get a clear error, and the score-extraction logic (the part that
defines reward semantics) is importable and unit-tested standalone.
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np

# The grading rubric, VERBATIM from the reference (adv_grpo/qwenvl.py:40-58):
# a pure-aesthetic 5-point scale judged from the image alone (the text prompt
# is NOT shown to the judge), answer wrapped in <Score></Score>.
QWENVL_RUBRIC = """
Your role is to evaluate the aesthetic quality score of given images.
1. Bad: Extremely blurry, underexposed with significant noise, indiscernible
subjects, and chaotic composition.
2. Poor: Noticeable blur, poor lighting, washed-out colors, and awkward
composition with cut-off subjects.
3. Fair: In focus with adequate lighting, dull colors, decent composition but
lacks creativity.
4. Good: Sharp, good exposure, vibrant colors, thoughtful composition with
a clear focal point.
5. Excellent: Exceptional clarity, perfect exposure, rich colors, masterful
composition with emotional impact.

Please first provide a detailed analysis of the evaluation process, including the criteria for judging aesthetic quality, within the <Thought> tag. Then, give a final score from 1 to 5 within the <Score> tag.
<Thought>
[Analyze the evaluation process in detail here]
</Thought>
<Score>X</Score>
"""


def extract_qwenvl_score(text: str, scale: float = 5.0) -> float:
    """<Score>X</Score> regex, normalised to [0, 1] (reference qwenvl.py:16-24,
    :91-98); malformed output -> 0."""
    m = re.search(r"<Score>\s*([0-9]+(?:\.[0-9]+)?)\s*</Score>", text)
    if not m:
        return 0.0
    return min(max(float(m.group(1)), 0.0) / scale, 1.0)


class QwenVLScorer:
    """Batched Qwen2.5-VL judge. Requires a local checkpoint dir."""

    def __init__(self, model_dir: Optional[str] = None, generate_fn=None):
        self.generate_fn = generate_fn
        if generate_fn is None:
            if not model_dir:
                raise RuntimeError(
                    "QwenVLScorer needs model_dir (local Qwen2.5-VL checkpoint) "
                    "or an injected generate_fn(images_u8, prompts) -> List[str]")
            self.generate_fn = self._make_hf_generate(model_dir)

    @staticmethod
    def _make_hf_generate(model_dir: str):  # pragma: no cover - needs weights
        import transformers

        processor = transformers.AutoProcessor.from_pretrained(model_dir)
        model = transformers.AutoModelForVision2Seq.from_pretrained(model_dir)

        def generate(images_u8, prompts):
            from PIL import Image

            texts = []
            for arr, prompt in zip(images_u8, prompts):
                del prompt  # the reference judge grades the image alone
                messages = [{"role": "user", "content": [
                    {"type": "image"},
                    {"type": "text", "text": QWENVL_RUBRIC},
                ]}]
                chat = processor.apply_chat_template(messages,
                                                     add_generation_prompt=True)
                inputs = processor(text=[chat], images=[Image.fromarray(arr)],
                                   return_tensors="pt")
                out = model.generate(**inputs, max_new_tokens=2048)  # the rubric asks for a <Thought> analysis before <Score> (reference qwenvl.py:91)
                texts.append(processor.batch_decode(out)[0])
            return texts

        return generate

    def __call__(self, images_u8, prompts: List[str]) -> np.ndarray:
        texts = self.generate_fn(images_u8, prompts)
        return np.asarray([extract_qwenvl_score(t) for t in texts], np.float64)


class ImageRewardScorer:
    """BLIP-based ImageReward (reference adv_grpo/imagereward_scorer.py:12-21
    wraps the pip package's inference_rank).

    Resolution order: injected ``score_fn`` -> the pip package -> the NATIVE
    Flax implementation (models/blip.py ImageRewardModel) loaded from a local
    checkpoint: ``IMAGEREWARD_PT`` (the torch .pt state dict) plus
    ``BERT_TOKENIZER_DIR`` (the med-BERT tokenizer)."""

    def __init__(self, model_path: Optional[str] = None, score_fn=None):
        self.score_fn = score_fn
        if score_fn is not None:
            return
        try:  # pragma: no cover - needs package+weights
            import ImageReward as RM

            model = RM.load(model_path or "ImageReward-v1.0")

            def score_fn(prompt, pil_images):
                _, scores = model.inference_rank(prompt, pil_images)
                return scores

            self.score_fn = score_fn
            return
        except ImportError:
            pass
        import os

        pt = model_path or os.environ.get("IMAGEREWARD_PT", "")
        tok_dir = os.environ.get("BERT_TOKENIZER_DIR", "")
        if pt and os.path.exists(pt) and os.path.isdir(tok_dir):
            self.score_fn = self._make_native(pt, tok_dir)
            return
        raise RuntimeError(
            "ImageRewardScorer needs one of: an injected "
            "score_fn(prompt, pil_images), the ImageReward pip package, or "
            "IMAGEREWARD_PT (local .pt checkpoint) + BERT_TOKENIZER_DIR "
            "for the native Flax path")

    @staticmethod
    def _make_native(pt_path: str, tokenizer_dir: str):  # pragma: no cover
        """Native path: convert the checkpoint once, score with the jitted
        Flax model (models/blip.py) — no torch at inference time."""
        import jax
        import jax.numpy as jnp
        import torch
        import transformers

        from adv_grpo_tpu.models import convert
        from adv_grpo_tpu.models.blip import ImageRewardModel

        sd = {k: v.float().numpy() for k, v in torch.load(
            pt_path, map_location="cpu", weights_only=True).items()}
        model = ImageRewardModel()
        params = convert.convert_imagereward(sd)
        tok = transformers.BertTokenizer.from_pretrained(tokenizer_dir)

        def score_fn(prompt, pil_images):
            ids = tok([prompt], padding="max_length", truncation=True,
                      max_length=35, return_tensors="np")
            imgs = np.stack([np.asarray(im, np.float32).transpose(2, 0, 1)
                             / 255.0 * 2.0 - 1.0 for im in pil_images])
            return np.asarray(model.score(
                params, jnp.asarray(imgs),
                jnp.asarray(np.repeat(ids.input_ids, len(pil_images), 0)),
                jnp.asarray(np.repeat(ids.attention_mask, len(pil_images),
                                      0).astype(bool))))

        return score_fn

    def __call__(self, images_u8, prompts: List[str]) -> np.ndarray:
        from PIL import Image

        out = []
        for arr, prompt in zip(images_u8, prompts):
            scores = self.score_fn(prompt, [Image.fromarray(arr)])
            out.append(float(np.atleast_1d(scores)[0]))
        return np.asarray(out, np.float64)
