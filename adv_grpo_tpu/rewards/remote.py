"""Reference-protocol remote reward clients.

Speaks the exact wire formats of the reference's reward servers
(adv_grpo/rewards.py:761-1010) so existing deployments work unchanged:

  * GenEval object-detection judge — pickled ``{"images": [jpeg bytes],
    "meta_datas": [...], "only_strict": bool}`` POST, response carries
    ``scores / rewards / strict_rewards / group_rewards /
    group_strict_rewards`` (rewards.py:812-881).
  * DeQA quality judge — pickled ``{"images": [jpeg bytes]}`` POST,
    response ``{"outputs": [...]}`` (:761-808).
  * UnifiedReward (pickle flavour) — ``{"images": ..., "prompts": ...}``
    (:884-940).
  * UnifiedReward (sglang flavour) — OpenAI-compatible /chat/completions
    with a base64 PNG image + the verbatim rubric, ``Final Score: X``
    regex extraction, /5 normalisation (:942-1010).

All HTTP clients mount the reference's retry policy: Retry(total=1000,
backoff_factor=1, status_forcelist=[500]) (:773-775). Images arrive as
(N, H, W, 3) uint8 (the registry's host-image copy).
"""

from __future__ import annotations

import io
import re
from typing import List, Optional

import numpy as np

GENEVAL_URL = "http://127.0.0.1:18085"
DEQA_URL = "http://127.0.0.1:18086"
UNIFIEDREWARD_SGLANG_URL = "http://127.0.0.1:17140/v1"

# verbatim reference judge rubric (rewards.py:986 evaluate_image)
UNIFIEDREWARD_QUESTION = (
    "<image>\nYou are given a text caption and a generated image based on that "
    "caption. Your task is to evaluate this image based on two key criteria:\n"
    "1. Alignment with the Caption: Assess how well this image aligns with the "
    "provided caption. Consider the accuracy of depicted objects, their "
    "relationships, and attributes as described in the caption.\n"
    "2. Overall Image Quality: Examine the visual quality of this image, "
    "including clarity, detail preservation, color accuracy, and overall "
    "aesthetic appeal.\nBased on the above criteria, assign a score from 1 to "
    "5 after 'Final Score:'.\nYour task is provided as follows:\nText Caption: "
    "[{prompt}]"
)

_FINAL_SCORE_RE = re.compile(r"Final Score:\s*([1-5](?:\.\d+)?)")


def _session(max_retries: int = 1000, backoff: float = 1.0):
    import requests
    from requests.adapters import HTTPAdapter
    from urllib3.util.retry import Retry

    sess = requests.Session()
    retries = Retry(total=max_retries, backoff_factor=backoff,
                    status_forcelist=[500], allowed_methods=False)
    sess.mount("http://", HTTPAdapter(max_retries=retries))
    return sess


def jpeg_bytes(images_u8: np.ndarray) -> List[bytes]:
    from PIL import Image

    out = []
    for arr in images_u8:
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        out.append(buf.getvalue())
    return out


def png_base64(image_u8: np.ndarray, resize: Optional[int] = 512) -> str:
    import base64

    from PIL import Image

    img = Image.fromarray(image_u8)
    if resize:
        img = img.resize((resize, resize))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image;base64," + base64.b64encode(buf.getvalue()).decode()


def extract_final_scores(text_outputs: List[str]) -> List[float]:
    """'Final Score: X' regex extraction, 0.0 on miss (rewards.py:955-967)."""
    scores = []
    for text in text_outputs:
        m = _FINAL_SCORE_RE.search(text or "")
        if m:
            try:
                scores.append(float(m.group(1)))
                continue
            except ValueError:
                pass
        scores.append(0.0)
    return scores


def geneval_score_client(url: str = GENEVAL_URL, batch_size: int = 64,
                         session=None, timeout: float = 120.0):
    """GenEval client (reference rewards.py:812-881). Returns
    fn(images_u8, prompts, metadatas, only_strict) ->
    (scores, rewards, strict_rewards, group_rewards, group_strict_rewards)."""
    import pickle

    sess = session or _session()

    def _fn(images_u8, prompts, metadatas, only_strict: bool = True):
        del prompts  # the judge reads metadata, not raw prompts (:829)
        n = len(images_u8)
        n_batches = int(np.ceil(n / batch_size))
        idx_batches = np.array_split(np.arange(n), n_batches)
        all_scores, all_rewards, all_strict = [], [], []
        group_rewards, group_strict = {}, {}
        for idx in idx_batches:
            data = {
                "images": jpeg_bytes(images_u8[idx]),
                "meta_datas": [metadatas[i] for i in idx],
                "only_strict": only_strict,
            }
            resp = sess.post(url, data=pickle.dumps(data), timeout=timeout)
            resp.raise_for_status()  # 502/404 bodies are not pickles
            rd = pickle.loads(resp.content)
            all_scores += list(rd["scores"])
            all_rewards += list(rd["rewards"])
            all_strict += list(rd["strict_rewards"])
            for key, value in rd["group_strict_rewards"].items():
                group_strict.setdefault(key, []).extend(value)
            for key, value in rd["group_rewards"].items():
                group_rewards.setdefault(key, []).extend(value)
        return all_scores, all_rewards, all_strict, group_rewards, group_strict

    return _fn


def deqa_score_client(url: str = DEQA_URL, batch_size: int = 64,
                      session=None, timeout: float = 120.0):
    """DeQA quality judge (reference rewards.py:761-808):
    fn(images_u8, prompts, metadata) -> np.ndarray scores."""
    import pickle

    sess = session or _session()

    def _fn(images_u8, prompts, metadata=None):
        del prompts, metadata
        n_batches = int(np.ceil(len(images_u8) / batch_size))
        all_scores = []
        for chunk in np.array_split(np.arange(len(images_u8)), n_batches):
            data = {"images": jpeg_bytes(images_u8[chunk])}
            resp = sess.post(url, data=pickle.dumps(data), timeout=timeout)
            resp.raise_for_status()  # 502/404 bodies are not pickles
            all_scores += list(pickle.loads(resp.content)["outputs"])
        return np.asarray(all_scores, np.float64)

    return _fn


def unifiedreward_remote_client(url: str, batch_size: int = 64, session=None,
                                timeout: float = 120.0):
    """Pickle-protocol UnifiedReward server (reference rewards.py:884-940)."""
    import pickle

    sess = session or _session()

    def _fn(images_u8, prompts, metadata=None):
        del metadata
        n = len(images_u8)
        n_batches = int(np.ceil(n / batch_size))
        all_scores = []
        for chunk in np.array_split(np.arange(n), n_batches):
            data = {"images": jpeg_bytes(images_u8[chunk]),
                    "prompts": [prompts[i] for i in chunk]}
            resp = sess.post(url, data=pickle.dumps(data), timeout=timeout)
            resp.raise_for_status()  # 502/404 bodies are not pickles
            all_scores += list(pickle.loads(resp.content)["outputs"])
        return np.asarray(all_scores, np.float64)

    return _fn


def unifiedreward_sglang_client(base_url: str = UNIFIEDREWARD_SGLANG_URL,
                                model: str = "UnifiedReward-7b-v1.5",
                                api_key: str = "flowgrpo", session=None,
                                timeout: float = 300.0):
    """OpenAI-compatible sglang judge (reference rewards.py:942-1010).

    One /chat/completions request per image (the reference async-gathers;
    batched concurrency here via a session pool is IO-bound and runs inside
    the trainer's reward executor). Scores normalised /5 like the reference.
    """
    sess = session or _session(max_retries=3)
    url = base_url.rstrip("/") + "/chat/completions"

    def _judge_one(prompt: str, image_u8: np.ndarray) -> str:
        body = {
            "model": model,
            "temperature": 0,
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "image_url",
                     "image_url": {"url": png_base64(image_u8)}},
                    {"type": "text",
                     "text": UNIFIEDREWARD_QUESTION.format(prompt=prompt)},
                ],
            }],
        }
        resp = sess.post(url, json=body, timeout=timeout,
                         headers={"Authorization": f"Bearer {api_key}"})
        resp.raise_for_status()
        payload = resp.json()
        if "choices" not in payload:  # error body from a proxy/warming judge
            raise RuntimeError(f"sglang judge returned no choices: "
                               f"{str(payload)[:200]}")
        return payload["choices"][0]["message"]["content"]

    def _fn(images_u8, prompts, metadata=None):
        del metadata
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as pool:
            texts = list(pool.map(_judge_one, prompts, list(images_u8)))
        scores = extract_final_scores(texts)
        return np.asarray([s / 5.0 for s in scores], np.float64)

    return _fn
