"""Precomputed text-embedding store (memmap-backed).

SURVEY.md §2.1 (SD3 text encoding row) sets the TPU plan: prompt embeddings
are frozen during GRPO training, so they are PRE-COMPUTABLE — encode the
dataset once with the tri-encoder stack (CLIP-L/G + T5), write memmaps, and
free the encoders before the 2.2B policy materialises. On a 16GB v5e this is
the difference between fitting and not: T5-XXL alone is ~9.4GB bf16, which
cannot sit in HBM next to the policy + VAE + scorers (SURVEY §7.3.7 hard-part
— the reference dodges it with ZeRO-2 over 80GB cards,
scripts/accelerate_configs/deepspeed_zero2.yaml).

Layout of a store directory (written by cli.precompute_embeds):
    prompts.json   — list of prompt strings, row i ↔ embeds[i]
    embeds.npy     — (N, S, joint_dim) fp16 memmap
    pooled.npy     — (N, pooled_dim) fp16 memmap
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np


class EmbeddingStore:
    """Serves (embeds, pooled) for known prompts from disk memmaps; drop-in
    for the ``encode(prompts)`` callable the trainer/eval CLIs consume."""

    def __init__(self, store_dir: str, strict: bool = True):
        with open(os.path.join(store_dir, "prompts.json")) as f:
            prompts: List[str] = json.load(f)
        self.index: Dict[str, int] = {p: i for i, p in enumerate(prompts)}
        self.embeds = np.load(os.path.join(store_dir, "embeds.npy"),
                              mmap_mode="r")
        self.pooled = np.load(os.path.join(store_dir, "pooled.npy"),
                              mmap_mode="r")
        if len(self.index) != self.embeds.shape[0]:
            raise ValueError(
                f"{store_dir}: prompts.json has {len(self.index)} unique "
                f"prompts but embeds.npy has {self.embeds.shape[0]} rows")
        self.strict = strict
        self.store_dir = store_dir

    def __contains__(self, prompt: str) -> bool:
        return prompt in self.index

    def __call__(self, prompts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        rows = []
        for p in prompts:
            i = self.index.get(p)
            if i is None:
                if self.strict:
                    raise KeyError(
                        f"prompt not in the precomputed store "
                        f"({self.store_dir}): {p!r} — re-run "
                        f"cli.precompute_embeds over the current dataset")
                i = 0
            rows.append(i)
        rows = np.asarray(rows)
        return (np.asarray(self.embeds[rows], np.float32),
                np.asarray(self.pooled[rows], np.float32))


def write_store(store_dir: str, prompts: List[str], encode_fn,
                batch_size: int = 32, dtype=np.float16,
                progress: bool = False) -> str:
    """Encode ``prompts`` (deduplicated, order-preserving) with ``encode_fn``
    and write the store. Streams through a memmap so the full fp32 embedding
    set never lives in host RAM (25k prompts x 154 x 4096 fp32 = 63GB)."""
    seen = {}
    for p in prompts:
        seen.setdefault(p, len(seen))
    uniq = list(seen)
    os.makedirs(store_dir, exist_ok=True)

    n = len(uniq)
    embeds = pooled = None
    for start in range(0, n, batch_size):
        chunk = uniq[start:start + batch_size]
        # fixed batch: pad with the last prompt so the jitted encoders never
        # retrace on the ragged final chunk
        padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
        e, p = encode_fn(padded)
        if embeds is None:
            # shapes come from the first real batch — a separate batch-1
            # probe would force a second full XLA compile of the encoders
            embeds = np.lib.format.open_memmap(
                os.path.join(store_dir, "embeds.npy"), mode="w+", dtype=dtype,
                shape=(n,) + tuple(np.shape(e)[1:]))
            pooled = np.lib.format.open_memmap(
                os.path.join(store_dir, "pooled.npy"), mode="w+", dtype=dtype,
                shape=(n,) + tuple(np.shape(p)[1:]))
        embeds[start:start + len(chunk)] = np.asarray(
            e[: len(chunk)], dtype)
        pooled[start:start + len(chunk)] = np.asarray(
            p[: len(chunk)], dtype)
        if progress and (start // batch_size) % 50 == 0:
            print(f"encoded {min(start + batch_size, n)}/{n}", flush=True)
    embeds.flush()
    pooled.flush()
    with open(os.path.join(store_dir, "prompts.json"), "w") as f:
        json.dump(uniq, f)
    return store_dir
