"""Distributed K-repeat prompt sampling.

Re-implementation of the reference DistributedKRepeatSampler
(scripts/train_sd3_fast_pickscore.py:87-129): every rank draws the same seeded
choice of ``m`` unique dataset indices per epoch-step, each repeated ``k`` times;
the ``m*k`` repeated indices are shuffled with the same shared seed and sliced per
rank, so one prompt's k-image group spans exactly ``k / images_per_rank`` ranks and
group statistics must be computed on globally gathered rewards (SURVEY.md §2.3).

Host-side and framework-free: yields numpy index arrays; the JAX process index
plays the role of the torch rank.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class DistributedKRepeatSampler:
    def __init__(
        self,
        dataset_size: int,
        batch_size: int,
        k: int,
        num_replicas: int,
        rank: int,
        seed: int = 0,
    ):
        """Args mirror the reference (:88-101).

        batch_size: per-rank batch size (prompts per rank per step).
        k: repeats per unique prompt (group size across ranks).
        """
        total_samples = batch_size * num_replicas
        if total_samples % k != 0:
            raise ValueError(
                f"total per-step samples ({batch_size}x{num_replicas}) must be divisible by k={k}"
            )
        self.dataset_size = dataset_size
        self.batch_size = batch_size
        self.k = k
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.m = total_samples // k  # unique prompts per step
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def batch_for_epoch(self, epoch: int) -> np.ndarray:
        """The (batch_size,) dataset indices this rank samples at ``epoch``.

        Deterministic given (seed, epoch): all ranks compute the identical global
        permutation and slice their contiguous shard (reference :105-124).
        """
        g = np.random.default_rng(self.seed + epoch)
        indices = g.choice(self.dataset_size, size=self.m, replace=False)
        repeated = np.repeat(indices, self.k)
        perm = g.permutation(len(repeated))
        shuffled = repeated[perm]
        per_card = self.batch_size
        start = self.rank * per_card
        return shuffled[start : start + per_card]

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            yield self.batch_for_epoch(self.epoch)
            self.epoch += 1
