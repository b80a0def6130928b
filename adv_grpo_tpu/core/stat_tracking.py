"""Per-prompt reward statistics -> advantages (host side).

Behavioural re-implementation of the reference PerPromptStatTracker
(adv_grpo/stat_tracking.py:12-79) in pure numpy:

  * rewards are accumulated per prompt across ``update`` calls within an epoch
    (cross-call history), advantage normalisation uses the accumulated group;
  * ``global_std=True`` normalises by the std of ALL rewards in the current call
    (+1e-4), not the group's (:42-45);
  * advantage types: 'grpo' (z-score), 'rwr' (raw reward), 'sft' (one-hot argmax,
    ties -> all maxima get 1.0), 'dpo' (+1 at argmax / -1 at argmin; degenerate
    all-equal group -> indices 1/+ and 0/- like the reference, :61-63);
  * ``get_stats`` returns (average group size, number of distinct prompts ever
    seen), ``clear`` drops per-epoch stats but keeps the history-prompt set.

This runs on gathered host data once per epoch (a few thousand floats) — numpy is
the right tool; the jit-side fast path is
:func:`adv_grpo_tpu.core.grpo.group_advantages`.
"""

from __future__ import annotations

import numpy as np


class PerPromptStatTracker:
    def __init__(self, global_std: bool = False):
        self.global_std = global_std
        self.stats: dict = {}
        self.history_prompts: set = set()

    def update(self, prompts, rewards, type: str = "grpo") -> np.ndarray:
        prompts = np.array(prompts)
        rewards = np.array(rewards, dtype=np.float64)
        unique = np.unique(prompts)
        advantages = np.zeros_like(rewards)

        for prompt in unique:
            prompt_rewards = rewards[prompts == prompt]
            self.stats.setdefault(prompt, [])
            self.stats[prompt].extend(prompt_rewards)
            self.history_prompts.add(hash(prompt))

        for prompt in unique:
            # NOTE: the reference reassigns np.stack into the dict (:39), which makes
            # its documented cross-call accumulation crash on a second update without
            # clear(); in practice it calls update exactly once per epoch
            # (train_sd3_fast_pickscore.py:970,989). We keep the dict values as lists
            # so accumulation actually works — identical single-call behaviour.
            group = np.stack(self.stats[prompt])
            prompt_rewards = rewards[prompts == prompt]
            mask = prompts == prompt
            if type == "grpo":
                mean = np.mean(group, axis=0, keepdims=True)
                if self.global_std:
                    std = np.std(rewards, axis=0, keepdims=True) + 1e-4
                else:
                    std = np.std(group, axis=0, keepdims=True) + 1e-4
                advantages[mask] = (prompt_rewards - mean) / std
            elif type == "rwr":
                advantages[mask] = prompt_rewards
            elif type == "sft":
                advantages[mask] = (prompt_rewards == np.max(prompt_rewards)).astype(np.float64)
            elif type == "dpo":
                max_idx = int(np.argmax(prompt_rewards))
                min_idx = int(np.argmin(prompt_rewards))
                if max_idx == min_idx:
                    min_idx, max_idx = 0, 1
                result = np.zeros_like(prompt_rewards)
                result[max_idx] = 1.0
                result[min_idx] = -1.0
                advantages[mask] = result
            else:
                raise ValueError(f"unknown advantage type: {type!r}")

        return advantages

    def get_stats(self):
        avg_group_size = (
            sum(len(v) for v in self.stats.values()) / len(self.stats) if self.stats else 0
        )
        return avg_group_size, len(self.history_prompts)

    def clear(self) -> None:
        self.stats = {}


def calculate_zero_std_ratio(prompts, rewards) -> tuple[float, float]:
    """Fraction of prompt groups with zero reward std, and the mean group std.

    Mirrors reference train_sd3_fast_pickscore.py:195-229 (operating on the
    'ori_avg' gathered reward vector).
    """
    prompt_array = np.array(prompts)
    rewards = np.asarray(rewards, dtype=np.float64)
    _, inverse_indices, counts = np.unique(
        prompt_array, return_inverse=True, return_counts=True
    )
    grouped = rewards[np.argsort(inverse_indices)]
    groups = np.split(grouped, np.cumsum(counts)[:-1])
    stds = np.array([np.std(g) for g in groups])
    return float(np.count_nonzero(stds == 0) / len(stds)), float(stds.mean())
