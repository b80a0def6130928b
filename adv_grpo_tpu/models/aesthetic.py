"""LAION aesthetic predictor head (CLIP-L embed -> scalar score).

Mirrors the reference MLP (adv_grpo/aesthetic_scorer.py:13-41): 768 -> 1024 ->
128 -> 64 -> 16 -> 1 on L2-normalised CLIP-L image embeddings; weights loadable
from the published `sac+logos+ava1-l14-linearMSE` checkpoint via the converter.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class AestheticHead(nn.Module):
    @nn.compact
    def __call__(self, embed):
        x = embed / jnp.linalg.norm(embed, axis=-1, keepdims=True)
        for i, feat in enumerate((1024, 128, 64, 16)):
            x = nn.Dense(feat, param_dtype=jnp.float32, name=f"fc{i}")(x)
            # reference MLP uses dropout between layers at train time only; the
            # scorer runs in eval mode, so the deterministic path is exact.
        return nn.Dense(1, param_dtype=jnp.float32, name="out")(x).squeeze(-1)
