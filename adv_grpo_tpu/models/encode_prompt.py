"""SD3 tri-encoder prompt embedding composition.

Mirrors the reference ``encode_prompt``
(adv_grpo/diffusers_patch/train_dreambooth_lora_sd3.py:98-144):
  clip_l_hidden (B,77,768) ++ clip_g_hidden (B,77,1280) -> (B,77,2048)
  zero-padded on the channel axis to the T5 width (4096), then concatenated with
  the T5 hidden states along the sequence axis; pooled = [clip_l_pooled ;
  clip_g_pooled] -> (B, 2048).

The hidden states used are the PENULTIMATE CLIP layers (hidden_states[-2],
reference :87-95). Embeddings are frozen during RL — trainers precompute them per
batch on host or device (SURVEY.md §2.1 "SD3 text encoding").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PromptEmbeds(NamedTuple):
    prompt_embeds: jnp.ndarray  # (B, 77 + t5_len, t5_dim)
    pooled_prompt_embeds: jnp.ndarray  # (B, clip_l_dim + clip_g_dim)


def compose_sd3_prompt_embeds(
    clip_l_hidden, clip_l_pooled, clip_g_hidden, clip_g_pooled, t5_hidden
) -> PromptEmbeds:
    clip_hidden = jnp.concatenate([clip_l_hidden, clip_g_hidden], axis=-1)
    pad = t5_hidden.shape[-1] - clip_hidden.shape[-1]
    if pad < 0:
        raise ValueError("T5 width must be >= concatenated CLIP width")
    clip_hidden = jnp.pad(clip_hidden, ((0, 0), (0, 0), (0, pad)))
    prompt_embeds = jnp.concatenate(
        [clip_hidden, t5_hidden.astype(clip_hidden.dtype)], axis=1
    )
    pooled = jnp.concatenate([clip_l_pooled, clip_g_pooled], axis=-1)
    return PromptEmbeds(prompt_embeds, pooled)


class SD3TextEncoderSet:
    """Bundles the three encoders + tokenizers behind one encode() call.

    Tokenisation happens on host (HF tokenizers when a local pretrained dir is
    supplied; tests inject tiny tokenizer callables). Encoding is jitted by the
    caller over fixed (B, 77)/(B, t5_len) shapes.
    """

    def __init__(self, clip_l_fn, clip_g_fn, t5_fn, tokenize_clip, tokenize_t5):
        self.clip_l_fn = clip_l_fn  # ids -> (final, penult, pooled)
        self.clip_g_fn = clip_g_fn
        self.t5_fn = t5_fn  # ids -> hidden
        self.tokenize_clip = tokenize_clip  # list[str] -> (B, 77) ids
        self.tokenize_t5 = tokenize_t5  # list[str] -> (B, t5_len) ids

    def encode(self, prompts) -> PromptEmbeds:
        clip_ids = self.tokenize_clip(prompts)
        t5_ids = self.tokenize_t5(prompts)
        _, l_hidden, l_pooled = self.clip_l_fn(clip_ids)
        _, g_hidden, g_pooled = self.clip_g_fn(clip_ids)
        t5_hidden = self.t5_fn(t5_ids)
        return compose_sd3_prompt_embeds(l_hidden, l_pooled, g_hidden, g_pooled, t5_hidden)
