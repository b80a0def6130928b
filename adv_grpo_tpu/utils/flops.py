"""Analytic FLOP model of the MMDiT forward — shared by bench.py and the
trainer's per-epoch throughput metrics.

XLA's ``cost_analysis`` prices a ``lax.scan`` body once, so it cannot price
the denoise loop; this closed-form count (matmuls + attention, per stream) is
the honest alternative. Verified against the module structure of
models/mmdit.py (joint qkv/out + 4x MLP per stream, dual self-attention on
image tokens for the configured layers, embedders).
"""

from __future__ import annotations


def mmdit_forward_flops(cfg, s_img: int, s_txt: int, batch: int) -> float:
    """Matmul+attention FLOPs of ONE MMDiT forward over ``batch`` samples.

    Per layer and token: qkv+out 4D^2 params, MLP 8D^2 (x2 FLOP/param);
    dual-attention layers add a second self-attn (4D^2) on image tokens only.
    Attention: 4*S^2*D per layer (QK^T + AV). AdaLN/conditioning is per-sample
    (not per-token) — negligible.
    """
    D = cfg.hidden_dim
    L = cfg.num_layers
    n_dual = len(cfg.dual_attention_layers)
    s_tot = s_img + s_txt
    per_token_params = 12 * D * D  # per stream
    main = L * (2.0 * per_token_params * (s_img + s_txt) + 4.0 * s_tot**2 * D)
    dual = n_dual * (2.0 * 4 * D * D * s_img + 4.0 * s_img**2 * D)
    embed = 2.0 * (s_txt * cfg.joint_attention_dim * D
                   + s_img * cfg.in_channels * cfg.patch_size**2 * D)
    return batch * (main + dual + embed)


def flux_forward_flops(cfg, s_img: int, s_txt: int, batch: int) -> float:
    """Matmul+attention FLOPs of ONE FluxTransformer forward.

    Double blocks: per token per stream q/k/v/out 4D^2 + MLP 8D^2 params;
    single blocks: fused q/k/v (3D^2) + proj_mlp (4D^2) + proj_out from the
    [attn ; mlp] concat (5D^2) — 12D^2 params per token either way. Joint
    attention is 4*S_tot^2*D per block in both phases.
    """
    D = cfg.hidden_dim
    s_tot = s_img + s_txt
    per_token = 2.0 * 12 * D * D  # FLOPs per token per block (both kinds)
    attn = 4.0 * s_tot**2 * D
    main = (cfg.num_double_layers + cfg.num_single_layers) * (
        per_token * s_tot + attn)
    embed = 2.0 * (s_txt * cfg.joint_attention_dim * D
                   + s_img * cfg.in_channels * D)
    return batch * (main + embed)


def wan_forward_flops(cfg, s_vid: int, s_txt: int, batch: int) -> float:
    """Matmul+attention FLOPs of ONE WanTransformer forward.

    Per layer: self-attn q/k/v/out (4D^2 params per video token) + cross-attn
    (q/out on video tokens = 2D^2, k/v on text tokens = 2D^2) + FFN
    (2*D*ffn_dim params per video token); x2 FLOP/param. Attention:
    self 4*S^2*D, cross 4*S*S_txt*D. Embedders: patch-embed
    in_ch*prod(patch)*D per video token, text proj text_dim->D->D per text
    token, time/AdaLN per-sample (negligible). Mirrors mmdit_forward_flops
    above (models/wan.py structure; reference wan_pipeline_with_logprob.py
    runs ONE such forward per denoise step — no CFG batch)."""
    D = cfg.hidden_dim
    L = cfg.num_layers
    self_attn = 2.0 * (4 * D * D) * s_vid + 4.0 * s_vid**2 * D
    cross = (2.0 * (2 * D * D) * s_vid + 2.0 * (2 * D * D) * s_txt
             + 4.0 * s_vid * s_txt * D)
    ffn = 2.0 * (2 * D * cfg.ffn_dim) * s_vid
    main = L * (self_attn + cross + ffn)
    p = 1
    for x in cfg.patch_size:
        p *= x
    embed = (2.0 * s_vid * cfg.in_channels * p * D
             + 2.0 * s_txt * cfg.text_dim * D * 2)
    return batch * (main + embed)


def rollout_flops(cfg, s_img: int, s_txt: int, batch: int, num_steps: int,
                  do_cfg: bool, prefix_steps: int = 0,
                  group_size: int = 1) -> float:
    """FLOPs of one denoise rollout: ``num_steps`` forwards at CFG batch.

    ``prefix_steps`` > 0 models the shared-prefix sampler: those steps run at
    ``batch / group_size`` (one latent per prompt slot) before the group is
    repeated at the window start.
    """
    mult = 2 if do_cfg else 1
    full = mmdit_forward_flops(cfg, s_img, s_txt, batch * mult)
    if prefix_steps <= 0 or group_size <= 1:
        return num_steps * full
    small = mmdit_forward_flops(cfg, s_img, s_txt, batch * mult // group_size)
    return prefix_steps * small + (num_steps - prefix_steps) * full
