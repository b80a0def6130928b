"""A/B the fused qkv projections at the MMDiT production shape.

Times the FULL SD3.5-M MMDiT forward (CFG-16 x 512^2: the rollout's per-step
cost) with ``fused_qkv`` on vs off, plus jax.grad through one window step
(the train microstep's dominant graph). The fusion replaces 6 reads of the
(B, S, D) activation per projection group with 1 (models.lora.fused_qkv_proj)
— this probe measures whether the rollout is HBM-bound enough for that to
show (the modulated-LN fusion measured ~0 on this chip, suggesting parts of
the forward are MXU-bound).

Same methodology as probe_attention.py: K back-to-back forwards inside one
jit chained through the input so tunnel dispatch amortises out.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fused_qkv.py
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig
from adv_grpo_tpu.utils.flops import mmdit_forward_flops

B = 16  # CFG batch (8 x 2)
LATENT_HW = 64
S_TXT = 154
REPS = 8
PEAK = 197e12


def materialise(cfg, key):
    lat = jnp.zeros((1, cfg.in_channels, LATENT_HW, LATENT_HW), jnp.bfloat16)
    ctx = jnp.zeros((1, S_TXT, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((1, cfg.pooled_projection_dim), jnp.bfloat16)
    model = MMDiT(cfg)
    shapes = jax.eval_shape(model.init, key, lat, jnp.zeros((1,)), ctx, pooled)

    @jax.jit
    def mat():
        return jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16)
            if s.dtype == jnp.float32 else jnp.zeros(s.shape, s.dtype),
            shapes)

    return model, mat()


def bench_fwd(name, model, variables, flops):
    lat = jnp.full((B, model.cfg.in_channels, LATENT_HW, LATENT_HW), 0.1,
                   jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    ctx = jnp.full((B, S_TXT, model.cfg.joint_attention_dim), 0.01,
                   jnp.bfloat16)
    pooled = jnp.full((B, model.cfg.pooled_projection_dim), 0.01, jnp.bfloat16)

    @jax.jit
    def loop(x0):
        def body(carry, _):
            out = model.apply(variables, carry, t, ctx, pooled)
            return (carry + 0.0 * out).astype(carry.dtype), jnp.float32(0)

        c, _ = jax.lax.scan(body, x0, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(lat))  # compile
    t0 = time.perf_counter()
    float(loop(lat))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt * 1e3:8.2f} ms   {flops / dt / 1e12:6.1f} TF/s "
          f"({flops / dt / PEAK * 100:4.1f}% peak)")
    return dt


def bench_grad(name, model, variables, flops):
    """jax.grad through one forward wrt the latents — the fused projections'
    backward path (transposed concat-kernel matmuls + remat re-forward).
    FLOPs reported against the 4x-forward remat-inclusive convention."""
    lat = jnp.full((B, model.cfg.in_channels, LATENT_HW, LATENT_HW), 0.1,
                   jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    ctx = jnp.full((B, S_TXT, model.cfg.joint_attention_dim), 0.01,
                   jnp.bfloat16)
    pooled = jnp.full((B, model.cfg.pooled_projection_dim), 0.01, jnp.bfloat16)

    def loss(x):
        out = model.apply(variables, x, t, ctx, pooled)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = jax.grad(loss)

    @jax.jit
    def loop(x0):
        def body(carry, _):
            g = grad_fn(carry)
            return (carry + 0.0 * g).astype(carry.dtype), jnp.float32(0)

        c, _ = jax.lax.scan(body, x0, None, length=REPS)
        return jnp.sum(c.astype(jnp.float32))

    float(loop(lat))  # compile
    t0 = time.perf_counter()
    float(loop(lat))
    dt = (time.perf_counter() - t0) / REPS
    gflops = 4.0 * flops  # fwd + remat re-fwd + bwd dx chain
    print(f"{name:28s} {dt * 1e3:8.2f} ms   {gflops / dt / 1e12:6.1f} TF/s "
          f"({gflops / dt / PEAK * 100:4.1f}% peak, 4x-fwd convention)")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    s_img = (LATENT_HW // 2) ** 2
    for fused in (True, False):
        cfg = MMDiTConfig.sd35_medium(fused_qkv=fused)
        flops = mmdit_forward_flops(cfg, s_img, S_TXT, B)
        model, variables = materialise(cfg, key)
        bench_fwd(f"mmdit fwd fused_qkv={fused}", model, variables, flops)
        bench_grad(f"mmdit grad fused_qkv={fused}", model, variables, flops)
        # free before the next variant materialises
        for leaf in jax.tree_util.tree_leaves(variables):
            leaf.delete()


if __name__ == "__main__":
    main()
