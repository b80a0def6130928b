"""GRPO trainer orchestration: sampling -> rewards -> advantages -> D-gate ->
policy update, as pjit-compiled phases under a host epoch loop.

Control-flow parity with the two reference trainers
(scripts/train_sd3_fast_pickscore.py:400-1191, ..._dino_patch.py — SURVEY.md
§3.1): per epoch, ``num_batches_per_epoch`` sampling batches roll out with
per-group stochastic windows; rewards score the decoded images (async host
scorers overlap the next rollout); rewards are globally grouped per prompt for
advantages; the adversarial gate decides a D-epoch (train discriminator, skip
the policy update) vs a G-epoch (GRPO inner loop); checkpoints save LoRA + EMA.

TPU re-design highlights:
  * single-controller SPMD: the epoch's global batch lives sharded on a
    Mesh('data'); the reference's gather->stat->ungather dance
    (:960-999) collapses to host numpy on the (small) gathered reward vector;
  * sampling, policy-microstep, and D-step are each ONE compiled function;
    the whole inner training epoch runs as a lax.scan over microbatches with
    Multi-Steps accumulation (reference: python loops + DeepSpeed engine);
  * rollout records sigmas, so training replay needs no timestep search.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.core.grpo import grpo_loss
from adv_grpo_tpu.core.stat_tracking import PerPromptStatTracker, calculate_zero_std_ratio
from adv_grpo_tpu.models.lora import lora_params, merge_lora_params
from adv_grpo_tpu.rollout.sampler import (
    SamplerConfig, compute_log_prob, denoise_prefix, denoise_with_logprob,
    sample_random_timestep,
)
from adv_grpo_tpu.train.train_state import (
    GeneratorState, apply_microbatch_grads, create_generator_state,
)


# ───────────────────────── compiled phase factories ─────────────────────────


def make_sample_fn(pipeline, sampler_cfg: SamplerConfig, latent_hw: int,
                   same_latent: bool = False, group_size: int = 1):
    """One sampling batch: rollout + decode. jit once per shape.

    ``same_latent``: one initial latent per prompt slot, repeated across its
    ``group_size`` (=mini_num_image_per_prompt) images — group members then
    share the whole pre-window trajectory (pre-window noise is 0) and differ
    only inside the stochastic window, so reward variance within a group is
    pure SDE-window credit (reference sample.same_latent; the reference
    sampler realises the same sharing by repeating latents at the window
    start, sd3_pipeline_with_logprob_fast.py:162-167)."""

    @jax.jit
    def sample(lora_flat, frozen_params, embeds, pooled, neg_embeds, neg_pooled,
               key, rt):
        params = {**frozen_params,
                  "params": merge_lora_params(frozen_params["params"], lora_flat)}
        vfn = pipeline.velocity_fn(params)
        B = embeds.shape[0]
        k_lat, k_roll = jax.random.split(key)
        C = pipeline.mmdit_cfg.in_channels
        if same_latent and group_size > 1:
            lat0 = jax.random.normal(
                k_lat, (B // group_size, C, latent_hw, latent_hw), jnp.float32)
            lat0 = jnp.repeat(lat0, group_size, axis=0)
        else:
            lat0 = jax.random.normal(
                k_lat, (B, C, latent_hw, latent_hw), jnp.float32)
        out = denoise_with_logprob(vfn, lat0, embeds, pooled, neg_embeds,
                                   neg_pooled, k_roll, sampler_cfg, rt)
        images = pipeline.decode(out.final_latents)
        return out, images

    return sample


def make_shared_prefix_sample_fn(pipeline, sampler_cfg: SamplerConfig,
                                 latent_hw: int, group_size: int):
    """same_latent sampling with the reference's group-shared prefix: ONE
    latent per prompt slot runs the deterministic pre-window steps [0, rt),
    is repeated across the group at the window start, then the stochastic
    window + tail run full-batch (sd3_pipeline_with_logprob_fast.py:158-167).
    Saves (1 - 1/group) of the pre-window MMDiT forwards. ``rt`` is static:
    at most num_steps//2 + 1 compilations."""

    @functools.partial(jax.jit, static_argnames=("rt",))
    def sample(lora_flat, frozen_params, embeds, pooled, neg_embeds,
               neg_pooled, key, rt: int):
        params = {**frozen_params,
                  "params": merge_lora_params(frozen_params["params"], lora_flat)}
        vfn = pipeline.velocity_fn(params)
        B = embeds.shape[0]
        Bs = B // group_size
        C = pipeline.mmdit_cfg.in_channels
        k_lat, k_roll = jax.random.split(key)
        lat0 = jax.random.normal(k_lat, (Bs, C, latent_hw, latent_hw),
                                 jnp.float32)
        x = denoise_prefix(vfn, lat0, embeds[::group_size],
                           pooled[::group_size], neg_embeds[::group_size],
                           neg_pooled[::group_size], sampler_cfg, rt)
        x = jnp.repeat(x, group_size, axis=0)
        out = denoise_with_logprob(vfn, x, embeds, pooled, neg_embeds,
                                   neg_pooled, k_roll, sampler_cfg,
                                   random_timestep=rt, start_idx=rt)
        images = pipeline.decode(out.final_latents)
        return out, images

    return sample


def make_flux_sample_fn(pipeline, sampler_cfg: SamplerConfig, latent_hw: int,
                        same_latent: bool = False, group_size: int = 1):
    """Flux sampling batch: full-SDE rollout (every step stochastic, the
    reference flux loop flux_pipeline_with_logprob.py:141-187) + window
    gather + decode. Signature-identical to make_sample_fn so the driver
    stays family-agnostic; the negative embeddings are accepted and unused
    (Flux guidance is embedded, not a CFG batch)."""
    from adv_grpo_tpu.rollout.flux import flux_denoise_window_with_logprob

    @jax.jit
    def sample(lora_flat, frozen_params, embeds, pooled, neg_embeds,
               neg_pooled, key, rt):
        del neg_embeds, neg_pooled
        params = {**frozen_params,
                  "params": merge_lora_params(frozen_params["params"],
                                              lora_flat)}
        vfn = pipeline.velocity_fn(params)
        B = embeds.shape[0]
        k_lat, k_roll = jax.random.split(key)
        if same_latent and group_size > 1:
            lat0 = pipeline.prepare_latents(k_lat, B // group_size, latent_hw)
            lat0 = jnp.repeat(lat0, group_size, axis=0)
        else:
            lat0 = pipeline.prepare_latents(k_lat, B, latent_hw)
        out = flux_denoise_window_with_logprob(
            lambda x, t: vfn(x, t, embeds, pooled), lat0, k_roll,
            sampler_cfg.num_steps, sampler_cfg.train_num_steps,
            sampler_cfg.noise_level, rt)
        images = pipeline.decode(out.final_latents)
        return out, images

    return sample


def make_flux_eval_fn(pipeline, eval_cfg: SamplerConfig, latent_hw: int):
    """Deterministic Flux eval generation (noise_level 0 -> the Flow-SDE
    step degenerates to the deterministic flow update)."""
    from adv_grpo_tpu.rollout.flux import flux_denoise_window_with_logprob

    @jax.jit
    def evaluate(lora_flat, frozen_params, embeds, pooled, neg_embeds,
                 neg_pooled, key):
        del neg_embeds, neg_pooled
        params = {**frozen_params,
                  "params": merge_lora_params(frozen_params["params"],
                                              lora_flat)}
        vfn = pipeline.velocity_fn(params)
        k_lat, k_roll = jax.random.split(key)
        lat0 = pipeline.prepare_latents(k_lat, embeds.shape[0], latent_hw)
        out = flux_denoise_window_with_logprob(
            lambda x, t: vfn(x, t, embeds, pooled), lat0, k_roll,
            eval_cfg.num_steps, 0, eval_cfg.noise_level, 0)
        return pipeline.decode(out.final_latents)

    return evaluate


def _wan_sampler_cfg(pipeline, sampler_cfg: SamplerConfig,
                     deterministic=False):
    from adv_grpo_tpu.rollout.wan import WanSamplerConfig

    return WanSamplerConfig(num_steps=sampler_cfg.num_steps,
                            shift=float(pipeline.shift),
                            deterministic=deterministic,
                            kl_reward=float(getattr(pipeline, "kl_reward",
                                                    0.0)))


def make_wan_sample_fn(pipeline, sampler_cfg: SamplerConfig, latent_hw: int,
                       same_latent: bool = False, group_size: int = 1):
    """WAN sampling batch: full stochastic video rollout (reference
    wan_pipeline_with_logprob.py:229-341) + window gather + 3D-VAE decode.
    Driver-signature-identical; negatives unused (no CFG batch)."""
    from adv_grpo_tpu.rollout.wan import wan_denoise_window_with_logprob

    wcfg = _wan_sampler_cfg(pipeline, sampler_cfg)

    @jax.jit
    def sample(lora_flat, frozen_params, embeds, pooled, neg_embeds,
               neg_pooled, key, rt):
        del pooled, neg_embeds, neg_pooled
        params = {**frozen_params,
                  "params": merge_lora_params(frozen_params["params"],
                                              lora_flat)}
        vfn_t = pipeline.velocity_fn(params)
        vfn_ref = pipeline.velocity_fn(params, lora_scale=0.0)

        def vfn(x, t, lora_scale):
            # branch is trace-time: the rollout passes python floats
            return vfn_t(x, t, embeds) if lora_scale else vfn_ref(x, t, embeds)

        B = embeds.shape[0]
        k_lat, k_roll = jax.random.split(key)
        if same_latent and group_size > 1:
            lat0 = pipeline.prepare_latents(k_lat, B // group_size, latent_hw)
            lat0 = jnp.repeat(lat0, group_size, axis=0)
        else:
            lat0 = pipeline.prepare_latents(k_lat, B, latent_hw)
        out = wan_denoise_window_with_logprob(
            vfn, lat0, k_roll, wcfg, sampler_cfg.train_num_steps, rt)
        video = pipeline.decode(out.final_latents)
        return out, video

    return sample


def make_wan_eval_fn(pipeline, eval_cfg: SamplerConfig, latent_hw: int):
    """Deterministic WAN eval generation (the WAN SDE step's deterministic
    mode — reference determistic=True flag)."""
    from adv_grpo_tpu.rollout.wan import wan_denoise_window_with_logprob

    wcfg = _wan_sampler_cfg(pipeline, eval_cfg, deterministic=True)

    @jax.jit
    def evaluate(lora_flat, frozen_params, embeds, pooled, neg_embeds,
                 neg_pooled, key):
        del pooled, neg_embeds, neg_pooled
        params = {**frozen_params,
                  "params": merge_lora_params(frozen_params["params"],
                                              lora_flat)}
        vfn_t = pipeline.velocity_fn(params)
        k_lat, k_roll = jax.random.split(key)
        lat0 = pipeline.prepare_latents(k_lat, embeds.shape[0], latent_hw)
        out = wan_denoise_window_with_logprob(
            lambda x, t, s: vfn_t(x, t, embeds), lat0, k_roll, wcfg, 0, 0)
        return pipeline.decode(out.final_latents)

    return evaluate


def make_eval_fn(pipeline, eval_cfg: SamplerConfig, latent_hw: int):
    """Deterministic eval generation (noise 0, fixed key — reference eval(),
    train_sd3_fast_pickscore.py:269-382; uses EMA weights when enabled)."""

    @jax.jit
    def evaluate(lora_flat, frozen_params, embeds, pooled, neg_embeds,
                 neg_pooled, key):
        params = {**frozen_params,
                  "params": merge_lora_params(frozen_params["params"], lora_flat)}
        vfn = pipeline.velocity_fn(params)
        B = embeds.shape[0]
        k_lat, k_roll = jax.random.split(key)
        lat0 = jax.random.normal(
            k_lat, (B, pipeline.mmdit_cfg.in_channels, latent_hw, latent_hw),
            jnp.float32)
        out = denoise_with_logprob(vfn, lat0, embeds, pooled, neg_embeds,
                                   neg_pooled, k_roll, eval_cfg, 0)
        return pipeline.decode(out.final_latents)

    return evaluate


def make_train_epoch_fn(pipeline, sampler_cfg: SamplerConfig, train_cfg,
                        beta: float = 0.0):
    """The whole inner epoch as one compiled scan over (minibatch, window-step)
    microbatches — reference inner loop train_sd3_fast_pickscore.py:1062-1190."""

    T = sampler_cfg.train_num_steps
    clip_range = float(train_cfg.clip_range)
    adv_clip_max = float(train_cfg.adv_clip_max)
    # family seam: the window-step log-prob replay is the only model-family-
    # specific piece of the training epoch (SD3: CPS step + CFG batch; Flux:
    # Flow-SDE step, embedded guidance; WAN: UniPC-sigma Flow-SDE step).
    # Signatures are identical.
    family = getattr(pipeline, "family", "sd3")
    if family == "flux":
        from adv_grpo_tpu.rollout.flux import compute_flux_log_prob
        log_prob_fn = compute_flux_log_prob
    elif family == "wan":
        from adv_grpo_tpu.rollout.wan import make_wan_log_prob_fn
        log_prob_fn = make_wan_log_prob_fn(
            _wan_sampler_cfg(pipeline, sampler_cfg))
    else:
        log_prob_fn = compute_log_prob

    def microstep(state: GeneratorState, frozen_params, mb, neg_embeds,
                  neg_pooled):
        def loss_fn(lora_flat):
            params = {**frozen_params,
                      "params": merge_lora_params(frozen_params["params"], lora_flat)}
            vfn = pipeline.velocity_fn(params)
            lp, mean, _ = log_prob_fn(
                vfn, mb["latents"], mb["next_latents"], mb["t"], mb["sigma"],
                mb["sigma_prev"], mb["embeds"], mb["pooled"], neg_embeds,
                neg_pooled, sampler_cfg)
            if beta > 0.0:
                vfn_ref = pipeline.velocity_fn(params, lora_scale=0.0)
                _, mean_ref, _ = log_prob_fn(
                    vfn_ref, mb["latents"], mb["next_latents"], mb["t"],
                    mb["sigma"], mb["sigma_prev"], mb["embeds"], mb["pooled"],
                    neg_embeds, neg_pooled, sampler_cfg)
            else:
                mean_ref = None
            out = grpo_loss(lp, mb["old_log_prob"], mb["advantages"],
                            clip_range=clip_range, adv_clip_max=adv_clip_max,
                            beta=beta, prev_sample_mean=mean if beta > 0 else None,
                            prev_sample_mean_ref=mean_ref)
            info = dict(loss=out.loss, policy_loss=out.policy_loss,
                        kl_loss=out.kl_loss, approx_kl=out.approx_kl,
                        clipfrac=out.clipfrac, clipfrac_gt_one=out.clipfrac_gt_one,
                        clipfrac_lt_one=out.clipfrac_lt_one)
            return out.loss, info

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.lora)
        state = apply_microbatch_grads(state, grads)
        return state, info

    # NOTE: donate_argnums=(0,) on `state` is tempting (the caller rebinds at
    # every call site) but invalid — the GeneratorState tree aliases buffers
    # at init (EMA starts as the same arrays as lora), and XLA rejects
    # donating one buffer twice.
    @jax.jit
    def train_epoch(state: GeneratorState, frozen_params, samples, neg_embeds,
                    neg_pooled):
        """samples: dict of (num_mini, bs, ...) arrays; scans num_mini*T
        microbatches in (minibatch-major, window-step-minor) order."""
        num_mini = samples["latents"].shape[0]

        def body(state, idx):
            i, j = idx // T, idx % T
            mini = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, keepdims=False),
                samples)
            mb = dict(
                latents=jax.lax.dynamic_index_in_dim(mini["latents"], j, axis=1,
                                                     keepdims=False),
                next_latents=jax.lax.dynamic_index_in_dim(mini["latents"], j + 1,
                                                          axis=1, keepdims=False),
                t=jax.lax.dynamic_index_in_dim(mini["timesteps"], j, axis=1,
                                               keepdims=False),
                sigma=jax.lax.dynamic_index_in_dim(mini["sigmas"], j, axis=1,
                                                   keepdims=False),
                sigma_prev=jax.lax.dynamic_index_in_dim(mini["sigmas_prev"], j,
                                                        axis=1, keepdims=False),
                old_log_prob=jax.lax.dynamic_index_in_dim(mini["log_probs"], j,
                                                          axis=1, keepdims=False),
                advantages=mini["advantages"],
                embeds=mini["embeds"],
                pooled=mini["pooled"],
            )
            return microstep(state, frozen_params, mb, neg_embeds, neg_pooled)

        state, infos = jax.lax.scan(body, state, jnp.arange(num_mini * T))
        info_mean = jax.tree_util.tree_map(jnp.mean, infos)
        return state, info_mean

    return train_epoch


# ───────────────────────── discriminator steps ─────────────────────────


def scorer_trainable_mask(params, tune_layer: int):
    """Trainable mask for the co-trained CLIP scorer: ONLY the last
    |tune_layer| vision encoder layers (reference
    train_sd3_fast_pickscore.py:1016-1020 freezes everything else)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params["vision"])
    layer_ids = sorted({int(k[0].split("_")[1]) for k in flat
                        if k[0].startswith("layer_")})
    trainable_layers = set(layer_ids[tune_layer:])

    def mask_tree(tree, prefix):
        f = traverse_util.flatten_dict(tree)
        out = {}
        for k in f:
            on = (prefix == "vision" and k[0].startswith("layer_")
                  and int(k[0].split("_")[1]) in trainable_layers)
            out[k] = on
        return traverse_util.unflatten_dict(out)

    return {
        "vision": mask_tree(params["vision"], "vision"),
        "text": jax.tree_util.tree_map(lambda _: False, params["text"]),
        "logit_scale": False,
    }


def make_pickscore_d_step(scorer, tune_layer: int, d_lr: float):
    """Adversarial PickScore D-step: CLIPCriterion(real=refs, fake=generated),
    Adam(d_lr, betas (0.5, 0.999)) on the unfrozen tail layers (reference
    :151-183, :655-658). Also returns preference accuracy (real ranked above
    fake) as a D-health diagnostic the reference never logged.

    Memory design: the loss is differentiated wrt ONLY the trainable-tail
    subtree (the frozen remainder enters under stop_gradient), so XLA
    dead-code-eliminates the backward through the frozen lower layers and
    never materialises full-tree grads — with the 2.2B policy resident this
    is the difference between fitting a 16GB v5e and OOM (the torch
    reference gets the same effect from requires_grad=False)."""
    import optax
    from flax import traverse_util as tu

    from adv_grpo_tpu.adversarial.clip_criterion import (
        pickscore_d_step_loss_and_acc)

    tx = optax.adam(d_lr, b1=0.5, b2=0.999)

    def make(params):
        mask_flat = tu.flatten_dict(scorer_trainable_mask(params, tune_layer))

        def split(p):
            flat = tu.flatten_dict(p)
            train = {k: v for k, v in flat.items() if mask_flat[k]}
            frozen = {k: v for k, v in flat.items() if not mask_flat[k]}
            return train, frozen

        opt_state = tx.init(split(params)[0])

        @jax.jit
        def step(params, opt_state, images_real, images_fake, input_ids):
            train, frozen = split(params)
            frozen = {k: jax.lax.stop_gradient(v) for k, v in frozen.items()}

            def loss_fn(tr):
                full = tu.unflatten_dict({**frozen, **tr})
                return pickscore_d_step_loss_and_acc(
                    scorer, full, images_real, images_fake, input_ids)

            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(train)
            updates, opt_state = tx.update(grads, opt_state, train)
            train = optax.apply_updates(train, updates)
            params = tu.unflatten_dict({**frozen, **train})
            return params, opt_state, loss, acc

        return step, opt_state

    return make


def make_dino_d_step(dino, d_lr: float, n_patches: int = 64,
                     patch_loss_weight: float = 0.3):
    """DINO-head hinge D-step, Adam(d_lr, betas (0.5, 0.999)) on the head only
    (reference train_sd3_fast_dino_patch.py:156-232, backbone frozen)."""
    import optax
    from adv_grpo_tpu.adversarial.dino_hinge import dino_hinge_loss

    tx = optax.adam(d_lr, b1=0.5, b2=0.999)

    def make(head_params):
        opt_state = tx.init(head_params)

        @jax.jit
        def step(head_params, opt_state, backbone_params, images_real,
                 images_fake, key):
            tokens_real = dino.features(backbone_params, images_real)
            tokens_fake = dino.features(backbone_params, images_fake)

            def loss_fn(hp):
                out = dino_hinge_loss(
                    lambda p, x: dino.head.apply({"params": p}, x),
                    hp, tokens_real, tokens_fake, key,
                    n_patches=n_patches, patch_loss_weight=patch_loss_weight)
                return out.loss, out.accuracy

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(head_params)
            updates, opt_state = tx.update(grads, opt_state, head_params)
            head_params = optax.apply_updates(head_params, updates)
            return head_params, opt_state, loss, acc

        return step, opt_state

    return make


def make_dino_multi_d_step(dino_multi, d_lr: float):
    """Multi-layer DINO D-step: trains {per-layer heads, fusion} jointly with
    the top-k pooled hinge (adversarial.dino_hinge.dino_multi_hinge_loss),
    Adam(d_lr, betas (0.5, 0.999)), frozen backbone. Step signature matches
    the single-head D-step so the trainer's d_phase drives it unchanged."""
    import optax
    from adv_grpo_tpu.adversarial.dino_hinge import dino_multi_hinge_loss

    tx = optax.adam(d_lr, b1=0.5, b2=0.999)
    layer_ids = dino_multi.layer_ids
    dino = dino_multi.dino

    def make(multi_params):
        opt_state = tx.init(multi_params)

        @jax.jit
        def step(multi_params, opt_state, backbone_params, images_real,
                 images_fake, key):
            del key  # top-k pooling is deterministic (no patch sampling)

            def layer_tokens(images):
                pix = dino.preprocess(images)
                out = dino.vision.apply({"params": backbone_params}, pix,
                                        capture_layers=layer_ids)
                return [jax.lax.stop_gradient(out["layer_tokens"][lid])
                        for lid in layer_ids]

            toks_r, toks_f = layer_tokens(images_real), layer_tokens(images_fake)

            def loss_fn(mp):
                out = dino_multi_hinge_loss(
                    lambda p, x: dino.head.apply({"params": p}, x),
                    lambda p, x: dino_multi.fusion.apply({"params": p}, x),
                    mp, toks_r, toks_f)
                return out.loss, out.accuracy

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                multi_params)
            updates, opt_state = tx.update(grads, opt_state, multi_params)
            multi_params = optax.apply_updates(multi_params, updates)
            return multi_params, opt_state, loss, acc

        return step, opt_state

    return make


# ───────────────────────── host-side epoch orchestration ─────────────────────


@dataclasses.dataclass
class EpochSamples:
    """Host-side accumulator of one epoch's sampling phase (global batch)."""

    prompts: List[str]
    rollout_np: Dict[str, np.ndarray]  # latents, log_probs, timesteps, sigmas...
    embeds: np.ndarray
    pooled: np.ndarray
    rewards: Dict[str, np.ndarray]  # per reward name + 'avg'
    reference_rewards: Optional[Dict[str, np.ndarray]] = None


def compute_advantages(tracker: PerPromptStatTracker, prompts, rewards_avg,
                       algorithm: str = "grpo"):
    """Global per-prompt advantages + the logged group stats
    (reference :960-999, :195-229)."""
    advantages = tracker.update(prompts, rewards_avg, type=algorithm)
    group_size, n_prompts = tracker.get_stats()
    zero_std_ratio, reward_std_mean = calculate_zero_std_ratio(prompts, rewards_avg)
    tracker.clear()
    stats = dict(group_size=group_size, trained_prompt_num=n_prompts,
                 zero_std_ratio=zero_std_ratio, reward_std_mean=reward_std_mean)
    return advantages.astype(np.float32), stats


def rebatch_for_training(samples: Dict[str, np.ndarray], num_minibatches: int):
    """(N, ...) -> (num_minibatches, N//num_minibatches, ...) (reference
    :1064-1071)."""
    out = {}
    for k, v in samples.items():
        n = v.shape[0]
        bs = n // num_minibatches
        out[k] = v[: num_minibatches * bs].reshape((num_minibatches, bs) + v.shape[1:])
    return out
