"""End-to-end GRPO training driver (the two reference trainers as one engine).

Replicates the epoch control flow of scripts/train_sd3_fast_pickscore.py:400-1191
and scripts/train_sd3_fast_dino_patch.py (SURVEY.md §3.1) on a JAX mesh:

  while global_step < max_global_step:
    [eval gate]  -> deterministic eval rollouts + eval rewards     (:712-713)
    [save gate]  -> LoRA(+EMA) checkpoint                          (:714-715)
    sampling     -> num_batches_per_epoch stochastic-window rollouts; rewards
                    scored asynchronously (ThreadPoolExecutor overlap :668,816)
    advantages   -> global per-prompt normalisation on gathered rewards
                    (:960-999)
    D-gate       -> pickscore: adaptive (ref reward < gen reward, :1025);
                    dino: periodic ((epoch+1) % d_times != 0,
                    ..._dino_patch.py:1097-1118); D-epoch skips the G update
    GRPO update  -> compiled scan over (minibatch, window-step) microbatches

Injection points keep it testable at any scale: the text encoder, reward fn,
reference-image store, and discriminator bundle are all constructor args.
"""

from __future__ import annotations

import dataclasses
import random as pyrandom
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.core.stat_tracking import PerPromptStatTracker
from adv_grpo_tpu.data.krepeat import DistributedKRepeatSampler
from adv_grpo_tpu.models.lora import lora_params
from adv_grpo_tpu.parallel.mesh import make_mesh, process_allgather
from adv_grpo_tpu.rollout.sampler import SamplerConfig
from adv_grpo_tpu.train import checkpoint as ckpt_lib
from adv_grpo_tpu.train.grpo_trainer import (
    compute_advantages, make_eval_fn, make_sample_fn, make_train_epoch_fn,
    rebatch_for_training,
)
from adv_grpo_tpu.train.train_state import create_generator_state
from adv_grpo_tpu.utils.metrics import MetricLogger, StepTimer, maybe_profile


@dataclasses.dataclass
class DiscriminatorBundle:
    """Live adversarial scorer state + its compiled step."""

    kind: str  # "pickscore" | "dino" | "dino_patch"
    step_fn: Callable
    opt_state: Any
    params: Any  # pickscore: scorer params; dino: head params
    backbone_params: Any = None  # dino only
    tokenize: Optional[Callable] = None  # pickscore only


class GRPOTrainer:
    def __init__(self, config, pipeline, dataset, text_encode_fn,
                 reward_fn, eval_reward_fn=None, reference_store=None,
                 discriminator: Optional[DiscriminatorBundle] = None,
                 mesh=None, latent_hw: int = 64, logger: Optional[MetricLogger] = None,
                 reward_ctx=None):
        self.config = config
        if bool(config.tpu.debug_nans):
            # TPU analogue of the reference's global
            # torch.autograd.set_detect_anomaly(True) sanitizer
            # (train_sd3_fast_pickscore.py:42) — with the same perf caveat.
            jax.config.update("jax_debug_nans", True)
        self.pipeline = pipeline
        self.dataset = dataset
        self.text_encode_fn = text_encode_fn  # List[str] -> (embeds, pooled) np/jnp
        self.reward_fn = reward_fn
        self.eval_reward_fn = eval_reward_fn or reward_fn
        self.reference_store = reference_store
        self.disc = discriminator
        self.reward_ctx = reward_ctx  # live co-trained params flow back here
        self.mesh = mesh or make_mesh()
        self.latent_hw = latent_hw
        self.n_dev = len(self.mesh.devices.flatten())

        s = config.sample
        self.sampler_cfg = SamplerConfig(
            num_steps=s.num_steps, train_num_steps=s.train_num_steps,
            guidance_scale=s.guidance_scale if config.train.cfg else 1.0,
            noise_level=s.noise_level)
        self.eval_cfg = dataclasses.replace(
            self.sampler_cfg, num_steps=s.eval_num_steps, train_num_steps=0,
            noise_level=0.0)
        self.mini = int(s.mini_num_image_per_prompt)
        self.k = max(int(s.num_image_per_prompt) // self.mini, 1)
        self.num_batches = int(s.num_batches_per_epoch)

        self.sample_fn = make_sample_fn(pipeline, self.sampler_cfg, latent_hw)
        self.eval_fn = make_eval_fn(pipeline, self.eval_cfg, latent_hw)
        self.train_epoch_fn = make_train_epoch_fn(
            pipeline, self.sampler_cfg, config.train, beta=float(config.train.beta))

        # split the policy tree: trainable LoRA subtree vs frozen remainder
        self.frozen = pipeline.transformer_params
        lora0 = lora_params(self.frozen["params"])
        if not lora0:
            raise ValueError("pipeline has no LoRA parameters (lora_rank=0?)")
        self.state = create_generator_state(lora0, config.train, s.train_num_steps)

        self.prompt_sampler = DistributedKRepeatSampler(
            len(dataset), batch_size=int(s.train_batch_size), k=self.k,
            num_replicas=self.n_dev, rank=0, seed=int(config.seed))
        self.tracker = PerPromptStatTracker(global_std=bool(s.global_std))
        self.logger = logger or MetricLogger(config.save_dir,
                                             wandb_init=bool(config.wandb_init),
                                             run_name=str(config.case_name))
        self.timer = StepTimer()
        self.executor = ThreadPoolExecutor(max_workers=4)
        # precomputed negative ("") embeddings (reference :632-637)
        ne, npld = self.text_encode_fn([""])
        self.neg_embeds1 = np.asarray(ne)
        self.neg_pooled1 = np.asarray(npld)
        self.epoch = 0

    # ── helpers ─────────────────────────────────────────────────────────

    def _neg(self, batch: int):
        return (np.repeat(self.neg_embeds1, batch, axis=0),
                np.repeat(self.neg_pooled1, batch, axis=0))

    def _epoch_prompt_slots(self, step_idx: int) -> List[int]:
        """Global prompt index per replica slot for one sampling batch
        (all replicas' shards concatenated — single controller sees all)."""
        slots = []
        for rank in range(self.n_dev):
            s = DistributedKRepeatSampler(
                len(self.dataset), self.prompt_sampler.batch_size, self.k,
                self.n_dev, rank, seed=self.prompt_sampler.seed)
            slots.extend(s.batch_for_epoch(step_idx).tolist())
        return slots

    # ── phases ──────────────────────────────────────────────────────────

    def sample_phase(self, epoch: int):
        cfgs = self.config.sample
        all_rollouts, all_prompts, all_embeds, all_pooled = [], [], [], []
        reward_futures = []
        last_images = last_refs = last_prompts = None

        for i in range(self.num_batches):
            step_idx = epoch * self.num_batches + i
            slot_idx = self._epoch_prompt_slots(step_idx)
            slot_prompts = [self.dataset[j]["prompt"] for j in slot_idx]
            metas = [self.dataset[j]["metadata"] for j in slot_idx]
            # each slot expands to mini images
            prompts = [p for p in slot_prompts for _ in range(self.mini)]
            metadata = [m for m in metas for _ in range(self.mini)]
            embeds, pooled = self.text_encode_fn(slot_prompts)
            embeds = np.repeat(np.asarray(embeds), self.mini, axis=0)
            pooled = np.repeat(np.asarray(pooled), self.mini, axis=0)
            B = embeds.shape[0]
            neg_e, neg_p = self._neg(B)

            key = jax.random.fold_in(jax.random.PRNGKey(self.config.seed),
                                     step_idx)
            if cfgs.random_timestep is None:
                rts = np.random.default_rng(step_idx).integers(
                    0, cfgs.num_steps // 2 + 1, size=self.n_dev)
            else:
                rts = np.full(self.n_dev, int(cfgs.random_timestep))
            rt = np.repeat(rts, self.mini).astype(np.int32)

            with self.timer("rollout"):
                rollout, images = self.sample_fn(
                    self.state.lora, self.frozen, jnp.asarray(embeds),
                    jnp.asarray(pooled), jnp.asarray(neg_e), jnp.asarray(neg_p),
                    key, jnp.asarray(rt))

            refs = None
            if self.reference_store is not None:
                refs = self.reference_store.get_batch(
                    prompts, rng=pyrandom.Random(step_idx))

            def _score(images=images, prompts=prompts, metadata=metadata,
                       refs=refs):
                out = {"gen": self.reward_fn(images, prompts, metadata,
                                             ref_images=None if refs is None
                                             else jnp.asarray(refs)[:, None] if refs.ndim == 4
                                             else jnp.asarray(refs))[0]}
                if refs is not None and self.disc is not None:
                    # score the reference images under the SAME reward for the
                    # adaptive gate (reference samples["reference_rewards"]).
                    ref_flat = refs.reshape((-1,) + refs.shape[-3:]) if refs.ndim == 5 else refs
                    out["ref"] = self.reward_fn(
                        jnp.asarray(ref_flat[: len(prompts)]), prompts, metadata)[0]
                return out

            with self.timer("reward_dispatch"):
                reward_futures.append(self.executor.submit(_score))

            all_rollouts.append(jax.tree_util.tree_map(np.asarray, rollout._asdict()))
            all_prompts.extend(prompts)
            all_embeds.append(embeds)
            all_pooled.append(pooled)
            last_images, last_refs, last_prompts = images, refs, prompts

        with self.timer("reward_wait"):
            results = [f.result() for f in reward_futures]
        rewards = {}
        for key_ in results[0]["gen"]:
            rewards[key_] = np.concatenate([np.asarray(r["gen"][key_]) for r in results])
        ref_rewards = None
        if "ref" in results[0]:
            ref_rewards = {k: np.concatenate([np.asarray(r["ref"][k]) for r in results])
                           for k in results[0]["ref"]}

        rollout_np = {k: np.concatenate([r[k] for r in all_rollouts])
                      for k in all_rollouts[0] if k != "final_latents"}
        return dict(prompts=all_prompts, rollout=rollout_np,
                    embeds=np.concatenate(all_embeds),
                    pooled=np.concatenate(all_pooled), rewards=rewards,
                    ref_rewards=ref_rewards, last_images=last_images,
                    last_refs=last_refs, last_prompts=last_prompts)

    def train_phase(self, samples, advantages: np.ndarray):
        data = dict(
            latents=samples["rollout"]["latents"],
            log_probs=samples["rollout"]["log_probs"],
            timesteps=samples["rollout"]["timesteps"],
            sigmas=samples["rollout"]["sigmas"],
            sigmas_prev=samples["rollout"]["sigmas_prev"],
            advantages=advantages,
            embeds=samples["embeds"],
            pooled=samples["pooled"],
        )
        batched = rebatch_for_training(data, self.num_batches)
        bs = batched["latents"].shape[1]
        neg_e, neg_p = self._neg(bs)
        with self.timer("train"):
            self.state, info = self.train_epoch_fn(
                self.state, self.frozen,
                jax.tree_util.tree_map(jnp.asarray, batched),
                jnp.asarray(neg_e), jnp.asarray(neg_p))
        return jax.tree_util.tree_map(np.asarray, info)

    def d_phase(self, samples):
        d = self.disc
        refs = samples["last_refs"]
        fake = samples["last_images"]
        if refs is None:
            raise RuntimeError("D-step requires a reference image store")
        real = refs[:, 0] if refs.ndim == 5 else refs
        n = min(len(real), fake.shape[0])
        with self.timer("d_step"):
            if d.kind == "pickscore":
                ids = d.tokenize(samples["last_prompts"][:n])
                d.params, d.opt_state, loss = d.step_fn(
                    d.params, d.opt_state, jnp.asarray(real[:n]),
                    jnp.asarray(fake[:n]), jnp.asarray(ids))
                out = {"d_loss": float(loss)}
            else:
                key = jax.random.fold_in(jax.random.PRNGKey(7), self.epoch)
                d.params, d.opt_state, loss, acc = d.step_fn(
                    d.params, d.opt_state, d.backbone_params,
                    jnp.asarray(real[:n]), jnp.asarray(fake[:n]), key)
                out = {"d_loss": float(loss), "d_acc": float(acc)}
        # the co-trained reward must score with the CURRENT discriminator
        # (reference scores via the live DDP-wrapped scorer, rewards.py:577-589)
        if self.reward_ctx is not None:
            if d.kind == "pickscore":
                self.reward_ctx.pickscore_params = d.params
            else:
                self.reward_ctx.dino_head_params = d.params
        return out

    def should_run_d_epoch(self, samples) -> bool:
        """The two gates (reference :1025-1037; ..._dino_patch.py:1097-1118)."""
        if self.disc is None or not bool(self.config.train_d):
            return False
        if self.disc.kind == "pickscore":
            if samples["ref_rewards"] is None:
                return False
            return float(np.mean(samples["ref_rewards"]["avg"])) < float(
                np.mean(samples["rewards"]["avg"]))
        return (self.epoch + 1) % int(self.config.d_times) != 0

    def eval_phase(self, eval_prompts: List[str], key=None):
        """Deterministic eval on EMA weights (reference eval(), :269-382)."""
        lora = self.state.ema.params if self.state.ema is not None else self.state.lora
        embeds, pooled = self.text_encode_fn(eval_prompts)
        embeds, pooled = np.asarray(embeds), np.asarray(pooled)
        neg_e, neg_p = self._neg(embeds.shape[0])
        key = key if key is not None else jax.random.PRNGKey(0)
        images = self.eval_fn(lora, self.frozen, jnp.asarray(embeds),
                              jnp.asarray(pooled), jnp.asarray(neg_e),
                              jnp.asarray(neg_p), key)
        refs = (self.reference_store.get_batch(eval_prompts)
                if self.reference_store is not None else None)
        details, _ = self.eval_reward_fn(
            images, eval_prompts, [{}] * len(eval_prompts),
            ref_images=None if refs is None else jnp.asarray(refs))
        return images, {f"eval_reward_{k}": float(np.mean(v))
                        for k, v in details.items()}

    # ── main loop ───────────────────────────────────────────────────────

    def run(self, max_epochs: Optional[int] = None, eval_prompts=None):
        cfg = self.config
        while int(self.state.global_step) < int(cfg.max_global_step):
            if max_epochs is not None and self.epoch >= max_epochs:
                break
            if eval_prompts and self.epoch % int(cfg.eval_freq) == 0 and self.epoch > 0:
                _, eval_metrics = self.eval_phase(eval_prompts)
                self.logger.log(eval_metrics, step=int(self.state.global_step))
            if cfg.save_dir and self.epoch % int(cfg.save_freq) == 0 and self.epoch > 0:
                self.save()

            with maybe_profile(str(cfg.tpu.profile_dir), self.epoch):
                samples = self.sample_phase(self.epoch)

            gathered_prompts = process_allgather(samples["prompts"])
            gathered_avg = process_allgather(samples["rewards"]["avg"])
            advantages, group_stats = compute_advantages(
                self.tracker, gathered_prompts, gathered_avg,
                algorithm=str(cfg.train.algorithm))

            metrics = {f"reward_{k}": float(np.mean(v))
                       for k, v in samples["rewards"].items()}
            if samples["ref_rewards"] is not None:
                metrics.update({f"reference_reward_{k}": float(np.mean(v))
                                for k, v in samples["ref_rewards"].items()})
            metrics.update(group_stats)

            if self.should_run_d_epoch(samples):
                metrics.update(self.d_phase(samples))
                metrics["d_epoch"] = 1
            else:
                info = self.train_phase(samples, advantages)
                metrics.update({k: float(v) for k, v in info.items()})
                metrics["d_epoch"] = 0

            metrics.update(self.timer.summary())
            self.timer.reset()
            metrics["epoch"] = self.epoch
            self.logger.log(metrics, step=int(self.state.global_step))
            if cfg.save_dir and self.epoch % 10 == 0:
                self._save_sample_grid(samples)
            self.epoch += 1
        return self.state

    def _save_sample_grid(self, samples):
        """Sample-image grid JPEG every 10 epochs (reference wandb grid,
        train_sd3_fast_pickscore.py:869-924)."""
        try:
            from PIL import Image

            from adv_grpo_tpu.native.lib import images_to_uint8

            imgs = images_to_uint8(
                np.asarray(samples["last_images"], np.float32)[:8])
            n, h, w, _ = imgs.shape
            grid = imgs.transpose(1, 0, 2, 3).reshape(h, n * w, 3)
            import os

            os.makedirs(str(self.config.save_dir), exist_ok=True)
            Image.fromarray(grid).save(
                os.path.join(str(self.config.save_dir),
                             f"samples_epoch{self.epoch:05d}.jpg"), quality=90)
        except Exception:
            pass  # grid saving is best-effort observability

    def save(self):
        cfg = self.config
        path = ckpt_lib.save_state(str(cfg.save_dir), int(self.state.global_step),
                                   self.state)
        ema_weights = self.state.ema.params if self.state.ema is not None else None
        ckpt_lib.save_lora_only(str(cfg.save_dir), int(self.state.global_step),
                                self.state.lora, use_ema_weights=ema_weights)
        ckpt_lib.prune_checkpoints(str(cfg.save_dir), int(cfg.num_checkpoint_limit))
        return path
