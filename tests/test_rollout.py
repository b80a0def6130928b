"""Rollout sampler invariants (SURVEY.md §4): replay identity, window semantics,
determinism at noise 0, CFG wiring."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.rollout.sampler import (
    SamplerConfig, denoise_with_logprob, compute_log_prob, sample_random_timestep,
)

B, C, HW = 2, 4, 4


def toy_velocity_fn(latents, t, embeds, pooled):
    # deterministic pseudo-model: contraction + prompt shift, t-dependent
    scale = 0.9 + 0.0001 * t[:, None, None, None]
    shift = jnp.mean(embeds, axis=(1, 2))[:, None, None, None]
    return -latents * scale + 0.01 * shift


def make_inputs(cfg_steps=4, cfg=None):
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (B, C, HW, HW))
    emb = jax.random.normal(key, (B, 3, 8))
    pooled = jnp.zeros((B, 5))
    neg = jnp.zeros_like(emb)
    negp = jnp.zeros_like(pooled)
    return lat, emb, pooled, neg, negp


CFG = SamplerConfig(num_steps=4, train_num_steps=2, guidance_scale=4.5,
                    noise_level=0.8)


@functools.partial(jax.jit, static_argnames=())
def _rollout(lat, emb, pooled, neg, negp, key, rt):
    return denoise_with_logprob(toy_velocity_fn, lat, emb, pooled, neg, negp,
                                key, CFG, random_timestep=rt)


class TestRollout:
    def test_shapes(self):
        out = _rollout(*make_inputs(), jax.random.PRNGKey(1), 1)
        assert out.latents.shape == (B, 3, C, HW, HW)
        assert out.log_probs.shape == (B, 2)
        assert out.timesteps.shape == (B, 2)
        assert out.final_latents.shape == (B, C, HW, HW)

    def test_replay_identity(self):
        # THE invariant: re-scoring the recorded transitions under the same
        # policy must reproduce the rollout logprobs exactly
        # (reference train_sd3_fast_pickscore.py:258-265 semantics).
        lat, emb, pooled, neg, negp = make_inputs()
        out = _rollout(lat, emb, pooled, neg, negp, jax.random.PRNGKey(1), 1)
        for j in range(2):
            lp, _, _ = compute_log_prob(
                toy_velocity_fn, out.latents[:, j], out.latents[:, j + 1],
                out.timesteps[:, j], out.sigmas[:, j], out.sigmas_prev[:, j],
                emb, pooled, neg, negp, CFG,
            )
            # 1-ulp tolerance: rollout computes the CPS step with a per-sample
            # noise-level vector, replay with a scalar — different XLA fusion,
            # identical math. 1e-7 logprob drift is 100x below clip_range 1e-5.
            np.testing.assert_allclose(np.asarray(lp),
                                       np.asarray(out.log_probs[:, j]),
                                       rtol=1e-6, atol=2e-7)

    def test_window_position_traced_no_retrace(self):
        # different random_timestep values reuse the same compiled fn
        lat, emb, pooled, neg, negp = make_inputs()
        o0 = _rollout(lat, emb, pooled, neg, negp, jax.random.PRNGKey(1), 0)
        o2 = _rollout(lat, emb, pooled, neg, negp, jax.random.PRNGKey(1), 2)
        # window timesteps must match schedule positions rt..rt+T-1
        assert float(o0.timesteps[0, 0]) > float(o2.timesteps[0, 0])
        # outside-window prefix of rt=2 run is deterministic: rerunning with a
        # different key gives identical window-entry latent
        o2b = _rollout(lat, emb, pooled, neg, negp, jax.random.PRNGKey(99), 2)
        np.testing.assert_allclose(np.asarray(o2.latents[:, 0]),
                                   np.asarray(o2b.latents[:, 0]), rtol=1e-6)

    def test_eval_mode_deterministic(self):
        cfg_eval = SamplerConfig(num_steps=4, train_num_steps=2, noise_level=0.0,
                                 guidance_scale=4.5)
        lat, emb, pooled, neg, negp = make_inputs()
        f = jax.jit(lambda k: denoise_with_logprob(
            toy_velocity_fn, lat, emb, pooled, neg, negp, k, cfg_eval, 0))
        a = f(jax.random.PRNGKey(1))
        b = f(jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(a.final_latents),
                                   np.asarray(b.final_latents), rtol=1e-6)

    def test_cfg_combination(self):
        # guidance 1.0 (no CFG) differs from 4.5, and cfg path sees neg embeds
        lat, emb, pooled, neg, negp = make_inputs()
        cfg1 = SamplerConfig(num_steps=4, train_num_steps=2, guidance_scale=1.0,
                             noise_level=0.0)
        a = jax.jit(lambda: denoise_with_logprob(
            toy_velocity_fn, lat, emb, pooled, neg, negp, jax.random.PRNGKey(1),
            cfg1, 0))()
        b = _rollout(lat, emb, pooled, jnp.ones_like(emb), negp,
                     jax.random.PRNGKey(1), 0)
        assert float(jnp.max(jnp.abs(a.final_latents - b.final_latents))) > 1e-6

    def test_random_timestep_range(self):
        cfg = SamplerConfig(num_steps=10, train_num_steps=2)
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        vals = np.asarray(jax.vmap(lambda k: sample_random_timestep(k, cfg))(keys))
        assert vals.min() >= 0 and vals.max() <= 5
        assert len(np.unique(vals)) > 3


class TestImageToImage:
    def test_denoise_from_image_pass_through_and_window(self):
        from adv_grpo_tpu.rollout.sampler import denoise_from_image

        lat, emb, pooled, neg, negp = make_inputs()
        images = jax.random.normal(jax.random.PRNGKey(5), (B, 3, HW * 2, HW * 2))

        def encode_image_fn(imgs, key):
            # stand-in VAE encode: downsample to latent shape deterministically
            return jnp.mean(imgs.reshape(B, 3, HW, 2, HW, 2), axis=(3, 5)).repeat(
                2, axis=1)[:, :C]

        out = denoise_from_image(
            toy_velocity_fn, encode_image_fn, images, emb, pooled, neg, negp,
            jax.random.PRNGKey(6), CFG, start_idx=2)
        # steps 0,1 skipped: their recorded logprobs are zero and x unchanged
        assert out.latents.shape == (B, 3, C, HW, HW)
        # window starts at start_idx=2 => both window steps executed
        assert np.all(np.isfinite(np.asarray(out.log_probs)))
        # replay identity still holds for executed window steps
        from adv_grpo_tpu.rollout.sampler import compute_log_prob

        lp, _, _ = compute_log_prob(
            toy_velocity_fn, out.latents[:, 0], out.latents[:, 1],
            out.timesteps[:, 0], out.sigmas[:, 0], out.sigmas_prev[:, 0],
            emb, pooled, neg, negp, CFG)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(out.log_probs[:, 0]),
                                   rtol=1e-6, atol=2e-7)


class TestSameLatent:
    def test_group_shares_initial_latent(self):
        """same_latent=True: group members share lat0 and (with the window
        pushed past the schedule) the whole deterministic trajectory."""
        from adv_grpo_tpu.models.mmdit import MMDiTConfig
        from adv_grpo_tpu.models.vae import VAEConfig
        from adv_grpo_tpu.train.grpo_trainer import make_sample_fn
        from adv_grpo_tpu.train.pipeline import SD3Pipeline
        from adv_grpo_tpu.models.lora import lora_params

        mcfg = MMDiTConfig.tiny(num_layers=1, dual_attention_layers=(),
                                lora_rank=2, lora_alpha=4.0)
        pipe = SD3Pipeline.random_init(jax.random.PRNGKey(0), mcfg,
                                       VAEConfig.tiny(latent_channels=16),
                                       latent_hw=8, text_seq_len=4)
        cfg = SamplerConfig(num_steps=2, train_num_steps=1,
                            guidance_scale=1.0, noise_level=0.7)
        lora0 = lora_params(pipe.transformer_params["params"])
        B, G = 4, 2
        emb = jnp.zeros((B, 4, mcfg.joint_attention_dim))
        pooled = jnp.zeros((B, mcfg.pooled_projection_dim))
        rt_off = jnp.full((B,), cfg.num_steps, jnp.int32)  # window never opens

        fn = make_sample_fn(pipe, cfg, 8, same_latent=True, group_size=G)
        _, images = fn(lora0, pipe.transformer_params, emb, pooled, emb,
                       pooled, jax.random.PRNGKey(3), rt_off)
        np.testing.assert_allclose(np.asarray(images[0]), np.asarray(images[1]),
                                   atol=1e-6)

        fn2 = make_sample_fn(pipe, cfg, 8, same_latent=False, group_size=G)
        _, images2 = fn2(lora0, pipe.transformer_params, emb, pooled, emb,
                         pooled, jax.random.PRNGKey(3), rt_off)
        assert float(np.max(np.abs(np.asarray(images2[0] - images2[1])))) > 1e-4


class TestSharedPrefixSampler:
    def _setup(self):
        from adv_grpo_tpu.models.mmdit import MMDiTConfig
        from adv_grpo_tpu.models.vae import VAEConfig
        from adv_grpo_tpu.models.lora import lora_params
        from adv_grpo_tpu.train.pipeline import SD3Pipeline

        mcfg = MMDiTConfig.tiny(num_layers=1, dual_attention_layers=(),
                                lora_rank=2, lora_alpha=4.0)
        pipe = SD3Pipeline.random_init(jax.random.PRNGKey(0), mcfg,
                                       VAEConfig.tiny(latent_channels=16),
                                       latent_hw=8, text_seq_len=4)
        lora0 = lora_params(pipe.transformer_params["params"])
        B, G = 4, 2
        emb = jax.random.normal(jax.random.PRNGKey(7),
                                (B, 4, mcfg.joint_attention_dim)) * 0.1
        # group members share the slot embedding (driver's repeat layout)
        emb = emb.at[1].set(emb[0]).at[3].set(emb[2])
        pooled = jnp.zeros((B, mcfg.pooled_projection_dim))
        return pipe, lora0, emb, pooled, B, G

    def test_matches_plain_path_when_deterministic(self):
        """noise_level=0: shared-prefix and plain same_latent paths are the
        same deterministic map -> identical final latents."""
        from adv_grpo_tpu.train.grpo_trainer import (
            make_sample_fn, make_shared_prefix_sample_fn,
        )

        pipe, lora0, emb, pooled, B, G = self._setup()
        cfg = SamplerConfig(num_steps=4, train_num_steps=2,
                            guidance_scale=1.0, noise_level=0.0)
        rt = 2
        plain = make_sample_fn(pipe, cfg, 8, same_latent=True, group_size=G)
        shared = make_shared_prefix_sample_fn(pipe, cfg, 8, group_size=G)
        key = jax.random.PRNGKey(3)
        out_p, img_p = plain(lora0, pipe.transformer_params, emb, pooled, emb,
                             pooled, key, jnp.full((B,), rt, jnp.int32))
        out_s, img_s = shared(lora0, pipe.transformer_params, emb, pooled,
                              emb, pooled, key, rt)
        np.testing.assert_allclose(np.asarray(out_s.final_latents),
                                   np.asarray(out_p.final_latents),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_s.latents),
                                   np.asarray(out_p.latents),
                                   rtol=2e-5, atol=2e-5)

    def test_window_replay_identity(self):
        """Stochastic shared-prefix rollout: the recorded window transitions
        replay to the same logprobs (THE sampler invariant)."""
        from adv_grpo_tpu.rollout.sampler import compute_log_prob
        from adv_grpo_tpu.train.grpo_trainer import make_shared_prefix_sample_fn
        from adv_grpo_tpu.models.lora import merge_lora_params

        pipe, lora0, emb, pooled, B, G = self._setup()
        cfg = SamplerConfig(num_steps=4, train_num_steps=2,
                            guidance_scale=1.0, noise_level=0.7)
        shared = make_shared_prefix_sample_fn(pipe, cfg, 8, group_size=G)
        out, _ = shared(lora0, pipe.transformer_params, emb, pooled, emb,
                        pooled, jax.random.PRNGKey(5), 1)
        params = {**pipe.transformer_params,
                  "params": merge_lora_params(
                      pipe.transformer_params["params"], lora0)}
        vfn = pipe.velocity_fn(params)
        for j in range(2):
            lp, _, _ = compute_log_prob(
                vfn, out.latents[:, j], out.latents[:, j + 1],
                out.timesteps[:, j], out.sigmas[:, j], out.sigmas_prev[:, j],
                emb, pooled, emb, pooled, cfg)
            np.testing.assert_allclose(np.asarray(lp),
                                       np.asarray(out.log_probs[:, j]),
                                       rtol=1e-5, atol=1e-5)
        # group members diverge only inside the window
        assert np.abs(np.asarray(out.final_latents[0]
                                 - out.final_latents[1])).max() > 1e-5
