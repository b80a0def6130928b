"""Flux/Kontext and WAN sampler invariants (phase-2/3 model families)."""

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.rollout.flux import (
    FluxSamplerConfig, calculate_shift, flux_denoise_with_logprob, flux_schedule,
    pack_latents, unpack_latents,
)
from adv_grpo_tpu.rollout.wan import (
    WanSamplerConfig, wan_denoise_with_logprob, wan_schedule,
)
from adv_grpo_tpu.core.sde import flow_sde_step_with_logprob, wan_sde_step_with_logprob


class TestFluxPacking:
    def test_pack_unpack_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 8))
        packed = pack_latents(x)
        assert packed.shape == (2, 16, 64)
        np.testing.assert_allclose(np.asarray(unpack_latents(packed, 8, 8)),
                                   np.asarray(x))

    def test_calculate_shift_endpoints(self):
        # reference flux_pipeline_with_logprob.py:9-19
        np.testing.assert_allclose(calculate_shift(256), 0.5, rtol=1e-9)
        np.testing.assert_allclose(calculate_shift(4096), 1.15, rtol=1e-9)

    def test_schedule_monotone(self):
        sig, ts = flux_schedule(8, image_seq_len=1024)
        assert sig.shape == (9,) and ts.shape == (8,)
        assert np.all(np.diff(sig) < 0) and sig[-1] == 0.0


class TestFluxSampler:
    def test_rollout_and_kontext_conditioning(self):
        cfg = FluxSamplerConfig(num_steps=4, noise_level=0.5)
        B, S, D = 2, 16, 8

        def vfn(tokens, t):
            return -0.5 * tokens + 0.01 * t[:, None, None]

        lat = jax.random.normal(jax.random.PRNGKey(0), (B, S, D))
        out = jax.jit(lambda l, k: flux_denoise_with_logprob(vfn, l, k, cfg))(
            lat, jax.random.PRNGKey(1))
        assert out.all_latents.shape == (B, 5, S, D)
        assert out.log_probs.shape == (B, 4)
        assert np.all(np.isfinite(np.asarray(out.log_probs)))
        # Kontext: conditioning tokens change the trajectory via the model call
        cond = jnp.ones((B, 4, D))

        def vfn_cond(tokens, t):
            # model sees sample+cond tokens; coupling through the mean
            return -0.5 * tokens + jnp.mean(tokens, axis=1, keepdims=True)

        o1 = flux_denoise_with_logprob(vfn_cond, lat, jax.random.PRNGKey(1), cfg)
        o2 = flux_denoise_with_logprob(vfn_cond, lat, jax.random.PRNGKey(1), cfg,
                                       cond_latents=cond)
        assert float(jnp.max(jnp.abs(o1.final_latents - o2.final_latents))) > 1e-6

    def test_replay_identity_flow_sde(self):
        cfg = FluxSamplerConfig(num_steps=3, noise_level=0.6)
        vfn = lambda tokens, t: -0.3 * tokens
        lat = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 4))
        out = flux_denoise_with_logprob(vfn, lat, jax.random.PRNGKey(3), cfg)
        sig, ts = flux_schedule(3, 8)
        j = 1
        replay = flow_sde_step_with_logprob(
            vfn(out.all_latents[:, j], None), out.all_latents[:, j],
            float(sig[j]), float(sig[j + 1]), cfg.noise_level,
            sigma_at_one=float(sig[1]), prev_sample=out.all_latents[:, j + 1])
        np.testing.assert_allclose(np.asarray(replay.log_prob),
                                   np.asarray(out.log_probs[:, j]), rtol=1e-6)


class TestWanSampler:
    def test_video_rollout_shapes_and_kl(self):
        cfg = WanSamplerConfig(num_steps=3, kl_reward=1.0)
        B, C, F, H, W = 1, 4, 3, 4, 4

        def vfn(lat, t, lora_scale):
            return -lat * (0.5 + 0.1 * jnp.asarray(lora_scale))

        lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, F, H, W))
        out = jax.jit(lambda l, k: wan_denoise_with_logprob(vfn, l, k, cfg))(
            lat, jax.random.PRNGKey(1))
        assert out.all_latents.shape == (B, 4, C, F, H, W)
        assert out.log_probs.shape == (B, 3)
        assert out.kl.shape == (B, 3)
        assert float(jnp.max(out.kl)) > 0  # adapter vs base differ -> KL > 0

    def test_kl_zero_when_policies_match(self):
        cfg = WanSamplerConfig(num_steps=2, kl_reward=1.0)
        vfn = lambda lat, t, lora_scale: -lat * 0.5  # lora has no effect
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 2, 2))
        out = wan_denoise_with_logprob(vfn, lat, jax.random.PRNGKey(1), cfg)
        np.testing.assert_allclose(np.asarray(out.kl), 0.0, atol=1e-7)

    def test_deterministic_mode(self):
        cfg = WanSamplerConfig(num_steps=3, deterministic=True)
        vfn = lambda lat, t, lora_scale: -lat * 0.5
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 2, 2))
        a = wan_denoise_with_logprob(vfn, lat, jax.random.PRNGKey(1), cfg)
        b = wan_denoise_with_logprob(vfn, lat, jax.random.PRNGKey(2), cfg)
        np.testing.assert_allclose(np.asarray(a.final_latents),
                                   np.asarray(b.final_latents), rtol=1e-6)

    def test_wan_schedule_matches_unipc_flow_sigmas(self):
        """Golden values hand-computed (Decimal) from the published diffusers
        UniPCMultistepScheduler flow-sigma derivation (use_flow_sigmas=True,
        final_sigmas_type='zero' — the WAN checkpoints' scheduler, VERDICT r3
        #7): alphas=linspace(1,1/T,N+1); sigmas=flip(shift*(1-a)/(1+(shift-1)
        *(1-a)))[:-1]; timesteps=int(sigma*T); terminal 0 appended. The
        (1-1/T) factor and the int64 timestep truncation are load-bearing —
        they are what pretrained WAN weights saw."""
        sig, ts = wan_schedule(4, shift=3.0, num_train_timesteps=1000)
        np.testing.assert_allclose(
            sig, [0.9996664443, 0.8996397839, 0.7496248124, 0.4996665555,
                  0.0], rtol=0, atol=1e-7)
        np.testing.assert_array_equal(ts, [999.0, 899.0, 749.0, 499.0])

    def test_wan_rollout_noise_floor_is_reference_sigma_min(self):
        """The reference reads sigma_min = sigmas[-1] == the appended terminal
        0.0 (wan_pipeline_with_logprob.py:48), so std_dev_t = sigma_max*sigma
        with NO additive floor. Replaying a transition with that convention
        must reproduce the rollout's recorded logprob exactly."""
        cfg = WanSamplerConfig(num_steps=3)
        vfn = lambda lat, t, lora_scale: -lat * 0.5
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 2, 2))
        out = wan_denoise_with_logprob(vfn, lat, jax.random.PRNGKey(1), cfg)
        sig, _ = wan_schedule(3)
        x0 = out.all_latents[:, 0]
        replay = wan_sde_step_with_logprob(
            vfn(x0, None, 1.0), x0, float(sig[0]), float(sig[1]),
            sigma_min=0.0, sigma_max=float(sig[1]),
            prev_sample=out.all_latents[:, 1])
        np.testing.assert_allclose(np.asarray(replay.log_prob),
                                   np.asarray(out.log_probs[:, 0]), rtol=1e-6)

    def test_wan_step_deterministic_is_euler(self):
        x = jnp.ones((1, 2, 2, 2, 2))
        v = jnp.full_like(x, -0.5)
        sig, ts = wan_schedule(4)
        out = wan_sde_step_with_logprob(
            v, x, float(sig[1]), float(sig[2]), sigma_min=float(sig[-2]),
            sigma_max=float(sig[1]), noise=jnp.zeros_like(x), deterministic=True)
        dt = float(sig[2] - sig[1])
        np.testing.assert_allclose(np.asarray(out.prev_sample),
                                   np.asarray(x + dt * v), rtol=1e-6)


class TestFluxTransformer:
    def test_forward_and_sampler_integration(self):
        import numpy as np
        from adv_grpo_tpu.models.flux import (
            FluxConfig, FluxTransformer, make_latent_ids,
        )
        from adv_grpo_tpu.rollout.flux import FluxSamplerConfig, flux_denoise_with_logprob

        cfg = FluxConfig.tiny()
        model = FluxTransformer(cfg)
        B, gh, gw = 1, 4, 4
        S = gh * gw
        img_ids = make_latent_ids(gh, gw)
        txt_ids = np.zeros((3, 3), np.int32)
        lat = jax.random.normal(jax.random.PRNGKey(0), (B, S, cfg.in_channels))
        txt = jax.random.normal(jax.random.PRNGKey(1), (B, 3, cfg.joint_attention_dim))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.pooled_projection_dim))
        t = jnp.array([500.0])
        variables = jax.jit(
            lambda k: model.init(k, lat, t, txt, pooled, img_ids, txt_ids)
        )(jax.random.PRNGKey(3))
        out = model.apply(variables, lat, t, txt, pooled, img_ids, txt_ids)
        assert out.shape == (B, S, cfg.in_channels)
        assert np.all(np.isfinite(np.asarray(out)))

        # plug into the Flux rollout
        def vfn(tokens, tvec):
            return model.apply(variables, tokens, tvec, txt, pooled,
                               make_latent_ids(gh, gw)[: tokens.shape[1]], txt_ids)

        scfg = FluxSamplerConfig(num_steps=2, noise_level=0.5)
        roll = flux_denoise_with_logprob(vfn, lat, jax.random.PRNGKey(4), scfg)
        assert roll.log_probs.shape == (B, 2)
        assert np.all(np.isfinite(np.asarray(roll.log_probs)))

    def test_fused_qkv_matches_unfused(self):
        # fused single-matmul projections (incl. the single-block
        # qkv+proj_mlp merge) == separate Dense applications, same param tree
        import dataclasses
        import numpy as np
        from adv_grpo_tpu.models.flux import (
            FluxConfig, FluxTransformer, make_latent_ids,
        )

        cfg = FluxConfig.tiny()
        assert cfg.fused_qkv
        cfg_u = dataclasses.replace(cfg, fused_qkv=False)
        B, gh, gw = 1, 4, 4
        img_ids = make_latent_ids(gh, gw)
        txt_ids = np.zeros((3, 3), np.int32)
        lat = jax.random.normal(jax.random.PRNGKey(0), (B, gh * gw, cfg.in_channels))
        txt = jax.random.normal(jax.random.PRNGKey(1), (B, 3, cfg.joint_attention_dim))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.pooled_projection_dim))
        t = jnp.array([500.0])
        model = FluxTransformer(cfg)
        model_u = FluxTransformer(cfg_u)
        variables = jax.jit(
            lambda k: model.init(k, lat, t, txt, pooled, img_ids, txt_ids)
        )(jax.random.PRNGKey(3))
        v_u = jax.jit(
            lambda k: model_u.init(k, lat, t, txt, pooled, img_ids, txt_ids)
        )(jax.random.PRNGKey(3))
        assert (jax.tree_util.tree_structure(v_u)
                == jax.tree_util.tree_structure(variables))
        out_f = model.apply(variables, lat, t, txt, pooled, img_ids, txt_ids)
        out_u = model_u.apply(variables, lat, t, txt, pooled, img_ids, txt_ids)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                                   atol=2e-5)

    def test_rope_rotation_properties(self):
        import numpy as np
        from adv_grpo_tpu.models.flux import apply_rope_bshd, rope_freqs

        ids = np.array([[0, 0, 0], [0, 1, 2]], np.int32)
        ang = rope_freqs(ids, (4, 6, 6))
        assert ang.shape == (2, 8)
        np.testing.assert_allclose(ang[0], 0.0)  # zero ids -> no rotation
        # (B, S, H*D) layout: S=2 positions, 2 heads of d=16
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32))
        cos = jnp.cos(jnp.asarray(ang))
        sin = jnp.sin(jnp.asarray(ang))
        r = apply_rope_bshd(x, cos, sin, num_heads=2)
        # norm-preserving per head
        rn = r.reshape(1, 2, 2, 16)
        xn = x.reshape(1, 2, 2, 16)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(rn, axis=-1)),
            np.asarray(jnp.linalg.norm(xn, axis=-1)), rtol=1e-5)
        # zero-angle position unchanged
        np.testing.assert_allclose(np.asarray(r[:, 0]), np.asarray(x[:, 0]),
                                   atol=1e-6)


class TestWanTransformer:
    def test_forward_and_sampler_integration(self):
        import numpy as np
        from adv_grpo_tpu.models.wan import WanConfig, WanTransformer
        from adv_grpo_tpu.rollout.wan import WanSamplerConfig, wan_denoise_with_logprob

        cfg = WanConfig.tiny()
        model = WanTransformer(cfg)
        B, C, F, H, W = 1, 16, 2, 4, 4
        lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, F, H, W))
        txt = jax.random.normal(jax.random.PRNGKey(1), (B, 3, cfg.text_dim))
        t = jnp.array([500.0])
        variables = jax.jit(model.init)(jax.random.PRNGKey(2), lat, t, txt)
        out = model.apply(variables, lat, t, txt)
        assert out.shape == lat.shape
        assert np.all(np.isfinite(np.asarray(out)))

        def vfn(latents, tvec, lora_scale):
            return model.apply(variables, latents, tvec, txt)

        scfg = WanSamplerConfig(num_steps=2)
        roll = wan_denoise_with_logprob(vfn, lat, jax.random.PRNGKey(3), scfg)
        assert roll.log_probs.shape == (B, 2)
        assert np.all(np.isfinite(np.asarray(roll.log_probs)))


    def test_fused_qkv_matches_unfused(self):
        # self-attn q/k/v + cross-attn k/v fused matmuls == separate Dense
        import dataclasses
        import numpy as np
        from adv_grpo_tpu.models.wan import WanConfig, WanTransformer

        cfg = WanConfig.tiny()
        assert cfg.fused_qkv
        cfg_u = dataclasses.replace(cfg, fused_qkv=False)
        B, C, F, H, W = 1, 16, 2, 4, 4
        lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, F, H, W))
        txt = jax.random.normal(jax.random.PRNGKey(1), (B, 3, cfg.text_dim))
        t = jnp.array([500.0])
        model = WanTransformer(cfg)
        model_u = WanTransformer(cfg_u)
        variables = jax.jit(model.init)(jax.random.PRNGKey(2), lat, t, txt)
        v_u = jax.jit(model_u.init)(jax.random.PRNGKey(2), lat, t, txt)
        assert (jax.tree_util.tree_structure(v_u)
                == jax.tree_util.tree_structure(variables))
        out_f = model.apply(variables, lat, t, txt)
        out_u = model_u.apply(variables, lat, t, txt)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                                   atol=2e-5)


class TestWanVideoVAE:
    def test_roundtrip_shapes_and_causality(self):
        from adv_grpo_tpu.models.wan_vae import WanVAEConfig, WanVideoVAE

        cfg = WanVAEConfig.tiny()
        vae = WanVideoVAE(cfg)
        B, F, HW = 1, 5, 8  # F ≡ 1 mod temporal_factor (WAN 4k+1 layout)
        vid = jax.random.uniform(jax.random.PRNGKey(0), (B, 3, F, HW, HW),
                                 minval=-1, maxval=1)
        variables = jax.jit(vae.init)(jax.random.PRNGKey(1), vid)
        z = vae.apply(variables, vid, method=vae.encode)
        assert z.shape == (B, cfg.z_dim, cfg.latent_frames(F),
                           HW // cfg.spatial_factor, HW // cfg.spatial_factor)
        rec = vae.apply(variables, z, method=vae.decode)
        assert rec.shape == vid.shape
        r = np.asarray(rec)
        assert np.all((r >= -1) & (r <= 1)) and np.all(np.isfinite(r))

        # causal encoder: perturbing LATER frames leaves earlier latent
        # frames untouched (left-pad-only time convs)
        vid2 = vid.at[:, :, F - 1].add(1.0)
        z2 = vae.apply(variables, vid2, method=vae.encode)
        np.testing.assert_allclose(np.asarray(z[:, :, 0]),
                                   np.asarray(z2[:, :, 0]), atol=1e-6)
        assert np.abs(np.asarray(z[:, :, -1] - z2[:, :, -1])).max() > 1e-6

    def test_latent_stat_denormalisation(self):
        """decode must invert the reference's per-channel normalisation
        (wan_pipeline_with_logprob.py:354-363)."""
        from adv_grpo_tpu.models.wan_vae import WanVAEConfig, WanVideoVAE

        cfg0 = WanVAEConfig.tiny()
        cfg1 = WanVAEConfig.tiny(latents_mean=(0.5, -0.5, 0.1, 0.0),
                                 latents_std=(2.0, 1.0, 0.5, 1.5))
        vae0, vae1 = WanVideoVAE(cfg0), WanVideoVAE(cfg1)
        vid = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 3, 8, 8),
                                 minval=-1, maxval=1)
        variables = jax.jit(vae0.init)(jax.random.PRNGKey(1), vid)
        # same weights, different stats: encode->decode must agree (stats
        # cancel), while the normalised latents themselves differ
        z0 = vae0.apply(variables, vid, method=vae0.encode)
        z1 = vae1.apply(variables, vid, method=vae1.encode)
        assert np.abs(np.asarray(z0 - z1)).max() > 1e-4
        r0 = vae0.apply(variables, z0, method=vae0.decode)
        r1 = vae1.apply(variables, z1, method=vae1.decode)
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-5)

    def test_wan_rollout_to_video_ocr(self):
        """Rollout latents -> 3D VAE decode -> frames -> video_ocr scoring:
        the full WAN reward path (reference decodes via WanPipeline's VAE,
        wan_pipeline_with_logprob.py:343-371)."""
        from adv_grpo_tpu.models.wan import WanConfig, WanTransformer
        from adv_grpo_tpu.models.wan_vae import WanVAEConfig, WanVideoVAE
        from adv_grpo_tpu.rollout.wan import WanSamplerConfig, wan_denoise_with_logprob
        from adv_grpo_tpu.rewards.host import VideoOcrScorer
        from adv_grpo_tpu.native.lib import images_to_uint8

        cfg = WanConfig.tiny(in_channels=4, out_channels=4)
        model = WanTransformer(cfg)
        vcfg = WanVAEConfig.tiny()  # z_dim 4
        vae = WanVideoVAE(vcfg)
        B, C, F, HW = 1, 4, 2, 4
        lat = jax.random.normal(jax.random.PRNGKey(0), (B, C, F, HW, HW))
        txt = jax.random.normal(jax.random.PRNGKey(1), (B, 3, cfg.text_dim))
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(2), lat, jnp.array([500.0]), txt)
        # latent F' frames decode to 1 + (F'-1)*tf video frames (frame 0 is
        # the image frame, diffusers AutoencoderKLWan layout)
        vid_shape = (B, 3, 1 + (F - 1) * vcfg.temporal_factor,
                     HW * vcfg.spatial_factor, HW * vcfg.spatial_factor)
        vae_vars = jax.jit(vae.init)(
            jax.random.PRNGKey(3), jnp.zeros(vid_shape))

        def vfn(latents, tvec, lora_scale):
            return model.apply(variables, latents, tvec, txt)

        roll = wan_denoise_with_logprob(vfn, lat, jax.random.PRNGKey(4),
                                        WanSamplerConfig(num_steps=2))
        frames = vae.apply(vae_vars, roll.final_latents, method=vae.decode)
        assert frames.shape == vid_shape

        # frames feed video_ocr (every-4th-frame sampling, mean per clip)
        texts = iter(["hello", "hello"])
        scorer = VideoOcrScorer(engine=lambda img: next(texts, "hello"))
        u8 = np.stack([images_to_uint8(np.asarray(v, np.float32))
                       for v in np.asarray(frames)])
        scores = scorer(u8, ['say "hello" now'])
        assert scores.shape == (1,) and scores[0] == 1.0


class TestWanConverter:
    def test_convert_wan_synthetic_structure(self):
        """convert_wan consumes a synthetic diffusers-layout state dict and
        produces exactly the WanTransformer param structure."""
        from adv_grpo_tpu.models import convert
        from adv_grpo_tpu.models.wan import WanConfig, WanTransformer

        cfg = WanConfig.tiny()
        dim = cfg.hidden_dim
        d = cfg.attention_head_dim
        C = cfg.in_channels
        pt, ph, pw = cfg.patch_size
        rng = np.random.default_rng(0)

        def w(*shape):
            return rng.normal(0, 0.02, shape).astype(np.float32)

        sd = {
            "patch_embedding.weight": w(dim, C, pt, ph, pw),
            "patch_embedding.bias": w(dim),
            "condition_embedder.text_embedder.linear_1.weight": w(dim, cfg.text_dim),
            "condition_embedder.text_embedder.linear_1.bias": w(dim),
            "condition_embedder.text_embedder.linear_2.weight": w(dim, dim),
            "condition_embedder.text_embedder.linear_2.bias": w(dim),
            "condition_embedder.time_embedder.linear_1.weight": w(dim, 256),
            "condition_embedder.time_embedder.linear_1.bias": w(dim),
            "condition_embedder.time_embedder.linear_2.weight": w(dim, dim),
            "condition_embedder.time_embedder.linear_2.bias": w(dim),
            "condition_embedder.time_proj.weight": w(6 * dim, dim),
            "condition_embedder.time_proj.bias": w(6 * dim),
            "scale_shift_table": w(1, 2, dim),
            "proj_out.weight": w(pt * ph * pw * cfg.out_channels, dim),
            "proj_out.bias": w(pt * ph * pw * cfg.out_channels),
        }
        for i in range(cfg.num_layers):
            b = f"blocks.{i}."
            sd[b + "scale_shift_table"] = w(1, 6, dim)
            for a in ("attn1", "attn2"):
                for nm in ("to_q", "to_k", "to_v"):
                    sd[b + f"{a}.{nm}.weight"] = w(dim, dim)
                    sd[b + f"{a}.{nm}.bias"] = w(dim)
                sd[b + f"{a}.to_out.0.weight"] = w(dim, dim)
                sd[b + f"{a}.to_out.0.bias"] = w(dim)
                # WAN qk-norm is rms_norm_across_heads: weight spans H*d
                sd[b + f"{a}.norm_q.weight"] = w(dim)
                sd[b + f"{a}.norm_k.weight"] = w(dim)
            sd[b + "norm2.weight"] = w(dim)
            sd[b + "norm2.bias"] = w(dim)
            sd[b + "ffn.net.0.proj.weight"] = w(cfg.ffn_dim, dim)
            sd[b + "ffn.net.0.proj.bias"] = w(cfg.ffn_dim)
            sd[b + "ffn.net.2.weight"] = w(dim, cfg.ffn_dim)
            sd[b + "ffn.net.2.bias"] = w(dim)

        params = convert.convert_wan(sd, cfg)
        model = WanTransformer(cfg)
        lat = jnp.zeros((1, C, 2, 4, 4))
        txt = jnp.zeros((1, 3, cfg.text_dim))
        ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), lat,
                             jnp.zeros((1,)), txt)["params"]
        # exact structural match: same tree, same shapes
        got_paths = {"/".join(p1): v.shape for p1, v in
                     jax.tree_util.tree_flatten_with_path(params)[0] and []} \
            if False else None
        flat_ref = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_leaves_with_path(ref)}
        flat_got = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
                    jax.tree_util.tree_leaves_with_path(params)}
        assert flat_ref == flat_got, set(flat_ref) ^ set(flat_got)
        out = model.apply({"params": params}, lat, jnp.array([500.0]), txt)
        assert out.shape == lat.shape
        assert np.all(np.isfinite(np.asarray(out)))
