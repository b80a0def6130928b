"""Golden tests for the numerics core (SURVEY.md §4 invariants).

Golden values are hand-computed in float64 numpy from the closed forms in the
reference (file:line cited per test) — not produced by this package — so they catch
transcription errors in the JAX implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adv_grpo_tpu.core.scheduler import flow_match_schedule
from adv_grpo_tpu.core.sde import cps_step_with_logprob, flow_sde_step_with_logprob
from adv_grpo_tpu.core.grpo import grpo_loss, group_advantages
from adv_grpo_tpu.core.stat_tracking import PerPromptStatTracker, calculate_zero_std_ratio
from adv_grpo_tpu.core.ema import ema_init, ema_update, ema_decay_at, ema_swap_in, ema_swap_out
from adv_grpo_tpu.data.krepeat import DistributedKRepeatSampler


class TestFlowMatchSchedule:
    def test_sigmas_10step_shift3(self):
        # diffusers FlowMatchEulerDiscreteScheduler.set_timesteps(10), shift=3
        # (default SD3.5 path; double-shift quirk included).
        sched = flow_match_schedule(10, shift=3.0)
        expected = np.array(
            [1.0, 0.9601293, 0.913349, 0.8576923, 0.79036826, 0.7072785,
             0.60215056, 0.46487603, 0.27804878, 0.00892857, 0.0],
            dtype=np.float32,
        )
        np.testing.assert_allclose(sched.sigmas, expected, rtol=1e-6)
        np.testing.assert_allclose(
            sched.timesteps[:3], [1000.0, 960.12933, 913.34894], rtol=1e-6
        )
        assert sched.num_steps == 10

    def test_monotone_descending_terminal_zero(self):
        for n in (1, 2, 4, 40):
            s = flow_match_schedule(n, shift=3.0).sigmas
            assert s.shape == (n + 1,)
            assert np.all(np.diff(s) < 0)
            assert s[-1] == 0.0 and s[0] == 1.0


class TestCPSStep:
    # Golden from sde_step_with_logprob_new closed form
    # (reference adv_grpo/diffusers_patch/sd3_sde_with_logprob.py:118-137).
    X = np.array([[0.5, -1.0], [2.0, 0.25]], np.float32)
    V = np.array([[1.0, 0.5], [-0.5, 2.0]], np.float32)
    PREV = np.array([[0.1, 0.2], [0.3, 0.4]], np.float32)

    def test_replay_mode_golden(self):
        out = cps_step_with_logprob(
            self.V, self.X, 0.7, 0.5, 0.8, prev_sample=self.PREV
        )
        np.testing.assert_allclose(float(out.std_dev_t[0, 0]), 0.47552825814757677, rtol=1e-6)
        np.testing.assert_allclose(
            out.prev_sample_mean,
            [[0.0236068, -0.80633222], [1.46084072, -0.44366778]],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(out.log_prob, [-0.50927023, -1.02966325], rtol=1e-5)
        np.testing.assert_allclose(out.prev_sample, self.PREV, rtol=1e-7)

    def test_sampling_mode_consistency(self):
        # Sampling with noise then replaying the produced prev_sample gives the
        # identical logprob (the old-vs-new logprob identity GRPO relies on,
        # reference train_sd3_fast_pickscore.py:258-265).
        key = jax.random.PRNGKey(0)
        noise = jax.random.normal(key, self.X.shape, jnp.float32)
        sampled = cps_step_with_logprob(self.V, self.X, 0.7, 0.5, 0.8, noise=noise)
        replayed = cps_step_with_logprob(
            self.V, self.X, 0.7, 0.5, 0.8, prev_sample=sampled.prev_sample
        )
        np.testing.assert_allclose(sampled.log_prob, replayed.log_prob, rtol=1e-6)

    def test_zero_noise_level_is_deterministic(self):
        noise = jnp.full(self.X.shape, 123.0)  # must have no effect
        out = cps_step_with_logprob(self.V, self.X, 0.7, 0.5, 0.0, noise=noise)
        assert float(jnp.max(jnp.abs(out.prev_sample - out.prev_sample_mean))) == 0.0
        # noise_level=0: mean = x0*(1-sp) + x1*sp  (sqrt(sp^2-0)=sp)
        x0 = self.X - 0.7 * self.V
        x1 = self.X + self.V * 0.3
        np.testing.assert_allclose(
            out.prev_sample_mean, x0 * 0.5 + x1 * 0.5, rtol=1e-5, atol=1e-6
        )

    def test_per_sample_sigma_vector(self):
        out_vec = cps_step_with_logprob(
            self.V, self.X, np.array([0.7, 0.7]), np.array([0.5, 0.5]), 0.8,
            prev_sample=self.PREV,
        )
        out_scalar = cps_step_with_logprob(self.V, self.X, 0.7, 0.5, 0.8, prev_sample=self.PREV)
        np.testing.assert_allclose(out_vec.log_prob, out_scalar.log_prob, rtol=1e-7)

    def test_runs_under_jit_with_traced_noise_level(self):
        @jax.jit
        def f(nl):
            return cps_step_with_logprob(self.V, self.X, 0.7, 0.5, nl, prev_sample=self.PREV).log_prob

        np.testing.assert_allclose(f(0.8), [-0.50927023, -1.02966325], rtol=1e-5)

    def test_bf16_inputs_fp32_island(self):
        out = cps_step_with_logprob(
            self.V.astype(jnp.bfloat16), self.X.astype(jnp.bfloat16), 0.7, 0.5, 0.8,
            prev_sample=self.PREV.astype(jnp.bfloat16),
        )
        assert out.prev_sample_mean.dtype == jnp.float32
        assert out.log_prob.dtype == jnp.float32


class TestFlowSDEStep:
    def test_replay_mode_golden(self):
        # Golden from sde_step_with_logprob closed form (reference :44-71).
        X = TestCPSStep.X
        V = TestCPSStep.V
        PREV = TestCPSStep.PREV
        out = flow_sde_step_with_logprob(
            V, X, 0.7, 0.5, 0.7, sigma_at_one=0.9967, prev_sample=PREV
        )
        np.testing.assert_allclose(
            out.prev_sample_mean,
            [[0.16933333, -0.96116667], [1.79783333, -0.28883333]],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(out.log_prob, [-1.66054685, -3.15276359], rtol=1e-5)
        np.testing.assert_allclose(float(out.std_dev_t[0, 0]), 1.0692676621563626, rtol=1e-6)

    def test_sigma_one_guard(self):
        X = TestCPSStep.X
        V = TestCPSStep.V
        out = flow_sde_step_with_logprob(
            V, X, 1.0, 0.96, 0.7, sigma_at_one=0.9601293,
            noise=jnp.zeros_like(X),
        )
        assert np.all(np.isfinite(np.asarray(out.prev_sample)))
        expected_std = np.sqrt(1.0 / (1.0 - 0.9601293)) * 0.7
        np.testing.assert_allclose(float(out.std_dev_t[0, 0]), expected_std, rtol=1e-5)


class TestGRPOLoss:
    def test_golden_clip_algebra(self):
        # Golden from reference train_sd3_fast_pickscore.py:1106-1156.
        out = grpo_loss(
            jnp.array([-1.0, -2.0, -0.5]),
            jnp.array([-1.00002, -1.99997, -0.500001]),
            jnp.array([2.0, -7.0, 0.5]),
            clip_range=1e-5, adv_clip_max=5.0,
        )
        np.testing.assert_allclose(out.ratio, [1.00002, 0.99997, 1.000001], rtol=1e-6)
        np.testing.assert_allclose(float(out.policy_loss), 0.8333098333332499, rtol=1e-5)
        np.testing.assert_allclose(float(out.approx_kl), 2.1683333e-10, rtol=5e-2)
        np.testing.assert_allclose(float(out.clipfrac), 2 / 3, rtol=1e-6)
        np.testing.assert_allclose(float(out.clipfrac_gt_one), 1 / 3, rtol=1e-6)
        np.testing.assert_allclose(float(out.clipfrac_lt_one), 1 / 3, rtol=1e-6)
        assert float(out.kl_loss) == 0.0
        np.testing.assert_allclose(float(out.loss), float(out.policy_loss), rtol=1e-7)

    def test_advantage_clamp(self):
        # adv=-7 must be clamped to -5 before entering the loss.
        out = grpo_loss(
            jnp.array([-2.0]), jnp.array([-2.0]), jnp.array([-7.0]),
            clip_range=1e-4, adv_clip_max=5.0,
        )
        np.testing.assert_allclose(float(out.policy_loss), 5.0, rtol=1e-6)

    def test_kl_term(self):
        m = jnp.ones((2, 3)) * 2.0
        m_ref = jnp.zeros((2, 3))
        out = grpo_loss(
            jnp.array([-1.0, -1.0]), jnp.array([-1.0, -1.0]), jnp.array([1.0, 1.0]),
            clip_range=1e-4, adv_clip_max=5.0, beta=0.5,
            prev_sample_mean=m, prev_sample_mean_ref=m_ref,
        )
        np.testing.assert_allclose(float(out.kl_loss), 4.0, rtol=1e-6)
        np.testing.assert_allclose(float(out.loss), float(out.policy_loss) + 2.0, rtol=1e-6)

    def test_gradient_direction(self):
        # Positive advantage => increasing log_prob decreases the loss.
        def loss_of(lp):
            return grpo_loss(
                lp, jnp.array([-1.0]), jnp.array([1.0]),
                clip_range=1e4,  # unclipped region
                adv_clip_max=5.0,
            ).loss

        g = jax.grad(loss_of)(jnp.array([-1.0]))
        assert float(g[0]) < 0


class TestStatTracker:
    def test_reference_smoke_golden(self):
        # Reference stat_tracking.py:81-94 __main__ smoke, hand-computed.
        tracker = PerPromptStatTracker()
        adv = tracker.update(list("abacba"), [1, 2, 3, 4, 5, 6])
        np.testing.assert_allclose(
            adv,
            [-1.13549469, -0.99993334, -0.16221353, 0.0, 0.99993334, 1.29770821],
            rtol=1e-6,
        )
        avg_group, nprompts = tracker.get_stats()
        assert avg_group == 2.0 and nprompts == 3
        tracker.clear()
        assert tracker.stats == {} and len(tracker.history_prompts) == 3

    def test_cross_call_history(self):
        # Stats accumulate across update calls within an epoch (reference :34-45).
        t = PerPromptStatTracker()
        t.update(["p"], [1.0])
        adv = t.update(["p"], [3.0])
        # group is now [1, 3]: mean 2, std 1 -> adv of 3 is (3-2)/(1+1e-4)
        np.testing.assert_allclose(adv, [(3 - 2) / (1 + 1e-4)], rtol=1e-9)

    def test_global_std(self):
        t = PerPromptStatTracker(global_std=True)
        rewards = [1.0, 2.0, 10.0, 20.0]
        adv = t.update(["a", "a", "b", "b"], rewards)
        gstd = np.std(rewards) + 1e-4
        np.testing.assert_allclose(adv, [(1 - 1.5) / gstd, (2 - 1.5) / gstd,
                                         (10 - 15) / gstd, (20 - 15) / gstd], rtol=1e-9)

    def test_rwr_sft_dpo_modes(self):
        t = PerPromptStatTracker()
        np.testing.assert_allclose(t.update(["a", "a"], [3.0, 7.0], type="rwr"), [3.0, 7.0])
        t.clear()
        t = PerPromptStatTracker()
        np.testing.assert_allclose(t.update(["a", "a", "a"], [1.0, 5.0, 5.0], type="sft"),
                                   [0.0, 1.0, 1.0])
        t = PerPromptStatTracker()
        np.testing.assert_allclose(t.update(["a", "a", "a"], [1.0, 9.0, 5.0], type="dpo"),
                                   [-1.0, 1.0, 0.0])
        # degenerate all-equal group -> +1 at index 1, -1 at index 0 (reference :61-63)
        t = PerPromptStatTracker()
        np.testing.assert_allclose(t.update(["a", "a", "a"], [2.0, 2.0, 2.0], type="dpo"),
                                   [-1.0, 1.0, 0.0])

    def test_zero_std_ratio(self):
        ratio, mean_std = calculate_zero_std_ratio(
            ["a", "a", "b", "b"], np.array([1.0, 1.0, 0.0, 2.0])
        )
        assert ratio == 0.5
        np.testing.assert_allclose(mean_std, 0.5)


class TestGroupAdvantagesDevice:
    def test_matches_host_tracker_fresh_epoch(self):
        rng = np.random.default_rng(0)
        rewards = rng.normal(size=32).astype(np.float32)
        prompts = [f"p{i % 4}" for i in range(32)]
        gids = np.array([int(p[1:]) for p in prompts])
        host = PerPromptStatTracker().update(prompts, rewards)
        dev = group_advantages(jnp.asarray(rewards), jnp.asarray(gids), 4)
        np.testing.assert_allclose(np.asarray(dev), host, rtol=2e-5, atol=1e-6)

    def test_global_std_matches(self):
        rng = np.random.default_rng(1)
        rewards = rng.normal(size=16).astype(np.float32)
        prompts = [f"p{i % 2}" for i in range(16)]
        gids = np.array([int(p[1:]) for p in prompts])
        host = PerPromptStatTracker(global_std=True).update(prompts, rewards)
        dev = group_advantages(jnp.asarray(rewards), jnp.asarray(gids), 2, global_std=True)
        np.testing.assert_allclose(np.asarray(dev), host, rtol=2e-5, atol=1e-6)


class TestEMA:
    def test_warmup_decay_schedule(self):
        # reference ema.py:33-37
        np.testing.assert_allclose(float(ema_decay_at(0, 0.9)), 0.1)
        np.testing.assert_allclose(float(ema_decay_at(40, 0.9)), 41 / 50)
        np.testing.assert_allclose(float(ema_decay_at(10_000, 0.9)), 0.9)

    def test_update_and_interval_gating(self):
        params = {"w": jnp.array([2.0])}
        st = ema_init({"w": jnp.array([0.0])})
        # step=0: decay 0.1 -> ema += 0.9*(2-0) = 1.8
        st1 = ema_update(st, params, 0, decay=0.9, update_step_interval=1)
        np.testing.assert_allclose(np.asarray(st1.params["w"]), [1.8], rtol=1e-6)
        # interval 8, step=0: (0+1)%8 != 0 -> no update (reference ema.py:45)
        st2 = ema_update(st, params, 0, decay=0.9, update_step_interval=8)
        np.testing.assert_allclose(np.asarray(st2.params["w"]), [0.0])
        # step=7: (7+1)%8 == 0 -> update applies with decay min(8/17, .9)
        st3 = ema_update(st, params, 7, decay=0.9, update_step_interval=8)
        np.testing.assert_allclose(np.asarray(st3.params["w"]), [(1 - 8 / 17) * 2.0], rtol=1e-6)

    def test_swap_semantics(self):
        live = {"w": jnp.array([5.0])}
        st = ema_init({"w": jnp.array([1.0])})
        use, temp = ema_swap_in(st, live)
        np.testing.assert_allclose(np.asarray(use["w"]), [1.0])
        restored = ema_swap_out(temp)
        np.testing.assert_allclose(np.asarray(restored["w"]), [5.0])


class TestKRepeatSampler:
    @pytest.mark.parametrize("nrep,bs,k", [(8, 8, 2), (8, 4, 4), (4, 8, 16), (2, 8, 2)])
    def test_partition_and_group_structure(self, nrep, bs, k):
        # Union of all ranks' batches = m unique prompts, each exactly k times
        # (reference train_sd3_fast_pickscore.py:102-126).
        samplers = [
            DistributedKRepeatSampler(1000, bs, k, nrep, r, seed=7) for r in range(nrep)
        ]
        allidx = np.concatenate([s.batch_for_epoch(3) for s in samplers])
        assert len(allidx) == bs * nrep
        vals, counts = np.unique(allidx, return_counts=True)
        assert len(vals) == bs * nrep // k
        assert np.all(counts == k)

    def test_deterministic_across_ranks_and_calls(self):
        a = DistributedKRepeatSampler(100, 8, 2, 8, 3, seed=0)
        b = DistributedKRepeatSampler(100, 8, 2, 8, 3, seed=0)
        np.testing.assert_array_equal(a.batch_for_epoch(5), b.batch_for_epoch(5))
        assert not np.array_equal(a.batch_for_epoch(5), a.batch_for_epoch(6))

    def test_divisibility_assert(self):
        with pytest.raises(ValueError):
            DistributedKRepeatSampler(100, 3, 7, 8, 0)
