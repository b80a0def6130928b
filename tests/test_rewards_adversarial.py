"""Reward registry + adversarial loss tests (goldens hand-computed in numpy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adv_grpo_tpu.adversarial.clip_criterion import (
    CLIPCriterionBatch, clip_criterion_loss,
)
from adv_grpo_tpu.adversarial.dino_hinge import dino_hinge_loss
from adv_grpo_tpu.rewards.host import ocr_reward_from_text, jpeg_compressibility
from adv_grpo_tpu.rewards.registry import multi_score, RewardContext
from adv_grpo_tpu.rewards.scorers import PickScoreScorer, DINOScorer
from adv_grpo_tpu.rewards.preprocess import preprocess, to_unit, quantize_uint8
from adv_grpo_tpu.models.clip_text import CLIPTextConfig
from adv_grpo_tpu.models.vit import ViTConfig
from adv_grpo_tpu.native.lib import levenshtein, images_to_uint8


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestCLIPCriterion:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.t = _norm(rng.normal(size=(2, 3)))
        self.i0 = _norm(rng.normal(size=(2, 3)))
        self.i1 = _norm(rng.normal(size=(2, 3)))
        self.scale = float(np.exp(4.6052))

    def test_pairwise_golden(self):
        # hand-computed from the closed form (reference pick_score_training.py:176-189)
        batch = CLIPCriterionBatch(
            jnp.asarray(self.t), jnp.asarray(self.i0), jnp.asarray(self.i1),
            jnp.array([1.0, 1.0]), jnp.array([0.0, 0.0]),
        )
        loss = clip_criterion_loss(batch, self.scale)
        # f32 log-softmax of well-separated ±100-scale logits loses absolute
        # precision below ~1e-5; the golden is f64.
        np.testing.assert_allclose(float(loss), 0.0002730657877503262, atol=3e-5)

    def test_tie_term(self):
        batch = CLIPCriterionBatch(
            jnp.asarray(self.t), jnp.asarray(self.i0), jnp.asarray(self.i1),
            jnp.array([0.5, 0.5]), jnp.array([0.5, 0.5]),
        )
        loss = clip_criterion_loss(batch, self.scale)
        np.testing.assert_allclose(float(loss), 7.44710222270383, rtol=1e-4)

    def test_distributed_gather_matches_local(self):
        # loss over the full batch == shard_map'd loss with all_gather over 4 devs
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        rng = np.random.default_rng(1)
        t = _norm(rng.normal(size=(8, 4)))
        i0 = _norm(rng.normal(size=(8, 4)))
        i1 = _norm(rng.normal(size=(8, 4)))
        l0, l1 = np.ones(8), np.zeros(8)
        batch_full = CLIPCriterionBatch(*map(jnp.asarray, (t, i0, i1, l0, l1)))
        local = clip_criterion_loss(batch_full, 10.0)

        mesh = Mesh(np.array(jax.devices()[:4]), ("d",))

        def sharded(t, i0, i1, l0, l1):
            b = CLIPCriterionBatch(t, i0, i1, l0, l1)
            return clip_criterion_loss(b, 10.0, axis_name="d")

        f = shard_map(sharded, mesh=mesh,
                      in_specs=(P("d"), P("d"), P("d"), P("d"), P("d")),
                      out_specs=P(), check_rep=False)
        dist = f(*map(jnp.asarray, (t, i0, i1, l0, l1)))
        np.testing.assert_allclose(float(dist), float(local), rtol=1e-5)

    def test_in_batch_negatives_runs(self):
        batch = CLIPCriterionBatch(
            jnp.asarray(self.t), jnp.asarray(self.i0), jnp.asarray(self.i1),
            jnp.array([1.0, 1.0]), jnp.array([0.0, 0.0]),
        )
        loss = clip_criterion_loss(batch, self.scale, in_batch_negatives=True)
        assert np.isfinite(float(loss))


class TestDinoHinge:
    def test_hinge_values_and_accuracy(self):
        # head = mean over feature dim => logits controllable exactly
        head_apply = lambda p, x: jnp.mean(x, axis=-1)
        tokens_real = jnp.full((2, 5, 4), 2.0)  # logit 2 -> relu(1-2)=0
        tokens_fake = jnp.full((2, 5, 4), -3.0)  # logit -3 -> relu(1-3)=0
        out = dino_hinge_loss(head_apply, None, tokens_real, tokens_fake,
                              jax.random.PRNGKey(0), n_patches=2)
        np.testing.assert_allclose(float(out.image_loss), 0.0)
        np.testing.assert_allclose(float(out.patch_loss), 0.0)
        np.testing.assert_allclose(float(out.accuracy), 1.0)
        # misclassified fakes: logit +3 -> fake hinge relu(1+3)=4
        out2 = dino_hinge_loss(head_apply, None, tokens_real,
                               jnp.full((2, 5, 4), 3.0),
                               jax.random.PRNGKey(0), n_patches=2)
        np.testing.assert_allclose(float(out2.image_loss), 2.0)
        np.testing.assert_allclose(float(out2.accuracy), 0.5)
        np.testing.assert_allclose(
            float(out2.loss), float(out2.image_loss) + 0.3 * float(out2.patch_loss))

    def test_gradient_direction(self):
        # gradient should push real logits up / fake logits down through the head
        def head_apply(p, x):
            return jnp.sum(x * p, axis=-1)

        p = jnp.zeros(4)
        real = jnp.ones((2, 3, 4))
        fake = -jnp.ones((2, 3, 4))

        def loss(p):
            return dino_hinge_loss(head_apply, p, real, fake,
                                   jax.random.PRNGKey(0), n_patches=2).loss

        g = jax.grad(loss)(p)
        assert np.all(np.asarray(g) < 0)  # increase p -> higher real logits -> lower loss


class TestOcrReward:
    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "abc") == 0

    def test_reward_normalisation(self):
        # reference ocr.py:45-61
        assert ocr_reward_from_text('hello world', 'Hello World') == 1.0  # substring after norm
        assert ocr_reward_from_text("xhellox", "hello") == 1.0  # substring
        r = ocr_reward_from_text("helXo", "hello")
        np.testing.assert_allclose(r, 1 - 1 / 5)
        assert ocr_reward_from_text("zzzzzzzzzzzz", "hi") == 0.0  # capped at len


class TestPreprocess:
    def test_quantize_matches_uint8_roundtrip(self):
        imgs = np.random.default_rng(0).uniform(-1, 1, (2, 3, 8, 8)).astype(np.float32)
        q = np.asarray(quantize_uint8(to_unit(jnp.asarray(imgs))))
        u8 = images_to_uint8(imgs)  # native path
        np.testing.assert_allclose(q, u8.transpose(0, 3, 1, 2) / 255.0, atol=1 / 255 + 1e-6)

    def test_preprocess_shape_and_norm(self):
        imgs = jnp.zeros((2, 3, 16, 16))  # -> unit 0.5
        out = preprocess(imgs, 8, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
        assert out.shape == (2, 3, 8, 8)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-2)


class TestRegistry:
    def _tiny_ctx(self):
        ps = PickScoreScorer(CLIPTextConfig.tiny(projection_dim=16),
                             ViTConfig.tiny(projection_dim=16), image_size=28)
        params = ps.init_params(jax.random.PRNGKey(0))
        tokenize = lambda prompts: np.full((len(prompts), 16), 3, np.int32)
        return RewardContext(pickscore=ps, pickscore_params=params,
                             tokenize=tokenize)

    def test_weighted_avg(self):
        ctx = self._tiny_ctx()
        fn = multi_score({"pickscore": 2.0, "jpeg_compressibility": 0.5}, ctx)
        imgs = np.random.default_rng(0).uniform(-1, 1, (2, 3, 28, 28)).astype(np.float32)
        details, meta = fn(jnp.asarray(imgs), ["a cat", "a dog"])
        assert set(details) == {"pickscore", "jpeg_compressibility", "avg"}
        np.testing.assert_allclose(
            details["avg"],
            2.0 * details["pickscore"] + 0.5 * details["jpeg_compressibility"],
            rtol=1e-6,
        )
        assert meta == {}

    def test_unknown_reward_raises(self):
        with pytest.raises(KeyError):
            multi_score({"nope": 1.0}, RewardContext())

    def test_missing_context_raises(self):
        fn = multi_score({"pickscore": 1.0}, RewardContext())
        with pytest.raises(RuntimeError):
            fn(np.zeros((1, 3, 8, 8), np.float32), ["x"])

    def test_dino_similarity(self):
        dino = DINOScorer(ViTConfig.dinov2_base(image_size=28, num_layers=1,
                                                hidden_size=32,
                                                intermediate_size=64, num_heads=2),
                          image_size=28)
        bp = dino.init_backbone(jax.random.PRNGKey(0))
        imgs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 3, 28, 28)),
                           jnp.float32)
        refs = jnp.stack([imgs, imgs * 0.5], axis=1)  # (B, R=2, ...)
        sims = dino.similarity_to_refs(bp, imgs, refs)
        assert sims.shape == (2,)
        # an identical reference is among the refs -> max similarity == 1
        np.testing.assert_allclose(np.asarray(sims), 1.0, atol=1e-4)

    def test_image_similarity_eval_surfaces_embeddings(self):
        """image_similarity_eval returns feat/ref_feat into score_details
        (reference rewards.py:1061-1064 from image_similarity_score_eval
        :208-262); plain image_similarity does not."""
        dino = DINOScorer(ViTConfig.dinov2_base(image_size=28, num_layers=1,
                                                hidden_size=32,
                                                intermediate_size=64,
                                                num_heads=2),
                          image_size=28)
        bp = dino.init_backbone(jax.random.PRNGKey(0))
        ctx = RewardContext(dino=dino, dino_backbone_params=bp)
        imgs = np.random.default_rng(0).uniform(
            -1, 1, (2, 3, 28, 28)).astype(np.float32)
        refs = np.stack([imgs, imgs * 0.5], axis=1)  # (B, R=2, ...)
        fn = multi_score({"image_similarity_eval": 1.0}, ctx)
        details, _ = fn(jnp.asarray(imgs), ["a", "b"],
                        ref_images=jnp.asarray(refs))
        assert set(details) == {"image_similarity_eval", "feat", "ref_feat",
                                "avg"}
        assert details["feat"].shape == (2, 32)
        assert details["ref_feat"].shape == (2, 2, 32)
        # embeddings are L2-normalised CLS features; scores match cosine max
        np.testing.assert_allclose(
            np.linalg.norm(details["feat"], axis=-1), 1.0, atol=1e-5)
        want = np.einsum("bd,brd->br", details["feat"],
                         details["ref_feat"]).max(axis=1)
        np.testing.assert_allclose(details["image_similarity_eval"], want,
                                   rtol=1e-5)
        # the plain training-time name keeps the lean (scores-only) payload
        fn2 = multi_score({"image_similarity": 1.0}, ctx)
        details2, _ = fn2(jnp.asarray(imgs), ["a", "b"],
                          ref_images=jnp.asarray(refs))
        assert set(details2) == {"image_similarity", "avg"}


class TestDinoMultiDStep:
    def test_heads_and_fusion_train(self):
        """The multi-layer D-step moves BOTH heads and fusion and improves the
        hinge on a separable real/fake distribution."""
        import jax
        import jax.numpy as jnp

        from adv_grpo_tpu.models.vit import ViTConfig
        from adv_grpo_tpu.rewards.scorers import DINOMultiScorer, DINOScorer
        from adv_grpo_tpu.train.grpo_trainer import make_dino_multi_d_step

        dino = DINOScorer(ViTConfig.dinov2_base(
            image_size=28, num_layers=2, hidden_size=32,
            intermediate_size=64, num_heads=2), image_size=28)
        multi = DINOMultiScorer(dino, layer_ids=(0, 1))
        key = jax.random.PRNGKey(0)
        backbone = dino.init_backbone(key)
        params = multi.init_heads(key)

        make = make_dino_multi_d_step(multi, d_lr=1e-2)
        step, opt_state = make(params)

        real = jnp.full((4, 3, 28, 28), 0.5) + 0.1 * jax.random.normal(
            key, (4, 3, 28, 28))
        fake = jnp.full((4, 3, 28, 28), -0.5) + 0.1 * jax.random.normal(
            jax.random.fold_in(key, 1), (4, 3, 28, 28))

        losses = []
        p = params
        for i in range(8):
            p, opt_state, loss, acc = step(p, opt_state, backbone, real, fake,
                                           jax.random.fold_in(key, i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        # heads AND fusion kernels moved (biases can have zero hinge grad at
        # the symmetric init: the real/fake relu terms cancel exactly)
        assert float(jnp.max(jnp.abs(
            params["fusion"]["fuse"]["kernel"]
            - p["fusion"]["fuse"]["kernel"]))) > 0
        for h0, h1 in zip(params["heads"], p["heads"]):
            assert float(jnp.max(jnp.abs(
                h0["fc1"]["kernel"] - h1["fc1"]["kernel"]))) > 0
        # the co-trained reward reflects the new params
        s_real = np.asarray(multi.score(backbone, p, real))
        s_fake = np.asarray(multi.score(backbone, p, fake))
        assert s_real.mean() > s_fake.mean()

    def test_trainer_gate_drives_multi(self):
        """dino_multi rides the periodic D-gate like dino_patch."""
        import jax.numpy as jnp

        calls = []

        def fake_step(params, opt, backbone, real, fake, key):
            calls.append(1)
            return params, opt, jnp.float32(0.5), jnp.float32(0.9)

        import types

        from tests.test_trainer_e2e import (
            make_trainer, tiny_config, _ToyDataset,  # noqa: F401
        )
        import tests.test_trainer_e2e as e2e
        from adv_grpo_tpu.train.driver import DiscriminatorBundle

        cfg = e2e.tiny_config()
        cfg.train_d = True
        cfg.discriminator = "dino_multi"
        cfg.d_times = 2
        disc = DiscriminatorBundle(kind="dino_multi", step_fn=fake_step,
                                   opt_state=None, params={"w": jnp.zeros(())},
                                   backbone_params={})

        class RefStore:
            def get_batch(self, prompts, rng=None):
                return np.zeros((len(prompts), 1, 3, 16, 16), np.float32)

        import jax

        from adv_grpo_tpu.models.mmdit import MMDiTConfig
        from adv_grpo_tpu.models.vae import VAEConfig
        from adv_grpo_tpu.train.pipeline import SD3Pipeline

        pipe = SD3Pipeline.random_init(
            jax.random.PRNGKey(0),
            MMDiTConfig.tiny(num_layers=2, dual_attention_layers=(0,),
                             lora_rank=4, lora_alpha=8.0),
            VAEConfig.tiny(latent_channels=16), latent_hw=8, text_seq_len=6)
        ctx = types.SimpleNamespace(pickscore_params=None,
                                    dino_head_params=None,
                                    dino_multi_params=None)
        trainer = e2e.make_trainer(pipe, cfg, discriminator=disc,
                                   reference_store=RefStore(), reward_ctx=ctx)
        trainer.run(max_epochs=2)
        # epoch 0: (0+1)%2 != 0 -> D; epoch 1: (1+1)%2 == 0 -> G
        assert len(calls) == cfg.sample.num_batches_per_epoch
        assert ctx.dino_multi_params is disc.params  # live reward params
