"""Offline PickScore preference finetune (reference
adv_grpo/pick_score_training.py:314-373 finetune_pickscore_distributed +
:19-73 evaluate_pickscore): dataset triples, jitted criterion step, preference
accuracy, msgpack artifact, and the warm-start path into the trainer."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def pair_dirs(tmp_path_factory):
    """8 prompt pairs: good = bright images, bad = dark — linearly separable
    for any image-sensitive scorer once trained."""
    root = tmp_path_factory.mktemp("pairs")
    good, bad = root / "good", root / "bad"
    good.mkdir(), bad.mkdir()
    rng = np.random.default_rng(0)
    p2i = {}
    for i in range(8):
        fname = f"img_{i}.png"
        g = (rng.uniform(0.7, 1.0, (32, 32, 3)) * 255).astype(np.uint8)
        b = (rng.uniform(0.0, 0.3, (32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(g).save(good / fname)
        Image.fromarray(b).save(bad / fname)
        p2i[f"prompt {i}"] = fname
    # one missing good file: must degrade to (bad, bad) like the reference
    p2i["prompt missing"] = "nope.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(bad / "nope.png")
    jf = root / "prompt2img.json"
    jf.write_text(json.dumps(p2i))
    return str(jf), str(good), str(bad)


class TestPreferencePairDataset:
    def test_triples_and_fallback(self, pair_dirs):
        from adv_grpo_tpu.data.datasets import PreferencePairDataset

        jf, good, bad = pair_dirs
        ds = PreferencePairDataset(jf, good, bad, resolution=28)
        assert len(ds) == 9
        row = ds[0]
        assert row["good"].shape == (3, 28, 28)
        assert row["good"].mean() > row["bad"].mean()  # bright vs dark
        # missing good file -> (bad, bad) (reference :252-257)
        miss = ds[8]
        np.testing.assert_array_equal(miss["good"], miss["bad"])
        prompts, g, b = ds.get_batch([0, 1, 8])
        assert len(prompts) == 3 and g.shape == (3, 3, 28, 28)
        # native batch loader vs PIL path agree to 1 uint8 level (the
        # documented loader parity bound, native/image_loader.cpp)
        np.testing.assert_allclose(g[0], ds[0]["good"], atol=2.01 / 255)
        np.testing.assert_array_equal(g[2], b[2])

    def test_multi_variation_json(self, pair_dirs, tmp_path):
        from adv_grpo_tpu.data.datasets import PreferencePairDataset

        jf, good, bad = pair_dirs
        p2i = {"prompt 0": ["img_0.png", "img_1.png"]}
        j2 = tmp_path / "multi.json"
        j2.write_text(json.dumps(p2i))
        ds = PreferencePairDataset(str(j2), good, bad, resolution=28)
        assert ds[0]["good"].shape == (3, 28, 28)


class TestFinetuneCLI:
    def test_finetune_improves_preference_accuracy(self, pair_dirs, tmp_path):
        from adv_grpo_tpu.cli.finetune_pickscore import main

        jf, good, bad = pair_dirs
        out = main(["--json_file", jf, "--good_dir", good, "--bad_dir", bad,
                    "--out", str(tmp_path / "ft"), "--smoke", "--epochs", "3",
                    "--batch", "4", "--lr", "1e-3", "--max_eval", "9"])
        hist = out["history"]
        assert hist[0]["epoch"] == -1 and "pref_accuracy" in hist[0]
        assert os.path.exists(out["params_path"])
        assert os.path.exists(str(tmp_path / "ft" / "finetune_metrics.json"))
        # bright-vs-dark is separable: trained accuracy must beat a coin flip
        # and not be worse than the random-init start
        final = hist[-1]
        assert final["pref_accuracy"] >= hist[0]["pref_accuracy"]
        assert final["pref_accuracy"] > 0.5
        assert np.isfinite(final["train_loss"])

    def test_msgpack_warm_starts_trainer_d(self, pair_dirs, tmp_path):
        # the saved artifact must load through the trainer's weight_path flow
        import jax
        import jax.numpy as jnp
        from flax import serialization

        from adv_grpo_tpu.cli.finetune_pickscore import main
        from adv_grpo_tpu.models.clip_text import CLIPTextConfig
        from adv_grpo_tpu.models.vit import ViTConfig
        from adv_grpo_tpu.rewards.scorers import PickScoreScorer

        jf, good, bad = pair_dirs
        out = main(["--json_file", jf, "--good_dir", good, "--bad_dir", bad,
                    "--out", str(tmp_path / "ft2"), "--smoke",
                    "--epochs", "1", "--batch", "4", "--max_eval", "4"])

        scorer = PickScoreScorer(CLIPTextConfig.tiny(projection_dim=16),
                                 ViTConfig.tiny(projection_dim=16),
                                 image_size=28)
        fresh = scorer.init_params(jax.random.PRNGKey(42))

        class Disc:
            kind = "pickscore"
            params = fresh
            opt_state = None

        from adv_grpo_tpu.train.driver import GRPOTrainer

        # drive ONLY restore_discriminator: bind a minimal self
        t = GRPOTrainer.__new__(GRPOTrainer)
        t.disc = Disc()
        t.reward_ctx = None
        GRPOTrainer.restore_discriminator(t, out["params_path"])
        loaded = t.disc.params
        saved = serialization.from_bytes(fresh,
                                         open(out["params_path"], "rb").read())
        sl = jax.tree_util.tree_leaves(saved)
        ll = jax.tree_util.tree_leaves(loaded)
        assert all(np.allclose(a, b) for a, b in zip(sl, ll))
