"""Precomputed text-embedding store: write with the precompute CLI, train and
eval against it with zero encoder weights loaded (SURVEY §7.3.7 T5-XXL memory
hard-part — the TPU answer is precompute + memmap)."""

import json
import os

import numpy as np
import pytest

from adv_grpo_tpu.cli import precompute_embeds
from adv_grpo_tpu.cli.common import make_hash_text_encoder, resolve_config
from adv_grpo_tpu.data.embed_store import EmbeddingStore, write_store


class TestStore:
    def test_write_and_read_roundtrip(self, tmp_path):
        enc = make_hash_text_encoder(6, 32, 16)
        prompts = [f"p{i}" for i in range(11)] + ["p3", "p5"]  # dupes dedup
        d = write_store(str(tmp_path / "s"), prompts, enc, batch_size=4)
        store = EmbeddingStore(d)
        assert len(store.index) == 11
        e, p = store(["p7", "p0", "p7"])
        we, wp = enc(["p7", "p0", "p7"])
        np.testing.assert_allclose(e, we, atol=1e-3)  # fp16 storage grid
        np.testing.assert_allclose(p, wp, atol=1e-3)

    def test_strict_unknown_prompt(self, tmp_path):
        enc = make_hash_text_encoder(4, 8, 8)
        d = write_store(str(tmp_path / "s"), ["a", "b"], enc, batch_size=2)
        store = EmbeddingStore(d)
        with pytest.raises(KeyError, match="precomputed store"):
            store(["zzz"])

    def test_ragged_final_batch_padding(self, tmp_path):
        enc = make_hash_text_encoder(4, 8, 8)
        d = write_store(str(tmp_path / "s"), [f"q{i}" for i in range(5)],
                        enc, batch_size=4)
        store = EmbeddingStore(d)
        e, _ = store([f"q{i}" for i in range(5)])
        we, _ = enc([f"q{i}" for i in range(5)])
        np.testing.assert_allclose(e, we, atol=1e-3)


class TestEndToEnd:
    def test_precompute_cli_then_eval(self, tmp_path):
        """precompute_embeds over the smoke dataset, then run the eval CLI
        with text_embeds_dir — same images as the live-encoder path (the
        smoke encoder is deterministic, so outputs must be bitwise-close)."""
        store = str(tmp_path / "store")
        import pytest

        with pytest.raises(SystemExit):
            # smoke config has no real text encoders: the CLI must refuse to
            # write a hash-pseudo-embedding store without the explicit flag
            precompute_embeds.main(["--config", "smoke_sd3_fast",
                                    "--out", store, "--batch", "8"])
        precompute_embeds.main(["--config", "smoke_sd3_fast", "--out", store,
                                "--splits", "train,test", "--batch", "8",
                                "--allow-fallback"])
        assert os.path.exists(os.path.join(store, "embeds.npy"))
        with open(os.path.join(store, "prompts.json")) as f:
            prompts = json.load(f)
        assert "" in prompts  # negative prompt included

        from adv_grpo_tpu.cli import eval as eval_cli

        out_a = str(tmp_path / "eval_live")
        sa = eval_cli.main(["--config", "smoke_sd3_fast", "--out_dir", out_a,
                            "--limit", "3", "--batch", "2"])
        out_b = str(tmp_path / "eval_store")
        sb = eval_cli.main(["--config", "smoke_sd3_fast", "--out_dir", out_b,
                            "--limit", "3", "--batch", "2",
                            "--set", f"text_embeds_dir={store}"])
        assert sa["n_saved"] == sb["n_saved"] == 3
        from PIL import Image

        for f_ in sorted(os.listdir(out_a)):
            if not f_.endswith(".png"):
                continue
            a = np.asarray(Image.open(os.path.join(out_a, f_)), np.int16)
            b = np.asarray(Image.open(os.path.join(out_b, f_)), np.int16)
            # fp16 embedding storage perturbs the hash embeddings slightly
            assert np.mean(np.abs(a - b)) < 2.0, f_

    def test_trainer_with_store(self, tmp_path):
        """One smoke trainer epoch fed from the store (cli.train --set)."""
        store = str(tmp_path / "store")
        precompute_embeds.main(["--config", "smoke_sd3_fast", "--out", store,
                                "--splits", "train,test", "--batch", "8",
                                "--allow-fallback"])
        from adv_grpo_tpu.cli import train as train_cli

        train_cli.main(["--config", "smoke_sd3_fast", "--max_epochs", "1",
                        "--set", f"save_dir={tmp_path / 'run'}",
                        "--set", f"text_embeds_dir={store}"])
        assert os.path.exists(os.path.join(str(tmp_path / "run"),
                                           "metrics.jsonl"))
