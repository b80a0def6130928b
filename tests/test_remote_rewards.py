"""Remote reward clients vs a loopback fixture server speaking the reference
wire protocols (pickle-over-POST for GenEval/DeQA, OpenAI-compatible JSON for
the sglang UnifiedReward judge — adv_grpo/rewards.py:761-1010)."""

import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from adv_grpo_tpu.rewards.remote import (
    deqa_score_client, extract_final_scores, geneval_score_client,
    unifiedreward_remote_client, unifiedreward_sglang_client,
    UNIFIEDREWARD_QUESTION,
)


class _Fixture(BaseHTTPRequestHandler):
    """Replays the reference servers' response shapes; records requests."""

    requests: list = []

    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        if self.path.endswith("/chat/completions"):
            req = json.loads(body)
            _Fixture.requests.append(("sglang", req))
            out = {"choices": [{"message": {"content":
                "<analysis> ... </analysis>\nFinal Score: 4.5"}}]}
            payload = json.dumps(out).encode()
            ctype = "application/json"
        else:
            req = pickle.loads(body)
            _Fixture.requests.append((self.path, req))
            n = len(req["images"])
            if "meta_datas" in req:  # geneval
                out = {
                    "scores": [0.75] * n,
                    "rewards": [1.0] * n,
                    "strict_rewards": [0.0] * n,
                    "group_rewards": {"two_object": [1.0] * n},
                    "group_strict_rewards": {"two_object": [0.0] * n},
                }
            elif "prompts" in req:  # unifiedreward pickle flavour
                out = {"outputs": [0.8] * n}
            else:  # deqa
                out = {"outputs": [3.5] * n}
            payload = pickle.dumps(out)
            ctype = "application/octet-stream"
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Fixture)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _images(n=3):
    return np.full((n, 16, 16, 3), 128, np.uint8)


class TestGeneval:
    def test_full_protocol(self, server):
        _Fixture.requests.clear()
        fn = geneval_score_client(url=server)
        metas = [{"tag": "two_object", "include": [{"class": "cat"}]}] * 3
        scores, rewards, strict, group_r, group_s = fn(
            _images(), ["p"] * 3, metas, only_strict=True)
        assert scores == [0.75] * 3
        assert rewards == [1.0] * 3 and strict == [0.0] * 3
        assert group_r == {"two_object": [1.0] * 3}
        assert group_s == {"two_object": [0.0] * 3}
        # wire format: pickled jpeg bytes + meta_datas + only_strict
        path, req = _Fixture.requests[0]
        assert set(req) == {"images", "meta_datas", "only_strict"}
        assert req["only_strict"] is True
        assert req["images"][0][:2] == b"\xff\xd8"  # JPEG SOI marker
        assert req["meta_datas"][0]["tag"] == "two_object"

    def test_registry_surfaces_details(self, server):
        from adv_grpo_tpu.rewards.registry import RewardContext, multi_score

        ctx = RewardContext()
        ctx.remote["geneval"] = geneval_score_client(url=server)
        fn = multi_score({"geneval": 1.0}, ctx)
        imgs = np.full((3, 3, 16, 16), 0.5, np.float32)
        details, _ = fn(imgs, ["p"] * 3, [{"tag": "two_object"}] * 3)
        np.testing.assert_allclose(details["geneval"], [0.75] * 3)
        np.testing.assert_allclose(details["avg"], [0.75] * 3)
        np.testing.assert_allclose(details["accuracy"], [1.0] * 3)
        np.testing.assert_allclose(details["strict_accuracy"], [0.0] * 3)
        assert details["two_object_accuracy"] == [1.0] * 3
        assert details["two_object_strict_accuracy"] == [0.0] * 3


class TestDeqaAndUnified:
    def test_deqa(self, server):
        fn = deqa_score_client(url=server)
        np.testing.assert_allclose(fn(_images(), ["p"] * 3), [3.5] * 3)

    def test_unifiedreward_pickle(self, server):
        _Fixture.requests.clear()
        fn = unifiedreward_remote_client(url=server)
        np.testing.assert_allclose(fn(_images(), ["a", "b", "c"]), [0.8] * 3)
        _, req = _Fixture.requests[0]
        assert req["prompts"] == ["a", "b", "c"]

    def test_unifiedreward_sglang(self, server):
        _Fixture.requests.clear()
        fn = unifiedreward_sglang_client(base_url=server + "/v1")
        scores = fn(_images(2), ["a cat", "a dog"])
        np.testing.assert_allclose(scores, [4.5 / 5.0] * 2)
        kind, req = _Fixture.requests[0]
        assert kind == "sglang"
        assert req["temperature"] == 0
        content = req["messages"][0]["content"]
        assert content[0]["type"] == "image_url"
        assert content[0]["image_url"]["url"].startswith("data:image;base64,")
        # verbatim reference rubric with the caption substituted
        assert content[1]["text"] in (
            UNIFIEDREWARD_QUESTION.format(prompt="a cat"),
            UNIFIEDREWARD_QUESTION.format(prompt="a dog"))
        assert "Final Score:" in content[1]["text"]


class TestScoreExtraction:
    def test_final_score_regex(self):
        texts = ["blah Final Score: 4", "Final Score: 3.5", "no score here",
                 "Final Score: 9"]  # 9 is out of the 1-5 pattern -> 0
        assert extract_final_scores(texts) == [4.0, 3.5, 0.0, 0.0]

    def test_qwenvl_rubric_verbatim(self):
        from adv_grpo_tpu.rewards.vlm import QWENVL_RUBRIC, extract_qwenvl_score

        # rubric parity anchors (reference qwenvl.py:40-58)
        for anchor in ("aesthetic quality score", "5. Excellent:",
                       "<Score>X</Score>", "<Thought>"):
            assert anchor in QWENVL_RUBRIC
        assert extract_qwenvl_score("<Thought>ok</Thought>\n<Score>4</Score>") \
            == 4.0 / 5.0


class TestStyleGANDiscriminator:
    def test_scores_and_shape_dispatch(self):
        import jax
        import jax.numpy as jnp

        from adv_grpo_tpu.models.stylegan_d import (
            StyleGANDConfig, StyleGANScorer, logits_to_scores,
        )
        from adv_grpo_tpu.rewards.registry import RewardContext, multi_score

        scorer = StyleGANScorer(StyleGANDConfig(image_size=16, base_channels=4,
                                                max_channels=16))
        params = scorer.init_params(jax.random.PRNGKey(0))
        imgs = jnp.asarray(np.random.default_rng(0).normal(
            0, 0.5, (4, 3, 16, 16)).clip(-1, 1), jnp.float32)
        s = np.asarray(scorer.score(params, imgs))
        assert s.shape == (4,) and np.all((s > 0) & (s < 1))

        # reference shape dispatch (rewards.py:622-634)
        b = jnp.asarray([0.0, 100.0])
        np.testing.assert_allclose(logits_to_scores(b), [0.5, 1.0], atol=1e-6)
        np.testing.assert_allclose(logits_to_scores(b[:, None]), [0.5, 1.0],
                                   atol=1e-6)
        patch = jnp.zeros((2, 1, 3, 3))
        np.testing.assert_allclose(logits_to_scores(patch), [0.5, 0.5],
                                   atol=1e-6)
        with pytest.raises(ValueError):
            logits_to_scores(jnp.zeros((2, 3)))

        # registry integration
        ctx = RewardContext(stylegan=scorer, stylegan_params=params)
        fn = multi_score({"discriminator": 1.0}, ctx)
        details, _ = fn(imgs, ["p"] * 4, [{}] * 4)
        np.testing.assert_allclose(details["avg"], s, rtol=1e-5)
