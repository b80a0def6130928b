"""Weight-conversion parity tests against live `transformers` torch models.

Tiny random-weight HF models are converted and their outputs compared
numerically — this is the strongest conversion check available without model
downloads (diffusers/timm are absent; their converters get structural tests
via synthetic state dicts in the MMDiT/VAE cases below when feasible).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from adv_grpo_tpu.models.clip_text import CLIPTextEncoder, CLIPTextConfig
from adv_grpo_tpu.models.t5 import T5Encoder, T5Config
from adv_grpo_tpu.models.vit import VisionTransformer, ViTConfig
from adv_grpo_tpu.models import convert


def _sd_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


class TestCLIPTextParity:
    def test_clip_text_matches_hf(self):
        torch.manual_seed(0)
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, projection_dim=24,
            eos_token_id=98, bos_token_id=97, hidden_act="quick_gelu")
        torch_model = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
        ids = torch.tensor([[97, 5, 6, 7, 98, 0, 0, 0]])
        with torch.no_grad():
            out = torch_model(ids, output_hidden_states=True)

        cfg = CLIPTextConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                             num_layers=2, num_heads=2, max_position_embeddings=16,
                             projection_dim=24, hidden_act="quick_gelu",
                             eos_token_id=98)
        params = convert.convert_clip_text(_sd_numpy(torch_model), 2)
        model = CLIPTextEncoder(cfg)
        final, penult, pooled = model.apply({"params": params},
                                            jnp.asarray(ids.numpy()))
        np.testing.assert_allclose(np.asarray(final),
                                   out.last_hidden_state.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(penult),
                                   out.hidden_states[-2].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.text_embeds.numpy(), atol=1e-4)


class TestT5Parity:
    def test_t5_encoder_matches_hf(self):
        torch.manual_seed(0)
        hf_cfg = transformers.T5Config(
            vocab_size=101, d_model=32, d_kv=8, d_ff=48, num_layers=2,
            num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
            dropout_rate=0.0)
        torch_model = transformers.T5EncoderModel(hf_cfg).eval()
        ids = torch.tensor([[3, 4, 5, 6, 1, 0, 0, 0]])
        mask = torch.tensor([[1, 1, 1, 1, 1, 0, 0, 0]])
        with torch.no_grad():
            out = torch_model(ids, attention_mask=mask).last_hidden_state

        cfg = T5Config(vocab_size=101, d_model=32, d_kv=8, d_ff=48, num_layers=2,
                       num_heads=4, relative_attention_num_buckets=8,
                       relative_attention_max_distance=20, dtype=jnp.float32)
        params = convert.convert_t5_encoder(_sd_numpy(torch_model), 2)
        model = T5Encoder(cfg)
        got = model.apply({"params": params}, jnp.asarray(ids.numpy()),
                          jnp.asarray(mask.numpy().astype(bool)))
        np.testing.assert_allclose(np.asarray(got)[:, :5], out.numpy()[:, :5],
                                   atol=1e-4)


class TestCLIPVisionParity:
    def test_clip_vision_matches_hf(self):
        torch.manual_seed(0)
        hf_cfg = transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            projection_dim=24, hidden_act="quick_gelu")
        torch_model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
        img = torch.randn(2, 3, 28, 28)
        with torch.no_grad():
            out = torch_model(img)

        cfg = ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                        intermediate_size=64, num_layers=2, num_heads=2,
                        projection_dim=24, hidden_act="quick_gelu")
        params = convert.convert_clip_vision(_sd_numpy(torch_model), 2)
        model = VisionTransformer(cfg)
        got = model.apply({"params": params}, jnp.asarray(img.numpy()))
        np.testing.assert_allclose(np.asarray(got["pooled"]),
                                   out.image_embeds.numpy(), atol=1e-4)


class TestStructuralConverters:
    def test_mmdit_converter_consumes_synthetic_state(self):
        # build a synthetic diffusers-style state dict for a tiny config and
        # check the converted tree loads into the Flax module
        from adv_grpo_tpu.models.mmdit import MMDiT, MMDiTConfig

        cfg = MMDiTConfig.tiny(lora_rank=0)
        dim = cfg.hidden_dim
        rng = np.random.default_rng(0)
        sd = {}

        def lin(name, i, o):
            sd[name + ".weight"] = rng.normal(0, 0.02, (o, i)).astype(np.float32)
            sd[name + ".bias"] = np.zeros(o, np.float32)

        sd["pos_embed.proj.weight"] = rng.normal(0, 0.02, (dim, 16, 2, 2)).astype(np.float32)
        sd["pos_embed.proj.bias"] = np.zeros(dim, np.float32)
        lin("time_text_embed.timestep_embedder.linear_1", 256, dim)
        lin("time_text_embed.timestep_embedder.linear_2", dim, dim)
        lin("time_text_embed.text_embedder.linear_1", cfg.pooled_projection_dim, dim)
        lin("time_text_embed.text_embedder.linear_2", dim, dim)
        lin("context_embedder", cfg.joint_attention_dim, dim)
        lin("norm_out.linear", dim, 2 * dim)
        lin("proj_out", dim, 4 * cfg.out_channels)
        for i in range(cfg.num_layers):
            b = f"transformer_blocks.{i}."
            last = i == cfg.num_layers - 1
            lin(b + "norm1.linear", dim, (9 if i in cfg.dual_attention_layers else 6) * dim)
            lin(b + "norm1_context.linear", dim, (2 if last else 6) * dim)
            for nm in ["to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"]:
                lin(b + f"attn.{nm}", dim, dim)
            lin(b + "attn.to_out.0", dim, dim)
            if not last:
                lin(b + "attn.to_add_out", dim, dim)
                lin(b + "ff_context.net.0.proj", dim, 4 * dim)
                lin(b + "ff_context.net.2", 4 * dim, dim)
            lin(b + "ff.net.0.proj", dim, 4 * dim)
            lin(b + "ff.net.2", 4 * dim, dim)
            for nq in ["norm_q", "norm_k", "norm_added_q", "norm_added_k"]:
                sd[b + f"attn.{nq}.weight"] = np.ones(cfg.attention_head_dim, np.float32)
            if i in cfg.dual_attention_layers:
                for nm in ["to_q", "to_k", "to_v"]:
                    lin(b + f"attn2.{nm}", dim, dim)
                lin(b + "attn2.to_out.0", dim, dim)
                sd[b + "attn2.norm_q.weight"] = np.ones(cfg.attention_head_dim, np.float32)
                sd[b + "attn2.norm_k.weight"] = np.ones(cfg.attention_head_dim, np.float32)

        params = convert.convert_mmdit(sd, cfg)
        model = MMDiT(cfg)
        out = model.apply({"params": params}, jnp.zeros((1, 16, 8, 8)),
                          jnp.zeros((1,)), jnp.zeros((1, 6, cfg.joint_attention_dim)),
                          jnp.zeros((1, cfg.pooled_projection_dim)))
        assert out.shape == (1, 16, 8, 8)
        assert np.all(np.isfinite(np.asarray(out)))


class TestFluxConverter:
    def test_flux_converter_synthetic(self):
        from adv_grpo_tpu.models.flux import FluxConfig, FluxTransformer, make_latent_ids

        cfg = FluxConfig.tiny(guidance_embeds=True)
        dim = cfg.hidden_dim
        rng = np.random.default_rng(0)
        sd = {}

        def lin(name, i, o):
            sd[name + ".weight"] = rng.normal(0, 0.02, (o, i)).astype(np.float32)
            sd[name + ".bias"] = np.zeros(o, np.float32)

        lin("x_embedder", cfg.in_channels, dim)
        lin("context_embedder", cfg.joint_attention_dim, dim)
        for name, i in [("timestep_embedder", 256), ("text_embedder", cfg.pooled_projection_dim),
                        ("guidance_embedder", 256)]:
            lin(f"time_text_embed.{name}.linear_1", i, dim)
            lin(f"time_text_embed.{name}.linear_2", dim, dim)
        lin("norm_out.linear", dim, 2 * dim)
        lin("proj_out", dim, cfg.in_channels)
        hd = cfg.attention_head_dim
        for i in range(cfg.num_double_layers):
            b = f"transformer_blocks.{i}."
            lin(b + "norm1.linear", dim, 6 * dim)
            lin(b + "norm1_context.linear", dim, 6 * dim)
            for nm in ["to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"]:
                lin(b + f"attn.{nm}", dim, dim)
            lin(b + "attn.to_out.0", dim, dim)
            lin(b + "attn.to_add_out", dim, dim)
            for nm in ["norm_q", "norm_k", "norm_added_q", "norm_added_k"]:
                sd[b + f"attn.{nm}.weight"] = np.ones(hd, np.float32)
            lin(b + "ff.net.0.proj", dim, 4 * dim)
            lin(b + "ff.net.2", 4 * dim, dim)
            lin(b + "ff_context.net.0.proj", dim, 4 * dim)
            lin(b + "ff_context.net.2", 4 * dim, dim)
        for i in range(cfg.num_single_layers):
            b = f"single_transformer_blocks.{i}."
            lin(b + "norm.linear", dim, 3 * dim)
            for nm in ["to_q", "to_k", "to_v"]:
                lin(b + f"attn.{nm}", dim, dim)
            sd[b + "attn.norm_q.weight"] = np.ones(hd, np.float32)
            sd[b + "attn.norm_k.weight"] = np.ones(hd, np.float32)
            lin(b + "proj_mlp", dim, 4 * dim)
            lin(b + "proj_out", 5 * dim, dim)

        params = convert.convert_flux(sd, cfg)
        model = FluxTransformer(cfg)
        S = 16
        out = model.apply({"params": params},
                          jnp.zeros((1, S, cfg.in_channels)), jnp.array([500.0]),
                          jnp.zeros((1, 3, cfg.joint_attention_dim)),
                          jnp.zeros((1, cfg.pooled_projection_dim)),
                          make_latent_ids(4, 4), np.zeros((3, 3), np.int32))
        assert out.shape == (1, S, cfg.in_channels)
        assert np.all(np.isfinite(np.asarray(out)))


class TestUMT5Parity:
    def test_umt5_encoder_matches_hf(self):
        """UMT5 = per-layer relative bias (WAN's text encoder); activation
        parity vs transformers.UMT5EncoderModel with random weights."""
        torch.manual_seed(0)
        hf_cfg = transformers.UMT5Config(
            vocab_size=101, d_model=32, d_kv=8, d_ff=48, num_layers=2,
            num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
            dropout_rate=0.0, is_encoder_decoder=False)
        torch_model = transformers.UMT5EncoderModel(hf_cfg).eval()
        ids = torch.tensor([[3, 4, 5, 6, 1, 0, 0, 0], [7, 8, 1, 0, 0, 0, 0, 0]])
        mask = (ids != 0).long()
        with torch.no_grad():
            out = torch_model(ids, attention_mask=mask).last_hidden_state

        cfg = T5Config(vocab_size=101, d_model=32, d_kv=8, d_ff=48,
                       num_layers=2, num_heads=4,
                       relative_attention_num_buckets=8,
                       relative_attention_max_distance=20,
                       per_layer_rel_bias=True, dtype=jnp.float32)
        params = convert.convert_umt5_encoder(_sd_numpy(torch_model), 2)
        model = T5Encoder(cfg)
        got = model.apply({"params": params}, jnp.asarray(ids.numpy()),
                          jnp.asarray(mask.numpy().astype(bool)))
        np.testing.assert_allclose(np.asarray(got)[0, :5], out.numpy()[0, :5],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(got)[1, :3], out.numpy()[1, :3],
                                   atol=1e-4)

    def test_shared_bias_t5_rejects_umt5_state(self):
        """Real UMT5 checkpoints must NOT silently convert through the
        shared-bias T5 path (the per-layer tables would be dropped)."""
        torch.manual_seed(0)
        hf_cfg = transformers.UMT5Config(
            vocab_size=101, d_model=32, d_kv=8, d_ff=48, num_layers=2,
            num_heads=4, relative_attention_num_buckets=8,
            dropout_rate=0.0, is_encoder_decoder=False)
        torch_model = transformers.UMT5EncoderModel(hf_cfg).eval()
        sd = _sd_numpy(torch_model)
        p = convert.convert_umt5_encoder(sd, 2)
        # every layer carries its own table, and they differ
        b0 = p["block_0"]["relative_attention_bias"]
        b1 = p["block_1"]["relative_attention_bias"]
        assert np.abs(b0 - b1).max() > 0


class TestSigLIPParity:
    def test_siglip_vision_matches_hf(self):
        torch.manual_seed(0)
        hf_cfg = transformers.SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            attention_dropout=0.0)
        torch_model = transformers.SiglipVisionModel(hf_cfg).eval()
        img = torch.randn(2, 3, 28, 28)
        with torch.no_grad():
            out = torch_model(img)

        from adv_grpo_tpu.models.siglip import SigLIPVisionConfig, SigLIPVisionTower

        cfg = SigLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                                 intermediate_size=64, num_layers=2,
                                 num_heads=2)
        params = convert.convert_siglip(_sd_numpy(torch_model), 2)
        model = SigLIPVisionTower(cfg)
        got = model.apply({"params": params}, jnp.asarray(img.numpy()))
        np.testing.assert_allclose(np.asarray(got["tokens"]),
                                   out.last_hidden_state.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["pooled"]),
                                   out.pooler_output.numpy(), atol=1e-4)


class TestDinov2Parity:
    def test_dinov2_matches_hf(self):
        """The DINO reward backbone: converted HF Dinov2Model activations
        match ours (CLS + patch tokens) — upgrades the DINO converter from
        structure-tested to parity-tested."""
        torch.manual_seed(0)
        hf_cfg = transformers.Dinov2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            mlp_ratio=2, image_size=28, patch_size=14,  # mlp = 2*32 = 64
            layerscale_value=0.5, attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0, drop_path_rate=0.0)
        torch_model = transformers.Dinov2Model(hf_cfg).eval()
        img = torch.randn(2, 3, 28, 28)
        with torch.no_grad():
            out = torch_model(img).last_hidden_state

        cfg = ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                        intermediate_size=64, num_layers=2, num_heads=2,
                        layer_norm_eps=1e-6, use_pre_ln=False,
                        layer_scale_init=0.5, projection_dim=None)
        params = convert.convert_dinov2_hf(_sd_numpy(torch_model), 2)
        model = VisionTransformer(cfg)
        got = model.apply({"params": params}, jnp.asarray(img.numpy()))
        np.testing.assert_allclose(np.asarray(got["tokens"]), out.numpy(),
                                   atol=2e-4)


class TestBlipTextParity:
    def test_blip_text_matches_hf(self):
        """BLIP med-BERT (ImageReward's text encoder): bidirectional self-attn
        + per-layer cross-attn to image tokens, parity vs transformers
        BlipTextModel (constructed is_decoder=True for the cross layers,
        called is_decoder=False => no causal mask — the 'text' mode)."""
        from transformers.models.blip.modeling_blip_text import BlipTextModel

        torch.manual_seed(0)
        hf_cfg = transformers.BlipTextConfig(
            vocab_size=50, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=16, encoder_hidden_size=24,
            is_decoder=True, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)
        torch_model = BlipTextModel(hf_cfg, add_pooling_layer=False).eval()
        ids = torch.tensor([[2, 5, 7, 9, 0, 0], [3, 4, 0, 0, 0, 0]])
        mask = (ids != 0).long()
        img_tokens = torch.randn(2, 3, 24)
        with torch.no_grad():
            want = torch_model(
                ids, attention_mask=mask, encoder_hidden_states=img_tokens,
                is_decoder=False).last_hidden_state.numpy()

        from adv_grpo_tpu.models.blip import BlipTextConfig, BlipTextEncoder

        cfg = BlipTextConfig(vocab_size=50, hidden_size=32, num_layers=2,
                             num_heads=2, intermediate_size=64,
                             max_position_embeddings=16, encoder_width=24)
        params = convert.convert_blip_text(_sd_numpy(torch_model), 2)
        model = BlipTextEncoder(cfg)
        got = model.apply({"params": params}, jnp.asarray(ids.numpy()),
                          jnp.asarray(mask.numpy().astype(bool)),
                          jnp.asarray(img_tokens.numpy()))
        np.testing.assert_allclose(np.asarray(got)[0, :4], want[0, :4],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(got)[1, :2], want[1, :2],
                                   atol=1e-4)


class TestImageRewardNative:
    def test_model_and_converter(self):
        """Tiny ImageRewardModel end-to-end + convert_imagereward structural
        round trip on a synthetic checkpoint (timm ViT + med BERT + mlp)."""
        import jax

        from adv_grpo_tpu.models.blip import BlipTextConfig, ImageRewardModel
        from adv_grpo_tpu.models.vit import ViTConfig

        tcfg = BlipTextConfig.tiny(encoder_width=32)
        vcfg = ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                         intermediate_size=64, num_layers=2, num_heads=2,
                         layer_norm_eps=1e-6, use_pre_ln=False,
                         layer_scale_init=None, projection_dim=None)
        model = ImageRewardModel(tcfg, vcfg, image_size=32)
        params = model.init_params(jax.random.PRNGKey(0))
        imgs = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (3, 3, 32, 32)), jnp.float32)
        ids = jnp.asarray([[2, 5, 7, 0]] * 3, jnp.int32)
        s = np.asarray(model.score(params, imgs, ids))
        assert s.shape == (3,) and np.all(np.isfinite(s))

        # synthetic ImageReward-layout checkpoint converts to the same tree
        rng = np.random.default_rng(0)

        def w(*shape):
            return rng.normal(0, 0.02, shape).astype(np.float32)

        D, Dt = 32, tcfg.hidden_size
        sd = {"blip.visual_encoder.patch_embed.proj.weight": w(D, 3, 16, 16),
              "blip.visual_encoder.patch_embed.proj.bias": w(D),
              "blip.visual_encoder.cls_token": w(1, 1, D),
              "blip.visual_encoder.pos_embed": w(1, 5, D),
              "blip.visual_encoder.norm.weight": w(D),
              "blip.visual_encoder.norm.bias": w(D)}
        for i in range(2):
            b = f"blip.visual_encoder.blocks.{i}."
            sd.update({b + "norm1.weight": w(D), b + "norm1.bias": w(D),
                       b + "norm2.weight": w(D), b + "norm2.bias": w(D),
                       b + "attn.qkv.weight": w(3 * D, D),
                       b + "attn.qkv.bias": w(3 * D),
                       b + "attn.proj.weight": w(D, D),
                       b + "attn.proj.bias": w(D),
                       b + "mlp.fc1.weight": w(64, D),
                       b + "mlp.fc1.bias": w(64),
                       b + "mlp.fc2.weight": w(D, 64),
                       b + "mlp.fc2.bias": w(D)})
        e = "blip.text_encoder.embeddings."
        sd.update({e + "word_embeddings.weight": w(tcfg.vocab_size, Dt),
                   e + "position_embeddings.weight": w(16, Dt),
                   e + "LayerNorm.weight": w(Dt), e + "LayerNorm.bias": w(Dt)})
        for i in range(2):
            b = f"blip.text_encoder.encoder.layer.{i}."
            for a in ("attention.", "crossattention."):
                kv_in = Dt if a == "attention." else tcfg.encoder_width
                sd.update({b + a + "self.query.weight": w(Dt, Dt),
                           b + a + "self.query.bias": w(Dt),
                           b + a + "self.key.weight": w(Dt, kv_in),
                           b + a + "self.key.bias": w(Dt),
                           b + a + "self.value.weight": w(Dt, kv_in),
                           b + a + "self.value.bias": w(Dt),
                           b + a + "output.dense.weight": w(Dt, Dt),
                           b + a + "output.dense.bias": w(Dt),
                           b + a + "output.LayerNorm.weight": w(Dt),
                           b + a + "output.LayerNorm.bias": w(Dt)})
            sd.update({b + "intermediate.dense.weight": w(64, Dt),
                       b + "intermediate.dense.bias": w(64),
                       b + "output.dense.weight": w(Dt, 64),
                       b + "output.dense.bias": w(Dt),
                       b + "output.LayerNorm.weight": w(Dt),
                       b + "output.LayerNorm.bias": w(Dt)})
        for n, i in zip(["fc0", "fc1", "fc2", "fc3", "out"], [0, 2, 4, 6, 7]):
            dims = {"fc0": (1024, Dt), "fc1": (128, 1024), "fc2": (64, 128),
                    "fc3": (16, 64), "out": (1, 16)}[n]
            sd[f"mlp.layers.{i}.weight"] = w(*dims)
            sd[f"mlp.layers.{i}.bias"] = w(dims[0])

        conv = convert.convert_imagereward(sd, text_layers=2, vision_layers=2)
        flat_ref = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_leaves_with_path(params)}
        flat_got = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
                    jax.tree_util.tree_leaves_with_path(conv)}
        # head dims are full-size in the checkpoint; compare tree KEYS exactly
        # and non-head shapes exactly
        assert set(flat_ref) == set(flat_got), \
            set(flat_ref) ^ set(flat_got)
        for k in flat_ref:
            if "'head'" not in k:
                assert flat_ref[k] == flat_got[k], (k, flat_ref[k], flat_got[k])
