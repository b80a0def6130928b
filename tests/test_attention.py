"""Pallas flash-attention kernel vs reference math (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from adv_grpo_tpu.ops.attention import attention_reference, mha, mha_bshd

B, H, S, D = 1, 2, 256, 64
KV_LEN = 200


def _qkv():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (B, H, S, D), jnp.float32) for k in ks)


class TestFlashAttention:
    def test_forward_parity_with_mask(self):
        q, k, v = _qkv()
        o_ref = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
        o_pal = mha(q, k, v, kv_len=KV_LEN, block_q=128, block_kv=128,
                    backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref),
                                   atol=5e-3)  # DEFAULT-precision MXU dots

    def test_backward_parity(self):
        q, k, v = _qkv()

        def loss_pal(q, k, v):
            o = mha(q, k, v, kv_len=KV_LEN, block_q=128, block_kv=128,
                    backend="pallas_interpret")
            return jnp.sum(o[:, :, :KV_LEN] ** 2)

        def loss_ref(q, k, v):
            o = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
            return jnp.sum(o[:, :, :KV_LEN] ** 2)

        gp = jax.grad(loss_pal, (0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a[:, :, :KV_LEN]),
                                       np.asarray(b[:, :, :KV_LEN]), atol=2e-2)

    def test_auto_backend_cpu_is_reference(self):
        q, k, v = _qkv()
        o_auto = mha(q, k, v, kv_len=KV_LEN)
        o_ref = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
        np.testing.assert_allclose(np.asarray(o_auto), np.asarray(o_ref))


class TestFlashAttentionBSHD:
    """Transpose-free (B, S, H*D) entry point: parity vs the BHSD reference."""

    def _qkv_bshd(self):
        q, k, v = _qkv()
        to3 = lambda a: a.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        return to3(q), to3(k), to3(v), (q, k, v)

    def test_forward_parity_with_mask(self):
        q3, k3, v3, (q, k, v) = self._qkv_bshd()
        o_ref = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
        o_ref3 = o_ref.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        o_pal = mha_bshd(q3, k3, v3, num_heads=H, kv_len=KV_LEN, block_q=128,
                         block_kv=128, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref3),
                                   atol=5e-3)

    def test_backward_parity(self):
        q3, k3, v3, (q, k, v) = self._qkv_bshd()

        def loss_pal(q3, k3, v3):
            o = mha_bshd(q3, k3, v3, num_heads=H, kv_len=KV_LEN, block_q=128,
                         block_kv=128, backend="pallas_interpret")
            return jnp.sum(o[:, :KV_LEN] ** 2)

        def loss_ref(q, k, v):
            o = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
            return jnp.sum(o[:, :, :KV_LEN] ** 2)

        gp = jax.grad(loss_pal, (0, 1, 2))(q3, k3, v3)
        gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        to3 = lambda a: a.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a[:, :KV_LEN]),
                                       np.asarray(to3(b)[:, :KV_LEN]),
                                       atol=2e-2)

    def test_backward_parity_fused_whole_tile(self):
        # default (None) block sizes at a small shape -> the single-pass
        # fused bwd kernel (dq/dk/dv in one grid cell), incl. the kv mask
        q3, k3, v3, (q, k, v) = self._qkv_bshd()

        def loss_pal(q3, k3, v3):
            o = mha_bshd(q3, k3, v3, num_heads=H, kv_len=KV_LEN,
                         backend="pallas_interpret")
            return jnp.sum(o[:, :KV_LEN] ** 2)

        def loss_ref(q, k, v):
            o = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
            return jnp.sum(o[:, :, :KV_LEN] ** 2)

        gp = jax.grad(loss_pal, (0, 1, 2))(q3, k3, v3)
        gr = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        to3 = lambda a: a.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a[:, :KV_LEN]),
                                       np.asarray(to3(b)[:, :KV_LEN]),
                                       atol=2e-2)

    def test_reference_backend_matches_bhsd(self):
        q3, k3, v3, (q, k, v) = self._qkv_bshd()
        o3 = mha_bshd(q3, k3, v3, num_heads=H, kv_len=KV_LEN,
                      backend="reference")
        o = attention_reference(q, k, v, sm_scale=D**-0.5, kv_len=KV_LEN)
        np.testing.assert_allclose(
            np.asarray(o3),
            np.asarray(o.transpose(0, 2, 1, 3).reshape(B, S, H * D)))


class TestFusedNorms:
    def test_layer_norm_parity_and_grad(self):
        from adv_grpo_tpu.ops.fused_norms import layer_norm

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 192), jnp.float32)
        ref = layer_norm(x, backend="reference")
        pal = layer_norm(x, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

        def loss(f):
            return lambda x: jnp.sum(jnp.sin(layer_norm(x, backend=f)) ** 2)

        gr = jax.grad(loss("reference"))(x)
        gp = jax.grad(loss("pallas_interpret"))(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=2e-4)

    def test_layer_norm_ragged_rows_whole_block(self):
        from adv_grpo_tpu.ops.fused_norms import layer_norm

        x = jax.random.normal(jax.random.PRNGKey(2), (2, 154, 64), jnp.float32)
        ref = layer_norm(x, backend="reference")
        pal = layer_norm(x, backend="pallas_interpret")  # 154 rows: whole-block
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

    def test_layer_norm_oversized_tile_falls_back(self):
        from adv_grpo_tpu.ops.fused_norms import _pick_rows, layer_norm

        # 1288 = 8*161: halving blocks at 644 (not 8-aligned) so the whole
        # 1288-row f32 tile (5.3MB at d=1024) exceeds the ~3MB cap ->
        # _pick_rows signals fallback and layer_norm takes the XLA path
        assert _pick_rows(1288, 1024 * 4) == 0
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 1288, 1024),
                              jnp.float32)
        ref = layer_norm(x, backend="reference")
        pal = layer_norm(x, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

    def test_rms_heads_parity_and_grad(self):
        from adv_grpo_tpu.ops.fused_norms import rms_norm_heads

        Hh, dd = 4, 64  # hpb = 2
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 128, Hh * dd),
                              jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(4), (dd,), jnp.float32) + 1.0
        ref = rms_norm_heads(x, w, num_heads=Hh, backend="reference")
        pal = rms_norm_heads(x, w, num_heads=Hh, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

        def loss(f):
            return lambda x, w: jnp.sum(
                jnp.sin(rms_norm_heads(x, w, num_heads=Hh, backend=f)) ** 2)

        grx, grw = jax.grad(loss("reference"), (0, 1))(x, w)
        gpx, gpw = jax.grad(loss("pallas_interpret"), (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gpx), np.asarray(grx), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gpw), np.asarray(grw), atol=2e-4)

    def test_rms_heads_d128(self):
        from adv_grpo_tpu.ops.fused_norms import rms_norm_heads

        x = jax.random.normal(jax.random.PRNGKey(5), (1, 128, 256), jnp.float32)
        w = jnp.ones((128,))
        ref = rms_norm_heads(x, w, num_heads=2, backend="reference")
        pal = rms_norm_heads(x, w, num_heads=2, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

    def test_rms_across_heads_full_row(self):
        """num_heads=1 with d > 128 (WAN's across-heads qk-norm) runs the
        full-row kernel, not the XLA fallback."""
        from adv_grpo_tpu.ops.fused_norms import rms_norm_heads

        x = jax.random.normal(jax.random.PRNGKey(7), (2, 256, 384), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(8), (384,), jnp.float32) + 1.0
        ref = rms_norm_heads(x, w, num_heads=1, backend="reference")
        pal = rms_norm_heads(x, w, num_heads=1, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

        def loss(f):
            return lambda x, w: jnp.sum(
                jnp.sin(rms_norm_heads(x, w, num_heads=1, backend=f)) ** 2)

        grx, grw = jax.grad(loss("reference"), (0, 1))(x, w)
        gpx, gpw = jax.grad(loss("pallas_interpret"), (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gpx), np.asarray(grx), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gpw), np.asarray(grw), atol=2e-4)

    def test_rms_across_heads_uses_kernel(self):
        """The WAN geometry (num_heads=1, d=1536) must lower to a pallas
        call, not fall back to the XLA reference (misleading-fusion guard)."""
        from adv_grpo_tpu.ops.fused_norms import rms_norm_heads

        x = jnp.ones((1, 128, 1536), jnp.float32)
        w = jnp.ones((1536,))
        txt = jax.make_jaxpr(lambda x, w: rms_norm_heads(
            x, w, num_heads=1, backend="pallas_interpret"))(x, w)
        assert "pallas_call" in str(txt)


class TestModulatedLayerNorm:
    def test_parity_and_grads(self):
        """Fused ln(x)*(1+scale)+shift vs the reference composition, incl.
        grads through x, scale, AND shift (custom VJP closed forms)."""
        from adv_grpo_tpu.ops.fused_norms import modulated_layer_norm

        k = jax.random.PRNGKey(3)
        x = jax.random.normal(k, (2, 256, 128), jnp.float32)
        sc = 0.3 * jax.random.normal(jax.random.fold_in(k, 1), (2, 128))
        sh = 0.3 * jax.random.normal(jax.random.fold_in(k, 2), (2, 128))
        ref = modulated_layer_norm(x, sc, sh, backend="reference")
        pal = modulated_layer_norm(x, sc, sh, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

        def loss(f):
            return lambda x, sc, sh: jnp.sum(
                jnp.sin(modulated_layer_norm(x, sc, sh, backend=f)) ** 2)

        gr = jax.grad(loss("reference"), argnums=(0, 1, 2))(x, sc, sh)
        gp = jax.grad(loss("pallas_interpret"), argnums=(0, 1, 2))(x, sc, sh)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)

    def test_matches_unfused_model_math(self):
        """The exact expression the models previously computed:
        _layer_norm(x) * (1 + scale[:, None]) + shift[:, None]."""
        from adv_grpo_tpu.ops.fused_norms import layer_norm, modulated_layer_norm

        k = jax.random.PRNGKey(5)
        x = jax.random.normal(k, (3, 77, 96), jnp.float32)
        sc = jax.random.normal(jax.random.fold_in(k, 1), (3, 96))
        sh = jax.random.normal(jax.random.fold_in(k, 2), (3, 96))
        unfused = layer_norm(x, backend="reference") * (1 + sc[:, None]) + sh[:, None]
        fused = modulated_layer_norm(x, sc, sh, backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                                   atol=2e-5)

    def test_non_128_dim_falls_back_compiled(self):
        from adv_grpo_tpu.ops.fused_norms import modulated_layer_norm

        x = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 100))
        sc = jnp.zeros((1, 100))
        sh = jnp.ones((1, 100))
        out = modulated_layer_norm(x, sc, sh, backend="pallas")  # d%128 -> XLA
        ref = modulated_layer_norm(x, sc, sh, backend="reference")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
