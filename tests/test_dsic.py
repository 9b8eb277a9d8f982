"""DSIC model + container codec tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hesic_tpu.models import DSIC, DSICCodec, DSICPlus, dense_warp

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def _pair(hw=64, seed=0):
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
    return x1, x2


class TestDenseWarp:
    def test_identity_when_cost_at_zero_shift(self):
        h1 = jnp.asarray(np.random.RandomState(0).rand(1, 4, 8, 2),
                         jnp.float32)
        cost = jnp.zeros((1, 4, 8, 5)).at[..., 0].set(1.0)
        out = dense_warp(h1, cost)
        np.testing.assert_allclose(out, h1, atol=1e-6)

    def test_pure_shift(self):
        h1 = jnp.asarray(np.random.RandomState(1).rand(1, 2, 8, 1),
                         jnp.float32)
        cost = jnp.zeros((1, 2, 8, 5)).at[..., 3].set(1.0)
        out = dense_warp(h1, cost)
        # out[w] = h1[w+3] for w < W-3, else 0
        np.testing.assert_allclose(out[0, :, :5, 0], h1[0, :, 3:, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(out[0, :, 5:, 0], 0.0, atol=1e-6)

    def test_blocks_feature_gradient(self):
        h1 = jnp.ones((1, 2, 4, 1))
        cost = jnp.full((1, 2, 4, 2), 0.5)
        g = jax.grad(lambda h: float(jnp.sum(dense_warp(h, cost))) * 0
                     + jnp.sum(dense_warp(h, cost)))(h1)
        np.testing.assert_allclose(g, 0.0, atol=1e-6)
        g_cost = jax.grad(lambda c: jnp.sum(dense_warp(h1, c)))(cost)
        assert np.any(np.asarray(g_cost) != 0)


class TestDSICForward:
    def test_shapes_and_streams(self):
        x1, x2 = _pair()
        model = DSIC(N=16, M=24, F=6, C=4, K=2)
        out, variables = model.init_with_output(RNGS, x1, x2, training=True)
        assert out["x1_hat"].shape == x1.shape
        assert out["x2_hat"].shape == x2.shape
        assert set(out["likelihoods"]) == {"y1", "y2", "z1", "z2"}
        assert out["likelihoods"]["y1"].shape == (1, 4, 4, 24)
        out_eval = model.apply(variables, x1, x2, training=False)
        assert out_eval["x2_hat"].shape == x2.shape

    def test_dsic_plus(self):
        x1, x2 = _pair()
        model = DSICPlus(N=16, M=24, F=6, C=4, K=2)
        out, _ = model.init_with_output(RNGS, x1, x2, training=True)
        assert out["x1_hat"].shape == x1.shape
        assert out["x2_hat"].shape == x2.shape

    def test_conv3d_chunked_band_matches_ndhwc(self, monkeypatch):
        """HESIC_FOLD3D_CHUNKS splits the banded conv's outputs over
        disparity chunks; every chunking must equal the NDHWC conv."""
        from hesic_tpu.models.dsic import Conv3D
        rng = np.random.RandomState(1)
        B, C, F0 = 2, 8, 6
        x5 = jnp.asarray(rng.randn(B, C, 16, 16, F0), jnp.float32)
        m5 = Conv3D(F0)
        p5 = m5.init(jax.random.PRNGKey(0), x5)["params"]
        ref = np.asarray(m5.apply({"params": p5}, x5))
        ref = ref.transpose(0, 2, 3, 1, 4).reshape(B, 16, 16, C * F0)
        xf = jnp.asarray(np.asarray(x5).transpose(0, 2, 3, 1, 4)
                         .reshape(B, 16, 16, C * F0))
        for chunks in ("1", "2", "4"):
            monkeypatch.setenv("HESIC_FOLD3D_CHUNKS", chunks)
            out = np.asarray(Conv3D(F0, folds=C).apply({"params": p5},
                                                       xf))
            np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_folded_3d_branch_matches_unfolded(self, monkeypatch):
        """The bf16 disparity-folded cost-volume branch (banded Conv3D +
        folded GroupNorm, dsic.py) must agree with the reference NDHWC
        layout, sharing one param tree."""
        x1, x2 = _pair()
        m32 = DSIC(N=8, M=12, F=6, C=8, K=2)
        mbf = DSIC(N=8, M=12, F=6, C=8, K=2, dtype=jnp.bfloat16)
        params = m32.init(RNGS, x1, x2)["params"]
        # same tree under both dtypes (folded path declares the same
        # Conv3D/GroupNorm parameters)
        tree_bf = jax.tree_util.tree_structure(
            mbf.init(RNGS, x1, x2)["params"])
        assert tree_bf == jax.tree_util.tree_structure(params)

        f32 = np.asarray(m32.apply({"params": params}, x1, x2)["x2_hat"],
                         np.float32)
        monkeypatch.setenv("HESIC_NO_FOLD3D", "1")
        ref = mbf.apply({"params": params}, x1, x2)
        monkeypatch.delenv("HESIC_NO_FOLD3D")
        out = mbf.apply({"params": params}, x1, x2)
        # identical element sets, reordered summation: the only error
        # source is bf16 rounding (amplified through the disparity
        # softmax), so the folded path must sit within the unfolded
        # bf16 path's own deviation from the f32 reference
        a = np.asarray(out["x2_hat"], np.float32)
        b = np.asarray(ref["x2_hat"], np.float32)
        err_fold = np.mean(np.abs(a - f32))
        err_nofold = np.mean(np.abs(b - f32))
        assert err_fold < 2.0 * err_nofold + 1e-4, (err_fold, err_nofold)


class TestDSICContainer:
    def test_roundtrip(self, tmp_path):
        x1, x2 = _pair(seed=2)
        module = DSIC(N=16, M=24, F=6, C=4, K=2)
        codec = DSICCodec.init(module, [x1.shape, x2.shape])
        codec.update()
        out = codec.compress(x1, x2, "pair0", str(tmp_path))
        assert out["bpp_real"] > 0
        rec = codec.decompress("pair0", str(tmp_path))
        np.testing.assert_array_equal(np.asarray(rec["y1_hat"]),
                                      np.asarray(out["y1_hat"]))
        np.testing.assert_array_equal(np.asarray(rec["y2_hat"]),
                                      np.asarray(out["y2_hat"]))
        assert rec["x1_hat"].shape == x1.shape
        assert rec["x2_hat"].shape == x2.shape


class TestDSICFastCodec:
    def test_fast_roundtrip_matches_latents(self):
        import numpy as np
        from hesic_tpu.models import DSIC, DSICFastCodec
        rng = np.random.RandomState(3)
        hw, b = 64, 2
        x1 = jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32)
        x2 = jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32)
        module = DSIC(N=16, M=24, F=6, C=4, K=2)
        codec = DSICFastCodec.init(module, [(1, hw, hw, 3), (1, hw, hw, 3)])
        codec = DSICFastCodec(codec.module, codec.params, mm=8,
                              codec_batch=b)
        codec.update()
        out = codec.compress_fast(x1, x2, batch_container=True)
        rec = codec.decompress_fast_batch(out["blob"])
        enc = codec._fn("transforms_enc")(
            codec.params, x1, x2,
            jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1)))
        np.testing.assert_array_equal(
            np.asarray(rec["y1_hat"]).astype(np.int64), np.asarray(enc[0]))
        np.testing.assert_array_equal(
            np.asarray(rec["y2_hat"]).astype(np.int64), np.asarray(enc[1]))
        assert 0 < out["bpp_real"] < 40
        # per-pair container too
        out2 = codec.compress_fast(x1, x2)
        rec2 = codec.decompress_fast(out2["blobs"])
        np.testing.assert_array_equal(
            np.asarray(rec2["y2_hat"]), np.asarray(rec["y2_hat"]))

    def test_escape_corrections_roundtrip(self):
        """mm=1 forces out-of-grid residuals through the escape
        side-channel on both eyes; decode must restore the TRUE latents
        (mirrors the HESIC+ device-codec escape test)."""
        from hesic_tpu.models import DSIC, DSICFastCodec
        rng = np.random.RandomState(7)
        hw, b = 64, 2
        x1 = jnp.asarray(rng.rand(b, hw, hw, 3) * 4 - 1.5, jnp.float32)
        x2 = jnp.asarray(rng.rand(b, hw, hw, 3) * 4 - 1.5, jnp.float32)
        module = DSIC(N=16, M=24, F=6, C=4, K=2)
        base = DSICFastCodec.init(module,
                                  [(1, hw, hw, 3), (1, hw, hw, 3)])
        codec = DSICFastCodec(base.module, base.params, mm=1,
                              codec_batch=b)
        codec.update()
        out = codec.compress_fast(x1, x2, batch_container=True)
        enc = codec._fn("transforms_enc")(
            codec.params, x1, x2,
            jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1)))
        y1, y2 = np.asarray(enc[0]), np.asarray(enc[1])
        dc1 = np.asarray(enc[5])
        rel1 = np.abs(y1 - dc1[:, None, None, :])
        assert (rel1 > 1).any(), "test setup: no eye-1 escapes triggered"
        rec = codec.decompress_fast_batch(out["blob"])
        np.testing.assert_array_equal(
            np.asarray(rec["y1_hat"]).astype(np.int64), y1)
        np.testing.assert_array_equal(
            np.asarray(rec["y2_hat"]).astype(np.int64), y2)

    def test_device_flops_counts_every_program(self):
        """MFU accounting (bench.py): every codec program must
        contribute — a silent except once zeroed cond/stream FLOPs."""
        from hesic_tpu.models import DSICFastCodec
        model = DSIC(N=16, M=24, F=6, C=8, K=2)
        codec = DSICFastCodec.init(
            model, [(1, 64, 64, 3), (1, 64, 64, 3)])
        codec = DSICFastCodec(codec.module, codec.params, mm=8,
                              codec_batch=2)
        codec.update()
        fl = codec.device_flops(64, 64)
        for name in ("transforms_enc", "cond1", "cond2",
                     "encode_stream", "decode_stream", "synth_out"):
            assert fl["per_program"][name] > 0, name
        assert fl["flops_per_pair"] > fl["per_program"]["synth_out"] / 2

    def test_reference_container_still_works(self, tmp_path):
        import numpy as np
        from hesic_tpu.models import DSIC, DSICFastCodec
        rng = np.random.RandomState(4)
        hw = 64
        x1 = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
        x2 = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
        module = DSIC(N=16, M=24, F=6, C=4, K=2)
        codec = DSICFastCodec.init(module, [(1, hw, hw, 3), (1, hw, hw, 3)])
        codec.update()
        out = codec.compress(x1, x2, "t", str(tmp_path))
        rec = codec.decompress("t", str(tmp_path))
        np.testing.assert_array_equal(np.asarray(rec["y1_hat"]),
                                      np.asarray(out["y1_hat"]))
