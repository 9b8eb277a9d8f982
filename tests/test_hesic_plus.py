"""HESIC+ model + container codec tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hesic_tpu.models import HESICPlus, HESICPlusCodec, HESICPlusTogether

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def _pair(hw=64, seed=0):
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
    h = jnp.eye(3)[None] + jnp.asarray(rng.randn(1, 3, 3) * 1e-3,
                                       jnp.float32)
    h = h.at[:, 2, 2].set(1.0)
    return x1, x2, h


class TestHESICPlusForward:
    def test_shapes_and_streams(self):
        x1, x2, h = _pair()
        model = HESICPlus(N=16, M=24)
        out, variables = model.init_with_output(RNGS, x1, x2, h,
                                                training=True)
        assert out["x1_hat"].shape == x1.shape
        assert out["x2_hat"].shape == x2.shape
        assert set(out["likelihoods"]) == {"y1", "y2", "z1", "z2"}
        assert out["likelihoods"]["y1"].shape == (1, 4, 4, 24)
        out_eval = model.apply(variables, x1, x2, h, training=False)
        assert out_eval["x1_hat"].shape == x1.shape
        aux = model.apply(variables, method="aux_loss")
        assert float(aux) > 0

    def test_together(self):
        x1, x2, h = _pair()
        model = HESICPlusTogether(N=16, M=24)
        out, _ = model.init_with_output(RNGS, x1, x2, h, training=True)
        assert out["x1_hat"].shape == x1.shape


class TestHESICPlusContainer:
    def test_roundtrip(self, tmp_path):
        x1, x2, h = _pair(seed=2)
        module = HESICPlus(N=16, M=24)
        codec = HESICPlusCodec.init(module, [x1.shape, x2.shape, h.shape])
        codec.update()
        out = codec.compress(x1, x2, h, "pair0", str(tmp_path))
        assert out["bpp_real"] > 0
        rec = codec.decompress("pair0", str(tmp_path))
        assert rec["x1_hat"].shape == x1.shape
        assert rec["x2_hat"].shape == x2.shape
        # decoded latents must be finite and quantized about means
        assert np.all(np.isfinite(np.asarray(rec["y1_hat"])))
        assert np.all(np.isfinite(np.asarray(rec["y2_hat"])))

    def test_left_latent_parity(self, tmp_path):
        """Decoder's y1_hat equals the encoder-side scan y1_hat exactly."""
        from hesic_tpu.models.autoregressive import (ar_encode_scan,
                                                     extract_ar_weights)
        x1, x2, h = _pair(seed=3)
        module = HESICPlus(N=16, M=24)
        codec = HESICPlusCodec.init(module, [x1.shape, x2.shape, h.shape])
        codec.update()
        out = codec.compress(x1, x2, h, "pair1", str(tmp_path))
        y1 = codec.jit("analysis1")(x1)
        z1 = codec.jit("hyper_analysis1")(y1)
        z1_strings = codec.eb_compress("entropy_bottleneck1", z1)
        z1_hat = codec.eb_decompress("entropy_bottleneck1", z1_strings,
                                     z1.shape[1:3])
        params1 = codec.jit("hyper_synthesis1")(z1_hat)
        w1 = extract_ar_weights(codec.params, "context_prediction1",
                                "entropy_parameters1")
        _, _, y1_hat_enc = ar_encode_scan(
            w1, y1, params1,
            jnp.zeros(params1.shape[:3] + (0,), jnp.float32),
            jnp.asarray(codec.scale_table, jnp.float32))
        rec = codec.decompress("pair1", str(tmp_path))
        np.testing.assert_allclose(np.asarray(rec["y1_hat"]),
                                   np.asarray(y1_hat_enc), atol=1e-4)
