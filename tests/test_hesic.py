"""HESIC model + container codec tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hesic_tpu.models import (HESIC, HESICCodec, HESICTogether,
                              IndependentEnhancement)

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def _pair(hw=64, seed=0):
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32)
    h = jnp.eye(3)[None] + jnp.asarray(rng.randn(1, 3, 3) * 1e-3,
                                       jnp.float32)
    h = h.at[:, 2, 2].set(1.0)
    return x1, x2, h


class TestHESICForward:
    def test_shapes_and_streams(self):
        x1, x2, h = _pair()
        model = HESIC(N=16, M=24, K=2)
        out, variables = model.init_with_output(RNGS, x1, x2, h,
                                                training=True)
        assert out["x1_hat"].shape == x1.shape
        assert out["x2_hat"].shape == x2.shape
        assert set(out["likelihoods"]) == {"y1", "y2", "z1", "z2"}
        assert out["likelihoods"]["y1"].shape == (1, 4, 4, 24)
        assert out["likelihoods"]["z1"].shape == (1, 1, 1, 16)
        # eval forward (no rng needed)
        out_eval = model.apply(variables, x1, x2, h, training=False)
        assert out_eval["x1_hat"].shape == x1.shape
        # eval y_hat is plain rounding (GMM quantizes without means)
        aux = model.apply(variables, method="aux_loss")
        assert float(aux) > 0

    def test_together_forward(self):
        x1, x2, h = _pair()
        model = HESICTogether(N=16, M=24, K=2)
        out, _ = model.init_with_output(RNGS, x1, x2, h, training=True)
        assert out["x1_hat"].shape == x1.shape
        assert out["x2_hat"].shape == x2.shape
        assert set(out["likelihoods"]) == {"y1", "y2", "z1", "z2"}

    def test_enhancement_shapes(self):
        x1, x2, h = _pair(hw=32)
        model = IndependentEnhancement()
        out, _ = model.init_with_output(jax.random.PRNGKey(0), x1, x2, h)
        assert out["x1_hat"].shape == x1.shape
        assert out["x2_hat"].shape == x2.shape


class TestHESICContainer:
    def test_roundtrip(self, tmp_path):
        x1, x2, h = _pair()
        module = HESIC(N=16, M=24, K=2)
        codec = HESICCodec.init(module, [x1.shape, x2.shape, h.shape])
        codec.update()
        out = codec.compress(x1, x2, h, "pair0", str(tmp_path))
        assert out["bpp_real"] > 0
        assert (tmp_path / "pair0.npz").exists()
        assert (tmp_path / "pair0.bin").exists()
        rec = codec.decompress("pair0", str(tmp_path))
        # bit-exact latent round-trip is the contract
        np.testing.assert_array_equal(np.asarray(rec["y1_hat"]),
                                      np.asarray(out["y1_hat"]))
        np.testing.assert_array_equal(np.asarray(rec["y2_hat"]),
                                      np.asarray(out["y2_hat"]))
        np.testing.assert_allclose(np.asarray(rec["z1_hat"]),
                                   np.asarray(out["z1_hat"]), atol=1e-6)
        assert rec["x1_hat"].shape == x1.shape
        assert rec["x2_hat"].shape == x2.shape

    def test_decoder_is_self_contained(self, tmp_path):
        """H travels in the header; no side channel needed."""
        x1, x2, h = _pair(seed=1)
        module = HESIC(N=16, M=24, K=2)
        codec = HESICCodec.init(module, [x1.shape, x2.shape, h.shape])
        codec.update()
        out = codec.compress(x1, x2, h, "pair1", str(tmp_path))
        rec = codec.decompress("pair1", str(tmp_path))  # no h passed
        np.testing.assert_array_equal(np.asarray(rec["y2_hat"]),
                                      np.asarray(out["y2_hat"]))

    def test_bpp_matches_estimate(self, tmp_path):
        """Real bpp should be close to the likelihood-estimated bpp."""
        x1, x2, h = _pair(seed=2)
        module = HESIC(N=16, M=24, K=2)
        codec = HESICCodec.init(module, [x1.shape, x2.shape, h.shape])
        codec.update()
        out_f = codec.forward(x1, x2, h, training=False)
        num_pixels = 2 * x1.shape[1] * x1.shape[2]
        est_bpp = sum(
            float(jnp.sum(-jnp.log2(lik)))
            for lik in out_f["likelihoods"].values()) / num_pixels
        out = codec.compress(x1, x2, h, "pair2", str(tmp_path))
        # untrained models are wildly inefficient; just sanity-band it
        assert out["bpp_real"] < est_bpp * 2 + 2.0
        assert out["bpp_real"] > est_bpp * 0.3
