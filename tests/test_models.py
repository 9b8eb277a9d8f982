"""Model-family tests: shape contracts (y at /16, z at /64), forward output
structure, and real-bitstream compress->decompress round-trips (the latter
are absent from the reference suite; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hesic_tpu.models import (Cheng2020Anchor, Cheng2020Attention,
                              FactorizedPrior, FactorizedPriorCodec,
                              JointAutoregressiveCodec,
                              JointAutoregressiveHierarchicalPriors,
                              MeanScaleHyperprior, MeanScaleHyperpriorCodec,
                              ScaleHyperprior, ScaleHyperpriorCodec)

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def _img(shape=(1, 64, 64, 3), seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape), jnp.float32)


class TestForwardContracts:
    @pytest.mark.parametrize("cls,n,m", [
        (FactorizedPrior, 32, 48),
        (ScaleHyperprior, 32, 48),
        (MeanScaleHyperprior, 32, 48),
        (JointAutoregressiveHierarchicalPriors, 32, 48),
    ])
    def test_shapes(self, cls, n, m):
        x = _img()
        model = cls(N=n, M=m)
        out, variables = model.init_with_output(RNGS, x, training=True)
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, m)
        if "z" in out["likelihoods"]:
            assert out["likelihoods"]["z"].shape == (1, 1, 1, n)
        # eval mode needs no noise rng
        out_eval = model.apply(variables, x, training=False)
        assert out_eval["x_hat"].shape == x.shape

    def test_cheng2020_shapes(self):
        x = _img()
        for cls in (Cheng2020Anchor, Cheng2020Attention):
            model = cls(N=32, M=32)
            out, _ = model.init_with_output(RNGS, x, training=True)
            assert out["x_hat"].shape == x.shape
            assert out["likelihoods"]["y"].shape == (1, 4, 4, 32)
            assert out["likelihoods"]["z"].shape == (1, 1, 1, 32)

    def test_aux_loss(self):
        model = FactorizedPrior(N=16, M=24)
        variables = model.init(RNGS, _img(), training=True)
        loss = model.apply(variables, method="aux_loss")
        assert float(loss) > 0


class TestCodecRoundtrips:
    def _codec(self, module_cls, codec_cls, n=32, m=48):
        module = module_cls(N=n, M=m)
        codec = codec_cls.init(module, [(1, 64, 64, 3)])
        codec.update()
        return codec

    def test_factorized_roundtrip(self):
        codec = self._codec(FactorizedPrior, FactorizedPriorCodec)
        x = _img()
        out = codec.compress(x)
        assert out["shape"] == (4, 4)
        rec = codec.decompress(out["strings"], out["shape"])
        assert rec["x_hat"].shape == x.shape
        # deterministic parity: decompress(compress(x)).y == forward eval y
        y = codec.jit("analysis")(x)
        medians = codec.eb_medians("entropy_bottleneck")
        y_hat_expected = np.round(np.asarray(y) - medians) + medians
        y_hat = codec.eb_decompress("entropy_bottleneck", out["strings"][0],
                                    out["shape"])
        np.testing.assert_allclose(np.asarray(y_hat), y_hat_expected,
                                   atol=1e-5)

    def test_scale_hyperprior_roundtrip(self):
        codec = self._codec(ScaleHyperprior, ScaleHyperpriorCodec)
        x = _img()
        out = codec.compress(x)
        assert out["shape"] == (1, 1)
        rec = codec.decompress(out["strings"], out["shape"])
        assert rec["x_hat"].shape == x.shape
        assert np.all(np.asarray(rec["x_hat"]) >= 0)
        assert np.all(np.asarray(rec["x_hat"]) <= 1)

    def test_mean_scale_roundtrip_bit_exact_latents(self):
        codec = self._codec(MeanScaleHyperprior, MeanScaleHyperpriorCodec)
        x = _img(seed=3)
        y = codec.jit("analysis")(x)
        z = codec.jit("hyper_analysis")(y)
        out = codec.compress(x)
        # reproduce decoder side and check y_hat round-trips bit-exactly
        z_hat = codec.eb_decompress("entropy_bottleneck", out["strings"][1],
                                    out["shape"])
        gp = codec.jit("hyper_synthesis")(z_hat)
        scales, means = jnp.split(gp, 2, axis=-1)
        from hesic_tpu.entropy_models import build_indexes
        indexes = build_indexes(scales, codec.scale_table)
        y_hat = codec.gc_decompress("gaussian_conditional", out["strings"][0],
                                    indexes, means=means)
        expected = np.round(np.asarray(y) - np.asarray(means)) \
            + np.asarray(means)
        np.testing.assert_allclose(np.asarray(y_hat), expected, atol=1e-5)

    def test_joint_autoregressive_roundtrip(self):
        codec = self._codec(JointAutoregressiveHierarchicalPriors,
                            JointAutoregressiveCodec, n=32, m=48)
        x = _img(seed=4)
        out = codec.compress(x)
        rec = codec.decompress(out["strings"], out["shape"])
        assert rec["x_hat"].shape == x.shape

    def test_joint_ar_encode_decode_latent_parity(self):
        """The decoded y_hat must equal the encoder's scan y_hat exactly."""
        from hesic_tpu.models.autoregressive import (ar_encode_scan,
                                                     extract_ar_weights)
        codec = self._codec(JointAutoregressiveHierarchicalPriors,
                            JointAutoregressiveCodec, n=16, m=24)
        x = _img(seed=5)
        y = codec.jit("analysis")(x)
        z = codec.jit("hyper_analysis")(y)
        z_strings = codec.eb_compress("entropy_bottleneck", z)
        z_hat = codec.eb_decompress("entropy_bottleneck", z_strings,
                                    z.shape[1:3])
        params = codec.jit("hyper_synthesis")(z_hat)
        w = extract_ar_weights(codec.params)
        _, _, y_hat_enc = ar_encode_scan(
            w, y, params, jnp.zeros(params.shape[:3] + (0,), jnp.float32),
            jnp.asarray(codec.scale_table, jnp.float32))
        out = codec.compress(x)
        from hesic_tpu.models.autoregressive import ar_decompress
        y_hat_dec = ar_decompress(codec, out["strings"][0], params)
        np.testing.assert_allclose(np.asarray(y_hat_dec),
                                   np.asarray(y_hat_enc), atol=1e-4)

    def test_batched_compress(self):
        codec = self._codec(FactorizedPrior, FactorizedPriorCodec, n=16, m=24)
        x = _img(shape=(3, 64, 64, 3))
        out = codec.compress(x)
        assert len(out["strings"][0]) == 3
        rec = codec.decompress(out["strings"], out["shape"])
        assert rec["x_hat"].shape == x.shape

    def test_save_load(self, tmp_path):
        codec = self._codec(FactorizedPrior, FactorizedPriorCodec, n=16, m=24)
        x = _img()
        out = codec.compress(x)
        path = str(tmp_path / "model.pkl")
        codec.save(path)
        codec2 = FactorizedPriorCodec.load(FactorizedPrior(N=16, M=24), path)
        out2 = codec2.compress(x)
        assert out["strings"][0][0] == out2["strings"][0][0]


class TestNativeArCoder:
    def test_native_matches_reference_decoder(self):
        """Native C++ AR decode must match the independent numpy decoder."""
        from hesic_tpu.models.autoregressive import (ar_compress,
                                                     ar_decompress,
                                                     ar_decompress_reference)
        module = JointAutoregressiveHierarchicalPriors(N=16, M=24)
        codec = JointAutoregressiveCodec.init(module, [(1, 64, 64, 3)])
        codec.update()
        x = _img(seed=11)
        y = codec.jit("analysis")(x)
        z = codec.jit("hyper_analysis")(y)
        z_strings = codec.eb_compress("entropy_bottleneck", z)
        z_hat = codec.eb_decompress("entropy_bottleneck", z_strings,
                                    z.shape[1:3])
        params = codec.jit("hyper_synthesis")(z_hat)
        strings, y_hat_enc = ar_compress(codec, y, params)
        y_hat_native = ar_decompress(codec, strings, params)
        y_hat_ref = ar_decompress_reference(codec, strings, params)
        np.testing.assert_array_equal(np.asarray(y_hat_native),
                                      np.asarray(y_hat_enc))
        np.testing.assert_allclose(np.asarray(y_hat_ref),
                                   np.asarray(y_hat_native), atol=1e-4)
