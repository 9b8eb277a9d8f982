"""Entropy model tests mirroring reference tests/test_entropy_models.py,
plus real-bitstream round-trips (absent from the reference suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hesic_tpu.entropy_models import (EntropyBottleneck, GaussianConditional,
                                      GaussianMixtureConditional, CdfTables,
                                      build_indexes, compress_with_indexes,
                                      decompress_with_indexes,
                                      gaussian_tables, get_scale_table,
                                      gmm_pmf, standardized_quantile,
                                      tables_from_pmf)


class TestStandardizedQuantile:
    def test_matches_known_values(self):
        # scipy.stats.norm.ppf golden values
        assert abs(standardized_quantile(0.5) - 0.0) < 1e-9
        assert abs(standardized_quantile(0.975) - 1.959963984540054) < 1e-9
        assert abs(standardized_quantile(5e-10) - (-6.109410204869927)) < 1e-6


class TestGaussianConditional:
    def test_likelihood_golden_value(self):
        """Closed form: lik(0; scale=0.5) = Phi(1) - Phi(-1) = 0.682689."""
        gc = GaussianConditional()
        x = jnp.zeros((1, 1, 1, 1))
        scales = jnp.full((1, 1, 1, 1), 0.5)
        (out, lik), _ = gc.init_with_output(jax.random.PRNGKey(0), x, scales)
        np.testing.assert_allclose(out, x)
        assert abs(float(lik[0, 0, 0, 0]) - 0.6826895) < 1e-4

    def test_mean_shift(self):
        gc = GaussianConditional()
        x = jnp.full((1, 1, 1, 1), 2.0)
        scales = jnp.full((1, 1, 1, 1), 0.5)
        means = jnp.full((1, 1, 1, 1), 2.0)
        (out, lik), _ = gc.init_with_output(jax.random.PRNGKey(0), x, scales,
                                            means)
        assert abs(float(lik[0, 0, 0, 0]) - 0.6826895) < 1e-4

    def test_training_noise(self):
        gc = GaussianConditional()
        x = jnp.zeros((2, 4, 4, 3))
        scales = jnp.ones_like(x)
        params = gc.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, x, scales,
                         training=True)
        out, lik = gc.apply(params, x, scales, training=True,
                            rngs={"noise": jax.random.PRNGKey(2)})
        assert np.all(np.abs(np.asarray(out)) <= 0.5)

    def test_build_indexes(self):
        table = get_scale_table()
        scales = jnp.array([0.05, 0.11, 0.2, 100.0, 300.0])
        idx = np.asarray(build_indexes(scales, table))
        assert idx[0] == 0  # below bound -> first bucket
        assert idx[-1] == len(table) - 1  # above max -> last bucket
        assert np.all(np.diff(idx) >= 0)

    def test_roundtrip_real_coder(self):
        rng = np.random.RandomState(0)
        table = get_scale_table()
        tables = gaussian_tables(table)
        scales = rng.uniform(0.2, 10.0, size=(2, 8, 8, 4)).astype(np.float32)
        indexes = np.asarray(build_indexes(scales, table))
        y = rng.randn(2, 8, 8, 4).astype(np.float32) * scales
        symbols = np.round(y).astype(np.int32)
        strings = compress_with_indexes(symbols, indexes, tables)
        out = decompress_with_indexes(strings, indexes, tables)
        np.testing.assert_array_equal(out, symbols)


class TestEntropyBottleneck:
    def _make(self, c=8):
        eb = EntropyBottleneck(channels=c)
        x = jnp.zeros((2, 8, 8, c))
        params = eb.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, x, training=True)
        return eb, params, x

    def test_forward_shapes_and_eval_quantization(self):
        eb, params, _ = self._make()
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32)
        out, lik = eb.apply(params, x, training=False)
        assert out.shape == x.shape and lik.shape == x.shape
        # eval mode: outputs are x rounded about the medians
        medians = params["params"]["quantiles"][:, 0, 1]
        expected = np.round(np.asarray(x) - medians) + np.asarray(medians)
        np.testing.assert_allclose(out, expected, atol=1e-5)
        assert np.all(np.asarray(lik) > 0)
        assert np.all(np.asarray(lik) <= 1.0 + 1e-6)

    def test_forward_training_noise(self):
        eb, params, _ = self._make()
        x = jnp.zeros((2, 8, 8, 8))
        out, lik = eb.apply(params, x, training=True,
                            rngs={"noise": jax.random.PRNGKey(3)})
        d = np.asarray(out) - np.asarray(x)
        assert np.all(np.abs(d) <= 0.5)
        assert np.std(d) > 0.1

    def test_loss_positive(self):
        eb, params, _ = self._make()
        loss = eb.apply(params, method="loss")
        assert float(loss) > 0

    def test_likelihood_sums_near_one(self):
        """Total PMF mass per channel should be ~1 over a wide grid."""
        eb, params, _ = self._make(c=2)
        grid = jnp.arange(-100, 101, dtype=jnp.float32)
        x = jnp.tile(grid[None, :, None, None], (1, 1, 1, 2))
        _, lik = eb.apply(params, x, training=False)
        total = np.asarray(lik).sum(axis=1)
        np.testing.assert_allclose(total, 1.0, atol=1e-2)

    def test_compress_decompress_roundtrip(self):
        eb, params, _ = self._make(c=4)
        pmf, tail, length, offset = eb.apply(params, method="pmf_data")
        tables = tables_from_pmf(np.asarray(pmf), np.asarray(tail),
                                 np.asarray(length), np.asarray(offset))
        assert isinstance(tables, CdfTables)
        rng = np.random.RandomState(1)
        x = rng.randn(2, 8, 8, 4).astype(np.float32) * 3
        medians = np.asarray(params["params"]["quantiles"][:, 0, 1])
        symbols = np.round(x - medians).astype(np.int32)
        indexes = np.tile(np.arange(4, dtype=np.int32), (2, 8, 8, 1))
        strings = compress_with_indexes(symbols, indexes, tables)
        out = decompress_with_indexes(strings, indexes, tables)
        np.testing.assert_array_equal(out, symbols)


class TestGaussianMixtureConditional:
    def test_reduces_to_single_gaussian(self):
        """K identical components with uniform weights == plain Gaussian."""
        K, M = 3, 4
        gmm = GaussianMixtureConditional(K=K)
        gc = GaussianConditional()
        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, M),
                        jnp.float32)
        scales1 = jnp.full((1, 4, 4, M), 0.7)
        means1 = jnp.zeros((1, 4, 4, M))
        scales = jnp.tile(scales1, (1, 1, 1, K))
        means = jnp.tile(means1, (1, 1, 1, K))
        weights = jnp.full((1, 4, 4, M * K), 1.0 / K)
        (out_g, lik_g), _ = gc.init_with_output(
            jax.random.PRNGKey(0), x, scales1)
        (out_m, lik_m), _ = gmm.init_with_output(
            jax.random.PRNGKey(0), x, scales, means, weights)
        np.testing.assert_allclose(out_m, out_g, atol=1e-6)
        np.testing.assert_allclose(lik_m, lik_g, rtol=1e-5, atol=1e-6)

    def test_quantizes_without_means(self):
        """Reference quirk: GMM forward quantizes with means=None
        (entropy_models.py:695-697)."""
        K, M = 2, 2
        gmm = GaussianMixtureConditional(K=K)
        x = jnp.full((1, 1, 1, M), 1.4)
        scales = jnp.ones((1, 1, 1, M * K))
        means = jnp.full((1, 1, 1, M * K), 5.0)
        weights = jnp.full((1, 1, 1, M * K), 0.5)
        (out, _), _ = gmm.init_with_output(jax.random.PRNGKey(0), x, scales,
                                           means, weights)
        np.testing.assert_allclose(out, 1.0)  # round(1.4), means ignored

    def test_gmm_pmf_matches_likelihood(self):
        """gmm_pmf on a grid equals the module likelihood at those points."""
        K, M = 3, 2
        rng = np.random.RandomState(2)
        scales = jnp.asarray(rng.uniform(0.5, 2, (1, 2, 2, M * K)),
                             jnp.float32)
        means = jnp.asarray(rng.randn(1, 2, 2, M * K) * 2, jnp.float32)
        w = rng.dirichlet(np.ones(K), size=(1, 2, 2, M))
        weights = jnp.asarray(
            np.concatenate([w[..., k] for k in range(K)], axis=-1),
            jnp.float32)
        samples = jnp.arange(-5, 6, dtype=jnp.float32)
        pmf = gmm_pmf(samples, scales, means, weights, K)  # (1,2,2,M,S)
        assert pmf.shape == (1, 2, 2, M, 11)
        gmm = GaussianMixtureConditional(K=K)
        for s_i, s in enumerate([-5.0, 0.0, 3.0]):
            x = jnp.full((1, 2, 2, M), s)
            (_, lik), _ = gmm.init_with_output(
                jax.random.PRNGKey(0), x, scales, means, weights)
            np.testing.assert_allclose(
                pmf[..., int(s) + 5], lik, rtol=1e-4, atol=1e-6)

    def test_pmf_mass_sums_to_one(self):
        K, M = 5, 3
        rng = np.random.RandomState(3)
        scales = jnp.asarray(rng.uniform(0.3, 1.5, (1, 1, 1, M * K)),
                             jnp.float32)
        means = jnp.asarray(rng.randn(1, 1, 1, M * K), jnp.float32)
        w = rng.dirichlet(np.ones(K), size=(1, 1, 1, M))
        weights = jnp.asarray(
            np.concatenate([w[..., k] for k in range(K)], axis=-1),
            jnp.float32)
        samples = jnp.arange(-30, 31, dtype=jnp.float32)
        pmf = gmm_pmf(samples, scales, means, weights, K)
        np.testing.assert_allclose(np.asarray(pmf).sum(-1), 1.0, atol=1e-3)
