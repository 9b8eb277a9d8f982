"""Ops tests mirroring reference tests/test_ops.py (closed-form values and
gradient gates)."""

import jax
import jax.numpy as jnp
import numpy as np

from hesic_tpu.ops import (lower_bound, nonneg_apply, nonneg_init, quantize,
                           ste_round)


class TestSTERound:
    def test_values(self):
        x = jnp.array([-1.6, -0.5, -0.4, 0.0, 0.4, 0.5, 1.6])
        np.testing.assert_allclose(ste_round(x),
                                   np.round(np.asarray(x)), atol=0)

    def test_identity_gradient(self):
        g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(
            jnp.array([0.3, -1.7, 2.5]))
        np.testing.assert_allclose(g, [3.0, 3.0, 3.0])


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(lower_bound(x, 0.5), [0.5, 0.5, 2.0])

    def test_gradient_gate(self):
        # grad passes when x >= bound
        x = jnp.array([2.0])
        g = jax.grad(lambda v: jnp.sum(lower_bound(v, 1.0)))(x)
        np.testing.assert_allclose(g, [1.0])
        # grad blocked when x < bound and cotangent positive
        x = jnp.array([0.0])
        g = jax.grad(lambda v: jnp.sum(lower_bound(v, 1.0)))(x)
        np.testing.assert_allclose(g, [0.0])
        # grad passes when x < bound but cotangent negative
        g = jax.grad(lambda v: jnp.sum(-lower_bound(v, 1.0)))(x)
        np.testing.assert_allclose(g, [-1.0])

    def test_jit(self):
        f = jax.jit(lambda v: lower_bound(v, 0.11))
        np.testing.assert_allclose(f(jnp.array([0.05])), [0.11])


class TestNonNegativeParametrizer:
    def test_roundtrip(self):
        x = jnp.array([0.0, 0.1, 1.0, 10.0])
        y = nonneg_apply(nonneg_init(x))
        np.testing.assert_allclose(y, x, atol=1e-6, rtol=1e-5)

    def test_minimum_enforced(self):
        raw = jnp.array([-5.0, 0.0, 1e-12])
        out = nonneg_apply(raw, minimum=1e-6)
        assert np.all(np.asarray(out) >= 1e-6 - 1e-12)


class TestQuantize:
    def test_noise_bounds(self):
        x = jnp.zeros((1000,))
        out = quantize(x, "noise", rng=jax.random.PRNGKey(0))
        assert np.all(np.abs(np.asarray(out)) <= 0.5)
        assert np.std(np.asarray(out)) > 0.1

    def test_dequantize_with_means(self):
        x = jnp.array([1.2, 2.7])
        m = jnp.array([1.0, 3.0])
        np.testing.assert_allclose(quantize(x, "dequantize", means=m),
                                   [1.0, 3.0])

    def test_symbols(self):
        x = jnp.array([1.2, -2.7])
        out = quantize(x, "symbols")
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(out, [1, -3])
