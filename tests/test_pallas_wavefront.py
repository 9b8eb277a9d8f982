"""Pallas wavefront level-scan kernel: equivalence + roundtrip tests.

The kernel (models/pallas_wavefront.py) is its own stream backend (A&S
erfc, Mosaic ops) — scan-vs-kernel float outputs agree to f32 drift and
the integer frequency rows to +-1 (erfc last bits), while the
ROUNDTRIP (kernel encode -> rANS -> kernel decode) must be bit-exact:
encoder and decoder run the same program, the hesic_fast invariant.
All tests run the kernel in interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hesic_tpu.codecs.device_rans import rans_encode_grid
from hesic_tpu.models.ar_device import (ar_wavefront, schedule,
                                        wavefront_valid_mask)
from hesic_tpu.models.autoregressive import ArWeights, raster_causal_mask
from hesic_tpu.models.pallas_wavefront import ar_wavefront_pallas


def make_weights(rng, m, p_dim, q_dim):
    k = rng.randn(5, 5, m, 2 * m).astype(np.float32) * 0.1
    mask = np.asarray(raster_causal_mask(5, 5, "A"))
    k = k * mask[:, :, None, None]
    cin = p_dim + 2 * m + q_dim
    h1 = h2 = 2 * m
    return ArWeights(
        ctx_kernel=jnp.asarray(k),
        ctx_bias=jnp.asarray(rng.randn(2 * m).astype(np.float32) * 0.05),
        ep_kernels=(
            jnp.asarray(rng.randn(cin, h1).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(h1, h2).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(h2, 2 * m).astype(np.float32) * 0.1),
        ),
        ep_biases=(
            jnp.asarray(rng.randn(h1).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(h2).astype(np.float32) * 0.05),
            jnp.asarray(np.concatenate(
                [np.full(m, 0.5), np.zeros(m)]).astype(np.float32)),
        ),
    )


def _setup(seed, b, hy, wy, m, mm, groups, q_dim):
    rng = np.random.RandomState(seed)
    p_dim = 2 * m
    w = make_weights(rng, m, p_dim, q_dim)
    y = jnp.asarray(rng.randn(b, hy, wy, m).astype(np.float32) * 2)
    pre = jnp.asarray(rng.randn(b, hy, wy, p_dim).astype(np.float32) * 0.3)
    post = jnp.asarray(rng.randn(b, hy, wy, q_dim).astype(np.float32) * 0.3)
    _, _, _, p_max = schedule(hy, wy)
    lanes = b * p_max * (m // groups)
    zimg = jnp.zeros((b, hy, wy, m), jnp.int32)
    zl = jnp.zeros((lanes,), jnp.int32)
    dummy_w = jnp.zeros((lanes, 1), jnp.int32)
    teach_args = (w, pre, post, y, zimg, zimg, dummy_w, zl,
                  zl.astype(jnp.uint32), jnp.bool_(True), hy, wy, mm,
                  groups)
    return w, pre, post, y, teach_args


CASES = [
    # (b, hy, wy, m, mm, groups, q_dim)
    (1, 4, 4, 16, 3, 2, 0),       # mbt2018-like, no post
    (2, 4, 8, 16, 3, 2, 16),      # HESIC+ eye2-like: post, B=2, wide
    (1, 8, 4, 8, 2, 1, 0),        # single group, tall
]


class TestKernelVsScan:
    @pytest.mark.parametrize("case", CASES)
    def test_teacher_outputs_match_scan(self, case):
        b, hy, wy, m, mm, groups, q_dim = case
        w, pre, post, y, teach_args = _setup(0, *case)
        st_p, fr_p, yh_p, rs_p = ar_wavefront_pallas(*teach_args,
                                                     interpret=True)
        st_s, fr_s, yh_s, rs_s = ar_wavefront(*teach_args)
        # residuals are integers: must be identical (a mismatch means the
        # context/MLP semantics differ, not just erfc bits)
        np.testing.assert_array_equal(np.asarray(rs_p), np.asarray(rs_s))
        assert float(jnp.max(jnp.abs(yh_p - yh_s))) < 1e-5
        valid = np.asarray(wavefront_valid_mask(hy, wy, b, groups, m))
        df = np.abs(np.asarray(fr_p) - np.asarray(fr_s))[valid]
        ds = np.abs(np.asarray(st_p) - np.asarray(st_s))[valid]
        # erfc implementations differ in the last bits only
        assert df.max() <= 2 and ds.max() <= 2


class TestKernelRoundtrip:
    @pytest.mark.parametrize("case", CASES)
    def test_encode_decode_bit_exact(self, case):
        b, hy, wy, m, mm, groups, q_dim = case
        w, pre, post, y, teach_args = _setup(1, *case)
        st, fr, yh_enc, rs = ar_wavefront_pallas(*teach_args,
                                                 interpret=True)
        valid = wavefront_valid_mask(hy, wy, b, groups, m)
        words, counts, states = rans_encode_grid(
            st.astype(jnp.uint32), fr.astype(jnp.uint32), valid)
        rs_np = np.asarray(rs).reshape(-1)
        idx = np.flatnonzero(np.abs(rs_np) > mm)
        cm = np.zeros(rs_np.size, np.int32)
        cv = np.zeros(rs_np.size, np.int32)
        cm[idx] = 1
        cv[idx] = rs_np[idx]
        cm = jnp.asarray(cm.reshape(b, hy, wy, m))
        cv = jnp.asarray(cv.reshape(b, hy, wy, m))
        _, _, yh_dec, _ = ar_wavefront_pallas(
            w, pre, post, jnp.zeros((b, hy, wy, m), jnp.float32), cm, cv,
            words.astype(jnp.int32), counts.astype(jnp.int32),
            states.astype(jnp.uint32), jnp.bool_(False), hy, wy, mm,
            groups, interpret=True)
        np.testing.assert_array_equal(np.asarray(yh_dec),
                                      np.asarray(yh_enc))


class TestKernelRoundtripBf16:
    def test_encode_decode_bit_exact_bf16(self):
        """The TPU operating point (wdtype=bf16, bf16 ring storage):
        encode and decode run the same program, so the roundtrip must be
        bit-exact regardless of matmul/ring dtype."""
        case = (2, 4, 8, 16, 3, 2, 16)
        b, hy, wy, m, mm, groups, q_dim = case
        w, pre, post, y, teach_args = _setup(2, *case)
        st, fr, yh_enc, rs = ar_wavefront_pallas(
            *teach_args, wdtype=jnp.bfloat16, interpret=True)
        valid = wavefront_valid_mask(hy, wy, b, groups, m)
        words, counts, states = rans_encode_grid(
            st.astype(jnp.uint32), fr.astype(jnp.uint32), valid)
        rs_np = np.asarray(rs).reshape(-1)
        idx = np.flatnonzero(np.abs(rs_np) > mm)
        cm = np.zeros(rs_np.size, np.int32)
        cv = np.zeros(rs_np.size, np.int32)
        cm[idx] = 1
        cv[idx] = rs_np[idx]
        cm = jnp.asarray(cm.reshape(b, hy, wy, m))
        cv = jnp.asarray(cv.reshape(b, hy, wy, m))
        _, _, yh_dec, _ = ar_wavefront_pallas(
            w, pre, post, jnp.zeros((b, hy, wy, m), jnp.float32), cm, cv,
            words.astype(jnp.int32), counts.astype(jnp.int32),
            states.astype(jnp.uint32), jnp.bool_(False), hy, wy, mm,
            groups, wdtype=jnp.bfloat16, interpret=True)
        np.testing.assert_array_equal(np.asarray(yh_dec),
                                      np.asarray(yh_enc))


class TestBackendTagging:
    def test_container_backend_mismatch_raises(self):
        from hesic_tpu.models.ar_device import check_wavefront_backend
        # CPU process => scan backend (id 0); a pallas-encoded container
        # must be rejected loudly
        blob = bytes([2]) + b"\0" * 40
        with pytest.raises(ValueError, match="pallas-level-scan"):
            check_wavefront_backend(blob)
        assert check_wavefront_backend(bytes([0]) + b"\0" * 40) == 1
