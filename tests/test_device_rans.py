"""On-device interleaved rANS: round-trip and rate tests (CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hesic_tpu.codecs.device_rans import (freq_to_cdf, gather_intervals,
                                          pack_stream,
                                          quantize_pmf_device,
                                          rans_decode_interleaved,
                                          rans_encode_interleaved,
                                          unpack_stream)


def _random_case(seed, n, s):
    rng = np.random.RandomState(seed)
    pmf = rng.dirichlet(np.ones(s) * 0.4, size=n).astype(np.float32)
    freq = np.asarray(quantize_pmf_device(jnp.asarray(pmf)))
    rows = np.asarray(freq_to_cdf(jnp.asarray(freq)))
    symbols = np.array([rng.choice(s, p=pmf[i]) for i in range(n)],
                       np.int32)
    return pmf, freq, rows, symbols


class TestQuantizePmf:
    def test_rows_sum_and_positive(self):
        rng = np.random.RandomState(0)
        pmf = rng.dirichlet(np.ones(33) * 0.2, size=100).astype(np.float32)
        freq = np.asarray(quantize_pmf_device(jnp.asarray(pmf)))
        assert (freq.sum(axis=-1) == 65536).all()
        assert (freq >= 1).all()

    def test_handles_near_delta(self):
        pmf = np.zeros((1, 16), np.float32)
        pmf[0, 3] = 1.0
        freq = np.asarray(quantize_pmf_device(jnp.asarray(pmf)))
        assert freq.sum() == 65536
        assert (freq >= 1).all()
        assert freq[0, 3] > 65000


class TestInterleavedRoundTrip:
    @pytest.mark.parametrize("n,s,lanes", [
        (1000, 17, 64), (4096, 33, 128), (777, 9, 32), (64, 5, 128)])
    def test_roundtrip(self, n, s, lanes):
        _, _, rows, symbols = _random_case(42 + n, n, s)
        starts, freqs = gather_intervals(jnp.asarray(rows),
                                         jnp.asarray(symbols))
        words, counts, states = rans_encode_interleaved(
            starts.astype(jnp.int32), freqs.astype(jnp.int32), lanes)
        out = rans_decode_interleaved(words, counts, states,
                                      jnp.asarray(rows), n, lanes)
        np.testing.assert_array_equal(np.asarray(out), symbols)

    def test_rate_near_entropy(self):
        n, s = 50000, 33
        rng = np.random.RandomState(1)
        pmf1 = rng.dirichlet(np.ones(s) * 0.3).astype(np.float32)
        freq = np.asarray(quantize_pmf_device(jnp.asarray(pmf1[None])))[0]
        rows1 = np.asarray(freq_to_cdf(jnp.asarray(freq)))
        p = freq / 65536
        symbols = rng.choice(s, size=n, p=p).astype(np.int32)
        rows = np.tile(rows1[None], (n, 1))
        starts, freqs = gather_intervals(jnp.asarray(rows),
                                         jnp.asarray(symbols))
        lanes = 128
        words, counts, states = rans_encode_interleaved(
            starts.astype(jnp.int32), freqs.astype(jnp.int32), lanes)
        total_bytes = int(np.asarray(counts).sum()) * 2 + lanes * 4
        entropy_bits = -np.sum(np.log2(p[symbols]))
        assert total_bytes * 8 < entropy_bits * 1.02 + lanes * 40

    def test_pack_unpack(self):
        _, _, rows, symbols = _random_case(7, 500, 17)
        starts, freqs = gather_intervals(jnp.asarray(rows),
                                         jnp.asarray(symbols))
        words, counts, states = rans_encode_interleaved(
            starts.astype(jnp.int32), freqs.astype(jnp.int32), 64)
        blob = pack_stream(words, counts, states)
        w2, c2, s2, off = unpack_stream(blob)
        assert off == len(blob)
        out = rans_decode_interleaved(jnp.asarray(w2), jnp.asarray(c2),
                                      jnp.asarray(s2), jnp.asarray(rows),
                                      500, 64)
        np.testing.assert_array_equal(np.asarray(out), symbols)

    def test_two_streams_concatenated(self):
        _, _, rows_a, sym_a = _random_case(3, 300, 9)
        _, _, rows_b, sym_b = _random_case(4, 450, 17)
        blobs = []
        for rows, sym in ((rows_a, sym_a), (rows_b, sym_b)):
            st, fr = gather_intervals(jnp.asarray(rows), jnp.asarray(sym))
            w, c, s = rans_encode_interleaved(
                st.astype(jnp.int32), fr.astype(jnp.int32), 32)
            blobs.append(pack_stream(w, c, s))
        blob = blobs[0] + blobs[1]
        w, c, s, off = unpack_stream(blob, 0)
        out_a = rans_decode_interleaved(jnp.asarray(w), jnp.asarray(c),
                                        jnp.asarray(s),
                                        jnp.asarray(rows_a), 300, 32)
        w, c, s, off = unpack_stream(blob, off)
        out_b = rans_decode_interleaved(jnp.asarray(w), jnp.asarray(c),
                                        jnp.asarray(s),
                                        jnp.asarray(rows_b), 450, 32)
        np.testing.assert_array_equal(np.asarray(out_a), sym_a)
        np.testing.assert_array_equal(np.asarray(out_b), sym_b)


class TestPallasKernelEquivalence:
    """The Mosaic kernels must produce bit-identical streams/symbols to
    the lax.scan coder (they implement the same integer algorithm).
    Runs in Pallas interpret mode so it works on the CPU test backend."""

    def _grid_case(self, seed, b, m, s, hw):
        rng = np.random.RandomState(seed)
        pmf = rng.dirichlet(np.ones(s) * 0.4,
                            size=b * m * hw).astype(np.float32)
        freq = np.asarray(quantize_pmf_device(jnp.asarray(pmf)))
        freq = freq.reshape(b, m, hw, s).transpose(0, 1, 3, 2)
        sym = rng.randint(0, s, size=(b, m, hw)).astype(np.int32)
        return jnp.asarray(freq), jnp.asarray(sym)

    def test_encode_matches_scan(self):
        from hesic_tpu.codecs.device_rans import rans_encode_grid
        from hesic_tpu.codecs.pallas_rans import rans_encode_grid_pallas
        b, m, s, hw = 2, 8, 9, 16
        freq, sym = self._grid_case(0, b, m, s, hw)
        words_p, counts_p, states = rans_encode_grid_pallas(
            freq, sym.transpose(1, 0, 2), interpret=True)

        iota = jnp.arange(s, dtype=jnp.int32).reshape(1, 1, s, 1)
        sym4 = sym.reshape(b, m, 1, hw)
        start = jnp.sum(freq * (iota < sym4), axis=2)
        frs = jnp.sum(freq * (iota == sym4), axis=2)
        s_grid = start.transpose(1, 0, 2).reshape(m, b * hw)
        f_grid = frs.transpose(1, 0, 2).reshape(m, b * hw)
        valid = jnp.ones((m, b * hw), bool)
        buf_x, counts_x, states_x = rans_encode_grid(
            s_grid.astype(jnp.uint32), f_grid.astype(jnp.uint32), valid)

        cap = buf_x.shape[1]
        assert words_p.shape == (b, cap, hw)
        assert np.array_equal(np.asarray(counts_p).reshape(-1),
                              np.asarray(counts_x))
        assert np.array_equal(np.asarray(states).reshape(-1),
                              np.asarray(states_x))
        flat_p = np.asarray(words_p).transpose(0, 2, 1).reshape(
            b * hw, cap)
        # compare only valid word slots (kernel zero-fills, scan dumps)
        mask = np.arange(cap) < np.asarray(counts_x)[:, None]
        assert np.array_equal(flat_p[mask], np.asarray(buf_x)[mask])

    def test_decode_roundtrip(self):
        from hesic_tpu.codecs.pallas_rans import (rans_decode_grid_pallas,
                                                  rans_encode_grid_pallas)
        b, m, s, hw = 2, 8, 9, 16
        freq, sym = self._grid_case(7, b, m, s, hw)
        words, counts, states = rans_encode_grid_pallas(
            freq, sym.transpose(1, 0, 2), interpret=True)
        dec = rans_decode_grid_pallas(
            freq, words, counts, states, interpret=True)
        assert np.array_equal(np.asarray(dec.transpose(1, 0, 2)),
                              np.asarray(sym))


class TestPallasPmfKernel:
    """The fused PMF kernel must produce VALID frequency rows (sum 2^16,
    bins >= 1) whose distribution closely tracks the XLA pipeline (erfc
    differs in the last bits — only self-consistency is required)."""

    def _heads(self, seed, b=2, h=4, w=8, m=8, k=3):
        rng = np.random.RandomState(seed)
        sigma = rng.rand(b, h, w, m * k).astype(np.float32) * 2 + 0.05
        means = rng.randn(b, h, w, m * k).astype(np.float32) * 5
        weights = rng.rand(b, 1, 1, m * k).astype(np.float32)
        # normalize over K like softmax_over_mixture would
        wr = weights.reshape(b, 1, 1, k, m)
        wr = wr / wr.sum(axis=3, keepdims=True)
        return (jnp.asarray(sigma), jnp.asarray(means),
                jnp.asarray(wr.reshape(b, 1, 1, k * m)), m, k)

    def test_rows_valid_and_close_to_xla(self):
        import os
        from hesic_tpu.codecs.pallas_pmf import gmm_freq_pallas
        os.environ["HESIC_NO_PALLAS"] = "1"
        try:
            from hesic_tpu.models.hesic_fast import _gmm_freq_fast
            sigma, means, weights, m, k = self._heads(0)
            mm = 6
            freq_p, cen_p = gmm_freq_pallas(sigma, means, weights, mm, k,
                                            interpret=True)
            freq_x, cen_x = _gmm_freq_fast(sigma, means, weights, mm, k)
        finally:
            del os.environ["HESIC_NO_PALLAS"]
        fp, fx = np.asarray(freq_p), np.asarray(freq_x)
        assert fp.shape == fx.shape
        assert (fp.sum(axis=2) == 65536).all()
        assert (fp >= 1).all()
        assert np.array_equal(np.asarray(cen_p), np.asarray(cen_x))
        # distributions agree to ~erfc-approximation accuracy
        assert np.abs(fp - fx).max() <= 64
        assert np.abs(fp - fx).mean() < 2.0


class TestPallasPplEquivalence:
    """ppl > 1 (several positions per rANS lane) must produce streams
    bit-identical to the scan coder under the (m*ppl + j, b*ls + λ)
    slot/lane mapping, and roundtrip exactly."""

    def _case(self, seed, b, m, s, hw):
        rng = np.random.RandomState(seed)
        pmf = rng.dirichlet(np.ones(s) * 0.4,
                            size=b * m * hw).astype(np.float32)
        freq = np.asarray(quantize_pmf_device(jnp.asarray(pmf)))
        freq = freq.reshape(b, m, hw, s).transpose(0, 1, 3, 2)
        sym = rng.randint(0, s, size=(b, m, hw)).astype(np.int32)
        return jnp.asarray(freq), jnp.asarray(sym)

    @pytest.mark.parametrize("ppl", [2, 4])
    def test_encode_matches_scan_mapping(self, ppl):
        from hesic_tpu.codecs.device_rans import rans_encode_grid
        from hesic_tpu.codecs.pallas_rans import rans_encode_grid_pallas
        b, m, s, hw = 2, 6, 9, 16
        ls = hw // ppl
        freq, sym = self._case(1, b, m, s, hw)
        words_p, counts_p, states_p = rans_encode_grid_pallas(
            freq, sym.transpose(1, 0, 2), ppl=ppl, cap=m * ppl + 2,
            interpret=True)

        iota = jnp.arange(s, dtype=jnp.int32).reshape(1, 1, s, 1)
        sym4 = sym.reshape(b, m, 1, hw)
        start = jnp.sum(freq * (iota < sym4), axis=2)
        frs = jnp.sum(freq * (iota == sym4), axis=2)

        def grid_layout(t):
            t = t.reshape(b, m, ppl, ls).transpose(1, 2, 0, 3)
            return t.reshape(m * ppl, b * ls)

        valid = jnp.ones((m * ppl, b * ls), bool)
        buf_x, counts_x, states_x = rans_encode_grid(
            grid_layout(start).astype(jnp.uint32),
            grid_layout(frs).astype(jnp.uint32), valid)
        assert np.array_equal(np.asarray(counts_p).reshape(-1),
                              np.asarray(counts_x))
        assert np.array_equal(np.asarray(states_p).reshape(-1),
                              np.asarray(states_x))
        cap_x = buf_x.shape[1]
        flat_p = np.asarray(words_p)[:, :cap_x, :].transpose(
            0, 2, 1).reshape(b * ls, cap_x)
        mask = np.arange(cap_x) < np.asarray(counts_x)[:, None]
        assert np.array_equal(flat_p[mask], np.asarray(buf_x)[mask])

    @pytest.mark.parametrize("ppl", [2, 4])
    def test_roundtrip(self, ppl):
        from hesic_tpu.codecs.pallas_rans import (rans_decode_grid_pallas,
                                                  rans_encode_grid_pallas)
        b, m, s, hw = 2, 6, 9, 16
        freq, sym = self._case(2, b, m, s, hw)
        words, counts, states = rans_encode_grid_pallas(
            freq, sym.transpose(1, 0, 2), ppl=ppl, cap=m * ppl + 2,
            interpret=True)
        dec = rans_decode_grid_pallas(
            freq, words, counts, states, ppl=ppl, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(dec.transpose(1, 0, 2)), np.asarray(sym))


class TestPallasPairsEncoder:
    def test_matches_scan_on_slot_stream(self):
        """The Mosaic pairs encoder (wavefront slot stream) must be
        bit-identical to rans_encode_grid, including invalid-lane
        skipping and lane padding to a multiple of 8."""
        from hesic_tpu.codecs.device_rans import (rans_encode_grid,
                                                  rans_decode_grid)
        from hesic_tpu.codecs.pallas_rans import rans_encode_pairs_pallas
        rng = np.random.RandomState(4)
        t_dim, l_dim, s = 40, 21, 9   # 21 lanes: exercises the pad path
        pmf = rng.dirichlet(np.ones(s) * 0.5,
                            size=t_dim * l_dim).astype(np.float32)
        freq = np.asarray(quantize_pmf_device(jnp.asarray(pmf)))
        freq = freq.reshape(t_dim, l_dim, s)
        sym = rng.randint(0, s, size=(t_dim, l_dim))
        starts = np.take_along_axis(np.concatenate(
            [np.zeros((t_dim, l_dim, 1), np.int64),
             np.cumsum(freq, axis=-1)], -1), sym[..., None], -1)[..., 0]
        frs = np.take_along_axis(freq, sym[..., None], -1)[..., 0]
        valid = rng.rand(t_dim, l_dim) > 0.2

        w_x, c_x, s_x = rans_encode_grid(
            jnp.asarray(starts, jnp.uint32), jnp.asarray(frs, jnp.uint32),
            jnp.asarray(valid))
        w_p, c_p, s_p = rans_encode_pairs_pallas(
            jnp.asarray(starts, jnp.uint32), jnp.asarray(frs, jnp.uint32),
            jnp.asarray(valid), cap=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_x))
        np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))
        cap_x = w_x.shape[1]
        mask = np.arange(cap_x) < np.asarray(c_x)[:, None]
        np.testing.assert_array_equal(
            np.asarray(w_p)[:, :cap_x][mask], np.asarray(w_x)[mask])


class TestDenseStream:
    """Device-side compaction (compact_stream/expand_stream) and the
    dense container framing must be byte-identical to the padded
    pack_stream path it replaces."""

    def _case(self, seed, lanes, cap):
        rng = np.random.RandomState(seed)
        counts = rng.randint(0, cap + 1, size=lanes).astype(np.int64)
        words = np.zeros((lanes, cap), np.int32)
        for i, c in enumerate(counts):
            words[i, :c] = rng.randint(0, 1 << 16, size=int(c))
        states = rng.randint(0, 1 << 31, size=lanes).astype(np.uint32)
        return words, counts, states

    @pytest.mark.parametrize("lanes,cap", [(64, 37), (128, 256), (3, 1)])
    def test_bytes_match_padded_path(self, lanes, cap):
        from hesic_tpu.codecs.device_rans import (compact_stream,
                                                  pack_stream_dense,
                                                  pow2_bucket)
        words, counts, states = self._case(11 + lanes, lanes, cap)
        bucket = pow2_bucket(int(counts.sum()))
        flat = np.asarray(compact_stream(
            jnp.asarray(words), jnp.asarray(counts.astype(np.int32)),
            bucket))
        blob = pack_stream_dense(flat, counts, states)
        assert blob == pack_stream(words, counts, states)

    @pytest.mark.parametrize("lanes,cap", [(64, 37), (128, 256)])
    def test_expand_inverts_compact(self, lanes, cap):
        from hesic_tpu.codecs.device_rans import (compact_stream,
                                                  expand_stream,
                                                  pow2_bucket,
                                                  unpack_stream_dense,
                                                  pack_stream_dense)
        words, counts, states = self._case(5 + cap, lanes, cap)
        bucket = pow2_bucket(int(counts.sum()))
        flat = np.asarray(compact_stream(
            jnp.asarray(words), jnp.asarray(counts.astype(np.int32)),
            bucket))
        blob = pack_stream_dense(flat, counts, states)
        f2, c2, s2, off = unpack_stream_dense(blob)
        assert off == len(blob)
        np.testing.assert_array_equal(c2, counts)
        np.testing.assert_array_equal(s2, states)
        fp = np.zeros(pow2_bucket(f2.size), np.uint16)
        fp[:f2.size] = f2
        back = np.asarray(expand_stream(
            jnp.asarray(fp), jnp.asarray(c2.astype(np.int32)), cap))
        mask = np.arange(cap) < counts[:, None]
        np.testing.assert_array_equal(back[mask], words[mask])
        assert (back[~mask] == 0).all()

    def test_zero_counts_lane(self):
        from hesic_tpu.codecs.device_rans import (compact_stream,
                                                  pack_stream_dense,
                                                  pow2_bucket)
        words = np.zeros((4, 8), np.int32)
        counts = np.zeros(4, np.int64)
        states = np.arange(4, dtype=np.uint32)
        flat = np.asarray(compact_stream(
            jnp.asarray(words), jnp.asarray(counts.astype(np.int32)),
            pow2_bucket(1)))
        blob = pack_stream_dense(flat, counts, states)
        assert blob == pack_stream(words, counts, states)
