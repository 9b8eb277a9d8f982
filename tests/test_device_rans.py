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
