"""Round-trip and golden tests for the native entropy-coding runtime.

The reference test suite has no bitstream round-trip test (SURVEY.md §4);
these tests make encode→decode→bit-exact-symbols the north-star contract.
"""

import numpy as np
import pytest

from hesic_tpu.codecs import (BufferedRansEncoder, RangeDecoder, RangeEncoder,
                              RansDecoder, RansEncoder, pmf_to_quantized_cdf,
                              pmf_to_quantized_cdf_batch,
                              rans_decode_with_rows, rans_encode_with_rows)


def _make_gaussian_cdf(scale, length, precision=16):
    x = np.arange(length) - length // 2
    pmf = np.exp(-0.5 * (x / scale) ** 2)
    pmf = pmf / pmf.sum() * (1 - 1e-4)
    tail = np.array([1e-4], dtype=np.float32)
    return pmf_to_quantized_cdf(np.concatenate([pmf, tail]), precision)


class TestPmfToQuantizedCdf:
    def test_basic_properties(self):
        rng = np.random.RandomState(0)
        for _ in range(20):
            n = rng.randint(2, 64)
            pmf = rng.dirichlet(np.ones(n)).astype(np.float32)
            cdf = pmf_to_quantized_cdf(pmf, 16)
            assert cdf[0] == 0
            assert cdf[-1] == 1 << 16
            assert np.all(np.diff(cdf) > 0), "no zero-width symbols"

    def test_tiny_probabilities_get_nonzero_bins(self):
        pmf = np.array([0.999999, 1e-12, 1e-12], dtype=np.float32)
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert np.all(np.diff(cdf) >= 1)
        assert cdf[-1] == 1 << 16

    def test_matches_numpy_reference(self):
        # independent numpy re-implementation of the integer algorithm
        def ref(pmf, precision=16):
            one = 1 << precision
            freq = np.concatenate(
                [[0], np.round(np.asarray(pmf, np.float64) * one)]
            ).astype(np.uint64)
            total = freq.sum()
            c = (one * freq) // total
            c = np.cumsum(c).astype(np.int64)
            c[-1] = one
            c = list(c)
            n = len(c) - 1
            for i in range(n):
                if c[i] == c[i + 1]:
                    best, best_f = -1, 1 << 60
                    for j in range(n):
                        f = c[j + 1] - c[j]
                        if 1 < f < best_f:
                            best, best_f = j, f
                    assert best >= 0
                    if best < i:
                        for j in range(best + 1, i + 1):
                            c[j] -= 1
                    else:
                        for j in range(i + 1, best + 1):
                            c[j] += 1
            return np.array(c, dtype=np.int32)

        rng = np.random.RandomState(7)
        for _ in range(10):
            n = rng.randint(3, 40)
            pmf = rng.dirichlet(np.ones(n) * 0.3).astype(np.float32)
            np.testing.assert_array_equal(pmf_to_quantized_cdf(pmf), ref(pmf))

    def test_batch_matches_single(self):
        rng = np.random.RandomState(1)
        num, max_len = 6, 20
        pmfs = np.zeros((num, max_len), dtype=np.float32)
        lengths = rng.randint(3, max_len + 1, size=num).astype(np.int32)
        tails = rng.uniform(1e-9, 1e-3, size=num).astype(np.float32)
        for i in range(num):
            pmfs[i, : lengths[i]] = rng.dirichlet(np.ones(lengths[i]))
        table = pmf_to_quantized_cdf_batch(pmfs, lengths, tails)
        assert table.shape == (num, max_len + 2)
        for i in range(num):
            row = np.concatenate([pmfs[i, : lengths[i]], [tails[i]]])
            single = pmf_to_quantized_cdf(row)
            np.testing.assert_array_equal(table[i, : lengths[i] + 2], single)


class TestRansRoundTrip:
    def _random_setup(self, seed, n_symbols=5000, n_cdfs=8):
        rng = np.random.RandomState(seed)
        cdfs, sizes, offsets = [], [], []
        for _ in range(n_cdfs):
            length = rng.randint(4, 32)
            scale = rng.uniform(0.3, 8.0)
            cdf = _make_gaussian_cdf(scale, length)
            cdfs.append(cdf)
            sizes.append(len(cdf))
            offsets.append(-(length // 2))
        indexes = rng.randint(0, n_cdfs, size=n_symbols)
        symbols = np.empty(n_symbols, dtype=np.int32)
        for i in range(n_symbols):
            k = indexes[i]
            lo = offsets[k]
            hi = offsets[k] + sizes[k] - 2
            symbols[i] = rng.randint(lo - 3, hi + 4)  # some out-of-range
        return symbols, indexes, cdfs, sizes, offsets

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_encode_decode_bit_exact(self, seed):
        symbols, indexes, cdfs, sizes, offsets = self._random_setup(seed)
        enc = RansEncoder()
        stream = enc.encode_with_indexes(symbols, indexes, cdfs, sizes,
                                         offsets)
        assert len(stream) % 4 == 0 and len(stream) >= 8
        dec = RansDecoder()
        out = dec.decode_with_indexes(stream, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_buffered_encoder_matches_oneshot(self):
        symbols, indexes, cdfs, sizes, offsets = self._random_setup(3, 1000)
        one = RansEncoder().encode_with_indexes(symbols, indexes, cdfs,
                                                sizes, offsets)
        buf = BufferedRansEncoder()
        for lo in range(0, 1000, 100):
            buf.encode_with_indexes(symbols[lo:lo + 100],
                                    indexes[lo:lo + 100], cdfs, sizes,
                                    offsets)
        assert buf.flush() == one

    def test_stateful_stream_decode(self):
        symbols, indexes, cdfs, sizes, offsets = self._random_setup(4, 600)
        stream = RansEncoder().encode_with_indexes(symbols, indexes, cdfs,
                                                   sizes, offsets)
        dec = RansDecoder()
        dec.set_stream(stream)
        outs = []
        for lo in range(0, 600, 150):
            outs.append(dec.decode_stream(indexes[lo:lo + 150], cdfs, sizes,
                                          offsets))
        np.testing.assert_array_equal(np.concatenate(outs), symbols)

    def test_extreme_values_bypass(self):
        cdf = _make_gaussian_cdf(1.0, 5)
        cdfs, sizes, offsets = [cdf], [len(cdf)], [-2]
        symbols = np.array([-100000, 100000, 0, -2, 2, 65535, -65536],
                           dtype=np.int32)
        indexes = np.zeros_like(symbols)
        stream = RansEncoder().encode_with_indexes(symbols, indexes, cdfs,
                                                   sizes, offsets)
        out = RansDecoder().decode_with_indexes(stream, indexes, cdfs, sizes,
                                                offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_compression_is_near_entropy(self):
        rng = np.random.RandomState(5)
        length, scale = 33, 2.0
        cdf = _make_gaussian_cdf(scale, length)
        p = np.diff(cdf) / float(1 << 16)
        n = 50000
        raw = rng.choice(length, size=n, p=p[:-1] / p[:-1].sum())
        symbols = (raw - length // 2).astype(np.int32)
        indexes = np.zeros(n, dtype=np.int32)
        stream = RansEncoder().encode_with_indexes(
            symbols, indexes, [cdf], [len(cdf)], [-(length // 2)])
        entropy_bits = -np.sum(p[:-1] * np.log2(p[:-1])) * n
        assert len(stream) * 8 < entropy_bits * 1.02 + 64


class TestRansRows:
    def test_per_symbol_rows_roundtrip(self):
        rng = np.random.RandomState(6)
        n, row_len = 4000, 17
        pmf = rng.dirichlet(np.ones(row_len - 1) * 0.5, size=n)
        rows = np.zeros((n, row_len), dtype=np.int64)
        for i in range(n):
            rows[i] = pmf_to_quantized_cdf(pmf[i].astype(np.float32))
        symbols = np.array(
            [rng.choice(row_len - 1, p=pmf[i]) for i in range(n)],
            dtype=np.int32)
        stream = rans_encode_with_rows(symbols, rows)
        out = rans_decode_with_rows(stream, n, rows)
        np.testing.assert_array_equal(out, symbols)


class TestRangeCoder:
    def test_roundtrip_arbitrary_totals(self):
        rng = np.random.RandomState(8)
        # reference-style per-pixel cdfs: clip/round to ~65536 totals that
        # are NOT exactly a power of two (newnet1.py:975-978)
        n = 3000
        enc = RangeEncoder()
        cdfs, symbols = [], []
        for _ in range(n):
            length = rng.randint(3, 40)
            pmf = rng.dirichlet(np.ones(length))
            pmf_clip = np.clip(pmf, 1.0 / 65536, 1.0)
            pmf_clip = np.round(pmf_clip / pmf_clip.sum() * 65536)
            cdf = [0] + list(np.cumsum(pmf_clip).astype(int))
            sym = rng.randint(0, length)
            enc.encode([sym], cdf)
            cdfs.append(cdf)
            symbols.append(sym)
        blob = enc.close()
        dec = RangeDecoder(blob)
        for cdf, sym in zip(cdfs, symbols):
            assert dec.decode(1, cdf)[0] == sym

    def test_file_backed(self, tmp_path):
        path = str(tmp_path / "stream.bin")
        cdf = [0, 10, 100, 65536]
        enc = RangeEncoder(path)
        enc.encode([2, 0, 1, 2, 2], cdf)
        enc.close()
        dec = RangeDecoder(path)
        np.testing.assert_array_equal(dec.decode(5, cdf), [2, 0, 1, 2, 2])

    def test_encode_rows_matches_loop(self):
        rng = np.random.RandomState(9)
        n, row_len = 500, 9
        rows = np.zeros((n, row_len), dtype=np.int64)
        symbols = rng.randint(0, row_len - 1, size=n).astype(np.int32)
        for i in range(n):
            pmf = rng.dirichlet(np.ones(row_len - 1))
            pmf = np.round(np.clip(pmf, 1 / 65536, 1) * 65536)
            rows[i] = np.concatenate([[0], np.cumsum(pmf)])
        enc_a = RangeEncoder()
        enc_a.encode_rows(symbols, rows)
        blob_a = enc_a.close()
        enc_b = RangeEncoder()
        for i in range(n):
            enc_b.encode([symbols[i]], rows[i])
        assert blob_a == enc_b.close()
        dec = RangeDecoder(blob_a)
        np.testing.assert_array_equal(dec.decode_rows(rows), symbols)


class TestReferenceStreamFixtures:
    """Cross-implementation bitstream compatibility (VERDICT r2 missing #3).

    tests/fixtures/ref_rans_streams.npz holds streams produced by the
    REFERENCE pybind11 extension (compiled unmodified from
    compressai/cpp_exts/rans/rans_interface.cpp + ryg_rans/rans64.h; see
    the generator recipe in the fixture's docstring commit).  Our coder
    must (a) decode those bytes to the original symbols and (b) produce
    byte-identical streams for the same inputs — proving the CompressAI
    framing claim in codecs/csrc/rans.cpp (16-bit precision, reverse
    flush, u32 words, 4-bit bypass chunks) against the real thing.
    """

    CASES = ("small", "bypass", "wide", "tiny")

    @pytest.fixture(scope="class")
    def fixtures(self):
        import os
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "ref_rans_streams.npz")
        return np.load(path)

    def _case(self, fixtures, name):
        g = lambda k: fixtures[f"{name}__{k}"]  # noqa: E731
        return (g("symbols"), g("indexes"), g("cdfs"), g("cdf_sizes"),
                g("offsets"), g("stream").tobytes())

    @pytest.mark.parametrize("name", CASES)
    def test_decode_reference_stream(self, fixtures, name):
        symbols, indexes, cdfs, sizes, offsets, stream = \
            self._case(fixtures, name)
        out = RansDecoder().decode_with_indexes(stream, indexes, cdfs,
                                                sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    @pytest.mark.parametrize("name", CASES)
    def test_encode_matches_reference_bytes(self, fixtures, name):
        symbols, indexes, cdfs, sizes, offsets, stream = \
            self._case(fixtures, name)
        ours = RansEncoder().encode_with_indexes(symbols, indexes, cdfs,
                                                 sizes, offsets)
        assert ours == stream

    def test_stream_decode_reference_stream_chunked(self, fixtures):
        """set_stream/decode_stream walks a reference stream statefully
        (the autoregressive decode pattern, rans_interface.cpp:277-350)."""
        symbols, indexes, cdfs, sizes, offsets, stream = \
            self._case(fixtures, "wide")
        dec = RansDecoder()
        dec.set_stream(stream)
        out = []
        for lo in range(0, len(symbols), 97):
            out.append(dec.decode_stream(indexes[lo:lo + 97], cdfs, sizes,
                                         offsets))
        np.testing.assert_array_equal(np.concatenate(out), symbols)


class TestRansBatch:
    """Batched multi-stream API: one native call over n independent
    streams must emit byte-identical streams to n per-stream calls and
    decode them from arbitrary byte extents inside one buffer."""

    def _setup(self, seed=0, n_streams=6, n_per=700, n_cdfs=8):
        rng = np.random.RandomState(seed)
        cdfs, sizes, offsets = [], [], []
        for _ in range(n_cdfs):
            length = rng.randint(4, 32)
            cdf = _make_gaussian_cdf(rng.uniform(0.3, 8.0), length)
            cdfs.append(cdf)
            sizes.append(len(cdf))
            offsets.append(-(length // 2))
        indexes = rng.randint(0, n_cdfs, size=n_per).astype(np.int32)
        lo = np.array([offsets[k] for k in indexes])
        hi = np.array([offsets[k] + sizes[k] - 2 for k in indexes])
        symbols = rng.randint(lo - 2, hi + 3).astype(np.int32)
        symbols = np.stack([np.roll(symbols, s) for s in range(n_streams)])
        return symbols, indexes, cdfs, sizes, offsets

    def test_batch_encode_matches_per_stream(self):
        from hesic_tpu.codecs import rans_encode_batch
        symbols, indexes, cdfs, sizes, offsets = self._setup()
        streams = rans_encode_batch(symbols, indexes, cdfs, sizes, offsets)
        enc = RansEncoder()
        for s in range(symbols.shape[0]):
            ref = enc.encode_with_indexes(symbols[s], indexes, cdfs,
                                          sizes, offsets)
            assert streams[s] == ref

    def test_batch_decode_from_blob_extents(self):
        from hesic_tpu.codecs import rans_decode_batch, rans_encode_batch
        symbols, indexes, cdfs, sizes, offsets = self._setup(seed=4)
        streams = rans_encode_batch(symbols, indexes, cdfs, sizes, offsets)
        # interleave with junk sections, as in a real container blob
        blob, begins, ends = bytearray(b"hdr"), [], []
        for s in streams:
            begins.append(len(blob))
            blob += s
            ends.append(len(blob))
            blob += b"\xAA" * 7
        out = rans_decode_batch(bytes(blob), begins, ends, indexes,
                                indexes.size, cdfs, sizes, offsets)
        np.testing.assert_array_equal(out, symbols)

    def test_codec_helpers_use_batch_path(self):
        from hesic_tpu.entropy_models.codec import (
            CdfTables, compress_with_indexes, decompress_with_indexes)
        symbols, indexes, cdfs, sizes, offsets = self._setup(seed=5)
        stride = max(sizes)
        table = np.zeros((len(cdfs), stride), np.int32)
        for i, c in enumerate(cdfs):
            table[i, : len(c)] = c
        tables = CdfTables(table, np.asarray(sizes, np.int32),
                           np.asarray(offsets, np.int32))
        idx_b = np.broadcast_to(indexes, symbols.shape)   # stride-0 rows
        strings = compress_with_indexes(symbols, idx_b, tables)
        # per-stream reference bytes
        enc = RansEncoder()
        for s in range(symbols.shape[0]):
            assert strings[s] == enc.encode_with_indexes(
                symbols[s], indexes, cdfs, sizes, offsets)
        out = decompress_with_indexes(strings, idx_b, tables)
        np.testing.assert_array_equal(out, symbols)
