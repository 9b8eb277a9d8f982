"""Host-side coder state: quantized CDF tables + (de)compress helpers.

In the reference these live as dynamically-resized torch buffers inside the
entropy-model modules (entropy_models.py:81-83) and are (re)built by
``update()``.  Here the traced Flax modules stay pure; the integer tables are
plain numpy state owned by the model wrapper (models/base.py) and built
through the exact C++ integer quantizer so bitstreams are reproducible.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import codecs
from .entropy_models import gaussian_pmf_data


@dataclasses.dataclass
class CdfTables:
    """Quantized CDF table set for one entropy model."""

    quantized_cdf: np.ndarray  # (num_cdfs, max_len + 2) int32
    cdf_length: np.ndarray     # (num_cdfs,) int32
    offset: np.ndarray         # (num_cdfs,) int32

    @property
    def num_cdfs(self) -> int:
        return self.quantized_cdf.shape[0]

    def state_dict(self) -> dict:
        return {"quantized_cdf": self.quantized_cdf,
                "cdf_length": self.cdf_length, "offset": self.offset}

    @classmethod
    def from_state_dict(cls, d: dict) -> "CdfTables":
        return cls(np.asarray(d["quantized_cdf"], np.int32),
                   np.asarray(d["cdf_length"], np.int32),
                   np.asarray(d["offset"], np.int32))


def tables_from_pmf(pmf, tail_mass, pmf_length, offset,
                    precision: int = 16) -> CdfTables:
    """Quantize a padded PMF table into integer CDFs (one native call)."""
    pmf = np.asarray(pmf, np.float32)
    pmf_length = np.asarray(pmf_length, np.int32)
    cdf = codecs.pmf_to_quantized_cdf_batch(
        pmf, pmf_length, np.asarray(tail_mass, np.float32), precision)
    return CdfTables(cdf, pmf_length + 2, np.asarray(offset, np.int32))


def gaussian_tables(scale_table, tail_mass: float = 1e-9) -> CdfTables:
    """Tables for GaussianConditional over a scale table.

    Reference: entropy_models.py:504-526.
    """
    pmf, tail, pmf_length, offset = gaussian_pmf_data(scale_table, tail_mass)
    return tables_from_pmf(pmf, tail, pmf_length, offset)


def compress_with_indexes(symbols: np.ndarray, indexes: np.ndarray,
                          tables: CdfTables) -> list[bytes]:
    """Encode a batched symbol tensor; one string per leading-dim item.

    symbols/indexes: (B, ...) int arrays of identical shape.
    Reference flow: entropy_models.py:165-196, minus the .tolist() storm.
    """
    symbols = np.asarray(symbols)
    indexes = np.asarray(indexes)
    if symbols.shape != indexes.shape:
        raise ValueError("`symbols` and `indexes` must have the same shape")
    b = symbols.shape[0]
    if b > 1 and indexes.strides[0] == 0:
        # every batch item shares one index pattern (the broadcast-array
        # common case): ONE native call encodes all b streams, removing
        # the per-stream Python dispatch loop from the hot path
        return codecs.rans_encode_batch(
            symbols.reshape(b, -1), indexes[0].reshape(-1),
            tables.quantized_cdf, tables.cdf_length, tables.offset)
    enc = codecs.RansEncoder()
    return [
        enc.encode_with_indexes(symbols[i].reshape(-1),
                                indexes[i].reshape(-1),
                                tables.quantized_cdf, tables.cdf_length,
                                tables.offset)
        for i in range(symbols.shape[0])
    ]


def decompress_with_indexes(strings: list[bytes], indexes: np.ndarray,
                            tables: CdfTables) -> np.ndarray:
    """Decode strings back to the symbol tensor shaped like `indexes`."""
    indexes = np.asarray(indexes)
    if len(strings) != indexes.shape[0]:
        raise ValueError("one string per batch item expected")
    b = indexes.shape[0]
    if b > 1 and indexes.strides[0] == 0:
        data = b"".join(strings)
        ends = np.cumsum([len(s) for s in strings], dtype=np.int64)
        begins = np.concatenate([[0], ends[:-1]])
        return decode_streams_batch(
            data, begins, ends, indexes[0].reshape(-1), tables
        ).reshape(indexes.shape)
    dec = codecs.RansDecoder()
    out = np.empty(indexes.shape, np.int32)
    for i, s in enumerate(strings):
        out[i] = dec.decode_with_indexes(
            s, indexes[i].reshape(-1), tables.quantized_cdf,
            tables.cdf_length, tables.offset).reshape(indexes[i].shape)
    return out


def decode_streams_batch(data: bytes, begins, ends, indexes_1d,
                         tables: CdfTables) -> np.ndarray:
    """Decode n independent streams at [begins[i], ends[i]) inside `data`
    (e.g. a whole container blob) in ONE native call; each stream yields
    `indexes_1d.size` symbols.  Returns (n, n_per) int32."""
    indexes_1d = np.asarray(indexes_1d).reshape(-1)
    return codecs.rans_decode_batch(
        data, begins, ends, indexes_1d, indexes_1d.size,
        tables.quantized_cdf, tables.cdf_length, tables.offset)
