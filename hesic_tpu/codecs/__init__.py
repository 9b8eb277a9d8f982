"""Native host-side entropy coders (rANS, range coder, CDF quantizer)."""

from .rans import (BufferedRansEncoder, RangeDecoder, RangeEncoder,
                   RansDecoder, RansEncoder, pmf_to_quantized_cdf,
                   pmf_to_quantized_cdf_batch, rans_decode_batch,
                   rans_decode_with_rows, rans_encode_batch,
                   rans_encode_with_rows)

__all__ = [
    "BufferedRansEncoder",
    "RangeDecoder",
    "RangeEncoder",
    "RansDecoder",
    "RansEncoder",
    "pmf_to_quantized_cdf",
    "pmf_to_quantized_cdf_batch",
    "rans_decode_batch",
    "rans_decode_with_rows",
    "rans_encode_batch",
    "rans_encode_with_rows",
]
