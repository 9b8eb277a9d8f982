"""HESIC fast codec: fused on-device programs + on-device entropy coding.

The production path.  One jitted program per direction:

  encode: transforms -> EB z symbols -> GMM params -> per-pixel CDF rows ->
          interleaved rANS encode of y1/y2, all on device.  Only z symbols
          (64 KB) and the compressed word streams leave the chip.
  decode: z_hat -> GMM -> CDF rows -> interleaved rANS decode -> synthesis,
          all on device; reconstructions never leave the chip unless asked.

Rationale: the host link measures ~35 MB/s with ~27 ms round-trip latency
(profiled), so the reference's host-side per-pixel coding architecture
(newnet1.py:916-1183) is transport-bound before it is compute-bound.

Format deviations vs the reference container (all self-consistent,
documented):
  * y symbols are clamped to [-MM, MM] with a fixed MM (module config)
    instead of a per-image data-derived minmax — static shapes mean one
    XLA compilation; trained latents never reach the clamp.
  * y streams use the interleaved-lane rANS with power-of-two totals
    (codecs/device_rans.py) instead of the arbitrary-total range coder.
  * z streams stay on the host rANS coder (tiny payloads, escape coding).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.device_rans import (freq_to_cdf, gather_intervals, pack_stream,
                                  quantize_pmf_device,
                                  rans_decode_interleaved,
                                  rans_encode_interleaved, unpack_stream)
from ..entropy_models import gmm_pmf
from ..geometry import warp_perspective
from ..ops import quantize
from .hesic_codec import HESICCodec

MM_DEFAULT = 32       # symbol grid half-width
LANES_DEFAULT = 1024  # interleaved rANS lanes


def _gmm_cdf_rows_fast(sigma, means, weights, mm: int, k: int):
    """(1, h, w, M*K) GMM params -> (M*h*w, S+1) CDF rows, channel-major."""
    samples = jnp.arange(-mm, mm + 1, dtype=jnp.float32)
    pmf = gmm_pmf(samples, sigma, means, weights, k)  # (1, h, w, M, S)
    freq = quantize_pmf_device(pmf)
    rows = freq_to_cdf(freq)[0]                       # (h, w, M, S+1)
    h, w, m, s1 = rows.shape
    return rows.transpose(2, 0, 1, 3).reshape(m * h * w, s1)


def _flatten_cm(y_hat):
    """(1, h, w, M) -> channel-major flat (M*h*w,)"""
    return y_hat[0].transpose(2, 0, 1).reshape(-1)


def _unflatten_cm(flat, h, w, m):
    return flat.reshape(m, h, w).transpose(1, 2, 0)[None]


def hesic_fast_encode(module, params, x1, x2, h_matrix, mm: int,
                      lanes: int):
    """Full-device HESIC encode.  Returns device arrays:
    (z1_sym, z2_sym, (words1, counts1, states1), (w2, c2, s2))."""
    size = (x1.shape[1], x1.shape[2])

    def apply(method, *args):
        return module.apply({"params": params}, *args, method=method)

    y1 = apply("analysis1", x1)
    z1 = apply("hyper_analysis1", y1)
    med1 = params["entropy_bottleneck1"]["quantiles"][:, 0, 1]
    z1_sym = jnp.round(z1 - med1).astype(jnp.int32)
    z1_hat = z1_sym.astype(jnp.float32) + med1  # == decoder's z1_hat

    gmm1 = apply("gmm1", z1_hat)
    y1_hat = jnp.clip(jnp.round(y1), -mm, mm)
    rows1 = _gmm_cdf_rows_fast(gmm1[0], gmm1[1], gmm1[2], mm, module.K)
    sym1 = _flatten_cm(y1_hat).astype(jnp.int32) + mm
    st1, fr1 = gather_intervals(rows1, sym1)
    stream1 = rans_encode_interleaved(st1.astype(jnp.int32),
                                      fr1.astype(jnp.int32), lanes)

    x1_hat = apply("synthesis1", y1_hat)
    x1_warp = warp_perspective(x1, h_matrix, size)
    y2 = apply("analysis2", x1_warp, x2)
    z2 = apply("hyper_analysis2", y2)
    med2 = params["entropy_bottleneck2"]["quantiles"][:, 0, 1]
    z2_sym = jnp.round(z2 - med2).astype(jnp.int32)
    z2_hat = z2_sym.astype(jnp.float32) + med2

    y1_prior = apply("left_prior", x1_hat, h_matrix)
    gmm2 = apply("gmm2", z2_hat, y1_prior)
    y2_hat = jnp.clip(jnp.round(y2), -mm, mm)
    rows2 = _gmm_cdf_rows_fast(gmm2[0], gmm2[1], gmm2[2], mm, module.K)
    sym2 = _flatten_cm(y2_hat).astype(jnp.int32) + mm
    st2, fr2 = gather_intervals(rows2, sym2)
    stream2 = rans_encode_interleaved(st2.astype(jnp.int32),
                                      fr2.astype(jnp.int32), lanes)

    return z1_sym, z2_sym, stream1, stream2


def hesic_fast_decode(module, params, z1_sym, z2_sym, stream1, stream2,
                      h_matrix, y_shape, mm: int, lanes: int):
    """Full-device HESIC decode.  Returns (x1_hat, x2_hat, y1_hat, y2_hat)."""
    hy, wy = y_shape
    m = module.M
    n = m * hy * wy
    size = (hy * 16, wy * 16)

    def apply(method, *args):
        return module.apply({"params": params}, *args, method=method)

    med1 = params["entropy_bottleneck1"]["quantiles"][:, 0, 1]
    med2 = params["entropy_bottleneck2"]["quantiles"][:, 0, 1]
    z1_hat = z1_sym.astype(jnp.float32) + med1
    z2_hat = z2_sym.astype(jnp.float32) + med2

    gmm1 = apply("gmm1", z1_hat)
    rows1 = _gmm_cdf_rows_fast(gmm1[0], gmm1[1], gmm1[2], mm, module.K)
    sym1 = rans_decode_interleaved(stream1[0], stream1[1], stream1[2],
                                   rows1, n, lanes)
    y1_hat = _unflatten_cm((sym1 - mm).astype(jnp.float32), hy, wy, m)

    x1_hat = apply("synthesis1", y1_hat)
    y1_prior = apply("left_prior", x1_hat, h_matrix)
    gmm2 = apply("gmm2", z2_hat, y1_prior)
    rows2 = _gmm_cdf_rows_fast(gmm2[0], gmm2[1], gmm2[2], mm, module.K)
    sym2 = rans_decode_interleaved(stream2[0], stream2[1], stream2[2],
                                   rows2, n, lanes)
    y2_hat = _unflatten_cm((sym2 - mm).astype(jnp.float32), hy, wy, m)

    x1_hat_warp = warp_perspective(x1_hat, h_matrix, size)
    x2_hat = apply("synthesis2", y2_hat, x1_hat_warp)
    return x1_hat, x2_hat, y1_hat, y2_hat


class HESICFastCodec(HESICCodec):
    """HESIC with the fused on-device codec as the primary path.

    ``compress``/``decompress`` from HESICCodec (reference-layout container)
    remain available; ``compress_fast``/``decompress_fast`` use the
    on-device coder and our own container.
    """

    mm: int = MM_DEFAULT
    lanes: int = LANES_DEFAULT

    def __init__(self, module, params, mm: int = MM_DEFAULT,
                 lanes: int = LANES_DEFAULT):
        super().__init__(module, params)
        self.mm = mm
        self.lanes = lanes
        self._enc_fn = None
        self._dec_fn = None

    def _encode_fn(self):
        if self._enc_fn is None:
            module, mm, lanes = self.module, self.mm, self.lanes

            @jax.jit
            def fn(params, x1, x2, h):
                return hesic_fast_encode(module, params, x1, x2, h, mm,
                                         lanes)

            self._enc_fn = fn
        return self._enc_fn

    def _decode_fn(self, y_shape):
        if self._dec_fn is None:
            module, mm, lanes = self.module, self.mm, self.lanes

            def fn(params, z1_sym, z2_sym, s1, s2, h, y_shape):
                return hesic_fast_decode(module, params, z1_sym, z2_sym,
                                         s1, s2, h, y_shape, mm, lanes)

            self._dec_fn = jax.jit(fn, static_argnums=(6,))
        return lambda *a: self._dec_fn(*a, y_shape)

    # ---- container ----

    def compress_fast(self, x1, x2, h_matrix):
        """Returns dict with 'blob' (bytes) + device tensors for reuse."""
        start = time.time()
        x1 = jnp.asarray(x1, jnp.float32)
        z1_sym, z2_sym, s1, s2 = self._encode_fn()(
            self.params, x1, jnp.asarray(x2, jnp.float32),
            jnp.asarray(h_matrix, jnp.float32))

        # host: EB rANS for z (escape coding kept), pack everything
        z1_np = np.asarray(z1_sym)
        z2_np = np.asarray(z2_sym)
        z1_str = self._eb_encode_symbols("entropy_bottleneck1", z1_np)
        z2_str = self._eb_encode_symbols("entropy_bottleneck2", z2_np)

        header = bytearray()
        header += np.array([x1.shape[1], x1.shape[2]], np.uint16).tobytes()
        for s in (z1_str, z2_str):
            header += np.array([len(s)], np.uint32).tobytes() + s
        header += np.asarray(h_matrix, np.float32).reshape(-1).tobytes()
        body = pack_stream(*[np.asarray(t) for t in s1]) \
            + pack_stream(*[np.asarray(t) for t in s2])
        blob = bytes(header) + body
        num_pixels = 2 * x1.shape[1] * x1.shape[2]
        return {
            "blob": blob,
            "bpp_real": len(blob) * 8 / num_pixels,
            "enctime": time.time() - start,
        }

    def decompress_fast(self, blob: bytes):
        start = time.time()
        off = 0
        x_shape = np.frombuffer(blob, np.uint16, 2, off)
        off += 4
        z_strs = []
        for _ in range(2):
            (length,) = np.frombuffer(blob, np.uint32, 1, off)
            off += 4
            z_strs.append(blob[off:off + int(length)])
            off += int(length)
        h_matrix = jnp.asarray(
            np.frombuffer(blob, np.float32, 9, off).reshape(1, 3, 3))
        off += 36

        h_img, w_img = int(x_shape[0]), int(x_shape[1])
        y_shape = (h_img // 16, w_img // 16)
        z_shape = (y_shape[0] // 4, y_shape[1] // 4)

        z1_np = self._eb_decode_symbols("entropy_bottleneck1", z_strs[0],
                                        z_shape)
        z2_np = self._eb_decode_symbols("entropy_bottleneck2", z_strs[1],
                                        z_shape)

        streams = []
        for _ in range(2):
            w, c, s, off = unpack_stream(blob, off)
            # pad word buffers to a bucket so decode compiles once-ish
            cap = max(64, -(-w.shape[1] // 64) * 64)
            wp = np.zeros((w.shape[0], cap), np.int32)
            wp[:, : w.shape[1]] = w
            streams.append((jnp.asarray(wp), jnp.asarray(c),
                            jnp.asarray(s)))

        x1_hat, x2_hat, y1_hat, y2_hat = self._decode_fn(y_shape)(
            self.params, jnp.asarray(z1_np), jnp.asarray(z2_np),
            streams[0], streams[1], h_matrix)
        return {
            "x1_hat": x1_hat,
            "x2_hat": x2_hat,
            "y1_hat": y1_hat,
            "y2_hat": y2_hat,
            "dectime": time.time() - start,
        }

    # ---- z-path host helpers (symbols already centered) ----

    def _eb_encode_symbols(self, name: str, symbols: np.ndarray) -> bytes:
        from ..entropy_models.codec import compress_with_indexes
        indexes = np.broadcast_to(
            np.arange(symbols.shape[-1], dtype=np.int32), symbols.shape)
        return compress_with_indexes(symbols, indexes,
                                     self.tables[name])[0]

    def _eb_decode_symbols(self, name: str, string: bytes,
                           spatial_shape) -> np.ndarray:
        from ..entropy_models.codec import decompress_with_indexes
        medians = self.eb_medians(name)
        c = medians.shape[0]
        shape = (1, int(spatial_shape[0]), int(spatial_shape[1]), c)
        indexes = np.broadcast_to(np.arange(c, dtype=np.int32), shape)
        return decompress_with_indexes([string], indexes, self.tables[name])
