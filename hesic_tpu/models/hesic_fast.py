"""HESIC fast codec: fused on-device programs + on-device entropy coding.

The production path.  One jitted program per direction, batch-native:

  encode: transforms -> EB z symbols -> GMM params -> per-pixel CDF rows ->
          interleaved rANS encode of y1/y2, all on device, for B pairs at
          once.  Only z symbols and the compressed u16 word streams leave
          the chip (words fetched as a sliced transfer covering just the
          used capacity).
  decode: z_hat -> GMM -> CDF rows -> interleaved rANS decode -> synthesis,
          all on device for B pairs; reconstructions never leave the chip
          unless asked.

Rationale: the host link measures ~35 MB/s with ~27 ms round-trip latency
(profiled), so the reference's host-side per-pixel coding architecture
(newnet1.py:916-1183) is transport-bound before it is compute-bound.
Batching amortizes dispatch latency; on-device coding removes the CDF
table traffic entirely.

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

from ..codecs.device_rans import (freq_to_cdf, intervals_from_freq,
                                  pack_stream, quantize_pmf_device,
                                  rans_decode_interleaved,
                                  rans_encode_interleaved, unpack_stream)
from ..entropy_models import gmm_pmf
from ..geometry import warp_perspective
from .hesic_codec import HESICCodec

MM_DEFAULT = 32       # symbol grid half-width
LANES_DEFAULT = 1024  # interleaved rANS lanes


def _gmm_freq_fast(sigma, means, weights, mm: int, k: int):
    """(B, h, w, M*K) GMM params -> (B, M*h*w, S) quantized frequency
    rows, channel-major per item."""
    samples = jnp.arange(-mm, mm + 1, dtype=jnp.float32)
    pmf = gmm_pmf(samples, sigma, means, weights, k)  # (B, h, w, M, S)
    freq = quantize_pmf_device(pmf)
    b, h, w, m, s = freq.shape
    return freq.transpose(0, 3, 1, 2, 4).reshape(b, m * h * w, s)


def _gmm_cdf_rows_fast(sigma, means, weights, mm: int, k: int):
    """(B, h, w, M*K) GMM params -> (B, M*h*w, S+1) CDF rows."""
    return freq_to_cdf(_gmm_freq_fast(sigma, means, weights, mm, k))


def _flatten_cm(y_hat):
    """(B, h, w, M) -> channel-major flat (B, M*h*w)."""
    b, h, w, m = y_hat.shape
    return y_hat.transpose(0, 3, 1, 2).reshape(b, -1)


def _unflatten_cm(flat, h, w, m):
    b = flat.shape[0]
    return flat.reshape(b, m, h, w).transpose(0, 2, 3, 1)


def _encode_stream(freq, y_flat, mm: int, lanes: int):
    """vmapped per-item interleave encode from frequency rows.
    Returns (words u16, counts, states) with leading batch dim."""
    sym = y_flat.astype(jnp.int32) + mm
    starts, frs = intervals_from_freq(freq, sym)

    def one(st_i, fr_i):
        return rans_encode_interleaved(st_i, fr_i, lanes)

    words, counts, states = jax.vmap(one)(starts, frs)
    return words.astype(jnp.uint16), counts.astype(jnp.int32), states


def _decode_stream(rows, words, counts, states, n: int, lanes: int):
    def one(rows_i, w_i, c_i, s_i):
        return rans_decode_interleaved(w_i.astype(jnp.int32), c_i, s_i,
                                       rows_i, n, lanes)

    return jax.vmap(one)(rows, words, counts, states)


def hesic_fast_encode(module, params, x1, x2, h_matrix, mm: int,
                      lanes: int):
    """Full-device HESIC encode for a batch of pairs."""
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
    freq1 = _gmm_freq_fast(gmm1[0], gmm1[1], gmm1[2], mm, module.K)
    stream1 = _encode_stream(freq1, _flatten_cm(y1_hat), mm, lanes)

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
    freq2 = _gmm_freq_fast(gmm2[0], gmm2[1], gmm2[2], mm, module.K)
    stream2 = _encode_stream(freq2, _flatten_cm(y2_hat), mm, lanes)

    return z1_sym, z2_sym, stream1, stream2


def hesic_fast_decode(module, params, z1_sym, z2_sym, stream1, stream2,
                      h_matrix, y_shape, mm: int, lanes: int):
    """Full-device HESIC decode for a batch of pairs."""
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
    sym1 = _decode_stream(rows1, stream1[0], stream1[1], stream1[2], n,
                          lanes)
    y1_hat = _unflatten_cm((sym1 - mm).astype(jnp.float32), hy, wy, m)

    x1_hat = apply("synthesis1", y1_hat)
    y1_prior = apply("left_prior", x1_hat, h_matrix)
    gmm2 = apply("gmm2", z2_hat, y1_prior)
    rows2 = _gmm_cdf_rows_fast(gmm2[0], gmm2[1], gmm2[2], mm, module.K)
    sym2 = _decode_stream(rows2, stream2[0], stream2[1], stream2[2], n,
                          lanes)
    y2_hat = _unflatten_cm((sym2 - mm).astype(jnp.float32), hy, wy, m)

    x1_hat_warp = warp_perspective(x1_hat, h_matrix, size)
    x2_hat = apply("synthesis2", y2_hat, x1_hat_warp)
    return x1_hat, x2_hat, y1_hat, y2_hat


class HESICFastCodec(HESICCodec):
    """HESIC with the fused on-device codec as the primary path.

    ``compress``/``decompress`` from HESICCodec (reference-layout container)
    remain available; ``compress_fast``/``decompress_fast`` use the
    on-device coder and our own container, and accept batches of pairs.
    """

    def __init__(self, module, params, mm: int = MM_DEFAULT,
                 lanes: int = LANES_DEFAULT):
        super().__init__(module, params)
        self.mm = mm
        self.lanes = lanes
        self._enc_fn = None
        self._dec_fn = None
        self._slice_fn = None

    def _encode_fn(self):
        if self._enc_fn is None:
            module, mm, lanes = self.module, self.mm, self.lanes

            @jax.jit
            def fn(params, x1, x2, h):
                return hesic_fast_encode(module, params, x1, x2, h, mm,
                                         lanes)

            self._enc_fn = fn
        return self._enc_fn

    def _decode_fn(self):
        if self._dec_fn is None:
            module, mm, lanes = self.module, self.mm, self.lanes

            def fn(params, z1_sym, z2_sym, s1, s2, h, y_shape):
                return hesic_fast_decode(module, params, z1_sym, z2_sym,
                                         s1, s2, h, y_shape, mm, lanes)

            self._dec_fn = jax.jit(fn, static_argnums=(6,))
        return self._dec_fn

    def _slice_words(self, words, cap: int):
        if self._slice_fn is None:
            self._slice_fn = jax.jit(
                lambda w, c: jax.lax.dynamic_slice_in_dim(w, 0, c, axis=2),
                static_argnums=(1,))
        return self._slice_fn(words, cap)

    # ---- container ----

    def compress_fast(self, x1, x2, h_matrix):
        """Compress a batch of pairs.  x1/x2: (B, H, W, 3); h: (B, 3, 3)
        or (1, 3, 3).  Returns dict with 'blobs' (list of bytes per pair)
        plus aggregate stats."""
        start = time.time()
        x1 = jnp.asarray(x1, jnp.float32)
        x2 = jnp.asarray(x2, jnp.float32)
        h_matrix = jnp.asarray(h_matrix, jnp.float32)
        if h_matrix.shape[0] != x1.shape[0]:
            h_matrix = jnp.broadcast_to(h_matrix,
                                        (x1.shape[0], 3, 3))
        z1_sym, z2_sym, s1, s2 = self._encode_fn()(
            self.params, x1, x2, h_matrix)

        # fetch counts first, then transfer only the used word capacity
        c1 = np.asarray(s1[1])
        c2 = np.asarray(s2[1])
        cap1 = max(int(c1.max()), 1)
        cap2 = max(int(c2.max()), 1)
        w1 = np.asarray(self._slice_words(s1[0], cap1))
        w2 = np.asarray(self._slice_words(s2[0], cap2))
        st1 = np.asarray(s1[2])
        st2 = np.asarray(s2[2])
        z1_np = np.asarray(z1_sym)
        z2_np = np.asarray(z2_sym)
        h_np = np.asarray(h_matrix)

        blobs = []
        b = x1.shape[0]
        for i in range(b):
            z1_str = self._eb_encode_symbols("entropy_bottleneck1",
                                             z1_np[i:i + 1])
            z2_str = self._eb_encode_symbols("entropy_bottleneck2",
                                             z2_np[i:i + 1])
            header = bytearray()
            header += np.array([x1.shape[1], x1.shape[2]],
                               np.uint16).tobytes()
            for s in (z1_str, z2_str):
                header += np.array([len(s)], np.uint32).tobytes() + s
            header += h_np[i].reshape(-1).astype(np.float32).tobytes()
            body = pack_stream(w1[i], c1[i], st1[i]) \
                + pack_stream(w2[i], c2[i], st2[i])
            blobs.append(bytes(header) + body)

        num_pixels = 2 * x1.shape[1] * x1.shape[2]
        total = sum(len(bl) for bl in blobs)
        return {
            "blobs": blobs,
            "blob": blobs[0],
            "bpp_real": total * 8 / (num_pixels * b),
            "enctime": time.time() - start,
        }

    def decompress_fast(self, blobs):
        """Decompress one blob (bytes) or a batch (list of bytes)."""
        start = time.time()
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [bytes(blobs)]
        z1_list, z2_list, h_list = [], [], []
        s1_parts, s2_parts = [], []
        y_shape = None
        for blob in blobs:
            off = 0
            x_shape = np.frombuffer(blob, np.uint16, 2, off)
            off += 4
            z_strs = []
            for _ in range(2):
                (length,) = np.frombuffer(blob, np.uint32, 1, off)
                off += 4
                z_strs.append(blob[off:off + int(length)])
                off += int(length)
            h_list.append(
                np.frombuffer(blob, np.float32, 9, off).reshape(3, 3))
            off += 36
            h_img, w_img = int(x_shape[0]), int(x_shape[1])
            y_shape = (h_img // 16, w_img // 16)
            z_shape = (y_shape[0] // 4, y_shape[1] // 4)
            z1_list.append(self._eb_decode_symbols(
                "entropy_bottleneck1", z_strs[0], z_shape)[0])
            z2_list.append(self._eb_decode_symbols(
                "entropy_bottleneck2", z_strs[1], z_shape)[0])
            w1, c1, st1, off = unpack_stream(blob, off)
            w2, c2, st2, off = unpack_stream(blob, off)
            s1_parts.append((w1, c1, st1))
            s2_parts.append((w2, c2, st2))

        def stack_streams(parts):
            cap = max(p[0].shape[1] for p in parts)
            cap = max(64, -(-cap // 64) * 64)  # bucket caps
            words = np.zeros((len(parts), parts[0][0].shape[0], cap),
                             np.int32)
            for i, (w, _, _) in enumerate(parts):
                words[i, :, : w.shape[1]] = w
            counts = np.stack([p[1] for p in parts])
            states = np.stack([p[2] for p in parts])
            return (jnp.asarray(words.astype(np.uint16)),
                    jnp.asarray(counts), jnp.asarray(states))

        x1_hat, x2_hat, y1_hat, y2_hat = self._decode_fn()(
            self.params, jnp.asarray(np.stack(z1_list)),
            jnp.asarray(np.stack(z2_list)), stack_streams(s1_parts),
            stack_streams(s2_parts), jnp.asarray(np.stack(h_list)),
            y_shape)
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
