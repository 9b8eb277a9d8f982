"""HESIC real-bitstream container codec.

Container layout follows the reference (newnet1.py:873-906):
  header (".npz"):  u16 H, u16 W | [u16 len(z_s), u16 minmax, u8[M/8]
  nonzero-channel bitmap, z rANS string] x 2 | 9 x f32 homography
  body   (".bin"):  range-coded y symbols, nonzero channels in ascending
  order, raster order within each channel; y1 then y2.

Deviations from the reference (documented):
  * The homography is serialized in the header (36 bytes) so the decoder is
    self-contained; the reference passes H out-of-band
    (newnet1.py:1069 takes h_matrix as an argument).
  * minmax is rounded up to a multiple of 8 so the symbol-grid width is
    bucketed (one XLA compilation per bucket instead of per image); the
    extra never-used symbols cost < 1e-3 bpp through the 1/65536 floor.
  * The per-pixel GMM PMF -> integer CDF quantization (clip to 1/65536,
    round to a 65536 total, cumsum — newnet1.py:975-978) runs on device for
    all channels at once; the host performs only the serial range-coder
    walk via one native call per eye.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import codecs
from ..entropy_models import gmm_pmf
from ..geometry import warp_perspective
from .base import CompressionModel, TogetherCodec

_RC_TOTAL_BITS = 16


@partial(jax.jit, static_argnums=(4, 5))
def _gmm_cdf_rows(sigma, means, weights, y_hat, minmax: int, K: int):
    """Quantized per-pixel CDF rows + shifted symbols, channel-major.

    sigma/means: (1, h, w, M*K); weights: (1, 1, 1, M*K);
    y_hat: (1, h, w, M).  Returns (cdf_rows (M, h*w, S+1) int32,
    symbols (M, h*w) int32) with S = 2*minmax + 1.
    """
    samples = jnp.arange(-minmax, minmax + 1, dtype=jnp.float32)
    pmf = gmm_pmf(samples, sigma, means, weights, K)      # (1, h, w, M, S)
    pmf = jnp.clip(pmf, 1.0 / 65536, 1.0)
    freq = jnp.round(pmf / jnp.sum(pmf, axis=-1, keepdims=True) * 65536)
    cdf = jnp.cumsum(freq, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    cdf = cdf[0].astype(jnp.int32)                        # (h, w, M, S+1)
    h, w, m, s1 = cdf.shape
    cdf_rows = cdf.transpose(2, 0, 1, 3).reshape(m, h * w, s1)
    symbols = (y_hat[0].astype(jnp.int32) + minmax)       # (h, w, M)
    symbols = symbols.transpose(2, 0, 1).reshape(m, h * w)
    return cdf_rows, symbols


def _bucket_minmax(v: int) -> int:
    v = max(int(v), 1)
    return ((v + 7) // 8) * 8


_warp_jit = jax.jit(warp_perspective, static_argnums=(2,))


class HESICCodec(CompressionModel):
    """Real-coder flows for the HESIC model (reference newnet1.py:823-1273).

    Only batch size 1 (one stereo pair per container), like the reference.
    """

    # ---- device-side sub-programs ----

    def _warp(self, x, h_matrix):
        return _warp_jit(x, h_matrix, (x.shape[1], x.shape[2]))

    def _y_payload(self, gmm, y_hat, minmax: int):
        """Device CDF rows + symbols for one eye; returns numpy arrays."""
        k = self.module.K
        cdf_rows, symbols = _gmm_cdf_rows(
            gmm[0], gmm[1], gmm[2], jnp.asarray(y_hat), minmax, k)
        return np.asarray(cdf_rows), np.asarray(symbols)

    @staticmethod
    def _nonzero_channels(y_hat_np) -> np.ndarray:
        flags = (np.abs(y_hat_np[0]).sum(axis=(0, 1)) > 0).astype(np.uint8)
        return flags  # (M,)

    # ---- container I/O ----

    def compress(self, x1, x2, h_matrix, output_name, output_path=""):
        x1 = jnp.asarray(x1, jnp.float32)
        x2 = jnp.asarray(x2, jnp.float32)
        h_matrix = jnp.asarray(h_matrix, jnp.float32)
        if x1.shape[0] != 1:
            raise ValueError("HESIC container codec takes one pair at a time")
        start = time.time()

        # left eye
        y1 = self.jit("analysis1")(x1)
        z1 = self.jit("hyper_analysis1")(y1)
        z1_strings = self.eb_compress("entropy_bottleneck1", z1)
        z1_hat = self.eb_decompress("entropy_bottleneck1", z1_strings,
                                    z1.shape[1:3])
        gmm1 = self.jit("gmm1")(z1_hat)
        y1_hat = jnp.round(y1)  # GMM quantizes without means (quirk)
        x1_hat = self.jit("synthesis1")(y1_hat)

        # right eye
        x1_warp = self._warp(x1, h_matrix)
        y2 = self.jit("analysis2")(x1_warp, x2)
        z2 = self.jit("hyper_analysis2")(y2)
        z2_strings = self.eb_compress("entropy_bottleneck2", z2)
        z2_hat = self.eb_decompress("entropy_bottleneck2", z2_strings,
                                    z2.shape[1:3])
        y1_prior = self.jit("left_prior")(x1_hat, h_matrix)
        gmm2 = self.jit("gmm2")(z2_hat, y1_prior)
        y2_hat = jnp.round(y2)

        y1_np = np.asarray(y1_hat)
        y2_np = np.asarray(y2_hat)
        flags1 = self._nonzero_channels(y1_np)
        flags2 = self._nonzero_channels(y2_np)
        minmax1 = _bucket_minmax(np.abs(y1_np).max())
        minmax2 = _bucket_minmax(np.abs(y2_np).max())

        # header
        header = bytearray()
        header += np.array([x1.shape[1], x1.shape[2]],
                           np.uint16).tobytes()
        for z_str, minmax, flags in ((z1_strings[0], minmax1, flags1),
                                     (z2_strings[0], minmax2, flags2)):
            header += np.array([len(z_str), minmax], np.uint16).tobytes()
            header += np.packbits(flags).tobytes()
            header += z_str
        header += np.asarray(h_matrix[0], np.float32).tobytes()

        # body: range-coded y payloads
        enc = codecs.RangeEncoder()
        for y_np, gmm, minmax, flags in (
                (y1_np, gmm1, minmax1, flags1),
                (y2_np, gmm2, minmax2, flags2)):
            cdf_rows, symbols = self._y_payload(gmm, y_np, minmax)
            nz = np.flatnonzero(flags)
            if nz.size:
                rows = cdf_rows[nz].reshape(-1, cdf_rows.shape[-1])
                syms = symbols[nz].reshape(-1)
                enc.encode_rows(syms, rows)
        body = enc.close()

        output1 = os.path.join(output_path, f"{output_name}.npz")
        output2 = os.path.join(output_path, f"{output_name}.bin")
        with open(output1, "wb") as f:
            f.write(bytes(header))
        with open(output2, "wb") as f:
            f.write(body)
        enc_time = time.time() - start

        num_pixels = x1.shape[1] * x1.shape[2] * 2
        size_real = len(header) + len(body)
        return {
            "bpp_real": size_real * 8 / num_pixels,
            "bpp_side": len(header) * 8 / num_pixels,
            "enctime": enc_time,
            "y1_hat": y1_hat,
            "y2_hat": y2_hat,
            "z1_hat": z1_hat,
            "z2_hat": z2_hat,
            "strings": [bytes(header), body],
        }

    def decompress(self, output_name, output_path="", h_matrix=None):
        output1 = os.path.join(output_path, f"{output_name}.npz")
        output2 = os.path.join(output_path, f"{output_name}.bin")
        with open(output1, "rb") as f:
            header = f.read()
        with open(output2, "rb") as f:
            body = f.read()
        return self.decompress_bytes(header, body, h_matrix=h_matrix)

    def decompress_bytes(self, header: bytes, body: bytes, h_matrix=None):
        m_ch = self.module.M
        start = time.time()
        off = 0
        x_shape = np.frombuffer(header[off:off + 4], np.uint16)
        off += 4
        z_meta = []
        for _ in range(2):
            length, minmax = np.frombuffer(header[off:off + 4], np.uint16)
            off += 4
            flags = np.unpackbits(
                np.frombuffer(header[off:off + m_ch // 8], np.uint8))
            off += m_ch // 8
            z_str = header[off:off + length]
            off += length
            z_meta.append((int(minmax), flags, z_str))
        if h_matrix is None:
            h_matrix = jnp.asarray(
                np.frombuffer(header[off:off + 36],
                              np.float32).reshape(1, 3, 3))
        else:
            h_matrix = jnp.asarray(h_matrix, jnp.float32)

        h_img, w_img = int(x_shape[0]), int(x_shape[1])
        y_shape = (h_img // 16, w_img // 16)
        z_shape = (y_shape[0] // 4, y_shape[1] // 4)

        z1_hat = self.eb_decompress("entropy_bottleneck1", [z_meta[0][2]],
                                    z_shape)
        z2_hat = self.eb_decompress("entropy_bottleneck2", [z_meta[1][2]],
                                    z_shape)

        dec = codecs.RangeDecoder(body)

        def decode_eye(gmm, minmax, flags):
            k = self.module.K
            zeros = jnp.zeros((1, y_shape[0], y_shape[1], m_ch))
            cdf_rows, _ = _gmm_cdf_rows(gmm[0], gmm[1], gmm[2], zeros,
                                        minmax, k)
            cdf_rows = np.asarray(cdf_rows)
            nz = np.flatnonzero(flags)
            y_hat = np.zeros((1, y_shape[0], y_shape[1], m_ch), np.float32)
            if nz.size:
                rows = cdf_rows[nz].reshape(-1, cdf_rows.shape[-1])
                syms = dec.decode_rows(rows) - minmax
                y_hat[0, :, :, nz] = syms.reshape(
                    nz.size, y_shape[0], y_shape[1])
            return jnp.asarray(y_hat)

        gmm1 = self.jit("gmm1")(z1_hat)
        y1_hat = decode_eye(gmm1, z_meta[0][0], z_meta[0][1])
        x1_hat = self.jit("synthesis1")(y1_hat)

        # rebuild the cross-eye prior exactly as the encoder did
        y1_prior = self.jit("left_prior")(x1_hat, h_matrix)
        gmm2 = self.jit("gmm2")(z2_hat, y1_prior)
        y2_hat = decode_eye(gmm2, z_meta[1][0], z_meta[1][1])

        x1_hat_warp = self._warp(x1_hat, h_matrix)
        x2_hat = self.jit("synthesis2")(y2_hat, x1_hat_warp)
        dec_time = time.time() - start

        return {
            "x1_hat": x1_hat,
            "x2_hat": x2_hat,
            "y1_hat": y1_hat,
            "y2_hat": y2_hat,
            "z1_hat": z1_hat,
            "z2_hat": z2_hat,
            "h_matrix": h_matrix,
            "dectime": dec_time,
        }


class HESICTogetherCodec(TogetherCodec):
    """Real-coder flows for HESICTogether: HESIC codes the pair, the
    stage-2 IndependentEnhancement runs after decode
    (GMM_together, reference newnet1.py:1304-1321)."""

    inner_codec_cls = HESICCodec
    enhance_with_h = True

    def _make_inner_module(self):
        from .hesic import HESIC
        m = self.module
        return HESIC(N=m.N, M=m.M, K=m.K)
