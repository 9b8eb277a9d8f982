"""DSIC real-bitstream container codec.

Same container scheme as HESIC (reference mynet6_plus.py:799-1350 mirrors
newnet1.py's .npz/.bin layout) minus the homography: the right-eye GMM
prior is the decoded left latent itself (mynet6.py:662), which the decoder
has after decoding y1.
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from .. import codecs
from .base import CompressionModel, TogetherCodec
from .hesic_codec import _bucket_minmax, _gmm_cdf_rows


class DSICCodec(CompressionModel):
    """Real-coder flows for the DSIC model (reference mynet6_plus.py)."""

    def _y_payload(self, gmm, y_hat, minmax: int):
        k = self.module.K
        cdf_rows, symbols = _gmm_cdf_rows(
            gmm[0], gmm[1], gmm[2], jnp.asarray(y_hat), minmax, k)
        return np.asarray(cdf_rows), np.asarray(symbols)

    @staticmethod
    def _nonzero_channels(y_hat_np) -> np.ndarray:
        return (np.abs(y_hat_np[0]).sum(axis=(0, 1)) > 0).astype(np.uint8)

    def compress(self, x1, x2, output_name, output_path=""):
        x1 = jnp.asarray(x1, jnp.float32)
        x2 = jnp.asarray(x2, jnp.float32)
        if x1.shape[0] != 1:
            raise ValueError("DSIC container codec takes one pair at a time")
        start = time.time()

        y1, g1_1, g1_2, g1_3 = self.jit("analysis1")(x1)
        z1 = self.jit("hyper_analysis1")(y1)
        z1_strings = self.eb_compress("entropy_bottleneck1", z1)
        z1_hat = self.eb_decompress("entropy_bottleneck1", z1_strings,
                                    z1.shape[1:3])
        gmm1 = self.jit("gmm1")(z1_hat)
        y1_hat = jnp.round(y1)
        _, g1_4, g1_5, g1_6 = self.jit("synthesis1")(y1_hat)

        contexts = self.jit("contexts")(y1_hat)
        y2 = self.jit("analysis2")(x2, g1_1, g1_2, g1_3, contexts)
        z2 = self.jit("hyper_analysis2")(y2)
        z2_strings = self.eb_compress("entropy_bottleneck2", z2)
        z2_hat = self.eb_decompress("entropy_bottleneck2", z2_strings,
                                    z2.shape[1:3])
        gmm2 = self.jit("gmm2")(z2_hat, y1_hat)
        y2_hat = jnp.round(y2)

        y1_np = np.asarray(y1_hat)
        y2_np = np.asarray(y2_hat)
        flags1 = self._nonzero_channels(y1_np)
        flags2 = self._nonzero_channels(y2_np)
        minmax1 = _bucket_minmax(np.abs(y1_np).max())
        minmax2 = _bucket_minmax(np.abs(y2_np).max())

        header = bytearray()
        header += np.array([x1.shape[1], x1.shape[2]], np.uint16).tobytes()
        for z_str, minmax, flags in ((z1_strings[0], minmax1, flags1),
                                     (z2_strings[0], minmax2, flags2)):
            header += np.array([len(z_str), minmax], np.uint16).tobytes()
            header += np.packbits(flags).tobytes()
            header += z_str

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

        with open(os.path.join(output_path, f"{output_name}.npz"),
                  "wb") as f:
            f.write(bytes(header))
        with open(os.path.join(output_path, f"{output_name}.bin"),
                  "wb") as f:
            f.write(body)

        num_pixels = x1.shape[1] * x1.shape[2] * 2
        return {
            "bpp_real": (len(header) + len(body)) * 8 / num_pixels,
            "bpp_side": len(header) * 8 / num_pixels,
            "enctime": time.time() - start,
            "y1_hat": y1_hat,
            "y2_hat": y2_hat,
            "strings": [bytes(header), body],
        }

    def decompress(self, output_name, output_path=""):
        with open(os.path.join(output_path, f"{output_name}.npz"),
                  "rb") as f:
            header = f.read()
        with open(os.path.join(output_path, f"{output_name}.bin"),
                  "rb") as f:
            body = f.read()
        return self.decompress_bytes(header, body)

    def decompress_bytes(self, header: bytes, body: bytes):
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
            z_meta.append((int(minmax), flags, header[off:off + length]))
            off += length

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
        x1_hat, g1_4, g1_5, g1_6 = self.jit("synthesis1")(y1_hat)
        contexts = self.jit("contexts")(y1_hat)

        gmm2 = self.jit("gmm2")(z2_hat, y1_hat)
        y2_hat = decode_eye(gmm2, z_meta[1][0], z_meta[1][1])
        x2_hat = self.jit("synthesis2")(y2_hat, g1_4, g1_5, g1_6, contexts)
        return {
            "x1_hat": x1_hat,
            "x2_hat": x2_hat,
            "y1_hat": y1_hat,
            "y2_hat": y2_hat,
            "dectime": time.time() - start,
        }


class DSICPlusCodec(TogetherCodec):
    """Real-coder flows for DSICPlus: DSIC codes the pair, the no-warp
    stage-2 enhancement runs after decode
    (DSIC_plus, reference mynet6_plus.py:1352-1370)."""

    inner_codec_cls = DSICCodec
    enhance_with_h = False

    def _make_inner_module(self):
        from .dsic import DSIC
        m = self.module
        return DSIC(N=m.N, M=m.M, F=m.F, C=m.C, K=m.K)
