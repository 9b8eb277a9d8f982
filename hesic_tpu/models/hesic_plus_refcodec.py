"""Reference-layout container codec for HESIC+ (.npz header + .bin body).

Mirrors the reference's HESIC+ per-pixel codec semantics
(ywz/mywork/newnet1_joint.py:793-1322):

  * y latents are quantized WITHOUT means (``round(y)``,
    newnet1_joint.py:804/836) — unlike our production AR codec
    (``HESICPlusCodec``), which rounds mean-centered for better RD.
  * every y symbol is coded with its exact per-pixel single-Gaussian PMF
    (sigma/mean from masked-context + entropy-parameter MLP, sigma
    lower-bounded at 0.11), quantized clip(1/65536) -> round-to-65536 ->
    cumsum (newnet1_joint.py:965-975), through the range coder —
    NOT with the 64-bucket scale-table rANS.
  * container layout (newnet1_joint.py:850-890): u16 H,W | per eye
    [u16 len(z), u16 minmax | u8[M/8] nonzero-channel bitmap | z string]
    | range-coded y1 then y2 bodies in a separate .bin; symbol order is
    raster pixels outer, nonzero channels (ascending) inner
    (newnet1_joint.py:903-977 — note: the *pixel-major* order of the
    joint codec, not newnet1.py's channel-major order).

Deviation (documented): the homography is appended to the header
(36 bytes) so the decoder is self-contained; the reference passes H
out-of-band (newnet1_joint.py:1081 takes h_matrix as an argument).

Bit-consistency design: the Gaussian parameters feed the coder, so the
encoder and decoder must compute them with IDENTICAL float operations.
Both directions therefore run ONE host-side routine (``_walk_eye``) —
a row-pipelined numpy walk (upper context as one (W, 10M) x (10M, 2M)
matmul per row, two left taps + the 1x1 MLP per pixel).  The decoded
context values are exact integers (round(y) teacher forcing), so the
encode-side and decode-side inputs agree bitwise and the shared routine
yields bitwise-equal CDFs.  Host numpy (not XLA) math also makes the
container backend-portable: a stream encoded on a TPU host decodes on
any host.

This path exists for reference-format compatibility and for the
trained-weights cross-implementation audit
(tests/test_trained_parity_hplus.py); the production paths are
``HESICPlusCodec`` (native AR rANS) and ``HESICPlusDeviceCodec``
(Pallas wavefront).
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np
from scipy.special import erfc

from .. import codecs
from ..geometry import warp_perspective
from .autoregressive import _PAD, extract_ar_weights
from .hesic_plus import HESICPlusCodec

_HALF = np.float32(0.5)
_NEG_RSQRT2 = np.float32(-(2.0 ** -0.5))
_SCALE_BOUND = np.float32(0.11)  # GaussianConditional scale_bound
# (reference entropy_models.py:445 / GMM :581)


def _std_cumulative(x):
    """f32 mirror of the reference ``_standardized_cumulative``
    (newnet1_joint.py:785-791): 0.5 * erfc(-x / sqrt(2))."""
    return (_HALF * erfc(_NEG_RSQRT2 * x).astype(np.float32))


def _leaky(v):
    return np.where(v >= 0, v, np.float32(0.01) * v)


def _walk_eye(params, ctx_name, ep_prefix, pre, post, minmax, nz, m,
              *, y_hat=None, enc=None, dec=None):
    """Shared encode/decode raster walk for one eye.

    pre: (H, W, P) f32 hyper-synthesis output; post: (H, W, Q) or None;
    nz: ascending nonzero channel indexes.  Encode mode: pass ``y_hat``
    (H, W, M) integers-as-f32 and ``enc``.  Decode mode: pass ``dec``;
    returns the reconstructed (H, W, M) f32 latent.
    """
    w = extract_ar_weights(params, ctx_name, ep_prefix)
    ctx_k = np.asarray(w.ctx_kernel, np.float32)        # (5, 5, M, 2M)
    ctx_b = np.asarray(w.ctx_bias, np.float32)
    ep_ks = [np.asarray(k, np.float32) for k in w.ep_kernels]
    ep_bs = [np.asarray(b, np.float32) for b in w.ep_biases]

    h, w_dim = pre.shape[:2]
    k_up = ctx_k[:_PAD].reshape(_PAD * 5 * m, 2 * m)    # rows above
    k_left2 = ctx_k[_PAD, 0]                            # (M, 2M)
    k_left1 = ctx_k[_PAD, 1]

    samples = np.arange(0, 2 * minmax + 1, dtype=np.float32)
    shift = np.float32(minmax)
    buf = np.zeros((h + 2 * _PAD, w_dim + 2 * _PAD, m), np.float32)
    out = None if enc is not None else np.zeros((h, w_dim, m), np.float32)

    for hh in range(h):
        rows = buf[hh:hh + _PAD]                        # (2, W+4, M)
        windows = np.lib.stride_tricks.sliding_window_view(rows, 5, axis=1)
        x_up = windows.transpose(1, 0, 3, 2).reshape(w_dim, _PAD * 5 * m)
        ctx_up = x_up @ k_up                            # (W, 2M)
        p_row = pre[hh]
        q_row = None if post is None else post[hh]
        row_buf = buf[hh + _PAD]                        # (W+4, M) view
        for ww in range(w_dim):
            ctx = (ctx_up[ww] + row_buf[ww] @ k_left2
                   + row_buf[ww + 1] @ k_left1 + ctx_b)
            feat = (np.concatenate([p_row[ww], ctx]) if q_row is None
                    else np.concatenate([p_row[ww], ctx, q_row[ww]]))
            g = _leaky(feat @ ep_ks[0] + ep_bs[0])
            g = _leaky(g @ ep_ks[1] + ep_bs[1])
            g = g @ ep_ks[2] + ep_bs[2]
            sigma = np.maximum(g[:m], _SCALE_BOUND)     # lower_bound_scale
            mean = g[m:]

            # exact per-pixel Gaussian PMF over the shifted symbol grid
            # (newnet1_joint.py:930-975), nonzero channels only
            values = np.abs(samples[None, :]
                            - (mean[nz, None] + shift))     # (nz, S)
            s = sigma[nz, None]
            pmf = (_std_cumulative((_HALF - values) / s)
                   - _std_cumulative((-_HALF - values) / s))
            pmf = np.clip(pmf, np.float32(1.0 / 65536), np.float32(1.0))
            freq = np.round(pmf / pmf.sum(axis=1, keepdims=True)
                            * np.float32(65536))
            cdf_rows = np.zeros((nz.size, samples.size + 1), np.int32)
            cdf_rows[:, 1:] = np.cumsum(freq, axis=1).astype(np.int32)

            if enc is not None:
                vals = y_hat[hh, ww]
                syms = vals[nz].astype(np.int32) + minmax
                enc.encode_rows(syms, cdf_rows)
            else:
                syms = dec.decode_rows(cdf_rows)
                vals = np.zeros(m, np.float32)
                vals[nz] = (syms - minmax).astype(np.float32)
                out[hh, ww] = vals
            row_buf[ww + _PAD] = vals
    return out


def _minmax_of(y_np) -> int:
    """Reference minmax: max(|min|, |max|) clamped to >= 1
    (newnet1_joint.py:866-868)."""
    return int(max(abs(float(y_np.max())), abs(float(y_np.min())), 1.0))


class HESICPlusRefCodec(HESICPlusCodec):
    """HESIC+ codec in the reference's own container format (see module
    docstring).  One stereo pair per container, like the reference."""

    def compress(self, x1, x2, h_matrix, output_name, output_path=""):
        x1 = jnp.asarray(x1, jnp.float32)
        x2 = jnp.asarray(x2, jnp.float32)
        h_matrix = jnp.asarray(h_matrix, jnp.float32)
        if x1.shape[0] != 1:
            raise ValueError("reference-layout codec takes one pair at a time")
        start = time.time()
        size = (x1.shape[1], x1.shape[2])
        m = self.module.M

        # left eye
        y1 = self.jit("analysis1")(x1)
        z1 = self.jit("hyper_analysis1")(y1)
        z1_strings = self.eb_compress("entropy_bottleneck1", z1)
        z1_hat = self.eb_decompress("entropy_bottleneck1", z1_strings,
                                    z1.shape[1:3])
        params1 = self.jit("hyper_synthesis1")(z1_hat)
        y1_hat = jnp.round(y1)      # no means (newnet1_joint.py:804)
        x1_hat = self.jit("synthesis1")(y1_hat)

        # right eye
        x1_warp = warp_perspective(x1, h_matrix, size)
        y2 = self.jit("analysis2")(x1_warp, x2)
        z2 = self.jit("hyper_analysis2")(y2)
        z2_strings = self.eb_compress("entropy_bottleneck2", z2)
        z2_hat = self.eb_decompress("entropy_bottleneck2", z2_strings,
                                    z2.shape[1:3])
        params2 = self.jit("hyper_synthesis2")(z2_hat)
        y2_hat = jnp.round(y2)
        y1_prior = self.jit("left_prior")(x1_hat, h_matrix)

        y1_np = np.asarray(y1_hat[0])
        y2_np = np.asarray(y2_hat[0])
        flags1 = (np.abs(y1_np).sum(axis=(0, 1)) > 0).astype(np.uint8)
        flags2 = (np.abs(y2_np).sum(axis=(0, 1)) > 0).astype(np.uint8)
        minmax1 = _minmax_of(y1_np)
        minmax2 = _minmax_of(y2_np)

        header = bytearray()
        header += np.array([x1.shape[1], x1.shape[2]], np.uint16).tobytes()
        for z_str, minmax, flags in ((z1_strings[0], minmax1, flags1),
                                     (z2_strings[0], minmax2, flags2)):
            header += np.array([len(z_str), minmax], np.uint16).tobytes()
            header += np.packbits(flags).tobytes()
            header += z_str
        header += np.asarray(h_matrix[0], np.float32).tobytes()

        enc = codecs.RangeEncoder()
        _walk_eye(self.params, "context_prediction1", "entropy_parameters1",
                  np.asarray(params1[0], np.float32), None, minmax1,
                  np.flatnonzero(flags1), m, y_hat=y1_np, enc=enc)
        _walk_eye(self.params, "context_prediction2", "entropy_parameters2",
                  np.asarray(params2[0], np.float32),
                  np.asarray(y1_prior[0], np.float32), minmax2,
                  np.flatnonzero(flags2), m, y_hat=y2_np, enc=enc)
        body = enc.close()

        with open(os.path.join(output_path, f"{output_name}.npz"),
                  "wb") as f:
            f.write(bytes(header))
        with open(os.path.join(output_path, f"{output_name}.bin"),
                  "wb") as f:
            f.write(body)

        num_pixels = x1.shape[1] * x1.shape[2] * 2
        size_real = len(header) + len(body)
        return {
            "bpp_real": size_real * 8 / num_pixels,
            "bpp_side": len(header) * 8 / num_pixels,
            "enctime": time.time() - start,
            "y1_hat": y1_hat,
            "y2_hat": y2_hat,
            "strings": [bytes(header), body],
        }

    def decompress(self, output_name, output_path="", h_matrix=None):
        with open(os.path.join(output_path, f"{output_name}.npz"),
                  "rb") as f:
            header = f.read()
        with open(os.path.join(output_path, f"{output_name}.bin"),
                  "rb") as f:
            body = f.read()
        m = self.module.M
        start = time.time()
        off = 0
        x_shape = np.frombuffer(header[off:off + 4], np.uint16)
        off += 4
        z_meta = []
        for _ in range(2):
            length, minmax = np.frombuffer(header[off:off + 4], np.uint16)
            off += 4
            flags = np.unpackbits(
                np.frombuffer(header[off:off + m // 8], np.uint8))
            off += m // 8
            z_str = header[off:off + length]
            off += length
            z_meta.append((int(minmax), np.flatnonzero(flags), z_str))
        if h_matrix is None:
            h_matrix = jnp.asarray(
                np.frombuffer(header[off:off + 36],
                              np.float32).reshape(1, 3, 3))
        else:
            h_matrix = jnp.asarray(h_matrix, jnp.float32)

        h_img, w_img = int(x_shape[0]), int(x_shape[1])
        y_shape = (h_img // 16, w_img // 16)
        z_shape = (y_shape[0] // 4, y_shape[1] // 4)
        size = (h_img, w_img)

        dec = codecs.RangeDecoder(body)

        z1_hat = self.eb_decompress("entropy_bottleneck1", [z_meta[0][2]],
                                    z_shape)
        params1 = self.jit("hyper_synthesis1")(z1_hat)
        y1_np = _walk_eye(self.params, "context_prediction1",
                          "entropy_parameters1",
                          np.asarray(params1[0], np.float32), None,
                          z_meta[0][0], z_meta[0][1], m, dec=dec)
        y1_hat = jnp.asarray(y1_np)[None]
        x1_hat = self.jit("synthesis1")(y1_hat)

        z2_hat = self.eb_decompress("entropy_bottleneck2", [z_meta[1][2]],
                                    z_shape)
        params2 = self.jit("hyper_synthesis2")(z2_hat)
        y1_prior = self.jit("left_prior")(x1_hat, h_matrix)
        y2_np = _walk_eye(self.params, "context_prediction2",
                          "entropy_parameters2",
                          np.asarray(params2[0], np.float32),
                          np.asarray(y1_prior[0], np.float32),
                          z_meta[1][0], z_meta[1][1], m, dec=dec)
        y2_hat = jnp.asarray(y2_np)[None]

        x1_hat_warp = warp_perspective(x1_hat, h_matrix, size)
        x2_hat = self.jit("synthesis2")(y2_hat, x1_hat_warp)
        return {
            "x1_hat": x1_hat,
            "x2_hat": x2_hat,
            "y1_hat": y1_hat,
            "y2_hat": y2_hat,
            "h_matrix": h_matrix,
            "dectime": time.time() - start,
        }
