"""HESIC+ : stereo compression with per-eye joint autoregressive priors.

Reference: ywz/mywork/newnet1_joint.py — replaces HESIC's GMM hyper with
mbt2018-style machinery per eye (h_a/h_s, masked context conv, 1x1
entropy-parameter stack).  The right eye's entropy-parameter stack takes
5M channels: cat(params2 (2M), ctx2 (2M), re-encoded decoded-left latent
(M)) (newnet1_joint.py:659-665).

Codec deviation (documented): the reference codes y with per-pixel single-
Gaussian PMFs through the external `range_coder` package
(newnet1_joint.py:793-1322, per-pixel Python loops).  We use the
scale-table-indexed rANS (the same 64-bucket table the core models use)
with the device-scan encode / row-pipelined decode from autoregressive.py —
self-consistent bitstreams, equivalent rate, orders faster.
"""

from __future__ import annotations

import os
import struct
import time

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..entropy_models import EntropyBottleneck, GaussianConditional
from ..geometry import warp_perspective, warp_perspective_train
from ..layers import Conv, Deconv, MaskedConv2d
from ..ops import quantize
from .autoregressive import ar_compress, ar_decompress
from .base import CompressionModel, TogetherCodec
from .hesic import (IndependentEnhancement, StereoDecoder, StereoDecoder2,
                    StereoEncoder, StereoEncoder2)


class HESICPlus(nn.Module):
    """The HESIC+ model (reference newnet1_joint.py:585-750)."""

    N: int = 128
    M: int = 192
    dtype: object = None  # transform compute dtype (e.g. bf16); EB /
    # Gaussian likelihood math stays f32

    entropy_bottlenecks = ("entropy_bottleneck1", "entropy_bottleneck2")
    gaussian_conditionals = ("gaussian_conditional1", "gaussian_conditional2")

    def setup(self):
        n, m, d = self.N, self.M, self.dtype
        self.encoder1 = StereoEncoder(N=n, M=m, dtype=d)
        self.encoder2 = StereoEncoder2(N=n, M=m, dtype=d)
        self.decoder1 = StereoDecoder(N=n, dtype=d)
        self.decoder2 = StereoDecoder2(N=n, dtype=d)

        self.h_a1 = [Conv(n, kernel_size=3, stride=1, dtype=d),
                     nn.leaky_relu,
                     Conv(n, dtype=d), nn.leaky_relu, Conv(n, dtype=d)]
        self.h_s1 = [Deconv(m, dtype=d), nn.leaky_relu,
                     Deconv(m * 3 // 2, dtype=d),
                     nn.leaky_relu,
                     Conv(m * 2, kernel_size=3, stride=1, dtype=d)]
        self.entropy_parameters1 = [
            Conv(m * 10 // 3, kernel_size=1, stride=1, dtype=d),
            nn.leaky_relu,
            Conv(m * 8 // 3, kernel_size=1, stride=1, dtype=d),
            nn.leaky_relu,
            Conv(m * 6 // 3, kernel_size=1, stride=1, dtype=d)]
        self.context_prediction1 = MaskedConv2d(features=2 * m,
                                                kernel_size=5, mask_type="A",
                                                dtype=d)

        self.h_a2 = [Conv(n, kernel_size=3, stride=1, dtype=d),
                     nn.leaky_relu,
                     Conv(n, dtype=d), nn.leaky_relu, Conv(n, dtype=d)]
        self.h_s2 = [Deconv(m, dtype=d), nn.leaky_relu,
                     Deconv(m * 3 // 2, dtype=d),
                     nn.leaky_relu,
                     Conv(m * 2, kernel_size=3, stride=1, dtype=d)]
        # 5M input: cat(params2, ctx2, left prior) (newnet1_joint.py:659-665)
        self.entropy_parameters2 = [
            Conv(m * 10 // 3, kernel_size=1, stride=1, dtype=d),
            nn.leaky_relu,
            Conv(m * 8 // 3, kernel_size=1, stride=1, dtype=d),
            nn.leaky_relu,
            Conv(m * 6 // 3, kernel_size=1, stride=1, dtype=d)]
        self.context_prediction2 = MaskedConv2d(features=2 * m,
                                                kernel_size=5, mask_type="A",
                                                dtype=d)

        self.entropy_bottleneck1 = EntropyBottleneck(channels=n)
        self.entropy_bottleneck2 = EntropyBottleneck(channels=n)
        self.gaussian_conditional1 = GaussianConditional()
        self.gaussian_conditional2 = GaussianConditional()

    def aux_loss(self):
        return self.entropy_bottleneck1.loss() + self.entropy_bottleneck2.loss()

    # ---- codec-facing sub-programs ----

    def analysis1(self, x1):
        return self.encoder1(x1)

    def analysis2(self, x1_warp, x2):
        return self.encoder2(x1_warp, x2)

    def synthesis1(self, y1_hat):
        return self.decoder1(y1_hat)

    def synthesis2(self, y2_hat, x1_hat_warp):
        return self.decoder2(y2_hat, x1_hat_warp)

    def hyper_analysis1(self, y1):
        z = y1
        for layer in self.h_a1:
            z = layer(z)
        return z.astype(jnp.float32)

    def hyper_analysis2(self, y2):
        z = y2
        for layer in self.h_a2:
            z = layer(z)
        return z.astype(jnp.float32)

    def hyper_synthesis1(self, z1_hat):
        p = z1_hat
        for layer in self.h_s1:
            p = layer(p)
        return p.astype(jnp.float32)

    def hyper_synthesis2(self, z2_hat):
        p = z2_hat
        for layer in self.h_s2:
            p = layer(p)
        return p.astype(jnp.float32)

    def entropy_params1(self, x):
        for layer in self.entropy_parameters1:
            x = layer(x)
        return x.astype(jnp.float32)

    def entropy_params2(self, x):
        for layer in self.entropy_parameters2:
            x = layer(x)
        return x.astype(jnp.float32)

    def left_prior(self, x1_hat, h_matrix):
        """Decoder-reproducible cross-eye prior (newnet1_joint.py:714-718),
        eval-mode quantization."""
        size = (x1_hat.shape[1], x1_hat.shape[2])
        x1_warp_aftercodec = warp_perspective_train(x1_hat, h_matrix,
                                            size, self.dtype)
        y1_warpf2 = self.encoder1(x1_warp_aftercodec)
        return quantize(y1_warpf2, "dequantize")

    def __call__(self, x1, x2, h_matrix, training: bool = False):
        size = (x1.shape[1], x1.shape[2])

        # left eye (mbt2018 machinery)
        y1 = self.encoder1(x1)
        z1 = self.hyper_analysis1(y1)
        z1_hat, z1_lik = self.entropy_bottleneck1(z1, training=training)
        params1 = self.hyper_synthesis1(z1_hat)
        if training:
            y1_hat = quantize(y1, "noise", rng=self.make_rng("noise"))
        else:
            y1_hat = quantize(y1, "dequantize")
        ctx1 = self.context_prediction1(y1_hat)
        gp1 = self.entropy_params1(
            jnp.concatenate([params1, ctx1], axis=-1))
        scales1, means1 = jnp.split(gp1, 2, axis=-1)
        _, y1_lik = self.gaussian_conditional1(y1, scales1, means=means1,
                                               training=training)
        x1_hat = self.decoder1(y1_hat)

        # right eye
        x1_warp = warp_perspective_train(x1, h_matrix, size, self.dtype)
        y2 = self.encoder2(x1_warp, x2)
        z2 = self.hyper_analysis2(y2)
        z2_hat, z2_lik = self.entropy_bottleneck2(z2, training=training)

        x1_warp_aftercodec = warp_perspective_train(x1_hat, h_matrix,
                                            size, self.dtype)
        y1_warpf2 = self.encoder1(x1_warp_aftercodec)
        if training:
            y1_hat_warpf2 = quantize(y1_warpf2, "noise",
                                     rng=self.make_rng("noise"))
        else:
            y1_hat_warpf2 = quantize(y1_warpf2, "dequantize")

        params2 = self.hyper_synthesis2(z2_hat)
        if training:
            y2_hat = quantize(y2, "noise", rng=self.make_rng("noise"))
        else:
            y2_hat = quantize(y2, "dequantize")
        ctx2 = self.context_prediction2(y2_hat)
        gp2 = self.entropy_params2(
            jnp.concatenate([params2, ctx2, y1_hat_warpf2], axis=-1))
        scales2, means2 = jnp.split(gp2, 2, axis=-1)
        _, y2_lik = self.gaussian_conditional2(y2, scales2, means=means2,
                                               training=training)

        x1_hat_warp = warp_perspective_train(x1_hat, h_matrix, size,
                                     self.dtype)
        x2_hat = self.decoder2(y2_hat, x1_hat_warp)

        return {
            "x1_hat": x1_hat,
            "x2_hat": x2_hat,
            "y1_hat": y1_hat,
            "y2_hat": y2_hat,
            "likelihoods": {
                "y1": y1_lik,
                "y2": y2_lik,
                "z1": z1_lik,
                "z2": z2_lik,
            },
        }


class HESICPlusTogether(nn.Module):
    """HESIC+ with stage-2 enhancement (GMM_together,
    newnet1_joint.py:1351)."""

    N: int = 128
    M: int = 192
    dtype: object = None

    entropy_bottlenecks = ("m1/entropy_bottleneck1", "m1/entropy_bottleneck2")

    def setup(self):
        self.m1 = HESICPlus(N=self.N, M=self.M, dtype=self.dtype)
        self.m2 = IndependentEnhancement()

    def aux_loss(self):
        return self.m1.aux_loss()

    def enhance(self, x1_hat, x2_hat, h_matrix):
        """Stage-2 enhancement sub-program (codec applies it post-decode)."""
        return self.m2(x1_hat, x2_hat, h_matrix)

    def __call__(self, x1, x2, h_matrix, training: bool = False):
        out1 = self.m1(x1, x2, h_matrix, training=training)
        out2 = self.m2(out1["x1_hat"], out1["x2_hat"], h_matrix)
        return {
            "x1_hat": out2["x1_hat"],
            "x2_hat": out2["x2_hat"],
            "likelihoods": out1["likelihoods"],
        }


class HESICPlusCodec(CompressionModel):
    """Real-coder container for HESIC+.

    Container: u16 H, W | u16 len(z1) | z1 | u16 len(z2) | z2 |
    u32 len(y1) | y1 | u32 len(y2) | y2 | 9 x f32 homography.
    """

    def compress(self, x1, x2, h_matrix, output_name=None, output_path=""):
        x1 = jnp.asarray(x1, jnp.float32)
        x2 = jnp.asarray(x2, jnp.float32)
        h_matrix = jnp.asarray(h_matrix, jnp.float32)
        if x1.shape[0] != 1:
            raise ValueError("HESIC+ codec takes one pair at a time")
        start = time.time()
        size = (x1.shape[1], x1.shape[2])

        # left eye
        y1 = self.jit("analysis1")(x1)
        z1 = self.jit("hyper_analysis1")(y1)
        z1_strings = self.eb_compress("entropy_bottleneck1", z1)
        z1_hat = self.eb_decompress("entropy_bottleneck1", z1_strings,
                                    z1.shape[1:3])
        params1 = self.jit("hyper_synthesis1")(z1_hat)
        # the native encoder returns the decoder-exact y1_hat (same C++
        # float math both directions)
        y1_strings, y1_hat = ar_compress(
            self, y1, params1, ctx_name="context_prediction1",
            ep_prefix="entropy_parameters1", gc_name="gaussian_conditional1")
        x1_hat = self.jit("synthesis1")(y1_hat)

        # right eye
        x1_warp = warp_perspective(x1, h_matrix, size)
        y2 = self.jit("analysis2")(x1_warp, x2)
        z2 = self.jit("hyper_analysis2")(y2)
        z2_strings = self.eb_compress("entropy_bottleneck2", z2)
        z2_hat = self.eb_decompress("entropy_bottleneck2", z2_strings,
                                    z2.shape[1:3])
        params2 = self.jit("hyper_synthesis2")(z2_hat)
        y1_prior = self.jit("left_prior")(x1_hat, h_matrix)
        y2_strings, _ = ar_compress(
            self, y2, params2, post=y1_prior,
            ctx_name="context_prediction2",
            ep_prefix="entropy_parameters2", gc_name="gaussian_conditional2")

        blob = bytearray()
        blob += np.array([x1.shape[1], x1.shape[2]], np.uint16).tobytes()
        for s in (z1_strings[0], z2_strings[0]):
            blob += struct.pack("<H", len(s)) + s
        for s in (y1_strings[0], y2_strings[0]):
            blob += struct.pack("<I", len(s)) + s
        blob += np.asarray(h_matrix[0], np.float32).tobytes()
        blob = bytes(blob)

        if output_name is not None:
            with open(os.path.join(output_path, f"{output_name}.hesicp"),
                      "wb") as f:
                f.write(blob)
        num_pixels = x1.shape[1] * x1.shape[2] * 2
        return {
            "bpp_real": len(blob) * 8 / num_pixels,
            "enctime": time.time() - start,
            "strings": [blob],
        }

    def decompress(self, blob, output_path="", h_matrix=None):
        if isinstance(blob, str):
            with open(os.path.join(output_path, f"{blob}.hesicp"),
                      "rb") as f:
                blob = f.read()
        start = time.time()
        off = 0
        x_shape = np.frombuffer(blob[off:off + 4], np.uint16)
        off += 4
        z_strs = []
        for _ in range(2):
            (length,) = struct.unpack_from("<H", blob, off)
            off += 2
            z_strs.append(blob[off:off + length])
            off += length
        y_strs = []
        for _ in range(2):
            (length,) = struct.unpack_from("<I", blob, off)
            off += 4
            y_strs.append(blob[off:off + length])
            off += length
        if h_matrix is None:
            h_matrix = jnp.asarray(
                np.frombuffer(blob[off:off + 36],
                              np.float32).reshape(1, 3, 3))
        else:
            h_matrix = jnp.asarray(h_matrix, jnp.float32)

        h_img, w_img = int(x_shape[0]), int(x_shape[1])
        y_shape = (h_img // 16, w_img // 16)
        z_shape = (y_shape[0] // 4, y_shape[1] // 4)
        size = (h_img, w_img)

        z1_hat = self.eb_decompress("entropy_bottleneck1", [z_strs[0]],
                                    z_shape)
        params1 = self.jit("hyper_synthesis1")(z1_hat)
        y1_hat = ar_decompress(
            self, [y_strs[0]], params1, ctx_name="context_prediction1",
            ep_prefix="entropy_parameters1", gc_name="gaussian_conditional1")
        x1_hat = self.jit("synthesis1")(y1_hat)

        z2_hat = self.eb_decompress("entropy_bottleneck2", [z_strs[1]],
                                    z_shape)
        params2 = self.jit("hyper_synthesis2")(z2_hat)
        y1_prior = self.jit("left_prior")(x1_hat, h_matrix)
        y2_hat = ar_decompress(
            self, [y_strs[1]], params2, post=y1_prior,
            ctx_name="context_prediction2",
            ep_prefix="entropy_parameters2", gc_name="gaussian_conditional2")

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


class HESICPlusTogetherCodec(TogetherCodec):
    """Real-coder flows for HESICPlusTogether: HESIC+ codes the pair, the
    stage-2 IndependentEnhancement runs after decode
    (GMM_together, reference newnet1_joint.py:1351)."""

    inner_codec_cls = HESICPlusCodec
    enhance_with_h = True

    def _make_inner_module(self):
        m = self.module
        return HESICPlus(N=m.N, M=m.M)
