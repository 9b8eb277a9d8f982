"""DSIC: deep stereo image compression with cost volumes and dense warp.

Reference: ywz/DSIC/mynet6.py (+ mynet6_plus.py for the enhanced/codec
variant).  The right eye is coded by warping left-eye encoder/decoder
features with learned disparity distributions (softmax cost volumes over
C=32 horizontal shifts), conditioned on a global context derived from the
decoded left latent.

TPU-first notes:
  * dense_warp (a per-disparity Python shift loop over detached features,
    mynet6.py:252-281) is a static unrolled shift-multiply-accumulate —
    XLA fuses it into C fused multiply-adds; gradients flow into the cost
    only (the feature input is stop_gradient'ed, same as the reference).
  * Conv3d blocks run as NDHWC ``lax.conv_general_dilated`` (depth = the
    disparity axis).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..entropy_models import EntropyBottleneck, GaussianMixtureConditional
from ..layers import GDN, Conv, Deconv, conv3x3, kaiming_normal
from .hesic import EnhancementBlock, GmmHyperY1, GmmHyperY2, HyperEncoder


class Conv3D(nn.Module):
    """3-D convolution, NDHWC, torch-style symmetric padding.

    Two apply layouts over the SAME (kd, kh, kw, I, O) parameters:
      * rank-5 input (B, D, H, W, I): plain NDHWC lax conv.
      * rank-4 input (B, H, W, D*I) with ``folds=D`` (disparity folded
        into channels, disparity-major): a 2-D conv whose weight is the
        block-banded expansion of the 3-D kernel over the disparity
        axis.  DSIC's cost volumes have I=O=F0=7 — in NDHWC every
        tensor of the 3-D branch carries a 7-wide minor dim that XLA
        pads to 128 lanes (~18x wasted HBM traffic and MXU columns);
        folded, the branch runs at D*I=224 full lanes.  The band adds
        exact zeros, so outputs match NDHWC up to summation order.
    """

    features: int
    kernel_size: int = 5
    dtype: object = None
    folds: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        d = self.dtype or x.dtype
        if x.ndim == 5:
            kernel = self.param(
                "kernel", kaiming_normal,
                (k, k, k, x.shape[-1], self.features), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = jax.lax.conv_general_dilated(
                x.astype(d), kernel.astype(d), window_strides=(1, 1, 1),
                padding=((p, p), (p, p), (p, p)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return out + bias.astype(d)

        assert self.folds > 1, (
            "rank-4 Conv3D input requires folds=D (the disparity-folded "
            "layout); a plain 2-D activation would silently use only the "
            "central depth slice of the 3-D kernel")
        dd = self.folds
        ci = x.shape[-1] // dd
        co = self.features
        kernel = self.param("kernel", kaiming_normal,
                            (k, k, k, ci, co), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (co,),
                          jnp.float32)

        def band_conv(d_lo_in, d_hi_in, d_lo_out, d_hi_out):
            """2-D conv of input disparity rows [d_lo_in, d_hi_in) onto
            output rows [d_lo_out, d_hi_out) through the band expansion:
            sel[t, d_in, d_out] = 1 iff d_in == d_out + t - p (edges get
            zero padding via the missing band entries, same as the NDHWC
            conv's depth padding)."""
            n_in, n_out = d_hi_in - d_lo_in, d_hi_out - d_lo_out
            sel = np.zeros((k, n_in, n_out), np.float32)
            for t in range(k):
                for m, do in enumerate(range(d_lo_out, d_hi_out)):
                    di = do + t - p
                    if d_lo_in <= di < d_hi_in:
                        sel[t, di - d_lo_in, m] = 1.0
            k2d = jnp.einsum("tnm,thwio->hwnimo", jnp.asarray(sel),
                             kernel)
            k2d = k2d.reshape(k, k, n_in * ci, n_out * co)
            xs = x[..., d_lo_in * ci:d_hi_in * ci]
            return jax.lax.conv_general_dilated(
                xs.astype(d), k2d.astype(d), window_strides=(1, 1),
                padding=((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # output-chunking over disparity trims the band's zero FLOPs
        # (each output chunk only reads its (chunk + 2p) input rows) at
        # the cost of narrower matmuls; default 1 = one full-band conv,
        # the configuration measured on TPU
        chunks = int(os.environ.get("HESIC_FOLD3D_CHUNKS", "1"))
        if chunks <= 1 or dd % chunks:
            out = band_conv(0, dd, 0, dd)
        else:
            step = dd // chunks
            out = jnp.concatenate([
                band_conv(max(0, g - p), min(dd, g + step + p),
                          g, g + step)
                for g in range(0, dd, step)], axis=-1)
        return out + jnp.tile(bias, dd).astype(d)


class GroupNorm(nn.Module):
    """``nn.GroupNorm(num_groups=1)`` that also accepts the
    disparity-folded layout (B, H, W, D*F) given ``folds=D``.

    Parameters stay (F,) under the same auto-name (flax keys the
    auto-naming cursor by class __name__, so this interleaves with
    nn.GroupNorm in checkpoints transparently), and the statistics are
    over the same element set either way — only the summation order
    differs.  Mirrors flax's numerics: f32 fast-variance stats,
    ``(x - mean) * (rsqrt(var + eps) * scale) + bias``, cast to dtype
    at the end.
    """

    num_groups: int = 1
    epsilon: float = 1e-5
    dtype: object = None
    folds: int = 1

    @nn.compact
    def __call__(self, x):
        assert self.num_groups == 1
        f = x.shape[-1] // self.folds
        scale = self.param("scale", nn.initializers.ones, (f,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,),
                          jnp.float32)
        x32 = x.astype(jnp.float32)
        red = tuple(range(1, x.ndim))
        mean = jnp.mean(x32, red, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, red, keepdims=True) - mean * mean, 0.0)
        if self.folds > 1:
            scale = jnp.tile(scale, self.folds)
            bias = jnp.tile(bias, self.folds)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x32 - mean) * mul + bias
        return y.astype(self.dtype or x.dtype)


class Encoder1WithTaps(nn.Module):
    """Left-eye encoder exposing the per-stage GDN activations
    (Encoder1, mynet6.py / newnet1.py:580-601)."""

    N: int = 128
    M: int = 192
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        g1 = GDN(dtype=d)(Conv(self.N, dtype=d)(x))
        g2 = GDN(dtype=d)(Conv(self.N, dtype=d)(g1))
        g3 = GDN(dtype=d)(Conv(self.N, dtype=d)(g2))
        y = Conv(self.M, dtype=d)(g3).astype(jnp.float32)
        return y, g1, g2, g3


class Decoder1WithTaps(nn.Module):
    """Left-eye decoder exposing the per-stage IGDN activations
    (Decoder1, newnet1.py:603-624)."""

    N: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, y_hat):
        d = self.dtype
        g4 = GDN(inverse=True, dtype=d)(Deconv(self.N, dtype=d)(y_hat))
        g5 = GDN(inverse=True, dtype=d)(Deconv(self.N, dtype=d)(g4))
        g6 = GDN(inverse=True, dtype=d)(Deconv(self.N, dtype=d)(g5))
        x_hat = Deconv(3, dtype=d)(g6).astype(jnp.float32)
        return x_hat, g4, g5, g6


class GlobalContext(nn.Module):
    """Conv stack on y1_hat producing three 3-D context volumes
    (global_context, mynet6.py:152-182).

    Returns a tuple of 3 tensors shaped (B, C, h, w, F0) — disparity as
    the depth axis, F0 = F // 3 channels.
    """

    M: int = 192
    F: int = 21
    C: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, y1_hat):
        fc = self.F * self.C
        d = self.dtype
        x = Conv(fc, stride=1, dtype=d)(y1_hat)
        x = nn.GroupNorm(num_groups=self.F, epsilon=1e-5, dtype=d)(x)
        x = nn.relu(x)
        x = Conv(fc, stride=1, dtype=d)(x)
        x = nn.GroupNorm(num_groups=self.F, epsilon=1e-5, dtype=d)(x)
        x = nn.relu(x)
        x = Conv(fc, stride=1, dtype=d)(x)
        x = nn.GroupNorm(num_groups=self.F, epsilon=1e-5, dtype=d)(x)
        x = nn.relu(x)
        x = Conv(fc, stride=1, dtype=d)(x)
        b, h, w, _ = x.shape
        f0 = self.F // 3
        # channel layout (3, F0, C) like the reference reshape
        x = x.reshape(b, h, w, 3, f0, self.C)
        x = x.transpose(3, 0, 5, 1, 2, 4)  # (3, B, C, h, w, F0)
        return x[0], x[1], x[2]


class CostVolume(nn.Module):
    """Disparity cost volume from left/right features + 3-D context
    (cost_volume, mynet6.py:185-249).  Output (B, H, W, C) softmaxed over
    the disparity axis."""

    N: int = 128
    scale: int = 2
    F: int = 21
    C: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, h1, h2, d):
        dt = self.dtype
        # 2-D branch on concatenated features
        h = jnp.concatenate([h1.astype(dt or h1.dtype),
                             h2.astype(dt or h2.dtype)], axis=-1)
        h = Conv(self.N, stride=1, dtype=dt)(h)
        h = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=dt)(h)
        h = nn.relu(h)
        h = Conv(self.N, stride=1, dtype=dt)(h)
        h = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=dt)(h)
        h = nn.relu(h)

        # 3-D branch on the upsampled context volume (B, C, hy, wy, F0);
        # align_corners=True bilinear matches the reference
        # nn.UpsamplingBilinear2d (mynet6.py:207).  On the bf16 fast
        # path the disparity axis folds into channels for the whole
        # branch (see Conv3D): NDHWC keeps a 7-wide minor dim that XLA
        # pads to 128 lanes, ~18x the HBM traffic.
        b, c, hy, wy, f0 = d.shape
        hh, ww = hy * self.scale, wy * self.scale
        fold = (dt == jnp.bfloat16
                and os.environ.get("HESIC_NO_FOLD3D", "") != "1")
        if fold:
            df = d.transpose(0, 2, 3, 1, 4).reshape(b, hy, wy, c * f0)
            d_up = _upsample_bilinear_ac_2d(df, self.scale)
            d3 = Conv3D(f0, dtype=dt, folds=c)(d_up)
            d3 = GroupNorm(num_groups=1, epsilon=1e-5, dtype=dt,
                           folds=c)(d3)
            d3 = nn.relu(d3)
            d3 = Conv3D(f0, dtype=dt, folds=c)(d3)
            d3 = GroupNorm(num_groups=1, epsilon=1e-5, dtype=dt,
                           folds=c)(d3)
            d3 = nn.relu(d3)
            # disparity-major (c*F0 + f) -> reference layout (f*C + c)
            d2 = d3.reshape(b, hh, ww, c, f0).transpose(
                0, 1, 2, 4, 3).reshape(b, hh, ww, f0 * c)
        else:
            d_up = _upsample_bilinear_align_corners(d, self.scale)
            d3 = Conv3D(f0, dtype=dt)(d_up)
            d3 = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=dt)(d3)
            d3 = nn.relu(d3)
            d3 = Conv3D(f0, dtype=dt)(d3)
            d3 = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=dt)(d3)
            d3 = nn.relu(d3)
            # (B, C, H, W, F0) -> (B, H, W, F0*C), channel layout f*C + c
            d2 = d3.transpose(0, 2, 3, 4, 1).reshape(b, hh, ww, f0 * c)

        x = jnp.concatenate([h, d2.astype(h.dtype)], axis=-1)
        x = Conv(self.N, stride=1, dtype=dt)(x)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=dt)(x)
        x = nn.relu(x)
        x = Conv(self.N, stride=1, dtype=dt)(x)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=dt)(x)
        x = nn.relu(x)
        x = Conv(self.C, stride=1, dtype=dt)(x)
        return jax.nn.softmax(x, axis=-1)


def _interp_matrix(n_in: int, n_out: int):
    """1-D align_corners=True linear interpolation matrix (n_out, n_in)."""
    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    fr = pos - lo.astype(jnp.float32)
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, lo].add(1.0 - fr)
    m = m.at[rows, lo + 1].add(fr)
    return m


def _upsample_bilinear_align_corners(d, scale: int):
    """(B, C, h, w, F0) -> (B, C, h*s, w*s, F0), torch UpsamplingBilinear2d
    semantics (align_corners=True)."""
    _, _, hy, wy, _ = d.shape
    # match the input dtype: in bf16 the upsampled volume at scale 8 is
    # ~0.5 GB per batch-16 call — emitting it in f32 (then casting at
    # the next conv anyway) doubles the HBM traffic of this stage
    mh = _interp_matrix(hy, hy * scale).astype(d.dtype)
    mw = _interp_matrix(wy, wy * scale).astype(d.dtype)
    d = jnp.einsum("Oh,bchwf->bcOwf", mh, d,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("Pw,bchwf->bchPf", mw, d,
                      precision=jax.lax.Precision.HIGHEST)


def _upsample_bilinear_ac_2d(x, scale: int):
    """(B, h, w, C) -> (B, h*s, w*s, C), align_corners=True bilinear —
    the disparity-folded twin of _upsample_bilinear_align_corners."""
    _, hy, wy, _ = x.shape
    mh = _interp_matrix(hy, hy * scale).astype(x.dtype)
    mw = _interp_matrix(wy, wy * scale).astype(x.dtype)
    x = jnp.einsum("Oh,bhwc->bOwc", mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("Pw,bhwc->bhPc", mw, x,
                      precision=jax.lax.Precision.HIGHEST)


def dense_warp(h1, cost):
    """Disparity-weighted horizontal shift-accumulate
    (dense_warp, mynet6.py:252-281).

    h1: (B, H, W, N) features (gradient-blocked, like the reference's
    detach); cost: (B, H, W, C) softmax weights over C rightward shifts.
    out[w] = sum_d cost[w, d] * h1[w + d].
    """
    h1 = jax.lax.stop_gradient(h1)
    w_dim = h1.shape[2]
    c = cost.shape[-1]
    # right-pad with zeros so every shift is a full-size static slice:
    # the out-of-range positions contribute exact 0.0 in the same
    # accumulation order as the masked in-place version (bitwise equal),
    # but XLA fuses the C terms into ONE kernel instead of C
    # dynamic-update-slice programs rewriting `out` per shift
    h1p = jnp.pad(h1, ((0, 0), (0, 0), (0, c - 1), (0, 0)))
    out = jnp.zeros_like(h1)
    for d in range(c):
        out = out + cost[:, :, :, d:d + 1] \
            * jax.lax.slice_in_dim(h1p, d, d + w_dim, axis=2)
    return out


class DSIC(nn.Module):
    """The DSIC model (mynet6.py:552-701).  N=128, M=192, F=21, C=32, K=5."""

    N: int = 128
    M: int = 192
    F: int = 21
    C: int = 32
    K: int = 5
    dtype: object = None

    entropy_bottlenecks = ("entropy_bottleneck1", "entropy_bottleneck2")

    def setup(self):
        n, m, f, c, k = self.N, self.M, self.F, self.C, self.K
        d = self.dtype
        self.encoder1 = Encoder1WithTaps(N=n, M=m, dtype=d)
        self.decoder1 = Decoder1WithTaps(N=n, dtype=d)
        # right-eye encoder/decoder stages with skip fusion
        self.pic2_g_a_conv1 = Conv(n, dtype=d)
        self.pic2_g_a_gdn1 = GDN(dtype=d)
        self.pic2_g_a_conv2 = Conv(n, dtype=d)
        self.pic2_g_a_gdn2 = GDN(dtype=d)
        self.pic2_g_a_conv3 = Conv(n, dtype=d)
        self.pic2_g_a_gdn3 = GDN(dtype=d)
        self.pic2_g_a_conv4 = Conv(m, dtype=d)
        self.pic2_g_s_conv1 = Deconv(n, dtype=d)
        self.pic2_g_s_gdn1 = GDN(inverse=True, dtype=d)
        self.pic2_g_s_conv2 = Deconv(n, dtype=d)
        self.pic2_g_s_gdn2 = GDN(inverse=True, dtype=d)
        self.pic2_g_s_conv3 = Deconv(n, dtype=d)
        self.pic2_g_s_gdn3 = GDN(inverse=True, dtype=d)
        self.pic2_g_s_conv4 = Deconv(3, dtype=d)

        self.global_context = GlobalContext(M=m, F=f, C=c, dtype=d)
        self.cost_volume1 = CostVolume(N=n, scale=8, F=f, C=c, dtype=d)
        self.cost_volume2 = CostVolume(N=n, scale=4, F=f, C=c, dtype=d)
        self.cost_volume3 = CostVolume(N=n, scale=2, F=f, C=c, dtype=d)
        self.cost_volume4 = CostVolume(N=n, scale=2, F=f, C=c, dtype=d)
        self.cost_volume5 = CostVolume(N=n, scale=4, F=f, C=c, dtype=d)
        self.cost_volume6 = CostVolume(N=n, scale=8, F=f, C=c, dtype=d)

        self.h_a1 = HyperEncoder(N=n, dtype=d)
        self.h_a2 = HyperEncoder(N=n, dtype=d)
        self.h_s1 = GmmHyperY1(N=n, M=m, K=k, dtype=d)
        self.h_s2 = GmmHyperY2(N=n, M=m, K=k, dtype=d)
        self.entropy_bottleneck1 = EntropyBottleneck(channels=n)
        self.entropy_bottleneck2 = EntropyBottleneck(channels=n)
        self.gaussian1 = GaussianMixtureConditional(K=k)
        self.gaussian2 = GaussianMixtureConditional(K=k)

    def aux_loss(self):
        return self.entropy_bottleneck1.loss() + self.entropy_bottleneck2.loss()

    # ---- codec-facing sub-programs ----

    def analysis1(self, x1):
        return self.encoder1(x1)

    def synthesis1(self, y1_hat):
        return self.decoder1(y1_hat)

    def hyper_analysis1(self, y1):
        return self.h_a1(y1)

    def hyper_analysis2(self, y2):
        return self.h_a2(y2)

    def gmm1(self, z1_hat):
        return self.h_s1(z1_hat)

    def gmm2(self, z2_hat, y1_hat):
        return self.h_s2(z2_hat, y1_hat)

    def contexts(self, y1_hat):
        return self.global_context(y1_hat)

    def analysis2(self, x2, g1_1, g1_2, g1_3, contexts):
        """Right-eye encoder with cost-volume warps of left features."""
        a1 = self.pic2_g_a_gdn1(self.pic2_g_a_conv1(x2))
        cost1 = self.cost_volume1(g1_1, a1, contexts[0])
        warp1 = dense_warp(g1_1, cost1)
        a2 = self.pic2_g_a_gdn2(
            self.pic2_g_a_conv2(jnp.concatenate([warp1, a1], axis=-1)))
        cost2 = self.cost_volume2(g1_2, a2, contexts[1])
        warp2 = dense_warp(g1_2, cost2)
        a3 = self.pic2_g_a_gdn3(
            self.pic2_g_a_conv3(jnp.concatenate([warp2, a2], axis=-1)))
        cost3 = self.cost_volume3(g1_3, a3, contexts[2])
        warp3 = dense_warp(g1_3, cost3)
        y2 = self.pic2_g_a_conv4(jnp.concatenate([warp3, a3], axis=-1))
        return y2.astype(jnp.float32)

    def synthesis2(self, y2_hat, g1_4, g1_5, g1_6, contexts):
        """Right-eye decoder with cost-volume warps of left decoder taps."""
        s1 = self.pic2_g_s_gdn1(self.pic2_g_s_conv1(y2_hat))
        cost4 = self.cost_volume4(g1_4, s1, contexts[2])
        warp4 = dense_warp(g1_4, cost4)
        s2 = self.pic2_g_s_gdn2(
            self.pic2_g_s_conv2(jnp.concatenate([warp4, s1], axis=-1)))
        cost5 = self.cost_volume5(g1_5, s2, contexts[1])
        warp5 = dense_warp(g1_5, cost5)
        s3 = self.pic2_g_s_gdn3(
            self.pic2_g_s_conv3(jnp.concatenate([warp5, s2], axis=-1)))
        cost6 = self.cost_volume6(g1_6, s3, contexts[0])
        warp6 = dense_warp(g1_6, cost6)
        x2 = self.pic2_g_s_conv4(jnp.concatenate([warp6, s3], axis=-1))
        return x2.astype(jnp.float32)

    def __call__(self, x1, x2, training: bool = False):
        y1, g1_1, g1_2, g1_3 = self.encoder1(x1)
        z1 = self.h_a1(y1)
        z1_hat, z1_lik = self.entropy_bottleneck1(z1, training=training)
        gmm1 = self.h_s1(z1_hat)
        y1_hat, y1_lik = self.gaussian1(y1, gmm1[0], gmm1[1], gmm1[2],
                                        training=training)
        x1_hat, g1_4, g1_5, g1_6 = self.decoder1(y1_hat)

        contexts = self.global_context(y1_hat)
        y2 = self.analysis2(x2, g1_1, g1_2, g1_3, contexts)

        z2 = self.h_a2(y2)
        z2_hat, z2_lik = self.entropy_bottleneck2(z2, training=training)
        gmm2 = self.h_s2(z2_hat, y1_hat)  # un-warped prior (mynet6.py:662)
        y2_hat, y2_lik = self.gaussian2(y2, gmm2[0], gmm2[1], gmm2[2],
                                        training=training)

        x2_hat = self.synthesis2(y2_hat, g1_4, g1_5, g1_6, contexts)
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


class EnhancementSelf(nn.Module):
    """Single-view quality enhancement (Enhancement,
    mynet6_plus.py:56-78): the DSIC+ variant drops the cross-view
    concat — conv1 is 3->32 and forward takes ONE reconstruction."""

    @nn.compact
    def __call__(self, x):
        out = conv3x3(32)(x)
        out = EnhancementBlock()(out)
        out = EnhancementBlock()(out)
        out = EnhancementBlock()(out)
        out = conv3x3(3)(out)
        return out + x


class IndependentEnhancementNoWarp(nn.Module):
    """Stage-2 per-eye enhancement without homography or cross-view
    input (Independent_EN, mynet6_plus.py:80-101 — each eye enhances
    independently; the warp/concat lines are commented out in the
    reference)."""

    @nn.compact
    def __call__(self, x1_hat, x2_hat):
        x1_out = EnhancementSelf()(x1_hat)
        x2_out = EnhancementSelf()(x2_hat)
        return {"x1_hat": x1_out, "x2_hat": x2_out}


class DSICPlus(nn.Module):
    """DSIC + enhancement end-to-end (DSIC_plus, mynet6_plus.py:1352-1370)."""

    N: int = 128
    M: int = 192
    F: int = 21
    C: int = 32
    K: int = 5
    dtype: object = None

    entropy_bottlenecks = ("m1/entropy_bottleneck1", "m1/entropy_bottleneck2")

    def setup(self):
        self.m1 = DSIC(N=self.N, M=self.M, F=self.F, C=self.C, K=self.K,
                       dtype=self.dtype)
        self.m2 = IndependentEnhancementNoWarp()

    def aux_loss(self):
        return self.m1.aux_loss()

    def enhance(self, x1_hat, x2_hat):
        """Stage-2 enhancement sub-program (codec applies it post-decode,
        mynet6_plus.py:1365-1368)."""
        return self.m2(x1_hat, x2_hat)

    def __call__(self, x1, x2, training: bool = False):
        out1 = self.m1(x1, x2, training=training)
        out2 = self.m2(out1["x1_hat"], out1["x2_hat"])
        return {
            "x1_hat": out2["x1_hat"],
            "x2_hat": out2["x2_hat"],
            "likelihoods": out1["likelihoods"],
        }
