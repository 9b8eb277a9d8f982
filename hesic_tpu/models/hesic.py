"""HESIC: homography-based deep stereo image compression (CVPR 2021).

Reference: ywz/mywork/newnet1.py.  Left eye is coded standalone with a
GMM-conditioned hyperprior; the right eye is coded conditioned on the
homography-warped left view both in signal space (encoder/decoder fusion)
and in bitrate space (the GMM hyper head sees the re-encoded decoded left
latent — newnet1.py:753-756 — which the decoder can reproduce exactly).

TPU-first notes:
  * NHWC everywhere; the warp is the pure-JAX homography warp.
  * ``spatial_pool2d`` (a per-(b,c) Python max loop in the reference,
    newnet1.py:444-453) is ``jnp.max`` over H, W.
  * GMM weights are softmax-normalized over the K axis after a (K, M)
    reshape — channel index k*M + m, matching the reference slab layout
    (newnet1.py:510-512).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy_models import EntropyBottleneck, GaussianMixtureConditional
from ..geometry import warp_perspective_train
from ..layers import GDN, Conv, Deconv, ResidualBlock, conv3x3
from ..ops import quantize


def spatial_max_pool(x):
    """Global spatial max -> (B, 1, 1, C).  Reference newnet1.py:441-453."""
    return jnp.max(x, axis=(1, 2), keepdims=True)


def softmax_over_mixture(w, K: int):
    """Softmax across the K mixture slabs of an (..., M*K) tensor.

    Channel layout is k*M + m (reference newnet1.py:510-512).
    """
    m = w.shape[-1] // K
    t = w.reshape(w.shape[:-1] + (K, m))
    t = jax.nn.softmax(t, axis=-2)
    return t.reshape(w.shape)


class StereoEncoder(nn.Module):
    """4x (conv s2 + GDN) analysis transform (Encoder1,
    reference newnet1.py:580-601)."""

    N: int = 128
    M: int = 192
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = Conv(self.N, dtype=d)(x)
        x = GDN(dtype=d)(x)
        x = Conv(self.N, dtype=d)(x)
        x = GDN(dtype=d)(x)
        x = Conv(self.N, dtype=d)(x)
        x = GDN(dtype=d)(x)
        return Conv(self.M, dtype=d)(x).astype(jnp.float32)


class StereoDecoder(nn.Module):
    """4x (deconv s2 + IGDN) synthesis transform (Decoder1,
    reference newnet1.py:603-624)."""

    N: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, y_hat):
        d = self.dtype
        x = Deconv(self.N, dtype=d)(y_hat)
        x = GDN(inverse=True, dtype=d)(x)
        x = Deconv(self.N, dtype=d)(x)
        x = GDN(inverse=True, dtype=d)(x)
        x = Deconv(self.N, dtype=d)(x)
        x = GDN(inverse=True, dtype=d)(x)
        return Deconv(3, dtype=d)(x).astype(jnp.float32)


class StereoEncoder2(nn.Module):
    """Right-eye encoder: pre-fuses cat(x1_warp, x2) then the same stack
    (reference newnet1.py:626-655)."""

    N: int = 128
    M: int = 192
    dtype: object = None

    @nn.compact
    def __call__(self, x1_warp, x2):
        d = self.dtype
        x = jnp.concatenate([x1_warp, x2], axis=-1)
        x = Conv(3, stride=1, dtype=d)(x)
        x = GDN(dtype=d)(x)
        x = Conv(self.N, dtype=d)(x)
        x = GDN(dtype=d)(x)
        x = Conv(self.N, dtype=d)(x)
        x = GDN(dtype=d)(x)
        x = Conv(self.N, dtype=d)(x)
        x = GDN(dtype=d)(x)
        return Conv(self.M, dtype=d)(x).astype(jnp.float32)


class StereoDecoder2(nn.Module):
    """Right-eye decoder: standard stack then post-fuses with the warped
    left reconstruction (reference newnet1.py:657-692)."""

    N: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, y_hat, x1_hat_warp):
        d = self.dtype
        x = Deconv(self.N, dtype=d)(y_hat)
        x = GDN(inverse=True, dtype=d)(x)
        x = Deconv(self.N, dtype=d)(x)
        x = GDN(inverse=True, dtype=d)(x)
        x = Deconv(self.N, dtype=d)(x)
        x = GDN(inverse=True, dtype=d)(x)
        x = Deconv(3, dtype=d)(x)
        x = GDN(inverse=True, dtype=d)(x)
        x = jnp.concatenate(
            [x, x1_hat_warp.astype(x.dtype)], axis=-1)
        return Deconv(3, stride=1, dtype=d)(x).astype(jnp.float32)


class HyperEncoder(nn.Module):
    """h_a: abs -> conv s1 -> relu -> conv s2 -> relu -> conv s2
    (encode_hyper, reference newnet1.py:420-437)."""

    N: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, y):
        d = self.dtype
        z = jnp.abs(y)
        z = Conv(self.N, stride=1, dtype=d)(z)
        z = nn.relu(z)
        z = Conv(self.N, dtype=d)(z)
        z = nn.relu(z)
        return Conv(self.N, dtype=d)(z).astype(jnp.float32)


class GmmHyperY1(nn.Module):
    """Left-eye GMM hyper-decoder: three heads from z1_hat
    (gmm_hyper_y1, reference newnet1.py:456-514).

    Heads may compute in a reduced dtype; outputs are cast to f32 before
    the likelihood/PMF math (which must stay f32)."""

    N: int = 128
    M: int = 192
    K: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, z1_hat):
        mk = self.M * self.K
        d = self.dtype
        s = Deconv(self.N, dtype=d)(z1_hat)
        s = nn.relu(s)
        s = Deconv(self.N, dtype=d)(s)
        s = nn.relu(s)
        s = Conv(mk, stride=1, dtype=d)(s)
        sigma = nn.relu(s).astype(jnp.float32)

        m = Deconv(self.N, dtype=d)(z1_hat)
        m = nn.leaky_relu(m)
        m = Deconv(self.N, dtype=d)(m)
        m = nn.leaky_relu(m)
        means = Conv(mk, stride=1, dtype=d)(m).astype(jnp.float32)

        w = Deconv(self.N, dtype=d)(z1_hat)
        w = nn.leaky_relu(w)
        w = Deconv(mk, dtype=d)(w)
        w = spatial_max_pool(w)
        w = nn.leaky_relu(w)
        w = Conv(mk, kernel_size=1, stride=1, dtype=d)(w)
        weights = softmax_over_mixture(w.astype(jnp.float32), self.K)
        return sigma, means, weights


class GmmHyperY2(nn.Module):
    """Right-eye GMM hyper-decoder conditioned on the decoded-left latent:
    cat(upsample4(z2_hat), y1_hat_warpf2) -> three conv heads
    (gmm_hyper_y2, reference newnet1.py:517-577)."""

    N: int = 128
    M: int = 192
    K: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, z2_hat, y1_prior):
        b, h, w, c = z2_hat.shape
        d = self.dtype
        up_z2 = jax.image.resize(z2_hat, (b, h * 4, w * 4, c), "bilinear")
        x = jnp.concatenate([up_z2, y1_prior], axis=-1)
        mk = self.M * self.K

        s = Conv(self.N, stride=1, dtype=d)(x)
        s = nn.relu(s)
        s = Conv(self.N, stride=1, dtype=d)(s)
        s = nn.relu(s)
        s = Conv(mk, stride=1, dtype=d)(s)
        sigma = nn.relu(s).astype(jnp.float32)

        m = Conv(self.N, stride=1, dtype=d)(x)
        m = nn.leaky_relu(m)
        m = Conv(self.N, stride=1, dtype=d)(m)
        m = nn.leaky_relu(m)
        means = Conv(mk, stride=1, dtype=d)(m).astype(jnp.float32)

        w = Conv(self.N, stride=1, dtype=d)(x)
        w = nn.leaky_relu(w)
        w = Conv(mk, stride=1, dtype=d)(w)
        w = spatial_max_pool(w)
        w = nn.leaky_relu(w)
        w = Conv(mk, kernel_size=1, stride=1, dtype=d)(w)
        weights = softmax_over_mixture(w.astype(jnp.float32), self.K)
        return sigma, means, weights


class HESIC(nn.Module):
    """The HSIC model (reference newnet1.py:698-783).  N=128, M=192, K=5."""

    N: int = 128
    M: int = 192
    K: int = 5
    dtype: object = None  # transform compute dtype (e.g. bf16); GMM heads
    # and likelihoods stay f32

    entropy_bottlenecks = ("entropy_bottleneck1", "entropy_bottleneck2")

    def setup(self):
        n, m, k = self.N, self.M, self.K
        d = self.dtype
        self.encoder1 = StereoEncoder(N=n, M=m, dtype=d)
        self.encoder2 = StereoEncoder2(N=n, M=m, dtype=d)
        self.decoder1 = StereoDecoder(N=n, dtype=d)
        self.decoder2 = StereoDecoder2(N=n, dtype=d)
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

    # ---- codec-facing sub-programs (each jittable standalone) ----

    def analysis1(self, x1):
        return self.encoder1(x1)

    def analysis2(self, x1_warp, x2):
        return self.encoder2(x1_warp, x2)

    def synthesis1(self, y1_hat):
        return self.decoder1(y1_hat)

    def synthesis2(self, y2_hat, x1_hat_warp):
        return self.decoder2(y2_hat, x1_hat_warp)

    def hyper_analysis1(self, y1):
        return self.h_a1(y1)

    def hyper_analysis2(self, y2):
        return self.h_a2(y2)

    def gmm1(self, z1_hat):
        return self.h_s1(z1_hat)

    def gmm2(self, z2_hat, y1_prior):
        return self.h_s2(z2_hat, y1_prior)

    def left_prior(self, x1_hat, h_matrix):
        """Re-encode the decoded left view through the warp (decoder-
        reproducible conditioning, reference newnet1.py:753-756).
        Eval-mode quantization (dequantize, no means)."""
        size = (x1_hat.shape[1], x1_hat.shape[2])
        x1_warp_aftercodec = warp_perspective_train(x1_hat, h_matrix,
                                            size, self.dtype)
        y1_warpf2 = self.encoder1(x1_warp_aftercodec)
        return quantize(y1_warpf2, "dequantize")

    def __call__(self, x1, x2, h_matrix, training: bool = False):
        size = (x1.shape[1], x1.shape[2])

        # left eye
        y1 = self.encoder1(x1)
        z1 = self.h_a1(y1)
        z1_hat, z1_lik = self.entropy_bottleneck1(z1, training=training)
        sigma1, means1, weights1 = self.h_s1(z1_hat)
        y1_hat, y1_lik = self.gaussian1(y1, sigma1, means1, weights1,
                                        training=training)
        x1_hat = self.decoder1(y1_hat)

        # right eye, conditioned through the homography warp
        x1_warp = warp_perspective_train(x1, h_matrix, size, self.dtype)
        y2 = self.encoder2(x1_warp, x2)

        # decoder-reproducible cross-eye prior from the decoded left view
        x1_warp_aftercodec = warp_perspective_train(x1_hat, h_matrix,
                                            size, self.dtype)
        y1_warpf2 = self.encoder1(x1_warp_aftercodec)
        if training:
            y1_hat_warpf2 = quantize(y1_warpf2, "noise",
                                     rng=self.make_rng("noise"))
        else:
            y1_hat_warpf2 = quantize(y1_warpf2, "dequantize")

        z2 = self.h_a2(y2)
        z2_hat, z2_lik = self.entropy_bottleneck2(z2, training=training)
        sigma2, means2, weights2 = self.h_s2(z2_hat, y1_hat_warpf2)
        y2_hat, y2_lik = self.gaussian2(y2, sigma2, means2, weights2,
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


class EnhancementBlock(nn.Module):
    """3 residual blocks + skip (reference newnet1.py:272-286)."""

    @nn.compact
    def __call__(self, x):
        out = ResidualBlock(features=32)(x)
        out = ResidualBlock(features=32)(out)
        out = ResidualBlock(features=32)(out)
        return out + x


class Enhancement(nn.Module):
    """Cross-view quality enhancement (reference newnet1.py:288-311)."""

    @nn.compact
    def __call__(self, x, x_other_warp):
        out = jnp.concatenate([x, x_other_warp], axis=-1)
        out = conv3x3(32)(out)
        out = EnhancementBlock()(out)
        out = EnhancementBlock()(out)
        out = EnhancementBlock()(out)
        out = conv3x3(3)(out)
        return out + x


class IndependentEnhancement(nn.Module):
    """Stage-2 cross-enhancement of both reconstructions
    (Independent_EN, reference newnet1.py:1278-1300)."""

    dtype: object = None

    @nn.compact
    def __call__(self, x1_hat, x2_hat, h_matrix):
        size1 = (x1_hat.shape[1], x1_hat.shape[2])
        x1_hat_warp = warp_perspective_train(x1_hat, h_matrix, size1,
                                             self.dtype)
        h_inv = jnp.linalg.inv(h_matrix)
        x2_hat_warp = warp_perspective_train(x2_hat, h_inv, size1,
                                             self.dtype)
        x1_out = Enhancement()(x1_hat, x2_hat_warp)
        x2_out = Enhancement()(x2_hat, x1_hat_warp)
        return {"x1_hat": x1_out, "x2_hat": x2_out}


class HESICTogether(nn.Module):
    """HESIC + enhancement end-to-end (GMM_together,
    reference newnet1.py:1304-1321)."""

    N: int = 128
    M: int = 192
    K: int = 5

    entropy_bottlenecks = ("m1/entropy_bottleneck1", "m1/entropy_bottleneck2")

    def setup(self):
        self.m1 = HESIC(N=self.N, M=self.M, K=self.K)
        self.m2 = IndependentEnhancement()

    def aux_loss(self):
        return self.m1.aux_loss()

    def enhance(self, x1_hat, x2_hat, h_matrix):
        """Stage-2 enhancement sub-program (codec applies it post-decode,
        reference newnet1.py:1316-1319)."""
        return self.m2(x1_hat, x2_hat, h_matrix)

    def __call__(self, x1, x2, h_matrix, training: bool = False):
        out1 = self.m1(x1, x2, h_matrix, training=training)
        out2 = self.m2(out1["x1_hat"], out1["x2_hat"], h_matrix)
        return {
            "x1_hat": out2["x1_hat"],
            "x2_hat": out2["x2_hat"],
            "likelihoods": out1["likelihoods"],
        }
