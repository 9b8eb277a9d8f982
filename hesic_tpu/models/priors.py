"""Single-image prior models (CompressAI core family), NHWC.

Reference: compressai/models/priors.py.  Flax modules hold the pure compute
(forward / analysis / synthesis / hyper transforms); the paired host-side
codec classes in codec.py own integer CDF tables and run the real coder.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..entropy_models import EntropyBottleneck, GaussianConditional
from ..layers import GDN, Conv, Deconv, MaskedConv2d
from ..ops import quantize


class FactorizedPrior(nn.Module):
    """bmshj2018-factorized (reference models/priors.py:105-177)."""

    N: int = 128
    M: int = 192

    # codec wiring metadata
    entropy_bottlenecks = ("entropy_bottleneck",)

    def setup(self):
        n, m = self.N, self.M
        self.g_a = [Conv(n), GDN(), Conv(n), GDN(), Conv(n), GDN(), Conv(m)]
        self.g_s = [Deconv(n), GDN(inverse=True), Deconv(n),
                    GDN(inverse=True), Deconv(n), GDN(inverse=True),
                    Deconv(3)]
        self.entropy_bottleneck = EntropyBottleneck(channels=m)

    def analysis(self, x):
        for layer in self.g_a:
            x = layer(x)
        return x

    def synthesis(self, y_hat):
        for layer in self.g_s:
            y_hat = layer(y_hat)
        return y_hat

    def aux_loss(self):
        return self.entropy_bottleneck.loss()

    def eb_medians(self):
        return {"entropy_bottleneck": self.entropy_bottleneck.medians()}

    def __call__(self, x, training: bool = False):
        y = self.analysis(x)
        y_hat, y_likelihoods = self.entropy_bottleneck(y, training=training)
        x_hat = self.synthesis(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}


class ScaleHyperprior(nn.Module):
    """bmshj2018-hyperprior (reference models/priors.py:190-308)."""

    N: int = 128
    M: int = 192

    entropy_bottlenecks = ("entropy_bottleneck",)
    gaussian_conditionals = ("gaussian_conditional",)

    def setup(self):
        n, m = self.N, self.M
        self.g_a = [Conv(n), GDN(), Conv(n), GDN(), Conv(n), GDN(), Conv(m)]
        self.g_s = [Deconv(n), GDN(inverse=True), Deconv(n),
                    GDN(inverse=True), Deconv(n), GDN(inverse=True),
                    Deconv(3)]
        self.h_a = [Conv(n, kernel_size=3, stride=1), nn.relu, Conv(n),
                    nn.relu, Conv(n)]
        self.h_s = [Deconv(n), nn.relu, Deconv(n), nn.relu,
                    Conv(m, kernel_size=3, stride=1), nn.relu]
        self.entropy_bottleneck = EntropyBottleneck(channels=n)
        self.gaussian_conditional = GaussianConditional()

    def analysis(self, x):
        for layer in self.g_a:
            x = layer(x)
        return x

    def synthesis(self, y_hat):
        for layer in self.g_s:
            y_hat = layer(y_hat)
        return y_hat

    def hyper_analysis(self, y):
        z = jnp.abs(y)
        for layer in self.h_a:
            z = layer(z)
        return z

    def hyper_synthesis(self, z_hat):
        for layer in self.h_s:
            z_hat = layer(z_hat)
        return z_hat

    def aux_loss(self):
        return self.entropy_bottleneck.loss()

    def eb_medians(self):
        return {"entropy_bottleneck": self.entropy_bottleneck.medians()}

    def __call__(self, x, training: bool = False):
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training)
        scales_hat = self.hyper_synthesis(z_hat)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, training=training)
        x_hat = self.synthesis(y_hat)
        return {"x_hat": x_hat,
                "likelihoods": {"y": y_likelihoods, "z": z_likelihoods}}


class MeanScaleHyperprior(ScaleHyperprior):
    """mbt2018-mean (reference models/priors.py:311-385)."""

    def setup(self):
        n, m = self.N, self.M
        self.g_a = [Conv(n), GDN(), Conv(n), GDN(), Conv(n), GDN(), Conv(m)]
        self.g_s = [Deconv(n), GDN(inverse=True), Deconv(n),
                    GDN(inverse=True), Deconv(n), GDN(inverse=True),
                    Deconv(3)]
        self.h_a = [Conv(n, kernel_size=3, stride=1), nn.leaky_relu,
                    Conv(n), nn.leaky_relu, Conv(n)]
        self.h_s = [Deconv(m), nn.leaky_relu, Deconv(m * 3 // 2),
                    nn.leaky_relu, Conv(m * 2, kernel_size=3, stride=1)]
        self.entropy_bottleneck = EntropyBottleneck(channels=n)
        self.gaussian_conditional = GaussianConditional()

    def hyper_analysis(self, y):
        z = y  # no abs (reference :341-344)
        for layer in self.h_a:
            z = layer(z)
        return z

    def __call__(self, x, training: bool = False):
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training)
        gaussian_params = self.hyper_synthesis(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means=means_hat, training=training)
        x_hat = self.synthesis(y_hat)
        return {"x_hat": x_hat,
                "likelihoods": {"y": y_likelihoods, "z": z_likelihoods}}


class JointAutoregressiveHierarchicalPriors(nn.Module):
    """mbt2018 (reference models/priors.py:388-630).

    Training forward runs the masked context conv over the full latent in
    one shot (parallel).  The sequential real codec lives in
    codec.py / autoregressive.py (device scan for encode, row-pipelined
    decode) instead of the reference's per-pixel Python loop (:519).
    """

    N: int = 192
    M: int = 192

    entropy_bottlenecks = ("entropy_bottleneck",)
    gaussian_conditionals = ("gaussian_conditional",)

    def setup(self):
        n, m = self.N, self.M
        self.g_a = [Conv(n), GDN(), Conv(n), GDN(), Conv(n), GDN(), Conv(m)]
        self.g_s = [Deconv(n), GDN(inverse=True), Deconv(n),
                    GDN(inverse=True), Deconv(n), GDN(inverse=True),
                    Deconv(3)]
        self.h_a = [Conv(n, kernel_size=3, stride=1), nn.leaky_relu,
                    Conv(n), nn.leaky_relu, Conv(n)]
        self.h_s = [Deconv(m), nn.leaky_relu, Deconv(m * 3 // 2),
                    nn.leaky_relu, Conv(m * 2, kernel_size=3, stride=1)]
        self.entropy_parameters = [
            Conv(m * 10 // 3, kernel_size=1, stride=1), nn.leaky_relu,
            Conv(m * 8 // 3, kernel_size=1, stride=1), nn.leaky_relu,
            Conv(m * 6 // 3, kernel_size=1, stride=1)]
        self.context_prediction = MaskedConv2d(features=2 * m, kernel_size=5,
                                               mask_type="A")
        self.entropy_bottleneck = EntropyBottleneck(channels=n)
        self.gaussian_conditional = GaussianConditional()

    def analysis(self, x):
        for layer in self.g_a:
            x = layer(x)
        return x

    def synthesis(self, y_hat):
        for layer in self.g_s:
            y_hat = layer(y_hat)
        return y_hat

    def hyper_analysis(self, y):
        z = y
        for layer in self.h_a:
            z = layer(z)
        return z

    def hyper_synthesis(self, z_hat):
        for layer in self.h_s:
            z_hat = layer(z_hat)
        return z_hat

    def entropy_params(self, params_and_ctx):
        x = params_and_ctx
        for layer in self.entropy_parameters:
            x = layer(x)
        return x

    def context(self, y_hat):
        return self.context_prediction(y_hat)

    def aux_loss(self):
        return self.entropy_bottleneck.loss()

    def eb_medians(self):
        return {"entropy_bottleneck": self.entropy_bottleneck.medians()}

    def __call__(self, x, training: bool = False):
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training)
        params = self.hyper_synthesis(z_hat)

        if training:
            y_hat = quantize(y, "noise", rng=self.make_rng("noise"))
        else:
            y_hat = quantize(y, "dequantize")
        ctx_params = self.context_prediction(y_hat)
        gaussian_params = self.entropy_params(
            jnp.concatenate([params, ctx_params], axis=-1))
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        _, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means=means_hat, training=training)
        x_hat = self.synthesis(y_hat)
        return {"x_hat": x_hat,
                "likelihoods": {"y": y_likelihoods, "z": z_likelihoods}}
