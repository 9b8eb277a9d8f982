"""Real-coder compress/decompress flows for the prior model families.

Reference flows: models/priors.py compress/decompress methods
(:168-177, :289-308, :360-385, :490-612).  Device work (transforms,
index building) is jitted and batched; only symbol arrays cross to the
host coder, once per tensor.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..entropy_models import build_indexes
from .autoregressive import ar_compress, ar_decompress
from .base import CompressionModel


class FactorizedPriorCodec(CompressionModel):
    """Codec flow for FactorizedPrior (reference priors.py:168-177)."""

    def compress(self, x):
        y = self.jit("analysis")(x)
        y_strings = self.eb_compress("entropy_bottleneck", y)
        return {"strings": [y_strings], "shape": tuple(y.shape[1:3])}

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 1
        y_hat = self.eb_decompress("entropy_bottleneck", strings[0], shape)
        x_hat = jnp.clip(self.jit("synthesis")(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}


class ScaleHyperpriorCodec(CompressionModel):
    """Codec flow for ScaleHyperprior (reference priors.py:289-308)."""

    def _analysis_pair(self, x):
        y = self.jit("analysis")(x)
        z = self.jit("hyper_analysis")(y)
        return y, z

    def compress(self, x):
        y, z = self._analysis_pair(x)
        z_strings = self.eb_compress("entropy_bottleneck", z)
        # the encoder runs the decoder so both sides derive identical indexes
        z_hat = self.eb_decompress("entropy_bottleneck", z_strings,
                                   z.shape[1:3])
        scales_hat = self.jit("hyper_synthesis")(z_hat)
        indexes = build_indexes(scales_hat, self.scale_table)
        y_strings = self.gc_compress("gaussian_conditional", y, indexes)
        return {"strings": [y_strings, z_strings],
                "shape": tuple(z.shape[1:3])}

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 2
        z_hat = self.eb_decompress("entropy_bottleneck", strings[1], shape)
        scales_hat = self.jit("hyper_synthesis")(z_hat)
        indexes = build_indexes(scales_hat, self.scale_table)
        y_hat = self.gc_decompress("gaussian_conditional", strings[0],
                                   indexes)
        x_hat = jnp.clip(self.jit("synthesis")(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}


class MeanScaleHyperpriorCodec(ScaleHyperpriorCodec):
    """Codec flow for MeanScaleHyperprior (reference priors.py:360-385)."""

    def compress(self, x):
        y, z = self._analysis_pair(x)
        z_strings = self.eb_compress("entropy_bottleneck", z)
        z_hat = self.eb_decompress("entropy_bottleneck", z_strings,
                                   z.shape[1:3])
        gaussian_params = self.jit("hyper_synthesis")(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        indexes = build_indexes(scales_hat, self.scale_table)
        y_strings = self.gc_compress("gaussian_conditional", y, indexes,
                                     means=means_hat)
        return {"strings": [y_strings, z_strings],
                "shape": tuple(z.shape[1:3])}

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 2
        z_hat = self.eb_decompress("entropy_bottleneck", strings[1], shape)
        gaussian_params = self.jit("hyper_synthesis")(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        indexes = build_indexes(scales_hat, self.scale_table)
        y_hat = self.gc_decompress("gaussian_conditional", strings[0],
                                   indexes, means=means_hat)
        x_hat = jnp.clip(self.jit("synthesis")(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}


class JointAutoregressiveCodec(CompressionModel):
    """Codec flow for mbt2018/cheng2020 (reference priors.py:490-612).

    Encode runs the raster-causal recursion as a single on-device
    ``lax.scan`` (no Python loop, one host transfer); decode is
    row-pipelined: the device computes the row's "upper" context in one
    masked conv, the host runs the short left-context recursion + rANS.
    """

    def compress(self, x):
        y = self.jit("analysis")(x)
        z = self.jit("hyper_analysis")(y)
        z_strings = self.eb_compress("entropy_bottleneck", z)
        z_hat = self.eb_decompress("entropy_bottleneck", z_strings,
                                   z.shape[1:3])
        params = self.jit("hyper_synthesis")(z_hat)
        y_strings, _ = ar_compress(self, y, params)
        return {"strings": [y_strings, z_strings],
                "shape": tuple(z.shape[1:3])}

    def decompress(self, strings, shape):
        assert isinstance(strings, list) and len(strings) == 2
        z_hat = self.eb_decompress("entropy_bottleneck", strings[1], shape)
        params = self.jit("hyper_synthesis")(z_hat)
        y_hat = ar_decompress(self, strings[0], params)
        x_hat = jnp.clip(self.jit("synthesis")(y_hat), 0.0, 1.0)
        return {"x_hat": x_hat}
