"""Entropy models (Flax, NHWC, float32 likelihood numerics).

Reference semantics: compressai/entropy_models/entropy_models.py.
Differences by design (TPU-first):
  * ``_logits_cumulative`` is one batched einsum chain over all channels
    (the reference's per-channel K-layer matmul loop, :350-369, maps to a
    single (C, f_out, f_in) x (C, f_in, N) contraction — MXU-friendly).
  * Noise quantization draws from an explicit PRNG stream ('noise').
  * Likelihoods are always computed in float32: erfc near tail_mass=1e-9
    underflows in bfloat16.
  * CDF table construction for the host coder lives in codec.py and runs
    the exact integer quantizer from hesic_tpu.codecs (bit-exact contract).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import lower_bound, quantize

# From Balle's tensorflow compression examples
# (reference models/priors.py:181-187)
SCALES_MIN = 0.11
SCALES_MAX = 256
SCALES_LEVELS = 64


def get_scale_table(minimum=SCALES_MIN, maximum=SCALES_MAX,
                    levels=SCALES_LEVELS) -> np.ndarray:
    return np.exp(np.linspace(math.log(minimum), math.log(maximum), levels))


def standardized_cumulative(x):
    """0.5 * erfc(-x / sqrt(2)) — numerically robust standard normal CDF.

    Reference: entropy_models.py:484-489.
    """
    const = -(2 ** -0.5)
    return 0.5 * jax.lax.erfc(const * jnp.asarray(x, jnp.float32))


def standardized_quantile(quantile: float) -> float:
    """Inverse standard normal CDF for a scalar (host-side, float64).

    Solves 0.5*erfc(-x/sqrt(2)) = q with Newton iterations; avoids a scipy
    dependency and matches scipy.stats.norm.ppf to ~1e-12 for the tail
    probabilities used here.
    """
    import numpy as _np

    q = float(quantile)
    if not 0.0 < q < 1.0:
        raise ValueError("quantile must be in (0, 1)")
    # initial guess via Peter Acklam's rational approximation
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    p_low = 0.02425
    if q < p_low:
        u = _np.sqrt(-2 * _np.log(q))
        x = (((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4]) * u
             + c[5]) / ((((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1)
    elif q > 1 - p_low:
        u = _np.sqrt(-2 * _np.log(1 - q))
        x = -(((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4]) * u
              + c[5]) / ((((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1)
    else:
        u = q - 0.5
        t = u * u
        x = (((((a[0] * t + a[1]) * t + a[2]) * t + a[3]) * t + a[4]) * t
             + a[5]) * u / (((((b[0] * t + b[1]) * t + b[2]) * t + b[3]) * t
                             + b[4]) * t + 1)
    # two Newton steps on Phi(x) - q
    from math import erfc, exp, pi, sqrt
    for _ in range(3):
        phi = 0.5 * erfc(-x / sqrt(2))
        pdf = exp(-0.5 * x * x) / sqrt(2 * pi)
        x -= (phi - q) / pdf
    return float(x)


class EntropyBottleneck(nn.Module):
    """Fully-factorized learned prior (Balle et al. 2018, appendix 6.1).

    Reference: entropy_models.py:242-430.  The per-channel univariate CDF is
    a K-layer monotone MLP; all channels evaluate as one batched contraction.
    Input/output layout is NHWC.
    """

    channels: int
    tail_mass: float = 1e-9
    init_scale: float = 10.0
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    likelihood_bound: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        c = self.channels

        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_v = math.log(math.expm1(1 / scale / dims[i + 1]))
            matrices.append(self.param(
                f"matrix_{i}",
                lambda key, shape, v=init_v: jnp.full(shape, v, jnp.float32),
                (c, dims[i + 1], dims[i])))
            biases.append(self.param(
                f"bias_{i}",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -0.5, 0.5),
                (c, dims[i + 1], 1)))
            if i < len(self.filters):
                factors.append(self.param(
                    f"factor_{i}", nn.initializers.zeros,
                    (c, dims[i + 1], 1), jnp.float32))
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        self.quantiles = self.param(
            "quantiles",
            lambda key, shape: jnp.tile(
                jnp.array([[-self.init_scale, 0.0, self.init_scale]],
                          jnp.float32), (c, 1, 1)),
            (c, 1, 3))

    @property
    def target(self):
        t = math.log(2 / self.tail_mass - 1)
        return jnp.array([-t, 0.0, t], jnp.float32)

    def medians(self):
        return self.quantiles[:, :, 1:2]

    def _logits_cumulative(self, x, stop_gradient: bool):
        """x: (C, 1, N) -> logits of the cumulative at x, same shape."""
        logits = jnp.asarray(x, jnp.float32)
        for i in range(len(self.filters) + 1):
            m = self._matrices[i]
            b = self._biases[i]
            if stop_gradient:
                m = jax.lax.stop_gradient(m)
                b = jax.lax.stop_gradient(b)
            logits = jnp.einsum("cof,cfn->con", jax.nn.softplus(m), logits)
            logits = logits + b
            if i < len(self._factors):
                f = self._factors[i]
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
                logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def _likelihood(self, x):
        lower = self._logits_cumulative(x - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(x + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(jax.nn.sigmoid(sign * upper)
                       - jax.nn.sigmoid(sign * lower))

    def loss(self):
        """Auxiliary loss pushing the quantiles to the tail-mass targets."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        return jnp.sum(jnp.abs(logits - self.target))

    def __call__(self, x, training: bool = False):
        """x: (B, H, W, C) -> (x_hat, likelihoods), both same shape."""
        b, h, w, c = x.shape
        values = x.transpose(3, 1, 2, 0).reshape(c, 1, -1)

        if training:
            values = quantize(values, "noise", rng=self.make_rng("noise"))
        else:
            values = quantize(values, "dequantize", means=self.medians())

        likelihood = self._likelihood(values)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(likelihood, self.likelihood_bound)

        outputs = values.reshape(c, h, w, b).transpose(3, 1, 2, 0)
        likelihood = likelihood.reshape(c, h, w, b).transpose(3, 1, 2, 0)
        return outputs, likelihood

    # ---- host-side helpers for CDF-table construction (codec.py) ----

    def pmf_data(self):
        """Return (pmf, tail_mass, pmf_length, offset) for table building.

        Run un-jitted via ``module.apply(..., method='pmf_data')`` after
        training; shapes depend on the learned quantiles.
        Reference: entropy_models.py:302-343.
        """
        medians = self.quantiles[:, 0, 1]
        minima = jnp.clip(jnp.ceil(medians - self.quantiles[:, 0, 0]), 0,
                          None).astype(jnp.int32)
        maxima = jnp.clip(jnp.ceil(self.quantiles[:, 0, 2] - medians), 0,
                          None).astype(jnp.int32)
        pmf_start = medians - minima
        pmf_length = maxima + minima + 1
        max_length = int(jnp.max(pmf_length))

        samples = jnp.arange(max_length, dtype=jnp.float32)
        samples = samples[None, :] + pmf_start[:, None, None]

        lower = self._logits_cumulative(samples - 0.5, stop_gradient=True)
        upper = self._logits_cumulative(samples + 0.5, stop_gradient=True)
        sign = -jnp.sign(lower + upper)
        pmf = jnp.abs(jax.nn.sigmoid(sign * upper)
                      - jax.nn.sigmoid(sign * lower))
        pmf = pmf[:, 0, :]
        tail_mass = (jax.nn.sigmoid(lower[:, 0, 0])
                     + jax.nn.sigmoid(-upper[:, 0, -1]))
        return pmf, tail_mass, pmf_length, -minima


class GaussianConditional(nn.Module):
    """Scale-(and mean-)conditioned Gaussian entropy model.

    Reference: entropy_models.py:433-562.  Parameter-free; the scale table
    used by the real coder lives in the codec wrapper.
    """

    scale_bound: float = 0.11
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def _likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = lower_bound(jnp.asarray(scales, jnp.float32),
                             self.scale_bound)
        values = jnp.abs(jnp.asarray(values, jnp.float32))
        upper = standardized_cumulative((0.5 - values) / scales)
        lower = standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def __call__(self, inputs, scales, means=None, training: bool = False):
        if training:
            outputs = quantize(inputs, "noise", rng=self.make_rng("noise"))
        else:
            outputs = quantize(inputs, "dequantize", means=means)
        likelihood = self._likelihood(outputs, scales, means)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(likelihood, self.likelihood_bound)
        return outputs, likelihood


def build_indexes(scales, scale_table, scale_bound=SCALES_MIN):
    """Map each scale to its scale-table bucket.

    Vectorized form of the reference threshold-count loop
    (entropy_models.py:556-562): index = #{s in table[:-1] : scale > s}.
    Works on jnp or np arrays.
    """
    table = jnp.asarray(scale_table, jnp.float32)
    scales = lower_bound(jnp.asarray(scales, jnp.float32), scale_bound)
    return jnp.sum(scales[..., None] > table[:-1], axis=-1).astype(jnp.int32)


def gaussian_pmf_data(scale_table, tail_mass=1e-9):
    """Per-scale PMFs over [-center, center] for CDF-table construction.

    Reference: entropy_models.py:504-526.  Returns numpy arrays
    (pmf (L, max_len), tail (L,), pmf_length (L,), offset (L,)).
    """
    scale_table = np.asarray(scale_table, np.float64)
    multiplier = -standardized_quantile(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(np.arange(max_length, dtype=np.int32)
                     - pmf_center[:, None]).astype(np.float32)
    scales = scale_table[:, None].astype(np.float32)
    upper = np.asarray(
        standardized_cumulative((0.5 - samples) / scales))
    lower = np.asarray(
        standardized_cumulative((-0.5 - samples) / scales))
    pmf = upper - lower
    tail = 2 * lower[:, 0]
    return pmf, tail, pmf_length, -pmf_center


class GaussianMixtureConditional(nn.Module):
    """K-component Gaussian-mixture conditional (HESIC's entropy model).

    Reference: entropy_models.py:566-710.  scales/means/weights carry M*K
    channels (K slabs of M); quantization ignores the means
    (entropy_models.py:695-697 — behavioral quirk preserved).
    NHWC: channel slabs are the trailing axis.
    """

    K: int = 5
    scale_bound: float = 0.11
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def _likelihood(self, inputs, scales, means, weights):
        m = inputs.shape[-1]
        x = jnp.asarray(inputs, jnp.float32)[..., None]  # (..., M, 1)

        def slab(t):
            # (..., M*K) -> (..., M, K)
            return jnp.stack(
                [t[..., k * m:(k + 1) * m] for k in range(self.K)], axis=-1
            ).astype(jnp.float32)

        mu = slab(means)
        sc = lower_bound(slab(scales), self.scale_bound)
        w = slab(weights)
        values = jnp.abs(x - mu)
        upper = standardized_cumulative((0.5 - values) / sc)
        lower = standardized_cumulative((-0.5 - values) / sc)
        return jnp.sum((upper - lower) * w, axis=-1)

    def __call__(self, inputs, scales, means, weights,
                 training: bool = False):
        if training:
            outputs = quantize(inputs, "noise", rng=self.make_rng("noise"))
        else:
            outputs = quantize(inputs, "dequantize", means=None)
        likelihood = self._likelihood(outputs, scales, means, weights)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(likelihood, self.likelihood_bound)
        return outputs, likelihood


def gmm_pmf(samples, scales, means, weights, K: int,
            scale_bound: float = 0.11):
    """Evaluate the mixture PMF on a symbol grid, fully batched.

    samples: (S,) symbol grid (already shifted by +minmax as the codec does)
    scales/means/weights: (..., M*K) NHWC parameter maps
    returns pmf: (..., M, S)

    One einsum-style tensor op replacing the reference's per-channel /
    per-component Python loops (newnet1.py:924-983).
    """
    m = scales.shape[-1] // K
    s = jnp.asarray(samples, jnp.float32)  # (S,)

    def slab(t):
        return jnp.stack(
            [t[..., k * m:(k + 1) * m] for k in range(K)], axis=-1
        ).astype(jnp.float32)  # (..., M, K)

    mu = slab(means)[..., None]          # (..., M, K, 1)
    sc = lower_bound(slab(scales), scale_bound)[..., None]
    w = slab(weights)[..., None]
    values = jnp.abs(s - mu)             # (..., M, K, S)
    upper = standardized_cumulative((0.5 - values) / sc)
    lower = standardized_cumulative((-0.5 - values) / sc)
    return jnp.sum((upper - lower) * w, axis=-2)  # (..., M, S)


def gmm_pmf_edges(samples, scales, means, weights, K: int,
                  scale_bound: float = 0.11):
    """Mixture PMF on a symbol grid via CDF edge differences.

    Same result as :func:`gmm_pmf` up to f32 rounding, at HALF the erfc
    count: consecutive bins share their CDF edge, so S+1 cumulative
    evaluations replace 2*S (the erfc is the dominant transcendental in
    the codec's device profile).  Used by the fast codec, where encoder
    and decoder share one compiled program so the exact rounding is
    consistent by construction.
    """
    m = scales.shape[-1] // K
    s = jnp.asarray(samples, jnp.float32)
    edges = jnp.concatenate([s - 0.5, s[-1:] + 0.5])  # (S+1,)

    def slab(t):
        return jnp.stack(
            [t[..., k * m:(k + 1) * m] for k in range(K)], axis=-1
        ).astype(jnp.float32)  # (..., M, K)

    mu = slab(means)[..., None]          # (..., M, K, 1)
    sc = lower_bound(slab(scales), scale_bound)[..., None]
    w = slab(weights)[..., None]
    cdf = standardized_cumulative((edges - mu) / sc)  # (..., M, K, S+1)
    pmf = cdf[..., 1:] - cdf[..., :-1]
    return jnp.sum(pmf * w, axis=-2)     # (..., M, S)
