"""Image quality metrics in pure JAX (PSNR, SSIM, MS-SSIM).

Replaces the reference's pytorch_msssim dependency (test3real.py:107-109)
and the eval_model metric helpers (utils/eval_model/__main__.py:40-52).
MS-SSIM follows Wang et al. 2003: 5 scales, gaussian window 11, sigma 1.5,
standard weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, max_val: float = 1.0):
    """Peak signal-to-noise ratio over the full tensors."""
    mse = jnp.mean((jnp.asarray(a, jnp.float32)
                    - jnp.asarray(b, jnp.float32)) ** 2)
    return 10 * jnp.log10(max_val ** 2 / mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _filter2d_separable(img, window):
    """Depthwise separable gaussian filter, NHWC, valid padding."""
    c = img.shape[-1]
    kh = window.reshape(-1, 1, 1, 1)
    kh = jnp.tile(kh, (1, 1, 1, c))
    kw = window.reshape(1, -1, 1, 1)
    kw = jnp.tile(kw, (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        img, kh, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        out, kw, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _ssim_components(x, y, max_val: float = 1.0, win_size: int = 11,
                     sigma: float = 1.5):
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    w = _gaussian_window(win_size, sigma)
    mu_x = _filter2d_separable(x, w)
    mu_y = _filter2d_separable(y, w)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_separable(x * x, w) - mu_xx
    sigma_yy = _filter2d_separable(y * y, w) - mu_yy
    sigma_xy = _filter2d_separable(x * y, w) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return jnp.mean(ssim_map), jnp.mean(cs)


def ssim(x, y, max_val: float = 1.0):
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    return _ssim_components(x, y, max_val)[0]


def ms_ssim(x, y, max_val: float = 1.0):
    """Multi-scale SSIM (up to 5 scales, standard weights).

    For small inputs the scale count shrinks so every scale still fits the
    11-tap window; the used weights are renormalized to sum to one.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    min_dim = min(x.shape[1], x.shape[2])
    levels = 1
    while levels < len(_MSSSIM_WEIGHTS) and (min_dim >> levels) >= 11:
        levels += 1
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / jnp.sum(weights)
    values = []
    for i in range(levels):
        s, cs = _ssim_components(x, y, max_val)
        values.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
    values = jnp.stack(values)
    values = jnp.clip(values, 1e-6, None)  # guard against negatives
    return jnp.prod(values ** weights)


def np_psnr(a, b, max_val: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(max_val ** 2 / mse)
