"""Rate-distortion losses.

Reference: examples/train.py:69-87 (single image) and
ywz/mywork/newtrain1.py:37-56 (stereo: MSE summed over both eyes, bpp over
all four likelihood streams, normalized by B*H*W — NOT 2*B*H*W; eval-time
reporting divides by 2, newtrain1.py:142-145).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG2 = math.log(2)


def bits(likelihoods) -> jnp.ndarray:
    """Total information content of a likelihood tensor, in bits."""
    return jnp.sum(-jnp.log(likelihoods.astype(jnp.float32))) / _LOG2


def rate_distortion_loss(output, target, lmbda: float = 1e-2):
    """Single-image RD loss: lambda * 255^2 * MSE + bpp."""
    b, h, w, _ = target.shape
    num_pixels = b * h * w
    bpp = sum(bits(lik) for lik in output["likelihoods"].values()) \
        / num_pixels
    mse = jnp.mean((output["x_hat"] - target) ** 2)
    loss = lmbda * 255 ** 2 * mse + bpp
    return {"loss": loss, "mse_loss": mse, "bpp_loss": bpp}


def stereo_rate_distortion_loss(output, target1, target2,
                                lmbda: float = 1e-2):
    """Stereo RD loss, matching the reference normalization quirks."""
    b, h, w, _ = target1.shape
    num_pixels = b * h * w
    bpp = sum(bits(lik) for lik in output["likelihoods"].values()) \
        / num_pixels
    mse = (jnp.mean((output["x1_hat"] - target1) ** 2)
           + jnp.mean((output["x2_hat"] - target2) ** 2))
    loss = lmbda * 255 ** 2 * mse + bpp
    return {"loss": loss, "mse_loss": mse, "bpp_loss": bpp}


def mse2psnr(mse) -> jnp.ndarray:
    """PSNR for inputs in [0, 1] (reference test3real.py:69-79)."""
    return 10 * jnp.log10(1.0 / mse)


def msssim_db(ms) -> jnp.ndarray:
    """-10 log10(1 - MS-SSIM), the dB axis used in the paper plots."""
    return -10 * jnp.log10(1.0 - ms)
