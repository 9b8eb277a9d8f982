"""Unsupervised deep homography estimation network.

Reference: udh/udh/model.py (copied at ywz/mywork/model.py): a VGG-style
corner-offset regressor on a 2-channel grayscale patch pair, trained with a
photometric L1 loss through a differentiable warp.  NHWC layout.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .homography import get_perspective_transform, warp_perspective


class _VGGBlock(nn.Module):
    features: int
    pool: bool = True
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=1)(x)
        x = nn.relu(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not training)(x)
        x = nn.Conv(self.features, (3, 3), padding=1)(x)
        x = nn.relu(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not training)(x)
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class HomographyNet(nn.Module):
    """Predicts 4 corner offsets (delta) from a stacked grayscale pair.

    Reference: model.py:74-98 (`Net`).  Input a, b: (B, P, P, 1); output
    delta: (B, 4, 2).
    """

    patch_size: int = 128
    batch_norm: bool = False

    @nn.compact
    def __call__(self, a, b, training: bool = False):
        x = jnp.concatenate([a, b], axis=-1)
        x = _VGGBlock(64, batch_norm=self.batch_norm)(x, training)
        x = _VGGBlock(64, batch_norm=self.batch_norm)(x, training)
        x = _VGGBlock(128, batch_norm=self.batch_norm)(x, training)
        x = _VGGBlock(128, pool=False, batch_norm=self.batch_norm)(
            x, training)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(0.5, deterministic=not training)(x)
        x = nn.Dense(1024)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not training)(x)
        x = nn.Dense(8)(x)
        return x.reshape(-1, 4, 2)

    def get_h(self, a, b, corners, training: bool = False):
        """Compose the predicted offsets into an inverse homography.

        Reference: model.py:100-111 — returns H^-1 of the transform mapping
        `corners` to `corners + delta`.
        """
        delta = self(a, b, training)
        corners_hat = corners + delta
        h = get_perspective_transform(corners, corners_hat)
        return jnp.linalg.inv(h)


def photometric_loss(delta, img_a, patch_b, corners):
    """L1(warp(img_a, h^-1), patch_b) with h from corner offsets.

    Reference: model.py:18-45.  The corners are first re-anchored at their
    own top-left corner (large- vs small-motion disambiguation, model.py:24).
    img_a: (B, H, W, C); patch_b: (B, P, P, C); corners/delta: (B, 4, 2).
    """
    corners_hat = corners + delta
    corners = corners - corners[:, 0:1, :]
    h = get_perspective_transform(corners, corners_hat)
    h_inv = jnp.linalg.inv(h)
    patch_b_hat = warp_perspective(
        img_a, h_inv, (patch_b.shape[1], patch_b.shape[2]))
    return jnp.mean(jnp.abs(patch_b_hat - patch_b))
