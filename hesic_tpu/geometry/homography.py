"""Planar homography ops in pure JAX (replaces kornia in the reference).

Reference usage: kornia.get_perspective_transform (4-point DLT solve) and
kornia.warp_perspective (inverse warp + bilinear sampling), e.g.
ywz/mywork/newnet1.py:746,753,767 and ywz/mywork/model.py:26-30.

Conventions: pixel coordinates (x=column, y=row), homogeneous 3x3 matrices
acting on (x, y, 1); ``warp_perspective(src, M)`` produces
``dst(x) = src(M^-1 x)`` with bilinear sampling and zero padding — the same
contract kornia implements.  Everything is batched, jittable, and
differentiable (the warp backprops through both the image and the matrix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_perspective_transform(src, dst):
    """DLT solve for the homography mapping 4 src points to 4 dst points.

    src, dst: (B, 4, 2) pixel coordinates.
    Returns (B, 3, 3) with H[2,2] = 1.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    b = src.shape[0]
    x, y = src[..., 0], src[..., 1]          # (B, 4)
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # rows for u equations: [x y 1 0 0 0 -ux -uy]
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y],
                   axis=-1)  # (B, 4, 8)
    # rows for v equations: [0 0 0 x y 1 -vx -vy]
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y],
                   axis=-1)
    a = jnp.concatenate([ax, ay], axis=1)     # (B, 8, 8)
    rhs = jnp.concatenate([u, v], axis=1)[..., None]  # (B, 8, 1)
    h8 = jnp.linalg.solve(a, rhs)[..., 0]     # (B, 8)
    h = jnp.concatenate([h8, jnp.ones((b, 1), jnp.float32)], axis=-1)
    return h.reshape(b, 3, 3)


def _bilinear_sample(img, xs, ys):
    """Sample one NHWC image at float pixel coords with zero padding.

    img: (H, W, C); xs, ys: (Ho, Wo).  Returns (Ho, Wo, C).
    """
    h, w, _ = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = xs - x0
    wy1 = ys - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yc, xc):
        valid = ((xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1))
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        vals = img[yi, xi]  # (Ho, Wo, C)
        return vals * valid[..., None]

    out = (gather(y0, x0) * (wy0 * wx0)[..., None]
           + gather(y0, x1) * (wy0 * wx1)[..., None]
           + gather(y1, x0) * (wy1 * wx0)[..., None]
           + gather(y1, x1) * (wy1 * wx1)[..., None])
    return out


def warp_perspective(src, m, dsize=None):
    """Warp a batch of NHWC images by homographies.

    src: (B, H, W, C); m: (B, 3, 3); dsize: (H_out, W_out) or None (=input).
    dst(x, y) = src(M^-1 (x, y)).
    """
    src = jnp.asarray(src)
    m = jnp.asarray(m, jnp.float32)
    if dsize is None:
        dsize = (src.shape[1], src.shape[2])
    ho, wo = dsize
    m_inv = jnp.linalg.inv(m)

    ys, xs = jnp.meshgrid(jnp.arange(ho, dtype=jnp.float32),
                          jnp.arange(wo, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (Ho, Wo, 3)

    def warp_one(img, hm):
        pts = grid @ hm.T  # (Ho, Wo, 3)
        denom = pts[..., 2:3]
        denom = jnp.where(jnp.abs(denom) < 1e-8,
                          jnp.full_like(denom, 1e-8), denom)
        sx = pts[..., 0] / denom[..., 0]
        sy = pts[..., 1] / denom[..., 0]
        return _bilinear_sample(img, sx, sy)

    return jax.vmap(warp_one)(src, m_inv)


def upscale_homography(h, scale_h, scale_w=None):
    """Rescale a homography estimated at one resolution to another.

    Equivalent to S @ H @ S^-1 with S = diag(scale_w, scale_h, 1); used to
    apply a homography predicted on 256x256 inputs to full-resolution images
    (reference ywz/mywork/newtrain1_real.py:47-57 `h_adjust`).
    """
    if scale_w is None:
        scale_w = scale_h
    h = jnp.asarray(h, jnp.float32)
    s = jnp.array([[scale_w, 0, 0], [0, scale_h, 0], [0, 0, 1]], jnp.float32)
    s_inv = jnp.array([[1 / scale_w, 0, 0], [0, 1 / scale_h, 0], [0, 0, 1]],
                      jnp.float32)
    return s @ h @ s_inv
