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

    TPU note: all four bilinear taps come from ONE `lax.gather` of 2x2xC
    blocks (slice_sizes), quartering the gather count vs the naive
    four-corner formulation — gathers dominate the warp cost on TPU.
    """
    h, w, c = img.shape
    ho, wo = xs.shape
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    wx1 = (xs - x0f)[..., None]
    wy1 = (ys - y0f)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    # zero-padding masks per tap (the gather itself clips)
    in_x0 = (x0 >= 0) & (x0 <= w - 1)
    in_x1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    in_y0 = (y0 >= 0) & (y0 <= h - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)

    idx = jnp.stack(
        [jnp.clip(y0, 0, h - 2).reshape(-1),
         jnp.clip(x0, 0, w - 2).reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    blocks = jax.lax.gather(
        img, idx, dn, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP)      # (N, 2, 2, C)
    blocks = blocks.reshape(ho, wo, 2, 2, c)

    # taps relative to the clipped block origin
    oy = y0 - jnp.clip(y0, 0, h - 2)              # 0 or +-1 offset
    ox = x0 - jnp.clip(x0, 0, w - 2)
    # because of clipping, oy/ox in {-?, 0, 1}; select block entries
    def tap(dy, dx, mask):
        sel_y = jnp.clip(oy + dy, 0, 1)[..., None]
        sel_x = jnp.clip(ox + dx, 0, 1)[..., None]
        row0 = jnp.where(sel_x == 0, blocks[:, :, 0, 0], blocks[:, :, 0, 1])
        row1 = jnp.where(sel_x == 0, blocks[:, :, 1, 0], blocks[:, :, 1, 1])
        v = jnp.where(sel_y == 0, row0, row1)
        return v * mask[..., None]

    out = (tap(0, 0, in_y0 & in_x0) * (wy0 * wx0)
           + tap(0, 1, in_y0 & in_x1) * (wy0 * wx1)
           + tap(1, 0, in_y1 & in_x0) * (wy1 * wx0)
           + tap(1, 1, in_y1 & in_x1) * (wy1 * wx1))
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

    def warp_one(img, hm):
        # elementwise projective transform (a matmul would run at reduced
        # MXU f32 precision on TPU and perturb sampling weights)
        px = hm[0, 0] * xs + hm[0, 1] * ys + hm[0, 2]
        py = hm[1, 0] * xs + hm[1, 1] * ys + hm[1, 2]
        pz = hm[2, 0] * xs + hm[2, 1] * ys + hm[2, 2]
        pz = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
        return _bilinear_sample(img, px / pz, py / pz)

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
