"""Classical feature-based homography estimation, TPU-native.

Re-designs the reference's OpenCV pipeline (compressai/datasets/utils.py:30-67:
``cv2.xfeatures2d.SURF_create`` keypoints + ``BFMatcher.knnMatch`` with the
0.7 ratio test + ``cv2.findHomography(..., cv2.RANSAC, 5.0)``) as ONE
fixed-shape jitted JAX program, so the whole estimator runs on device:

* **Detection** — Harris corner response (Sobel gradients, Gaussian-smoothed
  structure tensor) + window non-max suppression, then a single ``top_k``
  over the response map.  Fixed keypoint budget ``max_kp`` (invalid slots
  are masked, never dropped — shapes stay static for XLA).
* **Description** — upright SURF-style descriptors: a 16x16 gradient window
  per keypoint, pooled into a 4x4 cell grid of (sum dx, sum |dx|, sum dy,
  sum |dy|) -> 64-d, Gaussian-weighted and L2-normalized.  Upright (no
  orientation assignment) matches the stereo use case — the reference runs
  SURF at a single scale for the same reason (utils.py:36 iterates
  ``resize_scale in [1]`` only).
* **Matching** — the full K x K distance matrix as one MXU matmul
  (unit-norm descriptors: d^2 = 2 - 2 a.b), 2-NN via ``top_k`` and Lowe's
  ratio test at 0.7 (utils.py:50 ``m.distance < 0.7 * n.distance``).
* **RANSAC** — ``n_hyp`` 4-point hypotheses sampled in one
  ``jax.random.choice`` call, solved by the batched DLT
  (:func:`get_perspective_transform`), scored by reprojection error
  against the same 5.0 px threshold the reference passes to
  ``findHomography``; the winner is re-fit on its inliers with a
  Hartley-normalized weighted DLT (9x9 eigendecomposition).

Degenerate hypotheses (collinear / duplicate samples) yield non-finite
solves and score -1 — no control flow, so everything vectorizes over the
hypothesis axis and ``vmap``s over image pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .homography import get_perspective_transform

# BT.601 luma weights (same grayscale the reference's cv2 path uses)
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)

_DESC_HALF = 8          # 16x16 descriptor window
_DESC_CELL = 4          # 4x4 cells of 4x4 px -> 64-d descriptor


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _sep_conv(img, k1d):
    """Separable 2-D convolution of an (H, W) map, SAME padding."""
    k = jnp.asarray(k1d, jnp.float32)
    x = img[None, :, :, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, len(k1d), 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, -1, 1, 1), (1, 1), "SAME", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(
        x, k.reshape(-1, 1, 1, 1), (1, 1), "SAME", dimension_numbers=dn)
    return x[0, :, :, 0]


def _sobel(gray):
    """Sobel gradients of an (H, W) map -> (ix, iy)."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
                     jnp.float32) / 8.0
    x = gray[None, :, :, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    ix = jax.lax.conv_general_dilated(
        x, kx.reshape(3, 3, 1, 1), (1, 1), "SAME",
        dimension_numbers=dn)[0, :, :, 0]
    iy = jax.lax.conv_general_dilated(
        x, kx.T.reshape(3, 3, 1, 1), (1, 1), "SAME",
        dimension_numbers=dn)[0, :, :, 0]
    return ix, iy


def harris_response(gray, k: float = 0.04, sigma: float = 1.5):
    """Harris corner response of an (H, W) grayscale image."""
    ix, iy = _sobel(gray)
    g = _gaussian_kernel1d(sigma, radius=2)
    a = _sep_conv(ix * ix, g)
    b = _sep_conv(iy * iy, g)
    c = _sep_conv(ix * iy, g)
    return a * b - c * c - k * (a + b) ** 2


def detect_keypoints(gray, max_kp: int = 512, nms_radius: int = 4):
    """Top-``max_kp`` Harris corners after non-max suppression.

    Returns ``(xy, score)`` with ``xy`` (max_kp, 2) float32 in (x, y) pixel
    order and ``score`` (max_kp,) — slots beyond the detected corners (or
    below the relative response floor) carry score 0 and must be masked.
    """
    h, w = gray.shape
    resp = harris_response(gray)
    # window NMS: keep only local maxima of the (2r+1)^2 neighbourhood
    win = 2 * nms_radius + 1
    mx = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                               (win, win), (1, 1), "SAME")
    is_max = resp >= mx
    # border suppression: the descriptor window must fit
    margin = _DESC_HALF + 1
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    inside = ((ys >= margin) & (ys < h - margin)
              & (xs >= margin) & (xs < w - margin))
    floor = 1e-4 * jnp.maximum(jnp.max(resp), 1e-12)
    cand = jnp.where(is_max & inside & (resp > floor), resp, 0.0)
    score, flat = jax.lax.top_k(cand.reshape(-1), max_kp)
    y = (flat // w).astype(jnp.float32)
    x = (flat % w).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), score


def describe_keypoints(gray, xy):
    """Upright SURF-style 64-d descriptors at integer keypoint locations.

    gray: (H, W); xy: (K, 2) in (x, y) order.  Returns (K, 64) unit-norm.
    """
    ix, iy = _sobel(gray)
    h, w = gray.shape
    k = xy.shape[0]
    off = jnp.arange(-_DESC_HALF, _DESC_HALF)                 # (16,)
    yy = jnp.clip(xy[:, 1].astype(jnp.int32)[:, None, None]
                  + off[None, :, None], 0, h - 1)             # (K, 16, 1)
    xx = jnp.clip(xy[:, 0].astype(jnp.int32)[:, None, None]
                  + off[None, None, :], 0, w - 1)             # (K, 1, 16)
    yy = jnp.broadcast_to(yy, (k, 16, 16))
    xx = jnp.broadcast_to(xx, (k, 16, 16))
    dx = ix[yy, xx]
    dy = iy[yy, xx]
    # Gaussian weighting over the window (SURF weights Haar responses)
    g1 = _gaussian_kernel1d(sigma=5.0, radius=_DESC_HALF)[:-1]
    wgt = jnp.asarray(np.outer(g1, g1), jnp.float32)[None]
    dx = dx * wgt
    dy = dy * wgt

    def cells(t):
        t = t.reshape(k, _DESC_CELL, _DESC_CELL, _DESC_CELL, _DESC_CELL)
        return t.transpose(0, 1, 3, 2, 4).reshape(
            k, _DESC_CELL * _DESC_CELL, _DESC_CELL * _DESC_CELL)

    cdx, cdy = cells(dx), cells(dy)
    desc = jnp.concatenate([cdx.sum(-1), jnp.abs(cdx).sum(-1),
                            cdy.sum(-1), jnp.abs(cdy).sum(-1)], axis=-1)
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
    return desc / jnp.maximum(norm, 1e-8)


def match_descriptors(d1, d2, valid1, valid2, ratio: float = 0.7):
    """2-NN matching with Lowe's ratio test (reference utils.py:47-51).

    Returns ``(idx2, weight)``: for each keypoint of image 1 the index of
    its best match in image 2 and a 0/1 weight (1 = passed the ratio test
    between valid keypoints).
    """
    sim = d1 @ d2.T                                          # (K, K) MXU
    sim = jnp.where(valid2[None, :], sim, -jnp.inf)
    top2, idx = jax.lax.top_k(sim, 2)                        # descending
    # unit-norm descriptors: d^2 = 2 - 2 sim; ratio on Euclidean distance
    d2_best = jnp.maximum(2.0 - 2.0 * top2[:, 0], 0.0)
    d2_next = jnp.maximum(2.0 - 2.0 * top2[:, 1], 1e-12)
    good = d2_best < (ratio * ratio) * d2_next
    good = good & valid1 & jnp.isfinite(top2[:, 0])
    return idx[:, 0], good.astype(jnp.float32)


def _dlt_refit(src, dst, w):
    """Hartley-normalized weighted DLT over all weighted correspondences.

    src, dst: (K, 2); w: (K,) non-negative weights.  Returns (3, 3).
    """
    wn = w / jnp.maximum(jnp.sum(w), 1e-8)

    def normalize(pts):
        mu = jnp.sum(wn[:, None] * pts, axis=0)
        d = jnp.sqrt(jnp.sum((pts - mu) ** 2, axis=-1))
        scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(wn * d), 1e-8)
        t = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        t = t.at[0, 0].set(scale).at[1, 1].set(scale)
        t = t.at[0, 2].set(-scale * mu[0]).at[1, 2].set(-scale * mu[1])
        return (pts - mu) * scale, t

    s_n, t_s = normalize(src)
    d_n, t_d = normalize(dst)
    x, y = s_n[:, 0], s_n[:, 1]
    u, v = d_n[:, 0], d_n[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    row_u = jnp.stack([x, y, ones, zeros, zeros, zeros,
                       -u * x, -u * y, -u], axis=-1)
    row_v = jnp.stack([zeros, zeros, zeros, x, y, ones,
                       -v * x, -v * y, -v], axis=-1)
    a = jnp.concatenate([row_u, row_v], axis=0)              # (2K, 9)
    ww = jnp.concatenate([w, w])[:, None]
    m = (a * ww).T @ a                                       # (9, 9)
    _, vecs = jnp.linalg.eigh(m)
    h_n = vecs[:, 0].reshape(3, 3)                           # min eigenvec
    h_full = jnp.linalg.inv(t_d) @ h_n @ t_s
    return h_full / jnp.where(jnp.abs(h_full[2, 2]) < 1e-12, 1.0,
                              h_full[2, 2])


def find_homography_ransac(src, dst, weight, key, n_hyp: int = 512,
                           thresh: float = 5.0):
    """RANSAC homography from weighted correspondences.

    src, dst: (K, 2) points; weight: (K,) sampling weights (0 = exclude);
    ``thresh`` is the inlier reprojection radius in pixels (the reference
    passes 5.0 to ``cv2.findHomography``).  Returns ``(h, n_inliers)``.
    """
    kk = src.shape[0]
    p = weight / jnp.maximum(jnp.sum(weight), 1e-8)
    idx = jax.random.choice(key, kk, shape=(n_hyp, 4), replace=True, p=p)
    hs = get_perspective_transform(
        jnp.take(src, idx.reshape(-1), axis=0).reshape(n_hyp, 4, 2),
        jnp.take(dst, idx.reshape(-1), axis=0).reshape(n_hyp, 4, 2))

    ones = jnp.ones((kk, 1), jnp.float32)
    src_h = jnp.concatenate([src, ones], axis=-1)            # (K, 3)
    proj = jnp.einsum("nij,kj->nki", hs, src_h)              # (N, K, 3)
    z = proj[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    err2 = jnp.sum((proj[..., :2] / z[..., None] - dst[None]) ** 2, -1)
    inl = (err2 < thresh * thresh) & (weight > 0)[None]      # (N, K)
    finite = jnp.all(jnp.isfinite(hs.reshape(n_hyp, -1)), axis=-1)
    score = jnp.where(finite, jnp.sum(inl, axis=-1), -1)
    best = jnp.argmax(score)
    inliers = inl[best].astype(jnp.float32)
    n_inl = jnp.sum(inliers).astype(jnp.int32)
    h_refit = _dlt_refit(src, dst, inliers)
    ok = (n_inl >= 4) & jnp.all(jnp.isfinite(h_refit))
    h_best = jnp.where(ok, h_refit, hs[best])
    eye = jnp.eye(3, dtype=jnp.float32)
    h_best = jnp.where(jnp.isfinite(h_best).all() & (score[best] > 0),
                       h_best, eye)
    return h_best, n_inl


@functools.partial(jax.jit,
                   static_argnames=("max_kp", "n_hyp", "nms_radius"))
def estimate_homography(im1, im2, key=None, *, max_kp: int = 512,
                        n_hyp: int = 512, ratio: float = 0.7,
                        thresh: float = 5.0, nms_radius: int = 4):
    """Estimate H mapping image-1 pixel coords into image 2.

    im1, im2: (H, W, 3) RGB float images in [0, 1] (grayscale (H, W) also
    accepted).  Same convention as the reference's ``get_H``
    (utils.py:30-67): ``findHomography(kp1, kp2)``, i.e.
    ``warp_perspective(im1, h)`` lands in image 2's frame.

    Returns a dict with ``h`` (3, 3), ``n_inliers`` and ``n_matches``
    (int32 scalars).  When estimation fails the host wrapper
    :func:`get_h_classical` maps it to ``None`` like the reference.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    def gray(im):
        im = jnp.asarray(im, jnp.float32)
        return im @ jnp.asarray(_LUMA) if im.ndim == 3 else im

    g1, g2 = gray(im1), gray(im2)
    xy1, s1 = detect_keypoints(g1, max_kp=max_kp, nms_radius=nms_radius)
    xy2, s2 = detect_keypoints(g2, max_kp=max_kp, nms_radius=nms_radius)
    d1 = describe_keypoints(g1, xy1)
    d2 = describe_keypoints(g2, xy2)
    idx2, good = match_descriptors(d1, d2, s1 > 0, s2 > 0, ratio=ratio)
    dst = jnp.take(xy2, idx2, axis=0)
    h, n_inl = find_homography_ransac(xy1, dst, good, key,
                                      n_hyp=n_hyp, thresh=thresh)
    return {"h": h, "n_inliers": n_inl,
            "n_matches": jnp.sum(good).astype(jnp.int32)}


def get_h_classical(im1, im2, min_inliers: int = 8, **kw):
    """Host convenience mirroring the reference ``get_H`` contract:
    numpy (3, 3) float32, or ``None`` when estimation fails (the reference
    returns None via its try/except, utils.py:57-62)."""
    out = estimate_homography(jnp.asarray(im1), jnp.asarray(im2), **kw)
    n = int(out["n_inliers"])
    if n < min_inliers:
        return None
    return np.asarray(out["h"], np.float32)
