"""Classical feature-based homography estimation (geometry/features.py).

Covers the TPU-native replacement of the reference's SURF+RANSAC path
(compressai/datasets/utils.py:30-67): detection, description, ratio-test
matching, RANSAC and the end-to-end ``get_H`` contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hesic_tpu.geometry import warp_perspective
from hesic_tpu.geometry.features import (describe_keypoints,
                                         detect_keypoints,
                                         estimate_homography,
                                         find_homography_ransac,
                                         get_h_classical,
                                         match_descriptors)

HW = 160
KP = 192
HYP = 256


def _textured(seed=0, hw=HW):
    """Block-textured image: plenty of strong corners for Harris."""
    rng = np.random.RandomState(seed)
    blocks = rng.rand(hw // 8, hw // 8, 3).astype(np.float32)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    img += 0.05 * rng.rand(hw, hw, 3).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def _transfer_error(h_est, h_true, hw=HW):
    """Mean symmetric transfer distance over an interior point grid."""
    ys, xs = np.meshgrid(np.linspace(hw * 0.25, hw * 0.75, 5),
                         np.linspace(hw * 0.25, hw * 0.75, 5))
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)], axis=-1)

    def proj(h):
        q = pts @ np.asarray(h, np.float64).T
        return q[:, :2] / q[:, 2:3]

    return float(np.mean(np.linalg.norm(proj(h_est) - proj(h_true),
                                        axis=-1)))


def test_detect_keypoints_on_texture():
    img = jnp.asarray(_textured()[..., 0])
    xy, score = detect_keypoints(img, max_kp=KP)
    n = int(jnp.sum(score > 0))
    assert n > 50
    # all detected keypoints respect the descriptor border margin
    valid_xy = np.asarray(xy)[np.asarray(score) > 0]
    assert valid_xy.min() >= 9 and valid_xy.max() <= HW - 10


def test_descriptors_unit_norm_and_distinct():
    img = jnp.asarray(_textured()[..., 0])
    xy, score = detect_keypoints(img, max_kp=KP)
    d = describe_keypoints(img, xy)
    assert d.shape == (KP, 64)
    norms = np.asarray(jnp.linalg.norm(d, axis=-1))
    np.testing.assert_allclose(norms[np.asarray(score) > 0], 1.0,
                               atol=1e-4)


def test_matching_identity_pair():
    img = jnp.asarray(_textured()[..., 0])
    xy, score = detect_keypoints(img, max_kp=KP)
    d = describe_keypoints(img, xy)
    idx2, good = match_descriptors(d, d, score > 0, score > 0)
    g = np.asarray(good) > 0
    # self-matching: every good match maps a keypoint to itself
    assert g.sum() > 30
    np.testing.assert_array_equal(np.asarray(idx2)[g],
                                  np.arange(KP)[g])


def test_ransac_rejects_outliers():
    rng = np.random.RandomState(3)
    h_true = np.array([[1.02, 0.01, 4.0],
                       [-0.008, 0.99, -2.5],
                       [1e-5, -2e-5, 1.0]], np.float32)
    src = rng.rand(KP, 2).astype(np.float32) * HW
    ones = np.ones((KP, 1), np.float32)
    proj = np.concatenate([src, ones], -1) @ h_true.T
    dst = proj[:, :2] / proj[:, 2:3]
    # corrupt 40% of the matches
    bad = rng.rand(KP) < 0.4
    dst[bad] = rng.rand(bad.sum(), 2) * HW
    h, n_inl = find_homography_ransac(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(KP, jnp.float32),
        jax.random.PRNGKey(0), n_hyp=HYP)
    assert int(n_inl) >= int((~bad).sum() * 0.9)
    assert _transfer_error(np.asarray(h), h_true) < 0.1


def test_estimate_homography_known_warp():
    h_true = np.array([[1.01, 0.02, 5.0],
                       [-0.015, 0.99, -3.0],
                       [2e-5, -1e-5, 1.0]], np.float32)
    im1 = _textured(seed=1)
    # im2(x) = im1(H^-1 x)  <=>  H maps im1 coords into im2 coords
    im2 = np.asarray(warp_perspective(im1[None], h_true[None])[0])
    out = estimate_homography(jnp.asarray(im1), jnp.asarray(im2),
                              max_kp=KP, n_hyp=HYP)
    assert int(out["n_inliers"]) >= 20
    assert _transfer_error(np.asarray(out["h"]), h_true) < 1.0


def test_estimate_homography_identity():
    im = _textured(seed=2)
    out = estimate_homography(jnp.asarray(im), jnp.asarray(im),
                              max_kp=KP, n_hyp=HYP)
    assert _transfer_error(np.asarray(out["h"]), np.eye(3)) < 0.5


def test_get_h_classical_contract():
    h_true = np.array([[1.0, 0.0, 3.0],
                       [0.0, 1.0, -2.0],
                       [0.0, 0.0, 1.0]], np.float32)
    im1 = _textured(seed=4)
    im2 = np.asarray(warp_perspective(im1[None], h_true[None])[0])
    h = get_h_classical(im1, im2, max_kp=KP, n_hyp=HYP)
    assert h is not None and h.shape == (3, 3) and h.dtype == np.float32
    assert _transfer_error(h, h_true) < 1.0
    # featureless pair -> None, like the reference's try/except
    flat = np.full((HW, HW, 3), 0.5, np.float32)
    assert get_h_classical(flat, flat, max_kp=KP, n_hyp=HYP) is None


@pytest.mark.parametrize("shift", [2.0, 6.0])
def test_estimate_translation_only(shift):
    """Pure horizontal shift — the dominant stereo-geometry case."""
    h_true = np.eye(3, dtype=np.float32)
    h_true[0, 2] = shift
    im1 = _textured(seed=5)
    im2 = np.asarray(warp_perspective(im1[None], h_true[None])[0])
    out = estimate_homography(jnp.asarray(im1), jnp.asarray(im2),
                              max_kp=KP, n_hyp=HYP)
    assert _transfer_error(np.asarray(out["h"]), h_true) < 0.75
