"""Homography / warp tests against closed forms."""

import jax
import jax.numpy as jnp
import numpy as np

from hesic_tpu.geometry import (HomographyNet, get_perspective_transform,
                                photometric_loss, upscale_homography,
                                warp_perspective)


class TestGetPerspectiveTransform:
    def test_identity(self):
        pts = jnp.array([[[0., 0.], [10., 0.], [10., 10.], [0., 10.]]])
        h = get_perspective_transform(pts, pts)
        np.testing.assert_allclose(h[0], np.eye(3), atol=1e-5)

    def test_translation(self):
        src = jnp.array([[[0., 0.], [10., 0.], [10., 10.], [0., 10.]]])
        dst = src + jnp.array([3.0, -2.0])
        h = get_perspective_transform(src, dst)
        expected = np.eye(3)
        expected[0, 2] = 3.0
        expected[1, 2] = -2.0
        np.testing.assert_allclose(h[0], expected, atol=1e-4)

    def test_recovers_random_homography(self):
        rng = np.random.RandomState(0)
        h_true = np.eye(3) + rng.randn(3, 3) * 0.01
        h_true[2, 2] = 1.0
        src = np.array([[[0., 0.], [100., 0.], [100., 100.], [0., 100.]]],
                       np.float32)
        pts_h = np.concatenate([src[0], np.ones((4, 1))], axis=1) @ h_true.T
        dst = (pts_h[:, :2] / pts_h[:, 2:])[None]
        h = get_perspective_transform(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(h[0]) / h[0, 2, 2], h_true,
                                   atol=1e-3)

    def test_batched(self):
        src = jnp.tile(
            jnp.array([[[0., 0.], [5., 0.], [5., 5.], [0., 5.]]]), (3, 1, 1))
        dst = src + jnp.arange(3).reshape(3, 1, 1)
        h = get_perspective_transform(src, dst)
        assert h.shape == (3, 3, 3)
        np.testing.assert_allclose(h[0], np.eye(3), atol=1e-5)


class TestWarpPerspective:
    def test_identity_warp(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
        h = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
        out = warp_perspective(img, h)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_integer_translation(self):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(1, 8, 8, 1), jnp.float32)
        # H shifts content by +2 in x: dst(x) = src(x - 2)
        h = jnp.array([[[1., 0., 2.], [0., 1., 0.], [0., 0., 1.]]])
        out = warp_perspective(img, h)
        np.testing.assert_allclose(out[0, :, 2:, 0], img[0, :, :-2, 0],
                                   atol=1e-5)
        # out-of-view pixels are zero padded
        np.testing.assert_allclose(out[0, :, :2, 0], 0.0, atol=1e-6)

    def test_differentiable(self):
        img = jnp.ones((1, 8, 8, 1))
        h = jnp.eye(3)[None]

        def f(m):
            return jnp.sum(warp_perspective(img, m))

        g = jax.grad(f)(h)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_jit(self):
        img = jnp.ones((1, 8, 8, 1))
        h = jnp.eye(3)[None]
        out = jax.jit(warp_perspective)(img, h)
        np.testing.assert_allclose(out, img, atol=1e-5)


class TestUpscaleHomography:
    def test_translation_scales(self):
        h = jnp.array([[1., 0., 4.], [0., 1., 2.], [0., 0., 1.]])
        h2 = upscale_homography(h, 2.0)
        np.testing.assert_allclose(h2[0, 2], 8.0, atol=1e-5)
        np.testing.assert_allclose(h2[1, 2], 4.0, atol=1e-5)


class TestHomographyNet:
    def test_output_shape_and_get_h(self):
        net = HomographyNet(patch_size=32)
        a = jnp.zeros((2, 32, 32, 1))
        b = jnp.zeros((2, 32, 32, 1))
        params = net.init(jax.random.PRNGKey(0), a, b)
        delta = net.apply(params, a, b)
        assert delta.shape == (2, 4, 2)
        corners = jnp.tile(
            jnp.array([[[0., 0.], [32., 0.], [32., 32.], [0., 32.]]]),
            (2, 1, 1))
        h = net.apply(params, a, b, corners, method="get_h")
        assert h.shape == (2, 3, 3)
        assert np.all(np.isfinite(np.asarray(h)))

    def test_photometric_loss_zero_for_identity(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
        corners = jnp.array([[[4., 4.], [20., 4.], [20., 20.], [4., 20.]]])
        delta = jnp.zeros((1, 4, 2))
        # patch_b = img warped by identity (anchored crop): warp with
        # identity h on re-anchored corners equals sampling img at
        # corners-anchored grid; for delta=0 loss compares
        # warp(img, I) grid starting at origin -> compare to img crop
        patch_b = img[:, :16, :16, :]
        loss = photometric_loss(delta, img, patch_b, corners)
        assert np.isfinite(float(loss))


class TestBandedMxuWarp:
    """warp_perspective_mxu with the banded x contraction (pick_warp_xwin)
    must be bit-identical to the full-width contraction: the one-hot
    window only drops all-zero terms, and overflowed taps are counted."""

    def _src(self, b=2, hw=128):
        rng = np.random.RandomState(3)
        return jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32)

    def test_banded_bit_identical(self):
        import jax.numpy as jnp2
        from hesic_tpu.geometry.fast_warp import (pick_warp_win,
                                                  pick_warp_xwin,
                                                  warp_perspective_mxu)
        src = self._src()
        hw = src.shape[1]
        cases = {
            "identity": np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1)),
            "shift": np.array([[[1, 0, 5.3], [0, 1, -3.7], [0, 0, 1]]] * 2,
                              np.float32),
            "proj": np.array([[[1.002, 0.004, 2.1], [-0.003, 0.998, 1.2],
                               [1e-5, -2e-5, 1]]] * 2, np.float32),
        }
        for name, hmat in cases.items():
            m = jnp.asarray(hmat)
            win = pick_warp_win(hmat, hw, hw)
            xw = pick_warp_xwin(hmat, hw, hw, xblock=64)
            assert xw is not None, name
            for cd in (jnp2.float32, jnp2.bfloat16):
                full, of_f = warp_perspective_mxu(src, m, (hw, hw), win,
                                                  8, cd)
                band, of_b = warp_perspective_mxu(src, m, (hw, hw), win,
                                                  8, cd, xwin=xw,
                                                  xblock=64)
                np.testing.assert_array_equal(np.asarray(full),
                                              np.asarray(band),
                                              err_msg=f"{name}/{cd}")
                assert int(of_b) == 0 and int(of_f) == 0

    def test_banded_ragged_width(self):
        from hesic_tpu.geometry.fast_warp import (pick_warp_xwin,
                                                  warp_perspective_mxu)
        rng = np.random.RandomState(4)
        src = jnp.asarray(rng.rand(1, 96, 200, 3), jnp.float32)
        m = jnp.asarray(np.eye(3, dtype=np.float32)[None])
        xw = pick_warp_xwin(np.asarray(m), 96, 200, xblock=64)
        full, _ = warp_perspective_mxu(src, m, (96, 200), 16, 8,
                                       jnp.float32)
        band, ovf = warp_perspective_mxu(src, m, (96, 200), 16, 8,
                                         jnp.float32, xwin=xw, xblock=64)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(band))
        assert int(ovf) == 0

    def test_pick_xwin_fallback_on_big_shift(self):
        from hesic_tpu.geometry.fast_warp import (_XSHIFT_BOUND,
                                                  pick_warp_xwin)
        h = np.array([[[1, 0, -(_XSHIFT_BOUND + 60.0)], [0, 1, 0],
                       [0, 0, 1]]], np.float32)
        assert pick_warp_xwin(h, 512, 512) is None
