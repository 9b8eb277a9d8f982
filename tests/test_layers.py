"""Layer tests mirroring reference tests/test_layers.py (mask correctness by
kernel inspection, GDN against the closed form) plus NHWC geometry checks."""

import jax
import jax.numpy as jnp
import numpy as np

from hesic_tpu.layers import (GDN, GDN1, AttentionBlock, Conv, Deconv,
                              MaskedConv2d, ResidualBlock,
                              ResidualBlockUpsample, ResidualBlockWithStride,
                              SubpelConv3x3, pixel_shuffle,
                              raster_causal_mask)


class TestConvGeometry:
    def test_conv_halves_even_inputs(self):
        m = Conv(features=8, kernel_size=5, stride=2)
        x = jnp.zeros((2, 64, 48, 3))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (2, 32, 24, 8)

    def test_conv_stride1_preserves(self):
        m = Conv(features=4, kernel_size=3, stride=1)
        x = jnp.zeros((1, 17, 19, 2))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, 17, 19, 4)

    def test_deconv_doubles(self):
        m = Deconv(features=8, kernel_size=5, stride=2)
        x = jnp.zeros((2, 16, 12, 4))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (2, 32, 24, 8)

    def test_deconv_stride1_preserves(self):
        m = Deconv(features=3, kernel_size=5, stride=1)
        x = jnp.zeros((1, 9, 9, 6))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, 9, 9, 3)

    def test_deconv_phase_equals_dilated(self):
        """The sub-pixel (phase) decomposition must compute the SAME
        linear map as the textbook input-dilated convolution — same
        products, reassociated sums — for every kernel/stride the zoo
        uses (torch ConvTranspose2d(padding=k//2, output_padding=s-1)
        geometry)."""
        rng = np.random.RandomState(0)

        def dilated(x, kernel, bias, k, s):
            p = k // 2
            pad_lo = k - 1 - p
            pad_hi = pad_lo + s - 1
            out = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1),
                padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + bias

        for (k, s) in [(5, 2), (5, 1), (3, 2), (3, 1), (5, 3), (7, 2)]:
            x = jnp.asarray(rng.randn(2, 9, 11, 4).astype(np.float32))
            m = Deconv(features=6, kernel_size=k, stride=s)
            params = m.init(jax.random.PRNGKey(1), x)["params"]
            got = m.apply({"params": params}, x)
            want = dilated(x, params["kernel"], params["bias"], k, s)
            assert got.shape == want.shape, (k, s)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-6, err_msg=f"k={k} s={s}")

    def test_conv_matches_manual_correlation(self):
        # 1x1 stride-1 conv is a matmul
        m = Conv(features=2, kernel_size=1, stride=1)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 3),
                        jnp.float32)
        y, params = m.init_with_output(jax.random.PRNGKey(1), x)
        k = params["params"]["kernel"][0, 0]  # (3, 2)
        np.testing.assert_allclose(y, x @ k, rtol=1e-5, atol=1e-5)


class TestPixelShuffle:
    def test_matches_torch_ordering(self):
        b, h, w, c, r = 1, 2, 2, 3, 2
        x = jnp.arange(b * h * w * c * r * r, dtype=jnp.float32).reshape(
            b, h, w, c * r * r)
        y = pixel_shuffle(x, r)
        assert y.shape == (b, h * r, w * r, c)
        # out[b, h*r+i, w*r+j, c] == in[b, h, w, c*r*r + i*r + j]
        for hh in range(h):
            for ww in range(w):
                for i in range(r):
                    for j in range(r):
                        for cc in range(c):
                            assert y[0, hh * r + i, ww * r + j, cc] == \
                                x[0, hh, ww, cc * r * r + i * r + j]


class TestMaskedConv:
    def test_mask_A(self):
        m = raster_causal_mask(5, 5, "A")
        expected = np.ones((5, 5))
        expected[2, 2:] = 0
        expected[3:, :] = 0
        np.testing.assert_array_equal(m, expected)

    def test_mask_B(self):
        m = raster_causal_mask(5, 5, "B")
        expected = np.ones((5, 5))
        expected[2, 3:] = 0
        expected[3:, :] = 0
        np.testing.assert_array_equal(m, expected)

    def test_causality(self):
        """Output at (h, w) must not depend on inputs at or after (h, w)."""
        m = MaskedConv2d(features=1, kernel_size=5, mask_type="A")
        x = jnp.zeros((1, 8, 8, 1))
        params = m.init(jax.random.PRNGKey(0), x)
        base = m.apply(params, x)
        # perturb the "current" pixel: output there must not change
        x2 = x.at[0, 4, 4, 0].set(100.0)
        out2 = m.apply(params, x2)
        assert out2[0, 4, 4, 0] == base[0, 4, 4, 0]
        # future pixel perturbation must not affect (4,4)
        x3 = x.at[0, 4, 5, 0].set(100.0)
        out3 = m.apply(params, x3)
        assert out3[0, 4, 4, 0] == base[0, 4, 4, 0]
        # past pixel must affect it
        x4 = x.at[0, 4, 3, 0].set(100.0)
        out4 = m.apply(params, x4)
        assert out4[0, 4, 4, 0] != base[0, 4, 4, 0]


class TestGDN:
    def test_closed_form(self):
        """Fresh GDN has beta=1, gamma=0.1*I: y = x / sqrt(1 + 0.1 x^2)."""
        m = GDN()
        x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 8),
                        jnp.float32)
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        expected = np.asarray(x) / np.sqrt(1 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(y, expected, rtol=1e-3, atol=2e-4)

    def test_inverse_closed_form(self):
        m = GDN(inverse=True)
        x = jnp.asarray(np.random.RandomState(1).rand(1, 4, 4, 8),
                        jnp.float32)
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        expected = np.asarray(x) * np.sqrt(1 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(y, expected, rtol=1e-3, atol=2e-4)

    def test_gdn1_closed_form(self):
        m = GDN1()
        x = jnp.asarray(np.random.RandomState(2).rand(1, 4, 4, 8),
                        jnp.float32)
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        expected = np.asarray(x) / (1 + 0.1 * np.abs(np.asarray(x)))
        np.testing.assert_allclose(y, expected, rtol=1e-3, atol=2e-4)


class TestBlocks:
    def test_shapes(self):
        x = jnp.zeros((1, 16, 16, 8))
        key = jax.random.PRNGKey(0)
        y, _ = ResidualBlockWithStride(features=16).init_with_output(key, x)
        assert y.shape == (1, 8, 8, 16)
        y, _ = ResidualBlockUpsample(features=8).init_with_output(key, x)
        assert y.shape == (1, 32, 32, 8)
        y, _ = ResidualBlock(features=8).init_with_output(key, x)
        assert y.shape == x.shape
        y, _ = AttentionBlock(features=8).init_with_output(key, x)
        assert y.shape == x.shape
        y, _ = SubpelConv3x3(features=4, r=2).init_with_output(key, x)
        assert y.shape == (1, 32, 32, 4)
