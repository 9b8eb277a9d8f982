"""Numerical checks for the PyTorch -> hesic_tpu weight converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from hesic_tpu.layers import GDN, Conv, Deconv
from hesic_tpu.utils.convert_torch import (convert_conv, convert_deconv,
                                           convert_entropy_bottleneck,
                                           convert_factorized, convert_gdn)


def _rand_nchw(shape, seed=0):
    return torch.from_numpy(
        np.random.RandomState(seed).rand(*shape).astype(np.float32))


class TestLayerConversion:
    @pytest.mark.parametrize("k,s", [(5, 2), (3, 1), (1, 1)])
    def test_conv_matches_torch(self, k, s):
        tconv = torch.nn.Conv2d(4, 6, k, stride=s, padding=k // 2)
        x = _rand_nchw((2, 4, 16, 16))
        with torch.no_grad():
            ref = tconv(x).numpy()
        params = convert_conv({"c.weight": tconv.weight,
                               "c.bias": tconv.bias}, "c")
        m = Conv(features=6, kernel_size=k, stride=s)
        out = m.apply({"params": params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5)

    @pytest.mark.parametrize("k,s", [(5, 2), (5, 1)])
    def test_deconv_matches_torch(self, k, s):
        tdeconv = torch.nn.ConvTranspose2d(4, 6, k, stride=s,
                                           padding=k // 2,
                                           output_padding=s - 1)
        x = _rand_nchw((2, 4, 8, 8), seed=1)
        with torch.no_grad():
            ref = tdeconv(x).numpy()
        params = convert_deconv({"d.weight": tdeconv.weight,
                                 "d.bias": tdeconv.bias}, "d")
        m = Deconv(features=6, kernel_size=k, stride=s)
        out = m.apply({"params": params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5)

    def test_gdn_conversion_shape(self):
        c = 8
        state = {"g.beta": torch.rand(c) + 0.5,
                 "g.gamma": torch.rand(c, c) * 0.01}
        params = convert_gdn(state, "g")
        x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, c),
                        jnp.float32)
        out = GDN().apply({"params": params}, x)
        # closed form with the same reparam the reference uses
        ped = (2.0 ** -18) ** 2
        beta = np.maximum(state["g.beta"].numpy(),
                          (1e-6 + ped) ** 0.5) ** 2 - ped
        gamma = np.maximum(state["g.gamma"].numpy(), ped ** 0.5) ** 2 - ped
        norm = (np.asarray(x) ** 2) @ gamma.T + beta
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(x) / np.sqrt(norm), rtol=1e-4)


class TestFullModelConversion:
    def test_factorized_state_dict(self):
        """Build a torch factorized-prior-shaped state_dict and convert."""
        n, m = 8, 12
        state = {}

        def add_conv(prefix, cin, cout, k=5):
            state[f"{prefix}.weight"] = torch.randn(cout, cin, k, k) * 0.05
            state[f"{prefix}.bias"] = torch.randn(cout) * 0.01

        def add_deconv(prefix, cin, cout, k=5):
            state[f"{prefix}.weight"] = torch.randn(cin, cout, k, k) * 0.05
            state[f"{prefix}.bias"] = torch.randn(cout) * 0.01

        def add_gdn(prefix, c):
            state[f"{prefix}.beta"] = torch.rand(c) + 0.5
            state[f"{prefix}.gamma"] = torch.rand(c, c) * 0.05

        chans = [3, n, n, n, m]
        for i, idx in enumerate([0, 2, 4, 6]):
            add_conv(f"g_a.{idx}", chans[i], chans[i + 1])
            if idx < 6:
                add_gdn(f"g_a.{idx + 1}", chans[i + 1])
        rchans = [m, n, n, n, 3]
        for i, idx in enumerate([0, 2, 4, 6]):
            add_deconv(f"g_s.{idx}", rchans[i], rchans[i + 1])
            if idx < 6:
                add_gdn(f"g_s.{idx + 1}", rchans[i + 1])
        filters = (1, 3, 3, 3, 3, 1)
        for i in range(5):
            state[f"entropy_bottleneck._matrices.{i}"] = torch.randn(
                m, filters[i + 1], filters[i]) * 0.1
            state[f"entropy_bottleneck._biases.{i}"] = torch.randn(
                m, filters[i + 1], 1) * 0.1
            if i < 4:
                state[f"entropy_bottleneck._factors.{i}"] = torch.zeros(
                    m, filters[i + 1], 1)
        state["entropy_bottleneck.quantiles"] = torch.tensor(
            [[-10.0, 0.0, 10.0]]).repeat(m, 1, 1).reshape(m, 1, 3)

        params = convert_factorized(state)
        from hesic_tpu.models import FactorizedPrior
        module = FactorizedPrior(N=n, M=m)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                        jnp.float32)
        out = module.apply({"params": params}, x, training=False)
        assert out["x_hat"].shape == x.shape
        assert np.all(np.isfinite(np.asarray(out["x_hat"])))
        # converted params structurally match a freshly initialized tree
        ref = module.init({"params": jax.random.PRNGKey(0),
                           "noise": jax.random.PRNGKey(1)}, x,
                          training=True)["params"]
        ref_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_flatten_with_path(ref)[0]}
        got_paths = {jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(params)[0]}
        assert ref_paths == got_paths
