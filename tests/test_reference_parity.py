"""Forward parity against the ACTUAL reference torch implementation.

Instantiates the reference modules from /root/reference (randomly
initialized, eval mode — deterministic round quantization), converts their
state_dicts with hesic_tpu.utils.convert_torch, and asserts the converted
Flax models reproduce x_hat and the likelihood streams.  This is the
RD-parity evidence chain for converted checkpoints (SURVEY.md §7 hard
part 4): any published torch checkpoint that loads into the reference
modules will produce the same outputs here.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import load_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from hesic_tpu.utils.convert_torch import convert_state_dict  # noqa: E402

ATOL = 3e-4   # f32 conv stacks: torch MKL vs XLA CPU op-order differences
LIK_RTOL = 2e-3


def _nhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def _to_nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


def _seed_all(seed=0):
    torch.manual_seed(seed)
    np.random.seed(seed)


def _compare(out_ref, out, keys=("y", "z")):
    np.testing.assert_allclose(
        _to_nchw(out["x_hat"]), out_ref["x_hat"].numpy(), atol=ATOL)
    for k in keys:
        ref_l = out_ref["likelihoods"][k].numpy()
        got_l = _to_nchw(out["likelihoods"][k])
        np.testing.assert_allclose(got_l, ref_l, rtol=LIK_RTOL, atol=1e-6)


class TestSingleImageParity:
    def _run(self, arch, make_ref, make_ours, n=8, m=12):
        _seed_all()
        mods = load_reference()
        ref = make_ref(mods, n, m).eval()
        params = convert_state_dict(ref.state_dict(), arch)
        module = make_ours(n, m)
        x = torch.rand(1, 3, 64, 64)
        with torch.no_grad():
            out_ref = ref(x)
        out = module.apply({"params": params}, _nhwc(x), training=False)
        return out_ref, out

    def test_factorized(self):
        from hesic_tpu.models import FactorizedPrior
        out_ref, out = self._run(
            "bmshj2018-factorized",
            lambda mods, n, m: mods["priors"].FactorizedPrior(n, m),
            lambda n, m: FactorizedPrior(N=n, M=m))
        _compare(out_ref, out, keys=("y",))

    def test_scale_hyperprior(self):
        from hesic_tpu.models import ScaleHyperprior
        out_ref, out = self._run(
            "bmshj2018-hyperprior",
            lambda mods, n, m: mods["priors"].ScaleHyperprior(n, m),
            lambda n, m: ScaleHyperprior(N=n, M=m))
        _compare(out_ref, out)

    def test_mean_scale_hyperprior(self):
        from hesic_tpu.models import MeanScaleHyperprior
        out_ref, out = self._run(
            "mbt2018-mean",
            lambda mods, n, m: mods["priors"].MeanScaleHyperprior(n, m),
            lambda n, m: MeanScaleHyperprior(N=n, M=m))
        _compare(out_ref, out)

    def test_mbt2018(self):
        from hesic_tpu.models import JointAutoregressiveHierarchicalPriors
        out_ref, out = self._run(
            "mbt2018",
            lambda mods, n, m:
                mods["priors"].JointAutoregressiveHierarchicalPriors(n, m),
            lambda n, m: JointAutoregressiveHierarchicalPriors(N=n, M=m),
            n=12, m=12)
        _compare(out_ref, out)


class TestCheng2020Parity:
    @pytest.mark.parametrize("attention", [False, True])
    def test_cheng2020(self, attention):
        _seed_all(2)
        mods = load_reference()
        n = 8
        cls = (mods["waseda"].Cheng2020Attention if attention
               else mods["waseda"].Cheng2020Anchor)
        ref = cls(n).eval()
        arch = "cheng2020-attn" if attention else "cheng2020-anchor"
        params = convert_state_dict(ref.state_dict(), arch)
        from hesic_tpu.models import Cheng2020Anchor, Cheng2020Attention
        module = (Cheng2020Attention if attention else Cheng2020Anchor)(
            N=n, M=n)
        x = torch.rand(1, 3, 64, 64)
        with torch.no_grad():
            out_ref = ref(x)
        out = module.apply({"params": params}, _nhwc(x), training=False)
        _compare(out_ref, out)


class TestHESICPlusParity:
    def test_hesic_plus_forward(self):
        _seed_all(3)
        mods = load_reference()
        ref = mods["newnet1_joint"].HSIC(N=16, M=24, K=2).eval()
        params = convert_state_dict(ref.state_dict(), "hesic-plus")
        from hesic_tpu.models import HESICPlus
        module = HESICPlus(N=16, M=24)
        x1 = torch.rand(1, 3, 64, 64)
        x2 = torch.rand(1, 3, 64, 64)
        h = torch.eye(3)[None]
        with torch.no_grad():
            out_ref = ref(x1, x2, h)
        out = module.apply({"params": params}, _nhwc(x1), _nhwc(x2),
                           jnp.asarray(h.numpy()), training=False)
        np.testing.assert_allclose(_to_nchw(out["x1_hat"]),
                                   out_ref["x1_hat"].numpy(), atol=ATOL)
        np.testing.assert_allclose(_to_nchw(out["x2_hat"]),
                                   out_ref["x2_hat"].numpy(), atol=ATOL)
        for k in ("y1", "y2", "z1", "z2"):
            np.testing.assert_allclose(
                _to_nchw(out["likelihoods"][k]),
                out_ref["likelihoods"][k].numpy(),
                rtol=LIK_RTOL, atol=1e-6)


class TestDSICParity:
    def test_dsic_forward(self):
        _seed_all(4)
        mods = load_reference()
        ref = mods["mynet6"].DSIC(N=16, M=24, F=6, C=8, K=2).eval()
        params = convert_state_dict(ref.state_dict(), "dsic")
        from hesic_tpu.models import DSIC
        module = DSIC(N=16, M=24, F=6, C=8, K=2)
        x1 = torch.rand(1, 3, 64, 64)
        x2 = torch.rand(1, 3, 64, 64)
        with torch.no_grad():
            out_ref = ref(x1, x2)
        out = module.apply({"params": params}, _nhwc(x1), _nhwc(x2),
                           training=False)
        np.testing.assert_allclose(_to_nchw(out["x1_hat"]),
                                   out_ref["x1_hat"].numpy(), atol=ATOL)
        np.testing.assert_allclose(_to_nchw(out["x2_hat"]),
                                   out_ref["x2_hat"].numpy(), atol=5e-4)
        for k in ("y1", "y2", "z1", "z2"):
            np.testing.assert_allclose(
                _to_nchw(out["likelihoods"][k]),
                out_ref["likelihoods"][k].numpy(),
                rtol=LIK_RTOL, atol=1e-6)


class TestTogetherParity:
    def test_hesic_together_forward(self):
        """GMM_together (newnet1.py:1304-1321): codec + cross-view
        enhancement end-to-end through the m1/m2 converter."""
        _seed_all(7)
        mods = load_reference()
        ref = mods["newnet1"].GMM_together(N=16, M=24, K=2).eval()
        params = convert_state_dict(ref.state_dict(), "hesic-together")
        from hesic_tpu.models import HESICTogether
        module = HESICTogether(N=16, M=24, K=2)
        x1 = torch.rand(1, 3, 64, 64)
        x2 = torch.rand(1, 3, 64, 64)
        h = torch.eye(3)[None]
        with torch.no_grad():
            out_ref = ref(x1, x2, h)
        out = module.apply({"params": params}, _nhwc(x1), _nhwc(x2),
                           jnp.asarray(h.numpy()), training=False)
        np.testing.assert_allclose(_to_nchw(out["x1_hat"]),
                                   out_ref["x1_hat"].numpy(), atol=ATOL)
        np.testing.assert_allclose(_to_nchw(out["x2_hat"]),
                                   out_ref["x2_hat"].numpy(), atol=ATOL)

    def test_dsic_plus_forward(self):
        """DSIC_plus (mynet6_plus.py:1352-1370): the m2 enhancement is
        the SINGLE-VIEW variant (Enhancement 3->32 with the cross-view
        concat removed, mynet6_plus.py:56-78)."""
        _seed_all(8)
        mods = load_reference()
        ref = mods["mynet6_plus"].DSIC_plus(
            N=16, M=24, F=6, C=8, K=2).eval()
        params = convert_state_dict(ref.state_dict(), "dsic-plus")
        from hesic_tpu.models import DSICPlus
        module = DSICPlus(N=16, M=24, F=6, C=8, K=2)
        x1 = torch.rand(1, 3, 64, 64)
        x2 = torch.rand(1, 3, 64, 64)
        with torch.no_grad():
            out_ref = ref(x1, x2)
        out = module.apply({"params": params}, _nhwc(x1), _nhwc(x2),
                           training=False)
        np.testing.assert_allclose(_to_nchw(out["x1_hat"]),
                                   out_ref["x1_hat"].numpy(), atol=ATOL)
        np.testing.assert_allclose(_to_nchw(out["x2_hat"]),
                                   out_ref["x2_hat"].numpy(), atol=5e-4)


class TestHomographyNetParity:
    def test_net_delta(self):
        _seed_all(5)
        mods = load_reference()
        ref = mods["udh_model"].Net(patch_size=64).eval()
        from hesic_tpu.geometry import HomographyNet
        from hesic_tpu.utils.convert_torch import convert_homography_net
        params = convert_homography_net(ref.state_dict(), patch_size=64)
        module = HomographyNet(patch_size=64)
        a = torch.rand(2, 1, 64, 64)
        b = torch.rand(2, 1, 64, 64)
        with torch.no_grad():
            delta_ref = ref(a, b).numpy()
        delta = module.apply({"params": params}, _nhwc(a), _nhwc(b),
                             training=False)
        np.testing.assert_allclose(np.asarray(delta), delta_ref, atol=ATOL)

    def test_photometric_loss(self):
        """Same corner re-anchoring + warp + L1 as the reference
        (udh/udh/model.py:18-45), via the torch warp stub."""
        _seed_all(6)
        mods = load_reference()
        from hesic_tpu.geometry import photometric_loss
        delta = torch.randn(2, 4, 2) * 2
        img_a = torch.rand(2, 1, 64, 64)
        patch_b = torch.rand(2, 1, 32, 32)
        corners = torch.tensor([[10.0, 12], [42, 12], [42, 44],
                                [10, 44]]).repeat(2, 1, 1)
        ref_loss = mods["udh_model"].photometric_loss(
            delta, img_a, patch_b, corners).item()
        loss = photometric_loss(
            jnp.asarray(delta.numpy()), _nhwc(img_a), _nhwc(patch_b),
            jnp.asarray(corners.numpy()))
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)


class TestHESICParity:
    @pytest.mark.parametrize("identity_h", [True, False])
    def test_hesic_forward(self, identity_h):
        _seed_all(1)
        mods = load_reference()
        ref = mods["newnet1"].HSIC(N=16, M=24, K=2).eval()
        params = convert_state_dict(ref.state_dict(), "hesic")
        from hesic_tpu.models import HESIC
        module = HESIC(N=16, M=24, K=2)

        x1 = torch.rand(1, 3, 64, 64)
        x2 = torch.rand(1, 3, 64, 64)
        if identity_h:
            h = torch.eye(3)[None]
        else:
            h = torch.eye(3)[None] + torch.randn(1, 3, 3) * 1e-3
            h[:, 2, 2] = 1.0
        with torch.no_grad():
            out_ref = ref(x1, x2, h)
        out = module.apply({"params": params}, _nhwc(x1), _nhwc(x2),
                           jnp.asarray(h.numpy()), training=False)
        np.testing.assert_allclose(_to_nchw(out["x1_hat"]),
                                   out_ref["x1_hat"].numpy(), atol=ATOL)
        np.testing.assert_allclose(_to_nchw(out["x2_hat"]),
                                   out_ref["x2_hat"].numpy(), atol=ATOL)
        for k in ("y1", "y2", "z1", "z2"):
            np.testing.assert_allclose(
                _to_nchw(out["likelihoods"][k]),
                out_ref["likelihoods"][k].numpy(),
                rtol=LIK_RTOL, atol=1e-6)
