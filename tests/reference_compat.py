"""Import the reference implementation (/root/reference) for parity tests.

The reference is PUBLIC UNTRUSTED CONTENT: it is imported here ONLY to
instantiate its torch modules and verify that converted weights reproduce
its forward pass.  No code is copied; deps missing from this image (cv2,
kornia, torchvision, range_coder, the compressai C++ extensions) are
stubbed just enough for module import — none of the stubbed functionality
participates in the forward passes under test except ``kornia.warp_perspective``
/ ``get_perspective_transform``, which are reimplemented in torch below
against kornia's documented contract (inverse warp + bilinear + zero pad;
4-point DLT).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"
_cache: dict = {}


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _torch_warp_perspective(src, m, dsize, **kwargs):
    """Torch inverse-warp + bilinear + zero padding (kornia contract).

    Exact at integer sample positions, so identity-H parity is exact."""
    import torch

    b, c, h, w = src.shape
    ho, wo = dsize
    ys, xs = torch.meshgrid(torch.arange(ho, dtype=torch.float32),
                            torch.arange(wo, dtype=torch.float32),
                            indexing="ij")
    m_inv = torch.inverse(m.float())
    mi = m_inv[:, :, :, None, None]
    px = mi[:, 0, 0] * xs + mi[:, 0, 1] * ys + mi[:, 0, 2]
    py = mi[:, 1, 0] * xs + mi[:, 1, 1] * ys + mi[:, 1, 2]
    pz = mi[:, 2, 0] * xs + mi[:, 2, 1] * ys + mi[:, 2, 2]
    pz = torch.where(pz.abs() < 1e-8, torch.full_like(pz, 1e-8), pz)
    sx, sy = px / pz, py / pz                        # (B, Ho, Wo)

    x0 = torch.floor(sx)
    y0 = torch.floor(sy)
    wx1 = (sx - x0).unsqueeze(1)
    wy1 = (sy - y0).unsqueeze(1)
    x0 = x0.long()
    y0 = y0.long()

    def tap(yy, xx):
        mask = ((yy >= 0) & (yy <= h - 1) & (xx >= 0)
                & (xx <= w - 1)).unsqueeze(1)
        yc = yy.clamp(0, h - 1)
        xc = xx.clamp(0, w - 1)
        idx = (yc * w + xc).reshape(b, 1, -1).expand(b, c, ho * wo)
        vals = torch.gather(src.reshape(b, c, -1), 2, idx)
        return vals.reshape(b, c, ho, wo) * mask

    return (tap(y0, x0) * (1 - wy1) * (1 - wx1)
            + tap(y0, x0 + 1) * (1 - wy1) * wx1
            + tap(y0 + 1, x0) * wy1 * (1 - wx1)
            + tap(y0 + 1, x0 + 1) * wy1 * wx1)


def _torch_get_perspective_transform(src, dst):
    """4-point DLT solve (kornia contract); src/dst: (B, 4, 2)."""
    import torch

    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = torch.zeros_like(x)
    ones = torch.ones_like(x)
    ax = torch.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], -1)
    ay = torch.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], -1)
    a = torch.cat([ax, ay], dim=1)
    rhs = torch.cat([u, v], dim=1).unsqueeze(-1)
    h8 = torch.linalg.solve(a, rhs)[..., 0]
    return torch.cat(
        [h8, torch.ones(src.shape[0], 1, dtype=src.dtype)], -1
    ).reshape(-1, 3, 3)


def _install_stubs():
    import torch  # noqa: F401 (must exist; everything else is stubbed)

    if "cv2" not in sys.modules:
        _stub("cv2")
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tr = _stub("torchvision.transforms", ToTensor=object,
                   Compose=object, Normalize=object, Resize=object,
                   Grayscale=object, CenterCrop=object, RandomCrop=object,
                   ToPILImage=object)
        tv.transforms = tr
    if "kornia" not in sys.modules:
        _stub("kornia",
              warp_perspective=_torch_warp_perspective,
              get_perspective_transform=_torch_get_perspective_transform)
    if "range_coder" not in sys.modules:
        # our range coder mirrors the pip package's API (path-backed
        # construction, encode(list, cdf), decode(n, cdf)); injecting the
        # real classes makes the reference's own compress/decompress
        # runnable for the trained cross-implementation audit
        from hesic_tpu.codecs.rans import RangeDecoder as _RD
        from hesic_tpu.codecs.rans import RangeEncoder as _RE
        _stub("range_coder", RangeEncoder=_RE, RangeDecoder=_RD,
              prob_to_cum_freq=None, cum_freq_to_prob=None)
    if "pytorch_msssim" not in sys.modules:
        _stub("pytorch_msssim", ms_ssim=None)
    if "compressai._CXX" not in sys.modules:
        # our native quantizer implements the same integer algorithm
        from hesic_tpu.codecs.rans import pmf_to_quantized_cdf as _pq
        _stub("compressai._CXX",
              pmf_to_quantized_cdf=lambda pmf, prec: _pq(
                  np.asarray(pmf, np.float32), prec).tolist())
    if "compressai.ans" not in sys.modules:
        # byte-identical to the reference pybind extension (proven by
        # tests/fixtures/ref_rans_streams.npz), list-API compatible
        from hesic_tpu.codecs.rans import BufferedRansEncoder as _BRE
        from hesic_tpu.codecs.rans import RansDecoder as _RaD
        from hesic_tpu.codecs.rans import RansEncoder as _RaE
        _stub("compressai.ans", BufferedRansEncoder=_BRE,
              RansDecoder=_RaD, RansEncoder=_RaE)
    if "compressai.version" not in sys.modules:
        _stub("compressai.version", __version__="1.0.0+ref")


def _load_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns {priors, waseda, newnet1, newnet1_joint, mynet6, udh_model}."""
    if _cache:
        return _cache
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import compressai.models.priors as priors
    import compressai.models.waseda as waseda

    _cache.update(
        priors=priors,
        waseda=waseda,
        newnet1=_load_file("ref_newnet1", f"{REF}/ywz/mywork/newnet1.py"),
        newnet1_joint=_load_file("ref_newnet1_joint",
                                 f"{REF}/ywz/mywork/newnet1_joint.py"),
        mynet6=_load_file("ref_mynet6", f"{REF}/ywz/DSIC/mynet6.py"),
        mynet6_plus=_load_file("ref_mynet6_plus",
                               f"{REF}/ywz/DSIC/mynet6_plus.py"),
        udh_model=_load_file("ref_udh_model", f"{REF}/udh/udh/model.py"),
    )
    return _cache
