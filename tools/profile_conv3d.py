"""Micro-benchmark: DSIC CostVolume Conv3D formulations on TPU.

The cost-volume 3-D branch (dsic.py Conv3D; reference mynet6.py:185-249)
convolves (B, D=32, H, W, F0=7) volumes with 5x5x5 kernels, 7->7
channels.  On the MXU the natural NDHWC conv yields matmuls with only 7
output columns (of 128 lanes) — suspected ~5% lane utilization.  The
banded variant folds the disparity axis into channels: a 5x5 2-D conv
with D*F0=224 -> 224 channels whose weight is block-banded over
disparity (5 of 32 blocks non-zero).  6.4x the FLOPs, but full lanes.

Run (repo root):
  python -c "import sys; sys.path.insert(0,'.'); import runpy; \
             runpy.run_path('tools/profile_conv3d.py', run_name='__main__')"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def conv3d_ndhwc(x, kernel):
    p = kernel.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1),
        padding=((p, p), (p, p), (p, p)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_banded(x, kernel):
    """Same op through the productized banded path: the Conv3D module
    in models/dsic.py applied to the disparity-folded layout (one
    band-builder implementation, not a copy)."""
    from hesic_tpu.models.dsic import Conv3D

    b, dd, h, w, ci = x.shape
    co = kernel.shape[-1]
    mod = Conv3D(co, kernel_size=kernel.shape[0], folds=dd)
    x2d = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, dd * ci)
    params = {"kernel": kernel,
              "bias": jnp.zeros((co,), kernel.dtype)}
    out = mod.apply({"params": params}, x2d)
    return out.reshape(b, h, w, dd, co).transpose(0, 3, 1, 2, 4)


def _timed(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # tunnel-safe sync
    np.asarray(jax.jit(lambda t: t.ravel()[0])(out))
    return (time.time() - t0) / n


def main():
    rng = np.random.RandomState(0)
    for (b, d, h, w, f0), dt in [
        ((16, 32, 256, 256, 7), jnp.bfloat16),
        ((16, 32, 128, 128, 7), jnp.bfloat16),
    ]:
        x = jnp.asarray(rng.randn(b, d, h, w, f0), dt)
        k = jnp.asarray(rng.randn(5, 5, 5, f0, f0) * 0.05, dt)
        f_nd = jax.jit(conv3d_ndhwc)
        f_bd = jax.jit(conv3d_banded)
        # correctness (loose: bf16 + different accumulation order)
        a = np.asarray(f_nd(x, k), np.float32)
        bb = np.asarray(f_bd(x, k), np.float32)
        err = np.max(np.abs(a - bb)) / (np.max(np.abs(a)) + 1e-9)
        t_nd = _timed(f_nd, x, k)
        t_bd = _timed(f_bd, x, k)
        gf = 2 * b * d * h * w * 125 * f0 * f0 / 1e9
        print(f"({b},{d},{h},{w},{f0}) {dt.__name__}: "
              f"ndhwc {t_nd*1e3:7.1f} ms ({gf/t_nd/1e3:6.2f} TF/s eff)  "
              f"banded {t_bd*1e3:7.1f} ms ({gf/t_bd/1e3:6.2f} TF/s eff)  "
              f"rel_err {err:.2e}")


if __name__ == "__main__":
    main()
