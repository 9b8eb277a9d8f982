"""Attribute the flagship fast-codec's device time between model blocks.

Times each building block of the codec programs STANDALONE at bench
shapes (batch 64, 512 px) on the real chip, with a forced one-element
fetch as the sync (block_until_ready can return early through the axon
tunnel), and prints ms + GFLOP + achieved TF/s per block.  The composite
program times (HESIC_SYNC=1 bench run) minus these attribute the
residual to data movement / fusion overhead.

Usage:  python tools/profile_fast.py  [BATCH=64 SIZE=512 REPS=3]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache
    _enable_compile_cache()
    from hesic_tpu.models import HESIC
    from hesic_tpu.models.hesic_fast import _gmm_freq_fast
    from hesic_tpu.geometry.fast_warp import warp_perspective_mxu

    b = int(os.environ.get("BATCH", "64"))
    hw = int(os.environ.get("SIZE", "512"))
    reps = int(os.environ.get("REPS", "3"))
    mm = int(os.environ.get("MM", "16"))
    module = HESIC(N=128, M=192, K=5, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)

    import flax
    # init at a tiny spatial size: the param shapes only depend on
    # channel dims, and a 512-px init compile takes minutes remotely
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x, x,
                         jnp.eye(3, dtype=jnp.float32)[None])["params"]
    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") \
        else params

    def apply(method, *args):
        return module.apply({"params": params}, *args, method=method)

    yhw = hw // 16
    zhw = yhw // 4
    m = module.M
    k = module.K
    x1 = jnp.asarray(rng.rand(b, hw, hw, 3).astype(np.float32))
    y1 = jnp.asarray(rng.randint(-8, 8, (b, yhw, yhw, m))
                     .astype(np.float32))
    z1 = jnp.asarray(rng.rand(b, zhw, zhw, module.N).astype(np.float32))
    h_id = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))
    gp_sigma = jnp.asarray(rng.rand(b, yhw, yhw, m * k)
                           .astype(np.float32) + 0.2)
    gp_mu = jnp.asarray(rng.randn(b, yhw, yhw, m * k).astype(np.float32))
    gp_w = jnp.asarray(rng.rand(b, 1, 1, m * k).astype(np.float32))
    center = jnp.zeros((b, m), jnp.int32)

    blocks = {
        "analysis1 (g_a 512->32)": (
            lambda xx: apply("analysis1", xx), (x1,)),
        "synthesis1 (g_s 32->512)": (
            lambda yy: apply("synthesis1", yy), (y1,)),
        "gmm1 head (z->params)": (
            lambda zz: apply("gmm1", zz), (z1,)),
        "gmm2 head (z,y->params)": (
            lambda zz, yy: apply("gmm2", zz, yy), (z1, y1)),
        f"pmf table (mm={mm}, K=5)": (
            lambda s, mu, w: _gmm_freq_fast(s, mu, w, mm, k,
                                            center=center)[0],
            (gp_sigma, gp_mu, gp_w)),
        "warp 512 (win=16)": (
            lambda xx, hh: warp_perspective_mxu(xx, hh, (hw, hw), 16)[0],
            (x1, h_id)),
    }

    print(f"batch={b} size={hw} reps={reps}")
    for name, (fn, args) in blocks.items():
        jfn = jax.jit(fn)
        out = jfn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(jnp.ravel(first)[:1])  # compile + settle
        try:
            fl = jfn.lower(*args).compile().cost_analysis()
            fl = (fl[0] if isinstance(fl, (list, tuple)) else fl).get(
                "flops", 0.0)
        except Exception:
            fl = 0.0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = jfn(*args)
            first = out[0] if isinstance(out, (tuple, list)) else out
            np.asarray(jnp.ravel(first)[:1])
            ts.append(time.time() - t0)
        ms = 1e3 * min(ts)
        tfs = fl / min(ts) / 1e12
        print(f"  {name:<28s} {ms:8.1f} ms   {fl / 1e9:9.1f} GF "
              f"  {tfs:6.1f} TF/s")


if __name__ == "__main__":
    main()
