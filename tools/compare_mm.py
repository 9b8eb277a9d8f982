"""Rate evidence for the symbol-grid width: bpp at mm=16 vs mm=32.

Calibrates the bench model (same seeded short training run bench.py
uses), then round-trips the same batch through the fast codec at both
grid widths, reporting bpp_real, out-of-grid latent counts (escape
corrections), and decode exactness.  With per-channel grid centering the
narrow grid should cost ~nothing in rate on calibrated latents — this is
the measured demonstration backing the bench settings.

Usage: python tools/compare_mm.py [--batch 8] [--hw 512]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calibrate, _enable_compile_cache, _smooth_pair  # noqa: E402

_enable_compile_cache()


def main():
    import jax.numpy as jnp
    from hesic_tpu.models import HESIC, HESICFastCodec

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--calib-steps", type=int, default=60)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    module = HESIC(N=128, M=192, K=5, dtype=jnp.bfloat16)
    params = _calibrate(module, rng, args.calib_steps)

    b = args.batch
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))
    xs = [_smooth_pair(rng, args.hw) for _ in range(b)]
    x1 = jnp.asarray(np.concatenate([p_[0] for p_ in xs]))
    x2 = jnp.asarray(np.concatenate([p_[1] for p_ in xs]))

    results = {}
    for mm in (32, 16, 8):
        codec = HESICFastCodec(module, params, mm=mm, codec_batch=b)
        codec.update()
        out = codec.compress_fast(x1, x2, h, batch_container=True)
        rec = codec.decompress_fast_batch(out["blob"])
        enc = codec._fn("transforms_enc")(codec.params, x1, x2, h)
        exact = (np.array_equal(np.asarray(rec["y1_hat"], np.int64),
                                np.asarray(enc[0]))
                 and np.array_equal(np.asarray(rec["y2_hat"], np.int64),
                                    np.asarray(enc[1])))
        # count escape corrections actually stored (grid centers are
        # the data-derived per-channel means from transforms_enc)
        cen1, cen2 = enc[5], enc[6]
        n_out = 0
        for y, cen in ((enc[0], cen1), (enc[1], cen2)):
            rel = np.asarray(y) - np.asarray(cen)[:, None, None, :]
            n_out += int((np.abs(rel) > mm).sum())
        results[mm] = (out["bpp_real"], n_out, exact)
        print(f"mm={mm:2d}: bpp_real={out['bpp_real']:.4f}  "
              f"outliers={n_out}  exact={exact}")

    base = results[32][0]
    for mm in (16, 8):
        print(f"delta bpp mm={mm} vs mm=32: {results[mm][0] - base:+.5f}")
    if not all(r[2] for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
