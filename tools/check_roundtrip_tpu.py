"""Bit-exactness check of the fast codec ON the real TPU.

Asserts the decoder reproduces the encoder's integer latents exactly
(the core codec invariant), for both the batch container and the
per-pair container, including out-of-grid latents (escape path).
Usage: python tools/check_roundtrip_tpu.py [--mm 32] [--batch 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from hesic_tpu.models import HESIC, HESICFastCodec
    from bench import _smooth_pair

    p = argparse.ArgumentParser()
    p.add_argument("--mm", type=int, default=32)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--escape-mm", type=int, default=2,
                   help="second pass at a tiny grid so escape corrections "
                        "are guaranteed to trigger on-chip (0 disables)")
    args = p.parse_args()

    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    module = HESIC(N=128, M=192, K=5, dtype=jnp.bfloat16)
    codec = HESICFastCodec.init(
        module, [(1, args.hw, args.hw, 3), (1, args.hw, args.hw, 3),
                 (1, 3, 3)])
    codec = HESICFastCodec(codec.module, codec.params, mm=args.mm,
                           codec_batch=args.batch)
    codec.update()

    b = args.batch
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))
    xs = [_smooth_pair(rng, args.hw) for _ in range(b)]
    # amplify one pair so some latents fall beyond the +-mm grid and the
    # escape path is exercised
    x1 = np.concatenate([p_[0] for p_ in xs])
    x2 = np.concatenate([p_[1] for p_ in xs])
    x1[0] = np.clip(x1[0] * 40 - 20, -30, 30)
    x1, x2 = jnp.asarray(x1), jnp.asarray(x2)

    enc = codec._fn("transforms_enc")(codec.params, x1, x2, h)
    y1_true, y2_true = np.asarray(enc[0]), np.asarray(enc[1])
    n_out = int((np.abs(y1_true) > args.mm).sum()
                + (np.abs(y2_true) > args.mm).sum())
    print(f"latents beyond grid: {n_out}")

    def run(codec_, label):
        for mode in ("batch", "per-pair"):
            out = codec_.compress_fast(x1, x2, h,
                                       batch_container=(mode == "batch"))
            if mode == "batch":
                rec = codec_.decompress_fast_batch(out["blob"])
            else:
                rec = codec_.decompress_fast(out["blobs"])
            y1_dec = np.asarray(rec["y1_hat"]).astype(np.int64)
            y2_dec = np.asarray(rec["y2_hat"]).astype(np.int64)
            ok1 = np.array_equal(y1_dec, y1_true)
            ok2 = np.array_equal(y2_dec, y2_true)
            print(f"{label}/{mode}: y1 exact={ok1}  y2 exact={ok2}  "
                  f"bpp={out['bpp_real']:.4f}")
            if not (ok1 and ok2):
                bad = np.argwhere(y1_dec != y1_true)[:5]
                print("first y1 mismatches:", bad,
                      y1_dec[tuple(bad[0])] if bad.size else "",
                      y1_true[tuple(bad[0])] if bad.size else "")
                sys.exit(1)

    run(codec, f"mm={args.mm}")
    if args.escape_mm:
        tiny = HESICFastCodec(codec.module, codec.params,
                              mm=args.escape_mm, codec_batch=args.batch)
        tiny.update()
        # verify corrections actually trigger at this grid width
        cen1 = enc[5]
        rel = y1_true - np.asarray(cen1)[:, None, None, :]
        n_esc = int((np.abs(rel) > args.escape_mm).sum())
        print(f"escape pass mm={args.escape_mm}: {n_esc} corrections")
        assert n_esc > 0, "escape pass did not trigger any corrections"
        run(tiny, f"mm={args.escape_mm}")
    print("ROUNDTRIP OK")


if __name__ == "__main__":
    main()
