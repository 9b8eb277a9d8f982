"""Per-program timing breakdown of the HESIC fast codec at bench settings.

Usage: python -m hesic_tpu.utils.profile_fast [--size 512 --batch 16 --mm 16]

Times each jitted device program (steady-state, block_until_ready) so the
optimization loop has ground truth instead of whole-pipeline guesses.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, n=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--mm", type=int, default=16)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--codec-batch", type=int, default=8)
    args = p.parse_args(argv)

    import os
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from ..models import HESIC, HESICFastCodec

    module = HESIC(N=128, M=192, K=5,
                   dtype=jnp.bfloat16 if args.bf16 else None)
    codec = HESICFastCodec.init(
        module, [(1, args.size, args.size, 3), (1, args.size, args.size, 3),
                 (1, 3, 3)])
    codec = HESICFastCodec(codec.module, codec.params, mm=args.mm,
                           codec_batch=args.codec_batch)
    codec.update()

    b, hw = args.batch, args.size
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32)
    x2 = jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32)
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))

    report = {}

    t, enc = _time(lambda: codec._fn("transforms_enc")(
        codec.params, x1, x2, h))
    report["transforms_enc"] = t
    y1_hat, y2_hat, z1_sym, z2_sym = enc[0], enc[1], enc[2], enc[3]

    t, c1out = _time(codec._cond1, z1_sym)
    report["cond1"] = t
    freq1, cen1 = c1out
    t, s1 = _time(codec._fn("encode_stream"), freq1, y1_hat, cen1)
    report["encode_stream(y1)"] = t
    t, c2out = _time(codec._cond2, y1_hat, z2_sym, h)
    report["cond2"] = t
    freq2, cen2, x1_hat = c2out
    t, s2 = _time(codec._fn("encode_stream"), freq2, y2_hat, cen2)
    report["encode_stream(y2)"] = t

    y_shape = (hw // 16, hw // 16)
    t, _ = _time(codec._fn("decode_stream"), freq1, s1[0].astype(jnp.int32),
                 s1[1], s1[2], cen1, y_shape)
    report["decode_stream(y1)"] = t
    t, _ = _time(codec._fn("synth_out"), codec.params, x1_hat, y2_hat, h)
    report["synth_out"] = t

    # cond2 internals at the canonical batch
    b0 = args.codec_batch
    y1c, z2c, hc = y1_hat[:b0], z2_sym[:b0], h[:b0]

    def apply(method, *a):
        return codec.module.apply({"params": codec.params}, *a,
                                  method=method)

    syn1 = jax.jit(lambda y: apply("synthesis1", y.astype(jnp.float32)))
    t, x1c = _time(syn1, y1c)
    report["  cond2/synthesis1"] = t
    lp = jax.jit(lambda x, hh: apply("left_prior", x, hh))
    t, y1p = _time(lp, x1c, hc)
    report["  cond2/left_prior"] = t

    def gmm2_fn(z, yp):
        med2 = codec.params["entropy_bottleneck2"]["quantiles"][:, 0, 1]
        z2_hat = z.astype(jnp.float32) + med2
        return apply("gmm2", z2_hat, yp)

    gmm2 = jax.jit(gmm2_fn)
    t, g2 = _time(gmm2, z2c, y1p)
    report["  cond2/gmm2_heads"] = t

    from ..models.hesic_fast import _gmm_freq_fast
    freq_fn = jax.jit(lambda s, m, w: _gmm_freq_fast(s, m, w, args.mm, 5))
    t, _ = _time(freq_fn, g2[0], g2[1], g2[2])
    report["  cond2/gmm_freq(pmf+quant)"] = t

    # cond1 internals
    def gmm1_fn(z):
        med1 = codec.params["entropy_bottleneck1"]["quantiles"][:, 0, 1]
        return apply("gmm1", z.astype(jnp.float32) + med1)

    gmm1 = jax.jit(gmm1_fn)
    t, g1 = _time(gmm1, z1_sym[:b0])
    report["  cond1/gmm1_heads"] = t
    t, _ = _time(freq_fn, g1[0], g1[1], g1[2])
    report["  cond1/gmm_freq(pmf+quant)"] = t

    total = sum(v for k, v in report.items() if not k.startswith("  "))

    # end-to-end container paths (host work + transfers included)
    out = codec.compress_fast(x1, x2, h, batch_container=True)
    rec = codec.decompress_fast_batch(out["blob"])
    jax.block_until_ready(rec["x2_hat"])
    t0 = time.time()
    for _ in range(4):
        out = codec.compress_fast(x1, x2, h, batch_container=True)
    report["compress_fast e2e"] = t_enc = (time.time() - t0) / 4
    t0 = time.time()
    for _ in range(4):
        rec = codec.decompress_fast_batch(out["blob"])
        jax.block_until_ready(rec["x2_hat"])
    report["decompress e2e"] = t_dec = (time.time() - t0) / 4

    print(f"\n== fast-codec device timing (size={args.size} batch={b} "
          f"mm={args.mm} bf16={args.bf16} codec_batch={b0}) ==")
    for k, v in report.items():
        print(f"{k:32s} {v * 1e3:8.1f} ms")
    print(f"{'TOTAL (top-level, per rt)':32s} {total * 1e3:8.1f} ms"
          f"  -> {b / total:6.1f} pairs/s device-bound")
    print(f"{'serial e2e':32s} {b / (t_enc + t_dec):8.2f} pairs/s  "
          f"bpp={out['bpp_real']:.4f}")


if __name__ == "__main__":
    main()
