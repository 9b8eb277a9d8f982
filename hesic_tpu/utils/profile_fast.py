"""Per-program timing breakdown of the HESIC fast codec at bench settings.

Usage: python -m hesic_tpu.utils.profile_fast [--size 512 --batch 16 --mm 16]

Times each jitted device program (steady-state, block_until_ready) so the
optimization loop has ground truth instead of whole-pipeline guesses.
Mirrors the call sequence of ``HESICFastCodec.compress_fast`` /
``decompress_fast_batch`` (models/hesic_fast.py), including the r3
container features: data-derived grid centers, per-eye mm buckets, and
positions-per-lane stream programs.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force a REAL device sync: block_until_ready can return early for
    some programs through the axon tunnel (observed: a pure-gather
    program timed as 0 ms), so fetch one element of the first array."""
    jax.block_until_ready(out)
    leaves = [lf for lf in jax.tree_util.tree_leaves(out)
              if hasattr(lf, "ravel")]
    if leaves:
        np.asarray(leaves[0].ravel()[0])


def _time(fn, *args, n=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    # the device queue is serial: enqueue n calls, one hard sync at the
    # end — measures true per-call device time with dispatch amortized
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n, out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arch", choices=("hesic", "dsic", "hesic-plus"),
                   default="hesic")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--mm", type=int, default=16)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--codec-batch", type=int, default=None,
                   help="canonical cond batch (default: --batch)")
    p.add_argument("--calib-steps", type=int, default=0,
                   help="seeded training steps before profiling (bench "
                        "realism: untrained priors emit ~16 b/sym)")
    args = p.parse_args(argv)

    import os
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if args.arch == "hesic-plus":
        return profile_hesic_plus(args)

    from ..models import DSIC, DSICFastCodec, HESIC, HESICFastCodec
    from ..models.hesic_fast import _gmm_freq_fast, auto_ppl, pick_mm

    b, hw = args.batch, args.size
    cb = args.codec_batch or b
    dtype = jnp.bfloat16 if args.bf16 else None
    if args.arch == "dsic":
        module = DSIC(N=128, M=192, F=21, C=32, K=5, dtype=dtype)
        codec_cls = DSICFastCodec
    else:
        module = HESIC(N=128, M=192, K=5, dtype=dtype)
        codec_cls = HESICFastCodec
    rng = np.random.RandomState(0)
    if args.calib_steps > 0:
        import sys
        sys.path.insert(0, os.getcwd())
        from bench import _calibrate
        params = _calibrate(module, rng, args.calib_steps,
                            arch=args.arch)
        codec = codec_cls(module, params, mm=args.mm, codec_batch=cb)
    else:
        shapes = [(1, hw, hw, 3), (1, hw, hw, 3)]
        if args.arch != "dsic":
            shapes.append((1, 3, 3))   # DSIC's forward takes (x1, x2)
        codec = codec_cls.init(module, shapes)
        codec = codec_cls(codec.module, codec.params, mm=args.mm,
                          codec_batch=cb)
    codec.update()

    def smooth(shape):
        base = rng.rand(*[s // 8 for s in shape[:-1]], shape[-1])
        t = jnp.asarray(base, jnp.float32)
        return jax.image.resize(t, shape, "bilinear")

    x1 = smooth((b, hw, hw, 3))
    x2 = smooth((b, hw, hw, 3))
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))

    report = {}

    t, enc = _time(lambda: codec._fn("transforms_enc")(
        codec.params, x1, x2, h))
    report["transforms_enc"] = t
    (y1_hat, y2_hat, z1_sym, z2_sym, _wov, dc1, dc2, sp1, sp2) = enc
    sp1_np, sp2_np, dc1_np, dc2_np = jax.device_get((sp1, sp2, dc1, dc2))
    mm1 = pick_mm(int(sp1_np), codec.mm)
    mm2 = pick_mm(int(sp2_np), codec.mm)
    cen1 = jnp.asarray(dc1_np)
    cen2 = jnp.asarray(dc2_np)

    t, freq1 = _time(codec._cond1, z1_sym, cen1, mm1)
    report["cond1"] = t
    t, c2out = _time(codec._cond2, y1_hat, z2_sym, h, cen2, mm2)
    report["cond2"] = t
    freq2, x1_hat = c2out

    hw_y = y1_hat.shape[1] * y1_hat.shape[2]
    ppl = auto_ppl(hw_y, codec.ppl)
    cap = codec._enc_cap(ppl, codec.module.M)
    enc1, dec1 = codec._stream_fns(ppl, cap, mm1)
    enc2, dec2 = codec._stream_fns(ppl, cap, mm2)
    t, s1 = _time(enc1, freq1, y1_hat, cen1)
    report[f"encode_stream(y1, ppl={ppl})"] = t
    t, s2 = _time(enc2, freq2, y2_hat, cen2)
    report["encode_stream(y2)"] = t

    y_shape = (y1_hat.shape[1], y1_hat.shape[2])
    t, _ = _time(dec1, freq1, s1[0].astype(jnp.int32), s1[1], s1[2],
                 cen1, y_shape, s1[4])
    report["decode_stream(y1)"] = t
    t, _ = _time(codec._fn("synth_out"), codec.params, x1_hat, y2_hat, h)
    report["synth_out"] = t

    # ---- cond internals at the canonical batch (HESIC layout only:
    # DSIC's analysis1/synthesis1 return tap tuples and its gmm2
    # conditions on the un-warped left latent) ----
    if args.arch == "hesic":
        b0 = cb
        y1c, z2c, hc = y1_hat[:b0], z2_sym[:b0], h[:b0]

        def apply(method, *a):
            return codec.module.apply({"params": codec.params}, *a,
                                      method=method)

        syn1 = jax.jit(lambda y: apply("synthesis1",
                                       y.astype(jnp.float32)))
        t, x1c = _time(syn1, y1c)
        report["  cond2/synthesis1"] = t

        from ..geometry.fast_warp import warp_perspective_mxu

        def reenc_fn(x, hh):
            size = (x.shape[1], x.shape[2])
            xw, _ = warp_perspective_mxu(x, hh, size)
            return jnp.round(apply("analysis1", xw))

        reenc = jax.jit(reenc_fn)
        t, y1p = _time(reenc, x1c, hc)
        report["  cond2/warp+analysis1"] = t

        def gmm2_fn(z, yp):
            med2 = codec.params["entropy_bottleneck2"]["quantiles"][:, 0, 1]
            z2_hat = z.astype(jnp.float32) + med2
            return apply("gmm2", z2_hat, yp)

        gmm2 = jax.jit(gmm2_fn)
        t, g2 = _time(gmm2, z2c, y1p)
        report["  cond2/gmm2_heads"] = t

        freq_fn = jax.jit(lambda s, m, w, c: _gmm_freq_fast(
            s, m, w, mm2, codec.module.K, center=c)[0])
        t, _ = _time(freq_fn, g2[0], g2[1], g2[2], cen2[:b0])
        report["  cond2/gmm_freq(pmf+quant)"] = t

        # cond1 internals
        def gmm1_fn(z):
            med1 = codec.params["entropy_bottleneck1"]["quantiles"][:, 0, 1]
            return apply("gmm1", z.astype(jnp.float32) + med1)

        gmm1 = jax.jit(gmm1_fn)
        t, g1 = _time(gmm1, z1_sym[:b0])
        report["  cond1/gmm1_heads"] = t
        freq_fn1 = jax.jit(lambda s, m, w, c: _gmm_freq_fast(
            s, m, w, mm1, codec.module.K, center=c)[0])
        t, _ = _time(freq_fn1, g1[0], g1[1], g1[2], cen1[:b0])
        report["  cond1/gmm_freq(pmf+quant)"] = t

    total = sum(v for k, v in report.items() if not k.startswith("  "))

    # end-to-end container paths (host work + transfers included)
    out = codec.compress_fast(x1, x2, h, batch_container=True)
    rec = codec.decompress_fast_batch(out["blob"])
    jax.block_until_ready(rec["x2_hat"])
    t0 = time.time()
    for _ in range(4):
        out = codec.compress_fast(x1, x2, h, batch_container=True)
    t_enc = (time.time() - t0) / 4
    report["compress_fast e2e"] = t_enc
    t0 = time.time()
    for _ in range(4):
        rec = codec.decompress_fast_batch(out["blob"])
        jax.block_until_ready(rec["x2_hat"])
    t_dec = (time.time() - t0) / 4
    report["decompress_fast e2e"] = t_dec

    print(f"\n{args.arch.upper()} fast codec profile  "
          f"size={hw} batch={b} mm={args.mm} "
          f"(mm1={mm1} mm2={mm2}) ppl={ppl} bf16={bool(args.bf16)} "
          f"bpp_real={out['bpp_real']:.4f}")
    for k, v in report.items():
        print(f"  {k:32s} {v * 1000:8.1f} ms")
    print(f"  {'device programs (sum)':32s} {total * 1000:8.1f} ms")
    print(f"  roundtrip e2e: {(t_enc + t_dec) * 1000:.1f} ms "
          f"-> {b / (t_enc + t_dec):.2f} pairs/s")


def profile_hesic_plus(args):
    """Per-phase breakdown of the HESIC+ wavefront device codec
    (HESICPlusDeviceCodec): enc transforms, the shared both-eyes chain
    (teacher and decode directions), the two Mosaic pairs encoders, the
    batched host fetch, host EB z coding, and the dec-only output —
    mirroring the call sequence of ar_device.py compress/decompress."""
    import os
    import sys

    from ..models import HESICPlus, HESICPlusCodec, HESICPlusDeviceCodec
    from ..models.ar_device import schedule, wavefront_valid_mask

    b, hw = args.batch, args.size
    dtype = jnp.bfloat16 if args.bf16 else None
    rng = np.random.RandomState(0)
    module = HESICPlus(N=192, M=192, dtype=dtype)
    if args.calib_steps > 0:
        sys.path.insert(0, os.getcwd())
        from bench import _calibrate
        params = _calibrate(module, rng, args.calib_steps)
        base = HESICPlusCodec(module, params)
    else:
        base = HESICPlusCodec.init(
            module, [(1, hw, hw, 3), (1, hw, hw, 3), (1, 3, 3)])
    base.update()
    codec = HESICPlusDeviceCodec(base, mm=args.mm)

    # correlated stereo pairs exactly like the bench (uncorrelated eyes
    # blow the cross-eye-conditioned y2 payload to ~1.5 bpp and distort
    # every stream/coding phase)
    sys.path.insert(0, os.getcwd())
    from bench import _smooth_pair
    xs = [_smooth_pair(rng, hw) for _ in range(b)]
    x1 = jnp.asarray(np.concatenate([p[0] for p in xs]))
    x2 = jnp.asarray(np.concatenate([p[1] for p in xs]))
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (b, 1, 1))
    hy, wy = hw // 16, hw // 16
    m = codec.w1.ctx_kernel.shape[2]
    cap = codec.cap
    params = base.params

    report = {}
    t, enc = _time(lambda: codec._enc_transforms()(params, x1, x2, h))
    report["enc_transforms"] = t
    y1, y2, z1_sym, z2_sym = enc

    lanes = codec._lanes(b, hy, wy)
    zw = jnp.zeros((lanes, cap), jnp.int32)
    zl = jnp.zeros((lanes,), jnp.int32)
    zs = zl.astype(jnp.uint32)
    zi = jnp.zeros((b, hy, wy, m), jnp.int32)
    chain = codec._chain()
    t, tout = _time(lambda: chain(
        params, z1_sym, z2_sym, y1, y2, zw, zl, zs, zw, zl, zs,
        zi, zi, zi, zi, h, jnp.bool_(True)))
    report["chain (teacher: 2x wavefront)"] = t
    s1, f1, s2, f2, y1_hat, y2_hat, x1_hat, r1, r2, n1_d, n2_d = tout

    valid = wavefront_valid_mask(hy, wy, b, codec.groups, m)
    t, p1 = _time(codec._dispatch_pairs, s1, f1, valid, cap)
    report["pairs_encode(y1)"] = t
    t, p2 = _time(codec._dispatch_pairs, s2, f2, valid, cap)
    report["pairs_encode(y2)"] = t
    wo1, c1_d, st1 = p1
    wo2, c2_d, st2 = p2

    t0 = time.time()
    fetched = jax.device_get((z1_sym, z2_sym, wo1, c1_d, st1,
                              wo2, c2_d, st2, n1_d, n2_d))
    report["host fetch (batched)"] = time.time() - t0
    z1s_np, z2s_np = fetched[0], fetched[1]

    from ..entropy_models.codec import compress_with_indexes
    t0 = time.time()
    for name, sym in (("entropy_bottleneck1", z1s_np),
                      ("entropy_bottleneck2", z2s_np)):
        idx = np.broadcast_to(
            np.arange(sym.shape[-1], dtype=np.int32), sym.shape)
        compress_with_indexes(sym, idx, base.tables[name])
    report["host z rANS (2 eyes)"] = time.time() - t0

    yzero = jnp.zeros((b, hy, wy, m), jnp.float32)
    t, dout = _time(lambda: chain(
        params, z1_sym, z2_sym, yzero, yzero,
        wo1.astype(jnp.int32), c1_d.astype(jnp.int32), st1,
        wo2.astype(jnp.int32), c2_d.astype(jnp.int32), st2,
        zi, zi, zi, zi, h, jnp.bool_(False)))
    report["chain (decode: 2x wavefront)"] = t
    t, _ = _time(codec._dec_out(), params, dout[5], dout[6], h)
    report["dec_out (synthesis2)"] = t

    out = codec.compress(x1, x2, h)
    rec = codec.decompress(out["strings"])
    jax.block_until_ready(rec["x2_hat"])
    t0 = time.time()
    for _ in range(4):
        out = codec.compress(x1, x2, h)
    t_enc = (time.time() - t0) / 4
    report["compress e2e"] = t_enc
    t0 = time.time()
    for _ in range(4):
        rec = codec.decompress(out["strings"])
        jax.block_until_ready(rec["x2_hat"])
    t_dec = (time.time() - t0) / 4
    report["decompress e2e"] = t_dec

    print(f"\nHESIC-PLUS device codec profile  size={hw} batch={b} "
          f"mm={args.mm} groups={codec.groups} cap={cap} "
          f"bf16={bool(args.bf16)} bpp_real={out['bpp_real']:.4f}")
    for k, v in report.items():
        print(f"  {k:32s} {v * 1000:8.1f} ms")
    print(f"  roundtrip e2e: {(t_enc + t_dec) * 1000:.1f} ms "
          f"-> {b / (t_enc + t_dec):.2f} pairs/s")


if __name__ == "__main__":
    main()
