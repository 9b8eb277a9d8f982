"""Stage-level timing of the HESIC+ wavefront device codec at bench settings.

Run from the repo root (axon plugin discovery needs the default sys.path):
  python -c "import sys; sys.path.insert(0,'.'); import runpy; \
             runpy.run_path('tools/profile_hplus.py', run_name='__main__')"

Uses the SAME module/calibration/shapes as BENCH_MODE=hesic-plus-device so
every compile hits the persistent cache.  Times each device program and each
host/sync boundary of HESICPlusDeviceCodec.compress/decompress separately.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from bench import _calibrate, _smooth_pair  # noqa: E402
from hesic_tpu.models import HESICPlus, HESICPlusCodec, HESICPlusDeviceCodec  # noqa: E402
from hesic_tpu.models.ar_device import wavefront_decode, wavefront_encode  # noqa: E402


def fetch_sync(t):
    """Tunnel-safe device sync (block_until_ready can return early)."""
    leaf = jax.tree_util.tree_leaves(t)[0]
    np.asarray(jax.jit(lambda a: a.ravel()[0])(leaf))


def timeit(label, fn, n=3, sync=True):
    out = fn()
    if sync:
        fetch_sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
        if sync:
            fetch_sync(out)
    dt = (time.time() - t0) / n * 1000
    print(f"  {label:34s} {dt:8.1f} ms")
    return out, dt


def main():
    hw = int(os.environ.get("BENCH_SIZE", "512"))
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    mm = int(os.environ.get("BENCH_MM", "16"))
    groups = int(os.environ.get("BENCH_GROUPS", "8"))
    calib = int(os.environ.get("BENCH_CALIB_STEPS", "60"))
    rng = np.random.RandomState(0)

    use_bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    module = HESICPlus(N=192, M=192,
                       dtype=jnp.bfloat16 if use_bf16 else None)
    t0 = time.time()
    params = _calibrate(module, rng, calib)
    base = HESICPlusCodec(module, params)
    base.update()
    codec = HESICPlusDeviceCodec(base, mm=mm, groups=groups)
    print(f"calibration + update: {time.time() - t0:.1f} s")

    xs = [_smooth_pair(rng, hw) for _ in range(batch)]
    x1 = jnp.asarray(np.concatenate([p[0] for p in xs]))
    x2 = jnp.asarray(np.concatenate([p[1] for p in xs]))
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (batch, 1, 1))

    # full warmup through the public API (compiles everything once)
    t0 = time.time()
    out = codec.compress(x1, x2, h)
    rec = codec.decompress(out["strings"])
    fetch_sync(rec["x2_hat"])
    print(f"warmup compress+decompress: {time.time() - t0:.1f} s")

    from hesic_tpu.geometry import warp_perspective
    size = (hw, hw)

    print(f"\n== compress stages (batch {batch}, {hw}²) ==")
    y1, _ = timeit("analysis1", lambda: base.jit("analysis1")(x1))
    z1, _ = timeit("hyper_analysis1", lambda: base.jit("hyper_analysis1")(y1))
    t0 = time.time()
    z1_strings = base.eb_compress("entropy_bottleneck1", z1)
    print(f"  {'eb_compress z1 (host+sync)':34s} {(time.time()-t0)*1000:8.1f} ms")
    t0 = time.time()
    z1_hat = base.eb_decompress("entropy_bottleneck1", z1_strings,
                                z1.shape[1:3])
    print(f"  {'eb_decompress z1 (host)':34s} {(time.time()-t0)*1000:8.1f} ms")
    pre1, _ = timeit("hyper_synthesis1",
                     lambda: base.jit("hyper_synthesis1")(z1_hat))
    wf1, _ = timeit("wavefront_encode eye1 (incl sync)",
                    lambda: wavefront_encode(codec.w1, y1, pre1, mm=mm,
                                             groups=groups), sync=False)
    wo1, c1, st1, y1_hat, r1, n1 = wf1
    x1_hat, _ = timeit("synthesis1", lambda: base.jit("synthesis1")(y1_hat))
    x1_warp, _ = timeit("warp_perspective(x1)",
                        lambda: warp_perspective(x1, h, size))
    y2, _ = timeit("analysis2", lambda: base.jit("analysis2")(x1_warp, x2))
    z2, _ = timeit("hyper_analysis2", lambda: base.jit("hyper_analysis2")(y2))
    t0 = time.time()
    z2_strings = base.eb_compress("entropy_bottleneck2", z2)
    z2_hat = base.eb_decompress("entropy_bottleneck2", z2_strings,
                                z2.shape[1:3])
    print(f"  {'eb z2 roundtrip (host)':34s} {(time.time()-t0)*1000:8.1f} ms")
    pre2, _ = timeit("hyper_synthesis2",
                     lambda: base.jit("hyper_synthesis2")(z2_hat))
    y1_prior, _ = timeit("left_prior",
                         lambda: base.jit("left_prior")(x1_hat, h))
    wf2, _ = timeit("wavefront_encode eye2 (incl sync)",
                    lambda: wavefront_encode(codec.w2, y2, pre2,
                                             post=y1_prior, mm=mm,
                                             groups=groups), sync=False)
    wo2, c2, st2, y2_hat, r2, n2 = wf2
    from hesic_tpu.codecs.device_rans import pack_stream
    t0 = time.time()
    b1 = pack_stream(wo1, c1, st1)
    b2 = pack_stream(wo2, c2, st2)
    print(f"  {'pack_stream both (d2h+host)':34s} {(time.time()-t0)*1000:8.1f} ms"
          f"   ({(len(b1)+len(b2))/1024:.0f} KiB)")

    print(f"\n== decompress stages ==")
    pre1d, _ = timeit("hyper_synthesis1",
                      lambda: base.jit("hyper_synthesis1")(z1_hat))
    wo1j, c1j, st1j = jnp.asarray(wo1), jnp.asarray(c1), jnp.asarray(st1)
    y1d, _ = timeit("wavefront_decode eye1",
                    lambda: wavefront_decode(codec.w1, pre1d, wo1j, c1j,
                                             st1j, mm=mm, groups=groups))
    x1d, _ = timeit("synthesis1", lambda: base.jit("synthesis1")(y1d))
    y1pd, _ = timeit("left_prior", lambda: base.jit("left_prior")(x1d, h))
    wo2j, c2j, st2j = jnp.asarray(wo2), jnp.asarray(c2), jnp.asarray(st2)
    y2d, _ = timeit("wavefront_decode eye2",
                    lambda: wavefront_decode(codec.w2, pre2, wo2j, c2j,
                                             st2j, post=y1pd, mm=mm,
                                             groups=groups))
    _, _ = timeit("warp(x1_hat)+synthesis2",
                  lambda: base.jit("synthesis2")(
                      y2d.astype(jnp.float32),
                      warp_perspective(x1d, h, size)))

    print(f"\n== e2e (public API, n=3) ==")
    t0 = time.time()
    for _ in range(3):
        out = codec.compress(x1, x2, h)
    print(f"  {'compress e2e':34s} {(time.time()-t0)/3*1000:8.1f} ms")
    t0 = time.time()
    for _ in range(3):
        rec = codec.decompress(out["strings"])
        fetch_sync(rec["x2_hat"])
    print(f"  {'decompress e2e':34s} {(time.time()-t0)/3*1000:8.1f} ms")
    print(f"  bpp_real={out['bpp_real']:.4f}  "
          f"pairs/s={batch/((time.time()-t0)/3 + 0):.2f} (dec only)")


if __name__ == "__main__":
    main()
