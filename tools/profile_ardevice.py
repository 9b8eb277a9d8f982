"""Stage timings for the wavefront device AR codec on the real TPU.

Times each stage of JointAutoregressiveDeviceCodec.compress/decompress
separately (kernel passes, the slot-stream rANS encode, escape fetch,
container work) so optimization targets are measured, not guessed.
Tunnel note: ~25 ms sync latency rides on every synchronous fetch.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(t):
    return np.asarray(jax.jit(lambda a: a.ravel()[0])(t))


def main():
    from hesic_tpu.models import (JointAutoregressiveCodec,
                                  JointAutoregressiveHierarchicalPriors)
    from hesic_tpu.models.ar_device import (
        JointAutoregressiveDeviceCodec, _run_wavefront, schedule,
        wavefront_valid_mask)
    from hesic_tpu.codecs.device_rans import rans_encode_grid

    hw = int(os.environ.get("BENCH_SIZE", "512"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    mm = int(os.environ.get("BENCH_MM", "16"))
    groups = int(os.environ.get("BENCH_GROUPS", "8"))
    rng = np.random.RandomState(0)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..",
                                 "bench.py"))
    benchmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(benchmod)

    module = JointAutoregressiveHierarchicalPriors(N=192, M=192)
    params = benchmod._calibrate_single(module, rng, 60)
    base = JointAutoregressiveCodec(module, params)
    base.update()
    codec = JointAutoregressiveDeviceCodec(base, mm=mm, groups=groups)

    xs = [benchmod._smooth_pair(rng, hw)[0] for _ in range(batch)]
    x = jnp.asarray(np.concatenate(xs))
    hy = wy = hw // 16
    m = 192
    n_levels, _, _, p_max = schedule(hy, wy)
    lanes = batch * p_max * (m // groups)

    y = base.jit("analysis")(x)
    z = base.jit("hyper_analysis")(y)
    z_hat = jnp.round(z)
    pre = base.jit("hyper_synthesis")(z_hat)
    post = jnp.zeros((batch, hy, wy, 0), jnp.float32)
    zimg = jnp.zeros((batch, hy, wy, m), jnp.int32)
    zl = jnp.zeros((lanes,), jnp.int32)
    dummy_w = jnp.zeros((lanes, 1), jnp.int32)

    def run_teacher():
        return _run_wavefront(codec.weights, pre, post, y, zimg, zimg,
                              dummy_w, zl, zl.astype(jnp.uint32),
                              jnp.bool_(True), hy, wy, mm, groups)

    st, fr, yh, rs = run_teacher()
    sync(yh)
    t0 = time.time()
    for _ in range(3):
        st, fr, yh, rs = run_teacher()
    sync(yh)
    print(f"wavefront teacher pass: {(time.time()-t0)/3*1000:.1f} ms")

    valid = wavefront_valid_mask(hy, wy, batch, groups, m)
    words, counts, states = rans_encode_grid(
        st.astype(jnp.uint32), fr.astype(jnp.uint32), valid)
    # bucket the word cap like the container does (the raw encoder
    # buffer is worst-case padded and would blow the decode VMEM)
    cap = max(16, (int(jnp.max(counts)) + 15) // 16 * 16)
    words = words[:, :cap]
    sync(counts)
    t0 = time.time()
    for _ in range(3):
        words, counts, states = rans_encode_grid(
            st.astype(jnp.uint32), fr.astype(jnp.uint32), valid)
    sync(counts)
    print(f"slot rANS encode (scan): {(time.time()-t0)/3*1000:.1f} ms "
          f"(T={st.shape[0]}, L={st.shape[1]}, cap={words.shape[1]})")
    words = words[:, :cap]

    t0 = time.time()
    rs_np = np.asarray(rs)
    print(f"resid d2h fetch: {(time.time()-t0)*1000:.1f} ms "
          f"({rs_np.nbytes/1e6:.1f} MB)")

    def run_decode():
        return _run_wavefront(codec.weights, pre, post,
                              jnp.zeros_like(y), zimg, zimg,
                              words.astype(jnp.int32),
                              counts.astype(jnp.int32),
                              states.astype(jnp.uint32),
                              jnp.bool_(False), hy, wy, mm, groups)

    _, _, yd, _ = run_decode()
    sync(yd)
    t0 = time.time()
    for _ in range(3):
        _, _, yd, _ = run_decode()
    sync(yd)
    print(f"wavefront decode pass: {(time.time()-t0)/3*1000:.1f} ms")
    print("decode bit-exact:", bool(jnp.all(yd == yh)))

    # full codec roundtrip for reference
    out = codec.compress(x)
    rec = codec.decompress(out["strings"])
    t0 = time.time()
    out = codec.compress(x)
    t1 = time.time()
    rec = codec.decompress(out["strings"])
    jax.block_until_ready(rec["x_hat"])
    t2 = time.time()
    print(f"full compress: {(t1-t0)*1000:.1f} ms  "
          f"full decompress: {(t2-t1)*1000:.1f} ms  "
          f"({batch} images)")


if __name__ == "__main__":
    main()
