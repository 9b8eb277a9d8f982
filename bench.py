"""Benchmark: HESIC end-to-end real-bitstream enc+dec throughput.

Measures 512x512 stereo pairs/sec/chip through the full HESIC fast codec —
transforms, GMM CDF construction AND interleaved rANS entropy coding all on
the TPU; only compressed bytes + tiny z symbol tensors cross the host link.
Prints ONE JSON line.

Baseline (BASELINE.md): the reference publishes no wall-clock numbers; the
driver's north-star target is 25 pairs/s/chip enc+dec, so
vs_baseline = pairs_per_sec / 25.

Inputs are smooth synthetic stereo pairs (low-pass-filtered noise shifted
by a small homography) — representative of natural-image latent statistics,
unlike uniform noise.
"""

import json
import os
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 25.0


def _enable_compile_cache():
    """Persistent XLA-executable cache: bench wall time is dominated by
    remote compiles (~10 programs, 8-17 min first run); cached reruns
    skip them entirely."""
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: flag names differ; cache is an optimization only


_enable_compile_cache()


def _wait_for_backend():
    """Ride out transient TPU-tunnel outages before benching.

    The axon backend intermittently fails init with UNAVAILABLE for
    minutes at a time (observed round 3); once a process fails init the
    failure can stick, so probe in SUBPROCESSES and only proceed in this
    process after a probe succeeds.  Healthy path costs one ~15 s probe.
    Bounded: BENCH_BACKEND_TRIES (default 6) x BENCH_BACKEND_WAIT_S
    (default 120 s between probes)."""
    import subprocess
    import sys
    tries = int(os.environ.get("BENCH_BACKEND_TRIES", "6"))
    wait_s = float(os.environ.get("BENCH_BACKEND_WAIT_S", "120"))
    for i in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert len(jax.devices()) > 0"],
                capture_output=True, timeout=300)
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace").strip().splitlines()
            err = err[-1] if err else "unknown"
        except subprocess.TimeoutExpired:
            err = "probe timed out (300 s)"
        if i + 1 == tries:
            print(f"backend still unavailable after {tries} probes: "
                  f"{err}", file=sys.stderr)
            return  # let the real run produce the authoritative error
        print(f"backend probe {i + 1}/{tries} failed ({err}); "
              f"retrying in {wait_s:.0f} s", file=sys.stderr)
        time.sleep(wait_s)


def _smooth_pair(rng, hw):
    """Low-pass random field + a shifted copy as the second eye.

    Amplitude is kept moderate so the UNTRAINED bench model produces
    payload sizes in the range a trained model produces on natural images
    (~0.3-1 bpp) — throughput is what's being measured, not RD.
    """
    base = (0.5 + 0.25 * rng.randn(hw // 16 + 2, hw // 16 + 2, 3)
            ).astype(np.float32)
    base = np.clip(base, 0, 1)
    base = np.repeat(np.repeat(base, 2, 0), 2, 1)
    idx = np.linspace(0, base.shape[0] - 1.001, hw)
    xi = idx.astype(np.int32)
    fi = (idx - xi).astype(np.float32)
    rows = (base[xi] * (1 - fi)[:, None, None]
            + base[xi + 1] * fi[:, None, None])          # (hw, W0, 3)
    up = (rows[:, xi] * (1 - fi)[None, :, None]
          + rows[:, xi + 1] * fi[None, :, None])          # (hw, hw, 3)
    x1 = up
    x2 = np.roll(up, 3, axis=1) * 0.98 + 0.01
    return x1[None], x2[None]


def _calibrate(module, rng, steps: int, hw: int = 256, batch: int = 4,
               arch: str = "hesic"):
    """Short seeded training run so the bench model's entropy code is
    sane — an untrained prior maxes out bits/symbol and the benchmark
    would measure pathological payload sizes instead of realistic ones.

    ``arch='dsic'`` drops the homography input (DSIC's forward takes
    (x1, x2) only)."""
    import jax
    import jax.numpy as jnp
    from hesic_tpu.training import (TrainState, make_optimizer,
                                    make_train_step,
                                    stereo_rate_distortion_loss)
    with_h = arch != "dsic"

    def loss_fn(module, params, batch_d, rng_key):
        fwd_args = (batch_d["x1"], batch_d["x2"])
        if with_h:
            fwd_args += (batch_d["h"],)
        out = module.apply({"params": params}, *fwd_args, training=True,
                           rngs={"noise": rng_key})
        rd = stereo_rate_distortion_loss(out, batch_d["x1"],
                                         batch_d["x2"], lmbda=1e-2)
        aux = module.apply({"params": params}, method="aux_loss")
        return rd["loss"] + aux, {"bpp": rd["bpp_loss"]}

    xs = [_smooth_pair(rng, hw) for _ in range(batch)]
    batch_d = {
        "x1": jnp.asarray(np.concatenate([p[0] for p in xs])),
        "x2": jnp.asarray(np.concatenate([p[1] for p in xs])),
        "h": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None],
                      (batch, 1, 1)),
    }
    init_args = (batch_d["x1"][:1], batch_d["x2"][:1])
    if with_h:
        init_args += (batch_d["h"][:1],)
    params = module.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        *init_args, training=True)["params"]
    tx = make_optimizer(1e-4, 1e-3)
    state = TrainState.create(params, tx)
    step = make_train_step(module, tx, loss_fn)
    key = jax.random.PRNGKey(7)
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch_d, sub)
    return state.params


def _calibrate_single(module, rng, steps: int, hw: int = 256,
                      batch: int = 4):
    """Short seeded training for single-image (mbt2018-family) bench
    models — untrained priors max out bits/symbol (measured ~16 b/sym),
    which both misrepresents throughput and blows the wavefront decode
    kernel's in-VMEM word buffers."""
    import jax
    import jax.numpy as jnp
    from hesic_tpu.training import (TrainState, make_optimizer,
                                    make_train_step,
                                    rate_distortion_loss)

    def loss_fn(module, params, batch_d, rng_key):
        out = module.apply({"params": params}, batch_d["x"],
                           training=True, rngs={"noise": rng_key})
        rd = rate_distortion_loss(out, batch_d["x"], lmbda=1e-2)
        aux = module.apply({"params": params}, method="aux_loss")
        return rd["loss"] + aux, {"bpp": rd["bpp_loss"]}

    xs = [_smooth_pair(rng, hw)[0] for _ in range(batch)]
    batch_d = {"x": jnp.asarray(np.concatenate(xs))}
    params = module.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch_d["x"][:1], training=True)["params"]
    tx = make_optimizer(1e-4, 1e-3)
    state = TrainState.create(params, tx)
    step = make_train_step(module, tx, loss_fn)
    key = jax.random.PRNGKey(7)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, _ = step(state, batch_d, sub)
    return state.params


def bench_ar():
    """Secondary mode (BENCH_MODE=ar): the autoregressive codec path
    (mbt2018) — native C++ raster coder, thread-parallel across the batch.
    Reference pain point being measured: priors.py:519 'Warning, this is
    slow' (per-pixel Python<->C++ coding loops)."""
    import jax
    import jax.numpy as jnp
    from hesic_tpu.models import (JointAutoregressiveCodec,
                                  JointAutoregressiveHierarchicalPriors)

    hw = int(os.environ.get("BENCH_SIZE", "512"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "2"))
    rng = np.random.RandomState(0)

    module = JointAutoregressiveHierarchicalPriors(N=192, M=192)
    codec = JointAutoregressiveCodec.init(module, [(1, hw, hw, 3)])
    codec = JointAutoregressiveCodec(codec.module, codec.params)
    codec.update()

    xs = [_smooth_pair(rng, hw)[0] for _ in range(batch)]
    x = jnp.asarray(np.concatenate(xs))

    out = codec.compress(x)  # warmup/compile
    rec = codec.decompress(out["strings"], out["shape"])
    jax.block_until_ready(rec["x_hat"])

    start = time.time()
    for _ in range(n_batches):
        out = codec.compress(x)
        rec = codec.decompress(out["strings"], out["shape"])
    jax.block_until_ready(rec["x_hat"])
    elapsed = time.time() - start
    images_per_sec = n_batches * batch / elapsed

    print(json.dumps({
        "metric": f"mbt2018_images_per_sec_{hw}px_encdec",
        "value": round(images_per_sec, 3),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_sec / BASELINE_PAIRS_PER_SEC, 3),
    }))


def bench_ar_device():
    """Secondary mode (BENCH_MODE=ar-device): the wavefront device AR
    codec (models/ar_device.py) on mbt2018 — the reference's '#1 perf
    cliff' restructured as a TPU scan (vs ~1 image/s for the host-serial
    native coder on this container's single core)."""
    import jax
    import jax.numpy as jnp
    from hesic_tpu.models import (JointAutoregressiveCodec,
                                  JointAutoregressiveDeviceCodec,
                                  JointAutoregressiveHierarchicalPriors)

    hw = int(os.environ.get("BENCH_SIZE", "512"))
    # batch 11 fills the wavefront lane tile (p_max=11 at 512²; see
    # bench_hesic_plus_device): measured 29.7 vs 25.9 images/s at batch 8
    batch = int(os.environ.get("BENCH_BATCH", "11"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "4"))
    mm = int(os.environ.get("BENCH_MM", "16"))
    groups = int(os.environ.get("BENCH_GROUPS", "8"))
    calib_steps = int(os.environ.get("BENCH_CALIB_STEPS", "60"))
    rng = np.random.RandomState(0)

    module = JointAutoregressiveHierarchicalPriors(N=192, M=192)
    if calib_steps > 0:
        params = _calibrate_single(module, rng, calib_steps)
        base = JointAutoregressiveCodec(module, params)
    else:
        base = JointAutoregressiveCodec.init(module, [(1, hw, hw, 3)])
    base.update()
    codec = JointAutoregressiveDeviceCodec(base, mm=mm, groups=groups)

    xs = [_smooth_pair(rng, hw)[0] for _ in range(batch)]
    x = jnp.asarray(np.concatenate(xs))
    out = codec.compress(x)  # warmup/compile
    rec = codec.decompress(out["strings"])
    np.testing.assert_array_equal(np.asarray(rec["y_hat"]),
                                  np.asarray(out["y_hat"]))
    jax.block_until_ready(rec["x_hat"])

    # software pipeline (as in the flagship loop): encode batch i+1 on a
    # worker thread while the main thread decodes batch i, so decode
    # dispatch/host work overlaps the encoder's sync waits
    from concurrent.futures import ThreadPoolExecutor
    ex = ThreadPoolExecutor(1)
    start = time.time()
    fut = ex.submit(codec.compress, x)
    for i in range(n_batches):
        out = fut.result()
        if i + 1 < n_batches:
            fut = ex.submit(codec.compress, x)
        rec = codec.decompress(out["strings"])
    jax.block_until_ready(rec["x_hat"])
    elapsed = time.time() - start
    ex.shutdown()
    images_per_sec = n_batches * batch / elapsed

    print(json.dumps({
        "metric": f"mbt2018_device_images_per_sec_{hw}px_encdec",
        "value": round(images_per_sec, 3),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_sec / BASELINE_PAIRS_PER_SEC, 3),
    }))


def bench_hesic_plus_device():
    """Secondary mode (BENCH_MODE=hesic-plus-device): HESIC+ (both eyes
    autoregressive, reference newnet1_joint.py) through the wavefront
    device codec — the reference's best-RD model and its '#1 perf cliff'
    (r2 measured 0.89 pairs/s with the lax.scan backend)."""
    import jax
    import jax.numpy as jnp
    from hesic_tpu.models import (HESICPlus, HESICPlusCodec,
                                  HESICPlusDeviceCodec)

    hw = int(os.environ.get("BENCH_SIZE", "512"))
    # batch 11 fills the wavefront kernel's lane tile exactly: at 512²
    # p_max = 11, so r_dim = B·11 pads to the 128-lane boundary at B=11
    # (measured 24.2 vs 16.5 pairs/s at B=8; B=12 would double padding)
    batch = int(os.environ.get("BENCH_BATCH", "11"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "4"))
    mm = int(os.environ.get("BENCH_MM", "16"))
    groups = int(os.environ.get("BENCH_GROUPS", "8"))
    # word-buffer cap: the wavefront kernel's per-level word read is a
    # one-hot sum over the cap axis, so decode cost scales linearly with
    # cap.  Calibrated payloads run ~12 words/lane mean; 64 leaves
    # headroom and the encoder retry-doubles on pathological overflow.
    cap = int(os.environ.get("BENCH_CAP", "64"))
    rng = np.random.RandomState(0)

    calib_steps = int(os.environ.get("BENCH_CALIB_STEPS", "60"))
    use_bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    module = HESICPlus(N=192, M=192,
                       dtype=jnp.bfloat16 if use_bf16 else None)
    if calib_steps > 0:
        params = _calibrate(module, rng, calib_steps)
        base = HESICPlusCodec(module, params)
    else:
        base = HESICPlusCodec.init(
            module, [(1, hw, hw, 3), (1, hw, hw, 3), (1, 3, 3)])
    base.update()
    codec = HESICPlusDeviceCodec(base, mm=mm, groups=groups, cap=cap)

    xs = [_smooth_pair(rng, hw) for _ in range(batch)]
    x1 = jnp.asarray(np.concatenate([p[0] for p in xs]))
    x2 = jnp.asarray(np.concatenate([p[1] for p in xs]))
    h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (batch, 1, 1))

    out = codec.compress(x1, x2, h)   # warmup/compile
    rec = codec.decompress(out["strings"])
    np.testing.assert_array_equal(np.asarray(rec["y1_hat"]),
                                  np.asarray(out["y1_hat"]))
    np.testing.assert_array_equal(np.asarray(rec["y2_hat"]),
                                  np.asarray(out["y2_hat"]))
    jax.block_until_ready(rec["x2_hat"])

    # software pipeline (as in the flagship loop): encode batch i+1 on a
    # worker thread while the main thread decodes batch i
    from concurrent.futures import ThreadPoolExecutor
    ex = ThreadPoolExecutor(1)
    start = time.time()
    fut = ex.submit(codec.compress, x1, x2, h)
    for i in range(n_batches):
        out = fut.result()
        if i + 1 < n_batches:
            fut = ex.submit(codec.compress, x1, x2, h)
        rec = codec.decompress(out["strings"])
    jax.block_until_ready(rec["x2_hat"])
    elapsed = time.time() - start
    ex.shutdown()
    pairs_per_sec = n_batches * batch / elapsed

    print(json.dumps({
        "metric": f"hesic_plus_device_pairs_per_sec_{hw}px_encdec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        **_mfu_fields(codec, hw, pairs_per_sec, batch=batch),
    }))


def _mfu_fields(codec, hw: int, pairs_per_sec: float, **kw) -> dict:
    """MFU from XLA's own cost analysis of the codec programs (compiles
    hit the persistent cache — the same shapes just ran).  v5e peak:
    197 bf16 TFLOP/s.  Failures are reported, not swallowed — a silent
    except here once hid cond/stream programs contributing 0 FLOPs."""
    import sys
    try:
        fl = codec.device_flops(hw, hw, **kw)
        tflops = fl["flops_per_pair"] * pairs_per_sec / 1e12
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
        return {
            "flops_per_pair": round(fl["flops_per_pair"]),
            "tflops_per_sec": round(tflops, 3),
            "mfu_pct_bf16": round(100.0 * tflops / peak, 2),
        }
    except Exception as e:  # pragma: no cover - depends on backend
        print(f"device_flops failed: {e!r}", file=sys.stderr)
        return {}


def bench_dsic():
    """Secondary mode (BENCH_MODE=dsic): the DSIC fast codec (cost-volume
    stereo family) through the same on-device coding pipeline."""
    import jax
    import jax.numpy as jnp
    from hesic_tpu.models import DSIC, DSICFastCodec

    hw = int(os.environ.get("BENCH_SIZE", "512"))
    # batch 32 measured 31.7 vs 24.1 pairs/s at batch 16 (512², folded
    # 3D branch) — the cost-volume programs amortize fixed overheads
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "4"))
    calib_steps = int(os.environ.get("BENCH_CALIB_STEPS", "60"))
    mm = int(os.environ.get("BENCH_MM", "16"))
    use_bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    rng = np.random.RandomState(0)
    module = DSIC(N=128, M=192, F=21, C=32, K=5,
                  dtype=jnp.bfloat16 if use_bf16 else None)

    if calib_steps > 0:
        params = _calibrate(module, rng, calib_steps, arch="dsic")
        codec = DSICFastCodec(module, params, mm=mm, codec_batch=batch)
    else:
        codec = DSICFastCodec.init(
            module, [(1, hw, hw, 3), (1, hw, hw, 3)])
        codec = DSICFastCodec(codec.module, codec.params, mm=mm,
                              codec_batch=batch)
    codec.update()

    xs = [_smooth_pair(rng, hw) for _ in range(batch)]
    x1 = jnp.asarray(np.concatenate([p[0] for p in xs]))
    x2 = jnp.asarray(np.concatenate([p[1] for p in xs]))
    out = codec.compress_fast(x1, x2, batch_container=True)
    rec = codec.decompress_fast_batch(out["blob"])
    jax.block_until_ready(rec["x2_hat"])

    from concurrent.futures import ThreadPoolExecutor
    ex = ThreadPoolExecutor(1)
    start = time.time()
    fut = ex.submit(codec.compress_fast, x1, x2, None, True)
    for i in range(n_batches):
        out = fut.result()
        if i + 1 < n_batches:
            fut = ex.submit(codec.compress_fast, x1, x2, None, True)
        rec = codec.decompress_fast_batch(out["blob"])
    jax.block_until_ready(rec["x2_hat"])
    elapsed = time.time() - start
    ex.shutdown()
    pairs_per_sec = n_batches * batch / elapsed

    print(json.dumps({
        "metric": f"dsic_pairs_per_sec_{hw}px_encdec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        **_mfu_fields(codec, hw, pairs_per_sec),
    }))


def bench_train():
    """BENCH_MODE=train: flagship train-step throughput (VERDICT r3 #4).

    Times the full jitted HESIC train step (forward + backward + Adam
    update, the newtrain1_real.py loop's compute) at N128/M192 512², in
    f32 and with the train CLI's --bf16 transform dtype; reports
    steps/s, pairs/s and MFU from XLA's own cost analysis.  One JSON
    line: bf16 is the headline (the TPU fast path), f32 rides along as
    secondary fields with the measured speedup factor.
    """
    import jax
    import jax.numpy as jnp
    from hesic_tpu.models import HESIC
    from hesic_tpu.training import (TrainState, make_optimizer,
                                    make_train_step,
                                    stereo_rate_distortion_loss)

    hw = int(os.environ.get("BENCH_SIZE", "512"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    n_steps = int(os.environ.get("BENCH_STEPS", "12"))
    rng = np.random.RandomState(0)
    xs = [_smooth_pair(rng, hw) for _ in range(batch)]
    batch_d = {
        "x1": jnp.asarray(np.concatenate([p[0] for p in xs])),
        "x2": jnp.asarray(np.concatenate([p[1] for p in xs])),
        "h": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None],
                      (batch, 1, 1)),
    }

    def loss_fn(module, params, bd, rng_key):
        out = module.apply({"params": params}, bd["x1"], bd["x2"],
                           bd["h"], training=True,
                           rngs={"noise": rng_key})
        rd = stereo_rate_distortion_loss(out, bd["x1"], bd["x2"],
                                         lmbda=1e-2)
        aux = module.apply({"params": params}, method="aux_loss")
        return rd["loss"] + aux, {"bpp": rd["bpp_loss"]}

    results = {}
    for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        module = HESIC(N=128, M=192, K=5, dtype=dtype)
        params = module.init(
            {"params": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(1)},
            batch_d["x1"][:1], batch_d["x2"][:1], batch_d["h"][:1],
            training=True)["params"]
        tx = make_optimizer(1e-4, 1e-3)
        state = TrainState.create(params, tx)
        step = make_train_step(module, tx, loss_fn)
        key = jax.random.PRNGKey(7)

        # FLOPs of the whole compiled step (fwd+bwd+update); step is
        # already jitted by make_train_step, so lower it directly
        cost = step.lower(state, batch_d, key).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))

        key, sub = jax.random.split(key)
        state, metrics = step(state, batch_d, sub)   # compile+warmup
        jax.block_until_ready(metrics["loss"])
        t0 = time.time()
        for _ in range(n_steps):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch_d, sub)
        loss = float(metrics["loss"])                # hard sync
        elapsed = time.time() - t0
        assert np.isfinite(loss), f"non-finite loss in {name} bench"
        steps_per_sec = n_steps / elapsed
        tflops = flops * steps_per_sec / 1e12
        results[name] = {
            "steps_per_sec": round(steps_per_sec, 4),
            "pairs_per_sec": round(steps_per_sec * batch, 3),
            "tflops_per_sec": round(tflops, 2),
            "mfu_pct_bf16": round(100 * tflops / 197.0, 2),
            "flops_per_step": flops,
        }

    bf16, f32 = results["bf16"], results["f32"]
    print(json.dumps({
        "metric": f"hesic_train_pairs_per_sec_{hw}px_bf16",
        "value": bf16["pairs_per_sec"],
        "unit": "pairs/s/chip",
        # no reference wall-clock baseline exists for training either;
        # report the bf16/f32 speedup of our own step as vs_baseline
        "vs_baseline": round(bf16["steps_per_sec"]
                             / f32["steps_per_sec"], 3),
        "batch": batch,
        "bf16": bf16,
        "f32": f32,
        "bf16_speedup": round(bf16["steps_per_sec"]
                              / f32["steps_per_sec"], 3),
    }))


def main():
    import jax
    import jax.numpy as jnp
    from hesic_tpu.models import HESIC, HESICFastCodec

    hw = int(os.environ.get("BENCH_SIZE", "512"))
    # batch 64 is the measured sweet spot on v5e (59.6 @32, 64.8 @64,
    # OOM @128 at 512² with mm=16)
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "6"))
    calib_steps = int(os.environ.get("BENCH_CALIB_STEPS", "60"))
    rng = np.random.RandomState(0)

    # Grid width: with per-channel centering the width is measured
    # rate-neutral on the calibrated bench model (tools/compare_mm.py:
    # bpp_real identical at mm=8/16/32, zero escape corrections), and
    # out-of-grid latents always escape-code exactly — so mm=16 is the
    # demonstrated-RD-safe fast setting.  mm=32 (the codec default,
    # wider safety margin) measures ~52 vs ~63 pairs/s at batch 32.
    mm = int(os.environ.get("BENCH_MM", "16"))
    use_bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    ckpt = os.environ.get("BENCH_CKPT", "")
    if ckpt:
        # reference-trained weights (tools/train_ref_torch.py hesic-full
        # -> tests/fixtures/ref_hsic_full64.pth.tar): ties payload sizes
        # to a real reference training run instead of the seeded
        # calibration (VERDICT r3 weak #3)
        import torch

        from hesic_tpu.utils.convert_torch import convert_state_dict
        payload = torch.load(ckpt, map_location="cpu", weights_only=False)
        cfg = payload.get("config", {"N": 128, "M": 192, "K": 5})
        module = HESIC(N=cfg["N"], M=cfg["M"], K=cfg.get("K", 5),
                       dtype=jnp.bfloat16 if use_bf16 else None)
        params = convert_state_dict(payload["state_dict"], "hesic")
        codec = HESICFastCodec(module, params, mm=mm, codec_batch=batch)
    else:
        module = HESIC(N=128, M=192, K=5,
                       dtype=jnp.bfloat16 if use_bf16 else None)
        if calib_steps > 0:
            params = _calibrate(module, rng, calib_steps)
            codec = HESICFastCodec(module, params, mm=mm,
                                   codec_batch=batch)
        else:
            codec = HESICFastCodec.init(
                module, [(1, hw, hw, 3), (1, hw, hw, 3), (1, 3, 3)])
            codec = HESICFastCodec(codec.module, codec.params, mm=mm,
                                   codec_batch=batch)
    codec.update()

    # Homography: identity by default; BENCH_H=real uses a realistic
    # InStereo2K-like H (small rotation + shift — real capture rigs are
    # never exactly identity, datasets/utils.py:30-67), which selects a
    # wider warp window and exercises the warp at its real cost.
    if os.environ.get("BENCH_H", "") == "real":
        th = np.deg2rad(1.5)
        h_np = np.array([[np.cos(th), -np.sin(th), 6.0],
                         [np.sin(th), np.cos(th), -4.0],
                         [0.0, 0.0, 1.0]], np.float32)
        h = jnp.tile(jnp.asarray(h_np)[None], (batch, 1, 1))
    else:
        h = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (batch, 1, 1))

    # DISTINCT data between timed iterations: the sticky-shape fast path
    # must absorb real payload-size drift (or pay the measured fallback),
    # not re-encode one memorized batch (VERDICT r4 weak #3).  The pool
    # lives on device (pre-uploaded, untimed — a serving host feeds
    # images over PCIe, not this debug tunnel) and is capped at 4
    # batches (~1.6 GB HBM at 512² batch 64) cycled across iterations.
    pool_n = min(n_batches, int(os.environ.get("BENCH_POOL", "4")))
    pool = []
    for _ in range(pool_n):
        xs = [_smooth_pair(rng, hw) for _ in range(batch)]
        pool.append((jnp.asarray(np.concatenate([p[0] for p in xs])),
                     jnp.asarray(np.concatenate([p[1] for p in xs]))))
    pool = [pool[i % pool_n] for i in range(n_batches)]
    x1, x2 = pool[0]

    # warmup: compile both directions.  Every DISTINCT pool batch goes
    # through the sync path once so all data-selected executables (mm
    # buckets, pack caps) are compiled before the timed loop — a
    # mid-loop fallback then costs a sync re-encode, never a fresh
    # remote XLA compile (which at ~30-60 s would swamp a 6-batch run,
    # as the first BENCH_H=real attempt showed).  Steady-state serving
    # has all bucket executables warm for the same reason.
    for p1, p2 in pool[:pool_n]:
        out = codec.compress_fast(p1, p2, h, batch_container=True)
        # decode every DISTINCT pool batch too: decode executables are
        # keyed by (watermarked) payload-size buckets, so a payload
        # bucket first seen mid-loop would pay its remote compile
        # inside the timed region (measured 6.5 s for dec2+synth) —
        # steady-state serving has these warm for the same reason
        codec.decompress_fast_batch(out["blob"])
    # one untimed pipelined epoch over the pool: compiles the
    # sticky-derived pack keys along the same drift path the timed
    # loop will take
    for p1, p2 in pool[:pool_n]:
        codec.compress_fast_finish(codec.compress_fast_start(p1, p2, h))
    # byte-identity check: sync(x1,x2) seeds the sticky shapes, so the
    # pipelined re-encode of the SAME batch must reproduce the container
    out = codec.compress_fast(x1, x2, h, batch_container=True)
    out2 = codec.compress_fast_finish(codec.compress_fast_start(x1, x2, h))
    assert out2["blob"] == out["blob"], "pipelined encode diverged"
    rec = codec.decompress_fast_batch(out["blob"])
    jax.block_until_ready(rec["x2_hat"])

    # BENCH_PIPELINE selects the loop structure:
    #   2 (default): single-thread async pipeline over the start/finish
    #      split — decode(i-1)'s dispatch lands between encode(i)'s pack
    #      dispatch and its payload fetch, so the d2h link time overlaps
    #      decode device compute, and the sticky-shape encode dispatch
    #      chain has NO intermediate sync (warmup seeded the shapes)
    #   1: two-thread pipeline (encode on a worker thread)
    #   0: strictly sequential enc->dec loop (diagnostic)
    mode = os.environ.get("BENCH_PIPELINE", "2")
    fallbacks = 0
    fb_reasons = []
    bpps = []
    if mode == "2":
        # dispatch order per iteration: decode(i-1) -> encode(i+1) ->
        # fetch(i).  Both compute chains are queued BEHIND the streaming
        # payload fetch, so the link time and the post-fetch host
        # container work overlap device compute instead of idle time.
        start = time.time()
        h_enc = codec.compress_fast_start(*pool[0], h)
        prev = None
        for i in range(n_batches):
            if prev is not None:
                rec = codec.decompress_fast_batch(prev)
            nxt = (codec.compress_fast_start(*pool[i + 1], h)
                   if i + 1 < n_batches else None)
            out = codec.compress_fast_finish(h_enc)
            if out.get("fallback"):
                fallbacks += 1
                fb_reasons.append(out.get("fallback_reason", "?"))
            bpps.append(float(out["bpp_real"]))
            h_enc = nxt
            prev = out["blob"]
        rec = codec.decompress_fast_batch(prev)
        jax.block_until_ready(rec["x2_hat"])
        elapsed = time.time() - start
    elif mode == "1":
        from concurrent.futures import ThreadPoolExecutor
        ex = ThreadPoolExecutor(1)
        start = time.time()
        fut = ex.submit(codec.compress_fast, *pool[0], h, True)
        for i in range(n_batches):
            out = fut.result()
            bpps.append(float(out["bpp_real"]))
            if i + 1 < n_batches:
                fut = ex.submit(codec.compress_fast, *pool[i + 1], h,
                                True)
            rec = codec.decompress_fast_batch(out["blob"])
        jax.block_until_ready(rec["x2_hat"])
        elapsed = time.time() - start
        ex.shutdown()
    else:
        start = time.time()
        for i in range(n_batches):
            out = codec.compress_fast(*pool[i], h, True)
            bpps.append(float(out["bpp_real"]))
            rec = codec.decompress_fast_batch(out["blob"])
        jax.block_until_ready(rec["x2_hat"])
        elapsed = time.time() - start
    pairs_per_sec = n_batches * batch / elapsed

    # MFU from XLA's own cost analysis of the codec programs (compiles
    # hit the persistent cache — the same shapes just ran).  v5e peak:
    # 197 bf16 TFLOP/s.
    # FLOPs at the warp window the bench actually ran (identity H ->
    # win=16; win=64 would overcount the warp and inflate MFU)
    from hesic_tpu.geometry.fast_warp import pick_warp_win, pick_warp_xwin
    extra = _mfu_fields(codec, hw, pairs_per_sec,
                        win=pick_warp_win(np.asarray(h), hw, hw),
                        xwin=pick_warp_xwin(np.asarray(h), hw, hw))
    extra.update(_link_ceiling_fields(codec, batch, pairs_per_sec))

    print(json.dumps({
        "metric": f"stereo_pairs_per_sec_{hw}px_encdec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "bpp_real": round(float(np.mean(bpps)), 4),
        "fallbacks": fallbacks,
        **({"fallback_reasons": fb_reasons} if fb_reasons else {}),
        "batches": n_batches,
        **({"h": "real"} if os.environ.get("BENCH_H") == "real" else {}),
        **({"ckpt": os.path.basename(ckpt)} if ckpt else {}),
        **extra,
    }))


def _link_ceiling_fields(codec, batch: int, pairs_per_sec: float) -> dict:
    """Arithmetic host-link ceiling published next to the achieved
    number (VERDICT r4 item #1): the loop's payload sizes (measured from
    the codec's own last transfers) divided by the link bandwidth
    measured RIGHT NOW with raw same-size transfers.  The tunnel's
    bandwidth swings ~±30% day to day, so the ceiling is only meaningful
    measured at bench time."""
    import sys

    import jax
    try:
        d2h_b = int(codec.last_link_bytes["d2h"])
        h2d_b = int(codec.last_link_bytes["h2d"])
        host = np.zeros(d2h_b // 4, np.uint32)
        dev = jax.device_put(host)
        jax.block_until_ready(dev)
        t0 = time.time()
        np.asarray(dev)
        d2h_s = time.time() - t0
        host2 = np.zeros(h2d_b // 4, np.uint32)
        t0 = time.time()
        jax.block_until_ready(jax.device_put(host2))
        h2d_s = time.time() - t0
        ceiling = batch / (d2h_s + h2d_s)
        return {
            "link_d2h_mbps": round(d2h_b / d2h_s / 1e6, 1),
            "link_h2d_mbps": round(h2d_b / h2d_s / 1e6, 1),
            "link_bytes_d2h": d2h_b,
            "link_bytes_h2d": h2d_b,
            "link_ceiling_pairs_per_sec": round(ceiling, 1),
            "pct_of_link_ceiling": round(100 * pairs_per_sec / ceiling, 1),
        }
    except Exception as e:  # pragma: no cover - depends on backend
        print(f"link ceiling probe failed: {e!r}", file=sys.stderr)
        return {}


if __name__ == "__main__":
    _wait_for_backend()
    _mode = os.environ.get("BENCH_MODE", "")
    if _mode == "ar":
        bench_ar()
    elif _mode == "ar-device":
        bench_ar_device()
    elif _mode == "hesic-plus-device":
        bench_hesic_plus_device()
    elif _mode == "dsic":
        bench_dsic()
    elif _mode == "train":
        bench_train()
    else:
        main()
