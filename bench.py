"""Benchmark: HESIC end-to-end real-bitstream enc+dec throughput.

Measures 512x512 stereo pairs/sec/chip through the full HESIC pipeline —
analysis/synthesis transforms and GMM CDF construction on the TPU, rANS +
range coding on the host — and prints ONE JSON line.

Baseline (BASELINE.md): the reference publishes no wall-clock numbers; the
driver's north-star target is 25 pairs/s/chip enc+dec, so
vs_baseline = pairs_per_sec / 25.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 25.0


def main():
    import jax
    import jax.numpy as jnp
    from hesic_tpu.models import HESIC, HESICCodec

    hw = int(os.environ.get("BENCH_SIZE", "512"))
    n_pairs = int(os.environ.get("BENCH_PAIRS", "8"))
    rng = np.random.RandomState(0)

    module = HESIC(N=128, M=192, K=5)
    codec = HESICCodec.init(
        module, [(1, hw, hw, 3), (1, hw, hw, 3), (1, 3, 3)])
    codec.update()

    h = jnp.eye(3, dtype=jnp.float32)[None]
    pairs = [
        (jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32),
         jnp.asarray(rng.rand(1, hw, hw, 3), jnp.float32))
        for _ in range(max(2, min(n_pairs, 4)))
    ]

    import tempfile
    tmp = tempfile.mkdtemp(prefix="hesic_bench_")

    # warmup: compile every jitted stage (enc+dec)
    out = codec.compress(pairs[0][0], pairs[0][1], h, "warm", tmp)
    codec.decompress("warm", tmp)

    start = time.time()
    for i in range(n_pairs):
        x1, x2 = pairs[i % len(pairs)]
        codec.compress(x1, x2, h, f"p{i}", tmp)
        codec.decompress(f"p{i}", tmp)
    elapsed = time.time() - start
    pairs_per_sec = n_pairs / elapsed

    print(json.dumps({
        "metric": f"stereo_pairs_per_sec_{hw}px_encdec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
