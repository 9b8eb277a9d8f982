"""Generate cross-implementation rANS byte fixtures (run once, offline).

Compiles the REFERENCE pybind11 extension unmodified from
/root/reference/compressai/cpp_exts/rans/rans_interface.cpp (+ the
ryg_rans headers) against the pybind11 headers torch ships:

    mkdir -p /tmp/refans && cd /tmp/refans && g++ -O2 -std=c++17 -shared \
      -fPIC $(python3-config --includes) \
      -I$(python -c "import torch,os;print(os.path.join(os.path.dirname(torch.__file__),'include'))") \
      -I/root/reference/third_party/ryg_rans \
      /root/reference/compressai/cpp_exts/rans/rans_interface.cpp \
      -o ans$(python3-config --extension-suffix)

then encodes random symbol/CDF sets with it and stores the streams in
tests/fixtures/ref_rans_streams.npz.  Only BYTES are committed - no
reference code enters the repo; the fixtures pin cross-implementation
compatibility (tests/test_codecs.py::TestReferenceStreamFixtures).
"""
import sys

sys.path.insert(0, "/tmp/refans")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import ans  # noqa: E402  (reference extension)

from hesic_tpu.codecs.rans import pmf_to_quantized_cdf  # noqa: E402


def make_cdf(rng, nsym):
    pmf = rng.dirichlet(np.ones(nsym) * 2).astype(np.float64)
    cdf = pmf_to_quantized_cdf(pmf.astype(np.float32), 16)
    return np.asarray(cdf, dtype=np.int32)


def build_case(seed, n, channels, nsyms, offsets, oob_frac=0.0):
    rng = np.random.RandomState(seed)
    cdfs = [make_cdf(rng, nsyms[c]) for c in range(channels)]
    stride = max(len(c) for c in cdfs)
    table = np.zeros((channels, stride), np.int32)
    for c, cdf in enumerate(cdfs):
        table[c, : len(cdf)] = cdf
    cdf_sizes = np.array([len(c) for c in cdfs], np.int32)
    offs = np.array(offsets, np.int32)
    indexes = rng.randint(0, channels, n).astype(np.int32)
    # in-range values per channel: [offset, offset + nsym - 2) with the
    # last bin reserved for the escape symbol
    symbols = np.empty(n, np.int32)
    for i in range(n):
        c = indexes[i]
        symbols[i] = offs[c] + rng.randint(0, nsyms[c] - 1)
    if oob_frac:
        k = max(1, int(n * oob_frac))
        pos = rng.choice(n, k, replace=False)
        symbols[pos] = rng.randint(-60, 120, k)
    stream = ans.RansEncoder().encode_with_indexes(
        symbols.tolist(), indexes.tolist(),
        [t.tolist() for t in table], cdf_sizes.tolist(), offs.tolist())
    # sanity: the reference decodes its own stream
    dec = ans.RansDecoder().decode_with_indexes(
        stream, indexes.tolist(), [t.tolist() for t in table],
        cdf_sizes.tolist(), offs.tolist())
    assert np.array_equal(np.asarray(dec, np.int32), symbols), seed
    return {
        "symbols": symbols, "indexes": indexes, "cdfs": table,
        "cdf_sizes": cdf_sizes, "offsets": offs,
        "stream": np.frombuffer(stream, np.uint8),
    }


def main():
    cases = {
        # (seed, n, channels, alphabet sizes, offsets, out-of-range frac)
        "small": build_case(0, 200, 3, [10, 6, 14], [-4, 0, -7]),
        "bypass": build_case(1, 300, 2, [8, 12], [-3, -5], oob_frac=0.07),
        "wide": build_case(2, 1500, 1, [66], [-32]),
        # n=1 aborts inside the reference extension (its own bug); the
        # smallest stable case is a handful of symbols
        "tiny": build_case(3, 5, 1, [4], [0]),
    }
    out = {}
    for name, case in cases.items():
        for k, v in case.items():
            out[f"{name}__{k}"] = v
    np.savez("/root/repo/tests/fixtures/ref_rans_streams.npz", **out)
    for name, case in cases.items():
        print(name, "stream bytes:", case["stream"].size)


if __name__ == "__main__":
    main()
