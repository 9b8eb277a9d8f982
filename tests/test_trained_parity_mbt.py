"""Trained-weights cross-implementation audit for the single-image AR
zoo family (mbt2018) — VERDICT r3 missing #2.

A reference torch JointAutoregressiveHierarchicalPriors (N8/M16),
trained 300 CPU steps by tools/train_ref_torch.py (committed fixture
tests/fixtures/ref_mbt_tiny.pth.tar, final bpp ~0.15), runs its own
per-pixel compress/decompress (reference models/priors.py:490-612, with
our byte-identical rANS injected for compressai.ans) next to our
JointAutoregressiveCodec after convert_torch.

Both implementations use the SAME coding scheme here (64-bucket scale
table, mean-centered rounding, 16-bit rANS), so the comparison is
byte-level: CDF tables bit-equal (EB and GaussianConditional), z and y
strings byte-identical, and cross-decoding the reference's container
with our codec reproduces the reference reconstruction.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from hesic_tpu.models import (JointAutoregressiveCodec,  # noqa: E402
                              JointAutoregressiveHierarchicalPriors)
from hesic_tpu.utils.convert_torch import convert_state_dict  # noqa: E402

from reference_compat import load_reference  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ref_mbt_tiny.pth.tar")
N, M = 8, 16
SIZE = 128


def _smooth_image_nchw(rng, hw):
    base = (0.5 + 0.25 * rng.randn(hw // 16 + 2, hw // 16 + 2, 3))
    base = np.clip(base, 0, 1).astype(np.float32)
    base = np.repeat(np.repeat(base, 2, 0), 2, 1)
    idx = np.linspace(0, base.shape[0] - 1.001, hw)
    xi = idx.astype(np.int32)
    fi = (idx - xi).astype(np.float32)
    rows = (base[xi] * (1 - fi)[:, None, None]
            + base[xi + 1] * fi[:, None, None])
    up = (rows[:, xi] * (1 - fi)[None, :, None]
          + rows[:, xi + 1] * fi[None, :, None])
    return up.transpose(2, 0, 1)[None]


@pytest.fixture(scope="module")
def trained():
    if not hasattr(np, "int"):
        np.int = int
    ref = load_reference()
    payload = torch.load(FIXTURE, map_location="cpu", weights_only=False)
    net = ref["priors"].JointAutoregressiveHierarchicalPriors(N=N, M=M)
    net.load_state_dict(payload["state_dict"])
    net.eval()
    net.update(force=True)

    params = convert_state_dict(payload["state_dict"], "mbt2018")
    codec = JointAutoregressiveCodec(
        JointAutoregressiveHierarchicalPriors(N=N, M=M), params)
    codec.update(force=True)
    return net, codec


class TestTrainedTables:
    def test_eb_tables_bit_equal(self, trained):
        net, codec = trained
        eb = net.entropy_bottleneck
        t = codec.tables["entropy_bottleneck"]
        len_t = eb._cdf_length.cpu().numpy().astype(np.int32)
        np.testing.assert_array_equal(t.cdf_length, len_t)
        np.testing.assert_array_equal(
            t.offset, eb._offset.cpu().numpy().astype(np.int32))
        cdf_t = eb._quantized_cdf.cpu().numpy().astype(np.int32)
        for c in range(cdf_t.shape[0]):
            L = int(len_t[c])
            np.testing.assert_array_equal(t.quantized_cdf[c, :L],
                                          cdf_t[c, :L], err_msg=f"ch {c}")

    def test_gaussian_tables_equal_where_reachable(self, trained):
        """The 64-bucket scale-table CDFs drive every y symbol.  Exact
        cross-library bit-equality of ALL buckets is not achievable: the
        table itself is exp(linspace(...)) in f32 (torch expf vs numpy
        exp differ by 1 ULP on ~half the entries), and in the far-tail
        buckets (scale >~ 30) the PMF is so flat that erfc-ULP noise
        flips many 16-bit roundings at once.  What byte-identical
        streams actually require is bit-equality on the buckets a real
        model can index — asserted here for every bucket with
        scale < 16 (trained scales here are < 5; the y-stream
        byte-equality test below is the end-to-end check) — plus at most
        2 far-tail buckets differing overall."""
        net, codec = trained
        gc = net.gaussian_conditional
        ref_table = gc.scale_table.cpu().numpy().astype(np.float32)
        ours_table = np.asarray(codec.scale_table, np.float32)
        np.testing.assert_allclose(ours_table, ref_table, rtol=1e-6)
        t = codec.tables["gaussian_conditional"]
        len_t = gc._cdf_length.cpu().numpy().astype(np.int32)
        np.testing.assert_array_equal(t.cdf_length, len_t)
        np.testing.assert_array_equal(
            t.offset, gc._offset.cpu().numpy().astype(np.int32))
        cdf_t = gc._quantized_cdf.cpu().numpy().astype(np.int32)
        bad = []
        for i in range(cdf_t.shape[0]):
            L = int(len_t[i])
            if not np.array_equal(t.quantized_cdf[i, :L], cdf_t[i, :L]):
                bad.append(i)
                assert ref_table[i] >= 16, (
                    f"reachable scale bucket {i} "
                    f"(scale {ref_table[i]:.3f}) differs")
        assert len(bad) <= 2, f"buckets differing: {bad}"


class TestTrainedStreams:
    @pytest.fixture(scope="class")
    def image(self):
        rng = np.random.RandomState(321)
        return _smooth_image_nchw(rng, SIZE)

    @pytest.fixture(scope="class")
    def ref_run(self, trained, image):
        net, _ = trained
        with torch.no_grad():
            enc = net.compress(torch.from_numpy(image))
            dec = net.decompress(enc["strings"], enc["shape"])
        return enc, dec

    @pytest.fixture(scope="class")
    def our_run(self, trained, image):
        _, codec = trained
        j = jnp.asarray(image.transpose(0, 2, 3, 1))
        enc = codec.compress(j)
        dec = codec.decompress(enc["strings"], enc["shape"])
        return enc, dec

    def test_z_strings_byte_identical(self, ref_run, our_run):
        ref_enc, _ = ref_run
        our_enc, _ = our_run
        assert our_enc["strings"][1][0] == ref_enc["strings"][1][0]

    def test_y_strings_byte_identical(self, ref_run, our_run):
        """Same symbols, same indexes, same CDFs, same coder framing
        (pixel-major raster order, channels inner, one flush) -> the
        whole AR stream must match byte-for-byte."""
        ref_enc, _ = ref_run
        our_enc, _ = our_run
        assert our_enc["strings"][0][0] == ref_enc["strings"][0][0]

    def test_cross_decode_reference_container(self, trained, ref_run):
        """Our decoder consuming the reference's bytes reproduces the
        reference's reconstruction (true cross-implementation decode —
        impossible for the adaptive-PMF HESIC containers, possible here
        because the scheme is table-driven)."""
        _, codec = trained
        ref_enc, ref_dec = ref_run
        dec = codec.decompress(
            [[bytes(s) for s in ref_enc["strings"][0]],
             [bytes(s) for s in ref_enc["strings"][1]]],
            tuple(int(v) for v in ref_enc["shape"]))
        t = ref_dec["x_hat"].cpu().numpy()[0].transpose(1, 2, 0)
        o = np.asarray(dec["x_hat"])[0]
        mse = float(np.mean((t - o) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 45, f"cross-impl PSNR {psnr:.2f} dB"

    def test_reconstructions_match(self, ref_run, our_run):
        _, ref_dec = ref_run
        _, our_dec = our_run
        t = ref_dec["x_hat"].cpu().numpy()[0].transpose(1, 2, 0)
        o = np.asarray(our_dec["x_hat"])[0]
        mse = float(np.mean((t - o) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 45, f"cross-impl PSNR {psnr:.2f} dB"
