"""Trained-weights cross-implementation RD audit (VERDICT r2 missing #1).

Random-init forward parity (test_reference_parity.py) cannot validate the
full converter -> update() -> real-container chain at a realistic
operating point.  Here a reference torch HSIC — trained for 300 CPU steps
on synthetic stereo pairs by tools/train_ref_torch.py (committed fixture
tests/fixtures/ref_hsic_tiny.pth.tar, final bpp ~0.11) — is run through
BOTH real codecs:

  * the reference's own newnet1.py compress/decompress (torch, run from
    /root/reference with our byte-identical rANS injected for
    compressai.ans and our API-compatible range coder for range_coder);
  * our JAX HESICCodec reference-layout container after convert_torch.

and the audit asserts: EB update() CDF tables bit-equal, quantized
latents equal, real-container bpp within epsilon, reconstructions
matching.  (Cross-DECODING one implementation's y-container with the
other is impossible by construction — arithmetic coding requires
bit-identical pmfs, which torch-f32 vs XLA-f32 cannot guarantee; the
containers are compared at the symbol/byte-count level instead.)
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from hesic_tpu.models import HESIC, HESICCodec  # noqa: E402
from hesic_tpu.utils.convert_torch import convert_state_dict  # noqa: E402

from reference_compat import load_reference  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ref_hsic_tiny.pth.tar")
N, M, K = 8, 16, 2
SIZE = 128


def _smooth_pair_nchw(rng, hw):
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
    x1 = up.transpose(2, 0, 1)
    x2 = np.roll(up, 3, axis=1).transpose(2, 0, 1) * 0.98 + 0.01
    return x1[None], x2[None]


@pytest.fixture(scope="module")
def trained():
    """(torch net with update() done, our codec with update() done,
    torch state_dict)."""
    if not hasattr(np, "int"):     # reference uses the removed alias
        np.int = int
    # the reference codec hard-codes .to('cuda:0'); route to cpu
    _orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple("cpu" if a in ("cuda:0", "cuda") else a for a in args)
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to
    try:
        ref = load_reference()
        payload = torch.load(FIXTURE, map_location="cpu",
                             weights_only=False)
        net = ref["newnet1"].HSIC(N=N, M=M, K=K)
        net.load_state_dict(payload["state_dict"])
        net.eval()
        net.update(force=True)

        params = convert_state_dict(payload["state_dict"], "hesic")
        codec = HESICCodec(HESIC(N=N, M=M, K=K), params)
        codec.update(force=True)
        yield net, codec, payload["state_dict"]
    finally:
        torch.Tensor.to = _orig_to


class TestTrainedCdfTables:
    def test_eb_tables_bit_equal(self, trained):
        """update() CDF tables: torch EB (+ our integer quantizer via the
        compressai._CXX stub) vs our JAX EB pmf chain + same quantizer.
        Integer tables must agree bit-for-bit."""
        net, codec, _ = trained
        for i, name in ((1, "entropy_bottleneck1"),
                        (2, "entropy_bottleneck2")):
            eb = getattr(net, f"entropy_bottleneck{i}")
            t = codec.tables[name]
            cdf_t = eb._quantized_cdf.cpu().numpy().astype(np.int32)
            len_t = eb._cdf_length.cpu().numpy().astype(np.int32)
            off_t = eb._offset.cpu().numpy().astype(np.int32)
            np.testing.assert_array_equal(t.cdf_length, len_t, err_msg=name)
            np.testing.assert_array_equal(t.offset, off_t, err_msg=name)
            width = min(cdf_t.shape[1], t.quantized_cdf.shape[1])
            for c in range(cdf_t.shape[0]):
                L = int(len_t[c])
                np.testing.assert_array_equal(
                    t.quantized_cdf[c, :L], cdf_t[c, :L],
                    err_msg=f"{name} channel {c}")
            assert width >= int(len_t.max())


class TestTrainedContainers:
    @pytest.fixture(scope="class")
    def pair(self):
        rng = np.random.RandomState(123)
        x1, x2 = _smooth_pair_nchw(rng, SIZE)
        h = np.eye(3, dtype=np.float32)[None]
        return x1, x2, h

    @pytest.fixture(scope="class")
    def ref_run(self, trained, pair, tmp_path_factory):
        net, _, _ = trained
        x1, x2, h = pair
        d = str(tmp_path_factory.mktemp("refcodec"))
        with torch.no_grad():
            enc = net.compress(torch.from_numpy(x1), torch.from_numpy(x2),
                               torch.from_numpy(h), "img", d)
            dec = net.decompress(torch.from_numpy(x1),
                                 torch.from_numpy(x2),
                                 torch.from_numpy(h), "img", d)
        return enc, dec, d

    @pytest.fixture(scope="class")
    def our_run(self, trained, pair, tmp_path_factory):
        _, codec, _ = trained
        x1, x2, h = pair
        d = str(tmp_path_factory.mktemp("ourcodec"))
        j1 = jnp.asarray(x1.transpose(0, 2, 3, 1))
        j2 = jnp.asarray(x2.transpose(0, 2, 3, 1))
        jh = jnp.asarray(h)
        enc = codec.compress(j1, j2, jh, "img", d)
        dec = codec.decompress("img", d)
        return enc, dec, d

    def test_reference_roundtrip_self_consistent(self, ref_run):
        enc, dec, _ = ref_run
        np.testing.assert_array_equal(
            dec["y1_hat"].cpu().numpy(), enc["y1_hat"].cpu().numpy())
        np.testing.assert_array_equal(
            dec["y2_hat"].cpu().numpy(), enc["y2_hat"].cpu().numpy())

    def test_quantized_latents_match(self, ref_run, our_run):
        """The integer latents both codecs transmit must agree (torch-f32
        vs XLA-f32 transform drift can only flip a rounding at a
        half-integer boundary; none occur on this trained model)."""
        _, ref_dec, _ = ref_run
        _, our_dec, _ = our_run
        for key in ("y1_hat", "y2_hat"):
            t = ref_dec[key].cpu().numpy()[0].transpose(1, 2, 0)
            o = np.asarray(our_dec[key])[0]
            mismatch = int((t != o).sum())
            assert mismatch == 0, f"{key}: {mismatch} latent cells differ"

    # our container serializes the 9xf32 homography in the header so the
    # decoder is self-contained; the reference passes H out-of-band and
    # does NOT count it in bpp_real (newnet1.py:1069).  Subtract it for
    # an apples-to-apples rate comparison.
    H_BYTES = 36

    def test_bpp_real_close(self, ref_run, our_run):
        ref_enc, _, _ = ref_run
        our_enc, _, _ = our_run
        ours = our_enc["bpp_real"] - self.H_BYTES * 8 / (2 * SIZE * SIZE)
        assert abs(ref_enc["bpp_real"] - ours) < 0.004, (
            ref_enc["bpp_real"], our_enc["bpp_real"], ours)

    def test_container_files_byte_sizes(self, ref_run, our_run):
        """Same layout -> same .npz header size (modulo the serialized
        homography); .bin within a few bytes (identical symbols +
        identical integer cdfs at almost every pixel; coder flush padding
        and rare last-bit pmf rounding differences cost single bytes)."""
        _, _, ref_dir = ref_run
        _, _, our_dir = our_run
        ref_npz = os.path.getsize(os.path.join(ref_dir, "img.npz"))
        our_npz = os.path.getsize(os.path.join(our_dir, "img.npz"))
        assert our_npz == ref_npz + self.H_BYTES, (ref_npz, our_npz)
        ref_bin = os.path.getsize(os.path.join(ref_dir, "img.bin"))
        our_bin = os.path.getsize(os.path.join(our_dir, "img.bin"))
        assert abs(ref_bin - our_bin) <= max(16, 0.002 * ref_bin), (
            ref_bin, our_bin)

    def test_reconstructions_match(self, ref_run, our_run):
        _, ref_dec, _ = ref_run
        _, our_dec, _ = our_run
        for key in ("x1_hat", "x2_hat"):
            t = ref_dec[key].cpu().numpy()[0].transpose(1, 2, 0)
            o = np.asarray(our_dec[key])[0]
            mse = float(np.mean((t - o) ** 2))
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            assert psnr > 45, f"{key}: cross-impl PSNR {psnr:.2f} dB"


class TestCheckpointPipeline:
    """File-level checkpoint journey (VERDICT r2 missing #4 / #9): torch
    .pth.tar -> convert_torch CLI -> update_model CLI -> eval_model CLI,
    all at the byte/file level on the trained fixture."""

    def test_convert_update_eval(self, tmp_path, capsys):
        import json

        from PIL import Image

        from hesic_tpu.utils import convert_torch, eval_model, update_model

        pkl = str(tmp_path / "model.pkl")
        convert_torch.main([FIXTURE, "--arch", "hesic", "-o", pkl])
        assert os.path.getsize(pkl) > 0

        updated = update_model.main([pkl, "--arch", "hesic"])
        assert os.path.exists(updated) and updated != pkl

        rng = np.random.RandomState(5)
        for eye in ("left", "right"):
            d = tmp_path / "data" / "test" / eye
            d.mkdir(parents=True)
            arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / "0.png")
        out_json = str(tmp_path / "res.json")
        eval_model.main([
            "--arch", "hesic", "--dataset", str(tmp_path / "data"),
            "--checkpoint", updated, "--max-images", "1",
            "--workdir", str(tmp_path), "--output", out_json,
        ])
        with open(out_json) as f:
            res = json.load(f)
        flat = json.dumps(res)
        assert "bpp" in flat and "psnr" in flat


def _smooth_pair_rect(rng, h, w):
    """Rectangular variant of _smooth_pair_nchw (same statistics)."""
    s = max(h, w)
    x1, x2 = _smooth_pair_nchw(rng, s)
    return x1[:, :, :h, :w], x2[:, :, :h, :w]


class TestTrainedLatentRobustness:
    """VERDICT r3 weak #2: latent equality at ONE image could mask a
    rounding flip at a half-integer boundary.  Here the audit (a) runs
    over four extra pairs including non-square KITTI-ish aspects, and
    (b) asserts the *sufficient condition* directly: the max cross-
    implementation drift |y_torch - y_jax| is far below each tensor's
    distance-to-rounding-boundary margin, so equal rounding is a
    measured property, not luck."""

    PAIRS = [(7, 128, 128), (42, 128, 128), (99, 128, 256),
             (11, 192, 128)]

    @pytest.mark.parametrize("seed,hh,ww", PAIRS)
    def test_latents_equal_with_margin(self, trained, seed, hh, ww,
                                       tmp_path):
        net, codec, _ = trained
        rng = np.random.RandomState(seed)
        x1, x2 = _smooth_pair_rect(rng, hh, ww)
        h = np.eye(3, dtype=np.float32)[None]
        d = str(tmp_path)

        with torch.no_grad():
            net.compress(torch.from_numpy(x1), torch.from_numpy(x2),
                         torch.from_numpy(h), "img", d)
            ref_dec = net.decompress(torch.from_numpy(x1),
                                     torch.from_numpy(x2),
                                     torch.from_numpy(h), "img", d)
            y1_t = net.encoder1(torch.from_numpy(x1))[0].numpy()

        j1 = jnp.asarray(x1.transpose(0, 2, 3, 1))
        j2 = jnp.asarray(x2.transpose(0, 2, 3, 1))
        jh = jnp.asarray(h)
        codec.compress(j1, j2, jh, "img", d)
        our_dec = codec.decompress("img", d)

        for key in ("y1_hat", "y2_hat"):
            t = ref_dec[key].cpu().numpy()[0].transpose(1, 2, 0)
            o = np.asarray(our_dec[key])[0]
            mismatch = int((t != o).sum())
            assert mismatch == 0, (
                f"seed {seed} {hh}x{ww} {key}: {mismatch} cells differ")

        # margin analysis on the left latent (the right eye and the
        # re-encoded prior go through the same transform stacks):
        # distance of every pre-round value to the nearest .5 boundary
        # vs the actual torch-vs-XLA drift
        y1_o = np.asarray(codec.jit("analysis1")(j1))
        y1_t = y1_t.transpose(0, 2, 3, 1)
        drift = float(np.abs(y1_t - y1_o).max())
        frac = np.abs(y1_o - np.round(y1_o))
        margin = float((0.5 - frac).min())
        assert drift < margin, (
            f"seed {seed}: drift {drift:.2e} >= boundary margin "
            f"{margin:.2e} — rounding equality would be luck")
        print(f"\nseed {seed} {hh}x{ww}: drift {drift:.2e}, "
              f"margin {margin:.2e} (ratio {margin / max(drift, 1e-30):.1f}x)")


class TestFastContainerRateHonesty:
    def test_fast_vs_reference_layout_bpp_delta(self, trained, tmp_path):
        """VERDICT r2 #3: the fast container's per-lane overhead must
        cost < 0.02 bpp vs the reference-layout container at a trained
        checkpoint on 512² (position folding: 128 lanes/eye x 5 B
        ~ 0.0195 bpp; was 0.19 bpp at r2)."""
        from hesic_tpu.models import HESICFastCodec

        _, codec, _ = trained
        fast = HESICFastCodec(codec.module, codec.params, mm=16,
                              codec_batch=1)
        fast.tables = codec.tables
        rng = np.random.RandomState(11)
        x1, x2 = _smooth_pair_nchw(rng, 512)
        j1 = jnp.asarray(x1.transpose(0, 2, 3, 1))
        j2 = jnp.asarray(x2.transpose(0, 2, 3, 1))
        h = jnp.eye(3, dtype=jnp.float32)[None]

        ref = codec.compress(j1, j2, h, "img", str(tmp_path))
        out = fast.compress_fast(j1, j2, h, batch_container=True)
        rec = fast.decompress_fast_batch(out["blob"])
        assert np.all(np.isfinite(np.asarray(rec["x2_hat"])))
        delta = out["bpp_real"] - ref["bpp_real"]
        # fast container additionally stores H (36 B ~ 0.0005 bpp)
        assert delta < 0.02, (out["bpp_real"], ref["bpp_real"], delta)
