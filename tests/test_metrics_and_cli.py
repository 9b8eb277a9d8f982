"""Metrics golden checks + CLI smoke tests (eval_model, update_model,
codec_cli, bench_codecs, plot)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from hesic_tpu.utils.metrics import ms_ssim, np_psnr, psnr, ssim

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


class TestMetrics:
    def test_psnr_known_value(self):
        a = np.zeros((1, 64, 64, 3), np.float32)
        b = np.full_like(a, 0.1)
        # mse = 0.01 -> psnr = 20 dB
        assert abs(float(psnr(jnp.asarray(a), jnp.asarray(b))) - 20.0) < 1e-3
        assert abs(np_psnr(a, b) - 20.0) < 1e-3

    def test_ssim_identity(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                        jnp.float32)
        assert float(ssim(x, x)) > 0.999
        assert float(ms_ssim(x, x)) > 0.999

    def test_msssim_orders_degradations(self):
        rng = np.random.RandomState(1)
        x = rng.rand(1, 192, 192, 3).astype(np.float32)
        a = np.clip(x + rng.randn(*x.shape) * 0.02, 0, 1).astype(np.float32)
        b = np.clip(x + rng.randn(*x.shape) * 0.2, 0, 1).astype(np.float32)
        ms_a = float(ms_ssim(jnp.asarray(x), jnp.asarray(a)))
        ms_b = float(ms_ssim(jnp.asarray(x), jnp.asarray(b)))
        assert ms_a > ms_b
        assert 0 < ms_b < ms_a <= 1


def _write_png(path, seed=0, size=(128, 160)):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(size[0], size[1], 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


class TestCodecCLI:
    def test_encode_decode_roundtrip(self, tmp_path):
        from hesic_tpu.utils import codec_cli
        from hesic_tpu.zoo import create_model
        src = str(tmp_path / "in.png")
        _write_png(src)
        ckpt = str(tmp_path / "model.pkl")
        codec = create_model("bmshj2018-factorized", quality=1,
                             image_size=(64, 64), N=8, M=12)
        codec.update()
        codec.save(ckpt)
        out_bin = str(tmp_path / "out.bin")
        rec_png = str(tmp_path / "rec.png")
        codec_cli.main(["encode", src, "-o", out_bin,
                        "--arch", "bmshj2018-factorized",
                        "--checkpoint", ckpt])
        assert os.path.getsize(out_bin) > 0
        codec_cli.main(["decode", out_bin, "-o", rec_png,
                        "--checkpoint", ckpt])
        rec = np.asarray(Image.open(rec_png))
        assert rec.shape == (128, 160, 3)


class TestUpdateModelCLI:
    def test_rebuild_and_rename(self, tmp_path):
        from hesic_tpu.utils import update_model
        from hesic_tpu.zoo import create_model
        codec = create_model("bmshj2018-factorized", quality=1,
                             image_size=(64, 64), N=8, M=12)
        ckpt = str(tmp_path / "raw.pkl")
        codec.save(ckpt)
        out = update_model.main([ckpt, "--arch", "bmshj2018-factorized"])
        assert os.path.exists(out)
        assert "-" in os.path.basename(out)


class TestBenchCodecs:
    def test_jpeg_runs(self, tmp_path):
        from hesic_tpu.utils.bench_codecs import collect
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(2):
            _write_png(str(d / f"{i}.png"), seed=i, size=(96, 96))
        res = collect("jpeg", str(d), [50, 90])
        assert res["name"] == "jpeg"
        assert len(res["results"]["bpp"]) == 2
        assert res["results"]["psnr-rgb"][1] > res["results"]["psnr-rgb"][0]

    def test_jpeg2000_runs(self, tmp_path):
        from hesic_tpu.utils.bench_codecs import collect
        d = tmp_path / "imgs"
        d.mkdir()
        _write_png(str(d / "0.png"), seed=0, size=(96, 96))
        res = collect("jpeg2000", str(d), [2, 100])
        # quality = compression ratio: higher ratio -> lower bpp
        assert res["results"]["bpp"][1] < res["results"]["bpp"][0]
        # near-lossless at ratio 2 even on noise
        assert res["results"]["psnr-rgb"][0] > 25

    def test_ycbcr444_roundtrip(self):
        from hesic_tpu.utils.bench_codecs import (_rgb_to_ycbcr444_u8,
                                                  _ycbcr444_u8_to_rgb)
        img = np.random.RandomState(0).rand(16, 24, 3).astype(np.float32)
        planes = _rgb_to_ycbcr444_u8(img)
        assert planes.shape == (3, 16, 24) and planes.dtype == np.uint8
        back = _ycbcr444_u8_to_rgb(planes)
        assert np.abs(back - img).max() < 0.02  # u8 quantization only

    def test_reference_software_gates_on_binaries(self):
        from hesic_tpu.utils.bench_codecs import HM, VTM
        for cls in (VTM, HM):
            codec = cls()
            assert not codec.available()  # not installed in this image

    def test_plot_writes_figure(self, tmp_path):
        pytest.importorskip("matplotlib")
        from hesic_tpu.utils.plot import plot_rd
        res = {"name": "jpeg",
               "results": {"bpp": [0.2, 0.5], "psnr": [28.0, 33.0]}}
        out = str(tmp_path / "rd.png")
        plot_rd([res], output=out)
        assert os.path.getsize(out) > 0

    def test_find_close_bisection(self, tmp_path):
        from hesic_tpu.utils.bench_codecs import JPEG
        from hesic_tpu.utils.find_close import find_closest
        src = str(tmp_path / "img.png")
        _write_png(src, size=(96, 96))
        q, val, res = find_closest(JPEG(), src, 2.0, "bpp")
        assert JPEG.quality_range[0] <= q <= JPEG.quality_range[1]
        assert "psnr-rgb" in res

    def test_find_close_reversed_and_plateau(self):
        """Value-driven bisection (reference __main__.py:52-87): correct
        for QP-style knobs (metric falls as quality rises) and when the
        metric plateaus across a range of qualities."""
        from hesic_tpu.utils.find_close import find_closest

        class FakeQP:
            quality_range = (0, 51)
            quality_reversed = True
            calls = 0

            def run(self, path, q):
                type(self).calls += 1
                return {"bpp": 8.0 / (1 + q)}  # falls with q (QP-like)

        q, val, _ = find_closest(FakeQP(), "x", 0.25, "bpp")
        assert abs(8.0 / (1 + q) - 0.25) == min(
            abs(8.0 / (1 + qq) - 0.25) for qq in range(0, 52))
        assert FakeQP.calls < 10  # bisection, not a scan

        class FakePlateau:
            quality_range = (1, 100)
            quality_reversed = False

            def run(self, path, q):
                return {"bpp": float(min(max(q, 40), 60)) / 10.0}

        q, val, _ = find_closest(FakePlateau(), "x", 7.3, "bpp")
        assert val == 6.0  # plateau edge: closest attainable value


class TestEvalHomographyCLI:
    def test_smoke_fresh_init(self, tmp_path, capsys):
        from hesic_tpu.utils import eval_homography
        rng = np.random.RandomState(0)
        for eye in ("left", "right"):
            d = tmp_path / "data" / "test" / eye
            d.mkdir(parents=True)
            for i in range(2):
                arr = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i:02d}.png")
        figs = tmp_path / "figs"
        eval_homography.main([
            str(tmp_path / "data"), "--n", "1", "--timing-reps", "1",
            "--figures", str(figs)])
        out = capsys.readouterr().out
        assert "MACE" in out and "params:" in out
        assert (figs / "input_0.gif").exists()
        assert (figs / "output_patch0.gif").exists()


class TestTFCIWrapper:
    def test_gates_on_script(self):
        from hesic_tpu.utils.bench_codecs import TFCI
        codec = TFCI()
        assert not codec.available()  # tensorflow-compression not installed
        assert TFCI.quality_range == (1, 8)


class TestPlotBackends:
    def test_plotly_backend_gates_gracefully(self, tmp_path, monkeypatch):
        # Force the plotly import to fail so the test is independent of
        # whether plotly happens to be installed in this environment.
        import builtins
        real_import = builtins.__import__

        def fake_import(name, *args, **kwargs):
            if name.startswith("plotly"):
                raise ImportError("forced for test")
            return real_import(name, *args, **kwargs)

        monkeypatch.setattr(builtins, "__import__", fake_import)
        from hesic_tpu.utils import plot
        res = tmp_path / "r.json"
        res.write_text(json.dumps(
            {"name": "jpeg", "results": {"bpp": [0.2], "psnr": [30.0]}}))
        with pytest.raises(SystemExit):
            plot.main([str(res), "--backend", "plotly"])
