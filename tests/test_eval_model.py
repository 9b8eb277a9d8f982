"""eval_model CLI smoke tests (entropy-estimation + real coder paths)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from hesic_tpu.utils import eval_model  # noqa: E402


def _stereo_tree(tmp_path, n=1, size=64):
    rng = np.random.RandomState(0)
    for split in ("test",):
        for eye in ("left", "right"):
            d = tmp_path / split / eye
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return str(tmp_path)


def _single_tree(tmp_path, n=1, size=96):
    d = tmp_path / "test"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    return str(tmp_path)


class TestEvalModel:
    def test_single_image_entropy_estimation(self, tmp_path):
        data = _single_tree(tmp_path / "d")
        summary = eval_model.main([
            "--arch", "bmshj2018-factorized", "--dataset", data,
            "--entropy-estimation", "--max-images", "1",
            "--quality", "1",
        ] + ["--output", str(tmp_path / "out.json")])
        res = summary["results"]
        assert res["bpp"] > 0
        assert np.isfinite(res["psnr"])

    def test_single_image_real_coder(self, tmp_path):
        data = _single_tree(tmp_path / "d")
        import hesic_tpu.zoo as zoo
        # shrink the model via overrides through a checkpoint
        codec = zoo.create_model("bmshj2018-factorized", quality=1,
                                 image_size=(64, 64), N=8, M=12)
        ckpt = str(tmp_path / "m.pkl")
        codec.save(ckpt)
        summary = eval_model.main([
            "--arch", "bmshj2018-factorized", "--dataset", data,
            "--checkpoint", ckpt, "--max-images", "1",
            "--workdir", str(tmp_path),
        ])
        res = summary["results"]
        assert res["bpp"] > 0
        assert res["encoding_time"] > 0

    def test_single_image_device_codec(self, tmp_path):
        """--device-codec routes mbt2018 through the wavefront codec
        (scan backend on CPU) behind the same CLI contract."""
        data = _single_tree(tmp_path / "d", size=64)
        import hesic_tpu.zoo as zoo
        codec = zoo.create_model("mbt2018", quality=1,
                                 image_size=(64, 64), N=8, M=16)
        ckpt = str(tmp_path / "m.pkl")
        codec.save(ckpt)
        summary = eval_model.main([
            "--arch", "mbt2018", "--dataset", data,
            "--checkpoint", ckpt, "--max-images", "1",
            "--workdir", str(tmp_path), "--device-codec",
        ])
        res = summary["results"]
        assert res["bpp"] > 0
        assert np.isfinite(res["psnr"])

    def test_stereo_device_codec(self, tmp_path):
        data = _stereo_tree(tmp_path / "d")
        import hesic_tpu.zoo as zoo
        codec = zoo.create_model("hesic-plus", quality=1,
                                 image_size=(64, 64), N=8, M=16)
        ckpt = str(tmp_path / "m.pkl")
        codec.save(ckpt)
        summary = eval_model.main([
            "--arch", "hesic-plus", "--dataset", data,
            "--checkpoint", ckpt, "--max-images", "1",
            "--workdir", str(tmp_path), "--device-codec",
        ])
        res = summary["results"]
        assert res["bpp"] > 0
        assert np.isfinite(res["psnr"])

    def test_device_codec_rejects_unsupported_arch(self, tmp_path):
        data = _single_tree(tmp_path / "d", size=64)
        with pytest.raises(SystemExit):
            eval_model.main([
                "--arch", "bmshj2018-factorized", "--dataset", data,
                "--device-codec",
            ])

    def test_pad_unpad_roundtrip(self):
        x = np.random.RandomState(0).rand(1, 100, 130, 3).astype(np.float32)
        xp, meta = eval_model.pad_to_multiple(x, 64)
        assert xp.shape[1] % 64 == 0 and xp.shape[2] % 64 == 0
        back = eval_model.unpad(xp, meta)
        np.testing.assert_array_equal(back, x)
