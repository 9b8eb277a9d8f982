"""End-to-end training CLI smoke tests (tiny data, tiny models)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from hesic_tpu.training import train as train_cli  # noqa: E402
from hesic_tpu.training import train_homography  # noqa: E402


def _make_stereo_tree(tmp_path, n=2, size=96):
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for eye in ("left", "right"):
            d = tmp_path / split / eye
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i:02d}.png")
    return str(tmp_path)


def _make_single_tree(tmp_path, n=2, size=96):
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        d = tmp_path / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:02d}.png")
    return str(tmp_path)


class TestTrainCLI:
    def test_single_image_model_one_epoch(self, tmp_path):
        data = _make_single_tree(tmp_path / "data")
        ckpt = str(tmp_path / "ckpt")
        state = train_cli.main([
            "--model", "bmshj2018-factorized", "--dataset", data,
            "--epochs", "1", "--batch-size", "2", "--patch-size", "64",
            "--overrides", "N=8,M=12", "--checkpoint-dir", ckpt,
            "--log-file", str(tmp_path / "log.txt"),
        ])
        assert os.path.exists(os.path.join(ckpt, "checkpoint.pkl"))
        assert os.path.exists(os.path.join(ckpt, "model_latest.pkl"))
        assert int(state.step) >= 1

    def test_hesic_one_epoch_and_resume(self, tmp_path):
        data = _make_stereo_tree(tmp_path / "data")
        ckpt = str(tmp_path / "ckpt")
        args = [
            "--model", "hesic", "--dataset", data, "--epochs", "1",
            "--batch-size", "2", "--patch-size", "64",
            "--overrides", "N=8,M=16,K=2", "--checkpoint-dir", ckpt,
            "--log-file", str(tmp_path / "log.txt"),
        ]
        train_cli.main(args)
        assert os.path.exists(
            os.path.join(ckpt, "checkpoint_best_loss.pkl"))
        # resume path: epochs=1 already done -> returns immediately
        state = train_cli.main(args)
        assert state is not None

    def test_bf16_transforms(self, tmp_path):
        """--bf16 trains with bfloat16 transform convs (f32 params and
        entropy math) and rejects archs without a dtype field."""
        data = _make_stereo_tree(tmp_path / "data")
        ckpt = str(tmp_path / "ckpt_bf16")
        state = train_cli.main([
            "--model", "hesic", "--dataset", data, "--epochs", "1",
            "--batch-size", "2", "--patch-size", "64",
            "--overrides", "N=8,M=16,K=2", "--bf16",
            "--checkpoint-dir", ckpt,
            "--log-file", str(tmp_path / "log.txt"),
        ])
        import jax.numpy as jnp
        assert int(state.step) >= 1
        leaves = [x for x in
                  __import__("jax").tree_util.tree_leaves(state.params)]
        assert all(x.dtype == jnp.float32 for x in leaves
                   if hasattr(x, "dtype"))
        with pytest.raises(SystemExit):
            train_cli.main([
                "--model", "bmshj2018-factorized", "--dataset", data,
                "--epochs", "1", "--bf16",
            ])

    def test_stage2_freezes_codec(self, tmp_path):
        data = _make_stereo_tree(tmp_path / "data")
        ckpt = str(tmp_path / "ckpt2")
        import jax
        state = train_cli.main([
            "--model", "hesic-together", "--dataset", data,
            "--epochs", "1", "--batch-size", "2", "--patch-size", "64",
            "--overrides", "N=8,M=16,K=2", "--stage2",
            "--checkpoint-dir", ckpt,
            "--log-file", str(tmp_path / "log.txt"),
        ])
        # m1 (codec) params unchanged vs fresh init with same seed
        from hesic_tpu.zoo import create_model
        fresh = create_model("hesic-together", quality=1, seed=0,
                             image_size=(64, 64), N=8, M=16, K=2)
        for path in ("m1",):
            a = jax.tree_util.tree_leaves(state.params[path])
            b = jax.tree_util.tree_leaves(fresh.params[path])
            assert all(np.allclose(x, y) for x, y in zip(a, b)), \
                "stage2 must not update codec params"
        a = jax.tree_util.tree_leaves(state.params["m2"])
        b = jax.tree_util.tree_leaves(fresh.params["m2"])
        assert not all(np.allclose(x, y) for x, y in zip(a, b)), \
            "stage2 must update the enhancement params"


class TestHomographyTrainer:
    def test_one_epoch(self, tmp_path):
        data = _make_stereo_tree(tmp_path / "data", size=300)
        ckpt = str(tmp_path / "homo")
        train_homography.main([
            "--dataset", data, "--epochs", "1", "--batch-size", "2",
            "--checkpoint-dir", ckpt,
        ])
        assert os.path.exists(os.path.join(ckpt, "homo_best.pkl"))
