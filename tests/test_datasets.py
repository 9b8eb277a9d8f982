"""Dataset tests (stereo layout, paired crops, homography patches),
fixing the reference's own inconsistency — its tests/test_datasets.py was
written for the pre-stereo API and doesn't create left/right dirs."""

import numpy as np
import pytest

from hesic_tpu.datasets import (ImageFolder, StereoImageFolder,
                                SyntheticHomographyDataset, batch_iterator)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _make_stereo_tree(tmp_path, n=3, size=(320, 280)):
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for eye in ("left", "right"):
            d = tmp_path / split / eye
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                arr = (rng.rand(size[0], size[1], 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i:03d}.png")
    return str(tmp_path)


class TestStereoImageFolder:
    def test_counts_and_pairing(self, tmp_path):
        root = _make_stereo_tree(tmp_path)
        ds = StereoImageFolder(root, "train", patch_size=(256, 256))
        assert len(ds) == 3
        item = ds[0]
        assert item["x1"].shape == (256, 256, 3)
        assert item["x2"].shape == (256, 256, 3)
        assert item["homo_img1"].shape == (128, 128, 1)
        assert item["corners"].shape == (4, 2)

    def test_paired_crop_same_window(self, tmp_path):
        """Left/right crops must use the same window: encode identical
        images on both sides and require identical crops."""
        root = str(tmp_path)
        rng = np.random.RandomState(1)
        for eye in ("left", "right"):
            d = tmp_path / "train" / eye
            d.mkdir(parents=True)
        arr = (rng.rand(300, 300, 3) * 255).astype(np.uint8)
        for eye in ("left", "right"):
            Image.fromarray(arr).save(tmp_path / "train" / eye / "a.png")
        ds = StereoImageFolder(root, "train", patch_size=(128, 128))
        item = ds[0]
        np.testing.assert_array_equal(item["x1"], item["x2"])

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(RuntimeError):
            StereoImageFolder(str(tmp_path), "train")

    def test_unpaired_names_raise(self, tmp_path):
        for eye, name in (("left", "a.png"), ("right", "b.png")):
            d = tmp_path / "train" / eye
            d.mkdir(parents=True)
            Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(d / name)
        ds = StereoImageFolder(str(tmp_path), "train", patch_size=(64, 64))
        with pytest.raises(ValueError):
            ds[0]

    def test_classical_h_mode(self, tmp_path):
        """classical_h=True emits a per-pair H from the feature estimator
        (the reference get_H path, datasets/utils.py:30-67); a shifted
        right view must recover the shift."""
        rng = np.random.RandomState(2)
        blocks = rng.rand(16, 16, 3)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        right = np.roll(img, -4, axis=1)  # im2(x) = im1(x + 4)
        for eye, arr in (("left", img), ("right", right)):
            d = tmp_path / "train" / eye
            d.mkdir(parents=True)
            Image.fromarray(arr).save(d / "a.png")
        ds = StereoImageFolder(str(tmp_path), "train",
                               patch_size=(128, 128), classical_h=True)
        item = ds[0]
        assert item["h"].shape == (3, 3)
        assert abs(item["h"][0, 2] - (-4.0)) < 1.0
        # identity fallback on a featureless pair (reference returns a
        # degraded tuple on SURF failure, utils.py:189-196)
        for eye in ("left", "right"):
            Image.fromarray(np.full((128, 128, 3), 90, np.uint8)).save(
                tmp_path / "train" / eye / "a.png")
        ds2 = StereoImageFolder(str(tmp_path), "train",
                                patch_size=(128, 128), classical_h=True)
        np.testing.assert_array_equal(ds2[0]["h"], np.eye(3))

    def test_batch_iterator(self, tmp_path):
        root = _make_stereo_tree(tmp_path, n=5)
        ds = StereoImageFolder(root, "train", patch_size=(64, 64))
        batches = list(batch_iterator(ds, 2, shuffle=True, seed=1))
        assert len(batches) == 2  # drop_last
        assert batches[0]["x1"].shape == (2, 64, 64, 3)


class TestImageFolder:
    def test_single_images(self, tmp_path):
        d = tmp_path / "train"
        d.mkdir()
        for i in range(4):
            Image.fromarray(
                np.zeros((80, 90, 3), np.uint8)).save(d / f"{i}.png")
        ds = ImageFolder(str(tmp_path), "train", patch_size=(64, 64))
        assert len(ds) == 4
        assert ds[0]["x"].shape == (64, 64, 3)


class TestSyntheticHomography:
    def test_synthetic_mode(self, tmp_path):
        root = _make_stereo_tree(tmp_path, n=2)
        ds = SyntheticHomographyDataset(root, "train", synthetic=True)
        item = ds[0]
        assert item["patch_a"].shape == (128, 128, 1)
        assert item["patch_b"].shape == (128, 128, 1)
        assert item["delta_gt"].shape == (4, 2)
        assert np.any(item["delta_gt"] != 0)

    def test_pair_mode(self, tmp_path):
        root = _make_stereo_tree(tmp_path, n=2)
        ds = SyntheticHomographyDataset(root, "train", synthetic=False)
        item = ds[0]
        np.testing.assert_array_equal(item["delta_gt"], 0)
