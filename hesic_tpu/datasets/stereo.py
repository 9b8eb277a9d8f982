"""Datasets: stereo pair folders + single-image folders, NHWC numpy.

Reference: compressai/datasets/utils.py (stereo rewrite of ImageFolder —
left/right dirs, identical-filename check, paired random crop, and the
homography-net inputs: 256-resize, grayscale, normalize, random 128 patch
+ corner tensor) and the original single-image version
(datasets/utils_backup.py:22).

The classical SURF+RANSAC homography (utils.py:30-67) is available as the
opt-in ``classical_h=True`` mode, served by the TPU-native feature pipeline
(geometry/features.py: Harris + upright-SURF descriptors + RANSAC DLT); the
default path remains the learned homography network — the reference's own
"real" training scripts already use it (newtrain1_real.py:113-131).
Loading is PIL + numpy; batching is a plain iterator so the input pipeline
stays framework-free and feeds ``jax.device_put`` directly.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Optional

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

# scalar grayscale normalization constants (reference datasets/utils.py:26-27:
# the means of the per-channel ImageNet stats)
MEAN = float(np.mean([0.485, 0.456, 0.406]))
STD = float(np.mean([0.229, 0.224, 0.225]))

HOMO_PIC_SIZE = 256
HOMO_PATCH_SIZE = 128
HOMO_RHO = 45


def _load_image(path: str) -> np.ndarray:
    if Image is None:
        raise ImportError("PIL is required to load images")
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), np.float32) / 255.0


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    pil = Image.fromarray((img * 255).astype(np.uint8))
    pil = pil.resize((size, size), Image.BILINEAR)
    return np.asarray(pil, np.float32) / 255.0


def _homography_inputs(img: np.ndarray, x: int, y: int):
    """Grayscale, normalized, cropped patch for the homography net."""
    return _homography_full(img)[y: y + HOMO_PATCH_SIZE,
                                 x: x + HOMO_PATCH_SIZE]


def _homography_full(img: np.ndarray):
    """Full 256 grayscale normalized image (photometric_loss warps the
    FULL image, not the patch — udh/udh/model.py:18-45)."""
    small = _resize(img, HOMO_PIC_SIZE)
    gray = small.mean(axis=-1, keepdims=True)
    return (gray - MEAN) / STD


class StereoImageFolder:
    """root/{split}/{left,right}/<name>.png stereo pairs.

    __getitem__ returns a dict:
      x1, x2          (H, W, 3) float32 paired random crops
      homo_img1/2     (128, 128, 1) normalized grayscale patches
      corners         (4, 2) float32 patch corners in 256-space
      name            basename (when need_file_name)
    """

    def __init__(self, root: str, split: str = "train",
                 patch_size=(256, 256), need_file_name: bool = False,
                 classical_h: bool = False,
                 rng: Optional[np.random.RandomState] = None):
        splitdir = os.path.join(root, split)
        if not os.path.isdir(splitdir):
            raise RuntimeError(f'Invalid directory "{root}"')
        self.left_list = sorted(
            glob.glob(os.path.join(splitdir, "left", "*")))
        self.right_list = sorted(
            glob.glob(os.path.join(splitdir, "right", "*")))
        if isinstance(patch_size, int):
            patch_size = (patch_size, patch_size)
        self.patch_size = tuple(patch_size)
        self.need_file_name = need_file_name
        # classical_h: emit an "h" entry per pair from the feature-based
        # estimator, the reference get_H path (datasets/utils.py:189-196:
        # identity stands in where the reference degraded its tuple on a
        # SURF failure, so batch shapes stay static)
        self.classical_h = classical_h
        self.rng = rng or np.random.RandomState()

    def __len__(self):
        return len(self.left_list)

    def __getitem__(self, index: int) -> dict:
        lpath = self.left_list[index]
        rpath = self.right_list[index]
        if os.path.basename(lpath) != os.path.basename(rpath):
            raise ValueError(f"unpaired stereo images: {lpath} vs {rpath}")
        img1 = _load_image(lpath)
        img2 = _load_image(rpath)

        h, w, _ = img1.shape
        # clamp per axis: patch >= image keeps the full extent on that axis
        # (the reference only handled the ph == h case,
        # datasets/utils.py:140-146; randint(0, 0) crashed on pw == w and
        # any patch larger than the image)
        ph = min(self.patch_size[0], h)
        pw = min(self.patch_size[1], w)
        sh = 0 if ph >= h else self.rng.randint(0, h - ph)
        sw = 0 if pw >= w else self.rng.randint(0, w - pw)
        img1 = img1[sh: sh + ph, sw: sw + pw]
        img2 = img2[sh: sh + ph, sw: sw + pw]

        # homography-net patch + corners (reference utils.py:160-186)
        lo = HOMO_RHO
        hi = HOMO_PIC_SIZE - HOMO_RHO - HOMO_PATCH_SIZE
        if hi >= lo:
            x = self.rng.randint(lo, hi + 1)
            y = self.rng.randint(lo, hi + 1)
        else:
            x = y = 0
        corners = np.array(
            [[x, y], [x + HOMO_PATCH_SIZE, y],
             [x + HOMO_PATCH_SIZE, y + HOMO_PATCH_SIZE],
             [x, y + HOMO_PATCH_SIZE]], np.float32)

        full1 = _homography_full(img1)
        item = {
            "x1": img1,
            "x2": img2,
            "homo_img1": full1[y: y + HOMO_PATCH_SIZE,
                               x: x + HOMO_PATCH_SIZE],
            "homo_img2": _homography_inputs(img2, x, y),
            # full left view: photometric_loss warps the whole image so
            # content can enter the patch from outside it (model.py:18-45)
            "homo_full1": full1,
            "corners": corners,
        }
        if self.classical_h:
            from ..geometry.features import get_h_classical
            h_cls = get_h_classical(img1, img2)
            item["h"] = (np.eye(3, dtype=np.float32)
                         if h_cls is None else h_cls)
        if self.need_file_name:
            item["name"] = os.path.basename(lpath)
        return item


class ImageFolder:
    """root/{split}/*.png single images (original CompressAI dataset,
    reference datasets/utils_backup.py:22)."""

    def __init__(self, root: str, split: str = "train", patch_size=None,
                 rng: Optional[np.random.RandomState] = None):
        splitdir = os.path.join(root, split)
        if not os.path.isdir(splitdir):
            raise RuntimeError(f'Invalid directory "{root}"')
        self.samples = sorted(
            p for p in glob.glob(os.path.join(splitdir, "*"))
            if os.path.isfile(p))
        if isinstance(patch_size, int):
            patch_size = (patch_size, patch_size)
        self.patch_size = patch_size
        self.rng = rng or np.random.RandomState()

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> dict:
        img = _load_image(self.samples[index])
        if self.patch_size is not None:
            h, w, _ = img.shape
            ph, pw = self.patch_size
            sh = 0 if ph >= h else self.rng.randint(0, h - ph)
            sw = 0 if pw >= w else self.rng.randint(0, w - pw)
            img = img[sh: sh + ph, sw: sw + pw]
        return {"x": img}


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True) -> Iterator[dict]:
    """Yield dict batches with stacked leading axis (one epoch)."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    for lo in range(0, len(order), batch_size):
        idx = order[lo: lo + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        items = [dataset[int(i)] for i in idx]
        yield {
            k: np.stack([it[k] for it in items])
            if not isinstance(items[0][k], str) else [it[k] for it in items]
            for k in items[0]
        }
