"""Synthetic homography dataset for pretraining the homography net.

Reference: udh/udh/dataset.py:20-97 (SyntheticDataset) — grayscale
256-resize, random 128x128 patch + corner tensor; in the original DeTone
setup the second patch is the first warped by a random corner perturbation
(delta ground truth); the stereo variant feeds real left/right pairs.
This implementation supports both:

  * pair mode  — (img_a, img_b) from a stereo folder (delta_gt = 0s,
    training is purely photometric, like QHtrain.py)
  * synthetic mode — img_b is img_a warped by a random delta in
    [-rho, rho], so delta_gt supervises directly.
"""

from __future__ import annotations

import numpy as np

from ..geometry import get_perspective_transform, warp_perspective
from .stereo import (HOMO_PATCH_SIZE, HOMO_PIC_SIZE, HOMO_RHO, MEAN, STD,
                     StereoImageFolder, _load_image, _resize)


class SyntheticHomographyDataset:
    """Yields (img_a, img_b, patch_a, patch_b, corners, delta_gt)."""

    def __init__(self, root: str, split: str = "train", rho: int = HOMO_RHO,
                 synthetic: bool = True, rng=None):
        self.base = StereoImageFolder(root, split)
        self.rho = rho
        self.synthetic = synthetic
        self.rng = rng or np.random.RandomState()

    def __len__(self):
        return len(self.base)

    def _gray(self, img):
        small = _resize(img, HOMO_PIC_SIZE)
        g = small.mean(axis=-1, keepdims=True)
        return (g - MEAN) / STD

    def __getitem__(self, index: int) -> dict:
        lpath = self.base.left_list[index]
        rpath = self.base.right_list[index]
        img_a = self._gray(_load_image(lpath))

        lo = self.rho
        hi = HOMO_PIC_SIZE - self.rho - HOMO_PATCH_SIZE
        x = self.rng.randint(lo, hi + 1) if hi >= lo else 0
        y = self.rng.randint(lo, hi + 1) if hi >= lo else 0
        corners = np.array(
            [[x, y], [x + HOMO_PATCH_SIZE, y],
             [x + HOMO_PATCH_SIZE, y + HOMO_PATCH_SIZE],
             [x, y + HOMO_PATCH_SIZE]], np.float32)

        if self.synthetic:
            delta = self.rng.randint(-self.rho, self.rho + 1,
                                     size=(4, 2)).astype(np.float32)
            h = get_perspective_transform(corners[None],
                                          (corners + delta)[None])
            img_b = np.asarray(
                warp_perspective(img_a[None], np.linalg.inv(
                    np.asarray(h)), (HOMO_PIC_SIZE, HOMO_PIC_SIZE)))[0]
        else:
            img_b = self._gray(_load_image(rpath))
            delta = np.zeros((4, 2), np.float32)

        patch_a = img_a[y: y + HOMO_PATCH_SIZE, x: x + HOMO_PATCH_SIZE]
        patch_b = img_b[y: y + HOMO_PATCH_SIZE, x: x + HOMO_PATCH_SIZE]
        return {
            "img_a": img_a,
            "img_b": img_b,
            "patch_a": patch_a,
            "patch_b": patch_b,
            "corners": corners,
            "delta_gt": delta,
        }
