from .features import (estimate_homography, find_homography_ransac,
                       get_h_classical)
from .fast_warp import warp_perspective_train
from .homography import (get_perspective_transform, upscale_homography,
                         warp_perspective)
from .net import HomographyNet, photometric_loss

__all__ = [
    "estimate_homography",
    "find_homography_ransac",
    "get_h_classical",
    "get_perspective_transform",
    "upscale_homography",
    "warp_perspective",
    "warp_perspective_train",
    "HomographyNet",
    "photometric_loss",
]
