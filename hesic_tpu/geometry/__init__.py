from .homography import (get_perspective_transform, upscale_homography,
                         warp_perspective)
from .net import HomographyNet, photometric_loss

__all__ = [
    "get_perspective_transform",
    "upscale_homography",
    "warp_perspective",
    "HomographyNet",
    "photometric_loss",
]
