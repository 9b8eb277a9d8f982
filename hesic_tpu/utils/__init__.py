from .metrics import ms_ssim, np_psnr, psnr, ssim

__all__ = ["ms_ssim", "np_psnr", "psnr", "ssim"]
