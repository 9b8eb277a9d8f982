from .losses import (bits, mse2psnr, msssim_db, rate_distortion_loss,
                     stereo_rate_distortion_loss)
from .train_state import (TrainState, load_checkpoint, make_optimizer,
                          make_train_step, param_labels, save_checkpoint)

__all__ = [
    "bits",
    "mse2psnr",
    "msssim_db",
    "rate_distortion_loss",
    "stereo_rate_distortion_loss",
    "TrainState",
    "load_checkpoint",
    "make_optimizer",
    "make_train_step",
    "param_labels",
    "save_checkpoint",
]
