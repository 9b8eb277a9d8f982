"""hesic_tpu — TPU-native learned stereo/single image compression framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
ywz978020607/HESIC (CompressAI fork + HESIC/HESIC+/DSIC stereo codecs +
unsupervised deep homography).  Compute paths run on TPU via XLA; the
serial entropy-coding loops run in a native C++ runtime (hesic_tpu.codecs).

Entropy-coder registry mirrors the reference public API
(reference compressai/__init__.py:22-60).
"""

__version__ = "0.1.0"

_AVAILABLE_ENTROPY_CODERS = ("ans", "rangecoder")
_entropy_coder = "ans"


def available_entropy_coders():
    """List the names of the usable entropy coders."""
    return list(_AVAILABLE_ENTROPY_CODERS)


def get_entropy_coder():
    """Return the name of the default entropy coder."""
    return _entropy_coder


def set_entropy_coder(entropy_coder: str):
    """Set the default entropy coder ('ans' or 'rangecoder')."""
    global _entropy_coder
    if not isinstance(entropy_coder, str):
        raise ValueError(f'Invalid entropy coder type "{type(entropy_coder)}"')
    if entropy_coder not in _AVAILABLE_ENTROPY_CODERS:
        coders = ", ".join(_AVAILABLE_ENTROPY_CODERS)
        raise ValueError(f'Invalid entropy coder "{entropy_coder}", '
                         f"choose from ({coders})")
    _entropy_coder = entropy_coder
