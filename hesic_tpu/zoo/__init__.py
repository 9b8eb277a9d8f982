"""Model zoo: name -> (module, codec) constructors with quality configs.

Reference: compressai/zoo/image.py (cfgs :105-155, loaders :157-341) plus
the HESIC/DSIC research models.  ``pretrained=True`` resolves checkpoints
from a local zoo cache ($HESIC_ZOO_DIR; torch ``.pth.tar`` files are
converted through ``utils.convert_torch`` and cached) and can download
from a populated ``model_urls`` table — the reference's URL entries embed
content hashes (zoo/image.py:40-103) and this environment has no egress,
so the table ships empty.
"""

from __future__ import annotations

from typing import Optional

from ..models import (DSIC, DSICFastCodec, HESIC, Cheng2020Anchor, Cheng2020Attention,
                      DSICCodec, DSICPlus, DSICPlusCodec, FactorizedPrior,
                      FactorizedPriorCodec, HESICCodec, HESICFastCodec,
                      HESICPlus, HESICPlusCodec, HESICPlusTogether,
                      HESICPlusTogetherCodec, HESICTogether,
                      HESICTogetherCodec,
                      JointAutoregressiveCodec,
                      JointAutoregressiveHierarchicalPriors,
                      MeanScaleHyperprior, MeanScaleHyperpriorCodec,
                      ScaleHyperprior, ScaleHyperpriorCodec)

model_architectures = {
    "bmshj2018-factorized": (FactorizedPrior, FactorizedPriorCodec),
    "bmshj2018-hyperprior": (ScaleHyperprior, ScaleHyperpriorCodec),
    "mbt2018-mean": (MeanScaleHyperprior, MeanScaleHyperpriorCodec),
    "mbt2018": (JointAutoregressiveHierarchicalPriors,
                JointAutoregressiveCodec),
    "cheng2020-anchor": (Cheng2020Anchor, JointAutoregressiveCodec),
    "cheng2020-attn": (Cheng2020Attention, JointAutoregressiveCodec),
    "hesic": (HESIC, HESICFastCodec),
    "hesic-together": (HESICTogether, HESICTogetherCodec),
    "hesic-plus": (HESICPlus, HESICPlusCodec),
    "hesic-plus-together": (HESICPlusTogether, HESICPlusTogetherCodec),
    "dsic": (DSIC, DSICFastCodec),
    "dsic-plus": (DSICPlus, DSICPlusCodec),
}

# quality -> constructor kwargs (reference zoo/image.py:105-155)
cfgs = {
    "bmshj2018-factorized": {q: {"N": 128, "M": 192} for q in range(1, 6)}
    | {q: {"N": 192, "M": 320} for q in range(6, 9)},
    "bmshj2018-hyperprior": {q: {"N": 128, "M": 192} for q in range(1, 6)}
    | {q: {"N": 192, "M": 320} for q in range(6, 9)},
    "mbt2018-mean": {q: {"N": 128, "M": 192} for q in range(1, 5)}
    | {q: {"N": 192, "M": 320} for q in range(5, 9)},
    "mbt2018": {q: {"N": 192, "M": 192} for q in range(1, 5)}
    | {q: {"N": 192, "M": 320} for q in range(5, 9)},
    "cheng2020-anchor": {q: {"N": 128, "M": 128} for q in range(1, 4)}
    | {q: {"N": 192, "M": 192} for q in range(4, 7)},
    "cheng2020-attn": {q: {"N": 128, "M": 128} for q in range(1, 4)}
    | {q: {"N": 192, "M": 192} for q in range(4, 7)},
    # stereo models use one published configuration (newtrain1.py:281)
    "hesic": {q: {"N": 128, "M": 192, "K": 5} for q in range(1, 9)},
    "hesic-together": {q: {"N": 128, "M": 192, "K": 5} for q in range(1, 9)},
    "hesic-plus": {q: {"N": 128, "M": 192} for q in range(1, 9)},
    "hesic-plus-together": {q: {"N": 128, "M": 192} for q in range(1, 9)},
    "dsic": {q: {"N": 128, "M": 192, "F": 21, "C": 32, "K": 5}
             for q in range(1, 9)},
    "dsic-plus": {q: {"N": 128, "M": 192, "F": 21, "C": 32, "K": 5}
                  for q in range(1, 9)},
}

_STEREO = {"hesic", "hesic-together", "hesic-plus", "hesic-plus-together",
           "dsic", "dsic-plus"}
_WITH_HOMOGRAPHY = {"hesic", "hesic-together", "hesic-plus",
                    "hesic-plus-together"}

models = model_architectures  # reference-compatible alias

# (name, quality, metric) -> checkpoint URL.  The reference's table
# (compressai/zoo/image.py:40-103) embeds content hashes in the file
# names, so the entries are data, not derivable — populate this dict
# (or drop checkpoint files into the zoo cache, see `zoo_cache_dir`)
# to enable `pretrained=True`.
model_urls: dict = {}


def zoo_cache_dir() -> str:
    """Local pretrained-checkpoint cache (override: $HESIC_ZOO_DIR) —
    the torch.hub cache-dir analogue of the reference loaders."""
    import os
    return os.environ.get(
        "HESIC_ZOO_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "hesic_tpu",
                     "zoo"))


def _pretrained_state(name: str, quality: int, metric: str = "mse") -> dict:
    """Resolve a pretrained checkpoint like the reference `_load_model`
    (zoo/image.py:157-341), with the download step factored behind a
    local cache: `{name}-q{quality}-{metric}.pkl` (converted format) is
    loaded directly; a torch `.pth.tar` beside it is converted through
    `utils.convert_torch` and cached; a populated `model_urls` entry is
    fetched first when neither exists (requires network egress)."""
    import os
    import pickle
    d = zoo_cache_dir()
    stem = f"{name}-q{quality}-{metric}"
    pkl = os.path.join(d, stem + ".pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            return pickle.load(f)
    pth = os.path.join(d, stem + ".pth.tar")
    if not os.path.exists(pth):
        url = model_urls.get((name, quality, metric))
        if url is None:
            raise FileNotFoundError(
                f"no pretrained checkpoint for {name} q{quality} "
                f"({metric}): expected {pkl} or {pth}. Download the "
                f"reference torch checkpoint to that path (URL table: "
                f"reference compressai/zoo/image.py:40-103) or convert "
                f"one via `python -m hesic_tpu.utils.convert_torch`.")
        import urllib.request
        os.makedirs(d, exist_ok=True)
        urllib.request.urlretrieve(url, pth)
    import torch

    from ..utils.convert_torch import convert_state_dict
    payload = torch.load(pth, map_location="cpu", weights_only=False)
    state = {"params": convert_state_dict(payload, name)}
    os.makedirs(d, exist_ok=True)
    with open(pkl, "wb") as f:
        pickle.dump(state, f)
    return state


def is_stereo(name: str) -> bool:
    return name in _STEREO


def uses_homography(name: str) -> bool:
    return name in _WITH_HOMOGRAPHY


def _input_shapes(name: str, image_size=(256, 256)):
    h, w = image_size
    if name in _WITH_HOMOGRAPHY:
        return [(1, h, w, 3), (1, h, w, 3), (1, 3, 3)]
    if name in _STEREO:
        return [(1, h, w, 3), (1, h, w, 3)]
    return [(1, h, w, 3)]


def create_model(name: str, quality: int = 1, seed: int = 0,
                 pretrained: bool = False,
                 checkpoint: Optional[str] = None, image_size=(256, 256),
                 **overrides):
    """Instantiate a model + codec wrapper at the given quality point."""
    if name not in model_architectures:
        raise ValueError(f'Invalid architecture name "{name}" '
                         f"(choose from {sorted(model_architectures)})")
    if quality not in cfgs[name]:
        raise ValueError(f'Invalid quality "{quality}" for "{name}" '
                         f"(valid: {sorted(cfgs[name])})")
    module_cls, codec_cls = model_architectures[name]
    kwargs = dict(cfgs[name][quality])
    if pretrained:
        state = _pretrained_state(name, quality,
                                  overrides.pop("metric", "mse"))
        kwargs.update(state.get("config") or {})
        kwargs.update(overrides)
        module = module_cls(**kwargs)
        codec = codec_cls(module, state["params"]).load_state_dict(state)
        if not codec.tables:
            # converted torch checkpoints carry no CDF tables; build them
            # so the returned codec is ready to code, like the
            # reference's pretrained loaders (zoo/image.py:157-341)
            codec.update()
        return codec
    if checkpoint is not None:
        import pickle
        with open(checkpoint, "rb") as f:
            state = pickle.load(f)
        kwargs.update(state.get("config") or {})
        kwargs.update(overrides)
        module = module_cls(**kwargs)
        return codec_cls(module, state["params"]).load_state_dict(state)
    kwargs.update(overrides)
    module = module_cls(**kwargs)
    return codec_cls.init(module, _input_shapes(name, image_size), seed=seed)
