"""PyTorch -> hesic_tpu checkpoint conversion.

Converts CompressAI v1.0.0 / HESIC-fork torch state_dicts into this
framework's NHWC/HWIO param trees so published checkpoints can be evaluated
without retraining (SURVEY.md §7 hard part 4).

Layout rules:
  conv    torch (out, in, kh, kw)         -> HWIO (kh, kw, in, out)
  deconv  torch (in, out, kh, kw)         -> HWIO spatially flipped
          (our Deconv is input-dilated correlation; transposed conv equals
          correlation with the spatially flipped kernel)
  dense   torch (out, in)                 -> (in, out)
  GDN     beta (C,), gamma (C, C)         -> unchanged (same orientation)
  EntropyBottleneck  _matrices.{i}/_biases.{i}/_factors.{i}/quantiles
          -> matrix_{i}/bias_{i}/factor_{i}/quantiles (same shapes)

Flax list-submodule names equal torch Sequential indices (g_a.0 -> g_a_0),
so sequential stacks map mechanically.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_conv(state: Dict, prefix: str) -> dict:
    out = {"kernel": _np(state[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return out


def convert_deconv(state: Dict, prefix: str) -> dict:
    w = _np(state[f"{prefix}.weight"])  # (in, out, kh, kw)
    kernel = np.flip(w, (2, 3)).transpose(2, 3, 0, 1)  # (kh, kw, in, out)
    out = {"kernel": np.ascontiguousarray(kernel)}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return out


def convert_dense(state: Dict, prefix: str) -> dict:
    out = {"kernel": _np(state[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return out


def convert_gdn(state: Dict, prefix: str) -> dict:
    return {"beta": _np(state[f"{prefix}.beta"]),
            "gamma": _np(state[f"{prefix}.gamma"])}


def convert_entropy_bottleneck(state: Dict, prefix: str) -> dict:
    out = {"quantiles": _np(state[f"{prefix}.quantiles"])}
    i = 0
    while f"{prefix}._matrices.{i}" in state:
        out[f"matrix_{i}"] = _np(state[f"{prefix}._matrices.{i}"])
        out[f"bias_{i}"] = _np(state[f"{prefix}._biases.{i}"])
        if f"{prefix}._factors.{i}" in state:
            out[f"factor_{i}"] = _np(state[f"{prefix}._factors.{i}"])
        i += 1
    if i == 0:
        raise KeyError(f"no EntropyBottleneck params under '{prefix}'")
    return out


def _convert_sequential(state: Dict, torch_prefix: str, layer_kinds) -> dict:
    """layer_kinds: {index: 'conv'|'deconv'|'gdn'} for a torch Sequential."""
    out = {}
    for idx, kind in layer_kinds.items():
        sub = f"{torch_prefix}.{idx}"
        name = f"{torch_prefix.replace('.', '_')}_{idx}"
        if kind == "conv":
            out[name] = convert_conv(state, sub)
        elif kind == "deconv":
            out[name] = convert_deconv(state, sub)
        elif kind == "gdn":
            out[name] = convert_gdn(state, sub)
        else:
            raise ValueError(kind)
    return out


_GA_KINDS = {0: "conv", 1: "gdn", 2: "conv", 3: "gdn", 4: "conv", 5: "gdn",
             6: "conv"}
_GS_KINDS = {0: "deconv", 1: "gdn", 2: "deconv", 3: "gdn", 4: "deconv",
             5: "gdn", 6: "deconv"}


def convert_factorized(state: Dict) -> dict:
    params = {}
    params.update(_convert_sequential(state, "g_a", _GA_KINDS))
    params.update(_convert_sequential(state, "g_s", _GS_KINDS))
    params["entropy_bottleneck"] = convert_entropy_bottleneck(
        state, "entropy_bottleneck")
    return params


def convert_hyperprior(state: Dict) -> dict:
    """bmshj2018-hyperprior / mbt2018-mean (same sequential layout)."""
    params = convert_factorized(state)
    params.update(_convert_sequential(
        state, "h_a", {0: "conv", 2: "conv", 4: "conv"}))
    params.update(_convert_sequential(
        state, "h_s", {0: "deconv", 2: "deconv", 4: "conv"}))
    return params


def convert_mbt2018(state: Dict) -> dict:
    params = convert_hyperprior(state)
    params.update(_convert_sequential(
        state, "entropy_parameters", {0: "conv", 2: "conv", 4: "conv"}))
    params["context_prediction"] = convert_conv(state, "context_prediction")
    return params


def _convert_stereo_coder(state: Dict, torch_name: str, flax_name: str,
                          kinds: Dict[int, str], out: dict):
    sub = {}
    for idx, kind in kinds.items():
        key = f"{torch_name}.{idx}"
        conv = {"conv": convert_conv, "deconv": convert_deconv,
                "gdn": convert_gdn}[kind]
        sub[f"{flax_name}_{idx}"] = conv(state, key)
    out[flax_name] = sub


def convert_hesic(state: Dict) -> dict:
    """HESIC (HSIC, ywz/mywork/newnet1.py) -> hesic_tpu.models.HESIC.

    The reference unrolls its encoder/decoder layers as individually-named
    conv/GDN attributes; map each onto the corresponding submodule of our
    StereoEncoder/StereoDecoder stacks (declared with @nn.compact, so the
    children are auto-named Conv_0/GDN_0/...).
    """
    def enc(prefix):
        return {
            "Conv_0": convert_conv(state, f"{prefix}.g_a_conv1"),
            "GDN_0": convert_gdn(state, f"{prefix}.g_a_gdn1"),
            "Conv_1": convert_conv(state, f"{prefix}.g_a_conv2"),
            "GDN_1": convert_gdn(state, f"{prefix}.g_a_gdn2"),
            "Conv_2": convert_conv(state, f"{prefix}.g_a_conv3"),
            "GDN_2": convert_gdn(state, f"{prefix}.g_a_gdn3"),
            "Conv_3": convert_conv(state, f"{prefix}.g_a_conv4"),
        }

    def dec(prefix):
        return {
            "Deconv_0": convert_deconv(state, f"{prefix}.g_s_conv1"),
            "GDN_0": convert_gdn(state, f"{prefix}.g_s_gdn1"),
            "Deconv_1": convert_deconv(state, f"{prefix}.g_s_conv2"),
            "GDN_1": convert_gdn(state, f"{prefix}.g_s_gdn2"),
            "Deconv_2": convert_deconv(state, f"{prefix}.g_s_conv3"),
            "GDN_2": convert_gdn(state, f"{prefix}.g_s_gdn3"),
            "Deconv_3": convert_deconv(state, f"{prefix}.g_s_conv4"),
        }

    params = {
        "encoder1": enc("encoder1"),
        "decoder1": dec("decoder1"),
        "encoder2": {
            "Conv_0": convert_conv(state, "encoder2.pre_conv"),
            "GDN_0": convert_gdn(state, "encoder2.pre_gdn"),
            "Conv_1": convert_conv(state, "encoder2.g_a_conv1"),
            "GDN_1": convert_gdn(state, "encoder2.g_a_gdn1"),
            "Conv_2": convert_conv(state, "encoder2.g_a_conv2"),
            "GDN_2": convert_gdn(state, "encoder2.g_a_gdn2"),
            "Conv_3": convert_conv(state, "encoder2.g_a_conv3"),
            "GDN_3": convert_gdn(state, "encoder2.g_a_gdn3"),
            "Conv_4": convert_conv(state, "encoder2.g_a_conv4"),
        },
        "decoder2": dec("decoder2"),
        "entropy_bottleneck1": convert_entropy_bottleneck(
            state, "entropy_bottleneck1"),
        "entropy_bottleneck2": convert_entropy_bottleneck(
            state, "entropy_bottleneck2"),
    }
    params["decoder2"]["GDN_3"] = convert_gdn(state, "decoder2.after_gdn")
    params["decoder2"]["Deconv_4"] = convert_deconv(state,
                                                    "decoder2.after_conv")
    # hyper encoders: Sequential inside a wrapper (encode_hyper)
    for tname, fname in (("_h_a1", "h_a1"), ("_h_a2", "h_a2")):
        params[fname] = {
            "Conv_0": convert_conv(state, f"{tname}.encode_hyper.0"),
            "Conv_1": convert_conv(state, f"{tname}.encode_hyper.2"),
            "Conv_2": convert_conv(state, f"{tname}.encode_hyper.4"),
        }
    # GMM hyper heads
    params["h_s1"] = {
        "Deconv_0": convert_deconv(state, "_h_s1.gmm_sigma.0"),
        "Deconv_1": convert_deconv(state, "_h_s1.gmm_sigma.2"),
        "Conv_0": convert_conv(state, "_h_s1.gmm_sigma.4"),
        "Deconv_2": convert_deconv(state, "_h_s1.gmm_means.0"),
        "Deconv_3": convert_deconv(state, "_h_s1.gmm_means.2"),
        "Conv_1": convert_conv(state, "_h_s1.gmm_means.4"),
        "Deconv_4": convert_deconv(state, "_h_s1.gmm_weights.0"),
        "Deconv_5": convert_deconv(state, "_h_s1.gmm_weights.2"),
        "Conv_2": convert_conv(state, "_h_s1.gmm_weights.5"),
    }
    params["h_s2"] = {
        "Conv_0": convert_conv(state, "_h_s2.gmm_sigma.0"),
        "Conv_1": convert_conv(state, "_h_s2.gmm_sigma.2"),
        "Conv_2": convert_conv(state, "_h_s2.gmm_sigma.4"),
        "Conv_3": convert_conv(state, "_h_s2.gmm_means.0"),
        "Conv_4": convert_conv(state, "_h_s2.gmm_means.2"),
        "Conv_5": convert_conv(state, "_h_s2.gmm_means.4"),
        "Conv_6": convert_conv(state, "_h_s2.gmm_weights.0"),
        "Conv_7": convert_conv(state, "_h_s2.gmm_weights.2"),
        "Conv_8": convert_conv(state, "_h_s2.gmm_weights.5"),
    }
    return params


ARCH_CONVERTERS = {
    "bmshj2018-factorized": convert_factorized,
    "bmshj2018-hyperprior": convert_hyperprior,
    "mbt2018-mean": convert_hyperprior,
    "mbt2018": convert_mbt2018,
    "hesic": convert_hesic,
}


def convert_state_dict(state_dict: Dict, arch: str) -> dict:
    """Convert a torch state_dict (possibly a checkpoint with 'state_dict')
    into an hesic_tpu param tree for `arch`."""
    if "state_dict" in state_dict and not any(
            "." in k for k in state_dict if k != "state_dict"):
        state_dict = state_dict["state_dict"]
    if arch not in ARCH_CONVERTERS:
        raise ValueError(f"no converter for '{arch}' "
                         f"(available: {sorted(ARCH_CONVERTERS)})")
    return ARCH_CONVERTERS[arch](state_dict)
