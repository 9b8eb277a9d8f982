"""Evaluate trained models on image folders with the real coder.

Mirror of ``python -m compressai.utils.eval_model``
(reference utils/eval_model/__main__.py): pads inputs to x64, times real
compress/decompress, reports PSNR / MS-SSIM / bpp, JSON output, with an
``--entropy-estimation`` mode that integrates likelihoods instead of
running the coder.  Adds the stereo protocol of test3real.py (both eyes,
bpp over 2*H*W).

Usage: python -m hesic_tpu.utils.eval_model --arch hesic \
           --checkpoint model.pkl --dataset /path [--entropy-estimation]
"""

from __future__ import annotations

import argparse
import json
import time

import jax.numpy as jnp
import numpy as np

from ..datasets.stereo import ImageFolder, StereoImageFolder
from ..training.losses import bits
from ..zoo import create_model, is_stereo, uses_homography
from .metrics import ms_ssim, np_psnr


def pad_to_multiple(x: np.ndarray, m: int = 64):
    """Symmetric replicate-pad H, W to multiples of m
    (reference eval_model/__main__.py:58-68 pads to x64)."""
    _, h, w, _ = x.shape
    ph = (m - h % m) % m
    pw = (m - w % m) % m
    pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
            (0, 0))
    return np.pad(x, pads, mode="edge"), (h, w, pads)


def unpad(x, meta):
    h, w, pads = meta
    return x[:, pads[1][0]: pads[1][0] + h, pads[2][0]: pads[2][0] + w, :]


def eval_single(codec, x: np.ndarray, entropy_estimation: bool) -> dict:
    xp, meta = pad_to_multiple(x)
    num_pixels = x.shape[1] * x.shape[2]
    if entropy_estimation:
        out = codec.forward(jnp.asarray(xp), training=False)
        bpp = float(sum(bits(lik) for lik in
                        out["likelihoods"].values())) / num_pixels
        x_hat = np.asarray(jnp.clip(out["x_hat"], 0, 1))
        enc_t = dec_t = 0.0
    else:
        t0 = time.time()
        comp = codec.compress(jnp.asarray(xp))
        enc_t = time.time() - t0
        t0 = time.time()
        rec = codec.decompress(comp["strings"], comp["shape"])
        dec_t = time.time() - t0
        total_bytes = sum(
            len(group) if isinstance(group, (bytes, bytearray))
            else sum(len(s) for s in group)
            for group in comp["strings"])
        bpp = total_bytes * 8 / num_pixels
        x_hat = np.asarray(rec["x_hat"])
    x_hat = unpad(x_hat, meta)
    return {
        "psnr": np_psnr(x, x_hat),
        "ms-ssim": float(ms_ssim(jnp.asarray(x), jnp.asarray(x_hat))),
        "bpp": bpp,
        "encoding_time": enc_t,
        "decoding_time": dec_t,
    }


def eval_stereo(codec, x1, x2, h_matrix, entropy_estimation: bool,
                with_h: bool, workdir: str, name: str,
                device_blob: bool = False) -> dict:
    """One pair through the test3real protocol (reference test3real.py):
    per-eye PSNR / MS-SSIM plus averages, bpp over 2*H*W, and — in
    estimation mode — the reference's bpp1/bpp2 per-eye breakdown
    (normalized by 1*H*W like test3real's RateDistortionLoss kind=1).

    ``device_blob``: the codec is a wavefront device codec (in-memory
    single-blob container, ``compress(x1, x2, h)`` /
    ``decompress(strings)``) rather than the reference-layout file
    container."""
    num_pixels = 2 * x1.shape[1] * x1.shape[2]
    eye_pixels = x1.shape[1] * x1.shape[2]
    args = (jnp.asarray(x1), jnp.asarray(x2)) + (
        (jnp.asarray(h_matrix),) if with_h else ())
    extra = {}
    if entropy_estimation:
        out = codec.forward(*args, training=False)
        lik = out["likelihoods"]
        bpp = float(sum(bits(v) for v in lik.values())) / num_pixels
        if "y1" in lik:
            extra["bpp1"] = float(bits(lik["y1"])
                                  + bits(lik["z1"])) / eye_pixels
            extra["bpp2"] = float(bits(lik["y2"])
                                  + bits(lik["z2"])) / eye_pixels
        x1_hat = np.asarray(jnp.clip(out["x1_hat"], 0, 1))
        x2_hat = np.asarray(jnp.clip(out["x2_hat"], 0, 1))
        enc_t = dec_t = 0.0
    elif device_blob:
        comp = codec.compress(*args)
        rec = codec.decompress(comp["strings"])
        bpp = comp["bpp_real"]
        enc_t = comp.get("enctime", 0.0)
        dec_t = rec.get("dectime", 0.0)
        x1_hat = np.asarray(jnp.clip(rec["x1_hat"], 0, 1))
        x2_hat = np.asarray(jnp.clip(rec["x2_hat"], 0, 1))
    else:
        comp = codec.compress(*args, output_name=name,
                              output_path=workdir)
        rec = codec.decompress(name, workdir)
        bpp = comp["bpp_real"]
        enc_t = comp.get("enctime", 0.0)
        dec_t = rec.get("dectime", 0.0)
        x1_hat = np.asarray(jnp.clip(rec["x1_hat"], 0, 1))
        x2_hat = np.asarray(jnp.clip(rec["x2_hat"], 0, 1))
    # per-eye PSNR averaged (reference test3real.py:110-111,216)
    psnr1 = np_psnr(x1, x1_hat)
    psnr2 = np_psnr(x2, x2_hat)
    ms1 = float(ms_ssim(jnp.asarray(x1), jnp.asarray(x1_hat)))
    ms2 = float(ms_ssim(jnp.asarray(x2), jnp.asarray(x2_hat)))
    return {"psnr": (psnr1 + psnr2) / 2, "psnr1": psnr1, "psnr2": psnr2,
            "ms-ssim": (ms1 + ms2) / 2, "ms-ssim1": ms1, "ms-ssim2": ms2,
            "bpp": bpp, **extra,
            "encoding_time": enc_t, "decoding_time": dec_t}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--arch", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--split", default="test")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--quality", type=int, default=1)
    parser.add_argument("--entropy-estimation", action="store_true")
    parser.add_argument("--homography-net", default=None,
                        help="homography-net checkpoint: predict H per "
                        "pair instead of identity (test3real protocol)")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--workdir", default="/tmp")
    parser.add_argument("--output", default=None)
    parser.add_argument("--device-codec", action="store_true",
                        help="route AR y-latents through the wavefront "
                        "device codec (mbt2018 / cheng2020-* / "
                        "hesic-plus; the TPU production path — own "
                        "stream format, one blob per batch)")
    args = parser.parse_args(argv)

    codec = create_model(args.arch, quality=args.quality,
                         checkpoint=args.checkpoint)
    if not args.entropy_estimation:
        codec.update()
    device_blob = False
    if args.device_codec:
        if args.entropy_estimation:
            parser.error("--device-codec runs the real coder; drop "
                         "--entropy-estimation")
        from ..models import (HESICPlusDeviceCodec,
                              JointAutoregressiveDeviceCodec)
        if args.arch == "hesic-plus":
            codec = HESICPlusDeviceCodec(codec)
            device_blob = True
        elif args.arch in ("mbt2018", "cheng2020-anchor",
                           "cheng2020-attn"):
            codec = JointAutoregressiveDeviceCodec(codec)
        else:
            parser.error("--device-codec supports mbt2018, cheng2020-*, "
                         "and hesic-plus (hesic/dsic already default to "
                         "their fast device codecs)")

    stereo = is_stereo(args.arch)
    with_h = uses_homography(args.arch)
    results = []
    if stereo:
        ds = StereoImageFolder(args.dataset, split=args.split,
                               patch_size=(512, 512), need_file_name=True)
        identity = np.eye(3, dtype=np.float32)[None]
        homography_fn = None
        if args.homography_net is not None:
            from ..training.train import make_homography_fn
            item0 = ds[0]
            homography_fn = make_homography_fn(
                args.homography_net,
                (item0["x1"].shape[0], item0["x1"].shape[1]))
        for i in range(len(ds)):
            if args.max_images and i >= args.max_images:
                break
            item = ds[i]
            if homography_fn is not None:
                h = np.asarray(homography_fn(
                    {k: v[None] for k, v in item.items()
                     if not isinstance(v, str)}))
            else:
                h = identity
            res = eval_stereo(codec, item["x1"][None], item["x2"][None],
                              h, args.entropy_estimation, with_h,
                              args.workdir, f"eval_{i}",
                              device_blob=device_blob)
            results.append(res)
            print(f"[{i}] {item.get('name', i)}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in res.items()))
    else:
        ds = ImageFolder(args.dataset, split=args.split)
        for i in range(len(ds)):
            if args.max_images and i >= args.max_images:
                break
            item = ds[i]
            res = eval_single(codec, item["x"][None],
                              args.entropy_estimation)
            results.append(res)
            print(f"[{i}]: "
                  + " ".join(f"{k}={v:.4f}" for k, v in res.items()))

    summary = {
        "name": args.arch,
        "description": ("entropy estimation" if args.entropy_estimation
                        else "real coder"),
        "results": {
            k: float(np.mean([r[k] for r in results]))
            for k in results[0]
        } if results else {},
    }
    print(json.dumps(summary, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
