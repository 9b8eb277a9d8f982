"""Single-image encode/decode CLI with a self-describing file header.

Mirror of the reference examples/codec.py: struct-packed header carrying
model id, metric/quality nibbles and the original image size (:95-119),
followed by the latent/hyper-latent strings.

Usage:
  python -m hesic_tpu.utils.codec_cli encode in.png -o out.bin \
      --arch bmshj2018-factorized --checkpoint model.pkl
  python -m hesic_tpu.utils.codec_cli decode out.bin -o rec.png
"""

from __future__ import annotations

import argparse
import struct

import jax.numpy as jnp
import numpy as np

from ..zoo import create_model, model_architectures
from .eval_model import pad_to_multiple, unpad

_MAGIC = b"HTPU"
_ARCH_IDS = {name: i for i, name in
             enumerate(sorted(model_architectures))}
_ID_ARCHS = {i: name for name, i in _ARCH_IDS.items()}
_METRIC_IDS = {"mse": 0, "ms-ssim": 1}


def _write_header(f, arch: str, metric: str, quality: int, shape):
    f.write(_MAGIC)
    code = (_METRIC_IDS[metric] << 4) | (quality & 0x0F)
    f.write(struct.pack("<BB", _ARCH_IDS[arch], code))
    f.write(struct.pack("<HH", shape[0], shape[1]))


def _read_header(f):
    magic = f.read(4)
    if magic != _MAGIC:
        raise ValueError("invalid bitstream (bad magic)")
    arch_id, code = struct.unpack("<BB", f.read(2))
    h, w = struct.unpack("<HH", f.read(4))
    metric = {v: k for k, v in _METRIC_IDS.items()}[code >> 4]
    return _ID_ARCHS[arch_id], metric, code & 0x0F, (h, w)


def encode(args):
    from PIL import Image
    img = np.asarray(Image.open(args.input).convert("RGB"),
                     np.float32) / 255.0
    codec = create_model(args.arch, quality=args.quality,
                         checkpoint=args.checkpoint)
    codec.update()
    x, meta = pad_to_multiple(img[None])
    out = codec.compress(jnp.asarray(x))
    with open(args.output, "wb") as f:
        _write_header(f, args.arch, args.metric, args.quality,
                      img.shape[:2])
        shape = out["shape"]
        f.write(struct.pack("<HH", shape[0], shape[1]))
        f.write(struct.pack("<B", len(out["strings"])))
        for group in out["strings"]:
            s = group[0]
            f.write(struct.pack("<I", len(s)) + s)
    bpp = sum(len(g[0]) for g in out["strings"]) * 8 / (
        img.shape[0] * img.shape[1])
    print(f"encoded {args.input} -> {args.output} ({bpp:.4f} bpp)")


def decode(args):
    from PIL import Image
    with open(args.input, "rb") as f:
        arch, metric, quality, (h, w) = _read_header(f)
        sh, sw = struct.unpack("<HH", f.read(4))
        (n_groups,) = struct.unpack("<B", f.read(1))
        strings = []
        for _ in range(n_groups):
            (length,) = struct.unpack("<I", f.read(4))
            strings.append([f.read(length)])
    codec = create_model(arch, quality=quality,
                         checkpoint=args.checkpoint)
    codec.update()
    rec = codec.decompress(strings, (sh, sw))
    x = np.asarray(rec["x_hat"])
    ph = (64 - h % 64) % 64
    pw = (64 - w % 64) % 64
    pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
            (0, 0))
    x = unpad(x, (h, w, pads))[0]
    Image.fromarray(
        np.clip(x * 255 + 0.5, 0, 255).astype(np.uint8)).save(args.output)
    print(f"decoded {args.input} -> {args.output} ({arch}, q{quality})")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)
    enc = sub.add_parser("encode")
    enc.add_argument("input")
    enc.add_argument("-o", "--output", required=True)
    enc.add_argument("--arch", default="bmshj2018-factorized")
    enc.add_argument("--checkpoint", default=None)
    enc.add_argument("--metric", default="mse", choices=sorted(_METRIC_IDS))
    enc.add_argument("--quality", type=int, default=1)
    dec = sub.add_parser("decode")
    dec.add_argument("input")
    dec.add_argument("-o", "--output", required=True)
    dec.add_argument("--checkpoint", default=None)
    args = parser.parse_args(argv)
    if args.command == "encode":
        encode(args)
    else:
        decode(args)


if __name__ == "__main__":
    main()
