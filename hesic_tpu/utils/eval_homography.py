"""Homography-net evaluation CLI — corner error, timing, FLOPs, warp gifs.

TPU-native replacement for the reference udh eval tooling
(udh/udh/test3_f1.py — FLOPs/params via thop + gif visualizations;
udh/udh/test3_time.py — single-forward wall time).  Improvements over the
reference scripts (which hard-crash on purpose after printing one number):
one CLI reports MACE (mean average corner error vs the synthetic ground
truth), photometric loss, compiled-forward latency, parameter count and
XLA-reported FLOPs, and optionally writes (input, warped) gif pairs.

Usage:
    python -m hesic_tpu.utils.eval_homography DATASET \
        [--checkpoint homo_best.pkl] [--n 5] [--rho 20] [--figures DIR]
"""

from __future__ import annotations

import argparse
import pickle
import sys
import time

import numpy as np


def _to_uint8(img):
    """Un-normalize a (H, W, 1) grayscale tensor for visualization."""
    from ..datasets.synthetic import MEAN, STD
    g = np.asarray(img)[..., 0] * STD + MEAN
    return np.clip(g * 255.0, 0, 255).astype(np.uint8)


def save_gif(a, b, path: str):
    """Two-frame flip gif (reference tensors_to_gif, test3_f1.py:33-36)."""
    from PIL import Image
    fa = Image.fromarray(_to_uint8(a))
    fb = Image.fromarray(_to_uint8(b))
    fa.save(path, save_all=True, append_images=[fb], duration=1000, loop=0)


def count_params(params) -> int:
    import jax
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from ..datasets.synthetic import SyntheticHomographyDataset
    from ..geometry import (HomographyNet, get_perspective_transform,
                            photometric_loss, warp_perspective)

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", help="stereo dataset root (left/right dirs)")
    p.add_argument("--checkpoint", default="",
                   help="homo_best.pkl from train_homography (else fresh init)")
    p.add_argument("--n", type=int, default=5, help="samples to evaluate")
    p.add_argument("--rho", type=int, default=20)
    p.add_argument("--patch-size", type=int, default=128)
    p.add_argument("--figures", default="", help="write warp gifs here")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--timing-reps", type=int, default=20)
    args = p.parse_args(argv)

    net = HomographyNet(patch_size=args.patch_size)
    ds = SyntheticHomographyDataset(
        args.dataset, "test", rho=args.rho,
        rng=np.random.RandomState(args.seed))

    sample = ds[0]
    pa = jnp.asarray(sample["patch_a"][None])
    pb = jnp.asarray(sample["patch_b"][None])
    if args.checkpoint:
        with open(args.checkpoint, "rb") as f:
            params = pickle.load(f)["params"]
    else:
        print("no checkpoint given: evaluating a fresh init", file=sys.stderr)
        params = net.init(
            {"params": jax.random.PRNGKey(args.seed)}, pa, pb)["params"]

    fwd = jax.jit(lambda prm, a, b: net.apply({"params": prm}, a, b))

    # FLOPs straight from XLA (replaces the reference's thop profile)
    compiled = fwd.lower(params, pa, pb).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float((cost or {}).get("flops", float("nan")))
    print(f"params: {count_params(params):,}   "
          f"flops/forward (XLA): {flops:,.0f}")

    # compiled-forward latency (reference test3_time.py:100-107)
    jax.block_until_ready(fwd(params, pa, pb))
    t0 = time.time()
    for _ in range(args.timing_reps):
        jax.block_until_ready(fwd(params, pa, pb))
    print(f"forward latency: {(time.time() - t0) / args.timing_reps * 1e3:.3f} ms")

    maces, photo = [], []
    n = min(args.n, len(ds))
    for i in range(n):
        s = ds[i]
        a = jnp.asarray(s["patch_a"][None])
        b = jnp.asarray(s["patch_b"][None])
        corners = jnp.asarray(s["corners"][None])
        delta_hat = fwd(params, a, b)
        mace = float(jnp.mean(jnp.abs(delta_hat - s["delta_gt"][None])))
        maces.append(mace)
        photo.append(float(photometric_loss(
            delta_hat, jnp.asarray(s["img_a"][None]), b, corners)))

        if args.figures:
            import os
            os.makedirs(args.figures, exist_ok=True)
            # reference writes warp(img_a, h^-1) next to img_b/patch_b
            # (test3_f1.py:100-111)
            c0 = corners - corners[:, 0:1, :]
            h = get_perspective_transform(c0, c0 + delta_hat)
            h_inv = jnp.linalg.inv(h)
            img_a = jnp.asarray(s["img_a"][None])
            patch_b_hat = warp_perspective(
                img_a, h_inv, (args.patch_size, args.patch_size))
            img_b_hat = warp_perspective(
                img_a, h_inv, img_a.shape[1:3])
            save_gif(s["img_a"], s["img_b"], f"{args.figures}/input_{i}.gif")
            save_gif(patch_b_hat[0], b[0],
                     f"{args.figures}/output_patch{i}.gif")
            save_gif(img_b_hat[0], s["img_b"],
                     f"{args.figures}/output_{i}.gif")

        print(f"[{i}] MACE {mace:.3f} px   photometric {photo[-1]:.4f}")

    print(f"mean MACE over {n}: {np.mean(maces):.3f} px   "
          f"mean photometric: {np.mean(photo):.4f}")


if __name__ == "__main__":
    main()
