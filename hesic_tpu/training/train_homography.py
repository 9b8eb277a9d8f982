"""Train the unsupervised deep-homography network on stereo pairs.

Reference: udh/udh/train.py (Lightning) and QHtrain.py (plain loop) —
photometric L1 loss through a differentiable warp on grayscale patch
pairs; the dataset supplies 128x128 patches + corner tensors from
256-resized stereo images (udh/udh/dataset.py:20-97, reproduced by
StereoImageFolder's homo_img outputs).

Usage: python -m hesic_tpu.training.train_homography --dataset /data
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..datasets import StereoImageFolder, batch_iterator
from ..geometry import HomographyNet, photometric_loss


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint-dir", default="checkpoints")
    args = parser.parse_args(argv)

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    net = HomographyNet(patch_size=128)
    ds = StereoImageFolder(args.dataset, "train", patch_size=(256, 256))

    sample = ds[0]
    params = net.init(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(args.seed + 1)},
        jnp.asarray(sample["homo_img1"][None]),
        jnp.asarray(sample["homo_img2"][None]), training=True)["params"]
    tx = optax.adam(args.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            delta = net.apply({"params": p}, batch["homo_img1"],
                              batch["homo_img2"], training=True,
                              rngs={"dropout": rng})
            # warp the FULL left image (not the patch): warped content may
            # enter the patch from outside it (udh/udh/model.py:18-45)
            return photometric_loss(delta, batch["homo_full1"],
                                    batch["homo_img2"], batch["corners"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = jax.random.PRNGKey(args.seed)
    best = float("inf")
    for epoch in range(args.epochs):
        losses = []
        for batch in batch_iterator(ds, args.batch_size, shuffle=True,
                                    seed=args.seed + epoch):
            rng, sub = jax.random.split(rng)
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if not isinstance(v, list)}
            params, opt_state, loss = step(params, opt_state, jb, sub)
            losses.append(float(loss))
        mean_loss = float(np.mean(losses))
        print(f"epoch {epoch}: photometric loss {mean_loss:.5f}")
        payload = {"params": jax.tree_util.tree_map(np.asarray, params),
                   "epoch": epoch, "loss": mean_loss}
        with open(os.path.join(args.checkpoint_dir, "homo_latest.pkl"),
                  "wb") as f:
            pickle.dump(payload, f)
        if mean_loss < best:
            best = mean_loss
            with open(os.path.join(args.checkpoint_dir, "homo_best.pkl"),
                      "wb") as f:
                pickle.dump(payload, f)
    return params


if __name__ == "__main__":
    main()
