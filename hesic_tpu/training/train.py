"""Unified training CLI for every model family.

Replaces the reference's per-script argparse copies (newtrain1.py,
newtrain1_real.py, newtrain1_joint[_real].py, newtrain6*.py, mytrain2.py,
examples/train.py — ~2.5 kLoC of duplicated loops) with one config-driven
trainer:

  python -m hesic_tpu.training.train --model hesic --dataset /data \
      --epochs 100 --lmbda 1e-2 [--homography-net homo.pkl] [--stage2]

Key flows kept from the reference:
  * dual optimizer semantics (main + aux; train_state.py)
  * homography from the frozen homography net, gradient-stopped and
    rescaled from 256-space to full resolution (newtrain1_real.py:47-131)
  * stage-2 training freezes the codec and trains only the enhancement
    net (newtrain6_real.py:441)
  * best-loss checkpointing with auto-resume (newtrain1.py:284-318)
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets import StereoImageFolder, ImageFolder, batch_iterator
from ..geometry import HomographyNet, upscale_homography
from ..zoo import create_model, is_stereo, model_architectures, \
    uses_homography
from .losses import (mse2psnr, rate_distortion_loss,
                     stereo_rate_distortion_loss)
from .train_state import (TrainState, load_checkpoint, make_optimizer,
                          make_train_step, save_checkpoint)


def _identity_h(batch_size: int):
    return np.tile(np.eye(3, dtype=np.float32)[None], (batch_size, 1, 1))


def make_homography_fn(homo_checkpoint, patch_size):
    """H from the frozen homography net, rescaled to patch resolution
    (reference newtrain1_real.py:47-131)."""
    if homo_checkpoint is None:
        return lambda batch: _identity_h(batch["x1"].shape[0])
    import pickle
    with open(homo_checkpoint, "rb") as f:
        payload = pickle.load(f)
    net = HomographyNet()
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])

    @jax.jit
    def get_h(homo1, homo2, corners):
        # corners are re-anchored at their own top-left first — the
        # convention the net is trained with (photometric_loss,
        # model.py:24) and that the reference eval uses
        # (newtrain1_real.py:120 / test3real.py:175)
        corners = corners - corners[:, 0:1, :]
        h = net.apply({"params": params}, homo1, homo2, corners,
                      method="get_h")
        # rescale from 256-space to the working resolution (h_adjust,
        # newtrain1_real.py:47-57; the reference swaps the two axis
        # ratios for non-square inputs — a quirk invisible on its square
        # crops — we apply the geometrically correct per-axis scales)
        sh = patch_size[0] / 256.0
        sw = patch_size[1] / 256.0
        return jax.vmap(
            lambda m: upscale_homography(m, sh, sw))(h)

    def fn(batch):
        h = get_h(jnp.asarray(batch["homo_img1"]),
                  jnp.asarray(batch["homo_img2"]),
                  jnp.asarray(batch["corners"]))
        return jax.lax.stop_gradient(h)

    return fn


def make_loss_fn(model_name: str, lmbda: float, stage2: bool = False):
    stereo = is_stereo(model_name)
    with_h = uses_homography(model_name)

    def loss_fn(module, params, batch, rng):
        rngs = {"noise": rng}
        if stage2:
            params = _freeze_codec(params)
        if stereo and with_h:
            out = module.apply({"params": params}, batch["x1"], batch["x2"],
                               batch["h"], training=True, rngs=rngs)
            rd = stereo_rate_distortion_loss(out, batch["x1"], batch["x2"],
                                             lmbda)
        elif stereo:
            out = module.apply({"params": params}, batch["x1"], batch["x2"],
                               training=True, rngs=rngs)
            rd = stereo_rate_distortion_loss(out, batch["x1"], batch["x2"],
                                             lmbda)
        else:
            out = module.apply({"params": params}, batch["x"],
                               training=True, rngs=rngs)
            rd = rate_distortion_loss(out, batch["x"], lmbda)
        aux = module.apply({"params": params}, method="aux_loss")
        return rd["loss"] + aux, {"bpp": rd["bpp_loss"],
                                  "mse": rd["mse_loss"], "aux": aux}

    return loss_fn


def _freeze_codec(params):
    """Stop gradients into everything but the enhancement net (m2).

    Reference stage 2: optimizer over net2.parameters() only
    (newtrain6_real.py:441).
    """
    return {
        k: (v if k == "m2" else jax.lax.stop_gradient(v))
        for k, v in params.items()
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True,
                        choices=sorted(model_architectures))
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--patch-size", type=int, default=256)
    parser.add_argument("--quality", type=int, default=1)
    parser.add_argument("--lmbda", type=float, default=1e-2)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--aux-learning-rate", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--homography-net", default=None,
                        help="frozen homography net checkpoint")
    parser.add_argument("--stage2", action="store_true",
                        help="freeze codec, train enhancement only")
    parser.add_argument("--checkpoint-dir", default="checkpoints")
    parser.add_argument("--log-file", default="train_log.txt")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--overrides", default=None,
                        help="architecture overrides, e.g. N=64,M=96")
    parser.add_argument("--bf16", action="store_true",
                        help="run the transform convs in bfloat16 (the "
                             "TPU fast path; likelihood/entropy math is "
                             "pinned to f32 and parameters stay f32). "
                             "Supported by modules with a dtype field "
                             "(the stereo families).")
    args = parser.parse_args(argv)

    overrides = {}
    if args.overrides:
        for kv in args.overrides.split(","):
            k, v = kv.split("=")
            overrides[k.strip()] = int(v)
    if args.bf16:
        import dataclasses
        module_cls, _ = model_architectures[args.model]
        if "dtype" not in {f.name for f in dataclasses.fields(module_cls)}:
            parser.error(f"--bf16 is not supported by {args.model} "
                         f"(module has no dtype field)")
        overrides["dtype"] = jnp.bfloat16

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    patch = (args.patch_size, args.patch_size)

    codec = create_model(args.model, quality=args.quality, seed=args.seed,
                         image_size=patch, **overrides)
    module = codec.module
    tx = make_optimizer(args.learning_rate, args.aux_learning_rate)
    state = TrainState.create(codec.params, tx)
    best_loss = float("inf")
    start_epoch = 0

    resume = os.path.join(args.checkpoint_dir, "checkpoint_best_loss.pkl")
    if os.path.exists(resume):
        state, payload = load_checkpoint(resume, tx)
        best_loss = payload.get("loss", best_loss)
        start_epoch = payload.get("epoch", 0)
        print(f"resumed from {resume} (epoch {start_epoch})")

    stereo = is_stereo(args.model)
    with_h = uses_homography(args.model)
    homography_fn = make_homography_fn(args.homography_net, patch) \
        if with_h else None

    if stereo:
        train_ds = StereoImageFolder(args.dataset, "train", patch)
        test_ds = StereoImageFolder(args.dataset, "test", patch)
    else:
        train_ds = ImageFolder(args.dataset, "train", patch)
        test_ds = ImageFolder(args.dataset, "test", patch)

    loss_fn = make_loss_fn(args.model, args.lmbda, args.stage2)
    step = make_train_step(module, tx, loss_fn)
    eval_loss_fn = make_loss_fn(args.model, args.lmbda, stage2=False)

    def prep(batch):
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        if with_h:
            batch["h"] = homography_fn(batch)
        return batch

    def log(msg):
        print(msg)
        with open(args.log_file, "a") as f:
            f.write(msg + "\n")

    rng = jax.random.PRNGKey(args.seed)
    for epoch in range(start_epoch, args.epochs):
        for i, batch in enumerate(batch_iterator(
                train_ds, args.batch_size, shuffle=True,
                seed=args.seed + epoch)):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, prep(batch), sub)
            if i % args.log_every == 0:
                log(f"Train epoch {epoch}: [{i * args.batch_size}/"
                    f"{len(train_ds)}] Loss: {metrics['loss']:.3f} | "
                    f"MSE: {metrics['mse']:.5f} | "
                    f"Bpp: {metrics['bpp']:.2f} | "
                    f"Aux: {metrics['aux']:.2f}")

        # validation
        totals, count = None, 0
        for batch in batch_iterator(test_ds, 1, shuffle=False,
                                    drop_last=False):
            rng, sub = jax.random.split(rng)
            _, m = eval_loss_fn(module, state.params, prep(batch), sub)
            m = {k: float(v) for k, v in m.items()}
            totals = m if totals is None else {
                k: totals[k] + m[k] for k in m}
            count += 1
        avg = {k: v / max(count, 1) for k, v in (totals or {}).items()}
        val_loss = (args.lmbda * 255 ** 2 * avg.get("mse", 0)
                    + avg.get("bpp", 0)) if avg else float("inf")
        psnr_db = float(mse2psnr(jnp.asarray(max(
            avg.get("mse", 1.0), 1e-12)) / 2)) if stereo else \
            float(mse2psnr(jnp.asarray(max(avg.get("mse", 1.0), 1e-12))))
        log(f"Test epoch {epoch}: loss {val_loss:.4f} | "
            f"PSNR {psnr_db:.3f} dB | bpp "
            f"{avg.get('bpp', 0) / (2 if stereo else 1):.4f}")

        save_checkpoint(state,
                        os.path.join(args.checkpoint_dir, "checkpoint.pkl"),
                        epoch=epoch + 1, loss=val_loss)
        if val_loss < best_loss:
            best_loss = val_loss
            save_checkpoint(state, resume, epoch=epoch + 1, loss=val_loss)

        # also export in codec format for eval tooling
        codec.params = state.params
        codec.save(os.path.join(args.checkpoint_dir, "model_latest.pkl"))

    return state


if __name__ == "__main__":
    main()
