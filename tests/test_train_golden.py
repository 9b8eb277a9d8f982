"""Golden-trajectory determinism test.

Mirror of reference tests/test_train.py:22-54, which string-compares the
full training log of a toy run against a stored golden file.  Here we pin
the loss trajectory of a tiny FactorizedPrior trained for a few steps on a
deterministic fake dataset; any change to initialization, noise streams,
loss math, or optimizer semantics shifts these numbers.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hesic_tpu.models import FactorizedPrior
from hesic_tpu.training import (TrainState, make_optimizer, make_train_step,
                                rate_distortion_loss)


def _fake_batch():
    rng = np.random.RandomState(314)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    return {"x": jnp.asarray(x)}


def _loss(module, params, batch, rng):
    out = module.apply({"params": params}, batch["x"], training=True,
                       rngs={"noise": rng})
    rd = rate_distortion_loss(out, batch["x"], lmbda=1e-2)
    aux = module.apply({"params": params}, method="aux_loss")
    return rd["loss"] + aux, {"bpp": rd["bpp_loss"], "mse": rd["mse_loss"]}


def _run(n_steps=4):
    module = FactorizedPrior(N=8, M=12)
    batch = _fake_batch()
    params = module.init(
        {"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(14)},
        batch["x"], training=True)["params"]
    tx = make_optimizer(1e-4, 1e-3)
    state = TrainState.create(params, tx)
    step = make_train_step(module, tx, _loss)
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    return losses


def test_deterministic_repeat():
    """Two identical runs produce bit-identical trajectories."""
    a = _run()
    b = _run()
    np.testing.assert_array_equal(a, b)


def test_loss_decreases():
    losses = _run(6)
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


# ---------------------------------------------------------------------------
# Golden-log regression test (reference tests/test_train.py:22-54: the full
# stdout of a seeded toy training run is string-compared against a committed
# file, so loss-math / noise-stream / optimizer regressions fail across
# commits — not just within one process).
# ---------------------------------------------------------------------------

GOLDEN = os.path.join(os.path.dirname(__file__), "expected",
                      "train_log_seed0.txt")


def _golden_dataset(root):
    """Deterministic 2-train/1-test single-image tree; images are exactly
    patch-sized (64x64) so the loader's random crop is disabled (the
    reference's own determinism trick, datasets/utils.py:140-146)."""
    from PIL import Image
    rng = np.random.RandomState(314)
    for split, n in (("train", 2), ("test", 1)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:02d}.png"))
    return root


def _golden_run(tmp):
    from hesic_tpu.training import train as train_cli
    data = _golden_dataset(os.path.join(tmp, "data"))
    train_cli.main([
        "--model", "bmshj2018-factorized", "--dataset", data,
        "--epochs", "3", "--batch-size", "2", "--patch-size", "64",
        "--overrides", "N=8,M=12", "--seed", "0", "--log-every", "1",
        "--checkpoint-dir", os.path.join(tmp, "ckpt"),
        "--log-file", os.path.join(tmp, "log.txt"),
    ])
    with open(os.path.join(tmp, "log.txt")) as f:
        return f.read()


def test_train_cli_golden_log(tmp_path):
    pytest.importorskip("PIL")
    log = _golden_run(str(tmp_path))
    with open(GOLDEN) as f:
        expected = f.read()
    assert log == expected, (
        "training log deviates from the committed golden "
        f"({GOLDEN}); if the change is intentional, regenerate with "
        "`python tests/test_train_golden.py --regen`")


if __name__ == "__main__":
    import sys
    import tempfile
    if "--regen" in sys.argv:
        with tempfile.TemporaryDirectory() as tmp:
            log = _golden_run(tmp)
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(log)
        print(f"wrote {GOLDEN} ({len(log.splitlines())} lines)")
