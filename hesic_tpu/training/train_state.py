"""Training state: dual-optimizer (main + auxiliary) via optax.

The reference splits parameters between two torch.optim.Adam instances —
the main optimizer excludes every EntropyBottleneck parameter, the aux
optimizer owns exactly those (models/priors.py:70-87, examples/train.py
:105-133; both losses backward before both steps, so gradients from the
total loss = rd_loss + aux_loss reach each group).  In optax this is a
single ``multi_transform`` over the combined loss: identical update
semantics because the rd loss is independent of the quantiles in training
mode and the aux loss stops gradients into the density matrices.
"""

from __future__ import annotations

import pickle
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def is_aux_path(path) -> bool:
    """True for parameters owned by the auxiliary optimizer."""
    return any(str(getattr(k, "key", k)).startswith("entropy_bottleneck")
               for k in path)


def param_labels(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "aux" if is_aux_path(path) else "main", params)


def make_optimizer(learning_rate: float = 1e-4,
                   aux_learning_rate: float = 1e-3):
    """Main Adam over transform params + aux Adam over EB params."""
    return optax.multi_transform(
        {"main": optax.adam(learning_rate), "aux": optax.adam(aux_learning_rate)},
        param_labels)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def make_train_step(module, tx, loss_fn):
    """Build a jitted train step.

    loss_fn(module, params, batch, rng) -> (scalar_loss, metrics_dict);
    it must already include the auxiliary loss in the scalar.
    """

    def _loss(params, batch, rng):
        return loss_fn(module, params, batch, rng)

    @jax.jit
    def step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            _loss, has_aux=True)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def save_checkpoint(state: TrainState, path: str, **extra):
    payload = {
        "params": jax.tree_util.tree_map(np.asarray, state.params),
        "opt_state": jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x,
            state.opt_state),
        "step": int(state.step),
        **extra,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, tx=None):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    opt_state = payload.get("opt_state")
    if opt_state is None and tx is not None:
        opt_state = tx.init(params)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.asarray(payload.get("step", 0), jnp.int32))
    return state, payload
