"""Device-mesh parallelism: data-parallel + tensor-parallel shardings.

The reference is strictly single-process / single-GPU (SURVEY.md §2.4 —
no torch.distributed anywhere; newtrain1.py:1 "单gpu版").  The TPU-native
scaling story is therefore built here from scratch:

  * DP  — batches shard over the 'data' mesh axis; XLA SPMD inserts the
    gradient all-reduce over ICI.
  * TP  — large conv kernels / GDN channel-mixing matrices shard their
    output-channel axis over the 'model' mesh axis; activations stay
    unsharded on channels and XLA inserts the reduce-scatter/all-gather
    pattern it derives from the matmul contractions.

Everything goes through ``jax.jit`` with NamedSharding in/out specs — no
pmap, no manual collectives — so a single program scales from 1 chip to a
full pod slice by changing the mesh shape.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Create a (data, model) mesh.  shape=None -> all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    dp, tp = shape
    if dp * tp > len(devices):
        raise ValueError(f"mesh {shape} needs {dp * tp} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def param_sharding(mesh: Mesh, params) -> Any:
    """Tensor-parallel parameter shardings.

    Shards the trailing (output-channel) axis of weight tensors whose last
    dim divides the model-axis size; everything else is replicated.  With
    a model axis of 1 this degrades to full replication (pure DP).
    """
    tp = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        if tp > 1 and leaf.ndim >= 2 and leaf.shape[-1] % tp == 0:
            name = str(getattr(path[-1], "key", path[-1]))
            if name in ("kernel", "gamma"):
                return NamedSharding(
                    mesh, P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sh), batch)


def shard_params(mesh: Mesh, params):
    """Place params according to the tensor-parallel sharding rules."""
    shardings = param_sharding(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def make_parallel_train_step(module, tx, loss_fn, mesh: Mesh):
    """Build a jitted SPMD train step over the mesh.

    loss_fn(module, params, batch, rng) -> (scalar, metrics).  The batch
    pytree shards on the data axis; params/optimizer state follow the
    tensor-parallel rules; the returned state keeps those shardings.
    """
    from ..training.train_state import TrainState

    def _step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(module, p, batch, rng),
            has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(
        _step,
        in_shardings=(None, batch_sharding(mesh), replicated(mesh)),
        donate_argnums=(0,),
    )


def make_parallel_apply(module, mesh: Mesh, method=None):
    """Jitted batched inference sharded over the data axis."""

    def _apply(params, *args):
        return module.apply({"params": params}, *args, method=method)

    return jax.jit(_apply, in_shardings=(None, batch_sharding(mesh)))
