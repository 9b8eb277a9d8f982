from .codec import sharded_codec_roundtrip
from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh,
                   make_parallel_apply, make_parallel_train_step,
                   param_sharding, replicated, shard_batch, shard_params)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "make_parallel_apply",
    "make_parallel_train_step",
    "param_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
    "sharded_codec_roundtrip",
]
