"""SPMD parallelism over a TPU mesh."""

from lintransunet_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_jit,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "data_parallel_jit",
]
