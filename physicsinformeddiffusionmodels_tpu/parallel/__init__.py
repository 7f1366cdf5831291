"""Device mesh and sharding (DP/TP over ICI)."""

from physicsinformeddiffusionmodels_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_partition_spec",
    "replicated",
    "shard_batch",
    "shard_params",
]
