"""Device mesh and sharding (DP/TP/SP over ICI; multislice DP over DCN)."""

from physicsinformeddiffusionmodels_tpu.parallel.seq_attention import (
    sequence_sharded_linear_attention,
)
from physicsinformeddiffusionmodels_tpu.parallel.mesh import (
    batch_sharding,
    data_axes,
    make_mesh,
    param_partition_spec,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "data_axes",
    "make_mesh",
    "param_partition_spec",
    "replicated",
    "shard_batch",
    "shard_params",
    "sequence_sharded_linear_attention",
]
