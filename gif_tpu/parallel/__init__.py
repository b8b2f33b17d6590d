"""Device-mesh utilities for data-parallel (and future multi-axis) training."""

from gif_tpu.parallel.mesh import (
    create_mesh,
    replicate,
    shard_batch,
    local_data_parallel_mesh,
)

__all__ = ["create_mesh", "replicate", "shard_batch", "local_data_parallel_mesh"]
