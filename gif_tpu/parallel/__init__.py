"""Device-mesh utilities for data-parallel (and future multi-axis) training."""

from gif_tpu.parallel.mesh import (
    create_mesh,
    host_local_tree,
    initialize_distributed,
    is_main_process,
    local_data_parallel_mesh,
    process_count,
    replicate,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "host_local_tree",
    "initialize_distributed",
    "is_main_process",
    "local_data_parallel_mesh",
    "process_count",
    "replicate",
    "shard_batch",
]
