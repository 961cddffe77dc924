"""Device mesh, sharding, and multi-host scaling utilities."""

from nerf_fewshot_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_train_step,
    initialize_multihost,
    make_global_batch,
    process_local_slice,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_train_step",
    "initialize_multihost",
    "make_global_batch",
    "process_local_slice",
]
