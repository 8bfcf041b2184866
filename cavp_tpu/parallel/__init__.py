from cavp_tpu.parallel.dist import (
    allsum_across_processes,
    barrier,
    initialize_distributed,
    is_primary,
    process_index,
)
from cavp_tpu.parallel.mesh import (
    DATA_AXIS,
    DCN_AXIS,
    ICI_AXIS,
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    local_mesh,
    localize_replicated,
    replicate,
    replicated,
    shard_batch,
)
from cavp_tpu.parallel.spatial import (
    make_spatial_eval_step,
    make_spatial_infer,
    spatial_sharding,
)

__all__ = [
    "DATA_AXIS",
    "DCN_AXIS",
    "ICI_AXIS",
    "allsum_across_processes",
    "create_mesh",
    "create_hybrid_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "initialize_distributed",
    "is_primary",
    "local_mesh",
    "localize_replicated",
    "process_index",
    "barrier",
    "make_spatial_eval_step",
    "make_spatial_infer",
    "spatial_sharding",
]
