from flute_tpu.parallel.tp import (
    COL_PARALLEL,
    ROW_PARALLEL,
    cache_partition_spec,
    llama_partition_specs,
    make_hybrid_mesh,
    make_mesh,
    shard_params,
    tp_forward_fn,
    validate_tp,
)
from flute_tpu.parallel.reshard import merge_shards, repack, shard_linear

__all__ = [
    "COL_PARALLEL",
    "ROW_PARALLEL",
    "cache_partition_spec",
    "llama_partition_specs",
    "make_hybrid_mesh",
    "make_mesh",
    "shard_params",
    "tp_forward_fn",
    "validate_tp",
    "merge_shards",
    "repack",
    "shard_linear",
]
