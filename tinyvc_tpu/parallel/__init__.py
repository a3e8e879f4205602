"""Parallelism: device mesh, sharded kNN retrieval, distributed init."""

from .mesh import (
    batch_sharding,
    dict_sharding,
    init_distributed,
    local_batch_size,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .sharded_knn import pad_dictionary, sharded_match_features

__all__ = [
    "batch_sharding",
    "dict_sharding",
    "init_distributed",
    "local_batch_size",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "pad_dictionary",
    "sharded_match_features",
]
