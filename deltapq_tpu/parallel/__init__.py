from .mesh import make_mesh, shard_rows, replicated, pad_to_shards
from .sharded import (make_sharded_query_fn, sharded_query_plain,
                      make_dp_lloyd_step, make_sharded_decoded_query_fn,
                      sharded_query_decoded)
from .pipeline import make_pipelined_query_fn, pipelined_query
from .fused_sharded import ShardedCompressedEngine

__all__ = [
    "make_mesh", "shard_rows", "replicated", "pad_to_shards",
    "make_sharded_query_fn", "sharded_query_plain", "make_dp_lloyd_step",
    "make_sharded_decoded_query_fn", "sharded_query_decoded",
    "make_pipelined_query_fn", "pipelined_query",
    "ShardedCompressedEngine",
]
