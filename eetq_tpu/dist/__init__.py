from eetq_tpu.dist.sharding import (
    make_mesh,
    ShardedModel,
    shard_model,
    split_qkv_columns,
    split_gateup_columns,
    split_rows,
)

__all__ = [
    "make_mesh",
    "ShardedModel",
    "shard_model",
    "split_qkv_columns",
    "split_gateup_columns",
    "split_rows",
]
