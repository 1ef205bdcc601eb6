from eetq_tpu.dist import multihost
from eetq_tpu.dist.long_context import generate_long, long_prefill
from eetq_tpu.dist.pipeline import (
    make_pp_mesh,
    PipelinedModel,
    init_pp_caches,
    pp_decode_loop,
    pp_generate,
    pp_prefill,
    shard_model_pp,
)
from eetq_tpu.dist.ring_attention import ring_attention, ring_attention_sharded
from eetq_tpu.dist.sharding import (
    make_mesh,
    ShardedModel,
    shard_model,
    split_qkv_columns,
    split_gateup_columns,
    split_rows,
)

__all__ = [
    "multihost",
    "generate_long",
    "long_prefill",
    "make_pp_mesh",
    "PipelinedModel",
    "init_pp_caches",
    "pp_decode_loop",
    "pp_generate",
    "pp_prefill",
    "shard_model_pp",
    "ring_attention",
    "ring_attention_sharded",
    "make_mesh",
    "ShardedModel",
    "shard_model",
    "split_qkv_columns",
    "split_gateup_columns",
    "split_rows",
]
