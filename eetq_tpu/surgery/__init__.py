from eetq_tpu.surgery.fusion import (
    fuse_columns,
    split_quant_columns,
    fuse_qkv,
    fuse_gateup,
)
from eetq_tpu.surgery.lora import attach_lora, init_lora, merge_lora, stack_adapters
from eetq_tpu.surgery.quantize import eet_quantize, eet_accelerator
from eetq_tpu.surgery.tp_reshard import (
    quantize_params_tp,
    shard_quantized,
    split_quant_rows,
)

__all__ = [
    "fuse_columns",
    "split_quant_columns",
    "fuse_qkv",
    "fuse_gateup",
    "attach_lora",
    "init_lora",
    "merge_lora",
    "stack_adapters",
    "eet_quantize",
    "eet_accelerator",
    "quantize_params_tp",
    "shard_quantized",
    "split_quant_rows",
]
