from eetq_tpu.surgery.fusion import (
    fuse_columns,
    split_quant_columns,
    fuse_qkv,
    fuse_gateup,
)
from eetq_tpu.surgery.quantize import eet_quantize, eet_accelerator

__all__ = [
    "fuse_columns",
    "split_quant_columns",
    "fuse_qkv",
    "fuse_gateup",
    "eet_quantize",
    "eet_accelerator",
]
