from eetq_tpu.quant.quantizer import (
    symmetric_quantize,
    dequantize,
    quantize_and_pack,
    int4_pack,
    int4_unpack,
)

__all__ = [
    "symmetric_quantize",
    "dequantize",
    "quantize_and_pack",
    "int4_pack",
    "int4_unpack",
]
