from eetq_tpu.modules.linear import (
    QuantLinear,
    DenseLinear,
    LoraAdapter,
    quantize_linear,
    linear_apply,
)
from eetq_tpu.modules.attention import KVCache, attention

__all__ = [
    "QuantLinear",
    "DenseLinear",
    "LoraAdapter",
    "quantize_linear",
    "linear_apply",
    "KVCache",
    "attention",
]
