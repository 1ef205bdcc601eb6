from eetq_tpu.modules.linear import (
    QuantLinear,
    DenseLinear,
    LoraAdapter,
    quantize_linear,
    linear_apply,
)
from eetq_tpu.modules.attention import KVCache, attention
from eetq_tpu.modules.moe import MoEMLP, moe_apply, quantize_moe

__all__ = [
    "QuantLinear",
    "DenseLinear",
    "LoraAdapter",
    "quantize_linear",
    "linear_apply",
    "KVCache",
    "attention",
    "MoEMLP",
    "moe_apply",
    "quantize_moe",
]
