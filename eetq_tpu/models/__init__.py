from eetq_tpu.models.config import ModelConfig, PRESETS
from eetq_tpu.models.transformer import (
    LayerParams,
    ModelParams,
    forward,
    init_caches,
)
from eetq_tpu.models.init import random_dense_params, quantize_params

__all__ = [
    "ModelConfig",
    "PRESETS",
    "LayerParams",
    "ModelParams",
    "forward",
    "init_caches",
    "random_dense_params",
    "quantize_params",
]
