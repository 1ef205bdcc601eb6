from eetq_tpu.layout.tiling import (
    TileLayout,
    PackedWeight,
    DEFAULT_LAYOUT,
    pack_weights,
    unpack_weights,
    pad_axis_to,
)

__all__ = [
    "TileLayout",
    "PackedWeight",
    "DEFAULT_LAYOUT",
    "pack_weights",
    "unpack_weights",
    "pad_axis_to",
]
