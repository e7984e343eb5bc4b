from .layers import (
    BatchNorm,
    GraphSizeNorm,
    InstanceNorm,
    LayerNorm,
    MessageNorm,
    PairNorm,
)

__all__ = [
    "BatchNorm",
    "GraphSizeNorm",
    "InstanceNorm",
    "LayerNorm",
    "MessageNorm",
    "PairNorm",
]
