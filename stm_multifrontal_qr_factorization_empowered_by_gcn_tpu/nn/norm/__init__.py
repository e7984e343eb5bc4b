"""Graph-aware normalization layers (Batch/Layer/Instance/GraphSize/Pair/Msg)
(``torch_geometric/nn/norm/``), all mask-aware for padded batches.
"""
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
