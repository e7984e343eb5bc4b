from .classic import (
    KarateClub,
    Planetoid,
    SuiteSparseMatrixCollection,
    TUDataset,
)
from .classorder import Classorder, ClassorderTest
from .reorder import Reorder
from .synth_structure import synthesize_triplets, synthesize_features

__all__ = [
    "KarateClub", "Planetoid", "SuiteSparseMatrixCollection", "TUDataset",
    "Classorder", "ClassorderTest", "Reorder",
    "synthesize_triplets", "synthesize_features",
]
