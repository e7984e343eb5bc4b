from .classic import (
    KarateClub,
    Planetoid,
    SuiteSparseMatrixCollection,
    TUDataset,
)
from .classorder import Classorder, ClassorderTest
from .collections import (
    FAUST,
    PPI,
    Amazon,
    CitationFull,
    Coauthor,
    ModelNet,
    QM9,
    Reddit,
)
from .reorder import Reorder
from .synth_structure import synthesize_triplets, synthesize_features

__all__ = [
    "KarateClub", "Planetoid", "SuiteSparseMatrixCollection", "TUDataset",
    "Amazon", "CitationFull", "Coauthor", "FAUST", "ModelNet", "PPI", "QM9",
    "Reddit",
    "Classorder", "ClassorderTest", "Reorder",
    "synthesize_triplets", "synthesize_features",
]
