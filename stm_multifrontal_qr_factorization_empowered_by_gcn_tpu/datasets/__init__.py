"""Dataset classes — the reference surface (49 names, ``torch_geometric/datasets/``)
plus the custom Classorder/ClassorderTest/Reorder corpora and their
synthetic-structure generator.
"""
from .benchsets import GNNBenchmarkDataset, MNISTSuperpixels
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
    QM9,
    Amazon,
    CitationFull,
    Coauthor,
    CoraFull,
    ModelNet,
    Reddit,
)
from .events import GDELT, ICEWS18, BitcoinOTC, JODIEDataset
from .geometry3d import (
    CoMA,
    DynamicFAUST,
    GeometricShapes,
    PCPNetDataset,
    S3DIS,
    ShapeNet,
    SHREC2016,
    TOSCA,
    TrackMLParticleTrackingDataset,
)
from .geomgcn import Actor, WebKB, WikiCS, WikipediaNetwork
from .kg import AMiner, DBP15K, Entities, SNAPDataset, WordNet18
from .matching import (
    GEDDataset,
    PascalPF,
    PascalVOCKeypoints,
    WILLOWObjectClass,
)
from .molecules import ZINC, MoleculeNet, QM7b
from .reorder import Reorder
from .saint import Flickr, Yelp
from .synth_structure import synthesize_triplets, synthesize_features

__all__ = [
    "KarateClub", "TUDataset", "GNNBenchmarkDataset", "Planetoid",
    "CitationFull", "CoraFull", "Coauthor", "Amazon", "PPI", "Reddit",
    "Flickr", "Yelp", "QM7b", "QM9", "ZINC", "MoleculeNet", "Entities",
    "GEDDataset", "MNISTSuperpixels", "FAUST", "DynamicFAUST", "ShapeNet",
    "ModelNet", "CoMA", "SHREC2016", "TOSCA", "PCPNetDataset", "S3DIS",
    "GeometricShapes", "BitcoinOTC", "ICEWS18", "GDELT", "DBP15K",
    "WILLOWObjectClass", "PascalVOCKeypoints", "PascalPF", "SNAPDataset",
    "SuiteSparseMatrixCollection", "TrackMLParticleTrackingDataset",
    "AMiner", "WordNet18", "WikiCS", "WebKB", "WikipediaNetwork", "Actor",
    "JODIEDataset",
    "Classorder", "ClassorderTest", "Reorder",
    "synthesize_triplets", "synthesize_features",
]
