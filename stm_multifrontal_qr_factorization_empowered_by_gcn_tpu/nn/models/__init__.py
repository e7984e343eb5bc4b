from .autoencoder import GAE, VGAE, inner_product_decode, kl_loss, recon_loss
from .misc_models import (
    CorrectAndSmooth,
    DeepGraphInfomax,
    GraphUNet,
    JumpingKnowledge,
    LabelPropagation,
    dgi_loss,
)
from .node2vec import NeighborTable, Node2Vec, build_neighbor_table, random_walks

__all__ = [
    "GAE",
    "VGAE",
    "inner_product_decode",
    "kl_loss",
    "recon_loss",
    "CorrectAndSmooth",
    "DeepGraphInfomax",
    "GraphUNet",
    "JumpingKnowledge",
    "LabelPropagation",
    "dgi_loss",
    "NeighborTable",
    "Node2Vec",
    "build_neighbor_table",
    "random_walks",
]
