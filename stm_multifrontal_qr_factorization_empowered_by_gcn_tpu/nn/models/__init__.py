"""Model zoo: autoencoders, DGI, JK, Node2Vec/MetaPath2Vec, GraphUNet,
SchNet, DimeNet, TGN, SignedGCN, explainers, label prop
(``torch_geometric/nn/models/``).
"""
from .autoencoder import (
    GAE,
    VGAE,
    ARGVADiscriminator,
    argva_discriminator_loss,
    argva_reg_loss,
    inner_product_decode,
    kl_loss,
    recon_loss,
)
from .misc_models import (
    CorrectAndSmooth,
    DeepGCNLayer,
    DeepGraphInfomax,
    GraphUNet,
    JumpingKnowledge,
    LabelPropagation,
    dgi_loss,
)
from .gnn_explainer import ExplainerResult, explain as gnn_explain
from .schnet import SchNet, radius_graph_padded
from .node2vec import NeighborTable, Node2Vec, build_neighbor_table, random_walks
from .dimenet import DimeNet, DimeNetGraph, dimenet_graph
from .metapath2vec import MetaPath2Vec, build_metapath_tables
from .signed_gcn import (
    SignedGCN,
    create_spectral_features,
    signed_gcn_test,
    split_edges,
)
from .tgn import LastNeighborLoader, TGNMemory, TGNState
from .re_net import EventBatch, RENet, collate_events

__all__ = [
    "DeepGCNLayer",
    "EventBatch",
    "RENet",
    "collate_events",
    "DimeNet",
    "DimeNetGraph",
    "dimenet_graph",
    "MetaPath2Vec",
    "build_metapath_tables",
    "SignedGCN",
    "create_spectral_features",
    "signed_gcn_test",
    "split_edges",
    "LastNeighborLoader",
    "TGNMemory",
    "TGNState",
    "GAE",
    "ARGVADiscriminator",
    "argva_discriminator_loss",
    "argva_reg_loss",
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
    "ExplainerResult",
    "gnn_explain",
    "SchNet",
    "radius_graph_padded",
    "NeighborTable",
    "Node2Vec",
    "build_neighbor_table",
    "random_walks",
]
