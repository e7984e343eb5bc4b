"""All 37 reference convolution layers (``torch_geometric/nn/conv/``),
each a flax module over the functional propagate core.
"""
from .agnn_pna import AGNNConv, PNAConv
from .cheb_conv import ChebConv
from .edge_conv import (
    DynamicEdgeConv,
    EdgeConv,
    GatedGraphConv,
    NNConv,
    ResGatedGraphConv,
)
from .extra_convs import (
    CGConv,
    FastRGCNConv,
    GENConv,
    MFConv,
    PPFConv,
    RGCNConv,
    WLConv,
    point_pair_features,
)
from .gat_conv import GATConv, GATv2Conv
from .gcn2_arma_transformer import ARMAConv, GCN2Conv, TransformerConv
from .gcn_conv import GCNConv
from .geometric import (
    FeaStConv,
    GMMConv,
    GravNetConv,
    PointConv,
    PointNetConv,
    SplineConv,
    XConv,
)
from .gin_conv import GINConv, GINEConv
from .graph_conv import GraphConv
from .relational import DNAConv, FiLMConv, HypergraphConv, SignedConv
from .sage_conv import SAGEConv
from .sg_appnp_tag import APPNP, ClusterGCNConv, LEConv, SGConv, TAGConv

__all__ = [
    "CGConv",
    "GENConv",
    "MFConv",
    "PPFConv",
    "FastRGCNConv",
    "RGCNConv",
    "WLConv",
    "point_pair_features",
    "XConv",
    "SplineConv",
    "SignedConv",
    "PointNetConv",
    "PointConv",
    "HypergraphConv",
    "GravNetConv",
    "GMMConv",
    "FiLMConv",
    "FeaStConv",
    "DNAConv",
    "AGNNConv",
    "APPNP",
    "ARMAConv",
    "ChebConv",
    "ClusterGCNConv",
    "DynamicEdgeConv",
    "EdgeConv",
    "GATConv",
    "GATv2Conv",
    "GCN2Conv",
    "GCNConv",
    "GINConv",
    "GINEConv",
    "GatedGraphConv",
    "GraphConv",
    "LEConv",
    "NNConv",
    "PNAConv",
    "ResGatedGraphConv",
    "SAGEConv",
    "SGConv",
    "TAGConv",
    "TransformerConv",
]
