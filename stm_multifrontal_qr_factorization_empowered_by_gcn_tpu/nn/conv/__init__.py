from .gcn_conv import GCNConv
from .graph_conv import GraphConv
from .sage_conv import SAGEConv

__all__ = ["GCNConv", "GraphConv", "SAGEConv"]
