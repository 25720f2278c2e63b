from .layers import SAGEConv, GATConv, GCNConv, RGCNConv
from .nets import GraphSAGE, GAT, RGCN

__all__ = ["SAGEConv", "GATConv", "GCNConv", "RGCNConv",
           "GraphSAGE", "GAT", "RGCN"]
