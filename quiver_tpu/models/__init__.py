from .layers import SAGEConv, GATConv, RGCNConv
from .nets import GraphSAGE, GAT, RGCN

__all__ = ["SAGEConv", "GATConv", "RGCNConv", "GraphSAGE", "GAT", "RGCN"]
