"""Model stacks over layered sampled batches + full-graph inference.

Mirrors the SAGE/GAT models the reference trains via PyG
(examples/pyg/reddit_quiver.py:84-113 SAGE class;
benchmarks/ogbn-mag240m/train_quiver_multi_node.py:188-246 GNN class),
re-designed for static-shape blocks. ``__call__`` consumes the
outermost-first ``adjs`` tuple from ``NeighborSampler.sample``.

Full-graph (eval) inference needs no separate code path: build one
whole-graph block with ``full_graph_adj`` and pass ``[adj] * num_layers``
— the analogue of the reference's layer-wise subgraph-loader eval loop.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import SAGEConv, GATConv, RGCNConv
from ..sampling.sampler import Adj


def full_graph_adj(indptr, indices) -> Adj:
    """The whole CSR graph as a single bipartite block (dst space == src
    space == all nodes). Edge direction: CSR row -> its neighbors are the
    *sources* aggregated into the row (message flow col -> row)."""
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    V = indptr.shape[0] - 1
    E = indices.shape[0]
    dst = np.repeat(np.arange(V, dtype=np.int32), np.diff(indptr))
    return Adj(edge_index=jnp.stack([jnp.asarray(indices, jnp.int32),
                                     jnp.asarray(dst)]),
               e_id=jnp.arange(E, dtype=jnp.int32),
               mask=jnp.ones((E,), bool),
               size=(V, V),
               counts=jnp.array([V, V], jnp.int32))


class GraphSAGE(nn.Module):
    hidden_features: int
    out_features: int
    num_layers: int
    dropout: float = 0.5
    aggr: str = "mean"
    dtype: object = None          # compute dtype (e.g. jnp.bfloat16)

    @nn.compact
    def __call__(self, x, adjs, *, train: bool = False):
        dims = ([self.hidden_features] * (self.num_layers - 1)
                + [self.out_features])
        for i, (d, adj) in enumerate(zip(dims, adjs)):
            x = SAGEConv(d, aggr=self.aggr, dtype=self.dtype,
                         name=f"conv{i}")(x, adj)
            if i < self.num_layers - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class GAT(nn.Module):
    hidden_features: int
    out_features: int
    num_layers: int
    heads: int = 4
    dropout: float = 0.5
    dtype: object = None          # compute dtype (e.g. jnp.bfloat16)

    @nn.compact
    def __call__(self, x, adjs, *, train: bool = False):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            conv = GATConv(self.out_features if last else self.hidden_features,
                           heads=1 if last else self.heads,
                           concat=not last, dtype=self.dtype,
                           name=f"conv{i}")
            x = conv(x, adjs[i])
            if not last:
                x = nn.elu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class RGCN(nn.Module):
    hidden_features: int
    out_features: int
    num_layers: int
    num_relations: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, adjs, edge_types, *, train: bool = False):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            conv = RGCNConv(self.out_features if last else self.hidden_features,
                            num_relations=self.num_relations, name=f"conv{i}")
            x = conv(x, adjs[i], edge_types[i])
            if not last:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
