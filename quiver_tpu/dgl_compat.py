"""DGL integration surface (reference examples/dgl/ogbn_products_sage_quiver.py).

The reference drives DGL by converting its sampler output into DGL
*blocks* (message-flow graphs): per layer, a bipartite graph whose dst
nodes are the layer's output frontier and whose edges carry the sampled
(neighbor -> target) pairs. DGL itself is not available on this TPU
image, so this module emits the exact data ``dgl.to_block`` /
``dgl.create_block`` consume — a user with DGL installed builds blocks
in two lines:

    import dgl
    for bd in quiver_tpu.dgl_compat.to_block_data(batch):
        block = dgl.create_block((bd["edge_src"], bd["edge_dst"]),
                                 num_src_nodes=bd["num_src"],
                                 num_dst_nodes=bd["num_dst"])
        block.srcdata[dgl.NID] = torch.as_tensor(bd["src_ids"])
        block.dstdata[dgl.NID] = torch.as_tensor(bd["dst_ids"])
        block.edata[dgl.EID] = torch.as_tensor(bd["eid"])

Both sampler pipelines are supported: the strict per-hop-dedup ``Adj``
blocks map 1:1 (local ids are unique-table positions), and the dense
positional ``DenseBlock``s materialize their implied COO (duplicate
global ids occupy distinct local rows — DGL semantics are unaffected;
aggregation sums the same messages).

``eid`` semantics follow the sampler's layout: with
``sampling='exact'`` (and weighted mode) e_id is the original CSR edge
slot; window/packed modes index their shuffled layout — translate via
``sampler.shuffle_eid`` if original edge ids are needed (same
convention as the typed-edge example, examples/hetero/train_rgcn.py).
"""
from __future__ import annotations

import numpy as np

__all__ = ["to_block_data"]


def to_block_data(batch):
    """Convert a ``SampledBatch`` into per-layer DGL block construction
    data, ordered outermost-first like ``batch.adjs`` (DGL consumes
    blocks in this order: blocks[0] is the widest layer).

    Returns a list of dicts with keys:
      ``edge_src`` / ``edge_dst``: [E_l] int64 LOCAL endpoint ids
        (masked/padded lanes removed), messages flowing src -> dst;
      ``eid``: [E_l] int64 CSR edge slot of each edge;
      ``num_src`` / ``num_dst``: local id-space sizes;
      ``src_ids`` / ``dst_ids``: global node id per local id (rows past
        the valid count hold the padding value 0 — mirror of the padded
        static shapes; DGL ignores them because no edge touches them).
    """
    n_id = np.asarray(batch.n_id)
    out = []
    for adj in batch.adjs:
        mask = np.asarray(adj.mask)
        e_id = np.asarray(adj.e_id)
        if mask.ndim == 2:                      # DenseBlock [F, k]
            F, k = mask.shape
            i, j = np.nonzero(mask)
            src = (F + j * F + i).astype(np.int64)   # lane-major layout
            dst = i.astype(np.int64)
            eid = e_id[i, j].astype(np.int64)
            num_src, num_dst = adj.size
        else:                                   # Adj [E] edge list
            ei = np.asarray(adj.edge_index)
            keep = mask
            src = ei[0][keep].astype(np.int64)
            dst = ei[1][keep].astype(np.int64)
            eid = e_id[keep].astype(np.int64)
            num_src, num_dst = adj.size
        out.append({
            "edge_src": src, "edge_dst": dst, "eid": eid,
            "num_src": int(num_src), "num_dst": int(num_dst),
            "src_ids": n_id[:num_src].astype(np.int64),
            "dst_ids": n_id[:num_dst].astype(np.int64),
        })
    return out
