"""Per-seed sampled-subgraph-size table (the serving workload metric).

Rebuild of the reference's ``generate_neighbour_num``
(srcs/python/quiver/generate_neighbour_num.py:10-95), which runs a full
k-hop sample per node and records ``n_id.shape[0]``. The TPU version
exploits the dense positional layout: within one batched sample, every
lane's seed ancestry is a pure reshape, so per-seed subtree sizes for a
whole batch come from masked reductions — thousands of nodes per device
dispatch instead of one.
"""
from __future__ import annotations

import numpy as np


def generate_neighbour_num(sampler, nodes=None, batch_size: int = 1024,
                           num_trials: int = 1, save_path=None):
    """Estimate the sampled-subgraph size of each node.

    Args:
      sampler: a ``NeighborSampler`` with ``dedup='none'`` (positional).
      nodes: node ids to profile (default: all).
      batch_size: seeds per device dispatch.
      num_trials: average over this many independent samples.
      save_path: optional ``.npy`` output (reference saves .npy too).

    Returns [len(nodes)] float32 of expected subgraph sizes (counting the
    seed itself plus every sampled lane, duplicates included — the cost
    model for routing, reference serving.py:90).
    """
    if sampler.dedup != "none":
        raise ValueError("generate_neighbour_num needs a dedup='none' sampler")
    topo = sampler.csr_topo
    if nodes is None:
        nodes = np.arange(topo.node_count)
    nodes = np.asarray(nodes)
    sizes = np.zeros(nodes.shape[0], np.float64)
    ks = sampler.sizes

    for trial in range(num_trials):
        for s in range(0, len(nodes), batch_size):
            seeds = nodes[s: s + batch_size]
            b = sampler.sample(seeds)
            bs = b.batch_size
            # per-seed valid-lane counts, layer by layer (positional)
            per_seed = np.ones(bs, np.float64)  # the seed row itself
            lanes_per_seed = 1                  # rows per seed at this hop
            blocks = list(reversed(b.adjs))     # inner -> outer
            for li, blk in enumerate(blocks):
                k = ks[li]
                mask = np.asarray(blk.mask)     # [F_l, k]
                F = mask.shape[0]
                # rows of this hop belonging to seed i: the frontier is
                # [prev frontier | prev lanes]; recurse positionally.
                # Frontier layout repeats [bs groups] at every scale:
                # rows r of frontier l map to seed r % ... — instead use
                # the simple invariant: frontier_l = concat of previous
                # frontier (same seed map) and previous lanes (seed map
                # repeated k_{l-1} times).
                seed_of_row = _seed_map(bs, ks[:li])
                counts = mask.sum(1)
                np.add.at(per_seed, seed_of_row, counts)
            sizes[s: s + len(seeds)] += per_seed[: len(seeds)]
    sizes /= num_trials
    out = sizes.astype(np.float32)
    if save_path:
        np.save(save_path, out)
    return out


def _seed_map(bs: int, prior_ks) -> np.ndarray:
    """Seed index of every frontier row after hops ``prior_ks``:
    frontier_0 = seeds; frontier_{l+1} = [frontier_l | lanes], where lane
    (i, j) inherits row i's seed. Lanes are appended LANE-MAJOR (lane
    slot j of all rows contiguous, sampler.py DenseBlock), so the lane
    portion tiles the row map k times."""
    m = np.arange(bs)
    for k in prior_ks:
        m = np.concatenate([m, np.tile(m, k)])
    return m
