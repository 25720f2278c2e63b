"""Access-probability-driven node/feature partitioning across hosts.

Rebuild of the reference's ``srcs/python/quiver/partition.py``:
``partition_without_replication`` (partition.py:16-80) greedily assigns
chunks of nodes to the host whose sampling probability gain is largest
(own probability minus everyone else's), balancing shard sizes;
``quiver_partition_feature`` (partition.py:163-249) materializes on-disk
partition artifacts; ``load_quiver_feature_partition``
(partition.py:252-283) restores them. Probabilities come from
``NeighborSampler.sample_prob`` (the ``cal_next`` chain).

Pure numpy — this is offline preprocessing, not a hot path.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

CHUNK_SIZE = 256  # reference QUIVER_MAGIC_NUMBER (partition.py:12)
CHUNK_NUM = 32    # reference CHUNK_NUM (partition.py:13)

__all__ = [
    "partition_without_replication",
    "select_nodes",
    "partition_feature_without_replication",
    "quiver_partition_feature",
    "load_quiver_feature_partition",
]


def _strip_device_arg(first, *rest):
    """The reference's signatures carry a leading ``device`` rank
    (partition.py:16,83); accept and ignore it so migrated call sites
    like ``partition_without_replication(device, probs, ids)`` work."""
    if first is None or isinstance(first, (int, np.integer, str)):
        return rest
    return (first,) + rest


def select_nodes(probs, ids_or_none=None):
    """Union of nodes any host accesses with nonzero probability
    (reference select_nodes partition.py:83-92). A leading device
    argument (reference signature) is accepted and ignored."""
    args = _strip_device_arg(probs, ids_or_none)
    probs = args[0]
    total = np.zeros_like(np.asarray(probs[0]))
    for p in probs:
        total = total + np.asarray(p)
    return np.nonzero(total > 0)[0]


def partition_without_replication(probs, ids: Optional[np.ndarray] = None,
                                  _maybe_ids=None) -> List[np.ndarray]:
    """Per-NODE greedy partition of ``ids`` over ``len(probs)`` hosts
    (same algorithm as the reference, partition.py:16-80): the id list
    is cut into ``CHUNK_NUM`` chunks; within each chunk every node gets
    a per-host score ``(H+1)*own_prob - total_prob``, hosts pick their
    top ``ceil(chunk/H)`` not-yet-picked nodes in rotating priority
    order (the start host advances every chunk), giving exact balance
    with per-host preference. Returns per-host id arrays.
    A leading device argument (reference signature partition.py:16) is
    accepted and ignored.
    """
    probs, ids = (_strip_device_arg(probs, ids, _maybe_ids) + (None,))[:2]
    probs = [np.asarray(p, np.float64) for p in probs]
    H = len(probs)
    if ids is None:
        ids = select_nodes(probs)
    ids = np.asarray(ids)
    n = ids.shape[0]
    if n == 0:
        return [np.empty(0, np.int64) for _ in range(H)]

    per_host = np.stack([p[ids] for p in probs])      # [H, n]
    res: List[list] = [[] for _ in range(H)]
    chunk_size = -(-n // CHUNK_NUM)
    beg_rank = 0
    for beg in range(0, n, chunk_size):
        end = min(n, beg + chunk_size)
        cn = end - beg
        tot = per_host[:, beg:end].sum(0)
        score = (H + 1) * per_host[:, beg:end] - tot[None, :] + 1e-6
        picked = np.zeros(cn, bool)
        rank_size = -(-cn // H)
        acc = 0
        for j in range(H):
            r = (beg_rank + j) % H
            take = min(rank_size, cn - acc)
            if take <= 0:
                continue
            sc = np.where(picked, -1e6, score[r])
            pick = np.argsort(-sc, kind="stable")[:take]
            picked[pick] = True
            res[r].append(ids[beg + pick])
            acc += take
        beg_rank += 1
    return [np.concatenate(r) if r else np.empty(0, np.int64)
            for r in res]


def partition_feature_without_replication(probs, ids=None):
    """Reference partition_feature_without_replication partition.py:95-160
    — same algorithm, returns (per-host ids, per-host probs)."""
    parts = partition_without_replication(probs, ids)
    res_probs = [np.asarray(probs[h])[parts[h]] for h in range(len(probs))]
    return parts, res_probs


def quiver_partition_feature(probs, result_path: str,
                             cache_memory_budget=0,
                             per_feature_size=0,
                             chunk_size: int = CHUNK_SIZE):
    """Partition + write on-disk artifacts (reference partition.py:163-249):

      result_path/
        partition_book.npy       global id -> host
        feature_partition_{h}.npy   per-host id list
        cache_order_{h}.npy      per-host ids sorted hot-first
    """
    from .utils import parse_size

    os.makedirs(result_path, exist_ok=True)
    H = len(probs)
    parts = partition_without_replication(probs)
    V = np.asarray(probs[0]).shape[0]
    book = np.full(V, -1, np.int64)
    for h, ids in enumerate(parts):
        book[ids] = h
    np.save(os.path.join(result_path, "partition_book.npy"), book)

    cache_rows = 0
    if cache_memory_budget and per_feature_size:
        cache_rows = parse_size(cache_memory_budget) // max(
            parse_size(per_feature_size), 1)

    cache_orders = []
    for h, ids in enumerate(parts):
        p = np.asarray(probs[h])[ids]
        order = ids[np.argsort(-p, kind="stable")]
        np.save(os.path.join(result_path, f"feature_partition_{h}.npy"), ids)
        np.save(os.path.join(result_path, f"cache_order_{h}.npy"),
                order[:cache_rows] if cache_rows else order)
        cache_orders.append(order)
    return parts, book, cache_orders


def load_quiver_feature_partition(result_path: str, host: int):
    """Reference load_quiver_feature_partition partition.py:252-283."""
    book = np.load(os.path.join(result_path, "partition_book.npy"))
    ids = np.load(os.path.join(result_path,
                               f"feature_partition_{host}.npy"))
    order = np.load(os.path.join(result_path, f"cache_order_{host}.npy"))
    return book, ids, order
