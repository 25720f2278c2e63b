"""Graph topology containers and small utilities.

TPU-native rebuild of the reference's ``srcs/python/quiver/utils.py``
(CSRTopo at utils.py:119-225, reindex_by_config at utils.py:229-247,
parse_size at utils.py:259-280). The container is host-resident numpy;
device placement happens in the sampler / feature store, which is the
TPU analogue of the reference's DMA/UVA modes.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "CSRTopo",
    "parse_size",
    "reindex_by_config",
    "reindex_feature",
    "round_up",
    "Topo",
    "init_p2p",
]

_SIZE_SUFFIX = {
    "K": 1 << 10,
    "M": 1 << 20,
    "G": 1 << 30,
    "T": 1 << 40,
}


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m`` (TPU lane/tile alignment)."""
    return -(-int(x) // int(m)) * int(m)


def parse_size(size) -> int:
    """Parse human-friendly byte sizes: 1024, "200M", "4G", "1.5G" -> bytes.

    Parity with reference utils.py:259-280.
    """
    if isinstance(size, (int, np.integer)):
        return int(size)
    if isinstance(size, float):
        return int(size)
    if isinstance(size, str):
        s = size.strip().upper()
        # two-letter suffixes too ("8GB" == "8G"), like the reference
        if len(s) >= 2 and s[-1] == "B" and s[-2] in _SIZE_SUFFIX:
            s = s[:-1]
        if s and s[-1] in _SIZE_SUFFIX:
            return int(float(s[:-1]) * _SIZE_SUFFIX[s[-1]])
        return int(float(s))
    raise ValueError(f"invalid size: {size!r}")


def _coo_to_csr(row: np.ndarray, col: np.ndarray, num_nodes: int | None = None):
    """COO -> CSR via stable counting sort. Returns (indptr, indices, eid).

    ``eid[i]`` is the original COO edge position of CSR slot ``i`` —
    the analogue of the reference's edge-id array built during
    ``quiver<T,CUDA>::New()`` (quiver.cu.hpp:218-238). Large edge lists
    go through the threaded native builder (native/quiver_host.cpp).
    """
    row = np.asarray(row)
    col = np.asarray(col)
    if row.shape != col.shape or row.ndim != 1:
        raise ValueError("row/col must be 1-D and equal length")
    n = int(num_nodes) if num_nodes is not None else (
        int(max(row.max(initial=-1), col.max(initial=-1))) + 1 if row.size else 0
    )
    if row.size >= 1_000_000:
        try:
            from . import native
            if native.available():
                return native.coo_to_csr(row, col, n)
        except Exception:
            pass
    counts = np.bincount(row, minlength=n).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    # Stable argsort by row keeps the original intra-row edge order.
    perm = np.argsort(row, kind="stable")
    indices = col[perm]
    eid = perm.astype(np.int64)
    return indptr, indices, eid


class CSRTopo:
    """Host-resident CSR graph topology.

    Accepts either a COO ``edge_index`` of shape [2, E] or explicit
    ``(indptr, indices)``. Mirrors the reference CSRTopo's API surface:
    ``indptr``, ``indices``, ``eid``, ``degree``, ``node_count``,
    ``edge_count``, ``feature_order`` (set by the feature store after
    hot/cold reordering) and ``share_memory_`` (a no-op here: JAX is
    single-process-per-host, so there is nothing to share).
    """

    def __init__(self, edge_index=None, indptr=None, indices=None,
                 eid=None, edge_weight=None, num_nodes=None):
        if edge_index is not None:
            edge_index = np.asarray(edge_index)
            self.indptr_, self.indices_, self.eid_ = _coo_to_csr(
                edge_index[0], edge_index[1], num_nodes)
        elif indptr is not None and indices is not None:
            self.indptr_ = np.asarray(indptr, dtype=np.int64)
            self.indices_ = np.asarray(indices)
            self.eid_ = None if eid is None else np.asarray(eid, dtype=np.int64)
        else:
            raise ValueError("either edge_index or (indptr, indices) required")
        if self.indices_.dtype not in (np.int32, np.int64):
            self.indices_ = self.indices_.astype(np.int64)
        self.edge_weight_ = None
        if edge_weight is not None:
            w = np.asarray(edge_weight, dtype=np.float32)
            if self.eid_ is not None and edge_index is not None:
                w = w[self.eid_]  # permute COO weights into CSR slot order
            self.edge_weight_ = w
        self.feature_order_ = None

    @property
    def indptr(self) -> np.ndarray:
        return self.indptr_

    @property
    def indices(self) -> np.ndarray:
        return self.indices_

    @property
    def eid(self):
        return self.eid_

    @property
    def edge_weight(self):
        return self.edge_weight_

    @property
    def feature_order(self):
        """new-id -> position permutation set by Feature.from_cpu_tensor."""
        return self.feature_order_

    @feature_order.setter
    def feature_order(self, order):
        self.feature_order_ = np.asarray(order)

    @property
    def degree(self) -> np.ndarray:
        return np.diff(self.indptr_)

    @property
    def node_count(self) -> int:
        return int(self.indptr_.shape[0]) - 1

    @property
    def edge_count(self) -> int:
        return int(self.indices_.shape[0])

    def share_memory_(self):  # parity shim (reference utils.py:215-225)
        return self


def reindex_by_config(adj_csr: CSRTopo, graph_feature, gpu_portion: float):
    """Degree-ordered hot/cold permutation (reference utils.py:229-241).

    Sorts nodes by degree descending, shuffles the hot prefix (so the
    cache holds a random sample of the hot set, matching the reference's
    randomized prefix), and returns (feature_new2old, feature_old2new).
    """
    if not 0.0 <= gpu_portion <= 1.0:
        raise ValueError("gpu_portion must be in [0, 1]")
    node_count = adj_csr.node_count
    cache_count = int(node_count * gpu_portion)
    degree = adj_csr.degree
    new2old = np.argsort(-degree, kind="stable")
    rng = np.random.default_rng(0)
    hot = new2old[:cache_count].copy()
    rng.shuffle(hot)
    new2old = np.concatenate([hot, new2old[cache_count:]])
    old2new = np.empty_like(new2old)
    old2new[new2old] = np.arange(node_count, dtype=new2old.dtype)
    if graph_feature is not None:
        graph_feature = np.asarray(graph_feature)[new2old]
    return graph_feature, old2new, new2old


def reindex_feature(graph: CSRTopo, feature, ratio: float):
    """Reference utils.py:244-247."""
    if not isinstance(graph, CSRTopo):
        raise ValueError("graph must be a CSRTopo")
    feature, old2new, new2old = reindex_by_config(graph, feature, ratio)
    return feature, old2new, new2old


class Topo:
    """Fast-interconnect clique topology (reference ``p2pCliqueTopo``,
    utils.py:53-106). On NVIDIA servers cliques come from pairwise NVLink
    p2p queries (Bron-Kerbosch over the access matrix); on TPU every chip
    in a slice is ICI-connected, so the local devices form ONE clique —
    multi-slice systems get one clique per slice (DCN between them)."""

    def __init__(self, device_list=None):
        import jax
        if device_list is None:
            device_list = list(range(len(jax.devices())))
        devices = jax.devices()
        by_slice = {}
        for rank in device_list:
            d = devices[rank]
            key = getattr(d, "slice_index", 0)
            by_slice.setdefault(key, []).append(rank)
        self.p2p_clique = list(by_slice.values())
        self.rank2clique = {r: ci for ci, group in enumerate(self.p2p_clique)
                            for r in group}

    def get_clique_id(self, rank: int) -> int:
        return self.rank2clique[rank]

    def info(self) -> str:
        return "\n".join(f"Clique {ci}: {group}"
                         for ci, group in enumerate(self.p2p_clique))


def init_p2p(device_list=None):
    """Parity shim (reference utils.py:250-256 / quiver_feature.cu:378):
    ICI peer access needs no enabling on TPU; returns the clique Topo."""
    return Topo(device_list)
