"""Host (numpy) neighbor sampler — oracle + serving CPU-worker backend.

Parity with the reference's CPU sampler (``quiver<T,CPU>::sample_kernel``
quiver.cpu.hpp:58-102: per-seed ``std::sample`` reservoir + unordered_map
reindex, wrapped by ``CPUQuiver`` quiver.cpp:11-85). Returns the exact
same padded static-shape contract as the TPU path so callers are
backend-agnostic; tests use it as ground truth for subset/count validity.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def _bucket(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


class CPUSampler:
    def __init__(self, csr_topo, sizes: Sequence[int], weighted: bool = False,
                 seed: int = 0, dedup: str = "per_hop"):
        self.indptr = np.asarray(csr_topo.indptr, np.int64)
        self.indices = np.asarray(csr_topo.indices, np.int64)
        self.weight = (None if csr_topo.edge_weight is None
                       else np.asarray(csr_topo.edge_weight, np.float64))
        self.sizes = tuple(int(s) for s in sizes)
        self.weighted = weighted
        self.dedup = dedup
        self.rng = np.random.default_rng(seed)
        self._indices32 = None  # lazy int32 copy for the native sampler

    def _sample_row(self, v: int, k: int):
        s, e = self.indptr[v], self.indptr[v + 1]
        deg = e - s
        if deg == 0:
            return np.empty(0, np.int64)
        if self.weighted:
            w = self.weight[s:e]
            p = w / w.sum()
            pos = self.rng.choice(deg, size=k, replace=True, p=p)
            return s + pos
        if deg <= k:
            return np.arange(s, e)
        pos = self.rng.choice(deg, size=k, replace=False)
        return s + pos

    def sample(self, seeds: np.ndarray):
        if self.dedup == "none":
            return self._sample_dense(np.asarray(seeds, np.int64))
        return self._sample_per_hop(np.asarray(seeds, np.int64))

    def _sample_dense(self, seeds: np.ndarray):
        """Positional (no-dedup) contract — mirrors _sample_layers_dense.

        Uses the threaded native sampler (native/quiver_host.cpp
        qt_sample_rows) when available; numpy row loop otherwise."""
        from .sampler import DenseBlock, SampledBatch
        from .. import native

        use_native = (not self.weighted) and native.available()
        n = int(seeds.shape[0])
        bs = _bucket(n)
        frontier = np.zeros((bs,), np.int64)
        frontier[:n] = seeds
        f_valid = np.zeros((bs,), bool)
        f_valid[:n] = True
        blocks = []
        for k in self.sizes:
            F = frontier.shape[0]
            if use_native:
                if self._indices32 is None:
                    self._indices32 = np.ascontiguousarray(self.indices,
                                                           np.int32)
                safe = np.where(f_valid, frontier, 0)
                nbr, e_id, mask = native.sample_rows(
                    self.indptr, self._indices32, safe, k,
                    seed=int(self.rng.integers(2**62)))
                mask &= f_valid[:, None]
                nbr = np.where(mask, nbr, 0).astype(np.int64)
                e_id = np.where(mask, e_id, 0)
                blocks.append(DenseBlock(
                    mask=mask, e_id=e_id,
                    dst_count=np.int32(f_valid.sum()),
                    size=(F * (1 + k), F), fanout=k))
                frontier = np.concatenate([frontier, nbr.reshape(-1)])
                f_valid = np.concatenate([f_valid, mask.reshape(-1)])
                continue
            mask = np.zeros((F, k), bool)
            e_id = np.zeros((F, k), np.int64)
            nbr = np.zeros((F, k), np.int64)
            for i in np.where(f_valid)[0]:
                slots = self._sample_row(int(frontier[i]), k)[:k]
                mask[i, :len(slots)] = True
                e_id[i, :len(slots)] = slots
                nbr[i, :len(slots)] = self.indices[slots]
            blocks.append(DenseBlock(
                mask=mask, e_id=e_id,
                dst_count=np.int32(f_valid.sum()),
                size=(F * (1 + k), F), fanout=k))
            frontier = np.concatenate([frontier, nbr.reshape(-1)])
            f_valid = np.concatenate([f_valid, mask.reshape(-1)])
        return SampledBatch(n_id=frontier.astype(np.int32),
                            n_count=np.int32(frontier.shape[0]),
                            batch_size=bs, seed_count=np.int32(n),
                            adjs=tuple(reversed(blocks)))

    def _sample_per_hop(self, seeds: np.ndarray):
        from .sampler import Adj, SampledBatch, _layer_capacities, SENTINEL

        n = int(seeds.shape[0])
        bs = _bucket(n)
        caps = _layer_capacities(bs, self.sizes, None)

        frontier = np.full((bs,), int(SENTINEL), np.int64)
        frontier[:n] = seeds
        f_count, f_cap = n, bs
        adjs = []
        for li, k in enumerate(self.sizes):
            cap = caps[li]
            local = {int(g): i for i, g in enumerate(frontier[:f_count])}
            out_ids = list(frontier[:f_count])
            E = f_cap * k
            src = np.zeros(E, np.int32)
            dst = np.repeat(np.arange(f_cap, dtype=np.int32), k)
            e_id = np.zeros(E, np.int64)
            mask = np.zeros(E, bool)
            for i in range(f_count):
                slots = self._sample_row(int(frontier[i]), k)
                for j, sl in enumerate(slots[:k]):
                    g = int(self.indices[sl])
                    if g not in local:
                        if len(out_ids) >= cap:
                            continue
                        local[g] = len(out_ids)
                        out_ids.append(g)
                    lane = i * k + j
                    src[lane] = local[g]
                    e_id[lane] = sl
                    mask[lane] = True
            new_frontier = np.full((cap,), int(SENTINEL), np.int64)
            new_frontier[:len(out_ids)] = out_ids
            adjs.append(Adj(edge_index=np.stack([src, dst]), e_id=e_id,
                            mask=mask, size=(cap, f_cap),
                            counts=np.array([len(out_ids), f_count], np.int32)))
            frontier, f_count, f_cap = new_frontier, len(out_ids), cap

        return SampledBatch(n_id=frontier.astype(np.int32),
                            n_count=np.int32(f_count), batch_size=bs,
                            seed_count=np.int32(n),
                            adjs=tuple(reversed(adjs)))
