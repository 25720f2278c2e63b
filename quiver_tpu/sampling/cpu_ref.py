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
                frontier = np.concatenate([frontier, nbr.T.reshape(-1)])
                f_valid = np.concatenate([f_valid, mask.T.reshape(-1)])
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
            frontier = np.concatenate([frontier, nbr.T.reshape(-1)])
            f_valid = np.concatenate([f_valid, mask.T.reshape(-1)])
        return SampledBatch(n_id=frontier.astype(np.int32),
                            n_count=np.int32(frontier.shape[0]),
                            batch_size=bs, seed_count=np.int32(n),
                            adjs=tuple(reversed(blocks)))

    def _sample_per_hop(self, seeds: np.ndarray):
        """Per-hop-dedup contract, fully vectorized: the threaded native
        sampler draws the lanes, numpy sort/searchsorted does the
        union/reindex (base frontier keeps local ids 0..f_count-1, new
        ids get ascending-id order — same contract as the TPU path's
        union_reindex_fused)."""
        from .sampler import Adj, SampledBatch, _layer_capacities, SENTINEL
        from .. import native

        n = int(seeds.shape[0])
        bs = _bucket(n)
        caps = _layer_capacities(bs, self.sizes, None)

        frontier = np.full((bs,), int(SENTINEL), np.int64)
        frontier[:n] = seeds
        f_count, f_cap = n, bs
        adjs = []
        use_native = (not self.weighted) and native.available()
        for li, k in enumerate(self.sizes):
            cap = caps[li]
            F = f_cap
            nbr = np.zeros((F, k), np.int64)
            e_id = np.zeros((F, k), np.int64)
            mask = np.zeros((F, k), bool)
            act = frontier[:f_count]
            if use_native and f_count:
                if self._indices32 is None:
                    self._indices32 = np.ascontiguousarray(self.indices,
                                                           np.int32)
                nb, sl, mk = native.sample_rows(
                    self.indptr, self._indices32, act, k,
                    seed=int(self.rng.integers(2**62)))
                nbr[:f_count], e_id[:f_count], mask[:f_count] = nb, sl, mk
            else:
                for i in range(f_count):
                    slots = self._sample_row(int(act[i]), k)[:k]
                    mask[i, :len(slots)] = True
                    e_id[i, :len(slots)] = slots
                    nbr[i, :len(slots)] = self.indices[slots]

            base = frontier[:f_count].copy()
            order = np.argsort(base, kind="stable")
            base_sorted = base[order]
            lanes = np.nonzero(mask.reshape(-1))[0]
            cand = nbr.reshape(-1)[lanes]
            if f_count:
                p = np.minimum(np.searchsorted(base_sorted, cand),
                               f_count - 1)
                is_base = base_sorted[p] == cand
                base_local = order[p]
            else:
                is_base = np.zeros(len(cand), bool)
                base_local = np.zeros(len(cand), np.int64)
            new_vals = np.unique(cand[~is_base])
            n_new = min(len(new_vals), cap - f_count)
            new_rank = f_count + np.searchsorted(new_vals, cand)
            local = np.where(is_base, base_local, new_rank)
            ok = is_base | (new_rank < cap)

            src = np.zeros(F * k, np.int32)
            emask = np.zeros(F * k, bool)
            src[lanes] = np.where(ok, local, 0).astype(np.int32)
            emask[lanes] = ok
            dst = np.repeat(np.arange(F, dtype=np.int32), k)
            eid_flat = np.where(emask, e_id.reshape(-1), 0)

            out_count = f_count + n_new
            new_frontier = np.full((cap,), int(SENTINEL), np.int64)
            new_frontier[:f_count] = base
            new_frontier[f_count:out_count] = new_vals[:n_new]
            adjs.append(Adj(edge_index=np.stack([src, dst]), e_id=eid_flat,
                            mask=emask, size=(cap, f_cap),
                            counts=np.array([out_count, f_count], np.int32)))
            frontier, f_count, f_cap = new_frontier, out_count, cap

        return SampledBatch(n_id=frontier.astype(np.int32),
                            n_count=np.int32(f_count), batch_size=bs,
                            seed_count=np.int32(n),
                            adjs=tuple(reversed(adjs)))
