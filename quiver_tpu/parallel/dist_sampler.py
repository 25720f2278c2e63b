"""Distributed neighbor sampling over a node-partitioned graph.

The riskiest gap called out in SURVEY.md §7: the reference keeps the FULL
CSR in every host's pinned RAM and samples it over PCIe (UVA), which has
no TPU analogue. Here the graph is *node-partitioned* across mesh
devices (one per logical host, placement from
``quiver_tpu.partition``): each device holds only the CSR rows of its
own nodes, and each hop runs

    owner-sort -> all_to_all(frontier ids) -> local dense sampling
    -> all_to_all(sampled lanes back) -> positional merge

inside one ``shard_map``, so a graph ~H times larger than one host's
memory trains with two ICI/DCN collectives per hop. This single
collective pair replaces the reference's NcclComm exchange scheduling
(comm.py:42-182).

Output contract: the same dense positional ``DenseBlock`` batches as the
single-chip sampler, one per mesh device (stacked leading axis), ready
for ``make_dp_train_step``. ``e_id`` refers to slots of the owner's
local CSR shard.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..sampling.sampler import DenseBlock, SampledBatch
from ..sampling.kernels import _row_ranges, _floyd_positions


def _local_sample(indptr, indices, rows, rows_valid, k, key):
    """Dense fanout-k sample of LOCAL csr rows; indices hold GLOBAL ids."""
    start, deg = _row_ranges(indptr, rows, rows_valid)
    pos = _floyd_positions(key, deg, k)
    ar = jnp.arange(k, dtype=jnp.int32)
    cnt = jnp.minimum(deg, k)
    mask = (ar[None, :] < cnt[:, None]) & rows_valid[:, None]
    slot = jnp.where(mask, start[:, None] + pos, 0)
    nbr = jnp.take(indices, slot, mode="clip").astype(jnp.int32)
    return nbr, mask, slot


@functools.lru_cache(maxsize=32)
def _make_run(mesh: Mesh, axis: str, H: int, sizes, batch_size: int,
              req_caps):
    """req_caps: per-hop per-destination request capacity C_l (static).
    Lossless when C_l == F_l (any ownership skew fits); smaller C_l
    shrinks the wire format to [H, C_l] — frontier rows beyond a
    destination's capacity are dropped (their lanes masked), the same
    trade as the strict pipeline's reindex capacities."""
    def body(ptr, idx, g2h, g2l, seeds, seed_count, key):
        ptr, idx = ptr[0], idx[0]
        seeds, seed_count = seeds[0], seed_count[0]
        frontier = seeds.astype(jnp.int32)
        f_valid = jnp.arange(batch_size, dtype=jnp.int32) < seed_count
        outs = []
        for li, k in enumerate(sizes):
            key, sub = jax.random.split(key)
            F = frontier.shape[0]
            C = req_caps[li]
            owner = jnp.where(f_valid, g2h[jnp.clip(frontier, 0, None)],
                              jnp.int32(H - 1))
            pos = jnp.arange(F, dtype=jnp.int32)
            s_owner, order = jax.lax.sort([owner, pos], num_keys=1,
                                          is_stable=True)
            f_sorted = frontier[order]
            v_sorted = f_valid[order]
            group_start = jnp.searchsorted(
                s_owner, jnp.arange(H, dtype=jnp.int32), side="left"
            ).astype(jnp.int32)
            rank = pos - group_start[s_owner]
            in_cap = v_sorted & (rank < C)
            # request matrix [H, C]: id+1, 0 = empty slot; over-capacity
            # ranks target the drop slot
            tgt = jnp.where(rank < C, s_owner * C + rank, jnp.int32(H * C))
            req = jnp.zeros((H * C + 1,), jnp.int32).at[tgt].set(
                jnp.where(in_cap, f_sorted + 1, 0),
                mode="drop")[:H * C].reshape(H, C)
            recv = jax.lax.all_to_all(req, axis, 0, 0, tiled=True)
            rv = recv.reshape(-1)
            r_valid = rv > 0
            rows = jnp.where(r_valid, g2l[jnp.maximum(rv - 1, 0)], 0)
            nbr, mask, slot = _local_sample(ptr, idx, rows, r_valid, k, sub)
            # ONE return collective: [H, C, 2k] — neighbor ids with -1 on
            # invalid lanes (mask rides in the sign), then CSR slots.
            packed = jnp.concatenate(
                [jnp.where(mask, nbr, -1), slot], axis=1).reshape(H, C, 2 * k)
            back = jax.lax.all_to_all(packed, axis, 0, 0, tiled=True)
            # reassemble in sorted order, then invert the owner sort
            got = back[s_owner, jnp.minimum(rank, C - 1)]      # [F, 2k]
            nbr_sorted = got[:, :k]
            m_sorted = (nbr_sorted >= 0) & in_cap[:, None]
            s_sorted = got[:, k:]
            inv = jnp.zeros((F,), jnp.int32).at[order].set(pos)
            nbr_o = jnp.maximum(nbr_sorted[inv], 0)
            m_o = m_sorted[inv] & f_valid[:, None]
            s_o = s_sorted[inv]
            outs.append((m_o[None], s_o[None],
                         jnp.sum(f_valid).astype(jnp.int32)[None]))
            frontier = jnp.concatenate(
                [frontier, jnp.where(m_o, nbr_o, 0).T.reshape(-1)])
            f_valid = jnp.concatenate([f_valid, m_o.T.reshape(-1)])
        return frontier[None], outs

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P(),
                  P(axis, None), P(axis), P()),
        out_specs=(P(axis, None),
                   [(P(axis, None, None), P(axis, None, None), P(axis))
                    for _ in sizes]),
        check_vma=False))


def build_graph_shards(out_dir: str, global2host, edges, num_nodes=None,
                       chunked: bool = True):
    """Offline shard builder: stream the COO once, write per-host CSR
    artifacts — the preprocessing that lets a graph no single host can
    hold train via :meth:`DistNeighborSampler.from_shards` (replacing
    the reference's UVA full-CSR-in-pinned-RAM story,
    quiver.cu.hpp:16-26,206-215; artifact layout in the spirit of the
    papers100M prep flow, benchmarks/ogbn-papers100M/preprocess.py:118-211).

    Args:
      out_dir: artifact directory, created if needed. Writes
        ``global2host.npy`` plus per host h ``shard_{h}_indptr.npy``
        (local CSR over h's own rows, ascending global id),
        ``shard_{h}_indices.npy`` (GLOBAL neighbor ids) and
        ``shard_{h}_own.npy`` (sorted global ids owned by h).
      global2host: [V] owner host per node (partitioner output).
      edges: iterable of ``(row_chunk, col_chunk)`` global-id array
        pairs — e.g. chunks read straight from an edge file. The full
        edge list is never materialized; peak memory is one host's COO.
      num_nodes: optional V (defaults to len(global2host)).
    """
    import os

    g2h = np.asarray(global2host, np.int64)
    H = int(g2h.max()) + 1 if g2h.size else 1
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "global2host.npy"), g2h)

    # pass 1: split edge chunks to per-owner spill files (interleaved
    # [row, col] int64 pairs, appended)
    spill = [open(os.path.join(out_dir, f"_coo_{h}.bin"), "wb")
             for h in range(H)]
    try:
        for row, col in edges:
            row = np.asarray(row, np.int64)
            col = np.asarray(col, np.int64)
            own = g2h[row]
            for h in range(H):
                sel = own == h
                if sel.any():
                    np.stack([row[sel], col[sel]], axis=1).tofile(spill[h])
    finally:
        for f in spill:
            f.close()

    # pass 2: per host, local CSR (bounded by that host's edge count)
    from ..utils import _coo_to_csr
    for h in range(H):
        path = os.path.join(out_dir, f"_coo_{h}.bin")
        pairs = np.fromfile(path, np.int64).reshape(-1, 2)
        os.remove(path)
        own_ids = np.where(g2h == h)[0]
        local_row = np.searchsorted(own_ids, pairs[:, 0])
        indptr, indices, _ = _coo_to_csr(local_row, pairs[:, 1],
                                         num_nodes=len(own_ids))
        np.save(os.path.join(out_dir, f"shard_{h}_indptr.npy"), indptr)
        np.save(os.path.join(out_dir, f"shard_{h}_indices.npy"),
                indices.astype(np.int32))
        np.save(os.path.join(out_dir, f"shard_{h}_own.npy"), own_ids)
    return out_dir


class DistNeighborSampler:
    """Layered sampler over a node-partitioned CSR across a mesh.

    Args:
      mesh: 1-D device mesh; device d plays logical host d.
      csr_topo: the FULL host-resident topology (convenience path for
        graphs that fit one host; at papers100M scale build per-host
        artifacts once with :func:`build_graph_shards` and construct via
        ``from_shards`` — no host ever materializes the full CSR).
      global2host: [V] owner host of each node (partitioner output).
      sizes: per-layer fanouts.
    """

    def __init__(self, mesh: Mesh, csr_topo, global2host, sizes: Sequence[int],
                 seed: int = 0, req_slack=None):
        g2h = np.asarray(global2host, np.int32)
        V = g2h.shape[0]
        indptr = np.asarray(csr_topo.indptr)
        indices = np.asarray(csr_topo.indices)
        H = int(mesh.devices.size)

        ptrs, idxs, owns = [], [], []
        for h in range(H):
            ids = np.where(g2h == h)[0]
            owns.append(ids)
            degs = indptr[ids + 1] - indptr[ids] if len(ids) else np.zeros(0, np.int64)
            p = np.zeros(len(ids) + 1, np.int64)
            np.cumsum(degs, out=p[1:])
            ptrs.append(p)
            idxs.append(np.concatenate(
                [indices[indptr[v]:indptr[v + 1]] for v in ids])
                if len(ids) else np.zeros(0, np.int32))
        self._setup(mesh, ptrs, idxs, owns, g2h, sizes, seed, req_slack)

    @classmethod
    def from_shards(cls, mesh: Mesh, shard_dir: str, sizes: Sequence[int],
                    seed: int = 0, req_slack=None) -> "DistNeighborSampler":
        """Construct from :func:`build_graph_shards` artifacts — each
        host's CSR shard only; the full topology is never assembled."""
        import os

        self = cls.__new__(cls)
        g2h = np.load(os.path.join(shard_dir, "global2host.npy")).astype(np.int32)
        H = int(mesh.devices.size)
        ptrs, idxs, owns = [], [], []
        for h in range(H):
            ptrs.append(np.load(os.path.join(shard_dir,
                                             f"shard_{h}_indptr.npy")))
            idxs.append(np.load(os.path.join(shard_dir,
                                             f"shard_{h}_indices.npy")))
            owns.append(np.load(os.path.join(shard_dir,
                                             f"shard_{h}_own.npy")))
        self._setup(mesh, ptrs, idxs, owns, g2h, sizes, seed, req_slack)
        return self

    def _setup(self, mesh, ptrs, idxs, owns, g2h, sizes, seed,
               req_slack=None):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.H = int(mesh.devices.size)
        self.sizes = tuple(int(s) for s in sizes)
        self.req_slack = req_slack
        self._key = jax.random.PRNGKey(seed)

        V = g2h.shape[0]
        g2l = np.zeros(V, np.int32)
        for ids in owns:
            g2l[ids] = np.arange(len(ids), dtype=np.int32)
        rows_max = max(max((len(o) for o in owns), default=1), 1)
        e_max = max(max((len(i) for i in idxs), default=1), 1)
        shards_ptr = np.zeros((self.H, rows_max + 1), np.int64)
        shards_idx = np.zeros((self.H, e_max), np.int32)
        for h in range(self.H):
            n = len(owns[h])
            shards_ptr[h, :n + 1] = ptrs[h]
            shards_ptr[h, n + 1:] = ptrs[h][n] if n else 0
            shards_idx[h, :len(idxs[h])] = idxs[h]

        ax = self.axis
        self.shards_ptr = jax.device_put(
            jnp.asarray(shards_ptr, jnp.int32),
            NamedSharding(mesh, P(ax, None)))
        self.shards_idx = jax.device_put(
            jnp.asarray(shards_idx), NamedSharding(mesh, P(ax, None)))
        repl = NamedSharding(mesh, P())
        self.g2h = jax.device_put(jnp.asarray(g2h, jnp.int32), repl)
        self.g2l = jax.device_put(jnp.asarray(g2l), repl)

    def _req_caps(self, B: int):
        """Per-hop per-destination request capacity. ``req_slack`` None
        -> lossless (C = the hop's full frontier width); a float s
        -> C = min(F, ceil(s * F / H)) rounded up to 8 — the wire
        format shrinks ~H/s x, and frontier rows landing beyond a
        destination's capacity are dropped (masked lanes)."""
        caps, F = [], B
        for k in self.sizes:
            if self.req_slack is None:
                caps.append(F)
            else:
                c = -(-int(self.req_slack * F) // self.H)
                caps.append(min(F, -(-c // 8) * 8))
            F = F * (1 + k)
        return tuple(caps)

    def collective_bytes_per_hop(self, B: int):
        """Logical send bytes per device per hop: the [H, C] id request
        matrix + the [H, C, 2k] packed answer payload (int32), vs the
        information-theoretic need (ids actually requested + k
        (neighbor, slot) pairs per answered row)."""
        out, F = [], B
        caps = self._req_caps(B)
        for li, k in enumerate(self.sizes):
            C = caps[li]
            out.append({
                "hop": li, "req_cap": int(C),
                "wire_bytes": int(self.H * C * 4 + self.H * C * 2 * k * 4),
                "need_bytes": int(F * 4 + F * 2 * k * 4),
            })
            F = F * (1 + k)
        return out

    def sample(self, seeds_per_device):
        """seeds_per_device: [n_dev, B] global ids. Returns one
        SampledBatch per device (dense positional contract)."""
        seeds = np.asarray(seeds_per_device)
        n_dev, B = seeds.shape
        assert n_dev == self.H, (n_dev, self.H)
        self._key, sub = jax.random.split(self._key)
        run = _make_run(self.mesh, self.axis, self.H, self.sizes, B,
                        self._req_caps(B))
        counts = np.full((n_dev,), B, np.int32)
        frontier, outs = run(self.shards_ptr, self.shards_idx, self.g2h,
                             self.g2l, jnp.asarray(seeds, jnp.int32),
                             jnp.asarray(counts), sub)

        batches = []
        fr = np.asarray(frontier)
        outs_np = [(np.asarray(m), np.asarray(s), np.asarray(c))
                   for m, s, c in outs]
        for d in range(n_dev):
            blocks = []
            f_cap = B
            for li, (m, s, c) in enumerate(outs_np):
                k = self.sizes[li]
                blocks.append(DenseBlock(
                    mask=jnp.asarray(m[d]), e_id=jnp.asarray(s[d]),
                    dst_count=jnp.int32(c[d]),
                    size=(f_cap * (1 + k), f_cap), fanout=k))
                f_cap = f_cap * (1 + k)
            batches.append(SampledBatch(
                n_id=jnp.asarray(fr[d]), n_count=jnp.int32(fr[d].shape[0]),
                batch_size=B, seed_count=jnp.int32(B),
                adjs=tuple(reversed(blocks))))
        return batches
