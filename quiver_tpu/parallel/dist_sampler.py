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


def _hop_body(ptr, idx, g2h, g2l, frontier, f_valid, k, C, H, axis, sub,
              comm=True):
    """One distributed hop (runs INSIDE shard_map): owner-sort the
    frontier, all_to_all the [H, C] id request matrix, sample the local
    CSR shard, all_to_all the [H, C, 2k] packed answers back, invert the
    sort. Returns (mask, slot, next_frontier, next_valid, n_dropped).

    ``comm=False`` replaces both all_to_alls with identity (requests
    "answered" by the local shard) — WRONG results, identical compute;
    benchmarks difference it against comm=True to isolate collective
    cost (bench_dist_sampling --decompose)."""
    F = frontier.shape[0]
    # INVALID rows route to the virtual owner H (past every real host)
    # so they sort LAST and never consume a real destination's capacity
    # ranks — matching _make_count, which measures per-destination
    # maxima over valid rows only. (Routing them to host H-1, the r4
    # first cut, let masked lanes displace valid host-(H-1) requests on
    # sparse frontiers: silent per-partition sample loss.)
    owner = jnp.where(f_valid, g2h[jnp.clip(frontier, 0, None)],
                      jnp.int32(H))
    pos = jnp.arange(F, dtype=jnp.int32)
    s_owner, order = jax.lax.sort([owner, pos], num_keys=1,
                                  is_stable=True)
    f_sorted = frontier[order]
    v_sorted = f_valid[order]
    group_start = jnp.searchsorted(
        s_owner, jnp.arange(H, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    ow_real = jnp.minimum(s_owner, jnp.int32(H - 1))
    rank = pos - group_start[ow_real]
    in_cap = v_sorted & (rank < C) & (s_owner < H)
    # request matrix [H, C]: id+1, 0 = empty slot; rows of the virtual
    # owner and over-capacity ranks target the drop slot (auto-tight
    # capacity selection makes real-row drops unreachable in the
    # default mode — C covers the max actual valid count)
    tgt = jnp.where(in_cap, ow_real * C + rank, jnp.int32(H * C))
    req = jnp.zeros((H * C + 1,), jnp.int32).at[tgt].set(
        jnp.where(in_cap, f_sorted + 1, 0),
        mode="drop")[:H * C].reshape(H, C)
    recv = jax.lax.all_to_all(req, axis, 0, 0, tiled=True) if comm else req
    rv = recv.reshape(-1)
    r_valid = rv > 0
    rows = jnp.where(r_valid, g2l[jnp.maximum(rv - 1, 0)], 0)
    nbr, mask, slot = _local_sample(ptr, idx, rows, r_valid, k, sub)
    # ONE return collective: [H, C, 2k] — neighbor ids with -1 on
    # invalid lanes (mask rides in the sign), then CSR slots.
    packed = jnp.concatenate(
        [jnp.where(mask, nbr, -1), slot], axis=1).reshape(H, C, 2 * k)
    back = (jax.lax.all_to_all(packed, axis, 0, 0, tiled=True)
            if comm else packed)
    # reassemble in sorted order, then invert the owner sort
    got = back[ow_real, jnp.clip(rank, 0, C - 1)]      # [F, 2k]
    nbr_sorted = got[:, :k]
    m_sorted = (nbr_sorted >= 0) & in_cap[:, None]
    s_sorted = got[:, k:]
    inv = jnp.zeros((F,), jnp.int32).at[order].set(pos)
    nbr_o = jnp.maximum(nbr_sorted[inv], 0)
    m_o = m_sorted[inv] & f_valid[:, None]
    s_o = s_sorted[inv]
    next_frontier = jnp.concatenate(
        [frontier, jnp.where(m_o, nbr_o, 0).T.reshape(-1)])
    next_valid = jnp.concatenate([f_valid, m_o.T.reshape(-1)])
    n_dropped = jnp.sum(v_sorted & ~in_cap).astype(jnp.int32)
    return m_o, s_o, next_frontier, next_valid, n_dropped


@functools.lru_cache(maxsize=32)
def _make_run(mesh: Mesh, axis: str, H: int, sizes, batch_size: int,
              req_caps, comm: bool = True):
    """All hops in ONE shard_map program (static per-hop capacities
    ``req_caps``) — the fused path ``make_dist_train_step`` builds on.
    Lossless when C_l == F_l (any ownership skew fits); smaller C_l
    shrinks the wire format to [H, C_l] — frontier rows beyond a
    destination's capacity are dropped (their lanes masked), the same
    trade as the strict pipeline's reindex capacities.
    ``comm=False``: collectives replaced by identity (benchmark-only,
    see _hop_body)."""
    def body(ptr, idx, g2h, g2l, seeds, seed_count, key):
        ptr, idx = ptr[0], idx[0]
        seeds, seed_count = seeds[0], seed_count[0]
        frontier = seeds.astype(jnp.int32)
        f_valid = jnp.arange(batch_size, dtype=jnp.int32) < seed_count
        outs = []
        dropped = jnp.int32(0)
        for li, k in enumerate(sizes):
            key, sub = jax.random.split(key)
            m_o, s_o, frontier, f_valid, nd = _hop_body(
                ptr, idx, g2h, g2l, frontier, f_valid, k, req_caps[li],
                H, axis, sub, comm=comm)
            dropped = dropped + nd
            outs.append((m_o[None], s_o[None],
                         jnp.sum(f_valid[:m_o.shape[0]]
                                 ).astype(jnp.int32)[None]))
        # pmax: every device (hence every PROCESS of a multi-process
        # mesh) observes the same drop total, so relearn decisions agree
        if comm:
            dropped = jax.lax.pmax(dropped, axis)
        return frontier[None], outs, dropped[None]

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P(),
                  P(axis, None), P(axis), P()),
        out_specs=(P(axis, None),
                   [(P(axis, None, None), P(axis, None, None), P(axis))
                    for _ in sizes],
                   P(axis)),
        check_vma=False))


@functools.lru_cache(maxsize=64)
def _make_hop(mesh: Mesh, axis: str, H: int, k: int, F: int, C: int):
    """One hop as its own program — the auto-tight path runs one of
    these per hop with C picked from that round's measured per-
    destination counts (lossless AND tight, replacing the reference's
    exact-size send/recv, comm.py:127-182)."""
    def body(ptr, idx, g2h, g2l, frontier, f_valid, key):
        m_o, s_o, nf, nv, _ = _hop_body(
            ptr[0], idx[0], g2h, g2l, frontier[0], f_valid[0], k, C, H,
            axis, key)
        cnt = jnp.sum(f_valid[0]).astype(jnp.int32)
        return m_o[None], s_o[None], nf[None], nv[None], cnt[None]

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P(),
                  P(axis, None), P(axis, None), P()),
        out_specs=(P(axis, None, None), P(axis, None, None),
                   P(axis, None), P(axis, None), P(axis)),
        check_vma=False))


@functools.lru_cache(maxsize=32)
def _make_count(mesh: Mesh, axis: str, H: int, F: int):
    """Global max per-destination request count for the current
    frontier — one tiny all-reduce; its host read picks the hop's wire
    capacity."""
    def body(g2h, frontier, f_valid):
        owner = jnp.where(f_valid[0], g2h[jnp.clip(frontier[0], 0, None)],
                          jnp.int32(H))
        cnt = jnp.zeros((H + 1,), jnp.int32).at[owner].add(
            1, mode="drop")[:H]
        return jax.lax.pmax(cnt.max(), axis)[None]

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None)),
        out_specs=P(axis),
        check_vma=False))


def _host_scalar_max(arr) -> int:
    """Max of a small per-device array using only ADDRESSABLE shards —
    works under multi-process meshes where np.asarray of a global array
    would fail (values are identical across devices for pmax outputs;
    for drop counters any process observing >0 relearns independently,
    which is safe — capacities are deterministic given the same seeds)."""
    vals = [int(np.asarray(s.data).max()) for s in arr.addressable_shards]
    return max(vals)


def _cap_ladder(c: int, F: int) -> int:
    """Round a measured count up the 1.5x ladder (multiples of 8), so
    padding stays <= 1.5x and distinct compiled hop programs stay
    O(log F)."""
    c = max(int(c), 8)
    v = 8
    while v < c:
        v = -(-(v * 3 // 2) // 8) * 8 if v * 3 // 2 > v else v + 8
    return min(v, F)


def _exchange_rows(feat, g2h, g2l, ids, valid, H, axis, C):
    """Cross-host feature gather INSIDE shard_map: owner-sort the global
    ``ids``, all_to_all the [H, C] id requests, local row gather on the
    owner, all_to_all the [H, C, D] rows back, invert the sort. Rows of
    invalid ids come back 0. Lossless when C == len(ids)."""
    F = ids.shape[0]
    D = feat.shape[1]
    # Invalid ids go to the VIRTUAL owner H (not a real host) so they
    # never consume capacity ranks of host H-1 — same displacement fix
    # as _hop_body above.
    owner = jnp.where(valid, g2h[jnp.clip(ids, 0, None)], jnp.int32(H))
    pos = jnp.arange(F, dtype=jnp.int32)
    s_owner, order = jax.lax.sort([owner, pos], num_keys=1, is_stable=True)
    ids_sorted = ids[order]
    v_sorted = valid[order]
    group_start = jnp.searchsorted(
        s_owner, jnp.arange(H, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    ow_real = jnp.minimum(s_owner, jnp.int32(H - 1))
    rank = pos - group_start[ow_real]
    in_cap = v_sorted & (rank < C) & (s_owner < H)
    tgt = jnp.where(in_cap, ow_real * C + rank, jnp.int32(H * C))
    req = jnp.zeros((H * C + 1,), jnp.int32).at[tgt].set(
        jnp.where(in_cap, ids_sorted + 1, 0), mode="drop")[:H * C]
    recv = jax.lax.all_to_all(req.reshape(H, C), axis, 0, 0, tiled=True)
    rv = recv.reshape(-1)
    rows = jnp.where(rv > 0, g2l[jnp.maximum(rv - 1, 0)], 0)
    xr = jnp.take(feat, rows, axis=0) * (rv > 0)[:, None].astype(feat.dtype)
    back = jax.lax.all_to_all(xr.reshape(H, C, D), axis, 0, 0, tiled=True)
    got = back[ow_real, jnp.clip(rank, 0, C - 1)]            # [F, D]
    got = got * in_cap[:, None].astype(feat.dtype)
    inv = jnp.zeros((F,), jnp.int32).at[order].set(pos)
    return got[inv]


def partition_feature_shards(feat, global2host, H: int):
    """[H, rows_max, D] per-host feature shards in the id-sorted local
    layout ``DistNeighborSampler``'s g2l indexes (host h's row j =
    feat[sorted own ids][j]) — the table ``make_dist_train_step``
    shards over the mesh."""
    feat = np.asarray(feat)
    g2h = np.asarray(global2host)
    rows_max = max(int(np.max(np.bincount(g2h, minlength=H))), 1)
    out = np.zeros((H, rows_max, feat.shape[1]), feat.dtype)
    for h in range(H):
        ids = np.where(g2h == h)[0]
        out[h, :len(ids)] = feat[ids]
    return out


def make_dist_train_step(sampler: "DistNeighborSampler", model, tx,
                         batch_size: int, loss_fn=None, req_slack=None):
    """ONE jitted shard_map program for the whole distributed training
    step: per-hop frontier all_to_all sampling over the node-partitioned
    CSR -> cross-host feature exchange for the final frontier -> model
    fwd/bwd -> pmean gradient all-reduce -> optimizer update. Nothing
    touches the host (the reference's training loop equivalent keeps
    sampler output on device, quiver_sample.cu:257-304, with DDP doing
    the gradient reduce).

    Returns ``step(params, opt_state, feat_shards, seeds, y, key) ->
    (params, opt_state, loss)`` where ``feat_shards`` is
    :func:`partition_feature_shards` output sharded P(axis) over the
    mesh, ``seeds``/``y`` are [H, B] sharded P(axis), and params /
    opt_state are replicated.

    Capacities are static (jit): lossless by default (C = full frontier
    width); pass ``req_slack`` to shrink the wire as in
    :class:`DistNeighborSampler`.
    """
    import optax

    mesh, axis, H = sampler.mesh, sampler.axis, sampler.H
    sizes = sampler.sizes
    if loss_fn is None:
        def loss_fn(logits, y):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

    caps = []
    F = batch_size
    for k in sizes:
        if req_slack is None:
            caps.append(F)
        else:
            c = -(-int(req_slack * F) // H)
            caps.append(min(F, -(-c // 8) * 8))
        F = F * (1 + k)
    feat_cap = F   # lossless final-frontier feature exchange

    def body(params, opt_state, ptr, idx, g2h, g2l, feat, seeds, y, key):
        ptr, idx, feat = ptr[0], idx[0], feat[0]
        seeds, y = seeds[0], y[0]
        B = seeds.shape[0]
        frontier = seeds.astype(jnp.int32)
        f_valid = jnp.ones((B,), bool)
        blocks, F = [], B
        for li, k in enumerate(sizes):
            key, sub = jax.random.split(key)
            cnt = jnp.sum(f_valid).astype(jnp.int32)
            m, s, frontier, f_valid, _ = _hop_body(
                ptr, idx, g2h, g2l, frontier, f_valid, k, caps[li], H,
                axis, sub)
            blocks.append(DenseBlock(mask=m, e_id=s, dst_count=cnt,
                                     size=(F * (1 + k), F), fanout=k))
            F = F * (1 + k)
        x = _exchange_rows(feat, g2h, g2l, frontier, f_valid, H, axis,
                           feat_cap)
        adjs = tuple(reversed(blocks))

        def compute_loss(p):
            logits = model.apply(p, x, adjs)[:B]
            return loss_fn(logits, y)

        loss, grads = jax.value_and_grad(compute_loss)(params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis, None), P(), P(),
                  P(axis, None, None), P(axis, None), P(axis, None), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    jitted = jax.jit(step)

    def run(params, opt_state, feat_shards, seeds, y, key):
        return jitted(params, opt_state, sampler.shards_ptr,
                      sampler.shards_idx, sampler.g2h, sampler.g2l,
                      feat_shards, seeds, y, key)

    return run


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
        self._learned_caps = {}
        self.last_caps = None
        self.last_dropped = None

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
        """Per-hop per-destination request capacity for the STATIC
        (single-program) path. ``req_slack`` None -> lossless (C = the
        hop's full frontier width; any ownership skew fits); a float s
        -> C = min(F, ceil(s * F / H)) rounded up to 8 — the wire
        format shrinks ~H/s x, and frontier rows landing beyond a
        destination's capacity are dropped (masked lanes).

        The default ``sample()`` path does NOT use these: it measures
        each round's actual per-destination max and sizes the wire to
        it (auto-tight — lossless AND <=1.5x padding), see
        :meth:`sample`."""
        caps, F = [], B
        for k in self.sizes:
            if self.req_slack is None:
                caps.append(F)
            else:
                c = -(-int(self.req_slack * F) // self.H)
                caps.append(min(F, -(-c // 8) * 8))
            F = F * (1 + k)
        return tuple(caps)

    def collective_bytes_per_hop(self, B: int, caps=None):
        """Logical send bytes per device per hop: the [H, C] id request
        matrix + the [H, C, 2k] packed answer payload (int32), vs the
        information-theoretic need (ids actually requested + k
        (neighbor, slot) pairs per answered row). ``caps``: the actual
        capacities a run used (auto-tight mode records them in
        ``self.last_caps``); defaults to the static-path capacities."""
        out, F = [], B
        caps = tuple(caps) if caps is not None else self._req_caps(B)
        for li, k in enumerate(self.sizes):
            C = caps[li]
            out.append({
                "hop": li, "req_cap": int(C),
                "wire_bytes": int(self.H * C * 4 + self.H * C * 2 * k * 4),
                "need_bytes": int(F * 4 + F * 2 * k * 4),
            })
            F = F * (1 + k)
        return out

    def _run_auto(self, seeds, B):
        """Auto-tight hop loop (the default): before each hop, one tiny
        collective measures the max per-destination request count; its
        1.5x-ladder bucket sizes that hop's wire format. Lossless (every
        destination's actual rows fit) AND tight (<=1.5x padding) —
        the TPU-native equivalent of the reference's exact-size
        send/recv exchange (comm.py:127-182), with the dynamic sizes
        hoisted to a scalar host read instead of a size matrix
        allreduce."""
        self.last_dropped = None      # auto rounds are lossless
        frontier = jnp.asarray(seeds, jnp.int32)
        f_valid = jnp.ones((self.H, B), bool)
        outs, caps, F = [], [], B
        for li, k in enumerate(self.sizes):
            self._key, sub = jax.random.split(self._key)
            cnt = _make_count(self.mesh, self.axis, self.H, F)(
                self.g2h, frontier, f_valid)
            C = _cap_ladder(_host_scalar_max(cnt), F)
            caps.append(C)
            hop = _make_hop(self.mesh, self.axis, self.H, k, F, C)
            m, s, frontier, f_valid, cnt = hop(
                self.shards_ptr, self.shards_idx, self.g2h, self.g2l,
                frontier, f_valid, sub)
            outs.append((m, s, cnt))
            F = F * (1 + k)
        self.last_caps = tuple(caps)
        return frontier, outs

    def _run_static(self, seeds, B, caps=None, comm=True):
        self._key, sub = jax.random.split(self._key)
        caps = tuple(caps) if caps is not None else self._req_caps(B)
        run = _make_run(self.mesh, self.axis, self.H, self.sizes, B, caps,
                        comm=comm)
        counts = np.full((self.H,), B, np.int32)
        frontier, outs, dropped = run(
            self.shards_ptr, self.shards_idx, self.g2h, self.g2l,
            jnp.asarray(seeds, jnp.int32), jnp.asarray(counts), sub)
        self.last_caps = caps
        self.last_dropped = dropped
        return frontier, outs, dropped

    def _ladder_up(self, caps, B):
        """Steady-state capacities: the learned (measured, ladder-
        rounded) caps plus a 25% margin for round-to-round frontier
        variance — keeps total wire <= 2x the information need while
        making margin-exceeding rounds (which degrade to masked lanes +
        relearn, never corruption) rare."""
        out, F = [], B
        for c, k in zip(caps, self.sizes):
            out.append(min(F, -(-int(int(c) * 1.25) // 8) * 8))
            F = F * (1 + k)
        return tuple(out)

    def sample_sharded(self, seeds_per_device):
        """Device-resident sampling: returns ``(frontier, blocks)``
        where ``frontier`` is the mesh-sharded [H, N_total] int32 id
        array and ``blocks`` is a list of per-hop mesh-sharded
        ``DenseBlock``s with a stacked leading device axis — ready for
        a shard_map train step with NO host round-trip (the reference's
        sampler output likewise stays on device,
        quiver_sample.cu:257-304). ``blocks`` is ordered hop-first
        (reverse of the model's adjs order).

        Default (``req_slack=None``) wire sizing is AUTO-TIGHT: the
        first round measures each hop's max per-destination request
        count and runs per-hop programs at exactly that (lossless);
        later rounds run ONE fused program at the learned capacities
        plus a 25% margin, with an on-device dropped-
        row counter — a round that exceeds the margin (extreme skew)
        still yields a VALID batch (over-capacity lanes are masked, not
        corrupted) and triggers relearning for subsequent rounds."""
        seeds = np.asarray(seeds_per_device)
        n_dev, B = seeds.shape
        assert n_dev == self.H, (n_dev, self.H)
        if self.req_slack is not None:
            frontier, outs, _ = self._run_static(seeds, B)
        else:
            learned = self._learned_caps.get(B)
            if learned is None:
                frontier, outs = self._run_auto(seeds, B)
                self._learned_caps[B] = self._ladder_up(self.last_caps, B)
            else:
                frontier, outs, dropped = self._run_static(seeds, B,
                                                           caps=learned)
                if _host_scalar_max(dropped) > 0:
                    # extreme skew: relearn losslessly and resample
                    frontier, outs = self._run_auto(seeds, B)
                    self._learned_caps[B] = self._ladder_up(
                        self.last_caps, B)
        blocks, f_cap = [], B
        for li, (m, s, c) in enumerate(outs):
            k = self.sizes[li]
            blocks.append(DenseBlock(
                mask=m, e_id=s, dst_count=c,
                size=(f_cap * (1 + k), f_cap), fanout=k))
            f_cap = f_cap * (1 + k)
        return frontier, blocks

    def sample(self, seeds_per_device):
        """seeds_per_device: [n_dev, B] global ids. Returns one
        SampledBatch per device (dense positional contract), with
        host-materialized arrays — the convenience/test path; use
        :meth:`sample_sharded` (or ``make_dist_train_step``) to keep
        everything on device."""
        seeds = np.asarray(seeds_per_device)
        n_dev, B = seeds.shape
        frontier, blocks = self.sample_sharded(seeds)
        batches = []
        fr = np.asarray(frontier)
        blocks_np = [(np.asarray(b.mask), np.asarray(b.e_id),
                      np.asarray(b.dst_count)) for b in blocks]
        for d in range(n_dev):
            adjs = []
            for li, (m, s, c) in enumerate(blocks_np):
                adjs.append(DenseBlock(
                    mask=jnp.asarray(m[d]), e_id=jnp.asarray(s[d]),
                    dst_count=jnp.int32(c[d]),
                    size=blocks[li].size, fanout=blocks[li].fanout))
            batches.append(SampledBatch(
                n_id=jnp.asarray(fr[d]), n_count=jnp.int32(fr[d].shape[0]),
                batch_size=B, seed_count=jnp.int32(B),
                adjs=tuple(reversed(adjs))))
        return batches
