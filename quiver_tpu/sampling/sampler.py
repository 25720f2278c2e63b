"""Layered neighbor sampler with static shapes (the GraphSageSampler analogue).

TPU-native rebuild of the reference's ``GraphSageSampler``
(srcs/python/quiver/pyg/sage_sampler.py:40-178) and the fused
sample+reindex path (``TorchQuiver::sample_kernel`` quiver_sample.cu:134-200,
``reindex_single`` quiver_sample.cu:305-357).

Key departure from the reference (by design, for XLA): every shape is
static. The reference returns ragged ``(neighbors, counts)`` and a
dynamically-sized reindexed id space; here each layer emits a padded
``[F, k]`` neighbor block plus masks, and the union/reindex step
(``ops.union_reindex``) produces a fixed-capacity local-id table with a
dynamic count. Downstream aggregation is mask-correct, so the padded
program computes exactly the ragged semantics.

Modes (parity with reference sage_sampler.py:44-64):
  * ``TPU``  — CSR resident in device HBM (analogue of reference GPU/DMA
    mode). The whole multi-layer sample is one jitted XLA program.
  * ``CPU``  — host numpy oracle (``cpu_ref``), used for serving CPU
    workers and as ground truth in tests (analogue of reference CPU mode).

There is no UVA mode: TPUs have no zero-copy host mapping. Graphs larger
than HBM are handled by edge partitioning across hosts (see
``quiver_tpu.parallel``), per SURVEY.md §7.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.unique import (union_reindex_fused, union_reindex_dense,
                          union_reindex_sorted_edges, SENTINEL)
from .kernels import (
    sample_adjacency,
    sample_adjacency_meta,
    sample_adjacency_window,
    sample_adjacency_packed,
    sample_adjacency_block,
    build_block_layout,
    build_meta2,
    build_window_layout,
    build_packed_layout,
    device_shuffle_window,
    window_meta,
    weighted_sample_adjacency,
    weighted_sample_alias,
    build_alias_table,
    build_row_cdf,
    cal_next_prob,
)


def _sample_exact(indptr, indices, frontier, f_valid, k, key, big_cap=0,
                  fused=False):
    """Exact-mode dispatch: ([V, >2]-wide, indices) tuple -> block-exact
    kernel (one descriptor per small-degree row); ([V, 2], indices)
    tuple -> one-row-gather meta kernel; plain array -> indptr element
    gathers. All three draw identical uniform k-subsets. ``fused``
    routes the block-exact case through the fused Pallas kernel
    (pallas_sampler.py) instead of the staged XLA ops."""
    if isinstance(indices, tuple):
        tab, ind1d = indices
        if tab.shape[1] > 2:
            if fused:
                from .pallas_sampler import sample_adjacency_block_fused
                return sample_adjacency_block_fused(
                    tab, ind1d, frontier, f_valid, k, key,
                    big_cap=big_cap or frontier.shape[0])
            return sample_adjacency_block(
                tab, ind1d, frontier, f_valid, k, key,
                big_cap=big_cap or frontier.shape[0])
        return sample_adjacency_meta(tab, ind1d, frontier, f_valid, k, key)
    return sample_adjacency(indptr, indices, frontier, f_valid, k, key)


def _chunked_put(arr, device=None, chunk_bytes=64 << 20):
    """device_put in <=64MB row chunks (single very large transfers have
    wedged the remote-TPU transport; concatenation happens on device)."""
    arr = np.asarray(arr)
    if arr.nbytes <= chunk_bytes or arr.ndim == 0:
        return jax.device_put(jnp.asarray(arr), device=device)
    rows = max(1, chunk_bytes // max(arr[0:1].nbytes, 1))
    parts = [jax.device_put(jnp.asarray(arr[i:i + rows]), device=device)
             for i in range(0, arr.shape[0], rows)]
    out = jnp.concatenate(parts, axis=0)
    out.block_until_ready()
    return out


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("edge_index", "e_id", "mask", "counts"),
                   meta_fields=("size",))
@dataclasses.dataclass(frozen=True)
class Adj:
    """One sampled bipartite block (parity with reference Adj, sage_sampler.py:21).

    ``edge_index[0]`` = source local id (sampled neighbor),
    ``edge_index[1]`` = target local id (frontier position); messages flow
    source -> target, matching PyG's convention after the reference's
    row/col flip (sage_sampler.py:136-144).

    Registered as a pytree with ``size`` as *static* metadata so the
    block can cross a ``jit`` boundary without tracing its shapes.
    """

    edge_index: jnp.ndarray   # [2, E] int32
    e_id: jnp.ndarray         # [E] int32/int64 CSR slot of each edge
    mask: jnp.ndarray         # [E] bool, False on padded lanes
    size: Tuple[int, int]     # static (src_capacity, dst_capacity)
    counts: jnp.ndarray       # [2] int32 dynamic (src_count, dst_count)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("mask", "e_id", "dst_count"),
                   meta_fields=("size", "fanout"))
@dataclasses.dataclass(frozen=True)
class DenseBlock:
    """A sampled bipartite block with *implicit positional structure*
    (the ``dedup='none'`` fast path).

    The source feature rows are laid out ``[dst rows | sampled lanes]``
    with the lanes in LANE-MAJOR order: row ``i`` of the destination
    frontier keeps row ``i``; the sampled lane ``(i, j)`` (j-th sampled
    neighbor of dst row i) is source row ``F + j*F + i`` where
    ``F = size[1]`` — lane slot j of ALL dst rows is one contiguous
    ``[F, D]`` slice. Aggregation therefore needs no edge list, no
    scatter and no relayout: sum the ``fanout`` aligned slices under
    ``mask`` columns (XLA streams this at HBM bandwidth; the dst-major
    ``[F, fanout, D]`` reshape measured 8x slower on a v5e because the
    fanout axis pads to the sublane tile).

    Equivalent information to ``Adj`` (edge_index is implied), at zero
    reindex cost; duplicate global ids simply occupy multiple rows.
    """

    mask: jnp.ndarray        # [F, fanout] bool — lane validity
    e_id: jnp.ndarray        # [F, fanout] int32 CSR slot per lane
    dst_count: jnp.ndarray   # scalar int32 — valid dst rows
    size: Tuple[int, int]    # static (src_rows = F*(1+fanout), dst_rows = F)
    fanout: int              # static k

    @property
    def edge_index(self):
        """Materialize the implied COO edges (src local, dst local),
        edge order (i, j) dst-major; lane (i, j) lives at source row
        F + j*F + i (lane-major layout)."""
        F, k = self.mask.shape
        e = jnp.arange(F * k, dtype=jnp.int32)
        i, j = e // k, e % k
        src = F + j * F + i
        return jnp.stack([src, i])


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("n_id", "n_count", "seed_count", "adjs"),
                   meta_fields=("batch_size",))
@dataclasses.dataclass(frozen=True)
class SampledBatch:
    n_id: jnp.ndarray         # [C_final] int32 global ids, seeds first
    n_count: jnp.ndarray      # scalar int32: number of valid n_id entries
    batch_size: int           # static padded seed-slot count
    seed_count: jnp.ndarray   # scalar int32: number of valid seeds
    adjs: Tuple[Adj, ...]     # outermost layer first (reversed, PyG order)

    def at_batch(self, i):
        """View one batch of a stacked :meth:`NeighborSampler.sample_many`
        result (array leaves carry a leading [n_batches] axis there)."""
        return jax.tree.map(lambda x: x[i], self)


def _layer_capacities(batch_size: int, sizes: Sequence[int],
                      capacities: Optional[Sequence[int]]) -> Tuple[int, ...]:
    """Worst-case unique-node capacity per layer: F_{l+1} = F_l * (1 + k_l)."""
    caps = []
    f = batch_size
    for li, k in enumerate(sizes):
        worst = f * (1 + k)
        c = worst if capacities is None else min(int(capacities[li]), worst)
        caps.append(c)
        f = c
    return tuple(caps)


@functools.partial(
    jax.jit,
    static_argnames=("sizes", "batch_size", "weighted", "window"),
)
def _sample_layers_dense(indptr, indices, edge_table, seeds, seed_count, key, *,
                         sizes, batch_size, weighted, window=False):
    """Jitted multi-layer sampling with NO dedup (the TPU-native fast path).

    Local ids are positional: the frontier at hop l+1 is
    ``[frontier_l | sampled lanes]``, so a lane (i, j) becomes row
    ``F_l + i*k + j`` of the next frontier and no reindex is needed.
    Duplicate global ids occupy multiple rows — mathematically identical
    model output for ~2-3x duplicated feature-gather traffic, in exchange
    for removing the dedup sorts entirely (40ms -> 0.15ms per batch on a
    products-scale graph). See DenseBlock for the aggregation contract.
    """
    frontier = jnp.full((batch_size,), 0, jnp.int32)
    frontier = jax.lax.dynamic_update_slice(frontier,
                                            seeds.astype(jnp.int32), (0,))
    f_valid = jnp.arange(batch_size, dtype=jnp.int32) < seed_count
    layer_outs = []
    for k in sizes:
        key, sub = jax.random.split(key)
        if weighted:
            nbr, mask, slot = weighted_sample_alias(
                indptr, indices, edge_table, frontier, f_valid, k, sub)
        elif window:
            meta, ind2d = indices
            nbr, mask, slot = sample_adjacency_window(
                meta, ind2d, frontier, f_valid, k, sub, k_max=max(sizes))
        else:
            nbr, mask, slot = _sample_exact(
                indptr, indices, frontier, f_valid, k, sub)
        layer_outs.append((mask, slot, jnp.sum(f_valid).astype(jnp.int32)))
        # lane-MAJOR flatten: lane (i, j) -> row F + j*F + i. Keeping each
        # lane slot j contiguous over all dst rows lets aggregation read
        # [F, D] slices at stream bandwidth (measured 905 GB/s bf16 vs
        # 110 GB/s for the dst-major [F, k, D] reshape on a v5e).
        frontier = jnp.concatenate(
            [frontier, jnp.where(mask, nbr, 0).T.reshape(-1)])
        f_valid = jnp.concatenate([f_valid, mask.T.reshape(-1)])
    return frontier, f_valid, layer_outs


@functools.partial(
    jax.jit,
    static_argnames=("sizes", "batch_size"),
)
def _sample_layers_packed(packed2d, seed_meta, seeds, seed_count, key, *,
                          sizes, batch_size):
    """Dense positional sampling over the packed triple layout: after the
    one seed-meta lookup, every hop is self-describing (lanes carry the
    next hop's row start + degree) — two narrow block gathers per row
    and nothing else."""
    V = seed_meta.shape[0]
    sid = jnp.clip(seeds.astype(jnp.int32), 0, V - 1)
    meta = jnp.take(seed_meta, sid, axis=0)             # [bs, 2]
    frontier3 = jnp.concatenate([sid[:, None], meta], 1)
    f_valid = jnp.arange(batch_size, dtype=jnp.int32) < seed_count
    frontier3 = jnp.where(f_valid[:, None], frontier3, 0)
    layer_outs = []
    for k in sizes:
        key, sub = jax.random.split(key)
        nbr3, mask, slot = sample_adjacency_packed(
            packed2d, frontier3, f_valid, k, sub)
        layer_outs.append((mask, slot, jnp.sum(f_valid).astype(jnp.int32)))
        # lane-major flatten (see _sample_layers_dense)
        frontier3 = jnp.concatenate(
            [frontier3, nbr3.transpose(1, 0, 2).reshape(-1, 3)])
        f_valid = jnp.concatenate([f_valid, mask.T.reshape(-1)])
    return frontier3[:, 0], f_valid, layer_outs


@functools.partial(
    jax.jit,
    static_argnames=("sizes", "caps", "batch_size", "weighted", "window",
                     "reindex", "num_nodes", "big_caps", "fused"),
)
def _sample_layers(indptr, indices, edge_table, seeds, seed_count, key, *,
                   sizes, caps, batch_size, weighted, window=False,
                   reindex=None, num_nodes=0, big_caps=None, fused=False):
    """Jitted multi-layer sample + union/reindex. All shapes static.

    ``reindex``: per-layer tuple of "sort" (3-sort fused compaction) or
    "dense" (O(V) scatter table, ops/unique.py union_reindex_dense —
    needs ``num_nodes``); None means "sort" everywhere.
    """
    frontier = jnp.full((batch_size,), SENTINEL, jnp.int32)
    frontier = jax.lax.dynamic_update_slice(frontier, seeds.astype(jnp.int32), (0,))
    f_count = seed_count.astype(jnp.int32)
    f_cap = batch_size

    layer_outs = []
    for li, k in enumerate(sizes):
        key, sub = jax.random.split(key)
        f_valid = jnp.arange(f_cap, dtype=jnp.int32) < f_count
        if weighted:
            nbr, mask, slot = weighted_sample_alias(
                indptr, indices, edge_table, frontier, f_valid, k, sub)
        elif window:
            meta, ind2d = indices
            nbr, mask, slot = sample_adjacency_window(
                meta, ind2d, frontier, f_valid, k, sub, k_max=max(sizes))
        else:
            nbr, mask, slot = _sample_exact(
                indptr, indices, frontier, f_valid, k, sub,
                big_cap=big_caps[li] if big_caps else 0, fused=fused)

        cap = caps[li]
        if reindex is not None and reindex[li] == "dense":
            out_ids, out_count, cand_local, cand_ok = union_reindex_dense(
                frontier, f_count, nbr.reshape(-1), mask.reshape(-1), cap,
                num_nodes)
        elif reindex is not None and reindex[li] == "sort2":
            # 2-sort variant: edges come out in sorted-id order (the
            # contract is a masked edge SET — order-free), saving the
            # scatter-back sort.
            (out_ids, out_count, src, dst, e_id,
             emask) = union_reindex_sorted_edges(
                frontier, f_count, nbr.reshape(-1), mask.reshape(-1),
                slot.reshape(-1), k, cap)
            layer_outs.append((
                jnp.stack([src, dst]),
                e_id,
                emask,
                jnp.stack([out_count, f_count]),
            ))
            frontier, f_count, f_cap = out_ids, out_count, cap
            continue
        else:
            out_ids, out_count, cand_local, cand_ok = union_reindex_fused(
                frontier, f_count, nbr.reshape(-1), mask.reshape(-1), cap)

        # Edges: target local id = frontier slot (base ids keep 0..F-1),
        # source local id = candidate's assigned local id.
        dst = jnp.repeat(jnp.arange(f_cap, dtype=jnp.int32), k)
        src = cand_local.astype(jnp.int32)
        emask = cand_ok
        layer_outs.append((
            jnp.stack([src, dst]),
            slot.reshape(-1),
            emask,
            jnp.stack([out_count, f_count]),
        ))
        frontier, f_count, f_cap = out_ids, out_count, cap

    return frontier, f_count, layer_outs


_RUNNER_CACHE = {}


def _batched_runner(fn, method, **static_kw):
    """Cached jitted program running per-batch sampling ``fn`` over
    stacked seed batches (used by :meth:`NeighborSampler.sample_many`).

    ``fn(*tables, seeds_row, seed_count, key, **static_kw)`` is one of
    the jitted ``_sample_layers*`` entry points. ``method``:

      "scan"  one ``lax.scan`` — batches execute sequentially,
              constant memory;
      "vmap"  one vmapped program — all batches' gathers schedule
              together, amortizing per-dispatch overhead (the
              throughput mode of the stream-pool analogue).
    """
    key_id = (fn, method, tuple(sorted(static_kw.items())))
    run = _RUNNER_CACHE.get(key_id)
    if run is None:
        inner = functools.partial(fn, **static_kw)
        if method == "vmap":
            @jax.jit
            def run(tables, seeds2d, seed_count, keys):
                return jax.vmap(
                    lambda s, k: inner(*tables, s, seed_count, k),
                    in_axes=(0, 0))(seeds2d, keys)
        else:
            @jax.jit
            def run(tables, seeds2d, seed_count, keys):
                def body(_, x):
                    s, k = x
                    return None, inner(*tables, s, seed_count, k)
                _, outs = jax.lax.scan(body, None, (seeds2d, keys))
                return outs
        _RUNNER_CACHE[key_id] = run
    return run


class NeighborSampler:
    """Fanout-limited layered sampler over a CSR graph.

    Args:
      csr_topo: a ``quiver_tpu.CSRTopo`` (host-resident).
      sizes: per-layer fanouts, e.g. ``[25, 10]``. Same ordering contract
        as the reference: iterate in order, return blocks reversed.
      device: optional ``jax.Device`` to pin CSR buffers to.
      mode: ``"TPU"`` (device HBM, jitted) or ``"CPU"`` (numpy oracle).
      capacities: optional per-layer unique-node caps (overflow edges are
        masked out); defaults to the exact worst case.
      weighted: sample proportionally to ``csr_topo.edge_weight``
        (with replacement, parity with reference weight_sample).
      seed: PRNG seed.
      block_lanes: width of the block-exact layout used by the
        per-hop-dedup exact path (None = auto by memory budget, 0 =
        disable and use the (start, deg) meta table).
      big_caps: per-layer capacities for block-exact's scattered hub
        fallback (None = auto: full at layer 0, 0.2x frontier deeper).
    """

    # Auto block-exact layout: largest lane count whose [V, lanes] int32
    # table stays under this budget (the graph analogue of the reference
    # always keeping indptr in HBM, quiver_sample.cu:361-461).
    _BLOCK_BYTES_LIMIT = 2 << 30

    def __init__(self, csr_topo, sizes: Sequence[int], device=None,
                 mode: str = "TPU", capacities: Optional[Sequence[int]] = None,
                 weighted: bool = False, seed: int = 0,
                 dedup: str = "none", sampling: Optional[str] = None,
                 reindex: str = "auto", block_lanes: Optional[int] = None,
                 big_caps: Optional[Sequence[int]] = None,
                 fused: Optional[bool] = None):
        import os
        mode = mode.upper()
        if mode not in ("TPU", "CPU", "HBM", "GPU", "UVA"):
            raise ValueError(f"unknown mode {mode!r}")
        if dedup not in ("none", "per_hop"):
            raise ValueError(f"dedup must be 'none' or 'per_hop', got {dedup!r}")
        if sampling is None:
            # default: window (fast, uniform-over-shuffles marginals) for
            # the dense pipeline; exact uniform k-subsets for the
            # reference-contract per-hop-dedup pipeline.
            sampling = "window" if dedup == "none" else "exact"
        if sampling not in ("window", "exact", "packed"):
            raise ValueError("sampling must be 'window', 'exact' or "
                             f"'packed', got {sampling!r}")
        if reindex not in ("auto", "sort", "sort2", "dense"):
            raise ValueError("reindex must be 'auto', 'sort', 'sort2' or "
                             f"'dense', got {reindex!r}")
        # GPU/UVA accepted as aliases for migration friendliness.
        self.mode = "CPU" if mode == "CPU" else "TPU"
        self.dedup = dedup
        self.reindex = reindex
        self.csr_topo = csr_topo
        self.sizes = tuple(int(s) for s in sizes)
        self.capacities = None if capacities is None else tuple(capacities)
        self.big_caps = None if big_caps is None else tuple(
            int(c) for c in big_caps)
        self.weighted = bool(weighted)
        # window/packed sampling needs pre-shuffled rows; weighted
        # sampling draws by edge weight so a contiguous window would bias
        # it -> exact. The packed triple layout carries positional state
        # incompatible with the per-hop reindex -> plain window there.
        if weighted:
            sampling = "exact"
        elif dedup == "per_hop" and sampling == "packed":
            sampling = "window"
        self.sampling = sampling
        # Fused Pallas block sampler (pallas_sampler.py): one kernel
        # owns fetch+draw+select per hop — measured 63.6M vs 42.5M SEPS
        # for the staged XLA ops on the products-scale strict bench.
        # Default ON where it applies (real TPU, per-hop-dedup block
        # layout); QUIVER_TPU_FUSED_SAMPLER=0/1 overrides, and the
        # staged path serves non-TPU backends (compiled Mosaic only).
        env = os.environ.get("QUIVER_TPU_FUSED_SAMPLER")
        if fused is not None:
            self._fused = bool(fused)
        elif env is not None:
            self._fused = env == "1"
        else:
            self._fused = dedup == "per_hop" and self._on_tpu()
        self.device = device
        self._key = jax.random.PRNGKey(seed)
        self._rng = np.random.default_rng(seed)

        if self.weighted and csr_topo.edge_weight is None:
            raise ValueError("weighted sampling requires csr_topo.edge_weight")

        if self.mode == "TPU":
            if csr_topo.edge_count >= 2**31:
                raise ValueError(
                    f"graph has {csr_topo.edge_count} edges; single-chip "
                    "CSR slots are int32 (< 2^31). Partition across hosts "
                    "with quiver_tpu.parallel.DistNeighborSampler (each "
                    "shard's local edge count must stay below 2^31).")
            put = functools.partial(jax.device_put, device=device)
            self.indptr = put(jnp.asarray(csr_topo.indptr, jnp.int32))
            self.shuffle_eid = None
            if self.sampling == "window":
                # Device-side shuffle: upload the original flat indices
                # once, then every (re)shuffle is a segmented sort on
                # device (kernels.device_shuffle_window) — no host work
                # and no layout re-upload at epoch boundaries.
                self._flat_base = _chunked_put(
                    np.asarray(csr_topo.indices, np.int32), device)
                self._key, sub = jax.random.split(self._key)
                ind2d, self.shuffle_eid = device_shuffle_window(
                    self.indptr, self._flat_base, sub,
                    k_max=max(self.sizes))
                # the (meta, ind2d) pair plays the role of `indices`
                self.indices = (put(jnp.asarray(
                    window_meta(csr_topo.indptr))), ind2d)
            elif self.sampling == "packed":
                shuffled, self.shuffle_eid = self._shuffled_indices(
                    csr_topo, seed)
                packed2d, seed_meta = build_packed_layout(
                    csr_topo.indptr, shuffled)
                self.indices = (put(jnp.asarray(packed2d)),
                                put(jnp.asarray(seed_meta)))
            elif self.weighted:
                self.indices = put(jnp.asarray(csr_topo.indices, jnp.int32))
            else:
                # exact mode. Per-hop-dedup pipelines get the block-exact
                # layout (header + neighbor prefix in one row gather;
                # kernels.py build_block_layout) when a [V, lanes] table
                # fits the budget; otherwise — and for the dense
                # positional pipeline, whose lane-structured frontiers
                # would overflow any big-row capacity — the (start, deg)
                # meta table + flat indices (one row gather replaces two
                # indptr element gathers).
                W = self._pick_block_lanes(csr_topo, block_lanes)
                if dedup == "per_hop" and W:
                    blk = build_block_layout(csr_topo.indptr,
                                             csr_topo.indices, W)
                    self.indices = (_chunked_put(blk, device),
                                    put(jnp.asarray(csr_topo.indices,
                                                    jnp.int32)))
                else:
                    self.indices = (
                        put(jnp.asarray(build_meta2(csr_topo.indptr))),
                        put(jnp.asarray(csr_topo.indices, jnp.int32)))
            if self.weighted:
                # packed per-row alias tables (prob bits | alias pos |
                # neighbor at slot | neighbor at alias): ONE 16-byte row
                # gather per draw; see weighted_sample_alias (kernels.py)
                packed = build_alias_table(csr_topo.indptr,
                                           csr_topo.edge_weight,
                                           csr_topo.indices)
                self.edge_table = put(jnp.asarray(packed))
            else:
                self.edge_table = put(jnp.zeros((1, 2), jnp.int32))
        else:
            from . import cpu_ref
            self._cpu = cpu_ref.CPUSampler(csr_topo, self.sizes,
                                           weighted=self.weighted, seed=seed,
                                           dedup=self.dedup)

    @staticmethod
    def _on_tpu() -> bool:
        d = jax.devices()[0]
        return ("tpu" in d.platform.lower()
                or "TPU" in str(getattr(d, "device_kind", "")))

    def _pick_block_lanes(self, csr_topo, block_lanes) -> int:
        """Resolve the block-exact layout width: explicit value, or the
        largest of 128/64/32 whose table fits _BLOCK_BYTES_LIMIT and
        still holds the largest fanout; 0 = meta-table fallback."""
        if block_lanes is not None:
            return int(block_lanes)
        V = csr_topo.node_count
        for W in (128, 64, 32):
            if V * W * 4 <= self._BLOCK_BYTES_LIMIT and W - 2 >= max(self.sizes):
                return W
        return 0

    def _resolve_big_caps(self, batch_size: int, caps) -> Tuple[int, ...]:
        """Per-layer scattered-fallback capacities for block-exact
        sampling. Layer 0's frontier is the user's seeds (could be all
        hubs) -> full capacity; deeper frontiers are *deduped* unique-node
        sets whose measured big fraction (deg > 126) on power-law graphs
        is 0.15-0.21 -> 0.2 of the frontier (measured on the products
        bench: zero overflow across 30 uniform-seed batches, and the
        smaller scattered-read budget lifts strict SEPS ~8%). Like the
        reindex capacities: overflow rows' lanes are masked, never wrong,
        and ``big_caps`` overrides the default for hub-heavy seed sets.
        """
        if self.big_caps is not None:
            return self.big_caps
        out = []
        f_cap = batch_size
        for li in range(len(self.sizes)):
            if li == 0:
                out.append(f_cap)
            else:
                out.append(min(f_cap, max(256, -(-int(0.2 * f_cap) // 256) * 256)))
            f_cap = caps[li]
        return tuple(out)

    def reshuffle(self, seed: int = None) -> None:
        """Re-permute every row's neighbor order (window/packed sampling).
        Call between epochs to refresh the window family. Window mode
        reshuffles ON DEVICE (segmented sort, ~0.3 s at products scale);
        the packed layout needs its host builder."""
        if self.sampling not in ("window", "packed"):
            return
        if self.sampling == "window":
            if seed is None:
                self._key, sub = jax.random.split(self._key)
            else:
                sub = jax.random.PRNGKey(seed)
            ind2d, self.shuffle_eid = device_shuffle_window(
                self.indptr, self._flat_base, sub, k_max=max(self.sizes))
            self.indices = (self.indices[0], ind2d)
            return
        if seed is None:
            seed = int(self._rng.integers(2**31))
        shuffled, self.shuffle_eid = self._shuffled_indices(
            self.csr_topo, seed)
        put = functools.partial(jax.device_put, device=self.device)
        packed2d, seed_meta = build_packed_layout(
            self.csr_topo.indptr, shuffled)
        self.indices = (put(jnp.asarray(packed2d)),
                        put(jnp.asarray(seed_meta)))

    @staticmethod
    def _shuffled_indices(csr_topo, seed):
        """Per-row random permutation of the adjacency (window sampling).

        Returns (shuffled indices int32, slot->original-slot map or None).
        Uses the threaded native shuffle when available.
        """
        from .. import native

        indices = np.array(csr_topo.indices, np.int32)  # private copy
        perm = np.arange(indices.shape[0], dtype=np.int64)
        if native.available():
            native.shuffle_rows(np.asarray(csr_topo.indptr, np.int64),
                                indices, perm, seed=seed)
        else:
            rng = np.random.default_rng(seed)
            indptr = np.asarray(csr_topo.indptr)
            for v in range(indptr.shape[0] - 1):
                s, e = indptr[v], indptr[v + 1]
                p = rng.permutation(e - s)
                indices[s:e] = indices[s:e][p]
                perm[s:e] = perm[s:e][p]
        return indices, perm

    # -- shape bucketing: pad the seed batch to limit recompiles ---------
    @staticmethod
    def _bucket(n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return b

    def _reindex_plan(self, batch_size: int, caps) -> Tuple[str, ...]:
        """Per-layer compaction strategy for the per-hop-dedup path.

        "auto" resolves to the 2-sort sorted-edge-order path ("sort2",
        ops/unique.py union_reindex_sorted_edges) everywhere: measured on
        the v5e (products-scale, [15,10,5] b1024) it runs the strict
        pipeline at 24.9M SEPS vs 23.5M for the 3-sort lane-order path
        ("sort") and 8.1M for the O(V) dense table — V-length
        scatter/cumsum passes are far below sort throughput on this
        hardware (benchmarks/bench_strict.py). "sort" (lane-ordered
        edges) and "dense" stay available as explicit opt-ins.
        """
        if self.reindex != "auto":
            return tuple(self.reindex for _ in self.sizes)
        return tuple("sort2" for _ in self.sizes)

    def sample(self, seeds) -> SampledBatch:
        """Sample the k-hop neighborhood of ``seeds``.

        Returns a ``SampledBatch``; ``adjs`` are ordered outermost-first
        (reference sage_sampler.py:147 reverses the per-layer list).
        """
        if self.mode == "CPU":
            return self._cpu.sample(np.asarray(seeds))

        seeds = np.asarray(seeds)
        n = int(seeds.shape[0])
        bs = self._bucket(n)
        pad = np.zeros((bs,), np.int32)
        pad[:n] = seeds
        self._key, sub = jax.random.split(self._key)
        caps = _layer_capacities(bs, self.sizes, self.capacities)

        if self.dedup == "none":
            if self.sampling == "packed":
                packed2d, seed_meta = self.indices
                frontier, f_valid, layer_outs = _sample_layers_packed(
                    packed2d, seed_meta, jnp.asarray(pad), jnp.int32(n),
                    sub, sizes=self.sizes, batch_size=bs)
            else:
                frontier, f_valid, layer_outs = _sample_layers_dense(
                    self.indptr, self.indices, self.edge_table,
                    jnp.asarray(pad), jnp.int32(n), sub,
                    sizes=self.sizes, batch_size=bs, weighted=self.weighted,
                    window=self.sampling == "window")
            blocks = []
            f_cap = bs
            for li, (mask, slot, dst_count) in enumerate(layer_outs):
                k = self.sizes[li]
                blocks.append(DenseBlock(mask=mask, e_id=slot,
                                         dst_count=dst_count,
                                         size=(f_cap * (1 + k), f_cap),
                                         fanout=k))
                f_cap = f_cap * (1 + k)
            # Dense mode: every row of n_id is gatherable (masked lanes are
            # clamped to id 0); per-lane validity lives in block masks.
            return SampledBatch(n_id=frontier,
                                n_count=jnp.int32(frontier.shape[0]),
                                batch_size=bs, seed_count=jnp.int32(n),
                                adjs=tuple(reversed(blocks)))

        frontier, f_count, layer_outs = _sample_layers(
            self.indptr, self.indices, self.edge_table,
            jnp.asarray(pad), jnp.int32(n), sub,
            sizes=self.sizes, caps=caps, batch_size=bs,
            weighted=self.weighted, window=self.sampling == "window",
            reindex=self._reindex_plan(bs, caps),
            num_nodes=self.csr_topo.node_count,
            big_caps=self._resolve_big_caps(bs, caps),
            fused=self._fused)

        adjs = []
        f_cap = bs
        for li, (edge_index, e_id, mask, counts) in enumerate(layer_outs):
            adjs.append(Adj(edge_index=edge_index, e_id=e_id, mask=mask,
                            size=(caps[li], f_cap), counts=counts))
            f_cap = caps[li]
        return SampledBatch(n_id=frontier, n_count=f_count,
                            batch_size=bs, seed_count=jnp.int32(n),
                            adjs=tuple(reversed(adjs)))

    def sample_many(self, seeds2d, method: str = "scan") -> SampledBatch:
        """Sample ``n`` seed batches in ONE device dispatch.

        ``seeds2d``: [n_batches, batch] seed node ids (rows are
        independent mini-batches of equal width). Returns a
        ``SampledBatch`` whose array leaves carry a leading
        ``[n_batches]`` axis; use :meth:`SampledBatch.at_batch` to view
        one batch.

        The analogue of the reference keeping a 4-deep stream pool
        (quiver_sample.cu:84-88). Two compilations of the same contract:

        ``method="scan"`` (default): a ``lax.scan`` over batches —
        smallest program, constant memory, use when dispatch *count*
        matters but batches should still execute one-at-a-time (e.g.
        interleaving with a training step). Scan iterations serialize,
        so repeated ``sample()`` calls through the async dispatch queue
        can beat it (198.8M vs 146.8M SEPS dense at products scale, r2).

        ``method="vmap"`` (dense pipeline only): ONE vmapped program
        samples all batches as parallel work — the per-dispatch overhead
        (host RPC + program launch, ~2.3 ms/batch on a remote-attached
        chip) amortizes over the group, and XLA schedules the batches'
        gathers together. Measured on the products-scale dense bench:
        207.7M SEPS at group 8 vs 175.8M per-call median (r5 flatten
        ablation artifact). This is the throughput configuration for
        pumping a continuous stream of batches.
        """
        if method not in ("scan", "vmap"):
            raise ValueError(f"method must be 'scan' or 'vmap', "
                             f"got {method!r}")
        if self.mode == "CPU":
            outs = [self._cpu.sample(np.asarray(s)) for s in seeds2d]
            return jax.tree.map(lambda *xs: np.stack(xs), *outs)

        if method == "vmap" and self.dedup != "none":
            # validate BEFORE the key split so a rejected call leaves
            # the sampler's RNG stream untouched (seed reproducibility)
            raise ValueError("sample_many(method='vmap') supports the "
                             "dense (dedup='none') pipeline; use 'scan' "
                             "for per-hop-dedup batches")
        seeds2d = np.asarray(seeds2d)
        n_b, n = seeds2d.shape
        bs = self._bucket(n)
        pad = np.zeros((n_b, bs), np.int32)
        pad[:, :n] = seeds2d
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, n_b)
        caps = _layer_capacities(bs, self.sizes, self.capacities)

        if self.dedup == "none":
            if self.sampling == "packed":
                packed2d, seed_meta = self.indices
                run = _batched_runner(_sample_layers_packed, method,
                                      sizes=self.sizes, batch_size=bs)
                frontier, f_valid, layer_outs = run(
                    (packed2d, seed_meta), jnp.asarray(pad),
                    jnp.int32(n), keys)
            else:
                run = _batched_runner(
                    _sample_layers_dense, method, sizes=self.sizes,
                    batch_size=bs, weighted=self.weighted,
                    window=self.sampling == "window")
                frontier, f_valid, layer_outs = run(
                    (self.indptr, self.indices, self.edge_table),
                    jnp.asarray(pad), jnp.int32(n), keys)
            blocks = []
            f_cap = bs
            for li, (mask, slot, dst_count) in enumerate(layer_outs):
                k = self.sizes[li]
                blocks.append(DenseBlock(mask=mask, e_id=slot,
                                         dst_count=dst_count,
                                         size=(f_cap * (1 + k), f_cap),
                                         fanout=k))
                f_cap = f_cap * (1 + k)
            return SampledBatch(
                n_id=frontier,
                n_count=jnp.full((n_b,), frontier.shape[-1], jnp.int32),
                batch_size=bs,
                seed_count=jnp.full((n_b,), n, jnp.int32),
                adjs=tuple(reversed(blocks)))

        run = _batched_runner(
            _sample_layers, "scan",
            sizes=self.sizes, caps=caps, batch_size=bs,
            weighted=self.weighted, window=self.sampling == "window",
            reindex=self._reindex_plan(bs, caps),
            num_nodes=self.csr_topo.node_count,
            big_caps=self._resolve_big_caps(bs, caps),
            fused=self._fused)
        frontier, f_count, layer_outs = run(
            (self.indptr, self.indices, self.edge_table),
            jnp.asarray(pad), jnp.int32(n), keys)
        adjs = []
        f_cap = bs
        for li, (edge_index, e_id, mask, counts) in enumerate(layer_outs):
            adjs.append(Adj(edge_index=edge_index, e_id=e_id, mask=mask,
                            size=(caps[li], f_cap), counts=counts))
            f_cap = caps[li]
        return SampledBatch(n_id=frontier, n_count=f_count,
                            batch_size=bs,
                            seed_count=jnp.full((n_b,), n, jnp.int32),
                            adjs=tuple(reversed(adjs)))

    @property
    def row_cdf(self):
        """Deprecated round-1 name for :attr:`edge_table` (which holds the
        packed alias table, not a CDF)."""
        return self.edge_table

    # -- IPC parity shims (reference sage_sampler.py:159-178): one process
    # drives all local chips on TPU, so handles are just self.
    def share_ipc(self):
        return self

    @classmethod
    def lazy_from_ipc_handle(cls, handle):
        return handle

    def sample_prob(self, train_idx, total_node_count: int) -> jnp.ndarray:
        """Multi-hop access probability per node (reference sample_prob,
        sage_sampler.py:149-157 -> cal_neighbor_prob quiver_sample.cu:100)."""
        p = jnp.zeros((total_node_count,), jnp.float32)
        p = p.at[jnp.asarray(np.asarray(train_idx))].set(1.0)
        indptr = jnp.asarray(self.csr_topo.indptr, jnp.int32)
        indices = jnp.asarray(self.csr_topo.indices, jnp.int32)
        for k in self.sizes:
            p = cal_next_prob(indptr, indices, p, k)
        return p
