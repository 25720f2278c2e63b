"""Tiered feature store: HBM hot cache + host cold tier + mmap disk tier.

TPU-native rebuild of the reference's ``Feature``/``ShardTensor`` stack
(srcs/python/quiver/feature.py:17-459, shard_tensor.py:51-213,
quiver_feature.cu:57-376). The CUDA original tiers rows across
local-HBM / peer-HBM (NVLink p2p) / pinned-CPU and gathers through all
three with one kernel; on TPU the tiers map to:

  * hot rows   -> device HBM ``jnp`` array; under a mesh, either
                  replicated per chip (``device_replicate``) or
                  row-sharded across chips (``p2p_clique_replicate`` —
                  ICI plays the role of NVLink);
  * cold rows  -> host numpy (pinned-CPU analogue), fetched per batch
                  and overlapped with device work;
  * disk rows  -> numpy mmap (``from_mmap``/``set_mmap_file`` parity).

Row placement is degree- or access-probability-ordered exactly like the
reference (``reindex_feature`` utils.py:229-247): ids are translated
through ``feature_order`` at lookup time.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .utils import CSRTopo, parse_size, reindex_feature

__all__ = ["DeviceConfig", "Feature", "PartitionInfo", "DistFeature"]


@dataclasses.dataclass
class DeviceConfig:
    """Parity shim for reference feature.py:11-14."""
    device_memory_budget: list
    host_memory_budget: Optional[int] = None


@jax.jit
def _take_clipped(hot, pos):
    """Device hot-tier gather; out-of-tier rows clamp to row 0 and are
    overwritten by the cold scatter."""
    return jnp.take(hot, pos, axis=0, mode="clip")


@functools.lru_cache(maxsize=16)
def _make_sharded_gather(mesh, axis: str):
    """Owner-gather over the row-sharded hot tier (p2p_clique_replicate):
    each device serves the requested positions it owns from its local
    [S, D] shard and ONE psum combines the partial results — the
    standard sharded-embedding-lookup pattern. Wire cost per device is
    ~2 (H-1)/H * m * D bytes (ring all-reduce of the [m, D] result),
    independent of the hot-tier size; the naive ``jnp.take`` on the
    sharded array lets XLA all-gather the FULL hot table (S * H * D
    bytes) per lookup. The reference's NVLink-clique analogue: its
    gather kernel reads only the requested rows through p2p pointers
    (shard_tensor.cu.hpp:19-61), never the whole peer shard."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def body(hot, pos):
        S = hot.shape[0]                   # local shard rows
        d = jax.lax.axis_index(axis)
        local = pos - d * S
        mine = (local >= 0) & (local < S)
        rows = jnp.take(hot, jnp.clip(local, 0, S - 1), axis=0)
        rows = rows * mine[:, None].astype(rows.dtype)
        return jax.lax.psum(rows, axis)

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
        check_vma=False))


@jax.jit
def _scatter_cold(out, cold_pos, cold_vals):
    """Overwrite miss rows with host-gathered values (padded lanes carry
    an out-of-range position and are dropped)."""
    return out.at[cold_pos].set(cold_vals.astype(out.dtype), mode="drop")


class Feature:
    """User-facing feature cache (reference Feature, feature.py:17).

    Args:
      rank: device index this handle serves (parity arg; one process
        drives all local chips on TPU).
      device_list: devices participating in the cache group.
      device_cache_size: e.g. ``"4G"`` — per-device hot-tier budget.
      cache_policy: ``device_replicate`` (hot set copied per chip) or
        ``p2p_clique_replicate`` (hot set row-sharded over the mesh —
        the NVLink-clique analogue, striped over ICI).
      csr_topo: when given, rows are reordered by degree so the hot
        prefix holds the hottest nodes (reference feature.py:194-281).
    """

    def __init__(self, rank=0, device_list=None, device_cache_size=0,
                 cache_policy="device_replicate", csr_topo: CSRTopo = None,
                 mesh=None, cold_transfer_dtype=None):
        if cache_policy not in ("device_replicate", "p2p_clique_replicate"):
            raise ValueError(f"unknown cache_policy {cache_policy!r}")
        # Optional narrow dtype (e.g. np.float16 / ml_dtypes.bfloat16)
        # for the host->device hop of cold-miss rows: halves the
        # bandwidth-critical transfer, the analogue of the reference's
        # fp16 ShardTensor storage (quiver_feature.cu:263-267). Values
        # are widened back to the table dtype on device.
        self.cold_transfer_dtype = cold_transfer_dtype
        self.rank = rank
        self.device_list = device_list or []
        self.device_cache_size = device_cache_size
        self.cache_policy = cache_policy
        self.csr_topo = csr_topo
        self.mesh = mesh

        self.feature_order = None       # old id -> cache position
        self.hot = None                 # [H, D] device array
        self.cold = None                # [V-H, D] host numpy
        self.hot_rows = 0
        self.shape = None
        self.dtype = None
        # disk tier
        self.mmap_array = None
        self.disk_map = None            # old id -> mmap row, -1 if in memory
        # observability (reference prints LOG>>> hit ratios at build time;
        # we track live counters instead)
        self.stats = {"lookups": 0, "hot_hits": 0, "cold_hits": 0,
                      "disk_hits": 0}
        self._pf = None                 # (ids, future) of a prefetch
        self._pf_pool = None

    # -- construction -----------------------------------------------------
    def from_cpu_tensor(self, tensor, access_prob=None) -> "Feature":
        """Split a host array into [hot | cold] by the cache budget.

        Hot-row placement order: by ``access_prob`` when given (the
        reference's probability-driven cache order, partition.py
        cache_order artifacts), else by degree when a csr_topo is
        attached (reference from_cpu_tensor feature.py:194-281)."""
        tensor = np.asarray(tensor)
        V, D = tensor.shape
        self.shape = (V, D)
        self.dtype = tensor.dtype
        row_bytes = tensor.itemsize * D
        budget = parse_size(self.device_cache_size)
        if self.cache_policy == "p2p_clique_replicate" and self.mesh:
            budget *= self.mesh.devices.size
        hot_rows = min(V, budget // max(row_bytes, 1))

        if access_prob is not None:
            new2old = np.argsort(-np.asarray(access_prob), kind="stable")
            old2new = np.empty_like(new2old)
            old2new[new2old] = np.arange(V)
            tensor = tensor[new2old]
            self.feature_order = old2new
            if self.csr_topo is not None:
                self.csr_topo.feature_order = old2new
        elif self.csr_topo is not None:
            cache_ratio = hot_rows / max(V, 1)
            tensor, old2new, new2old = reindex_feature(
                self.csr_topo, tensor, cache_ratio)
            self.feature_order = old2new
            self.csr_topo.feature_order = old2new

        self.hot_rows = int(hot_rows)
        self.hot = self._place_hot(tensor[:hot_rows], D)
        self.cold = np.ascontiguousarray(tensor[hot_rows:])
        return self

    def _place_hot(self, hot_np, D):
        """Device placement of the hot tier: replicated, or row-sharded
        over the mesh under ``p2p_clique_replicate``."""
        if self.cache_policy == "p2p_clique_replicate" and self.mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = self.mesh.axis_names[0]
            pad = (-hot_np.shape[0]) % self.mesh.devices.size
            if pad:
                hot_np = np.concatenate(
                    [hot_np, np.zeros((pad, D), hot_np.dtype)])
            return jax.device_put(
                jnp.asarray(hot_np), NamedSharding(self.mesh, P(axis, None)))
        return jnp.asarray(np.asarray(hot_np))

    @classmethod
    def from_mmap(cls, path_or_array, device_config=None, **kw) -> "Feature":
        """Build from a numpy mmap WITHOUT materializing the table in host
        RAM (reference from_mmap feature.py:84-117 — its reason to exist
        is features larger than RAM): only the hot prefix is copied to
        the device; every other row is served straight from the memory
        map, paging in on access. The on-disk row order is used as the
        cache order (the reference's preprocess writes features sorted
        hot-first, benchmarks/ogbn-papers100M/preprocess.py:47-115), so
        no reorder pass is needed.
        """
        f = cls(**kw)
        arr = (np.load(path_or_array, mmap_mode="r")
               if isinstance(path_or_array, (str, bytes)) else path_or_array)
        if isinstance(arr, np.memmap):
            V, D = arr.shape
            f.shape = (V, D)
            f.dtype = arr.dtype
            budget = parse_size(f.device_cache_size)
            if f.cache_policy == "p2p_clique_replicate" and f.mesh:
                budget *= f.mesh.devices.size
            hot_rows = int(min(V, budget // max(arr.itemsize * D, 1)))
            f.hot_rows = hot_rows
            f.hot = f._place_hot(np.asarray(arr[:hot_rows]), D)
            f.cold = arr[hot_rows:]   # mmap view: the disk tier
        else:
            f.from_cpu_tensor(np.asarray(arr))
        return f

    def set_mmap_file(self, path, disk_map) -> None:
        """Attach a disk tier: rows with ``disk_map[id] >= 0`` resolve from
        the mmap file (reference set_mmap_file feature.py:96-107)."""
        self.mmap_array = np.load(path, mmap_mode="r")
        self.disk_map = np.asarray(disk_map)

    def set_local_order(self, local_order) -> None:
        """Partitioned layout: position i of the local tensor holds global
        id local_order[i] (reference set_local_order feature.py:283-294)."""
        V = self.shape[0]
        order = np.asarray(local_order)
        o2n = np.full(max(V, int(order.max()) + 1), -1, np.int64)
        o2n[order] = np.arange(order.shape[0])
        self.feature_order = o2n

    # -- lookup -----------------------------------------------------------
    @staticmethod
    def _bucket(n: int) -> int:
        return 1 << (n - 1).bit_length() if n > 1 else 1

    def prefetch(self, n_id) -> None:
        """Start the HOST-side work of a future ``self[n_id]`` on a
        background thread: the cold/disk numpy gather for batch i+1
        overlaps batch i's device compute (the stream-overlap the
        reference gets from CUDA async memcpy). ``__getitem__`` with the
        same ids consumes the result; different ids fall through to a
        normal lookup.

        Only the numpy phase runs in the background (the threaded native
        gather releases the GIL); every JAX dispatch — hot gather, H2D
        transfer, scatter — stays on the CALLING thread at consume time.
        Running those in the background (round-3 behavior) serialized
        against the main thread's dispatch lock and made prefetch
        SLOWER than direct (FEATURE_BENCH r3: 0.08 vs 0.13 GB/s)."""
        import concurrent.futures
        if self._pf_pool is None:
            self._pf_pool = concurrent.futures.ThreadPoolExecutor(1)
        self._drain_prefetch()
        key = np.asarray(n_id)
        self._pf = (key, self._pf_pool.submit(self._host_phase, key))

    def _drain_prefetch(self):
        """Retire an in-flight prefetch whose result won't be used. The
        single-worker pool usually starts the task immediately, so
        cancel() fails and we must WAIT for it — otherwise the background
        _lookup races the foreground one on ``self.stats``."""
        if self._pf is None:
            return
        _, fut = self._pf
        self._pf = None
        if not fut.cancel():
            try:
                fut.result()
            except Exception:
                pass

    def __getitem__(self, n_id):
        if self._pf is not None:
            key, fut = self._pf
            if np.array_equal(key, np.asarray(n_id)):
                self._pf = None
                return self._device_phase(fut.result())
            self._drain_prefetch()
        return self._lookup(n_id)

    def _lookup(self, n_id):
        """Gather rows by *global* node id: hot tier on device, cold tier
        from host RAM, optional disk tier from mmap (reference
        __getitem__ feature.py:296-333 / the single multi-tier kernel
        shard_tensor.cu.hpp:19-61).

        Device-resident flow — the result never round-trips through the
        host: the hot gather is dispatched first (the TPU works on it
        asynchronously), the threaded native cold/disk gather runs on the
        host meanwhile, and one scatter overwrites the miss rows on
        device. Host->device traffic is the miss rows only.
        """
        return self._device_phase(self._host_phase(n_id))

    def _host_phase(self, n_id):
        """Pure-numpy phase (background-thread safe, no JAX dispatch):
        id translation, tier split, the native cold/disk gather, and the
        padded miss buffers. Returns the tuple ``_device_phase`` turns
        into a device array."""
        ids = np.asarray(n_id).astype(np.int64)
        m = ids.shape[0]
        # Stats are accumulated into a local delta and applied at
        # CONSUME time (_device_phase) — _host_phase may run on the
        # prefetch thread, and a prefetch later discarded by
        # _drain_prefetch must not inflate cache_hit_rate.
        delta = {"lookups": m, "hot_hits": 0, "cold_hits": 0,
                 "disk_hits": 0}

        # Samplers pad n_id with SENTINEL (and dispatch masks use -1);
        # route padding to row 0 (a hot row) BEFORE any table indexing so
        # feature_order/disk_map never see an out-of-range id and pad rows
        # cost no host traffic. Padded rows are masked downstream.
        V = self.shape[0]
        ids = np.where((ids >= 0) & (ids < V), ids, 0)

        pos = ids if self.feature_order is None else self.feature_order[ids]
        pos = np.clip(pos, 0, V - 1)

        on_disk = None
        if self.disk_map is not None:
            dpos = self.disk_map[ids]
            on_disk = dpos >= 0
            if not on_disk.any():
                on_disk = None

        in_hot = pos < self.hot_rows
        if on_disk is not None:
            in_hot &= ~on_disk
        n_cold = m - int(in_hot.sum())
        delta["hot_hits"] += m - n_cold
        delta["cold_hits"] += n_cold

        hot_idx = np.minimum(pos, max(self.hot_rows - 1, 0)).astype(np.int32)
        if n_cold == 0:
            return (m, hot_idx, None, None, delta)

        from . import native
        miss = ~in_hot
        miss_pos = np.nonzero(miss)[0]
        if on_disk is not None:
            disk_sel = on_disk[miss]
            cold_vals = np.empty((n_cold, self.shape[1]), self.dtype)
            if (~disk_sel).any():
                cidx = np.clip(pos[miss][~disk_sel] - self.hot_rows, 0,
                               max(len(self.cold) - 1, 0))
                cold_vals[~disk_sel] = native.gather_rows(self.cold, cidx)
            didx = self.disk_map[ids[miss][disk_sel]]
            delta["disk_hits"] += int(disk_sel.sum())
            delta["cold_hits"] -= int(disk_sel.sum())
            cold_vals[disk_sel] = native.gather_rows(self.mmap_array, didx)
        else:
            cidx = np.clip(pos[miss] - self.hot_rows, 0,
                           max(len(self.cold) - 1, 0))
            cold_vals = native.gather_rows(self.cold, cidx)

        # pad the miss set to a bucketed width (bounded recompiles);
        # padded lanes target row m -> dropped by the scatter.
        cap = self._bucket(n_cold)
        pad_pos = np.full(cap, m, np.int32)
        pad_pos[:n_cold] = miss_pos
        tdt = self.cold_transfer_dtype or cold_vals.dtype
        pad_vals = np.zeros((cap,) + cold_vals.shape[1:], tdt)
        pad_vals[:n_cold] = cold_vals.astype(tdt)
        return (m, hot_idx, pad_pos, pad_vals, delta)

    def _device_phase(self, host):
        """JAX phase (calling thread): dispatch the hot gather, ship the
        padded miss rows, scatter them over the device result. Stat
        deltas land here, on the consuming thread, so discarded
        prefetches never count and no two threads race ``self.stats``."""
        m, hot_idx, pad_pos, pad_vals, delta = host
        for k, v in delta.items():
            self.stats[k] += v
        if self.hot_rows > 0:
            if self.cache_policy == "p2p_clique_replicate" and self.mesh:
                gather = _make_sharded_gather(self.mesh,
                                              self.mesh.axis_names[0])
                out = gather(self.hot, jnp.asarray(hot_idx))
            else:
                out = _take_clipped(self.hot, jnp.asarray(hot_idx))
        else:
            out = jnp.zeros((m, self.shape[1]), self.dtype)
        if pad_pos is None:
            return out
        return _scatter_cold(out, jnp.asarray(pad_pos), jnp.asarray(pad_vals))

    def cache_hit_rate(self) -> float:
        lk = max(self.stats["lookups"], 1)
        return self.stats["hot_hits"] / lk

    @property
    def size(self):
        return self.shape

    def share_ipc(self):
        """Parity shim: one process drives all local chips on TPU, so
        there is nothing to share (reference share_ipc feature.py:383)."""
        return self

    @classmethod
    def lazy_from_ipc_handle(cls, handle):
        return handle


class PartitionInfo:
    """Global->host and global->local id maps for multi-host partitioned
    features (reference PartitionInfo feature.py:461-526)."""

    def __init__(self, device=None, host: int = 0, hosts: int = 1,
                 global2host=None, replicate=None):
        self.host = int(host)
        self.hosts = int(hosts)
        self.global2host = np.asarray(global2host)
        self.replicate = None if replicate is None else np.asarray(replicate)
        V = self.global2host.shape[0]

        owner = self.global2host.copy()
        if self.replicate is not None:
            owner[self.replicate] = self.host  # replicated ids resolve local
        self.owner = owner
        # local position of each global id within its owner's shard,
        # following the owner's id-sorted layout.
        self.global2local = np.zeros(V, np.int64)
        self.local_sizes = np.zeros(self.hosts, np.int64)
        for h in range(self.hosts):
            ids = np.where(self.global2host == h)[0]
            self.global2local[ids] = np.arange(ids.shape[0])
            self.local_sizes[h] = ids.shape[0]
        if self.replicate is not None:
            # replicated rows are appended after the owner's own rows
            base = self.local_sizes[self.host]
            rep = self.replicate
            self.global2local[rep] = base + np.arange(rep.shape[0])

    def dispatch(self, ids):
        """Split request ids per host (reference dispatch feature.py:510-526).

        Returns (ids_by_host: list of arrays, orders: list of arrays) where
        orders[h] gives the positions in ``ids`` served by host h.
        """
        ids = np.asarray(ids)
        hosts_of = self.owner[ids]
        ids_by_host, orders = [], []
        for h in range(self.hosts):
            sel = np.where(hosts_of == h)[0]
            ids_by_host.append(ids[sel])
            orders.append(sel)
        return ids_by_host, orders


class DistFeature:
    """Multi-host feature gather via all-to-all over the mesh.

    Replaces the reference's NcclComm size-matrix allreduce + greedy
    pairwise schedule + send/recv loops (comm.py:42-182,
    feature.py:529-567) with ONE ``all_to_all`` pair inside one
    ``shard_map``: requests out, answers back. The collective subsumes
    the whole HostRankTable / schedule machinery and rides ICI/DCN as
    laid out by the mesh, and — like the reference's concurrent
    exchange — every host resolves its own distinct request set
    simultaneously; received bytes per host ≈ its requested rows (padded
    to the max pairwise count), not H× them.

    In this single-process form, each mesh device plays the role of one
    host; ``local_tables`` is the per-device shard stack [hosts, rows, D]
    (pad shards to a common row count; under ``replicate`` layouts each
    host's replicated rows are appended to its own shard, reference
    feature.py:461-508).
    """

    def __init__(self, mesh, local_tables, info: PartitionInfo):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.info = info
        self.tables = jax.device_put(
            jnp.asarray(local_tables),
            NamedSharding(mesh, P(self.axis, None, None)))
        self._exchange_fn = None

    def _build_exchange(self):
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        axis = self.axis

        def body(tables, req):
            # tables: [1, rows, D] this host's shard; req: [1, H, cap]
            # local row ids this host wants from each destination.
            mine, my_req = tables[0], req[0]
            # requests out: row d of `sent` = what host d wants from ME
            sent = jax.lax.all_to_all(my_req, axis, 0, 0, tiled=True)
            rows = jnp.take(mine, sent.reshape(-1), axis=0, mode="clip")
            rows = rows.reshape(sent.shape[0], sent.shape[1], -1)
            # answers back: row d = MY rows answered by host d
            ans = jax.lax.all_to_all(rows, axis, 0, 0, tiled=True)
            return ans[None]

        return jax.jit(shard_map(
            body, mesh=self.mesh,
            in_specs=(P(axis, None, None), P(axis, None, None)),
            out_specs=P(axis, None, None, None), check_vma=False))

    def exchange(self, ids_per_host, infos=None):
        """Concurrent gather: host h resolves ``ids_per_host[h]`` (its own
        global-id request set), all hosts at once (the reference's
        NcclComm.exchange contract, comm.py:127-182).

        Args:
          ids_per_host: list of H 1-D global-id arrays (distinct per host).
          infos: optional per-host ``PartitionInfo`` list — required when
            hosts carry replicate sets (each host's own info maps its
            replicated ids to its local shard); defaults to owner dispatch
            through ``self.info.global2host``.

        Returns: list of H ``[len(ids_per_host[h]), D]`` arrays.
        """
        H = self.info.hosts
        assert len(ids_per_host) == H, (len(ids_per_host), H)
        sel_by = []           # per (h, dest): positions in host h's ids
        cap = 1
        for h in range(H):
            info_h = infos[h] if infos is not None else self.info
            ids = np.asarray(ids_per_host[h])
            owner = info_h.owner[ids] if ids.size else np.empty(0, np.int64)
            sels = [np.where(owner == d)[0] for d in range(H)]
            sel_by.append(sels)
            cap = max(cap, max((len(s) for s in sels), default=1))
        # bucket the pairwise width to a power of two: bounded recompiles
        cap = 1 << (cap - 1).bit_length() if cap > 1 else 1

        req = np.zeros((H, H, cap), np.int64)
        for h in range(H):
            info_h = infos[h] if infos is not None else self.info
            ids = np.asarray(ids_per_host[h])
            for d in range(H):
                sel = sel_by[h][d]
                req[h, d, :len(sel)] = info_h.global2local[ids[sel]]

        if self._exchange_fn is None:
            self._exchange_fn = self._build_exchange()
        ans = self._exchange_fn(self.tables, jnp.asarray(req))

        # Multi-process: each process can read only its own hosts'
        # shards; remote hosts' results stay on their owners (None here)
        # — exactly the reference's per-process contract.
        by_host = {}
        for s in ans.addressable_shards:
            h0 = s.index[0].start or 0
            by_host[int(h0)] = np.asarray(s.data)[0]

        outs = []
        for h in range(H):
            if h not in by_host:
                outs.append(None)
                continue
            a = by_host[h]
            m = len(np.asarray(ids_per_host[h]))
            out = np.zeros((m, a.shape[-1]), a.dtype)
            for d in range(H):
                sel = sel_by[h][d]
                out[sel] = a[d, :len(sel)]
            outs.append(jnp.asarray(out))
        return outs

    def __getitem__(self, ids):
        """Single-requester lookup (this host's ids; the other hosts ride
        the same collective with empty request slots)."""
        h = self.info.host
        per_host = [np.empty(0, np.int64)] * self.info.hosts
        per_host[h] = np.asarray(ids)
        return self.exchange(per_host)[h]
