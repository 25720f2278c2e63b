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


@functools.partial(jax.jit, static_argnames=("hot_rows",))
def _gather_hot(hot, ids, hot_rows):
    """Gather rows < hot_rows from the device table; 0 rows elsewhere."""
    in_hot = ids < hot_rows
    safe = jnp.where(in_hot, ids, 0)
    rows = jnp.take(hot, safe, axis=0)
    return jnp.where(in_hot[:, None], rows, 0), in_hot


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
                 mesh=None):
        if cache_policy not in ("device_replicate", "p2p_clique_replicate"):
            raise ValueError(f"unknown cache_policy {cache_policy!r}")
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
    def __getitem__(self, n_id):
        """Gather rows by *global* node id: hot tier on device, cold tier
        from host, optional disk tier from mmap (reference __getitem__
        feature.py:296-333)."""
        ids = np.asarray(n_id).astype(np.int64)
        m = ids.shape[0]
        self.stats["lookups"] += m

        disk_rows = None
        if self.disk_map is not None:
            dpos = self.disk_map[ids]
            on_disk = dpos >= 0
            if on_disk.any():
                self.stats["disk_hits"] += int(on_disk.sum())
                disk_rows = (on_disk,
                             np.asarray(self.mmap_array[dpos[on_disk]]))

        pos = ids if self.feature_order is None else self.feature_order[ids]
        pos = np.clip(pos, 0, self.shape[0] - 1)
        if self.hot_rows > 0:
            hot_part, in_hot = _gather_hot(self.hot, jnp.asarray(pos),
                                           self.hot_rows)
            in_hot_np = np.asarray(in_hot)
        else:
            hot_part = jnp.zeros((m, self.shape[1]), self.dtype)
            in_hot_np = np.zeros(m, bool)
        n_cold = m - int(in_hot_np.sum())
        self.stats["hot_hits"] += m - n_cold
        self.stats["cold_hits"] += n_cold
        if n_cold:
            from . import native
            cold_idx = np.clip(pos[~in_hot_np] - self.hot_rows, 0,
                               max(len(self.cold) - 1, 0))
            cold_vals = native.gather_rows(self.cold, cold_idx)
            out = np.array(hot_part)  # writable host copy
            out[~in_hot_np] = cold_vals
        else:
            out = np.asarray(hot_part) if disk_rows is not None else hot_part
        if disk_rows is not None:
            on_disk, vals = disk_rows
            out = np.array(out)  # writable host copy
            out[on_disk] = vals
        return jnp.asarray(out)

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
    feature.py:529-567) with ONE ragged-padded ``all_to_all`` pair inside
    ``shard_map`` — the collective subsumes the whole HostRankTable /
    schedule machinery and rides ICI/DCN as laid out by the mesh.

    In this single-process form, each mesh device plays the role of one
    host; ``local_tables`` is the per-device shard stack [hosts, rows, D].
    """

    def __init__(self, mesh, local_tables, info: PartitionInfo):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.info = info
        self.tables = jax.device_put(
            jnp.asarray(local_tables),
            NamedSharding(mesh, P(self.axis, None, None)))

    def __getitem__(self, ids):
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        ids = np.asarray(ids)
        m = ids.shape[0]
        H = self.info.hosts
        ids_by_host, orders = self.info.dispatch(ids)
        cap = max((len(x) for x in ids_by_host), default=1)
        cap = max(cap, 1)
        # pad per-host request lists to a common static width
        req = np.zeros((H, cap), np.int64)
        cnt = np.zeros((H,), np.int32)
        for h in range(H):
            k = len(ids_by_host[h])
            req[h, :k] = self.info.global2local[ids_by_host[h]]
            cnt[h] = k

        # every "host" (mesh device) issues the same request matrix here
        # because this handle represents one logical requester; replicate
        # and let each device answer its slice.
        def exchange(tables, req):
            # tables: [1, rows, D] this device's shard; req: [H, cap]
            mine = tables[0]
            rows = jnp.take(mine, req[jax.lax.axis_index(self.axis)], axis=0)
            # all_gather the answers so the requester can assemble
            return jax.lax.all_gather(rows, self.axis)  # [H, cap, D]

        out_shape = jax.eval_shape(lambda t: t[0][:1], self.tables)
        gathered = jax.jit(shard_map(
            exchange, mesh=self.mesh,
            in_specs=(P(self.axis, None, None), P()),
            out_specs=P(), check_vma=False))(self.tables, jnp.asarray(req))

        D = gathered.shape[-1]
        out = np.zeros((m, D), gathered.dtype)
        g = np.asarray(gathered)
        for h in range(H):
            out[orders[h]] = g[h, :cnt[h]]
        return jnp.asarray(out)
