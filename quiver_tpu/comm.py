"""Cross-host communication helpers (the NcclComm/HostRankTable analogue).

The reference builds its own NCCL wrapper (quiver_comm.cu:9-100), a
host-rank table, and a greedy pairwise exchange scheduler
(srcs/python/quiver/comm.py:5-182) because GPUs talk NCCL point-to-point.
On TPU the fabric is the mesh: ``jax.distributed.initialize`` brings all
hosts into one runtime, collectives (psum / all_gather / all_to_all /
ppermute) ride ICI within a slice and DCN across slices, and the XLA
scheduler does the contention planning the reference hand-rolled.

This module keeps the reference's API *shape* so migrating code has an
obvious target:

  getNcclId()            -> no separate bootstrap id exists; returns a
                            placeholder token (coordinator address is the
                            actual rendezvous).
  init_distributed(...)  -> jax.distributed.initialize wrapper.
  CommWorld              -> rank/size + allreduce/allgather/alltoall over
                            a 1-D mesh of all devices; send/recv pairs
                            map to ppermute.

The heavy-duty exchange paths live where the data lives:
``quiver_tpu.feature.DistFeature`` (feature gather) and
``quiver_tpu.parallel.DistNeighborSampler`` (frontier exchange).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["getNcclId", "init_distributed", "CommWorld", "NcclComm"]


def getNcclId():
    """Parity shim (reference getNcclId comm.py:185): TPU rendezvous is
    the coordinator address passed to init_distributed, not an opaque id."""
    return b"quiver-tpu-mesh"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Join the multi-host runtime (replaces NCCL id + TCPStore bootstrap,
    reference train_quiver_multi_node.py:405-411)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


class CommWorld:
    """Collectives over a 1-D mesh of (local or global) devices."""

    def __init__(self, mesh: Optional[Mesh] = None, axis: str = "world"):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis,))
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.size = int(mesh.devices.size)
        self.rank = getattr(jax, "process_index", lambda: 0)()

    def _sharded(self, x):
        return jax.device_put(jnp.asarray(x),
                              NamedSharding(self.mesh, P(self.axis)))


    def _fetch(self, out):
        """Host view of a mesh-sharded result. Single process: the full
        array. Multi-process: only this process's rows (sorted by device
        position) — the per-process contract of the reference's NCCL
        wrapper."""
        if out.is_fully_addressable:
            return np.asarray(out)
        shards = sorted(out.addressable_shards,
                        key=lambda sh: sh.index[0].start or 0)
        return np.concatenate([np.asarray(sh.data) for sh in shards], 0)

    def allreduce(self, x_per_device):
        """x: [n_dev, ...] leading-axis sharded; returns the psum
        (replicated result), like NcclComm::allreduce quiver_comm.cu:66."""
        ax = self.axis

        def f(x):
            return jax.lax.psum(x[0], ax)[None]

        out = jax.jit(shard_map(
            f, mesh=self.mesh, in_specs=P(ax), out_specs=P(ax)))(
                self._sharded(x_per_device))
        return self._fetch(out)[0]

    def allgather(self, x_per_device):
        ax = self.axis

        def f(x):
            return jax.lax.all_gather(x[0], ax)[None]

        out = jax.jit(shard_map(
            f, mesh=self.mesh, in_specs=P(ax), out_specs=P(ax),
            check_vma=False))(self._sharded(x_per_device))
        return self._fetch(out)[0]

    def alltoall(self, x_per_device):
        """x: [n_dev, n_dev, ...]; row d = device d's chunks; returns the
        transposed exchange (replaces schedule+send/recv comm.py:42-182)."""
        ax = self.axis

        def f(x):
            return jax.lax.all_to_all(x[0], ax, 0, 0, tiled=True)[None]

        out = jax.jit(shard_map(
            f, mesh=self.mesh, in_specs=P(ax), out_specs=P(ax),
            check_vma=False))(self._sharded(x_per_device))
        return self._fetch(out)

    def shift(self, x_per_device, offset: int = 1):
        """Ring send/recv: device d's data goes to d+offset (mod size) —
        the ppermute mapping of NcclComm::send/recv."""
        ax = self.axis
        perm = [(i, (i + offset) % self.size) for i in range(self.size)]

        def f(x):
            return jax.lax.ppermute(x[0], ax, perm)[None]

        out = jax.jit(shard_map(
            f, mesh=self.mesh, in_specs=P(ax), out_specs=P(ax),
            check_vma=False))(self._sharded(x_per_device))
        return self._fetch(out)


# Migration alias: the reference exports `NcclComm` (comm.py / quiver_comm.cu).
NcclComm = CommWorld
