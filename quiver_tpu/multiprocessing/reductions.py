"""ForkingPickler reducer shims (reference multiprocessing/reductions.py).

The reference's reducers serialize a Feature / GraphSageSampler to a
CUDA-IPC handle so a spawned child can reattach the same device memory
(reductions.py:6-33). The TPU runtime is single-process-per-host — every
local chip is addressed from one Python process, and cross-host state
travels as partition artifacts on disk plus jax.distributed collectives —
so there is no spawn boundary for library objects to cross.

The same function names are kept for call-site compatibility. They route
through the objects' `share_ipc()` / `lazy_from_ipc_handle()` shims
(which return the object itself), and `init_reductions()` intentionally
registers nothing: registering a reducer whose "handle" is the object
itself would just recurse, and plain pickling of these objects already
works for the rare host-side fork (numpy state pickles; device arrays
are re-put on unpickle by JAX).
"""
from __future__ import annotations


def rebuild_feature(ipc_handle):
    """Reference reductions.py:6-9 — reattach a Feature from its handle."""
    from ..feature import Feature
    if isinstance(ipc_handle, Feature):
        return ipc_handle
    return Feature.lazy_from_ipc_handle(ipc_handle)


def reduce_feature(feature):
    """Reference reductions.py:12-15."""
    return (rebuild_feature, (feature.share_ipc(),))


def rebuild_pyg_sampler(cls, ipc_handle):
    """Reference reductions.py:18-20."""
    if isinstance(ipc_handle, cls):
        return ipc_handle
    return cls.lazy_from_ipc_handle(ipc_handle)


def reduce_pyg_sampler(sampler):
    """Reference reductions.py:23-28."""
    return (rebuild_pyg_sampler, (type(sampler), sampler.share_ipc()))


def init_reductions():
    """No-op on TPU (see module docstring); kept for import parity with
    reference multiprocessing/__init__.py:1-3."""
    return None
