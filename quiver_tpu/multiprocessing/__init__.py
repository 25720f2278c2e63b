"""Migration-surface shim for the reference's `quiver.multiprocessing`.

The reference registers ForkingPickler reducers so Feature/sampler
objects cross `mp.spawn` boundaries via CUDA IPC handles
(reference multiprocessing/__init__.py:1-3, reductions.py:30-33).

On TPU one process drives every local chip, so nothing needs to cross
a process boundary and no reducers are registered; the module (and
`reductions.init_reductions`) exists so reference imports keep working.
"""
from . import reductions

reductions.init_reductions()

__all__ = ["reductions"]
