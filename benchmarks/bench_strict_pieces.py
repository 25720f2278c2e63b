"""Piecewise timing of the per-hop-dedup pipeline on the real chip:
(1) exact sampling with no reindex at all, (2) the fused 3-sort
union_reindex at each hop's shape, (3) strict pipeline at batch 4096.
Justifies where the strict-path time goes and what to optimize.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_graph, measure, FANOUT  # noqa: E402

CAPS = (16384, 131072, 589824)


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.reshape(-1)[:1]))


def time_fn(fn, args_list, warm_args):
    out = fn(*warm_args)
    force(out[0] if isinstance(out, tuple) else out)
    t0 = time.time()
    outs = [fn(*a) for a in args_list]
    o = outs[-1]
    force(o[0] if isinstance(o, tuple) else o)
    return (time.time() - t0) / len(args_list)


def main():
    import jax
    import jax.numpy as jnp
    import quiver_tpu as qt
    from quiver_tpu.ops.unique import union_reindex_fused
    qt.enable_compilation_cache()

    indptr, indices = build_graph()
    topo = qt.CSRTopo(indptr=indptr, indices=indices)
    rng = np.random.default_rng(0)
    out = {}

    # 1) exact sampling, dedup-free (positional): sampling cost alone
    s = qt.NeighborSampler(topo, FANOUT, mode="TPU", seed=0, dedup="none",
                           sampling="exact")
    seps, comp, epb, _band = measure(s, topo.node_count, iters=10)
    out["exact_nodedup_seps_M"] = round(seps / 1e6, 2)
    sys.stderr.write(f"exact sampling no-dedup: {seps/1e6:.2f}M SEPS "
                     f"({epb} edges/batch)\n")

    # 2) fused reindex alone at each hop's strict shape
    fr = jax.jit(union_reindex_fused, static_argnames=("capacity",))
    shapes = [(1024, 1024 * 15, CAPS[0]),
              (CAPS[0], CAPS[0] * 10, CAPS[1]),
              (CAPS[1], CAPS[1] * 5, CAPS[2])]
    for B, M, cap in shapes:
        args_list = []
        for i in range(8):
            base = np.unique(rng.integers(0, topo.node_count, B)).astype(np.int32)
            bi = np.zeros(B, np.int32)
            bi[:len(base)] = base
            cand = rng.integers(0, topo.node_count, M).astype(np.int32)
            args_list.append((jnp.asarray(bi), jnp.int32(len(base)),
                              jnp.asarray(cand),
                              jnp.ones(M, bool), cap))
        dt = time_fn(fr, args_list, args_list[0])
        out[f"reindex_T{B+M}_ms"] = round(dt * 1e3, 2)
        sys.stderr.write(f"union_reindex_fused T={B+M}: {dt*1e3:.2f} ms\n")

    # 3) strict pipeline at batch 4096 (per-op floors amortized)
    s4 = qt.NeighborSampler(topo, FANOUT, mode="TPU", seed=0,
                            dedup="per_hop", reindex="sort",
                            capacities=(4 * CAPS[0], 3 * CAPS[1],
                                        2 * CAPS[2]))
    seps4, _, epb4, _b4 = measure(s4, topo.node_count, iters=10, batch=4096)
    out["strict_b4096_seps_M"] = round(seps4 / 1e6, 2)
    sys.stderr.write(f"strict b4096: {seps4/1e6:.2f}M SEPS "
                     f"({epb4} edges/batch)\n")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
