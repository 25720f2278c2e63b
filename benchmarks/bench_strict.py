"""Tuning bench for the per-hop-dedup (reference-contract) pipeline.

Compares reindex strategies (3-sort fused vs O(V) dense table vs auto)
and sampling strategies (exact Floyd vs opt-in window) on the headline
products-scale config. The reference-contract number reported by
bench.py is exact+auto; this script justifies the auto thresholds.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_graph, measure, FANOUT, BATCH  # noqa: E402

CAPS = (16384, 131072, 589824)


def main():
    import jax
    import quiver_tpu as qt
    qt.enable_compilation_cache()

    indptr, indices = build_graph()
    topo = qt.CSRTopo(indptr=indptr, indices=indices)
    sys.stderr.write(f"graph: {topo.node_count}N {topo.edge_count}E "
                     f"dev={jax.devices()}\n")

    configs = [
        ("exact_sort", dict(sampling="exact", reindex="sort")),
        ("exact_dense", dict(sampling="exact", reindex="dense")),
        ("exact_auto", dict(sampling="exact", reindex="auto")),
        ("window_dense", dict(sampling="window", reindex="dense")),
    ]
    out = {}
    for name, kw in configs:
        s = qt.NeighborSampler(topo, FANOUT, mode="TPU", seed=0,
                               dedup="per_hop", capacities=CAPS, **kw)
        t0 = time.time()
        seps, comp, epb, _band = measure(s, topo.node_count, iters=10)
        out[name] = round(seps / 1e6, 2)
        sys.stderr.write(f"{name}: {seps/1e6:.2f}M SEPS "
                         f"({epb} edges/batch, compile {comp:.1f}s, "
                         f"total {time.time()-t0:.0f}s)\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
