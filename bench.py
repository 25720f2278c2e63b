"""Headline benchmark: sampling throughput (SEPS) on a products-scale graph.

Mirrors the reference's benchmarks/sample/bench_sampler.py:14-46 (SEPS =
sampled edges per second summed over all layers) on its headline config:
ogbn-products-like graph (2.45M nodes, ~62M directed edges, power-law
degrees), fanout [15,10,5], batch 1024 (docs/Introduction_en.md:38-41;
reference UVA result: 34.29M SEPS on one GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_SEPS = 34.29e6  # reference UVA, products [15,10,5] (BASELINE.md)

N_NODES = 2_449_029
N_EDGES = 61_859_140
FANOUT = [15, 10, 5]
BATCH = 1024
CACHE = Path(__file__).parent / ".bench_cache" / "products_like.npz"


def build_graph():
    if CACHE.exists():
        z = np.load(CACHE)
        return z["indptr"], z["indices"]
    rng = np.random.default_rng(0)
    # Power-law degree weights (products: top-31% nodes cover 77% of edges,
    # docs/Introduction_en.md:77-80 — alpha tuned to that ballpark).
    w = rng.pareto(1.5, N_NODES) + 1.0
    deg = np.maximum((w / w.sum() * N_EDGES).astype(np.int64), 1)
    indptr = np.zeros(N_NODES + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    e = int(indptr[-1])
    # Endpoints drawn from the same weight distribution (hubs point at hubs).
    cw = np.cumsum(w)
    cw /= cw[-1]
    indices = np.searchsorted(cw, rng.random(e)).astype(np.int32)
    CACHE.parent.mkdir(exist_ok=True)
    np.savez(CACHE, indptr=indptr, indices=indices)
    return indptr, indices


def main():
    import jax
    from quiver_tpu import CSRTopo, NeighborSampler

    t0 = time.time()
    indptr, indices = build_graph()
    topo = CSRTopo(indptr=indptr, indices=indices)
    sys.stderr.write(f"graph ready in {time.time()-t0:.1f}s: "
                     f"{topo.node_count} nodes {topo.edge_count} edges, "
                     f"devices={jax.devices()}\n")

    sampler = NeighborSampler(topo, FANOUT, mode="TPU", seed=0)
    rng = np.random.default_rng(1)

    def one(seeds):
        return sampler.sample(seeds)

    # warmup / compile
    t0 = time.time()
    b = one(np.arange(BATCH))
    jax.block_until_ready(b.n_id)
    sys.stderr.write(f"compile+first sample {time.time()-t0:.1f}s\n")

    iters = 20
    seed_sets = [rng.integers(0, topo.node_count, BATCH) for _ in range(iters)]
    t0 = time.time()
    batches = [one(s) for s in seed_sets]
    jax.block_until_ready(batches[-1].n_id)
    dt = time.time() - t0

    edges = sum(int(np.asarray(a.mask).sum()) for bb in batches
                for a in bb.adjs)
    seps = edges / dt
    sys.stderr.write(f"{iters} batches in {dt:.2f}s, {edges} edges, "
                     f"{seps/1e6:.2f}M SEPS\n")
    print(json.dumps({
        "metric": "sample_seps_products_like_f15_10_5_b1024",
        "value": round(seps, 1),
        "unit": "edges/s",
        "vs_baseline": round(seps / BASELINE_SEPS, 4),
    }))


if __name__ == "__main__":
    main()
