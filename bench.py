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


def _force(batch):
    """Force completion of the in-order device stream: fetch a scalar that
    depends on the batch's data. (On the axon tunnel, block_until_ready
    acks without waiting for execution; a dependent host fetch cannot.)"""
    import jax.numpy as jnp
    return float(jnp.sum(batch.adjs[0].mask.astype(jnp.int32)))


def measure(sampler, node_count, iters=20, batch=BATCH, seed=1, repeats=5):
    """Median SEPS over `repeats` timed batches of `iters` samples each
    (the shared TPU transport adds multi-ms noise spikes AND slow drift
    — measured band at products scale spans ~±9% around the median, see
    the r5 flatten-ablation artifact — so report median + [min, max])."""
    rng = np.random.default_rng(seed)
    t0 = time.time()
    b = sampler.sample(np.arange(batch))
    _force(b)
    compile_s = time.time() - t0

    rates, epb = [], 0
    for _ in range(repeats):
        seed_sets = [rng.integers(0, node_count, batch) for _ in range(iters)]
        t0 = time.time()
        batches = [sampler.sample(s) for s in seed_sets]
        _force(batches[-1])   # device executes in order: all are done
        dt = time.time() - t0
        edges = sum(int(np.asarray(a.mask).sum()) for bb in batches
                    for a in bb.adjs)
        rates.append(edges / dt)
        epb = edges // iters
    rates.sort()
    return rates[len(rates) // 2], compile_s, epb, (rates[0], rates[-1])


def measure_grouped(sampler, node_count, group=8, iters=8, batch=BATCH,
                    seed=2, repeats=5):
    """Sustained throughput of the grouped-dispatch mode
    (``sample_many(method='vmap')``, the stream-pool analogue): one
    program samples `group` batches, amortizing the ~2.3 ms per-dispatch
    transport overhead that bounds the per-call figure here."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    count = jax.jit(lambda ms: sum(jnp.sum(m.astype(jnp.int32))
                                   for m in ms))
    warm = sampler.sample_many(
        rng.integers(0, node_count, (group, batch)), method="vmap")
    _ = int(count([a.mask for a in warm.adjs]))
    rates = []
    for _ in range(repeats):
        seed_sets = [rng.integers(0, node_count, (group, batch))
                     for _ in range(iters)]
        t0 = time.time()
        outs = [sampler.sample_many(s, method="vmap") for s in seed_sets]
        _ = int(count([a.mask for a in outs[-1].adjs]))
        dt = time.time() - t0
        edges = sum(int(count([a.mask for a in o.adjs])) for o in outs)
        rates.append(edges / dt)
    rates.sort()
    return rates[len(rates) // 2], (rates[0], rates[-1])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from quiver_tpu import CSRTopo, NeighborSampler

    t0 = time.time()
    indptr, indices = build_graph()
    topo = CSRTopo(indptr=indptr, indices=indices)
    sys.stderr.write(f"graph ready in {time.time()-t0:.1f}s: "
                     f"{topo.node_count} nodes {topo.edge_count} edges, "
                     f"devices={jax.devices()}\n")

    # Headline: the default (dense positional, dedup-free) pipeline.
    dense = NeighborSampler(topo, FANOUT, mode="TPU", seed=0, dedup="none")
    seps, comp, epb, band = measure(dense, topo.node_count, iters=50)
    sys.stderr.write(f"dense pipeline: {seps/1e6:.2f}M SEPS "
                     f"[{band[0]/1e6:.1f}, {band[1]/1e6:.1f}] "
                     f"({epb} edges/batch, compile {comp:.1f}s)\n")

    # Grouped dispatch (sample_many(method='vmap'), group 8): the
    # sustained-throughput configuration — per-dispatch transport
    # overhead (~2.3 ms/batch here, half the per-call batch time)
    # amortizes across the group.
    gseps, gband = measure_grouped(dense, topo.node_count)
    sys.stderr.write(f"grouped dispatch (g=8): {gseps/1e6:.2f}M SEPS "
                     f"[{gband[0]/1e6:.1f}, {gband[1]/1e6:.1f}]\n")

    # Secondary: reference-contract (per-hop dedup, unique n_id) pipeline.
    # Capacities sized ~1.25x the measured per-hop unique counts (13k /
    # 114k / 465k on this graph) — the analogue of the reference sizing
    # its reindex buffers; overflow would only mask tail edges.
    strict = NeighborSampler(topo, FANOUT, mode="TPU", seed=0,
                             dedup="per_hop",
                             capacities=(16384, 131072, 589824))
    # 30 batches per timing window, same as the dense row's 50: short
    # windows fold the window-end sync round-trip (~2-4 ms/batch at 10
    # iters on this transport) into the per-batch figure.
    seps2, comp2, _, band2 = measure(strict, topo.node_count, iters=30)
    sys.stderr.write(f"per-hop-dedup pipeline: {seps2/1e6:.2f}M SEPS "
                     f"[{band2[0]/1e6:.1f}, {band2[1]/1e6:.1f}] "
                     f"(compile {comp2:.1f}s)\n")

    # Headline = the grouped-dispatch (sustained-throughput) figure: its
    # band is tight (~±1%, it measures the DEVICE) where the per-call
    # figure's band spans ±25%+ because each dispatch rides the shared
    # remote-TPU transport (~2.3 ms/call of pure RPC overhead — the
    # r2-r4 "decline" was this jitter, see DENSE_VARIANCE.json).
    print(json.dumps({
        "metric": "sample_seps_products_like_f15_10_5_b1024",
        "value": round(gseps, 1),
        "unit": "edges/s",
        "vs_baseline": round(gseps / BASELINE_SEPS, 4),
        "band": [round(gband[0], 1), round(gband[1], 1)],
        "dispatch": "grouped: sample_many(method='vmap'), 8 batches/dispatch",
        "per_call_seps": round(seps, 1),
        "per_call_vs_baseline": round(seps / BASELINE_SEPS, 4),
        "per_call_band": [round(band[0], 1), round(band[1], 1)],
        "strict_dedup_seps": round(seps2, 1),
        "strict_vs_baseline": round(seps2 / BASELINE_SEPS, 4),
        "strict_band": [round(band2[0], 1), round(band2[1], 1)],
    }))


if __name__ == "__main__":
    main()
