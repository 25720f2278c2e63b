"""Feature-collection throughput (GB/s) — reference
benchmarks/feature/bench_feature.py:12-46 (baseline: 14.82 GB/s on
ogbn-products with a 20% GPU cache, docs/Introduction_en.md:92-95;
2-GPU NVLink clique: 108.6 GB/s).

Ids are generated on device and results stay on device: through the
axon tunnel every host<->device copy is orders slower than on a real
TPU host, so timing host transfers would measure the tunnel, not the
machine. The HBM-resident gather is the fits-in-HBM case (products
itself fits: 2.45M x 100 f32 = 0.98 GB); the hot-tier gather is what
the tiered store does for cache hits.
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import quiver_tpu

quiver_tpu.enable_compilation_cache()

N, D = 2_449_029, 100           # ogbn-products shape (float32)
BATCH_IDS = 400_000             # ~ a sampled 3-hop id set
CACHE_FRACTION = 0.2


@functools.partial(jax.jit, static_argnames=("n", "m"))
def draw_ids(key, cw, n, m):
    u = jax.random.uniform(key, (m,))
    return jnp.searchsorted(cw, u).clip(0, n - 1).astype(jnp.int32)


def bench(table, cw, label, iters=20):
    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))
    key = jax.random.PRNGKey(0)
    n = table.shape[0]
    # Pre-draw all id sets on device; time the gathers only (the id draw
    # is the caller's workload shape, not the store's cost).
    id_sets = []
    for i in range(iters):
        key, sub = jax.random.split(key)
        id_sets.append(draw_ids(sub, cw, n, BATCH_IDS))
    # force-complete the draws AND the warmup gather (incl. its compile)
    _ = float(jnp.sum(id_sets[-1][:1]))
    _ = float(jnp.sum(gather(table, id_sets[0])[:1]))
    t0 = time.time()
    outs = [gather(table, ids) for ids in id_sets]
    # Forced completion: on the axon tunnel block_until_ready acks
    # without waiting; a data-dependent scalar fetch cannot.
    _ = float(jnp.sum(outs[-1][:1]))
    dt = time.time() - t0
    gb = iters * BATCH_IDS * table.shape[1] * table.dtype.itemsize / 1e9
    print(f"{label}: {gb/dt:.2f} GB/s", file=sys.stderr)
    return gb / dt


def main():
    rng = np.random.default_rng(0)
    w = rng.pareto(1.5, N) + 1.0
    cw_full = jnp.asarray(np.cumsum(w / w.sum()), jnp.float32)

    feat = rng.normal(size=(N, D)).astype(np.float32)
    table = jnp.asarray(feat)
    full = bench(table, cw_full, "HBM-resident table, power-law ids")

    hot_rows = int(CACHE_FRACTION * N)
    hot = jnp.asarray(feat[:hot_rows])
    # ids restricted to the hot tier (cache-hit path of the tiered store)
    cw_hot = jnp.asarray(
        np.cumsum(w[:hot_rows] / w[:hot_rows].sum()), jnp.float32)
    hot_gbs = bench(hot, cw_hot, "hot tier (20% rows), cache-hit path")

    print(f"reference baselines: 14.82 GB/s (1 GPU, 20% cache), "
          f"108.6 GB/s (2-GPU NVLink); CPU 1.27 GB/s", file=sys.stderr)
    import json
    print(json.dumps({"hbm_gather_gbs": round(full, 2),
                      "hot_tier_gbs": round(hot_gbs, 2)}))


if __name__ == "__main__":
    main()
