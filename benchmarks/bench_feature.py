"""Feature-collection throughput (GB/s) — reference
benchmarks/feature/bench_feature.py:12-46 (baseline: 14.82 GB/s on
ogbn-products with a 20% GPU cache, docs/Introduction_en.md:92-95;
2-GPU NVLink clique: 108.6 GB/s).

Three numbers, most honest first:
  1. mixed_20pct_gbs — the reference-comparable one: power-law ids over
     the FULL id space through ``Feature.__getitem__`` with a 20%
     degree-ordered hot cache (hits on device, misses through the
     threaded host gather + H2D scatter). Wall-clock end to end.
  2. hbm_gather_gbs — fits-in-HBM table, pure device gather.
  3. hot_tier_gbs — the cache-hit path alone.
Plus h2d_gbs: raw host->device copy bandwidth, to attribute where the
mixed number is bound (on this environment the axon tunnel, not PCIe,
carries the miss rows).
"""
from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import quiver_tpu
from quiver_tpu import Feature, CSRTopo

quiver_tpu.enable_compilation_cache()

N, D = 2_449_029, 100           # ogbn-products shape (float32)
BATCH_IDS = 200_000             # ~ a sampled 3-hop id set
CACHE_FRACTION = 0.2
ITERS = 10


def force(x):
    return float(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("n", "m"))
def draw_ids(key, cw, n, m):
    u = jax.random.uniform(key, (m,))
    return jnp.searchsorted(cw, u).clip(0, n - 1).astype(jnp.int32)


def bench_device(table, cw, label, iters=ITERS):
    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))
    key = jax.random.PRNGKey(0)
    n = table.shape[0]
    id_sets = []
    for i in range(iters):
        key, sub = jax.random.split(key)
        id_sets.append(draw_ids(sub, cw, n, BATCH_IDS))
    force(id_sets[-1])
    force(gather(table, id_sets[0]))
    t0 = time.time()
    outs = [gather(table, ids) for ids in id_sets]
    force(outs[-1])
    dt = time.time() - t0
    gb = iters * BATCH_IDS * table.shape[1] * table.dtype.itemsize / 1e9
    print(f"{label}: {gb/dt:.2f} GB/s", file=sys.stderr)
    return gb / dt


def _mixed_once(feat_store, id_sets, prefetch):
    t0 = time.time()
    outs = []
    if prefetch:
        feat_store.prefetch(id_sets[0])
    for i, ids in enumerate(id_sets):
        out = feat_store[ids]
        if prefetch and i + 1 < len(id_sets):
            feat_store.prefetch(id_sets[i + 1])
        outs.append(out)
    force(outs[-1])
    return time.time() - t0


def bench_mixed(feat_store, w, iters=ITERS, label="", rounds=5):
    """The honest number: ids drawn from the power-law ACCESS
    distribution over the full id space, through Feature.__getitem__.

    Direct and prefetch replays are INTERLEAVED round-robin and each
    mode reports its median round — this link's H2D rate drifts 3-10x
    over minutes, so sequential A-then-B comparisons (r2/r3
    methodology) measured the drift, not the mode."""
    rng = np.random.default_rng(1)
    cw = np.cumsum(w / w.sum())
    id_sets = [np.searchsorted(cw, rng.random(BATCH_IDS)).clip(0, N - 1)
               for _ in range(iters)]
    out = feat_store[id_sets[0]]          # warm compile both paths
    force(out)
    feat_store.stats = {k: 0 for k in feat_store.stats}
    gb = iters * BATCH_IDS * D * 4 / 1e9
    times = {False: [], True: []}
    for _ in range(rounds):
        for pf in (False, True):
            times[pf].append(_mixed_once(feat_store, id_sets, pf))
    hit = feat_store.cache_hit_rate()
    direct = gb / float(np.median(times[False]))
    pf = gb / float(np.median(times[True]))
    print(f"mixed 20% cache through Feature{label}: direct {direct:.2f} "
          f"GB/s, prefetch {pf:.2f} GB/s (hit rate {hit:.3f}, "
          f"median of {rounds} interleaved rounds)", file=sys.stderr)
    return direct, pf, hit


def bench_h2d(iters=8):
    add = jax.jit(lambda a: a.sum(0))
    mb = 32
    n = mb * 1024 * 1024 // (D * 4)
    arrs = [np.random.default_rng(i).normal(size=(n, D)).astype(np.float32)
            for i in range(iters)]
    d = jax.device_put(arrs[0])
    force(add(d))
    t0 = time.time()
    outs = [jax.device_put(a) for a in arrs]
    force(add(outs[-1]))
    dt = time.time() - t0
    gbs = iters * mb / 1024 / dt
    print(f"raw H2D: {gbs:.2f} GB/s", file=sys.stderr)
    return gbs


def main():
    rng = np.random.default_rng(0)
    w = rng.pareto(1.5, N) + 1.0
    feat = rng.normal(size=(N, D)).astype(np.float32)

    # degree-proxy ordering: the Feature reorders rows hot-first exactly
    # like the reference (w is the degree/access weight)
    budget = int(CACHE_FRACTION * N) * D * 4
    store = Feature(device_cache_size=budget)
    store.from_cpu_tensor(feat, access_prob=w)
    mixed, mixed_pf, hit = bench_mixed(store, w)
    store16 = Feature(device_cache_size=budget,
                      cold_transfer_dtype=np.float16)
    store16.from_cpu_tensor(feat, access_prob=w)
    mixed16d, mixed16, _ = bench_mixed(store16, w, label=" +f16-transfer")

    cw_full = jnp.asarray(np.cumsum(w / w.sum()), jnp.float32)
    table = jnp.asarray(feat)
    full = bench_device(table, cw_full, "HBM-resident table, power-law ids")

    hot_rows = int(CACHE_FRACTION * N)
    order = np.argsort(-w, kind="stable")
    w_hot = w[order[:hot_rows]]
    hot = jnp.asarray(feat[:hot_rows])
    cw_hot = jnp.asarray(np.cumsum(w_hot / w_hot.sum()), jnp.float32)
    hot_gbs = bench_device(hot, cw_hot, "hot tier (20% rows), hit path")

    h2d = bench_h2d()

    # roofline attribution: every miss row crosses the host->device
    # link, so mixed <= h2d / miss_fraction (the reference's misses ride
    # PCIe zero-copy at tens of GB/s; on this environment the link is a
    # network tunnel — the design is link-bound either way, so report
    # the ceiling next to the measurement).
    miss = max(1.0 - hit, 1e-9)
    print(f"reference baselines: 14.82 GB/s (1 GPU, 20% cache), "
          f"108.6 GB/s (2-GPU NVLink); CPU 1.27 GB/s", file=sys.stderr)
    print(f"H2D-bound mixed ceiling on this link: {h2d/miss:.2f} GB/s "
          f"(h2d {h2d:.2f} / miss {miss:.3f})", file=sys.stderr)
    print(json.dumps({"mixed_20pct_gbs": round(mixed, 2),
                      "mixed_prefetch_gbs": round(mixed_pf, 2),
                      "mixed_direct_f16_gbs": round(mixed16d, 2),
                      "mixed_prefetch_f16_gbs": round(mixed16, 2),
                      "mixed_hit_rate": round(hit, 3),
                      "hbm_gather_gbs": round(full, 2),
                      "hot_tier_gbs": round(hot_gbs, 2),
                      "h2d_gbs": round(h2d, 2),
                      "h2d_bound_mixed_ceiling_gbs": round(h2d/miss, 2)}))


if __name__ == "__main__":
    main()
