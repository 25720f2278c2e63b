"""Stage decomposition of the per-hop-dedup (strict) pipeline on the
real chip, with CHAINED in-jit timing (benchmarks/_timing.py) so every
number is pure device time — the r4 per-call version double-counted the
~2.3 ms/dispatch transport overhead into every piece and the pieces
summed to more than the whole.

Pieces at the products-scale headline config (b1024, [15,10,5],
capacities 16k/128k/576k):
  strict_full      the whole strict program (sample+reindex x3)
  sampling_only    the same hops with dedup='none' (exact sampling,
                   positional frontier — isolates total reindex cost)
  reindex_hop{i}   union_reindex_sorted_edges (the sort2 default) at
                   hop i's (base, cand, capacity) shape

Floor analysis: reindex = 2 sorts + 1 fused Pallas scan per hop; the
hop-3 sort (T=786k rows, 3 payload columns) is the dominant cost and
XLA's TPU sort throughput is the measured bound (bench_strict.py r3/r4
showed sort2 > sort(3-sort) > dense-table alternatives).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_graph, FANOUT, BATCH  # noqa: E402
sys.path.insert(0, str(Path(__file__).resolve().parent))
from _timing import chain_time, rtt  # noqa: E402

CAPS = (16384, 131072, 589824)


def main():
    import jax
    import jax.numpy as jnp
    import quiver_tpu as qt
    from quiver_tpu.sampling import sampler as S
    from quiver_tpu.ops.unique import union_reindex_sorted_edges
    qt.enable_compilation_cache()

    indptr, indices = build_graph()
    topo = qt.CSRTopo(indptr=indptr, indices=indices)
    V = topo.node_count
    rng = np.random.default_rng(0)
    out = {"config": f"b{BATCH} fanout {FANOUT} caps {CAPS}",
           "rtt_ms": round(rtt() * 1e3, 1)}

    strict = qt.NeighborSampler(topo, FANOUT, mode="TPU", seed=0,
                                dedup="per_hop", capacities=CAPS)
    dense = qt.NeighborSampler(topo, FANOUT, mode="TPU", seed=0,
                               dedup="none", sampling="exact")

    # warm both samplers (program caches + edge counts)
    b = strict.sample(rng.integers(0, V, BATCH))
    edges_strict = sum(int(np.asarray(a.mask).sum()) for a in b.adjs)
    bd = dense.sample(rng.integers(0, V, BATCH))

    tabs_s = (strict.indptr, strict.indices, strict.edge_table)
    tabs_d = (dense.indptr, dense.indices, dense.edge_table)
    key0 = jax.random.PRNGKey(3)

    def full_fn(u, *tabs):
        seeds = (u * V).astype(jnp.int32)
        return S._sample_layers(
            *tabs, seeds, jnp.int32(BATCH), key0, sizes=strict.sizes,
            caps=CAPS, batch_size=BATCH, weighted=False, window=False,
            reindex=strict._reindex_plan(BATCH, CAPS),
            num_nodes=V, big_caps=strict._resolve_big_caps(BATCH, CAPS),
            fused=strict._fused)[0]

    def sampling_fn(u, *tabs):
        seeds = (u * V).astype(jnp.int32)
        return S._sample_layers_dense(
            *tabs, seeds, jnp.int32(BATCH), key0, sizes=dense.sizes,
            batch_size=BATCH, weighted=False, window=False)[0]

    u = jnp.asarray(rng.random(BATCH), jnp.float32)
    t_full = chain_time(full_fn, u, *tabs_s, iters=24)
    t_smp = chain_time(sampling_fn, u, *tabs_d, iters=24)
    out["strict_full_ms"] = round(t_full * 1e3, 3)
    out["strict_full_seps_M"] = round(edges_strict / t_full / 1e6, 2)
    out["sampling_only_ms"] = round(t_smp * 1e3, 3)
    print(f"strict full: {t_full*1e3:.2f} ms device "
          f"({edges_strict/t_full/1e6:.1f}M SEPS device-only); "
          f"exact sampling alone: {t_smp*1e3:.2f} ms", file=sys.stderr)

    # reindex at each hop's shape (sort2 path), chained
    shapes = [(BATCH, BATCH * 15, CAPS[0], 15),
              (CAPS[0], CAPS[0] * 10, CAPS[1], 10),
              (CAPS[1], CAPS[1] * 5, CAPS[2], 5)]
    reindex_total = 0.0
    for B, M, cap, k in shapes:
        base = np.sort(rng.choice(V, B, replace=False)).astype(np.int32)
        candv = jnp.ones((M,), bool)
        payload = jnp.asarray(rng.integers(0, topo.edge_count, M),
                              jnp.int32)
        base_j = jnp.asarray(base)

        def re_fn(uc, base_j, candv, payload, B=B, cap=cap, k=k):
            cand = (uc * V).astype(jnp.int32)
            return union_reindex_sorted_edges(
                base_j, jnp.int32(B), cand, candv, payload, k, cap)[0]

        uc = jnp.asarray(rng.random(M), jnp.float32)
        dt = chain_time(re_fn, uc, base_j, candv, payload, iters=24)
        reindex_total += dt
        out[f"reindex_T{B+M}_ms"] = round(dt * 1e3, 3)
        print(f"reindex sort2 T={B+M}: {dt*1e3:.2f} ms device",
              file=sys.stderr)
    out["reindex_total_ms"] = round(reindex_total * 1e3, 3)
    out["floor_note"] = (
        "device floor = sampling + 3x reindex; the hop-3 sort2 "
        "(T=786k, one 3-payload stable sort + fused Pallas scan + one "
        "masked compaction sort) dominates. Per-call SEPS additionally "
        "pays the transport dispatch (see rtt_ms/10 per force).")
    print(json.dumps(out))
    try:
        with open(Path(__file__).resolve().parent.parent
                  / "STRICT_BENCH.json", "a") as f:
            f.write(json.dumps({"metric": "strict_stage_breakdown",
                                **out}) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
