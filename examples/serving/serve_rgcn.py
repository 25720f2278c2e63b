"""Heterogeneous-model serving (VERDICT r4 missing #1 / BASELINE
config 5): the MAG240M-family typed-edge R-GCN served through the SAME
RequestBatcher -> HybridSampler -> InferenceServer stack as SAGE, with
a p99/throughput row per routing mode appended to SERVING_BENCH.json.

Typed edges ride the dense sampling contract: exact-mode blocks keep
``e_id`` = CSR slot on BOTH lanes (device sampler and the CPU pool), so
the per-lane relation types are one ``edge_type[e_id]`` lookup inside
``infer_fn`` — serving needs no new machinery for hetero models
(reference serving stack: srcs/python/quiver/serving.py:150-360;
MAG240M R-GCN family: benchmarks/ogbn-mag240m/train_quiver_multi_node.py).

  python examples/serving/serve_rgcn.py [--requests 200] [--rate 60]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp

import quiver_tpu
from quiver_tpu import CSRTopo, NeighborSampler
from quiver_tpu.models import RGCN
from quiver_tpu.serving import generate_neighbour_num

sys.path.insert(0, str(Path(__file__).resolve().parent))
from serve_sage import make_trace, run_mode, _timed  # noqa: E402

quiver_tpu.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--relations", type=int, default=3)
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--rate", type=float, default=60.0)
    ap.add_argument("--fanout", type=int, nargs="+", default=[15, 10])
    ap.add_argument("--cpu-workers", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpu-backend", action="store_true")
    args = ap.parse_args()
    if args.cpu_backend:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    n = args.nodes
    R = args.relations
    w = rng.pareto(1.5, n) + 1.0
    deg = np.maximum((w / w.sum() * (n * 12)).astype(np.int64), 1)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.shape[0])
    topo = CSRTopo(edge_index=np.stack([rows, cols]), num_nodes=n)
    E = topo.edge_count
    edge_type = rng.integers(0, R, E).astype(np.int32)
    etype_j = jnp.asarray(edge_type)
    classes = 8
    feat = rng.normal(size=(n, 32)).astype(np.float32)
    feat_j = jnp.asarray(feat)

    # exact sampling on BOTH lanes keeps e_id = CSR slot (typed lookup)
    dev_sampler = NeighborSampler(topo, args.fanout, seed=0, dedup="none",
                                  sampling="exact")
    model = RGCN(hidden_features=64, out_features=classes,
                 num_layers=len(args.fanout), num_relations=R,
                 dropout=0.0)

    def block_etypes(batch):
        return tuple(etype_j[jnp.clip(jnp.asarray(np.asarray(blk.e_id)),
                                      0, E - 1)]
                     for blk in batch.adjs)

    b0 = dev_sampler.sample(np.arange(64))
    params = model.init(jax.random.PRNGKey(0),
                        feat_j[jnp.clip(b0.n_id, 0, n - 1)], b0.adjs,
                        block_etypes(b0))
    cpu_prof = NeighborSampler(topo, args.fanout, mode="CPU",
                               dedup="none")
    nn_table = generate_neighbour_num(cpu_prof, batch_size=4096)

    apply_j = jax.jit(model.apply)

    def infer_fn(seeds, presampled):
        batch = presampled or dev_sampler.sample(seeds)
        x = feat_j[jnp.clip(jnp.asarray(np.asarray(batch.n_id)), 0,
                            n - 1)]
        out = apply_j(params, x, batch.adjs, block_etypes(batch))
        return np.asarray(out)[: len(seeds)]

    vapply_j = jax.jit(jax.vmap(model.apply, in_axes=(None, 0, 0, 0)))

    def infer_stacked_fn(seeds_list, batches):
        g = len(batches)
        gp = 16 if g <= 16 else 32
        batches = list(batches) + [batches[-1]] * (gp - g)
        nids = np.stack([np.clip(np.asarray(b.n_id), 0, n - 1)
                         for b in batches])
        x = feat_j[jnp.asarray(nids)]
        adjs = jax.tree.map(lambda *xs: jnp.stack(
            [jnp.asarray(np.asarray(x_)) for x_ in xs]),
            *[b.adjs for b in batches])
        ets = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[block_etypes(b) for b in batches])
        outs = np.asarray(vapply_j(params, x, adjs, ets))
        return [outs[i][: len(s)] for i, s in enumerate(seeds_list)]

    # warm every shape either lane can hit
    cpu_warm = NeighborSampler(topo, args.fanout, mode="CPU",
                               dedup="none")
    for b in (8, 16, 32, 64, 128, 256):
        seeds = rng.integers(0, n, b)
        infer_fn(seeds, None)
        pb = cpu_warm.sample(seeds)
        infer_fn(seeds, pb)
        infer_stacked_fn([seeds, seeds], [pb, pb])
        infer_stacked_fn([seeds] * 17, [pb] * 17)

    # probe-seeded affine lane models (see serve_sage.py)
    probe_sizes, dev_t, cpu_t, pred_cost = [8, 64, 256], [], [], []
    for sz in probe_sizes:
        seeds = rng.integers(0, n, sz)
        pred_cost.append(float(np.take(nn_table, seeds,
                                       mode="clip").sum()))
        G = max(1, 128 // sz)
        merged = rng.integers(0, n, sz * G)
        dev_t.append(min(_timed(lambda: infer_fn(merged, None))
                         for _ in range(3)) / G)

        def _cpu_group():
            ss = [rng.integers(0, n, sz) for _ in range(G)]
            bs = [cpu_warm.sample(s) for s in ss]
            if G > 1:
                infer_stacked_fn(ss, bs)
            else:
                infer_fn(ss[0], bs[0])
        cpu_t.append(min(_timed(_cpu_group) for _ in range(3)) / G)

    def affine_fit(ts):
        a = np.stack([np.ones(len(pred_cost)), np.asarray(pred_cost)], 1)
        coef, *_ = np.linalg.lstsq(a, np.asarray(ts) * 1e3, rcond=None)
        return (max(float(coef[0]), 0.0), max(float(coef[1]), 1e-7))

    lane_profile = {"device": affine_fit(dev_t), "cpu": affine_fit(cpu_t)}
    print(f"lane models: device {lane_profile['device']} "
          f"cpu {lane_profile['cpu']}")

    trace = make_trace(rng, n, args.requests, args.rate)
    modes = {"auto": dict(mode="auto", lane_profile=lane_profile),
             "device": dict(mode="device", lane_profile=None),
             "cpu": dict(mode="cpu", lane_profile=None)}
    runs = {k: [] for k in modes}
    for _ in range(args.rounds):
        for name, kw in modes.items():
            runs[name].append(run_mode(
                kw["mode"], trace, topo, args.fanout, nn_table, 0.0,
                infer_fn, args.cpu_workers,
                infer_stacked_fn=infer_stacked_fn,
                lane_profile=kw["lane_profile"]))
    art = {"metric": "serving_p99_rgcn",
           "model": f"RGCN({R} relations, typed edges via e_id)",
           "offered_rate_rps": args.rate, "requests": args.requests,
           "modes": {}}
    for name, rs in runs.items():
        rs = sorted(rs, key=lambda r: r["p99_ms"])
        m = rs[len(rs) // 2]
        art["modes"][name] = {
            "p50_ms": round(m["p50_ms"], 1),
            "p99_ms": round(m["p99_ms"], 1),
            "throughput_rps": round(m["throughput_rps"], 1),
            "seeds_per_s": round(m["seeds_per_s"], 1)}
        print(f"{name:>7}: p50 {m['p50_ms']:7.1f}  p99 "
              f"{m['p99_ms']:7.1f}  {m['throughput_rps']:6.1f} req/s")

    out = Path(__file__).resolve().parent.parent.parent / \
        "SERVING_BENCH.json"
    try:
        with open(out, "a") as f:
            f.write(json.dumps(art) + "\n")
        print(f"appended rgcn serving record to {out}")
    except OSError:
        pass
    sys.stdout.flush()
    import os
    os._exit(0)


if __name__ == "__main__":
    main()
