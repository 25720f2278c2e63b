"""End-to-end GNN serving A/B (the reference's
examples/serving/reddit/reddit_serving.py flow, TPU-native): workload
table -> request batcher (size-predictive routing) -> hybrid CPU
samplers + device inference loop -> p50/p99/throughput per routing mode.

The SAME paced request trace is replayed through three configs —
``auto`` (size-predictive routing), ``device`` (everything on the
chip), ``cpu`` (everything through the CPU sampler pool) — to show the
workload-awareness winning, as the reference claims with its tp99 curve
(README.md:66-70, serving.py:286-360). The routing threshold is
calibrated from the ``generate_neighbour_num`` cost table: requests
whose predicted sampled-subgraph size exceeds the trace median go to
the device (big batches amortize the fixed dispatch cost), small ones
to the CPU pool (lower latency floor).

  python examples/serving/serve_sage.py [--requests 300] [--rate 120]
"""
from __future__ import annotations

import argparse
import queue
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp

import quiver_tpu
from quiver_tpu import CSRTopo, NeighborSampler
from quiver_tpu.models import GraphSAGE
from quiver_tpu.serving import (
    RequestBatcher, HybridSampler, InferenceServer, ServerMetrics,
    generate_neighbour_num)

quiver_tpu.enable_compilation_cache()


def make_trace(rng, n_nodes, count, rate_hz):
    """A mixed workload: mostly small point requests, a tail of large
    scans (the shape the reference's router exists for), with
    exponential inter-arrival gaps at the offered rate."""
    trace = []
    for i in range(count):
        if rng.random() < 0.15:
            size = int(rng.integers(64, 257))    # heavy request
        else:
            size = int(rng.integers(1, 9))       # light request
        seeds = rng.integers(0, n_nodes, size)
        gap = float(rng.exponential(1.0 / rate_hz))
        trace.append((seeds, gap))
    return trace


def run_mode(mode, trace, topo, fanout, nn_table, threshold, infer_fn,
             cpu_workers):
    inq = queue.Queue()
    rb = RequestBatcher(inq, neighbour_num=nn_table, threshold=threshold,
                       mode=mode)
    hybrid = HybridSampler(
        rb.cpu_queue,
        sampler_factory=lambda: NeighborSampler(topo, fanout, mode="CPU",
                                                dedup="none"),
        num_workers=cpu_workers)
    server = InferenceServer(rb.device_queue, hybrid.sampled_queue,
                             infer_fn, coalesce_max_seeds=256)

    def replay(items, record=True):
        if record:
            server.metrics = ServerMetrics()
        done, total = 0, len(items)
        for i, (seeds, gap) in enumerate(items):
            time.sleep(gap)
            inq.put((i, seeds, time.time()))
            # drain completions opportunistically to keep queues short
            try:
                while True:
                    server.result_queue.get_nowait()
                    done += 1
            except queue.Empty:
                pass
        while done < total:
            server.result_queue.get(timeout=300)
            done += 1
        return server.metrics.summary()

    # warmup replays compile every coalesced bucket shape
    replay(trace[: max(len(trace) // 3, 8)], record=False)
    m = replay(trace)
    rb.stop()
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--requests", type=int, default=300)
    ap.add_argument("--rate", type=float, default=120.0,
                    help="offered request rate (req/s)")
    ap.add_argument("--fanout", type=int, nargs="+", default=[15, 10])
    ap.add_argument("--cpu-workers", type=int, default=2)
    ap.add_argument("--modes", nargs="+",
                    default=["auto", "device", "cpu"])
    ap.add_argument("--cpu-backend", action="store_true",
                    help="force the JAX CPU backend (logic check)")
    args = ap.parse_args()
    if args.cpu_backend:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    # power-law degrees: per-node sampled-subgraph sizes vary widely, so
    # size-predictive routing has a real signal (reference Reddit setup)
    n = args.nodes
    w = rng.pareto(1.5, n) + 1.0
    deg = np.maximum((w / w.sum() * (n * 12)).astype(np.int64), 1)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.shape[0])
    topo = CSRTopo(edge_index=np.stack([rows, cols]), num_nodes=n)
    classes = 8
    labels = rng.integers(0, classes, n)
    feat = np.concatenate([
        np.eye(classes, dtype=np.float32)[labels],
        rng.normal(size=(n, 24)).astype(np.float32)], axis=1)
    feat_j = jnp.asarray(feat)

    # "prepare" phase (reference prepare_data.py): model params + the
    # per-node workload table.
    dev_sampler = NeighborSampler(topo, args.fanout, seed=0)
    model = GraphSAGE(hidden_features=128, out_features=classes,
                      num_layers=len(args.fanout), dropout=0.0)
    b0 = dev_sampler.sample(np.arange(64))
    params = model.init(jax.random.PRNGKey(0),
                        feat_j[jnp.clip(b0.n_id, 0, n - 1)], b0.adjs)

    cpu_prof = NeighborSampler(topo, args.fanout, mode="CPU", dedup="none")
    t0 = time.time()
    nn_table = generate_neighbour_num(cpu_prof, batch_size=4096)
    print(f"neighbour_num table in {time.time()-t0:.1f}s "
          f"(mean {nn_table.mean():.1f}, p95 {np.percentile(nn_table,95):.0f})")

    apply_j = jax.jit(model.apply)  # shape-keyed cache per seed bucket

    def infer_fn(seeds, presampled):
        batch = presampled or dev_sampler.sample(seeds)
        x = feat_j[jnp.clip(jnp.asarray(np.asarray(batch.n_id)), 0, n - 1)]
        out = apply_j(params, x, batch.adjs)
        return np.asarray(out)[: len(seeds)]

    trace = make_trace(rng, n, args.requests, args.rate)
    # calibrate: route requests above the trace-median predicted cost to
    # the device (generate_neighbour_num percentiles, reference
    # serving.py:88-95)
    costs = [float(np.take(nn_table, s, mode="clip").sum())
             for s, _ in trace]
    threshold = float(np.percentile(costs, 50))
    print(f"routing threshold = trace-median predicted cost "
          f"{threshold:.0f} nodes")

    results = {}
    for mode in args.modes:
        m = run_mode(mode, trace, topo, args.fanout, nn_table, threshold,
                     infer_fn, args.cpu_workers)
        results[mode] = m
        print(f"{mode:>7}: p50 {m['p50_ms']:7.1f} ms   "
              f"p99 {m['p99_ms']:7.1f} ms   "
              f"{m['throughput_rps']:6.1f} req/s   "
              f"{m['seeds_per_s']:7.0f} seeds/s")

    if {"auto", "device", "cpu"} <= results.keys():
        a, d, c = results["auto"], results["device"], results["cpu"]
        print(f"auto p99 vs device-only: {d['p99_ms']/a['p99_ms']:.2f}x, "
              f"vs cpu-only: {c['p99_ms']/a['p99_ms']:.2f}x  "
              f"(>1 = auto wins)")
    sys.stdout.flush()
    import os
    os._exit(0)  # skip teardown races between daemon threads and runtime


if __name__ == "__main__":
    main()
