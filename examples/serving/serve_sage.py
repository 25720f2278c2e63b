"""End-to-end GNN serving demo (the reference's
examples/serving/reddit/reddit_serving.py flow, TPU-native):
workload table -> request batcher (size-predictive routing) -> hybrid
CPU samplers + device inference loop -> p99/throughput report.

  python examples/serving/serve_sage.py [--requests 200]
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
    RequestBatcher, HybridSampler, InferenceServer, generate_neighbour_num)
from examples.train_sage import community_graph

quiver_tpu.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--fanout", type=int, nargs="+", default=[15, 10])
    ap.add_argument("--cpu-workers", type=int, default=2)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    topo, feat, labels = community_graph(rng, args.nodes, 12)
    n = topo.node_count
    classes = int(labels.max()) + 1
    feat_j = jnp.asarray(feat)

    # "prepare" phase (reference prepare_data.py): init model params +
    # build the per-node workload table.
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

    threshold = float(np.percentile(nn_table, 90)) * 4
    inq = queue.Queue()
    rb = RequestBatcher(inq, neighbour_num=nn_table, threshold=threshold,
                        mode="auto")
    hybrid = HybridSampler(
        rb.cpu_queue,
        sampler_factory=lambda: NeighborSampler(topo, args.fanout,
                                                mode="CPU", dedup="none"),
        num_workers=args.cpu_workers)
    server = InferenceServer(rb.device_queue, hybrid.sampled_queue,
                             infer_fn, coalesce_max_seeds=256)

    from quiver_tpu.serving import ServerMetrics

    def wave(tag, count):
        for i in range(count):
            size = int(rng.integers(1, 32))
            seeds = rng.integers(0, n, size)
            inq.put((i, seeds, time.time()))
        got = 0
        while got < count:
            server.result_queue.get(timeout=300)
            got += 1
        m = server.metrics.summary()
        print(f"{tag}: {m['requests']} requests, avg {m['avg_ms']:.1f} ms, "
              f"p50 {m['p50_ms']:.1f} ms, p99 {m['p99_ms']:.1f} ms, "
              f"{m['throughput_rps']:.1f} req/s, "
              f"{m['seeds_per_s']:.0f} seeds/s")

    # two warmup waves: the second compiles the coalesced-bucket shapes
    wave("warmup 1 (per-bucket compiles)", max(args.requests // 4, 8))
    wave("warmup 2 (coalesced buckets)", max(args.requests // 2, 16))
    server.metrics = ServerMetrics()
    wave("steady", args.requests)
    rb.stop()
    import os
    sys.stdout.flush()
    os._exit(0)  # skip teardown races between daemon threads and the runtime


if __name__ == "__main__":
    main()
