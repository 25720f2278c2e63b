"""Multi-host pipeline: probability partition -> artifacts -> distributed
training (the reference's benchmarks/ogbn-papers100M flow, TPU-native).

Reference pipeline (preprocess.py:118-211 + train_quiver_multi_node.py):
  1. per host: sampler.sample_prob(train split) -> access probabilities
  2. partition_without_replication -> global2host / local_order artifacts
  3. runtime: DistFeature NCCL exchange + per-host UVA sampling.
TPU rebuild, same offline steps then:
  * build_graph_shards streams the COO once into per-host CSR artifacts
    (no host ever holds the full graph — the >host-memory story),
  * DistNeighborSampler.from_shards samples the partitioned graph with
    one all_to_all pair per hop,
  * DistFeature resolves every host's frontier features concurrently
    (partitioned tables, one collective pair),
  * data-parallel train step over the same mesh.
Runs on a virtual CPU mesh for CI:

  python examples/multi_host/preprocess_and_train.py --virtual 8
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0)
    ap.add_argument("--nodes", type=int, default=12000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--fanout", type=int, nargs="+", default=[8, 4])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.virtual}")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    import quiver_tpu
    from quiver_tpu import CSRTopo, NeighborSampler
    from quiver_tpu.feature import PartitionInfo, DistFeature
    from quiver_tpu.partition import quiver_partition_feature
    from quiver_tpu.models import GraphSAGE
    from quiver_tpu.parallel import (
        DistNeighborSampler, build_graph_shards, stack_batches, replicate,
        shard_leading, make_dp_train_step)
    from examples.train_sage import community_graph

    quiver_tpu.enable_compilation_cache()
    devices = jax.devices()
    H = len(devices)
    mesh = Mesh(np.array(devices), ("data",))
    print(f"hosts (mesh devices): {H}")

    rng = np.random.default_rng(0)
    topo, feat, labels = community_graph(rng, args.nodes, args.deg)
    n = topo.node_count
    classes = int(labels.max()) + 1

    # ---- offline: per-host access probabilities -> partition artifacts
    t0 = time.time()
    prob_sampler = NeighborSampler(topo, args.fanout, mode="TPU")
    train_idx = rng.permutation(n)[: int(0.8 * n)]
    host_splits = np.array_split(train_idx, H)
    probs = [np.asarray(prob_sampler.sample_prob(split, n))
             for split in host_splits]
    outdir = args.outdir or tempfile.mkdtemp(prefix="quiver_parts_")
    parts, book, orders = quiver_partition_feature(
        probs, outdir, cache_memory_budget="64K", per_feature_size=64 * 4)
    # unassigned (never-accessed) nodes -> round-robin
    book = np.where(book < 0, np.arange(n) % H, book)
    own_mass = sum(probs[h][parts[h]].sum() for h in range(H))
    tot_mass = sum(p.sum() for p in probs)
    print(f"partition in {time.time()-t0:.1f}s -> {outdir}; "
          f"own-probability mass {own_mass/tot_mass:.2f}")

    # ---- offline: stream the COO into per-host CSR shard artifacts
    # (peak memory = one host's edges; the sampler never sees full CSR)
    t0 = time.time()
    coo_row = np.repeat(np.arange(n), np.diff(topo.indptr))
    coo_col = np.asarray(topo.indices)
    bounds = np.linspace(0, topo.edge_count, 17).astype(int)
    chunks = ((coo_row[a:b], coo_col[a:b])
              for a, b in zip(bounds[:-1], bounds[1:]))
    shard_dir = build_graph_shards(os.path.join(outdir, "shards"), book,
                                   chunks)
    print(f"graph shards in {time.time()-t0:.1f}s -> {shard_dir}")

    # ---- runtime: partitioned distributed sampling + partitioned
    # feature exchange + DP training
    dist = DistNeighborSampler.from_shards(mesh, shard_dir, args.fanout,
                                           seed=0, req_slack=2.0)
    # per-host feature tables in the partition's local order
    info = PartitionInfo(host=0, hosts=H, global2host=book)
    rows_max = int(info.local_sizes.max())
    D = feat.shape[1]
    tables = np.zeros((H, rows_max, D), feat.dtype)
    for h in range(H):
        ids = np.where(book == h)[0]
        tables[h, :len(ids)] = feat[ids]
    dist_feat = DistFeature(mesh, tables, info)

    model = GraphSAGE(hidden_features=64, out_features=classes,
                      num_layers=len(args.fanout), dropout=0.0)
    tx = optax.adam(1e-3)

    def gather_x(batches):
        """Every host's frontier resolved in ONE concurrent exchange."""
        ids_per_host = [np.clip(np.asarray(b.n_id), 0, n - 1)
                        for b in batches]
        outs = dist_feat.exchange(ids_per_host)
        return jnp.stack([jnp.asarray(o) for o in outs])

    bs = args.batch_size
    seeds0 = np.stack([rng.choice(n, bs, replace=False) for _ in range(H)])
    batches = dist.sample(seeds0)
    x0 = gather_x(batches)[0]
    params = replicate(model.init(jax.random.PRNGKey(0), x0,
                                  batches[0].adjs), mesh)
    opt_state = replicate(tx.init(params), mesh)
    step = make_dp_train_step(model, tx, mesh)

    t0, losses = time.time(), []
    for s in range(args.steps):
        seed_mat = np.stack([rng.choice(n, bs, replace=False)
                             for _ in range(H)])
        batches = dist.sample(seed_mat)
        adjs = shard_leading(stack_batches([b.adjs for b in batches]), mesh)
        x = shard_leading(gather_x(batches), mesh)
        y = shard_leading(jnp.asarray(labels[seed_mat]), mesh)
        params, opt_state, loss = step(params, opt_state, x, adjs, y)
        losses.append(float(loss))
    seeds_per_s = args.steps * bs * H / (time.time() - t0)
    print(f"{args.steps} dist steps: loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"({seeds_per_s:.0f} seeds/s)")
    import json
    print(json.dumps({
        "metric": "multihost_pipeline", "hosts": H,
        "backend": jax.default_backend(),
        "nodes": n, "edges": int(topo.edge_count),
        "batch_size": bs, "steps": args.steps,
        "loss_first": round(losses[0], 3), "loss_last": round(losses[-1], 3),
        "seeds_per_s": round(seeds_per_s, 1)}))


if __name__ == "__main__":
    main()
