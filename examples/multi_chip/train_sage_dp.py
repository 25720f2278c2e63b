"""Multi-chip data-parallel GraphSAGE training (the reference's
examples/multi_gpu/pyg/ogb-products/dist_sampling_ogb_products_quiver.py
flow, TPU-native: no mp.spawn, no IPC, no DDP — one process, one mesh).

Runs on real chips or a virtual mesh:
  python examples/multi_chip/train_sage_dp.py            # real devices
  python examples/multi_chip/train_sage_dp.py --virtual 8  # CPU mesh
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (testing)")
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--deg", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--fanout", type=int, nargs="+", default=[10, 5])
    ap.add_argument("--partitioned", action="store_true",
                    help="use DistNeighborSampler over a node partition")
    args = ap.parse_args()

    import os
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
    from quiver_tpu.models import GraphSAGE
    from quiver_tpu.parallel import (
        DistNeighborSampler, stack_batches, replicate, shard_leading,
        make_dp_train_step)
    from examples.train_sage import community_graph

    quiver_tpu.enable_compilation_cache()
    devices = jax.devices()
    n_dev = len(devices)
    mesh = Mesh(np.array(devices), ("data",))
    print(f"mesh: {n_dev} x {devices[0].device_kind}")

    rng = np.random.default_rng(0)
    topo, feat, labels = community_graph(rng, args.nodes, args.deg)
    n = topo.node_count
    classes = int(labels.max()) + 1
    feat_j = jnp.asarray(feat)

    if args.partitioned:
        g2h = rng.integers(0, n_dev, n)
        dist_sampler = DistNeighborSampler(mesh, topo, g2h, args.fanout)
        sample_all = lambda seed_mat: dist_sampler.sample(seed_mat)
    else:
        samplers = [NeighborSampler(topo, args.fanout, seed=d)
                    for d in range(n_dev)]
        sample_all = lambda seed_mat: [s.sample(row) for s, row in
                                       zip(samplers, seed_mat)]

    model = GraphSAGE(hidden_features=128, out_features=classes,
                      num_layers=len(args.fanout), dropout=0.0)
    tx = optax.adam(1e-3)

    bs = args.batch_size
    seeds0 = np.stack([rng.choice(n, bs, replace=False)
                       for _ in range(n_dev)])
    batches = sample_all(seeds0)
    x0 = feat_j[jnp.clip(batches[0].n_id, 0, n - 1)]
    params = replicate(model.init(jax.random.PRNGKey(0), x0,
                                  batches[0].adjs), mesh)
    opt_state = replicate(tx.init(params), mesh)
    step = make_dp_train_step(model, tx, mesh)

    train_idx = rng.permutation(n)[: int(0.8 * n)]
    steps_per_epoch = len(train_idx) // (bs * n_dev)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        perm = rng.permutation(train_idx)
        for s in range(steps_per_epoch):
            lo = s * bs * n_dev
            seed_mat = perm[lo: lo + bs * n_dev].reshape(n_dev, bs)
            batches = sample_all(seed_mat)
            adjs = shard_leading(stack_batches([b.adjs for b in batches]),
                                 mesh)
            x = shard_leading(jnp.stack(
                [feat_j[jnp.clip(b.n_id, 0, n - 1)] for b in batches]), mesh)
            y = shard_leading(jnp.asarray(labels[seed_mat]), mesh)
            params, opt_state, loss = step(params, opt_state, x, adjs, y)
            losses.append(float(loss))
        dt = time.time() - t0
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({steps_per_epoch * bs * n_dev / dt:.0f} seeds/s, {dt:.1f}s)")


if __name__ == "__main__":
    main()
