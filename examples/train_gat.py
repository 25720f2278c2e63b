"""GAT training with weighted neighbor sampling (the reference's
ogbn-products GAT + weight_sample config; GAT model per
benchmarks/ogbn-mag240m/train_quiver_multi_node.py:188-246).

  python examples/train_gat.py [--epochs 2]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

import quiver_tpu
from quiver_tpu import CSRTopo, NeighborSampler
from quiver_tpu.models import GAT
from examples.train_sage import community_graph

quiver_tpu.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--fanout", type=int, nargs="+", default=[10, 5])
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--weighted", action="store_true", default=True)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    topo, feat, labels = community_graph(rng, args.nodes, 12)
    # random positive edge weights -> weighted inverse-CDF sampling
    topo.edge_weight_ = rng.random(topo.edge_count).astype(np.float32) + 0.1
    n = topo.node_count
    classes = int(labels.max()) + 1

    sampler = NeighborSampler(topo, args.fanout, weighted=args.weighted,
                              seed=0, dedup="none")
    model = GAT(hidden_features=64, out_features=classes,
                num_layers=len(args.fanout), heads=args.heads, dropout=0.0)

    feat_j = jnp.asarray(feat)
    labels_j = jnp.asarray(labels)
    b0 = sampler.sample(np.arange(args.batch_size))
    x0 = feat_j[jnp.clip(b0.n_id, 0, n - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, adjs, y):
        def loss_fn(p):
            logits = model.apply(p, x, adjs)[: y.shape[0]]
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    bs = args.batch_size
    train_idx = rng.permutation(n)[: int(0.8 * n)]
    for epoch in range(args.epochs):
        t0, accs, losses = time.time(), [], []
        perm = rng.permutation(train_idx)
        for s in range(0, len(perm) - bs + 1, bs):
            seeds = perm[s: s + bs]
            b = sampler.sample(seeds)
            x = feat_j[jnp.clip(b.n_id, 0, n - 1)]
            y = labels_j[jnp.asarray(seeds)]
            params, opt_state, loss, logits = step(params, opt_state, x,
                                                   b.adjs, y)
            losses.append(float(loss))
            accs.append(float((logits.argmax(-1) == y).mean()))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"acc {np.mean(accs):.4f} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
