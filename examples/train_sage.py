"""End-to-end sampled GraphSAGE training (the reference's
examples/pyg/reddit_quiver.py:24-123 flow, TPU-native).

Usage:
  python examples/train_sage.py --dataset synthetic [--epochs 3]
  python examples/train_sage.py --dataset /data/ogbn-products   # OGB dir
  python examples/train_sage.py --dataset /data/products.npz    # artifact

``--dataset <path>`` loads a real OGB-format directory or a saved
``quiver_tpu.datasets`` npz artifact (no ogb package needed). With no
public-dataset egress in this environment, the default dataset is a
planted-community graph whose labels are learnable from structure
+ features, so accuracy is a real end-to-end signal.
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

quiver_tpu.enable_compilation_cache()
from quiver_tpu.models import GraphSAGE


def community_graph(rng, n, deg, classes=16, d=64, noise=0.7):
    labels = rng.integers(0, classes, n)
    order = np.argsort(labels, kind="stable")
    bounds = np.searchsorted(labels[order], np.arange(classes + 1))
    rows = np.repeat(np.arange(n), deg)
    cols = np.empty(n * deg, np.int64)
    same = rng.random(n * deg) < 0.8
    # same-community targets: uniform within the label's contiguous range
    lab = labels[rows]
    lo, hi = bounds[lab], bounds[lab + 1]
    cols_same = order[(lo + (rng.random(n * deg) * (hi - lo)).astype(np.int64))
                      .clip(0, n - 1)]
    cols_rand = rng.integers(0, n, n * deg)
    cols = np.where(same, cols_same, cols_rand)
    feat = np.eye(classes, dtype=np.float32)[labels]
    feat += rng.normal(scale=noise, size=feat.shape).astype(np.float32)
    feat = np.concatenate(
        [feat, rng.normal(size=(n, d - classes)).astype(np.float32)], 1)
    topo = CSRTopo(edge_index=np.stack([rows, cols]), num_nodes=n)
    return topo, feat.astype(np.float32), labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--deg", type=int, default=15)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--fanout", type=int, nargs="+", default=[15, 10])
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--dataset", default="synthetic")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.dataset == "synthetic":
        topo, feat, labels = community_graph(rng, args.nodes, args.deg)
        n = topo.node_count
        train_idx = rng.permutation(n)[: int(0.8 * n)]
        test_idx = np.setdiff1d(np.arange(n), train_idx)
    else:
        from quiver_tpu.datasets import load_dataset
        ds = load_dataset(args.dataset)
        topo, feat, labels = ds.topo, ds.feat, ds.labels
        n = topo.node_count
        train_idx, test_idx = ds.train_idx, ds.test_idx
    classes = int(labels.max()) + 1
    print(f"graph: {n} nodes, {topo.edge_count} edges, {classes} classes, "
          f"devices={jax.devices()}")

    sampler = NeighborSampler(topo, args.fanout, mode="TPU", seed=0)
    model = GraphSAGE(hidden_features=args.hidden, out_features=classes,
                      num_layers=len(args.fanout), dropout=0.5)

    b0 = sampler.sample(train_idx[: args.batch_size])
    feat_j = jnp.asarray(feat)
    labels_j = jnp.asarray(labels)
    x0 = feat_j[jnp.clip(b0.n_id, 0, n - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, adjs, y, key):
        def loss_fn(p):
            logits = model.apply(p, x, adjs, train=True,
                                 rngs={"dropout": key})[: y.shape[0]]
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    @jax.jit
    def infer(params, x, adjs):
        return model.apply(params, x, adjs)

    key = jax.random.PRNGKey(1)
    bs = args.batch_size
    for epoch in range(args.epochs):
        if epoch > 0:
            sampler.reshuffle()   # refresh the window family per epoch
        t0, seen, acc_sum, loss_sum, steps = time.time(), 0, 0.0, 0.0, 0
        perm = rng.permutation(train_idx)
        for s in range(0, len(perm) - bs + 1, bs):
            seeds = perm[s: s + bs]
            b = sampler.sample(seeds)
            x = feat_j[jnp.clip(b.n_id, 0, n - 1)]
            y = labels_j[jnp.asarray(seeds)]
            key, sub = jax.random.split(key)
            params, opt_state, loss, logits = step(params, opt_state, x,
                                                   b.adjs, y, sub)
            acc_sum += float((logits.argmax(-1) == y).mean())
            loss_sum += float(loss)
            steps += 1
            seen += bs
        dt = time.time() - t0
        print(f"epoch {epoch}: loss {loss_sum/steps:.4f} "
              f"train-acc {acc_sum/steps:.4f} "
              f"({seen/dt:.0f} seeds/s, {dt:.1f}s)")

    # test accuracy via sampled inference
    correct = tot = 0
    for s in range(0, len(test_idx) - bs + 1, bs):
        seeds = test_idx[s: s + bs]
        b = sampler.sample(seeds)
        x = feat_j[jnp.clip(b.n_id, 0, n - 1)]
        logits = infer(params, x, b.adjs)[:bs]
        correct += int((np.asarray(logits.argmax(-1))
                        == labels[seeds]).sum())
        tot += bs
    print(f"test accuracy: {correct / max(tot,1):.4f}")


if __name__ == "__main__":
    main()
