"""Heterogeneous (typed-edge) GNN training — the MAG240M-style config
(reference benchmarks/ogbn-mag240m: paper/author/institution graph with
typed edges, R-GCN-style model).

Synthetic hetero graph: nodes carry one of R relation types per edge;
``RGCN`` transforms messages per relation. Edge types ride along as a
per-lane array aligned with each DenseBlock.

``--mmap`` reproduces the MAG240M feature story (reference
benchmarks/ogbn-mag240m/train_quiver_multi_node.py:120-131,325-334):
the feature table lives in an on-disk .npy, sorted hot-first; only the
device-cache prefix is loaded to HBM and every cold row pages in from
the memory map at lookup time — the table never materializes in host
RAM.

  python examples/hetero/train_rgcn.py [--epochs 2] [--mmap]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp
import optax

import quiver_tpu
from quiver_tpu import CSRTopo, NeighborSampler
from quiver_tpu.models import RGCN
from examples.train_sage import community_graph

quiver_tpu.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=8000)
    ap.add_argument("--relations", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--fanout", type=int, nargs="+", default=[8, 4])
    ap.add_argument("--mmap", action="store_true",
                    help="serve features from an on-disk mmap with a "
                         "small device cache (MAG240M pattern)")
    ap.add_argument("--cache-rows", type=int, default=1000)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    topo, feat, labels = community_graph(rng, args.nodes, 10)
    n = topo.node_count
    classes = int(labels.max()) + 1
    R = args.relations
    # per-CSR-slot relation type (typed edges)
    edge_type = rng.integers(0, R, topo.edge_count).astype(np.int32)

    # exact sampling keeps e_id = CSR slot -> direct edge_type lookup
    sampler = NeighborSampler(topo, args.fanout, seed=0, dedup="none",
                              sampling="exact")
    model = RGCN(hidden_features=64, out_features=classes,
                 num_layers=len(args.fanout), num_relations=R, dropout=0.0)

    if args.mmap:
        import tempfile
        from quiver_tpu import Feature
        # hot-first on-disk order (degree-ordered, like the reference's
        # preprocessed sorted feature file)
        order = np.argsort(-np.asarray(topo.degree), kind="stable")
        old2new = np.empty(n, np.int64)
        old2new[order] = np.arange(n)
        path = Path(tempfile.mkdtemp(prefix="quiver_mmap_")) / "feat.npy"
        np.save(path, feat[order])
        store = Feature.from_mmap(
            str(path),
            device_cache_size=args.cache_rows * feat.shape[1] * 4)
        store.feature_order = old2new
        print(f"mmap feature store: {store.hot_rows}/{n} rows on device, "
              f"rest page from {path}")

        def get_x(n_id):
            return store[np.clip(np.asarray(n_id), 0, n - 1)]
    else:
        feat_j = jnp.asarray(feat)

        def get_x(n_id):
            return feat_j[jnp.clip(n_id, 0, n - 1)]

    labels_j = jnp.asarray(labels)
    etype_j = jnp.asarray(edge_type)

    def block_etypes(batch):
        # per-lane edge types, aligned with each DenseBlock's e_id
        return tuple(etype_j[jnp.clip(blk.e_id, 0, topo.edge_count - 1)]
                     for blk in batch.adjs)

    b0 = sampler.sample(np.arange(args.batch_size))
    x0 = get_x(b0.n_id)
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs,
                        block_etypes(b0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, adjs, etypes, y):
        def loss_fn(p):
            logits = model.apply(p, x, adjs, etypes)[: y.shape[0]]
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
            x = get_x(b.n_id)
            y = labels_j[jnp.asarray(seeds)]
            params, opt_state, loss, logits = step(
                params, opt_state, x, b.adjs, block_etypes(b), y)
            losses.append(float(loss))
            accs.append(float((logits.argmax(-1) == y).mean()))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"acc {np.mean(accs):.4f} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
