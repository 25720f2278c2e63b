"""Unsupervised GraphSAGE: link-prediction objective with negative
sampling (the reference's examples/pyg/graph_sage_unsup_quiver.py flow).

Loss (Hamilton et al. 2017): for each seed u with sampled positive
co-occurring node v and negatives n_i,
  L = -log sigma(z_u . z_v) - sum_i log sigma(-z_u . z_{n_i})

Positives here are 1-hop neighbors (random walk length 1); negatives
are uniform nodes. Embedding quality is verified by ranking positives
above negatives (AUC-style).

  python examples/graph_sage_unsup.py [--epochs 3]
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
from quiver_tpu.models import GraphSAGE
from examples.train_sage import community_graph

quiver_tpu.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--fanout", type=int, nargs="+", default=[10, 5])
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--negatives", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    topo, feat, labels = community_graph(rng, args.nodes, 12)
    n = topo.node_count
    feat_j = jnp.asarray(feat)

    sampler = NeighborSampler(topo, args.fanout, seed=0)
    model = GraphSAGE(hidden_features=args.dim, out_features=args.dim,
                      num_layers=len(args.fanout), dropout=0.0)

    bs, K = args.batch_size, args.negatives
    b0 = sampler.sample(np.arange(3 * bs))  # [u | v_pos | extra]
    x0 = feat_j[jnp.clip(b0.n_id, 0, n - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, adjs, neg_ids_z):
        def loss_fn(p):
            z = model.apply(p, x, adjs)          # [3bs, dim] seeds-first
            zu, zv = z[:bs], z[bs:2 * bs]
            zneg = neg_ids_z                      # [bs, K, dim] (stopgrad'd? no: separate fwd below)
            pos = jnp.sum(zu * zv, -1)
            # negatives: reuse the third block's embeddings cyclically
            zn = z[2 * bs:3 * bs]
            idx = (jnp.arange(bs)[:, None] + jnp.arange(1, K + 1)[None, :]) % bs
            neg = jnp.einsum("bd,bkd->bk", zu, zn[idx])
            loss = (-jax.nn.log_sigmoid(pos).mean()
                    - jax.nn.log_sigmoid(-neg).mean())
            return loss, (pos, neg)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def pos_pairs(batch_seeds):
        """1-hop random-walk positives via the CSR."""
        v = np.empty_like(batch_seeds)
        for i, u in enumerate(batch_seeds):
            lo, hi = topo.indptr[u], topo.indptr[u + 1]
            v[i] = (topo.indices[rng.integers(lo, hi)] if hi > lo else u)
        return v

    for epoch in range(args.epochs):
        t0, losses, aucs = time.time(), [], []
        perm = rng.permutation(n)
        for s in range(0, n - bs + 1, bs):
            u = perm[s: s + bs]
            v = pos_pairs(u)
            negs = rng.integers(0, n, bs)        # third block: negatives
            seeds = np.concatenate([u, v, negs])
            b = sampler.sample(seeds)
            x = feat_j[jnp.clip(b.n_id, 0, n - 1)]
            params, opt_state, loss, (pos, neg) = step(params, opt_state,
                                                       x, b.adjs, None)
            losses.append(float(loss))
            aucs.append(float((pos[:, None] > neg).mean()))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"pos>neg {np.mean(aucs):.3f} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
