"""At-scale model-quality evidence: 100k-node / 1M-edge planted-
community graph through the PRODUCTION pipelines, with accuracy and
loss-curve assertions (the stand-in for the reference's published
~0.787 ogbn-products accuracy,
examples/multi_gpu/pyg/ogb-products/dist_sampling_ogb_products_quiver.py:1
— this environment has no dataset egress, so quality is pinned by a
planted-signal graph two orders of magnitude above the committed
800-node test fixture).

Two configurations, both asserted:
  strict  — per-hop-dedup exact sampler (the reference-parity semantic
            pipeline) + device feature table;
  tiered  — window sampler + tiered ``Feature`` whose device budget
            holds only ~25% of the rows (cold tier exercised every
            batch, bf16 cold transfer), via make_feature_train_step —
            the >HBM training configuration
            (reference docs/Introduction_en.md:144-149).

Emits QUALITY_BENCH.json and exits nonzero if quality regresses.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

import quiver_tpu
from quiver_tpu import CSRTopo, Feature, NeighborSampler
from quiver_tpu.models import GraphSAGE
from quiver_tpu.train import make_feature_train_step, make_sampled_train_step


def planted_fixture(n=100_000, deg=10, d=64, classes=8, seed=42):
    """Planted-community SBM (80% intra-community edges) with noisy
    class-indicator features — same generator family as
    tests/test_convergence.py, scaled 125x."""
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, classes, n)
    rows = np.repeat(np.arange(n), deg)
    same = rng.random(n * deg) < 0.8
    pools = [np.where(comm == c)[0] for c in range(classes)]
    cols = np.empty(n * deg, np.int64)
    for c in range(classes):
        m = (comm[rows] == c) & same
        cols[m] = rng.choice(pools[c], m.sum())
    cols[~same] = rng.integers(0, n, (~same).sum())
    topo = CSRTopo(edge_index=np.stack([rows, cols]), num_nodes=n)
    feat = (np.eye(classes)[comm] * 1.0
            + rng.normal(0, 2.0, (n, classes))).astype(np.float32)
    feat = np.concatenate(
        [feat, rng.normal(0, 1.0, (n, d - classes)).astype(np.float32)], 1)
    return topo, feat, comm


def evaluate(model, params, sampler, feat_dev, labels, n, bs=1024):
    correct = 0
    for i in range(0, n, bs):
        seeds = np.arange(i, min(i + bs, n))
        b = sampler.sample(seeds)
        x = feat_dev[jnp.clip(b.n_id, 0, n - 1)]
        logits = model.apply(params, x, b.adjs)[: len(seeds)]
        correct += int((np.asarray(logits.argmax(-1))
                        == labels[seeds]).sum())
    return correct / n


def run_strict(topo, feat, labels, epochs=3, bs=1024, seed=0):
    n = topo.node_count
    sampler = NeighborSampler(topo, [10, 5], mode="TPU", seed=seed,
                              dedup="none", sampling="exact")
    strict = NeighborSampler(topo, [10, 5], mode="TPU", seed=seed,
                             dedup="per_hop")
    model = GraphSAGE(hidden_features=128, out_features=8, num_layers=2,
                      dropout=0.0)
    tx = optax.adam(1e-2)
    feat_j = jnp.asarray(feat)
    labels_np = np.asarray(labels)

    # train THROUGH the strict per-hop-dedup pipeline (compact batches)
    step = make_feature_train_step(model, tx, strict,
                                   _DeviceTable(feat_j), labels_np)
    b0 = strict.sample(np.arange(bs))
    params = model.init(jax.random.PRNGKey(seed),
                        feat_j[jnp.clip(b0.n_id, 0, n - 1)], b0.adjs)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    losses = []
    t0 = time.time()
    for epoch in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            key, sub = jax.random.split(key)
            params, opt_state, loss, _ = step(params, opt_state,
                                              order[i:i + bs], sub)
            losses.append(float(loss))
    dt = time.time() - t0
    acc = evaluate(model, params, sampler, feat_j, labels_np, n)
    return losses, acc, dt


class _DeviceTable:
    """Minimal feature[-like] wrapper: whole table on device (the
    strict run isolates sampler semantics from the tier)."""

    def __init__(self, table):
        self.table = table
        self.shape = table.shape

    def __getitem__(self, ids):
        return jnp.take(self.table, jnp.clip(ids, 0, self.shape[0] - 1),
                        axis=0)

    def prefetch(self, ids):
        return None


def run_tiered(topo, feat, labels, epochs=3, bs=1024, seed=0):
    """Strict (per-hop-dedup) sampler + tiered Feature: device budget
    holds ~25% of rows (hot by degree), the rest served from host with
    bf16 cold transfer — every batch exercises the cold tier."""
    import ml_dtypes
    n = topo.node_count
    sampler = NeighborSampler(topo, [10, 5], mode="TPU", seed=seed,
                              dedup="per_hop")
    eval_sampler = NeighborSampler(topo, [10, 5], mode="TPU", seed=seed,
                                   dedup="none", sampling="exact")
    model = GraphSAGE(hidden_features=128, out_features=8, num_layers=2,
                      dropout=0.0)
    tx = optax.adam(1e-2)
    row_bytes = feat.shape[1] * 4
    quarter = n // 4 * row_bytes
    f = Feature(rank=0, device_cache_size=quarter, csr_topo=topo,
                cold_transfer_dtype=ml_dtypes.bfloat16)
    f.from_cpu_tensor(feat)
    labels_np = np.asarray(labels)
    step = make_feature_train_step(model, tx, sampler, f, labels_np)

    feat_j = jnp.asarray(feat)   # eval-only convenience
    b0 = sampler.sample(np.arange(bs))
    params = model.init(jax.random.PRNGKey(seed),
                        feat_j[jnp.clip(b0.n_id, 0, n - 1)], b0.adjs)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    losses = []
    t0 = time.time()
    for epoch in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            key, sub = jax.random.split(key)
            params, opt_state, loss, _ = step(params, opt_state,
                                              order[i:i + bs], sub)
            losses.append(float(loss))
    dt = time.time() - t0
    acc = evaluate(model, params, eval_sampler, feat_j, labels_np, n)
    hits = {k: int(v) for k, v in getattr(f, "stats", {}).items()}
    return losses, acc, dt, hits


def main():
    quiver_tpu.enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    topo, feat, labels = planted_fixture()
    n, E = topo.node_count, int(topo.indices.shape[0])
    print(f"fixture: {n} nodes, {E} edges, d={feat.shape[1]}",
          file=sys.stderr, flush=True)

    s_losses, s_acc, s_dt = run_strict(topo, feat, labels)
    print(f"strict: acc={s_acc:.3f}, loss {np.mean(s_losses[:10]):.3f} "
          f"-> {np.mean(s_losses[-10:]):.3f}, {s_dt:.0f}s",
          file=sys.stderr, flush=True)

    t_losses, t_acc, t_dt, hits = run_tiered(topo, feat, labels)
    print(f"tiered: acc={t_acc:.3f}, loss {np.mean(t_losses[:10]):.3f} "
          f"-> {np.mean(t_losses[-10:]):.3f}, {t_dt:.0f}s, {hits}",
          file=sys.stderr, flush=True)

    checks = {
        "strict_loss_falls": float(np.mean(s_losses[-10:]))
        < 0.7 * float(np.mean(s_losses[:10])),
        "strict_acc_ok": s_acc > 0.84,
        "tiered_loss_falls": float(np.mean(t_losses[-10:]))
        < 0.7 * float(np.mean(t_losses[:10])),
        "tiered_acc_ok": t_acc > 0.84,
        "tiered_matches_strict": abs(t_acc - s_acc) < 0.05,
    }
    rec = {"metric": "quality_at_scale", "nodes": n, "edges": E,
           "epochs": 3,
           "strict": {"acc": round(s_acc, 4),
                      "loss_first10": round(float(np.mean(s_losses[:10])), 3),
                      "loss_last10": round(float(np.mean(s_losses[-10:])), 3),
                      "train_s": round(s_dt, 1)},
           "tiered": {"acc": round(t_acc, 4),
                      "loss_first10": round(float(np.mean(t_losses[:10])), 3),
                      "loss_last10": round(float(np.mean(t_losses[-10:])), 3),
                      "train_s": round(t_dt, 1),
                      "hot_fraction": 0.25,
                      "cold_transfer": "bf16"},
           "checks": checks, "all_pass": all(checks.values())}
    Path(__file__).resolve().parent.parent.joinpath(
        "QUALITY_BENCH.json").write_text(json.dumps(rec, indent=1) + "\n")
    print(json.dumps({"metric": "quality_at_scale",
                      "strict_acc": rec["strict"]["acc"],
                      "tiered_acc": rec["tiered"]["acc"],
                      "all_pass": rec["all_pass"]}))
    sys.exit(0 if rec["all_pass"] else 1)


if __name__ == "__main__":
    main()
