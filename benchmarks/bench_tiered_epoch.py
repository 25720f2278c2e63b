"""Epoch benchmark with a feature table LARGER THAN HBM (16 GB on this
v5e): the configuration that is the reference's headline
(ogbn-papers100M tiered epoch, docs/Introduction_en.md:144-149 — GPU
cache + pinned-CPU cold tier).

Default shape: V=5.5M x D=768 f32 = 16.9 GB table (> 16 GB HBM), hot
tier = device budget of 2 GB (~13% of rows, degree-ordered), cold tier
in host RAM, graph 44M edges on device, 1 epoch over a 100k-seed train
split (papers100M-style: the train split is ~1% of the node space).

Environment note: the axon tunnel moves BULK host->device bytes at
~0.8 GB/s (measured; a real TPU host's PCIe is ~20x faster) and small
scattered batches at ~0.05 GB/s, so the one-time 2 GB hot-tier load is
a few seconds while the per-step cold-miss transfer is the dominant
steady-state cost — exactly the cost the design minimizes (f16 cold
transfer, misses only, prefetch overlap).

Emits the epoch_tiered record merged into FEATURE_BENCH.json.
"""
from __future__ import annotations

import argparse
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


def build(V, D, deg, hot_bytes, seed=0):
    rng = np.random.default_rng(seed)
    # power-law out-degrees via preferential target choice keep the
    # degree-ordered hot tier meaningful (hub rows are hot)
    indptr = np.arange(V + 1, dtype=np.int64) * deg
    hubs = rng.pareto(1.3, V) + 1.0
    p = hubs / hubs.sum()
    indices = rng.choice(V, V * deg, p=p).astype(np.int32)
    topo = CSRTopo(indptr=indptr, indices=indices, num_nodes=V)

    t0 = time.time()
    # the REAL construction path: host table -> from_cpu_tensor with
    # degree access_prob (hot rows = hubs), hot tier device_put, cold
    # tier host RAM. Table values: cheap deterministic fill (pages
    # touched — gathers read real memory; value correctness is covered
    # by tests/test_feature.py).
    feat = np.empty((V, D), np.float32)
    feat.fill(0.25)
    feat[:, 0] = np.arange(V, dtype=np.float32) % 97
    deg_w = np.bincount(indices, minlength=V).astype(np.float64) + 1.0
    f = Feature(device_cache_size=hot_bytes,
                cold_transfer_dtype=np.float16)
    f.from_cpu_tensor(feat, access_prob=deg_w)
    del feat
    print(f"tiers built in {time.time()-t0:.0f}s: "
          f"{V*D*4/1e9:.1f} GB table, hot {f.hot_rows} rows "
          f"({f.hot_rows*D*4/1e9:.1f} GB on device), "
          f"cold {f.cold.nbytes/1e9:.1f} GB host", file=sys.stderr,
          flush=True)
    return topo, f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=5_500_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--deg", type=int, default=8)
    ap.add_argument("--hot-gb", type=float, default=2.0)
    ap.add_argument("--train-split", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--fanout", type=int, nargs="+", default=[10, 5])
    args = ap.parse_args()

    quiver_tpu.enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    V, D = args.nodes, args.dim
    topo, feat = build(V, D, args.deg, int(args.hot_gb * 1e9))

    t0 = time.time()
    sampler = NeighborSampler(topo, args.fanout, mode="TPU", seed=0,
                              dedup="per_hop")
    print(f"graph on device in {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)

    model = GraphSAGE(hidden_features=256, out_features=64,
                      num_layers=len(args.fanout), dropout=0.0)
    tx = optax.adam(1e-3)
    rng = np.random.default_rng(3)
    split = rng.choice(V, args.train_split, replace=False)
    labels = rng.integers(0, 64, V)

    b0 = sampler.sample(split[: args.batch_size])
    x0 = feat[np.asarray(b0.n_id)]
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs)
    opt_state = tx.init(params)

    @jax.jit
    def train(params, opt_state, x, adjs, y):
        def loss_fn(p):
            logits = model.apply(p, x, adjs)[: y.shape[0]]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    BLOCK = 8

    def epoch():
        """One epoch, alternating direct/prefetch in BLOCK-step blocks
        (this link's throughput drifts 3-10x over minutes; sequential
        whole-epoch A-then-B comparisons measure the drift — per-mode
        step medians from interleaved blocks measure the mode). The
        FIRST step of each block is excluded from that block's timing
        (mode transition)."""
        order = rng.permutation(split)
        bs = args.batch_size
        steps = len(order) // bs
        feat.stats = {k: 0 for k in feat.stats}
        t_epoch = time.time()
        b = sampler.sample(order[:bs])
        nid = np.asarray(b.n_id)
        loss = None
        p, o = epoch.state
        step_times = {False: [], True: []}
        for t in range(steps):
            prefetch = (t // BLOCK) % 2 == 1
            t0 = time.time()
            x = feat[nid]                       # consumes prefetch if armed
            y = jnp.asarray(labels[order[t * bs:(t + 1) * bs]])
            if t + 1 < steps:
                b_next = sampler.sample(order[(t + 1) * bs:(t + 2) * bs])
                nid_next = np.asarray(b_next.n_id)
                if prefetch:
                    feat.prefetch(nid_next)     # host gather overlaps train
            p, o, loss = train(p, o, x, b.adjs, y)
            loss = float(loss)   # dependent fetch: forces completion
            # (block_until_ready acks early over the axon tunnel)
            if t % BLOCK:                       # skip block's first step
                step_times[prefetch].append(time.time() - t0)
            if t + 1 < steps:
                b, nid = b_next, nid_next
        epoch.state = (p, o)
        dt = time.time() - t_epoch
        hit = feat.cache_hit_rate()
        cold_gb = feat.stats["cold_hits"] * D * 2 / 1e9   # f16 transfer
        med = {k: float(np.median(v)) for k, v in step_times.items()}
        return dt, steps, float(loss), hit, cold_gb, med

    epoch.state = (params, opt_state)
    epoch()                                      # warmup: compile shapes
    dt_epoch, steps, loss_p, hit, cold_gb, med = epoch()
    dt_direct = med[False] * steps
    dt_pf = med[True] * steps
    print(f"epoch ({steps} steps, hit {hit:.3f}, {cold_gb:.2f} GB cold "
          f"f16 transfer): wall {dt_epoch:.1f}s; per-mode step medians "
          f"x steps: direct {dt_direct:.1f}s, prefetch {dt_pf:.1f}s",
          file=sys.stderr, flush=True)

    rec = {"table_gb": round(V * D * 4 / 1e9, 1),
           "hbm_gb": 16.0,
           "hot_gb": args.hot_gb,
           "nodes": V, "dim": D, "edges": V * args.deg,
           "train_split": args.train_split,
           "steps": steps,
           "epoch_wall_s": round(dt_epoch, 1),
           "epoch_direct_s": round(dt_direct, 1),
           "epoch_prefetch_s": round(dt_pf, 1),
           "methodology": "per-mode step medians from interleaved "
                          "8-step blocks x steps (drift-robust)",
           "hit_rate": round(hit, 3),
           "cold_f16_gb_per_epoch": round(cold_gb, 2),
           "final_loss": round(loss_p, 3)}
    # merge into FEATURE_BENCH.json
    path = Path(__file__).resolve().parent.parent / "FEATURE_BENCH.json"
    try:
        base = json.loads(path.read_text())
    except Exception:
        base = {}
    base["epoch_tiered"] = rec
    base["epoch_tiered_s"] = rec["epoch_prefetch_s"]
    path.write_text(json.dumps(base) + "\n")
    print(json.dumps({"metric": "epoch_tiered_s", **rec}))


if __name__ == "__main__":
    main()
