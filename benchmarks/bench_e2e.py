"""End-to-end epoch time on a products-scale graph — the reference's
headline e2e table (docs/Introduction_en.md:144-149: 3-layer GraphSAGE on
ogbn-products, 1 GPU Quiver = 11.1 s/epoch, PyG CPU-sampling = 36.5 s).

Same shape/config: 2.45M nodes / ~61M edges power-law graph, 196k train
seeds (products' split size), batch 1024, fanout [15,10,5], hidden 256,
100-dim float32 features, single TPU chip, synthetic labels (no dataset
egress — the timed work is identical). Uses the fused one-program
sample+gather+train step (quiver_tpu.train).
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
from quiver_tpu import CSRTopo, NeighborSampler
from quiver_tpu.models import GraphSAGE
from quiver_tpu.train import make_sampled_train_step

quiver_tpu.enable_compilation_cache()

from bench import build_graph  # reuse the cached products-like graph

TRAIN_SEEDS = 196_615       # ogbn-products train split size
BATCH = 1024
FANOUT = [15, 10, 5]
HIDDEN = 256
DIM = 100
CLASSES = 47
BASELINE_EPOCH_S = 11.1     # reference Quiver 1-GPU epoch


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 features + compute (reference dtype); "
                         "default is bf16 storage/compute with fp32 loss")
    ap.add_argument("--model", choices=["sage", "gat"], default="sage",
                    help="gat = 4-head GAT through the flash lane "
                         "kernel (the reference's MAG240M model family)")
    ap.add_argument("--weighted", action="store_true",
                    help="weighted neighbor sampling via packed per-row "
                         "alias tables (BASELINE config 3: the "
                         "reference's weight_sample inverse-CDF path, "
                         "cuda_random.cu.hpp:179-221, paired with the "
                         "GAT/MAG240M model family)")
    args = ap.parse_args()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    t0 = time.time()
    indptr, indices = build_graph()
    w_rng = np.random.default_rng(42)
    topo = CSRTopo(indptr=indptr, indices=indices,
                   edge_weight=(w_rng.random(len(indices)).astype(
                       np.float32) + 0.05) if args.weighted else None)
    n = topo.node_count
    rng = np.random.default_rng(0)
    # default: bf16 feature storage halves gather bytes; loss math fp32.
    # --fp32 matches the reference's dtype end to end.
    feat = jax.device_put(jnp.asarray(
        rng.normal(size=(n, DIM)).astype(np.float32)).astype(dtype))
    labels = jax.device_put(jnp.asarray(
        rng.integers(0, CLASSES, n, dtype=np.int32)))
    print(f"setup {time.time()-t0:.1f}s", file=sys.stderr)

    sampler = NeighborSampler(topo, FANOUT, seed=0,
                              weighted=args.weighted)
    if args.model == "gat":
        from quiver_tpu.models import GAT
        model = GAT(hidden_features=HIDDEN, out_features=CLASSES,
                    num_layers=3, heads=4, dropout=0.0,
                    dtype=None if args.fp32 else jnp.bfloat16)
    else:
        model = GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                          num_layers=3, dropout=0.0,
                          dtype=None if args.fp32 else jnp.bfloat16)
    tx = optax.adam(1e-3)

    b0 = sampler.sample(np.arange(BATCH))
    x0 = feat[jnp.clip(b0.n_id, 0, n - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, b0.adjs)
    opt_state = tx.init(params)

    import optax as _optax

    def loss_fn(logits, y):
        return _optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y).mean()

    step = make_sampled_train_step(model, tx, sampler, feat, labels,
                                   loss_fn=loss_fn)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    params, opt_state, loss, _ = step(params, opt_state,
                                      np.arange(BATCH), key)
    _ = float(loss)
    print(f"compile {time.time()-t0:.1f}s", file=sys.stderr)

    train_idx = rng.permutation(n)[:TRAIN_SEEDS]
    steps = len(train_idx) // BATCH
    t0 = time.time()
    # The timed epoch INCLUDES the per-epoch window reshuffle — the
    # honest amortized cost of the window sampling strategy.
    sampler.reshuffle()
    resh_s = time.time() - t0
    loss = None
    for s in range(steps):
        key, sub = jax.random.split(key)
        seeds = train_idx[s * BATCH:(s + 1) * BATCH]
        params, opt_state, loss, _ = step(params, opt_state, seeds, sub)
    lf = float(loss)  # forces the whole in-order stream
    epoch_s = time.time() - t0
    print(f"epoch: {epoch_s:.2f}s for {steps} steps "
          f"(incl. {resh_s:.2f}s window reshuffle; "
          f"{steps*BATCH/epoch_s:.0f} seeds/s), final loss {lf:.3f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "e2e_epoch_products_like_"
                  + ("gat3" if args.model == "gat" else "sage3")
                  + ("_weighted" if args.weighted else "")
                  + ("_fp32" if args.fp32 else ""),
        "value": round(epoch_s, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_EPOCH_S / epoch_s, 3),
        "reshuffle_s": round(resh_s, 2),
        **({"baseline_note": "11.1s is the reference's SAGE epoch "
            "(it publishes no GAT epoch); GAT does ~3x the FLOPs"}
           if args.model == "gat" else {}),
    }))


if __name__ == "__main__":
    main()
