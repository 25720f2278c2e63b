"""Diagnose the dense-pipeline SEPS decline (BENCH r2 194.9M -> r4
171.6M): isolate the r3 lane-major flatten change and the window-vs-
packed layout choice, each measured N interleaved times on the real
chip so configuration effects separate from transport drift.

Variants (same graph/fanout/batch as bench.py):
  window/lane   current default (lane-major flatten, r3+)
  window/dst    r2-era dst-major flatten
  packed/lane   packed triple layout, lane-major
  exact/lane    meta2 layout (no pre-shuffle), exact Floyd sampling

Usage: python benchmarks/exp_dense_flatten.py [--reps 5 --iters 50]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root bench.py: graph builder + constants)


def make_sampler_fn(variant, topo, sizes, batch_size):
    """A jitted (seeds, key) -> (frontier, f_valid, masks) program for
    one variant, mirroring _sample_layers_dense with the flatten order
    as a toggle."""
    import jax
    import jax.numpy as jnp
    from quiver_tpu.sampling import kernels as K
    from quiver_tpu.sampling import sampler as S

    layout, flatten = variant.split("/")
    indptr = jnp.asarray(topo.indptr, jnp.int32)
    if layout == "window":
        flat = S._chunked_put(np.asarray(topo.indices, np.int32), None)
        key0 = jax.random.PRNGKey(7)
        ind2d, _ = K.device_shuffle_window(indptr, flat, key0,
                                           k_max=max(sizes))
        meta = jnp.asarray(K.window_meta(topo.indptr))
        state = (meta, ind2d)
    elif layout == "packed":
        # unshuffled indices: identical compute/traffic, only sample
        # statistics differ — fine for a throughput ablation
        packed2d, seed_meta = K.build_packed_layout(
            topo.indptr, np.asarray(topo.indices))
        state = (S._chunked_put(packed2d, None), jnp.asarray(seed_meta))
    else:  # exact
        state = (jnp.asarray(K.build_meta2(topo.indptr)),
                 jnp.asarray(topo.indices, jnp.int32))

    # state rides as explicit jit ARGUMENTS — closure-captured device
    # arrays are serialized into the program upload (HTTP 413 on the
    # remote-compile transport at 60M-edge tables)
    @jax.jit
    def run(state, seeds, key):
        if layout == "packed":
            packed2d, seed_meta = state
            V = seed_meta.shape[0]
            sid = jnp.clip(seeds, 0, V - 1)
            fr3 = jnp.concatenate(
                [sid[:, None], jnp.take(seed_meta, sid, axis=0)], 1)
            f_valid = jnp.ones((batch_size,), bool)
            masks = []
            for k in sizes:
                key, sub = jax.random.split(key)
                nbr3, mask, _ = K.sample_adjacency_packed(
                    packed2d, fr3, f_valid, k, sub)
                masks.append(mask)
                if flatten == "lane":
                    fr3 = jnp.concatenate(
                        [fr3, nbr3.transpose(1, 0, 2).reshape(-1, 3)])
                    f_valid = jnp.concatenate([f_valid, mask.T.reshape(-1)])
                else:
                    fr3 = jnp.concatenate([fr3, nbr3.reshape(-1, 3)])
                    f_valid = jnp.concatenate([f_valid, mask.reshape(-1)])
            return fr3[:, 0], f_valid, masks
        frontier = seeds
        f_valid = jnp.ones((batch_size,), bool)
        masks = []
        for k in sizes:
            key, sub = jax.random.split(key)
            if layout == "window":
                meta, ind2d = state
                nbr, mask, _ = K.sample_adjacency_window(
                    meta, ind2d, frontier, f_valid, k, sub,
                    k_max=max(sizes))
            else:
                nbr, mask, _ = S._sample_exact(
                    None, state, frontier, f_valid, k, sub)
            masks.append(mask)
            nz = jnp.where(mask, nbr, 0)
            if flatten == "lane":
                frontier = jnp.concatenate([frontier, nz.T.reshape(-1)])
                f_valid = jnp.concatenate([f_valid, mask.T.reshape(-1)])
            else:
                frontier = jnp.concatenate([frontier, nz.reshape(-1)])
                f_valid = jnp.concatenate([f_valid, mask.reshape(-1)])
        return frontier, f_valid, masks

    return run, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--variants", nargs="+",
                    default=["window/lane", "window/dst", "packed/lane",
                             "exact/lane"])
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from quiver_tpu import CSRTopo
    import quiver_tpu
    quiver_tpu.enable_compilation_cache()

    indptr, indices = bench.build_graph()
    topo = CSRTopo(indptr=indptr, indices=indices)
    sizes = tuple(bench.FANOUT)
    B = bench.BATCH
    print(f"devices={jax.devices()}", file=sys.stderr)

    fns = {v: make_sampler_fn(v, topo, sizes, B) for v in args.variants}
    count = jax.jit(lambda ms: sum(jnp.sum(m.astype(jnp.int32))
                                   for m in ms))
    rng = np.random.default_rng(1)
    results = {v: [] for v in args.variants}

    # warm / compile
    for v, (fn, st) in fns.items():
        t0 = time.time()
        fr, fv, ms = fn(st, jnp.asarray(
            rng.integers(0, topo.node_count, B), jnp.int32),
            jax.random.PRNGKey(0))
        e = int(count(ms))
        print(f"{v}: compile {time.time()-t0:.1f}s, {e} edges/batch",
              file=sys.stderr, flush=True)

    # interleaved timed reps: variant order rotates so slow drift hits
    # all variants equally
    for rep in range(args.reps):
        order = args.variants[rep % len(args.variants):] + \
            args.variants[:rep % len(args.variants)]
        for v in order:
            fn, st = fns[v]
            seeds = [jnp.asarray(rng.integers(0, topo.node_count, B),
                                 jnp.int32) for _ in range(args.iters)]
            keys = [jax.random.PRNGKey(1000 * rep + i)
                    for i in range(args.iters)]
            t0 = time.time()
            outs = [fn(st, s, k) for s, k in zip(seeds, keys)]
            edges = int(count(outs[-1][2]))  # force the stream
            dt = time.time() - t0
            # count all batches' edges (masks already on device)
            tot = sum(int(count(o[2])) for o in outs)
            results[v].append(tot / dt)

    rec = {"metric": "dense_flatten_ablation",
           "iters": args.iters, "reps": args.reps, "batch": B,
           "fanout": list(sizes), "variants": {}}
    for v, rs in results.items():
        rs = sorted(rs)
        rec["variants"][v] = {
            "median_seps": round(rs[len(rs) // 2], 1),
            "min": round(rs[0], 1), "max": round(rs[-1], 1),
            "runs": [round(r, 1) for r in rs]}
        print(f"{v}: median {rs[len(rs)//2]/1e6:.1f}M "
              f"[{rs[0]/1e6:.1f}, {rs[-1]/1e6:.1f}]M", file=sys.stderr)
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
