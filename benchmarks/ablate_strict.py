"""Piece-level ablation of the strict (per-hop-dedup) pipeline at hop-2
shape on the real chip. Times, inside individually jitted programs with
forced-completion fetches:

  1. the [N,128] block row gather (jnp.take) -- descriptor-bound fetch
  2. the same gather through the Pallas per-row-DMA kernel (several
     rows_per_step settings)
  3. Floyd k-subset positions
  4. the small-row lane selection (k masked reductions over [N,126])
  5. the big-row fallback (compaction sort + element gathers + scatter)
  6. the whole sample_adjacency_block at hop-2 shape
  7. the sort2 reindex at hop-2 shape (T = B + N*k)
  8. the full strict program (reference point)

Run:  python benchmarks/ablate_strict.py
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_graph, FANOUT, BATCH, measure  # noqa: E402

N2 = 131072           # hop-2 frontier rows (cap)
K2 = 5
BIG_CAP = int(0.3 * N2)
CAPS = (16384, 131072, 589824)


def timeit(fn, *args, iters=20):
    import jax.numpy as jnp

    def force(o):
        while isinstance(o, (tuple, list)):
            o = o[0]
        return float(jnp.sum(o.reshape(-1)[:1].astype(jnp.float32)))

    force(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        force(outs[-1])
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    import quiver_tpu as qt
    from quiver_tpu.sampling import kernels as KK
    from quiver_tpu.ops.unique import union_reindex_sorted_edges
    from quiver_tpu.ops.gather import gather_rows_pallas

    qt.enable_compilation_cache()
    indptr, indices = build_graph()
    topo = qt.CSRTopo(indptr=indptr, indices=indices)
    V = topo.node_count

    # Strict sampler provides the prepared block layout on device.
    s = qt.NeighborSampler(topo, FANOUT, mode="TPU", seed=0,
                           dedup="per_hop", capacities=CAPS)
    blk, ind1d = s.indices            # ([V,lanes] blocks, flat indices)
    print(f"block layout: {blk.shape} {blk.dtype}", file=sys.stderr)

    rng = np.random.default_rng(0)
    f_host = rng.integers(0, V, N2).astype(np.int32)
    f = jnp.asarray(f_host)
    fv = jnp.ones((N2,), jnp.bool_)
    key = jax.random.PRNGKey(7)

    out = {}

    # 1) block row gather
    g_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    out["take_blockrows_ms"] = timeit(g_take, blk, f)

    # 2) pallas DMA gather at several widths
    for G in (8, 16, 32, 64, 128):
        try:
            fn = jax.jit(partial(gather_rows_pallas, rows_per_step=G))
            out[f"pallas_gather_G{G}_ms"] = timeit(fn, blk, f)
        except Exception as e:  # noqa: BLE001
            out[f"pallas_gather_G{G}_ms"] = f"ERR {type(e).__name__}"

    # 3) floyd positions
    deg = jnp.minimum(jnp.take(blk[:, 1], f), 126)
    fl = jax.jit(lambda k, d: KK._floyd_positions(k, d, K2))
    out["floyd_ms"] = timeit(fl, key, deg)

    # 4) small-row select: k masked sums over [N,126]
    body = jnp.take(blk, f, axis=0)[:, 2:]
    pos = np.asarray(fl(key, deg))
    posj = jnp.asarray(pos)

    def small_select(body, pos):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, body.shape[1]), 1)
        vals = []
        for j in range(K2):
            m = iota == pos[:, j:j + 1]
            vals.append(jnp.sum(jnp.where(m, body, 0), axis=1))
        return jnp.stack(vals, axis=1)
    out["small_select_ms"] = timeit(jax.jit(small_select), body, posj)

    # 5) big-row fallback at hop-2 shape
    start = jnp.take(blk[:, 0], f)
    degf = jnp.take(blk[:, 1], f)

    def big_path(start, deg, pos):
        is_big = deg > 126
        pos_i = jnp.arange(N2, dtype=jnp.int32)
        bigkey = jnp.where(is_big, pos_i, jnp.int32(N2))
        bigidx = jax.lax.sort([bigkey], num_keys=1)[0][:BIG_CAP]
        meta_all = jnp.concatenate([start[:, None], pos], axis=1)
        meta_big = jnp.take(meta_all, jnp.minimum(bigidx, N2 - 1), axis=0)
        slot_big = meta_big[:, 0:1] + meta_big[:, 1:]
        E = ind1d.shape[0]
        nbr_big = jnp.take(ind1d, jnp.clip(slot_big, 0, E - 1),
                           mode="clip").astype(jnp.int32)
        nbr = jnp.zeros((N2, K2), jnp.int32).at[bigidx].set(
            nbr_big, mode="drop")
        return nbr
    out["big_path_ms"] = timeit(jax.jit(big_path), start, degf, posj)
    out["big_frac"] = round(float((np.asarray(degf) > 126).mean()), 4)

    # 6) whole block sampler at hop-2 shape
    samp = jax.jit(partial(KK.sample_adjacency_block, k=K2, big_cap=BIG_CAP))
    out["sample_block_hop2_ms"] = timeit(
        lambda b, i, fr, v, kk: samp(b, i, fr, v, key=kk), blk, ind1d, f, fv,
        key)

    # 7) sort2 reindex at hop-2 shape
    nbr, mask, slot = samp(blk, ind1d, f, fv, key=key)
    ri = jax.jit(partial(union_reindex_sorted_edges, k=K2,
                         capacity=CAPS[2]))
    out["reindex_sort2_hop2_ms"] = timeit(
        ri, f, jnp.int32(N2), nbr.reshape(-1), mask.reshape(-1),
        slot.reshape(-1))

    # 8) full strict program
    seps, _, epb, _band = measure(s, V, iters=10)
    out["strict_full_ms"] = round(epb / seps * 1e3 * 0 + (epb / (seps / 1e3)),
                                  3)  # ms per batch
    out["strict_seps_M"] = round(seps / 1e6, 2)
    out["edges_per_batch"] = epb

    for k, v in out.items():
        print(f"{k:28s} {v if isinstance(v, str) else round(v, 3) if isinstance(v, float) else v}")


if __name__ == "__main__":
    main()
