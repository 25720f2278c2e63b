"""Typed-edge (RGCN) aggregation: the single-pass lane_aggregate_rel
vs the per-relation loop it replaced (R full-block streams). MAG240M-
style config: R=5 relations, products-scale block
(reference analogue: benchmarks/ogbn-mag240m/train_quiver.py RGCN).

Emits RGCN_BENCH.json.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import quiver_tpu
from quiver_tpu.ops import lane_aggregate
from quiver_tpu.ops.lane_kernels import lane_aggregate_rel
from _timing import chain_time, rtt

quiver_tpu.enable_compilation_cache()

F, K, D, R = 180_224, 5, 128, 5
V5E_HBM_GBPS = 819.0


def main():
    print(f"force round-trip: {rtt()*1e3:.1f} ms", file=sys.stderr)
    rng = np.random.default_rng(0)
    n_src = F * (1 + K)
    x = jax.random.normal(jax.random.PRNGKey(0), (n_src, D), jnp.float32)
    mask = rng.random((F, K)) < 0.9
    et = rng.integers(0, R, (F, K))
    # chain on the SMALL float [F, K] relation operand (mask rides the
    # sign), NOT the 461 MB feature operand — hazard 3 in _timing.py
    # (the phantom copy of a chained pallas_call operand costs
    # ~1.5 ms/iter and the r3 numbers in this file's history had it)
    relff = jnp.asarray(np.where(mask, et, -1).astype(np.float32))

    # Both forms return the FLAT [F, R*D] the consumer contracts with
    # (RGCNConv reshapes [F, R, D] -> [F, R*D] for the one-matmul
    # transform; inside one jit the reshape pair cancels). Returning
    # rank-3 as a program OUTPUT would materialize its (R=5 -> 8,
    # 128)-padded layout: +1.5 ms of pure relayout that no real caller
    # pays.
    def one_pass(rf, xv):
        return lane_aggregate_rel(xv, rf >= 0, rf.astype(jnp.int32), R,
                                  "mean").reshape(F, R * D)

    def r_passes(rf, xv):
        return jnp.stack(
            [lane_aggregate(xv, (rf >= 0) & (rf.astype(jnp.int32) == r),
                            "mean") for r in range(R)],
            axis=1).reshape(F, R * D)

    # equality sanity on-device before timing
    a = np.asarray(jax.jit(one_pass)(relff, x))
    b = np.asarray(jax.jit(r_passes)(relff, x))
    err = np.abs(a - b).max()
    assert err < 1e-4, err

    dt1 = chain_time(one_pass, relff, x, iters=16)
    dtR = chain_time(r_passes, relff, x, iters=16)
    lane_bytes = F * K * D * 4          # the lane rows, read once
    out_bytes = F * R * D * 4
    gbps1 = (lane_bytes + out_bytes) / dt1 / 1e9
    print(f"one-pass [F,R,D]: {dt1*1e3:.2f} ms ({gbps1:.0f} GB/s of "
          f"{V5E_HBM_GBPS:.0f}); per-relation loop: {dtR*1e3:.2f} ms "
          f"-> {dtR/dt1:.2f}x", file=sys.stderr)
    rec = {"metric": "rgcn_typed_aggregation",
           "F": F, "fanout": K, "D": D, "relations": R,
           "one_pass_ms": round(dt1 * 1e3, 2),
           "per_relation_loop_ms": round(dtR * 1e3, 2),
           "speedup": round(dtR / dt1, 2),
           "one_pass_gbps": round(gbps1, 1),
           "max_abs_err_vs_loop": float(err)}
    Path(__file__).resolve().parent.parent.joinpath(
        "RGCN_BENCH.json").write_text(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
