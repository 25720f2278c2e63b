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
    mask = jnp.asarray(rng.random((F, K)) < 0.9)
    et = jnp.asarray(rng.integers(0, R, (F, K)).astype(np.int32))

    @jax.jit
    def one_pass(xv):
        return lane_aggregate_rel(xv, mask, et, R, "mean")

    @jax.jit
    def r_passes(xv):
        return jnp.stack([lane_aggregate(xv, mask & (et == r), "mean")
                          for r in range(R)], axis=1)

    # equality sanity on-device before timing
    a = np.asarray(one_pass(x))
    b = np.asarray(r_passes(x))
    err = np.abs(a - b).max()
    assert err < 1e-4, err

    dt1 = chain_time(one_pass, x, iters=8)
    dtR = chain_time(r_passes, x, iters=8)
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
