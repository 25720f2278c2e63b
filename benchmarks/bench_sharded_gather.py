"""Sharded hot-tier (p2p_clique_replicate) gather engineering row
(VERDICT r4 weak #5): the explicit shard_map owner-gather vs the naive
``jnp.take`` on the mesh-sharded array, on the virtual CPU mesh.

Wire accounting (per device, per lookup of m rows, D floats):
  owner-gather: ONE psum of the [m, D] result  -> ~2 (H-1)/H * m * D * 4 B
  naive take:   XLA all-gathers the FULL hot table -> S * H * D * 4 B
The naive path's wire scales with the CACHE SIZE; the owner-gather's
with the REQUEST — the same asymmetry that makes the reference read
only requested rows through NVLink p2p pointers
(shard_tensor.cu.hpp:19-61) instead of copying peer shards.

  python benchmarks/bench_sharded_gather.py --virtual 8
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=8)
    ap.add_argument("--rows", type=int, default=200_000,
                    help="hot rows total (sharded over the mesh)")
    ap.add_argument("--dim", type=int, default=100)
    ap.add_argument("--m", type=int, default=20_000,
                    help="requested rows per lookup")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from quiver_tpu.feature import _make_sharded_gather

    H = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("cache",))
    rng = np.random.default_rng(0)
    S = -(-args.rows // H)
    rows = S * H
    hot_np = rng.normal(size=(rows, args.dim)).astype(np.float32)
    hot = jax.device_put(jnp.asarray(hot_np),
                         NamedSharding(mesh, P("cache", None)))

    owner = _make_sharded_gather(mesh, "cache")
    naive = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))

    id_sets = [jnp.asarray(rng.integers(0, rows, args.m), jnp.int32)
               for _ in range(args.iters)]
    # ground truth + warm
    o0 = np.asarray(owner(hot, id_sets[0]))
    np.testing.assert_allclose(o0, hot_np[np.asarray(id_sets[0])],
                               rtol=1e-6)
    _ = np.asarray(naive(hot, id_sets[0]))

    def timed(fn):
        ts = []
        for _ in range(3):
            t0 = time.time()
            outs = [fn(hot, ids) for ids in id_sets]
            _ = float(jnp.sum(outs[-1][:1, :1]))
            ts.append((time.time() - t0) / args.iters)
        return float(np.median(ts))

    t_owner = timed(owner)
    t_naive = timed(naive)
    m, D = args.m, args.dim
    wire_owner = 2 * (H - 1) / H * m * D * 4
    wire_naive = S * H * D * 4
    rec = {"metric": "sharded_hot_gather",
           "backend": jax.default_backend(), "devices": H,
           "hot_rows": rows, "dim": D, "request_rows": m,
           "owner_gather_ms": round(t_owner * 1e3, 3),
           "naive_take_ms": round(t_naive * 1e3, 3),
           "speedup": round(t_naive / t_owner, 3),
           "wire_bytes_owner_per_dev": int(wire_owner),
           "wire_bytes_naive_per_dev_bound": int(wire_naive),
           "wire_ratio": round(wire_naive / wire_owner, 1),
           "note": "owner = masked local take + ONE psum of the [m, D] "
                   "result (wire scales with the request); naive = "
                   "jnp.take on the sharded array (XLA replicates the "
                   "hot table: wire scales with the cache)"}
    print(f"owner {t_owner*1e3:.2f} ms vs naive {t_naive*1e3:.2f} ms "
          f"({rec['speedup']}x); wire {wire_owner/1e6:.1f} MB vs "
          f"{wire_naive/1e6:.1f} MB per device", file=sys.stderr)
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
