"""Distributed (partitioned) sampling throughput over a mesh — the
reference's multi-host sampling bench
(benchmarks/generated_graph/dist_sampling_generated_quiver.py pattern).

On real multi-chip hardware this measures edges/s scaling efficiency
(BASELINE north star: >=80% host-to-pod). Here it runs on whatever mesh
exists (one real chip -> trivial mesh; CI -> 8 virtual CPU devices with
--virtual 8) and reports aggregate SEPS plus per-hop collective cost.
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
    ap.add_argument("--virtual", type=int, default=0)
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--deg", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--fanout", type=int, nargs="+", default=[15, 10])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--req-slack", type=float, default=None,
                    help="per-destination request capacity = slack*F/H "
                         "(None = lossless F)")
    ap.add_argument("--out", type=str, default=None,
                    help="append the JSON record to this artifact file")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.virtual}")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import quiver_tpu
    from quiver_tpu import CSRTopo
    from quiver_tpu.parallel import DistNeighborSampler

    quiver_tpu.enable_compilation_cache()
    devices = jax.devices()
    H = len(devices)
    mesh = Mesh(np.array(devices), ("data",))

    rng = np.random.default_rng(0)
    n = args.nodes
    rows = np.repeat(np.arange(n), args.deg)
    cols = rng.integers(0, n, rows.shape[0])
    topo = CSRTopo(edge_index=np.stack([rows, cols]), num_nodes=n)
    g2h = rng.integers(0, H, n)

    ds = DistNeighborSampler(mesh, topo, g2h, args.fanout, seed=0,
                             req_slack=args.req_slack)
    B = args.batch_size
    seeds = np.stack([rng.integers(0, n, B) for _ in range(H)])
    batches = ds.sample(seeds)  # compile
    _ = float(jnp.sum(batches[0].adjs[0].mask.astype(jnp.int32)))

    t0 = time.time()
    total_edges = 0
    for _ in range(args.iters):
        seeds = np.stack([rng.integers(0, n, B) for _ in range(H)])
        batches = ds.sample(seeds)
        total_edges += sum(int(np.asarray(blk.mask).sum())
                           for b in batches for blk in b.adjs)
    dt = time.time() - t0
    seps = total_edges / dt
    hops = ds.collective_bytes_per_hop(B)
    print(f"{H} devices: {seps/1e6:.2f}M SEPS aggregate "
          f"({seps/H/1e6:.2f}M/device), {dt/args.iters*1e3:.1f} ms/round; "
          f"wire/need per hop: "
          + ", ".join(f"{h['wire_bytes']/max(h['need_bytes'],1):.2f}x"
                      for h in hops),
          file=sys.stderr)
    rec = {"metric": "dist_sample_seps", "devices": H,
           "backend": jax.default_backend(),
           "batch_size": B, "fanout": args.fanout,
           "req_slack": args.req_slack,
           "value": round(seps, 1), "unit": "edges/s",
           "ms_per_round": round(dt / args.iters * 1e3, 1),
           "collective_bytes_per_hop": hops}
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
