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
    ap.add_argument("--single-thread", action="store_true",
                    help="one XLA thread per virtual device (for honest "
                         "1-vs-H weak-scaling efficiency rows)")
    ap.add_argument("--req-slack", type=float, default=None,
                    help="per-destination request capacity = slack*F/H "
                         "(None = lossless F)")
    ap.add_argument("--out", type=str, default=None,
                    help="append the JSON record to this artifact file")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        if args.single_thread:
            # one XLA thread per virtual device: each device's sampling
            # is single-threaded, so H devices genuinely use H cores and
            # the 1-vs-H comparison measures scaling rather than
            # thread-pool reallocation (use for the efficiency rows;
            # default threading for the absolute-throughput row)
            os.environ["XLA_FLAGS"] += " --xla_cpu_multi_thread_eigen=false"
            os.environ.setdefault("OMP_NUM_THREADS", "1")
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import quiver_tpu
    from quiver_tpu import CSRTopo
    from quiver_tpu.parallel import DistNeighborSampler

    if not args.single_thread:
        # the persistent cache would serve executables compiled with the
        # default thread pool to the single-thread run (the eigen flag is
        # not part of its key), silently invalidating the scaling rows
        quiver_tpu.enable_compilation_cache()
    devices = jax.devices()

    rng = np.random.default_rng(0)
    n = args.nodes
    rows = np.repeat(np.arange(n), args.deg)
    cols = rng.integers(0, n, rows.shape[0])
    topo = CSRTopo(edge_index=np.stack([rows, cols]), num_nodes=n)
    B = args.batch_size

    def run_at(H):
        """Aggregate SEPS with H devices, B seeds per device (weak
        scaling). The hot loop is DEVICE-RESIDENT (sample_sharded):
        edges are counted on device and only the final scalar crosses
        to the host."""
        mesh = Mesh(np.array(devices[:H]), ("data",))
        g2h = rng.integers(0, H, n)
        ds = DistNeighborSampler(mesh, topo, g2h, args.fanout, seed=0,
                                 req_slack=args.req_slack)
        count_edges = jax.jit(
            lambda ms: sum(jnp.sum(m.astype(jnp.int32)) for m in ms))
        seeds = np.stack([rng.integers(0, n, B) for _ in range(H)])
        # warm BOTH auto-tight phases: round 1 learns capacities via the
        # per-hop programs, round 2 compiles the fused learned-cap program
        for _ in range(2):
            _, blocks = ds.sample_sharded(seeds)
            _ = int(count_edges([b.mask for b in blocks]))
        t0 = time.time()
        total_edges = 0
        for _ in range(args.iters):
            seeds = np.stack([rng.integers(0, n, B) for _ in range(H)])
            _, blocks = ds.sample_sharded(seeds)
            total_edges += int(count_edges([b.mask for b in blocks]))
        dt = time.time() - t0
        seps = total_edges / dt
        hops = ds.collective_bytes_per_hop(B, getattr(ds, "last_caps",
                                                      None))
        print(f"{H} devices: {seps/1e6:.2f}M SEPS aggregate "
              f"({seps/H/1e6:.2f}M/device), {dt/args.iters*1e3:.1f} "
              f"ms/round; wire/need per hop: "
              + ", ".join(f"{h['wire_bytes']/max(h['need_bytes'],1):.2f}x"
                          for h in hops),
              file=sys.stderr)
        return seps, dt / args.iters, hops

    H_full = len(devices)
    seps_full, ms_full, hops = run_at(H_full)
    rec = {"metric": "dist_sample_seps", "devices": H_full,
           "backend": jax.default_backend(),
           "single_thread_per_device": bool(args.single_thread),
           "batch_size": B, "fanout": args.fanout,
           "req_slack": args.req_slack,
           "value": round(seps_full, 1), "unit": "edges/s",
           "ms_per_round": round(ms_full * 1e3, 1),
           "collective_bytes_per_hop": hops}

    if H_full > 1:
        # weak-scaling efficiency vs a 1-device mesh on the SAME
        # backend: eff(H) = agg_SEPS(H) / (H * agg_SEPS(1)). On the
        # virtual CPU mesh this is bounded by physical cores (all
        # virtual devices share them), so also report eff at
        # H = min(cores, H_full) — the honest per-core point.
        seps_1, _, _ = run_at(1)
        cores = os.cpu_count() or 1
        rec["scaling"] = {"agg_seps_1dev": round(seps_1, 1),
                          "efficiency_vs_1dev":
                              round(seps_full / (H_full * seps_1), 3),
                          "physical_cores": cores}
        if 1 < cores < H_full:
            seps_c, _, _ = run_at(cores)
            rec["scaling"]["agg_seps_at_cores"] = round(seps_c, 1)
            rec["scaling"]["efficiency_at_cores"] = round(
                seps_c / (cores * seps_1), 3)
        print(f"scaling: {rec['scaling']}", file=sys.stderr)

    print(json.dumps(rec))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
