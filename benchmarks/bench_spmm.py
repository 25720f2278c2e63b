"""Aggregation + transform kernel efficiency (the SpMM/SDDMM analogue).

Round-3 methodology note: all timings here are pure DEVICE time via
chained in-jit loops (benchmarks/_timing.py). Round-2 numbers included
a ~1.5 ms/iter share of the axon tunnel's ~30 ms host-sync round trip,
understating every kernel; do not compare r2 and r3 absolute numbers
without that correction.

The reference's model compute is PyG scatter-based SpMM; the TPU build
has two regimes:

- **Sampled-block (training) path**: lane-major dense blocks — lane
  slot j of all dst rows is one contiguous [F, D] slice, so a SAGE/GAT
  layer's aggregation is a handful of aligned masked adds that XLA
  streams at HBM bandwidth (measured 905 GB/s bf16 on this chip; the
  round-2 dst-major [F, k, D] layout measured 110 GB/s because the
  fanout axis pads to the sublane tile).
- **Full-graph (inference) path**: degree-bucketed padded gather
  (ops/spmm.py spmm_csr) vs the XLA gather+segment oracle and vs the
  per-edge-DMA Pallas kernel (spmm_csr_dma, kept as the measured
  descriptor-bound reference).
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

import quiver_tpu
from quiver_tpu.models import SAGEConv, GATConv
from quiver_tpu.sampling.sampler import DenseBlock
from _timing import chain_time, rtt

quiver_tpu.enable_compilation_cache()

F, K = 180_224, 5            # products-scale outer block
D_IN, D_OUT = 256, 256
V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def bench_layer(layer, x, adj, params, flops, bytes_moved, label, iters=16):
    """Aggregation layers are BANDWIDTH-bound at GNN shapes (a SAGE layer
    reads ~0.5 GB of lane features for ~0.3 GFLOP of matmul), so the
    meaningful roofline is HBM bytes; TFLOP/s is reported for context."""
    def fwd(x):
        return layer.apply(params, x, adj)
    dt = chain_time(fwd, x, iters=iters)
    tf = flops / dt / 1e12
    gbps = bytes_moved / dt / 1e9
    print(f"{label}: {dt*1e3:.2f} ms -> {gbps:.0f} GB/s "
          f"({gbps/V5E_HBM_GBPS*100:.0f}% of HBM roofline), "
          f"{tf:.1f} TFLOP/s ({tf/V5E_BF16_PEAK_TFLOPS*100:.0f}% of MXU peak)",
          file=sys.stderr)
    return gbps


def main():
    print(f"force round-trip: {rtt()*1e3:.1f} ms (subtracted)",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    n_src = F * (1 + K)
    x = jnp.asarray(rng.normal(size=(n_src, D_IN)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mask = jnp.asarray(rng.random((F, K)) < 0.95)
    adj = DenseBlock(mask=mask, e_id=jnp.zeros((F, K), jnp.int32),
                     dst_count=jnp.int32(F), size=(n_src, F), fanout=K)

    bpe = 2  # bf16
    sage = SAGEConv(D_OUT)
    p = sage.init(jax.random.PRNGKey(0), x, adj)
    sage_flops = 2 * F * D_IN * D_OUT * 2
    # min traffic: read all src rows once + write [F, D_OUT]
    sage_bytes = n_src * D_IN * bpe + F * D_OUT * bpe
    g_sage = bench_layer(sage, x, adj, p, sage_flops, sage_bytes,
                         "SAGEConv fwd")

    gat = GATConv(D_OUT // 4, heads=4)
    pg = gat.init(jax.random.PRNGKey(0), x, adj)
    gat_flops = 2 * n_src * D_IN * D_OUT
    # min traffic: read src rows, write xw for all rows, read lanes back,
    # write [F, D_OUT]
    gat_bytes = (n_src * D_IN + n_src * D_OUT + F * K * D_OUT
                 + F * D_OUT) * bpe
    g_gat = bench_layer(gat, x, adj, pg, gat_flops, gat_bytes, "GATConv fwd")

    # Full-graph aggregation on a power-law graph slice: the bucketed
    # gather engine vs the XLA gather+segment oracle vs the per-edge-DMA
    # Pallas kernel (descriptor-bound reference).
    from quiver_tpu.ops.spmm import (spmm_csr, spmm_csr_reference,
                                     spmm_csr_dma, gat_csr,
                                     build_bucket_plan)
    rngg = np.random.default_rng(1)
    Vg = 250_000
    w = rngg.pareto(1.5, Vg) + 1.0
    degg = np.maximum((w / w.sum() * (Vg * 12)).astype(np.int64), 1)
    indptr = np.zeros(Vg + 1, np.int64)
    np.cumsum(degg, out=indptr[1:])
    Eg = int(indptr[-1])
    indices = rngg.integers(0, Vg, Eg).astype(np.int32)
    xg = jnp.asarray(rngg.normal(size=(Vg, 128)).astype(np.float32))
    ip_j, idx_j = jnp.asarray(indptr, jnp.int32), jnp.asarray(indices)
    plan = build_bucket_plan(indptr, indices)

    def timed(fn, label, iters=8):
        dt = chain_time(fn, xg, iters=iters)
        eps = Eg / dt
        print(f"{label}: {dt*1e3:.1f} ms ({eps/1e6:.1f}M edges/s)",
              file=sys.stderr)
        return dt

    dt_xla = timed(lambda xv: spmm_csr_reference(ip_j, idx_j, xv),
                   f"full-graph XLA gather+segment ({Eg/1e6:.1f}M edges)")
    dt_bk = timed(lambda xv: spmm_csr(ip_j, idx_j, xv, plan=plan),
                  "full-graph bucketed-gather SpMM")
    dt_dma = timed(lambda xv: spmm_csr_dma(ip_j, idx_j, xv),
                   "full-graph per-edge-DMA Pallas SpMM", iters=3)

    # full-graph 4-head GAT through the same bucketed layout (one pass)
    H, C = 4, 32
    xwg = jnp.asarray(rngg.normal(size=(Vg, H, C)).astype(np.float32))
    asg = jnp.asarray(rngg.normal(size=(Vg, H)).astype(np.float32))
    adg = jnp.asarray(rngg.normal(size=(Vg, H)).astype(np.float32))
    dt_gat = chain_time(
        lambda xv: gat_csr(ip_j, idx_j, xv, asg, adg, plan=plan),
        xwg, iters=8)
    print(f"full-graph GAT 4-head fused: {dt_gat*1e3:.1f} ms "
          f"({Eg/dt_gat/1e6:.1f}M edges/s, all heads)", file=sys.stderr)

    print(json.dumps({"sage_gbps": round(g_sage, 1),
                      "gat_gbps": round(g_gat, 1),
                      "hbm_roofline_gbps": V5E_HBM_GBPS,
                      "fullgraph_xla_ms": round(dt_xla * 1e3, 1),
                      "fullgraph_bucketed_ms": round(dt_bk * 1e3, 1),
                      "fullgraph_dma_pallas_ms": round(dt_dma * 1e3, 1),
                      "fullgraph_gat4h_ms": round(dt_gat * 1e3, 1),
                      "fullgraph_speedup_vs_xla": round(dt_xla / dt_bk, 2),
                      "fullgraph_speedup_vs_dma": round(dt_dma / dt_bk, 2)}))


if __name__ == "__main__":
    main()
