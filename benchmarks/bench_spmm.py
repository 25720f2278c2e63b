"""Aggregation + transform kernel efficiency (the SpMM/SDDMM analogue).

Round-3 methodology: all timings are pure DEVICE time via chained
in-jit loops (benchmarks/_timing.py), chained on the smallest float
input that forces re-execution (the [k, F] mask for sampled blocks) —
chaining on the 553 MB feature operand adds a ~1.6 ms/iter phantom
copy whenever the consumer is a pallas_call or gather (hazard 3 in
_timing.py). Round-2 numbers additionally included a ~1.5 ms/iter
share of the axon tunnel's ~30 ms host-sync round trip; do not compare
r2 and r3 absolute numbers.

The reference's model compute is PyG scatter-based SpMM; the TPU build
has two regimes:

- **Sampled-block (training) path**: lane-major dense blocks + the
  double-buffered lane-streaming Pallas kernel (ops/lane_kernels.py):
  one [TILE, D] DMA per lane stream per grid step, masked f32
  accumulate, pipelined output. Measured 776 GB/s fwd on this chip
  (95% of the 819 GB/s read roofline) vs ~250 GB/s for XLA's fused
  strided k-slice reduce — the layer fwd runs at its traffic floor.
- **Full-graph (inference) path**: degree-bucketed padded gather
  (ops/spmm.py spmm_csr) vs the XLA gather+segment oracle and vs the
  per-edge-DMA Pallas kernel (spmm_csr_dma, kept as the measured
  descriptor-bound reference). Full-graph numbers chain on the feature
  table itself; the chained copy inflates them ~1.5% (conservative).
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
from quiver_tpu.models import SAGEConv, GATConv
from quiver_tpu.sampling.sampler import DenseBlock
from _timing import chain_time, rtt

quiver_tpu.enable_compilation_cache()

F, K = 180_224, 5            # products-scale outer block
D_IN, D_OUT = 256, 256
V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def bench_layer(layer, x, maskf, params, flops, bytes_moved, label,
                iters=16, chain_on="mask"):
    """Aggregation layers are BANDWIDTH-bound at GNN shapes (a SAGE layer
    reads ~0.5 GB of lane features for ~0.3 GFLOP of matmul), so the
    meaningful roofline is HBM bytes; TFLOP/s is reported for context.

    chain_on: "mask" chains on the [K, F] f32 mask (1.4 MB/iter phantom
    copy, <0.1%) — right when the kernel consumes x directly (a
    perturbed x would be materialized, hazard 3). "x" chains on the
    features — required when a matmul separates x from the kernel
    (GATConv's lin): chaining on the mask would leave the matmul
    loop-invariant and LICM would hoist it out of the measurement,
    while the matmul consumer fuses the perturbation for free.
    """
    def fwd(mf, xv):
        adj = DenseBlock(mask=mf.T > 0, e_id=jnp.zeros((F, K), jnp.int32),
                         dst_count=jnp.int32(F), size=(F * (1 + K), F),
                         fanout=K)
        return layer.apply(params, xv, adj)
    if chain_on == "x":
        dt = chain_time(lambda xv, mf: fwd(mf, xv), x, maskf, iters=iters)
    else:
        dt = chain_time(fwd, maskf, x, iters=iters)
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
    n_src = F * (1 + K)
    # on-device data (host->device transfer of 0.5 GB over the axon
    # tunnel is minutes; generation is milliseconds)
    x = jax.random.normal(jax.random.PRNGKey(0), (n_src, D_IN),
                          jnp.bfloat16)
    maskf = (jax.random.uniform(jax.random.PRNGKey(1), (K, F)) < 0.95
             ).astype(jnp.float32)
    adj = DenseBlock(mask=maskf.T > 0, e_id=jnp.zeros((F, K), jnp.int32),
                     dst_count=jnp.int32(F), size=(n_src, F), fanout=K)

    bpe = 2  # bf16
    sage = SAGEConv(D_OUT)
    p = sage.init(jax.random.PRNGKey(0), x, adj)
    sage_flops = 2 * F * D_IN * D_OUT * 2
    # min traffic: read all src rows once + write [F, D_OUT]
    sage_bytes = n_src * D_IN * bpe + F * D_OUT * bpe
    g_sage = bench_layer(sage, x, maskf, p, sage_flops, sage_bytes,
                         "SAGEConv fwd")

    gat = GATConv(D_OUT // 4, heads=4, dtype=jnp.bfloat16)
    pg = gat.init(jax.random.PRNGKey(0), x, adj)
    gat_flops = 2 * n_src * D_IN * D_OUT
    # min traffic: read src rows + write xw (the lin matmul), then the
    # flash kernel reads ALL xw rows back (lanes + dst for a_dst) and
    # writes [F, D_OUT]
    gat_bytes = (n_src * D_IN + n_src * D_OUT + n_src * D_OUT
                 + F * D_OUT) * bpe
    g_gat = bench_layer(gat, x, maskf, pg, gat_flops, gat_bytes,
                        "GATConv fwd", chain_on="x")

    # GAT fwd+bwd through the flash custom VJP (attention training path)
    def gat_loss(xv, mf):
        adj2 = DenseBlock(mask=mf.T > 0, e_id=jnp.zeros((F, K), jnp.int32),
                          dst_count=jnp.int32(F), size=(n_src, F), fanout=K)
        return (gat.apply(pg, xv, adj2).astype(jnp.float32) ** 2).mean()
    gat_grad = jax.grad(gat_loss, argnums=0)
    dt_gat_bwd = chain_time(gat_grad, x, maskf, iters=8)
    print(f"GATConv fwd+bwd: {dt_gat_bwd*1e3:.2f} ms", file=sys.stderr)

    # fwd+bwd through the lane kernel's custom VJP (the training path)
    def loss(mf, xv):
        adj2 = DenseBlock(mask=mf.T > 0, e_id=jnp.zeros((F, K), jnp.int32),
                          dst_count=jnp.int32(F), size=(n_src, F), fanout=K)
        return (sage.apply(p, xv, adj2).astype(jnp.float32) ** 2).mean()
    grad_fn = jax.grad(loss, argnums=1)
    dt_bwd = chain_time(grad_fn, maskf, x, iters=8)
    print(f"SAGEConv fwd+bwd: {dt_bwd*1e3:.2f} ms", file=sys.stderr)

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
    xg = jax.random.normal(jax.random.PRNGKey(2), (Vg, 128), jnp.float32)
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

    # full-graph 4-head GAT through the same bucketed layout (one pass,
    # the layer contract: source logits recomputed from the gathered
    # rows via att_src — zero extra gather traffic)
    H, C = 4, 32
    xwg = jax.random.normal(jax.random.PRNGKey(3), (Vg, H, C), jnp.float32)
    attg = jax.random.normal(jax.random.PRNGKey(4), (H, C), jnp.float32)
    adg = jax.random.normal(jax.random.PRNGKey(5), (Vg, H), jnp.float32)
    dt_gat = chain_time(
        lambda xv: gat_csr(ip_j, idx_j, xv, None, adg, plan=plan,
                           att_src=attg),
        xwg, iters=8)
    print(f"full-graph GAT 4-head fused: {dt_gat*1e3:.1f} ms "
          f"({Eg/dt_gat/1e6:.1f}M edges/s, all heads)", file=sys.stderr)

    print(json.dumps({"sage_gbps": round(g_sage, 1),
                      "gat_gbps": round(g_gat, 1),
                      "sage_fwd_bwd_ms": round(dt_bwd * 1e3, 2),
                      "gat_fwd_bwd_ms": round(dt_gat_bwd * 1e3, 2),
                      "hbm_roofline_gbps": V5E_HBM_GBPS,
                      "fullgraph_xla_ms": round(dt_xla * 1e3, 1),
                      "fullgraph_bucketed_ms": round(dt_bk * 1e3, 1),
                      "fullgraph_dma_pallas_ms": round(dt_dma * 1e3, 1),
                      "fullgraph_gat4h_ms": round(dt_gat * 1e3, 1),
                      "fullgraph_speedup_vs_xla": round(dt_xla / dt_bk, 2),
                      "fullgraph_speedup_vs_dma": round(dt_dma / dt_bk, 2)}))


if __name__ == "__main__":
    main()
