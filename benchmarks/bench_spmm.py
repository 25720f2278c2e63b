"""Aggregation + transform kernel efficiency (the SpMM/SDDMM analogue).

NOTE on absolute numbers: on this environment's virtualized chip even a
plain bf16 axpy over the same array achieves only ~180 GB/s (f32:
~286 GB/s) — a multi-ms per-op floor, not the silicon's 819 GB/s. Read
the percentages relative to that measured ceiling when comparing
kernels; layer time within a few ms of the axpy floor is at the
achievable bound.

The reference's model compute is PyG scatter-based SpMM; the TPU build's
aggregation over dense positional blocks is a masked fanout reduction
fused with the MXU matmuls. This bench measures a full SAGEConv layer
(fwd) and a GATConv layer (fwd, incl. the softmax SDDMM analogue) on a
products-scale outer block and reports achieved TFLOP/s vs the chip's
bf16 peak — the "speed-of-light per chip" check from BASELINE.md.
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

quiver_tpu.enable_compilation_cache()

F, K = 180_224, 5            # products-scale outer block
D_IN, D_OUT = 256, 256
V5E_BF16_PEAK_TFLOPS = 197.0


V5E_HBM_GBPS = 819.0


def bench_layer(layer, x, adj, params, flops, bytes_moved, label, iters=20):
    """Aggregation layers are BANDWIDTH-bound at GNN shapes (a SAGE layer
    reads ~0.5 GB of lane features for ~0.3 GFLOP of matmul), so the
    meaningful roofline is HBM bytes; TFLOP/s is reported for context."""
    apply_j = jax.jit(layer.apply)
    out = apply_j(params, x, adj)
    _ = float(jnp.sum(out[:1]))
    t0 = time.time()
    outs = [apply_j(params, x, adj) for _ in range(iters)]
    _ = float(jnp.sum(outs[-1][:1]))
    dt = (time.time() - t0) / iters
    tf = flops / dt / 1e12
    gbps = bytes_moved / dt / 1e9
    print(f"{label}: {dt*1e3:.2f} ms -> {gbps:.0f} GB/s "
          f"({gbps/V5E_HBM_GBPS*100:.0f}% of HBM roofline), "
          f"{tf:.1f} TFLOP/s ({tf/V5E_BF16_PEAK_TFLOPS*100:.0f}% of MXU peak)",
          file=sys.stderr)
    return gbps


def main():
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

    # Full-graph aggregation: Pallas fused CSR SpMM vs the XLA
    # gather+segment path, on a power-law graph slice. Both are
    # descriptor-bound (~1 feature-row fetch per edge); the kernel's win
    # is skipping the [E, D] HBM round trip + the sorted scatter.
    from quiver_tpu.ops.spmm import spmm_csr, spmm_csr_reference
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

    def timed(fn, label):
        out = fn()
        _ = float(jnp.sum(out[:1]))
        t0 = time.time()
        outs = [fn() for _ in range(3)]
        _ = float(jnp.sum(outs[-1][:1]))
        dt = (time.time() - t0) / 3
        eps = Eg / dt
        print(f"{label}: {dt*1e3:.1f} ms ({eps/1e6:.1f}M edges/s; "
              f"descriptor roofline ~100M rows/s)", file=sys.stderr)
        return dt

    dt_xla = timed(lambda: spmm_csr_reference(ip_j, idx_j, xg),
                   f"full-graph XLA gather+segment ({Eg/1e6:.1f}M edges)")
    dt_pl = timed(lambda: spmm_csr(ip_j, idx_j, xg), "full-graph Pallas SpMM")

    print(json.dumps({"sage_gbps": round(g_sage, 1),
                      "gat_gbps": round(g_gat, 1),
                      "hbm_roofline_gbps": V5E_HBM_GBPS,
                      "fullgraph_xla_ms": round(dt_xla * 1e3, 1),
                      "fullgraph_pallas_ms": round(dt_pl * 1e3, 1),
                      "fullgraph_speedup": round(dt_xla / dt_pl, 2)}))


if __name__ == "__main__":
    main()
