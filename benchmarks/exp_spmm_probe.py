"""Hardware probes that size the SpMM redesign (round 3).

Measures, on the real chip:
  P1  streaming bandwidth: XLA axpy + Pallas sequential-copy, f32/bf16
  P2  XLA dynamic-gather (jnp.take) descriptor rate at several id counts
  P3  in-kernel VMEM gather (jnp.take on a loaded tile) — supported? rate?
  P4  one-hot MXU matmul rate ([128,512]@[512,128] chains)
  P5  current per-edge-DMA spmm_csr for reference

These numbers pick between: per-edge DMA (descriptor-bound), two-phase
gather+reduce, and the bucketed stream design (sequential x streaming +
one-hot MXU gather/scatter).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import quiver_tpu

quiver_tpu.enable_compilation_cache()


def _force(r):
    # on the axon tunnel block_until_ready returns early; a dependent
    # scalar device->host read is the only reliable barrier
    return float(jnp.sum(jnp.ravel(r)[:1]))


def timed(fn, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn()
    _force(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    _force(r)
    return (time.time() - t0) / iters


_RTT = None


def rtt():
    """One-force round-trip cost (subtract from per-batch timings)."""
    global _RTT
    if _RTT is None:
        y = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda a: a + 1.0)
        _force(f(y))
        t0 = time.time()
        for _ in range(10):
            _force(f(y))
        _RTT = (time.time() - t0) / 10
        print(f"P0 force round-trip: {_RTT*1e3:.2f} ms")
    return _RTT


def timed2(fn, iters=30, warmup=2):
    """RTT-corrected: one force per batch of iters."""
    r = rtt()
    for _ in range(warmup):
        out = fn()
    _force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _force(out)
    return max((time.time() - t0 - r) / iters, 1e-9)


def p1_stream():
    N = 64 * 1024 * 1024  # 256 MB f32
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.ones((N // 128, 128), dt)
        axpy = jax.jit(lambda a: a * 2.0 + 1.0)
        t = timed(lambda: axpy(x))
        nbytes = x.size * x.dtype.itemsize
        print(f"P1 axpy {name}: {t*1e3:.2f} ms  {2*nbytes/t/1e9:.0f} GB/s (r+w)")

        # Pallas tiled reduce (read-only traffic)
        def k(x_ref, o_ref):
            o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True)
        R = x.shape[0]
        TILE = 4096
        red = pl.pallas_call(
            k,
            grid=(R // TILE,),
            in_specs=[pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), dt),
        )
        redj = jax.jit(red)
        t = timed(lambda: redj(x))
        print(f"P1 pallas read {name}: {t*1e3:.2f} ms  {nbytes/t/1e9:.0f} GB/s (read)")


def p2_take():
    V, D = 2_500_000, 128
    table = jnp.ones((V, D), jnp.float32)
    for M in (131_072, 1_048_576, 3_000_000):
        ids = jnp.asarray(np.random.default_rng(0).integers(0, V, M), jnp.int32)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))
        t = timed(lambda: f(table, ids), iters=5)
        print(f"P2 take M={M}: {t*1e3:.2f} ms  {M/t/1e6:.1f}M rows/s")


def p3_vmem_take():
    S, D, M = 512, 128, 32768  # gather M rows from an S-row VMEM tile
    tile = jnp.arange(S * D, dtype=jnp.float32).reshape(S, D)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, S, M), jnp.int32)

    def k(ids_ref, tile_ref, o_ref):
        t = tile_ref[:]
        o_ref[:] = jnp.take(t, ids_ref[:], axis=0)

    try:
        f = jax.jit(pl.pallas_call(
            k,
            grid=(M // 128,),
            in_specs=[pl.BlockSpec((128,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((S, D), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        ))
        out = f(ids, tile)
        ok = bool(jnp.all(out[:8] == tile[ids[:8]]))
        t = timed(lambda: f(ids, tile), iters=10)
        print(f"P3 vmem take: OK correct={ok}  {t*1e3:.3f} ms  "
              f"{M/t/1e6:.1f}M rows/s")
    except Exception as e:  # noqa
        print(f"P3 vmem take: UNSUPPORTED ({type(e).__name__}: {str(e)[:160]})")


def p3b_onehot_gather():
    # one-hot matmul gather: [128,512]@[512,128] per chunk
    S, D, M = 512, 128, 32768
    tile = jnp.arange(S * D, dtype=jnp.float32).reshape(S, D)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, S, M), jnp.int32)

    def k(ids_ref, tile_ref, o_ref):
        iv = ids_ref[:]
        oh = (iv[:, None] == jax.lax.broadcasted_iota(jnp.int32, (128, S), 1)
              ).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, tile_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    f = jax.jit(pl.pallas_call(
        k,
        grid=(M // 128,),
        in_specs=[pl.BlockSpec((128,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((S, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
    ))
    out = f(ids, tile)
    ok = bool(jnp.all(out[:8] == tile[ids[:8]]))
    t = timed(lambda: f(ids, tile), iters=10)
    print(f"P3b onehot gather: correct={ok}  {t*1e3:.3f} ms  "
          f"{M/t/1e6:.1f}M rows/s")


def p5_current():
    from quiver_tpu.ops.spmm import spmm_csr
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
    t = timed(lambda: spmm_csr(ip_j, idx_j, xg), iters=3, warmup=1)
    print(f"P5 current spmm_csr: {t*1e3:.1f} ms  {Eg/t/1e6:.1f}M edges/s "
          f"({Eg} edges)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["p1", "p2", "p3", "p3b", "p5"]
    for name in which:
        globals()[{"p1": "p1_stream", "p2": "p2_take", "p3": "p3_vmem_take",
                   "p3b": "p3b_onehot_gather", "p5": "p5_current"}[name]]()
