"""Lane-major sampled-block aggregation kernels (the training hot loop).

The dedup='none' sampler emits DenseBlocks whose source rows are
``[dst rows | sampled lanes]`` with the lanes LANE-MAJOR: lane slot j of
all F dst rows is the contiguous slice ``x[F + j*F : F + (j+1)*F]``
(sampling/sampler.py DenseBlock). A SAGE/GCN layer's aggregation is then
k masked adds of aligned [F, D] slices — but XLA lowers that strided
k-slice reduce at ~250 GB/s on a v5e (measured) because its fused loop
interleaves the k read streams tile-by-tile. This module provides the
speed-of-light path: a Pallas kernel that double-buffers one whole
[TILE, D] block per lane stream per grid step, measured at ~670 GB/s
(the r+w streaming roofline; raw axpy measures ~700 GB/s on this chip),
2.6x the XLA lowering. A matching scatter kernel makes the op
differentiable, so the full training step runs through it.

Reference parity: this replaces the reference's PyG scatter_add message
passing over sampled subgraphs (the model compute under
examples/pyg/reddit_quiver.py); the reference needs no such kernel
because warp-level gather/scatter is native on CUDA. On TPU the
positional lane-major layout turns the aggregation into streaming DMAs.

Alignment rules baked into the design (Mosaic DMA constraints, measured
on v5e): HBM row offsets must be 8-aligned -> the Pallas path requires
``F % 8 == 0`` (the common case; batch sizes are powers of two);
minor-dim slices must be 128-aligned -> the mask rides as an [k, F]
f32 operand blocked along F, and the non-TILE-aligned tail of F is
computed by the XLA formula and dynamic-update-sliced into the kernel
output (values agree exactly: same f32 accumulation order per row).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lane_aggregate"]

_TILE = 1024
_MIN_TILE = 256
_SLOTS = 2
# Lane-buffer budget for tile selection. Mosaic's DEFAULT scoped-VMEM
# limit is 16 MB — a 10.5 MB double-buffer plus pipelined in/out blocks
# at k=10, d=256, tile=1024 measured 4 KB over it on hardware (caught
# by bench_e2e; interpret mode has no such limit) — so every
# pallas_call below raises the limit via CompilerParams like the
# flash-GAT kernel does (gat_kernels.py runs at 44 MB).
_VMEM_BUDGET = 32 * 1024 * 1024
_VMEM_LIMIT = 44 * 1024 * 1024


def _pick_tile(k: int, d: int, itemsize: int, f: int):
    """Largest tile whose double-buffered lane blocks fit the VMEM budget."""
    tile = _TILE
    while tile >= _MIN_TILE:
        if _SLOTS * k * tile * d * itemsize <= _VMEM_BUDGET and tile <= f:
            return tile
        tile //= 2
    return 0


def _is_batched(x) -> bool:
    """True when tracing under vmap (the manual-DMA kernels have no
    batching rule; the XLA formula serves vmapped callers, e.g. the
    serving stack's stacked inference). Walks the whole tracer chain so
    composed transforms (jvp-of-vmap, jit-of-vmap, ...) that wrap the
    BatchTracer in an outer tracer are still detected."""
    try:
        from jax.interpreters.batching import BatchTracer
    except ImportError:  # pragma: no cover
        from jax._src.interpreters.batching import BatchTracer
    seen = 0
    while isinstance(x, jax.core.Tracer) and seen < 32:
        if isinstance(x, BatchTracer):
            return True
        # descend into the wrapped value (JVPTracer.primal,
        # DynamicJaxprTracer has no payload -> stop)
        inner = getattr(x, "primal", None)
        if inner is None:
            inner = getattr(x, "val", None)
        if inner is None:
            return False
        x = inner
        seen += 1
    return False


# ---------------------------------------------------------------------------
# XLA formula (fallback + tail + oracle). Accumulation is f32 per row in
# lane order, matching the kernel's accumulation order exactly.


def _xla_aggregate(x, maskf, aggr: str):
    k, f = maskf.shape
    d = x.shape[1]
    lanes = jax.lax.dynamic_slice_in_dim(x, f, k * f, 0).reshape(k, f, d)
    if aggr == "max":
        m = (maskf > 0)[..., None]
        out = jnp.where(m, lanes.astype(jnp.float32), -jnp.inf).max(0)
        return jnp.where(jnp.isfinite(out), out, 0.0).astype(x.dtype)
    acc = lanes.astype(jnp.float32) * maskf[..., None]
    s = acc.sum(0)
    if aggr == "mean":
        s = s / jnp.maximum(maskf.sum(0), 1.0)[:, None]
    return s.astype(x.dtype)


def _xla_tail(x, maskf, aggr: str, f0: int):
    """Aggregation of rows [f0, f) by the XLA formula."""
    k, f = maskf.shape
    lanes = jnp.stack([jax.lax.dynamic_slice_in_dim(x, f + j * f + f0,
                                                    f - f0, 0)
                       for j in range(k)])
    mt = jax.lax.dynamic_slice_in_dim(maskf, f0, f - f0, 1)
    if aggr == "max":
        mm = (mt > 0)[..., None]
        t = jnp.where(mm, lanes.astype(jnp.float32), -jnp.inf).max(0)
        t = jnp.where(jnp.isfinite(t), t, 0.0)
    else:
        t = (lanes.astype(jnp.float32) * mt[..., None]).sum(0)
        if aggr == "mean":
            t = t / jnp.maximum(mt.sum(0), 1.0)[:, None]
    return t.astype(x.dtype)


# ---------------------------------------------------------------------------
# Forward kernel: grid over TILE-blocks of F; the k lane streams are
# fetched by manual double-buffered DMA (their HBM offsets F + j*F are
# not TILE-block-granular, so BlockSpec pipelining can't express them);
# mask and output ride normal pipelined BlockSpecs.


def _fwd_kernel(m_ref, x_hbm, o_ref, buf, sems, *, f, k, tile, nt, aggr):
    i = pl.program_id(0)

    def lane_cp(j, ii, slot):
        off = pl.multiple_of(f + j * f + ii * tile, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(off, tile), :], buf.at[slot, j], sems.at[slot, j])

    @pl.when(i == 0)
    def _():
        for j in range(k):
            lane_cp(j, 0, 0).start()

    @pl.when(i + 1 < nt)
    def _():
        for j in range(k):
            lane_cp(j, i + 1, (i + 1) % _SLOTS).start()

    s = i % _SLOTS
    for j in range(k):
        lane_cp(j, i, s).wait()

    m = m_ref[:]                                   # [k, tile] f32
    if aggr == "max":
        acc = jnp.where(m[0][:, None] > 0,
                        buf[s, 0].astype(jnp.float32), -jnp.inf)
        for j in range(1, k):
            acc = jnp.maximum(acc, jnp.where(m[j][:, None] > 0,
                                             buf[s, j].astype(jnp.float32),
                                             -jnp.inf))
        acc = jnp.where(jnp.isfinite(acc), acc, 0.0)
    else:
        acc = buf[s, 0].astype(jnp.float32) * m[0][:, None]
        for j in range(1, k):
            acc = acc + buf[s, j].astype(jnp.float32) * m[j][:, None]
        if aggr == "mean":
            acc = acc / jnp.maximum(m.sum(0), 1.0)[:, None]
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("f", "k", "tile", "aggr", "interpret"))
def _fwd_pallas(x, maskf, *, f, k, tile, aggr, interpret):
    d = x.shape[1]
    f0 = (f // tile) * tile
    nt = f0 // tile
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, f=f, k=k, tile=tile, nt=nt,
                          aggr=aggr),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, d), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, k, tile, d), x.dtype),
            pltpu.SemaphoreType.DMA((_SLOTS, k)),
        ],
    )(maskf, x)
    if f0 == f:
        return out
    tail = _xla_tail(x, maskf, aggr, f0)
    return jax.lax.dynamic_update_slice_in_dim(out, tail, f0, 0)


# ---------------------------------------------------------------------------
# Backward kernel (mean/sum): dL/dx lanes = g * m (/cnt for mean),
# written back lane-major by manual DMA; dst rows get zeros. One pass:
# read g [F, D] + mask, write (1+k)F rows.


def _bwd_kernel(m_ref, g_ref, o_hbm, obuf, zbuf, osems, zsems,
                *, f, k, tile, nt, mean):
    i = pl.program_id(0)
    s = i % _SLOTS

    def ocp(j, ii, slot):
        off = pl.multiple_of(f + j * f + ii * tile, 8)
        return pltpu.make_async_copy(
            obuf.at[slot, j], o_hbm.at[pl.ds(off, tile), :],
            osems.at[slot, j])

    def zcp(ii, slot):
        off = pl.multiple_of(ii * tile, 8)
        return pltpu.make_async_copy(
            zbuf, o_hbm.at[pl.ds(off, tile), :], zsems.at[slot])

    @pl.when(i == 0)
    def _():
        zbuf[:] = jnp.zeros_like(zbuf)

    # before overwriting this slot, drain its in-flight writes
    @pl.when(i >= _SLOTS)
    def _():
        for j in range(k):
            ocp(j, i - _SLOTS, s).wait()
        zcp(i - _SLOTS, s).wait()

    m = m_ref[:]                                   # [k, tile] f32
    g = g_ref[:].astype(jnp.float32)               # [tile, d]
    if mean:
        g = g / jnp.maximum(m.sum(0), 1.0)[:, None]
    for j in range(k):
        obuf[s, j] = (g * m[j][:, None]).astype(obuf.dtype)
    for j in range(k):
        ocp(j, i, s).start()
    zcp(i, s).start()                              # zero the dst-row block

    @pl.when(i == nt - 1)
    def _():
        for j in range(k):
            ocp(j, i, s).wait()
        zcp(i, s).wait()
        if nt >= 2:                                # nt is static
            for j in range(k):
                ocp(j, i - 1, (i - 1) % _SLOTS).wait()
            zcp(i - 1, (i - 1) % _SLOTS).wait()


@functools.partial(jax.jit, static_argnames=("f", "k", "tile", "mean",
                                             "interpret", "dtype"))
def _bwd_pallas(g, maskf, *, f, k, tile, mean, interpret, dtype):
    d = g.shape[1]
    f0 = (f // tile) * tile
    nt = f0 // tile
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, f=f, k=k, tile=tile, nt=nt,
                          mean=mean),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        out_shape=jax.ShapeDtypeStruct((f * (1 + k), d), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, k, tile, d), dtype),
            pltpu.VMEM((tile, d), dtype),
            pltpu.SemaphoreType.DMA((_SLOTS, k)),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
        ],
    )(maskf, g)
    if f0 == f:
        return dx
    # tail rows: dst zeros in [f0, f), per-lane grads in each section
    gt = jax.lax.dynamic_slice_in_dim(g, f0, f - f0, 0).astype(jnp.float32)
    mt = jax.lax.dynamic_slice_in_dim(maskf, f0, f - f0, 1)
    if mean:
        gt = gt / jnp.maximum(mt.sum(0), 1.0)[:, None]
    dx = jax.lax.dynamic_update_slice_in_dim(
        dx, jnp.zeros((f - f0, d), dtype), f0, 0)
    for j in range(k):
        blk = (gt * mt[j][:, None]).astype(dtype)
        dx = jax.lax.dynamic_update_slice_in_dim(dx, blk, f + j * f + f0, 0)
    return dx


def _xla_bwd(g, maskf, mean: bool, dtype):
    k, f = maskf.shape
    d = g.shape[1]
    gf = g.astype(jnp.float32)
    if mean:
        gf = gf / jnp.maximum(maskf.sum(0), 1.0)[:, None]
    lanes = (gf[None] * maskf[..., None]).astype(dtype).reshape(k * f, d)
    return jnp.concatenate([jnp.zeros((f, d), dtype), lanes], axis=0)


# ---------------------------------------------------------------------------
# Dispatch + custom VJP


def _use_pallas(x, f: int, k: int, d: int) -> int:
    """Tile size for the Pallas path, or 0 for the XLA formula.

    d must be a lane-tile multiple: Mosaic flattens the 4D
    [slots, k, tile, d] scratch to [slots*k*tile, pad128(d)] and
    rejects .at[slot, j] slices whose minor width (d) is not
    128-aligned. Pad feature/hidden dims to 128 to stay on this path.
    """
    if jax.default_backend() != "tpu" or _is_batched(x) or f % 8 or d % 128:
        return 0
    tile = _pick_tile(k, d, x.dtype.itemsize, f)
    return tile if tile and f >= 2 * tile else 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lane_agg(x, maskf, aggr):
    k, f = maskf.shape
    tile = _use_pallas(x, f, k, x.shape[1])
    if tile:
        return _fwd_pallas(x, maskf, f=f, k=k, tile=tile, aggr=aggr,
                           interpret=False)
    return _xla_aggregate(x, maskf, aggr)


def _lane_agg_fwd(x, maskf, aggr):
    return _lane_agg(x, maskf, aggr), maskf


def _lane_agg_bwd(aggr, maskf, g):
    xdtype = g.dtype          # out dtype == x dtype
    k, f = maskf.shape
    tile = _use_pallas(g, f, k, g.shape[1])
    if tile:
        dx = _bwd_pallas(g, maskf, f=f, k=k, tile=tile,
                         mean=aggr == "mean", interpret=False, dtype=xdtype)
    else:
        dx = _xla_bwd(g, maskf, aggr == "mean", xdtype)
    return dx, jnp.zeros(maskf.shape, jnp.float32)


_lane_agg.defvjp(_lane_agg_fwd, _lane_agg_bwd)


def lane_aggregate(x, mask, aggr: str = "mean"):
    """Masked lane aggregation over a lane-major DenseBlock.

    Args:
      x: [F*(1+k), D] source rows (``[dst | lane slot 0 | ... | k-1]``).
      mask: [F, k] bool lane validity (DenseBlock.mask).
      aggr: "mean" | "sum" | "max".

    Returns [F, D] aggregated rows (x.dtype); degree-0 rows are 0.

    mean/sum run the Pallas streaming kernel with a custom VJP on TPU
    (XLA formula elsewhere / under vmap / for unaligned F); max falls
    back to the XLA formula (its VJP needs argmax bookkeeping the
    streaming kernel doesn't keep — max is not on any hot path).
    """
    if aggr not in ("mean", "sum", "max"):
        raise ValueError(f"aggr must be mean/sum/max, got {aggr!r}")
    maskf = jax.lax.stop_gradient(mask.T.astype(jnp.float32))
    if aggr == "max":
        return _xla_aggregate(x, maskf, "max")
    return _lane_agg(x, maskf, aggr)


# ---------------------------------------------------------------------------
# Typed-relation aggregation: ALL R per-relation aggregates in one pass.
# ``relf`` [k, F] f32 carries mask AND relation: -1 = invalid lane,
# else the lane's relation id.


def _xla_rel(x, relf, R: int, mean: bool):
    k, f = relf.shape
    d = x.shape[1]
    lanes = jax.lax.dynamic_slice_in_dim(x, f, k * f, 0).reshape(k, f, d)
    oh = (relf[..., None]
          == jnp.arange(R, dtype=jnp.float32)).astype(jnp.float32)
    acc = (lanes.astype(jnp.float32)[:, :, None, :]
           * oh[..., None]).sum(0)                         # [f, R, d]
    if mean:
        acc = acc / jnp.maximum(oh.sum(0), 1.0)[..., None]
    return acc.astype(x.dtype)


def _xla_rel_bwd(g, relf, R: int, mean: bool, dtype):
    """dx for _xla_rel: dst rows zero; lane j of row i gets
    g[i, rel_ij] (/cnt for mean)."""
    k, f = relf.shape
    d = g.shape[-1]
    gf = g.astype(jnp.float32)                             # [f, R, d]
    if mean:
        oh = (relf[..., None]
              == jnp.arange(R, dtype=jnp.float32)).astype(jnp.float32)
        gf = gf / jnp.maximum(oh.sum(0), 1.0)[..., None]
    ridx = jnp.clip(relf, 0, R - 1).astype(jnp.int32)      # [k, f]
    sel = jnp.take_along_axis(
        gf[None], ridx[..., None, None], axis=2)[:, :, 0]  # [k, f, d]
    lanes = (sel * (relf >= 0)[..., None]).astype(dtype).reshape(k * f, d)
    return jnp.concatenate([jnp.zeros((f, d), dtype), lanes], axis=0)


# The rel kernel's output stream equals its input stream (R*d written
# per tile vs k*d read), so it triple-buffers (the output copy-out
# needs its own slot of slack) where the plain kernel double-buffers.
_REL_SLOTS = 3


def _fwd_rel_kernel(r_ref, x_hbm, o_ref, buf, sems,
                    *, f, k, tile, nt, R, d, mean):
    i = pl.program_id(0)

    def lane_cp(j, ii, slot):
        off = pl.multiple_of(f + j * f + ii * tile, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(off, tile), :], buf.at[slot, j], sems.at[slot, j])

    @pl.when(i == 0)
    def _():
        for j in range(k):
            lane_cp(j, 0, 0).start()

    @pl.when(i + 1 < nt)
    def _():
        for j in range(k):
            lane_cp(j, i + 1, (i + 1) % _REL_SLOTS).start()

    s = i % _REL_SLOTS
    for j in range(k):
        lane_cp(j, i, s).wait()

    rel = r_ref[:]                                 # [k, tile] f32
    # hoist the lane-buffer reads: Mosaic does NOT CSE scratch reads
    # across the R loop — re-reading buf[s, j] per relation measured
    # 3.6 ms where this form measures 1.5 ms (618 GB/s) at R=5, k=5
    lanes = [buf[s, j].astype(jnp.float32) for j in range(k)]
    accs = []
    for r in range(R):
        mr = (rel == float(r)).astype(jnp.float32)
        acc = lanes[0] * mr[0][:, None]
        for j in range(1, k):
            acc = acc + lanes[j] * mr[j][:, None]
        if mean:
            acc = acc / jnp.maximum(mr.sum(0), 1.0)[:, None]
        accs.append(acc)
    o_ref[:] = jnp.concatenate(accs, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("f", "k", "tile", "R",
                                             "mean", "interpret"))
def _fwd_rel_pallas(x, relf, *, f, k, tile, R, mean, interpret):
    d = x.shape[1]
    f0 = (f // tile) * tile
    nt = f0 // tile
    out = pl.pallas_call(
        functools.partial(_fwd_rel_kernel, f=f, k=k, tile=tile, nt=nt,
                          R=R, d=d, mean=mean),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((tile, R * d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, R * d), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[
            pltpu.VMEM((_REL_SLOTS, k, tile, d), x.dtype),
            pltpu.SemaphoreType.DMA((_REL_SLOTS, k)),
        ],
    )(relf, x)
    out = out.reshape(f, R, d)
    if f0 == f:
        return out
    rt = jax.lax.dynamic_slice_in_dim(relf, f0, f - f0, 1)
    lanes = jnp.stack([jax.lax.dynamic_slice_in_dim(x, f + j * f + f0,
                                                    f - f0, 0)
                       for j in range(k)])
    xt = jnp.concatenate(
        [jnp.zeros((f - f0, d), x.dtype), lanes.reshape(-1, d)], axis=0)
    tail = _xla_rel(xt, rt, R, mean)
    return jax.lax.dynamic_update_slice_in_dim(out, tail, f0, 0)


def _bwd_rel_kernel(r_ref, g_ref, o_hbm, obuf, zbuf, osems, zsems,
                    *, f, k, tile, nt, R, d, mean):
    i = pl.program_id(0)
    s = i % _SLOTS

    def ocp(j, ii, slot):
        off = pl.multiple_of(f + j * f + ii * tile, 8)
        return pltpu.make_async_copy(
            obuf.at[slot, j], o_hbm.at[pl.ds(off, tile), :],
            osems.at[slot, j])

    def zcp(ii, slot):
        off = pl.multiple_of(ii * tile, 8)
        return pltpu.make_async_copy(
            zbuf, o_hbm.at[pl.ds(off, tile), :], zsems.at[slot])

    @pl.when(i == 0)
    def _():
        zbuf[:] = jnp.zeros_like(zbuf)

    @pl.when(i >= _SLOTS)
    def _():
        for j in range(k):
            ocp(j, i - _SLOTS, s).wait()
        zcp(i - _SLOTS, s).wait()

    rel = r_ref[:]                                 # [k, tile]
    g = g_ref[:].astype(jnp.float32)               # [tile, R*d]
    gs = []
    for r in range(R):
        gr = g[:, r * d:(r + 1) * d]
        if mean:
            cnt = (rel == float(r)).astype(jnp.float32).sum(0)
            gr = gr / jnp.maximum(cnt, 1.0)[:, None]
        gs.append(gr)
    for j in range(k):
        acc = gs[0] * (rel[j] == 0.0).astype(jnp.float32)[:, None]
        for r in range(1, R):
            acc = acc + gs[r] * (rel[j] == float(r)
                                 ).astype(jnp.float32)[:, None]
        obuf[s, j] = acc.astype(obuf.dtype)
    for j in range(k):
        ocp(j, i, s).start()
    zcp(i, s).start()

    @pl.when(i == nt - 1)
    def _():
        for j in range(k):
            ocp(j, i, s).wait()
        zcp(i, s).wait()
        if nt >= 2:
            for j in range(k):
                ocp(j, i - 1, (i - 1) % _SLOTS).wait()
            zcp(i - 1, (i - 1) % _SLOTS).wait()


@functools.partial(jax.jit, static_argnames=("f", "k", "tile", "R",
                                             "mean", "interpret", "dtype"))
def _bwd_rel_pallas(g, relf, *, f, k, tile, R, mean, interpret, dtype):
    d = g.shape[-1]
    g2 = g.reshape(f, R * d)
    f0 = (f // tile) * tile
    nt = f0 // tile
    dx = pl.pallas_call(
        functools.partial(_bwd_rel_kernel, f=f, k=k, tile=tile, nt=nt,
                          R=R, d=d, mean=mean),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, R * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        out_shape=jax.ShapeDtypeStruct((f * (1 + k), d), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, k, tile, d), dtype),
            pltpu.VMEM((tile, d), dtype),
            pltpu.SemaphoreType.DMA((_SLOTS, k)),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
        ],
    )(relf, g2)
    if f0 == f:
        return dx
    gt = jax.lax.dynamic_slice_in_dim(g, f0, f - f0, 0)
    rt = jax.lax.dynamic_slice_in_dim(relf, f0, f - f0, 1)
    tail = _xla_rel_bwd(gt, rt, R, mean, dtype)     # [(1+k)(f-f0), d]
    ft = f - f0
    dx = jax.lax.dynamic_update_slice_in_dim(
        dx, jnp.zeros((ft, d), dtype), f0, 0)
    for j in range(k):
        blk = jax.lax.dynamic_slice_in_dim(tail, ft + j * ft, ft, 0)
        dx = jax.lax.dynamic_update_slice_in_dim(dx, blk, f + j * f + f0, 0)
    return dx


def _use_pallas_rel(x, f: int, k: int, d: int, R: int) -> int:
    if jax.default_backend() != "tpu" or _is_batched(x) or f % 8 or d % 128:
        return 0
    tile = _pick_tile(k, d, x.dtype.itemsize, f)
    # triple-buffered lane blocks + the [tile, R*d] output block and
    # its f32 staging must also fit
    while tile >= _MIN_TILE and (
            _REL_SLOTS * k * tile * d * x.dtype.itemsize
            + tile * R * d * 8 > _VMEM_BUDGET):
        tile //= 2
    return tile if tile >= _MIN_TILE and f >= 2 * tile else 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rel_agg(x, relf, R, mean):
    tile = _use_pallas_rel(x, relf.shape[1], relf.shape[0], x.shape[1], R)
    if tile:
        return _fwd_rel_pallas(x, relf, f=relf.shape[1], k=relf.shape[0],
                               tile=tile, R=R, mean=mean, interpret=False)
    return _xla_rel(x, relf, R, mean)


def _rel_agg_fwd(x, relf, R, mean):
    return _rel_agg(x, relf, R, mean), relf


def _rel_agg_bwd(R, mean, relf, g):
    dtype = g.dtype
    k, f = relf.shape
    tile = _use_pallas_rel(g, f, k, g.shape[-1], R)
    if tile:
        dx = _bwd_rel_pallas(g, relf, f=f, k=k, tile=tile, R=R,
                             mean=mean, interpret=False, dtype=dtype)
    else:
        dx = _xla_rel_bwd(g, relf, R, mean, dtype)
    return dx, jnp.zeros(relf.shape, jnp.float32)


_rel_agg.defvjp(_rel_agg_fwd, _rel_agg_bwd)


def lane_aggregate_rel(x, mask, edge_type, num_relations: int,
                       aggr: str = "mean"):
    """ALL per-relation lane aggregates in ONE pass over the block.

    Args:
      x: [F*(1+k), D] source rows (lane-major DenseBlock layout).
      mask: [F, k] bool lane validity.
      edge_type: [F, k] int relation id per lane (values < 0 or >= R on
        masked-off lanes are fine — the mask wins).
      num_relations: R.
      aggr: "mean" | "sum" (per-relation lane count normalizes mean).

    Returns [F, R, D]: out[i, r] = aggr over lanes j of row i with
    edge_type r. The typed-edge (RGCN / hetero) aggregation primitive:
    the double-buffered lane-streaming Pallas kernel reads each lane
    row ONCE and accumulates all R relation sums in VMEM (custom VJP:
    the bwd selects each lane's grad from its relation's slab in one
    write pass), where R separate lane_aggregate calls read the full
    [F*k, D] block R times and the XLA multiply-reduce materializes
    R-times the traffic (reference analogue: per-relation message
    transforms in MAG240M RGCN,
    /root/reference/benchmarks/ogbn-mag240m/train_quiver.py).
    XLA formula off-TPU / under vmap / for unaligned shapes.
    """
    if aggr not in ("mean", "sum"):
        raise ValueError(f"aggr must be mean/sum, got {aggr!r}")
    R = int(num_relations)
    relf = jax.lax.stop_gradient(
        jnp.where(mask, edge_type, -1).T.astype(jnp.float32))
    return _rel_agg(x, relf, R, aggr == "mean")
