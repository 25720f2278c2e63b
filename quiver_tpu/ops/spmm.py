"""Pallas CSR SpMM: fused gather-and-accumulate for neighbor aggregation.

TPU-native replacement for the scatter-based SpMM under the reference's
PyG model compute (and this repo's XLA fallback,
``jnp.take`` + ``segment_sum`` in ops/segment.py): one kernel walks the
CSR row blocks, DMAs the needed feature rows HBM->VMEM, and accumulates
them onto the destination tile with an MXU one-hot matmul — the [E, D]
gathered-messages intermediate never exists in HBM and no scatter is
issued.

Cost model (why this shape): neighbor aggregation on TPU is
gather-DESCRIPTOR-bound — a feature row fetch costs ~the same for 1..128
lanes, so the kernel's floor is one row-DMA per edge. What the fusion
saves vs the XLA path is the 2x E*D*4-byte HBM round trip of the
materialized messages plus the sorted-scatter segment reduction. The
accumulation itself rides the MXU: for each 128-edge chunk, a [R, chunk]
one-hot of destination rows times the [chunk, D] fetched rows.

Forward-only (full-graph inference); training uses the sampled dense
positional blocks which need no SpMM at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spmm_csr", "spmm_csr_reference", "CSRBlock", "full_graph_csr",
           "gat_csr", "gat_csr_reference"]


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("indptr", "indices"),
                   meta_fields=("size",))
class CSRBlock:
    """A whole CSR graph as an aggregation block: layers aggregate over
    it with the fused Pallas SpMM instead of an E-wide edge list (the
    full-graph inference fast path). ``size`` = (src_count, dst_count).
    """

    def __init__(self, indptr, indices, size):
        self.indptr = indptr
        self.indices = indices
        self.size = tuple(size)


def full_graph_csr(indptr, indices) -> CSRBlock:
    """Whole-graph block for full-graph inference through the Pallas
    SpMM (counterpart of models.nets.full_graph_adj, which materializes
    the E-wide edge list for the XLA segment path)."""
    V = int(np.asarray(indptr).shape[0]) - 1
    return CSRBlock(jnp.asarray(np.asarray(indptr), jnp.int32),
                    jnp.asarray(np.asarray(indices), jnp.int32),
                    (V, V))

_R = 128          # dst rows per grid step
_CHUNK = 128      # edges fetched/accumulated per inner iteration
_INFLIGHT = 16    # concurrent feature-row DMAs


def spmm_csr_reference(indptr, indices, x, aggr="mean"):
    """XLA oracle: gather messages then segment-reduce (the before path)."""
    from .segment import segment_sum, segment_mean

    V = indptr.shape[0] - 1
    E = indices.shape[0]
    rows = jnp.searchsorted(indptr.astype(jnp.int64),
                            jnp.arange(E, dtype=jnp.int64), side="right") - 1
    msgs = jnp.take(x, indices, axis=0)
    if aggr == "mean":
        return segment_mean(msgs, rows.astype(jnp.int32), V)
    return segment_sum(msgs, rows.astype(jnp.int32), V)


def _kernel(starts_ref, ends_ref, indices_ref, x_ref, out_ref,
            acc_ref, idx_ref, xrows_ref, idx_sem, row_sems, *,
            mean: bool, d: int):
    starts = starts_ref[0, 0]                  # [R] int32 edge starts
    ends = ends_ref[0, 0]                      # [R] int32 edge ends
    e0 = starts[0]
    e_end = ends[_R - 1]

    acc_ref[:] = jnp.zeros((_R, d), jnp.float32)

    # chunk rows are _CHUNK-aligned (HBM slices must be tile-aligned);
    # boundary lanes belonging to neighboring blocks mask out via onehot
    c0 = e0 // _CHUNK
    n_chunks = pl.cdiv(e_end, _CHUNK) - c0

    def chunk_body(c, _):
        row = c0 + c
        s = row * _CHUNK
        # 1) fetch this chunk of CSR column ids (one row DMA)
        cp = pltpu.make_async_copy(indices_ref.at[row], idx_ref, idx_sem)
        cp.start()
        cp.wait()

        # 2) fetch the feature rows, _INFLIGHT DMAs in flight
        def row_dma(j, slot):
            rid = idx_ref[j]
            return pltpu.make_async_copy(x_ref.at[rid],
                                         xrows_ref.at[j], row_sems.at[slot])

        for j in range(_INFLIGHT):
            row_dma(j, j).start()
        for j in range(_CHUNK):
            row_dma(j, j % _INFLIGHT).wait()
            nxt = j + _INFLIGHT
            if nxt < _CHUNK:
                row_dma(nxt, nxt % _INFLIGHT).start()

        # 3) accumulate: one-hot destination matrix @ fetched rows (MXU)
        pos = s + jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _R), 0)
        onehot = ((pos >= starts[None, :]) & (pos < ends[None, :])
                  ).astype(jnp.float32)                     # [CHUNK, R]
        rows = xrows_ref[:].astype(jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            onehot, rows, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    acc = acc_ref[:]
    if mean:
        deg = (ends - starts).astype(jnp.float32)
        acc = acc / jnp.maximum(deg, 1.0)[:, None]
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("aggr", "interpret"))
def _spmm_padded(starts2d, ends2d, indices, x, *, aggr, interpret):
    Vp = starts2d.shape[0] * _R
    D = x.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(starts2d.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 1, _R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((_R, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_R, D), jnp.float32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.VMEM((_CHUNK, D), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((_INFLIGHT,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, mean=aggr == "mean", d=D),
        out_shape=jax.ShapeDtypeStruct((Vp, D), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts2d, ends2d, indices, x)


def spmm_csr(indptr, indices, x, aggr: str = "mean",
             interpret: bool = False):
    """Y[v] = aggr_{u in N(v)} x[u] over a CSR graph, one Pallas kernel.

    Args:
      indptr: [V+1] row pointers (any int dtype, host or device).
      indices: [E] CSR column ids.
      x: [V', D] feature rows (V' >= max(indices)); D should be a
        multiple of 128 for clean tiling.
      aggr: "mean" or "sum".
    Returns [V, D] aggregated features (same dtype as x).
    """
    if aggr not in ("mean", "sum"):
        raise ValueError(f"aggr must be 'mean' or 'sum', got {aggr!r}")
    # Pallas compiles for TPU only; the CPU backend runs the interpreter
    # (tests / virtual-mesh CI).
    interpret = interpret or jax.default_backend() == "cpu"
    indptr = np.asarray(indptr) if not isinstance(indptr, jax.Array) else indptr
    ip = jnp.asarray(indptr, jnp.int32)
    V = ip.shape[0] - 1
    Vp = -(-V // _R) * _R
    pad = Vp - V
    last = ip[-1]
    starts = jnp.concatenate([ip[:-1], jnp.full((pad,), last, jnp.int32)])
    ends = jnp.concatenate([ip[1:], jnp.full((pad,), last, jnp.int32)])
    # indices padded + reshaped to aligned [_CHUNK]-wide rows (HBM DMA
    # slices must be tile-aligned)
    idx = jnp.asarray(indices, jnp.int32)
    padE = (-idx.shape[0]) % _CHUNK
    idx = jnp.concatenate([idx, jnp.zeros((padE,), jnp.int32)]
                          ).reshape(-1, _CHUNK)
    out = _spmm_padded(starts.reshape(-1, 1, _R),
                       ends.reshape(-1, 1, _R),
                       idx, jnp.asarray(x), aggr=aggr, interpret=interpret)
    return out[:V]


# ---------------------------------------------------------------------------
# Fused full-graph GAT aggregation: SDDMM (attention logits) + edge
# softmax + weighted SpMM in ONE pass over the CSR, flash-attention
# style (online softmax over edge chunks). The source attention term
# a_src rides as an extra feature column, so each edge still costs one
# row fetch; per chunk the destination one-hot drives masked max /
# weighted accumulate on the MXU/VPU.


def gat_csr_reference(indptr, indices, xw, a_src, a_dst,
                      negative_slope=0.2):
    """XLA oracle: e = leakyrelu(a_src[src] + a_dst[dst]), per-dst
    softmax, weighted sum of xw[src]."""
    from .segment import segment_softmax, segment_sum

    V = indptr.shape[0] - 1
    E = indices.shape[0]
    dst = jnp.searchsorted(indptr.astype(jnp.int64),
                           jnp.arange(E, dtype=jnp.int64),
                           side="right").astype(jnp.int32) - 1
    e = jnp.take(a_src, indices) + jnp.take(a_dst, dst)
    e = jax.nn.leaky_relu(e, negative_slope)
    alpha = segment_softmax(e, dst, V)
    msgs = jnp.take(xw, indices, axis=0) * alpha[:, None]
    return segment_sum(msgs, dst, V)


def _gat_kernel(starts_ref, ends_ref, adst_ref, indices_ref, xa_ref,
                out_ref, acc_ref, m_ref, s_ref, idx_ref, xrows_ref,
                idx_sem, row_sems, *, d: int, slope: float):
    starts = starts_ref[0, 0]
    ends = ends_ref[0, 0]
    a_dst = adst_ref[0, 0]                     # [R] f32
    e0 = starts[0]
    e_end = ends[_R - 1]

    acc_ref[:] = jnp.zeros((_R, d), jnp.float32)
    m_ref[:] = jnp.full((_R, 1), -jnp.inf, jnp.float32)
    s_ref[:] = jnp.zeros((_R, 1), jnp.float32)

    c0 = e0 // _CHUNK
    n_chunks = pl.cdiv(e_end, _CHUNK) - c0

    def chunk_body(c, _):
        row = c0 + c
        s = row * _CHUNK
        cp = pltpu.make_async_copy(indices_ref.at[row], idx_ref, idx_sem)
        cp.start()
        cp.wait()

        def row_dma(j, slot):
            rid = idx_ref[j]
            return pltpu.make_async_copy(xa_ref.at[rid],
                                         xrows_ref.at[j], row_sems.at[slot])

        for j in range(_INFLIGHT):
            row_dma(j, j).start()
        for j in range(_CHUNK):
            row_dma(j, j % _INFLIGHT).wait()
            nxt = j + _INFLIGHT
            if nxt < _CHUNK:
                row_dma(nxt, nxt % _INFLIGHT).start()

        pos = s + jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _R), 0)
        onehot = (pos >= starts[None, :]) & (pos < ends[None, :])

        xa = xrows_ref[:].astype(jnp.float32)           # [CHUNK, d+pad]
        a_s = xa[:, d]                                  # lane a_src term
        logits = a_s[:, None] + a_dst[None, :]          # [CHUNK, R]
        logits = jnp.where(logits >= 0, logits, slope * logits)
        logits = jnp.where(onehot, logits, -jnp.inf)

        m_old = m_ref[:][:, 0]                          # [R]
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=0))
        # rescale previous accumulation (guard fully-empty rows)
        scale = jnp.where(jnp.isfinite(m_old),
                          jnp.exp(m_old - jnp.where(jnp.isfinite(m_new),
                                                    m_new, 0.0)), 0.0)
        w = jnp.where(onehot,
                      jnp.exp(logits - jnp.where(jnp.isfinite(m_new),
                                                 m_new, 0.0)[None, :]),
                      0.0)                               # [CHUNK, R]
        acc_ref[:] = acc_ref[:] * scale[:, None] + jax.lax.dot_general(
            w, xa[:, :d], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_ref[:] = s_ref[:] * scale[:, None] + jnp.sum(w, axis=0)[:, None]
        m_ref[:] = m_new[:, None]
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # epsilon must be a NORMAL float32: subnormals (e.g. 1e-38) flush to
    # zero on TPU/XLA-CPU, turning empty rows into 0/0 = NaN
    denom = jnp.maximum(s_ref[:], 1e-30)
    out_ref[:] = (acc_ref[:] / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("slope", "interpret"))
def _gat_padded(starts2d, ends2d, adst2d, indices, xa, *, slope,
                interpret):
    Vp = starts2d.shape[0] * _R
    Dp = xa.shape[1]
    d = Dp - _PAD_COLS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(starts2d.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 1, _R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((_R, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_R, d), jnp.float32),
            pltpu.VMEM((_R, 1), jnp.float32),
            pltpu.VMEM((_R, 1), jnp.float32),
            pltpu.SMEM((_CHUNK,), jnp.int32),
            pltpu.VMEM((_CHUNK, Dp), xa.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((_INFLIGHT,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gat_kernel, d=d, slope=slope),
        out_shape=jax.ShapeDtypeStruct((Vp, d), xa.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts2d, ends2d, adst2d, indices, xa)


_PAD_COLS = 1   # a_src rides in column d of the augmented feature rows


def gat_csr(indptr, indices, xw, a_src, a_dst, negative_slope: float = 0.2,
            interpret: bool = False):
    """Fused full-graph GAT aggregation over a CSR graph (one head):
    out[v] = sum_j softmax_j(leakyrelu(a_src[j] + a_dst[v])) * xw[j]
    for j in N(v). Rows with no neighbors return 0.

    One Pallas pass: per-edge row DMA of [xw | a_src] rows, online
    softmax per destination (flash-attention over ragged neighborhoods).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    ip = jnp.asarray(indptr, jnp.int32)
    V = ip.shape[0] - 1
    Vp = -(-V // _R) * _R
    pad = Vp - V
    last = ip[-1]
    starts = jnp.concatenate([ip[:-1], jnp.full((pad,), last, jnp.int32)])
    ends = jnp.concatenate([ip[1:], jnp.full((pad,), last, jnp.int32)])
    adst = jnp.concatenate([jnp.asarray(a_dst, jnp.float32),
                            jnp.zeros((pad,), jnp.float32)])
    idx = jnp.asarray(indices, jnp.int32)
    padE = (-idx.shape[0]) % _CHUNK
    idx = jnp.concatenate([idx, jnp.zeros((padE,), jnp.int32)]
                          ).reshape(-1, _CHUNK)
    xa = jnp.concatenate([jnp.asarray(xw),
                          jnp.asarray(a_src)[:, None].astype(xw.dtype)], 1)
    out = _gat_padded(starts.reshape(-1, 1, _R), ends.reshape(-1, 1, _R),
                      adst.reshape(-1, 1, _R), idx, xa,
                      slope=float(negative_slope), interpret=interpret)
    return out[:V]
