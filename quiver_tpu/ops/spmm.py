"""Full-graph neighbor aggregation (the SpMM/SDDMM analogue) on TPU.

TPU-native replacement for the scatter-based SpMM under the reference's
PyG model compute. Two implementations:

1. **Degree-bucketed padded gather (default, ``spmm_csr``/``gat_csr``)**
   — the measured winner. Nodes are grouped by degree into fanout
   buckets (ladder 1,2,3,4,6,8,... so padding <= 1.5x); each bucket's
   neighbor ids form a LANE-MAJOR ``[k_b, n_b]`` index block, so the
   whole aggregation is: one XLA row-gather (measured 253M rows/s on a
   v5e, bandwidth-class) + per-bucket masked reductions over the leading
   axis (contiguous [n_b, D] slices, streams at HBM bandwidth) + one
   [V]-row inverse-permutation gather. No scatter, no per-edge DMA
   descriptors, no Pallas. GAT runs ALL heads in one pass (one gather of
   ``[xw | a_src]``, per-bucket masked softmax over the lane axis).

2. **Per-edge-DMA Pallas kernel (``spmm_csr_dma``/``gat_csr_dma``)** —
   kept as the explicit-DMA reference implementation with a measured
   do-not-use verdict: one feature-row DMA per edge is descriptor-issue
   bound at ~32M edges/s (93 ms for a 3M-edge graph on a v5e), while the
   bucketed-gather path runs the same graph in ~15 ms because XLA's
   dynamic-gather machinery sustains ~250M rows/s where a scalar-core
   DMA loop caps out near 40M/s. The same lesson as ops/gather.py.

Why not the CUDA shape: the reference's model compute is PyG
scatter_add over edge lists (and its gather kernel is warp-per-row,
shard_tensor.cu.hpp:19-61); TPU has no global atomics and scatter-adds
serialize, so the idiomatic design turns the scatter into a
degree-bucketed dense layout where every reduction is a streaming
masked sum.

Forward-only (full-graph inference); training uses the sampled
lane-major dense blocks which need no SpMM at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spmm_csr", "spmm_csr_reference", "CSRBlock", "full_graph_csr",
           "gat_csr", "gat_csr_reference", "BucketPlan", "build_bucket_plan",
           "spmm_csr_dma", "gat_csr_dma"]


# ---------------------------------------------------------------------------
# Degree-bucketed plan


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("pidx", "deg", "pos", "order"),
                   meta_fields=("shapes", "num_nodes"))
class BucketPlan:
    """Precomputed degree-bucket layout for full-graph aggregation.

    ``pidx[b]``: [k_b, n_b] int32 neighbor ids, lane-major (lane j of
    all bucket nodes contiguous); padding lanes point at row 0 and are
    masked by ``j < deg``. ``order``: [V] node ids in bucket-sorted
    order; ``pos``: its inverse (node -> sorted position). ``shapes``:
    static ((n_b, k_b), ...).
    """

    def __init__(self, pidx, deg, pos, order, shapes, num_nodes):
        self.pidx = tuple(pidx)
        self.deg = tuple(deg)
        self.pos = pos
        self.order = order
        self.shapes = tuple(tuple(s) for s in shapes)
        self.num_nodes = int(num_nodes)


def _fanout_ladder(max_deg: int):
    """1, 2, 3, 4, 6, 8, 12, 16, ... (x1.5 steps => padding <= 1.5x)."""
    ks, k = [0, 1, 2, 3], 4
    while k < max_deg:
        ks.append(k)
        ks.append(k + k // 2)
        k *= 2
    ks.append(max(int(max_deg), k))
    return sorted(set(ks))


def build_bucket_plan(indptr, indices) -> BucketPlan:
    """Host-side (numpy) plan construction — once per graph."""
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int32)
    V = indptr.shape[0] - 1
    E = indices.shape[0]
    deg = np.diff(indptr)
    ladder = np.asarray(_fanout_ladder(int(deg.max()) if V else 1), np.int64)
    bucket_of = np.searchsorted(ladder, deg, side="left")
    order = np.argsort(bucket_of, kind="stable").astype(np.int32)
    pos = np.zeros(V, np.int32)
    pos[order] = np.arange(V, dtype=np.int32)

    pidx, degs, shapes = [], [], []
    sorted_buckets = bucket_of[order]
    boundaries = np.searchsorted(sorted_buckets,
                                 np.arange(ladder.shape[0] + 1))
    for b in range(ladder.shape[0]):
        lo, hi = boundaries[b], boundaries[b + 1]
        if hi == lo:
            continue
        nodes = order[lo:hi]
        n_b, k_b = int(hi - lo), int(ladder[b])
        shapes.append((n_b, k_b))
        degs.append(jnp.asarray(deg[nodes], jnp.int32))
        if k_b == 0:
            pidx.append(jnp.zeros((0, n_b), jnp.int32))
            continue
        starts = indptr[nodes]                       # [n_b]
        lane = np.arange(k_b, dtype=np.int64)[:, None]
        slot = np.minimum(starts[None, :] + lane, max(E - 1, 0))
        valid = lane < deg[nodes][None, :]
        ids = np.where(valid, indices[slot] if E else 0, 0).astype(np.int32)
        pidx.append(jnp.asarray(ids))
    return BucketPlan(pidx, degs, jnp.asarray(pos), jnp.asarray(order),
                      shapes, V)


@functools.partial(jax.jit, static_argnames=("aggr",))
def _spmm_bucketed(plan: BucketPlan, x, *, aggr: str):
    D = x.shape[1]
    outs = []
    for (n_b, k_b), idx, deg in zip(plan.shapes, plan.pidx, plan.deg):
        if k_b == 0:
            outs.append(jnp.zeros((n_b, D), x.dtype))
            continue
        lanes = jnp.take(x, idx, axis=0, mode="clip")      # [k_b, n_b, D]
        m = (jax.lax.broadcasted_iota(jnp.int32, (k_b, n_b), 0)
             < deg[None, :])[..., None]
        if aggr == "max":
            agg = jnp.where(m, lanes.astype(jnp.float32), -jnp.inf).max(0)
            agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
        else:
            agg = jnp.where(m, lanes, 0).astype(jnp.float32).sum(0)
            if aggr == "mean":
                agg = agg / jnp.maximum(deg[:, None], 1).astype(jnp.float32)
        outs.append(agg.astype(x.dtype))
    out_sorted = jnp.concatenate(outs, axis=0)
    return jnp.take(out_sorted, plan.pos, axis=0)


_PLAN_KEEPALIVE = {}
_WARNED_TRACER = set()


def _warn_tracer_fallback(name: str) -> None:
    if name not in _WARNED_TRACER:
        _WARNED_TRACER.add(name)
        import warnings
        warnings.warn(
            f"{name}: indptr/indices are jit tracers and no plan was "
            "given — running the XLA gather+segment reference path. For "
            "the fused bucketed engine pass plan=build_bucket_plan(...) "
            "(or use full_graph_csr, whose CSRBlock carries one).",
            stacklevel=3)


def _cached_plan(indptr, indices) -> "BucketPlan":
    """Memoized plan for eager (non-tracer) callers — plan construction
    is a device->host sync plus O(E) numpy work, a large silent per-call
    cost otherwise. Keyed on the identity of BOTH CSR buffers (keying on
    indices alone would serve a stale plan to a graph that re-chunks
    indptr over the same indices object); a caller that mutates the
    buffers in place must pass an explicit plan."""
    key = (id(indptr), id(indices))
    hit = _PLAN_KEEPALIVE.get(key)
    if hit is not None and hit[0] is indptr and hit[1] is indices:
        return hit[2]
    plan = build_bucket_plan(np.asarray(indptr), np.asarray(indices))
    if len(_PLAN_KEEPALIVE) > 8:          # bound the keepalive set
        _PLAN_KEEPALIVE.clear()
    _PLAN_KEEPALIVE[key] = (indptr, indices, plan)
    return plan


def spmm_csr(indptr, indices, x, aggr: str = "mean", plan=None,
             interpret: bool = False):
    """Y[v] = aggr_{u in N(v)} x[u] over a CSR graph.

    Default engine: degree-bucketed padded gather (see module
    docstring). Pass ``plan`` (from :func:`build_bucket_plan` /
    :func:`full_graph_csr`) to reuse the precomputed layout; without it
    the plan is built from host copies of indptr/indices, or — when the
    arrays are jit tracers — the call falls back to the XLA
    gather+segment path.

    Args:
      indptr: [V+1] row pointers. indices: [E] CSR column ids.
      x: [V', D] feature rows. aggr: "mean" | "sum" | "max".
    Returns [V, D] aggregated features (same dtype as x).
    """
    del interpret  # kept for API compat with the _dma variant
    if aggr not in ("mean", "sum", "max"):
        raise ValueError(f"aggr must be mean/sum/max, got {aggr!r}")
    if plan is None:
        if isinstance(indptr, jax.core.Tracer) or isinstance(
                indices, jax.core.Tracer):
            # Under jit without a plan the fused bucketed engine is
            # unavailable (plan construction is host-side); fall back to
            # the XLA gather+segment path and tell the caller once.
            _warn_tracer_fallback("spmm_csr")
            return spmm_csr_reference(indptr, indices, x, aggr=aggr)
        plan = _cached_plan(indptr, indices)
    return _spmm_bucketed(plan, jnp.asarray(x), aggr=aggr)


def spmm_csr_reference(indptr, indices, x, aggr="mean"):
    """XLA oracle: gather messages then segment-reduce (the before path)."""
    from .segment import segment_sum, segment_mean, segment_max

    V = indptr.shape[0] - 1
    E = indices.shape[0]
    rows = jnp.searchsorted(indptr.astype(jnp.int64),
                            jnp.arange(E, dtype=jnp.int64), side="right") - 1
    msgs = jnp.take(x, indices, axis=0)
    if aggr == "mean":
        return segment_mean(msgs, rows.astype(jnp.int32), V)
    if aggr == "max":
        out = segment_max(msgs, rows.astype(jnp.int32), V)
        return jnp.where(jnp.isfinite(out), out, 0)
    return segment_sum(msgs, rows.astype(jnp.int32), V)


# ---------------------------------------------------------------------------
# Fused multi-head GAT over the bucketed layout: ONE gather of
# [xw | a_src] serves every head; logits, masked softmax over the lane
# axis, and the weighted sum are per-bucket streaming XLA ops.


@functools.partial(jax.jit, static_argnames=("slope", "from_att"))
def _gat_bucketed(plan: BucketPlan, xw, a_src, a_dst, *, slope: float,
                  from_att: bool = False):
    V, H, C = xw.shape
    # from_att: ``a_src`` is the attention vector [H, C] and per-lane
    # source logits are recomputed from the gathered value rows (a few
    # VPU FLOPs per edge) — the value gather stays a 128-lane-aligned
    # [V, HC] payload and a_src costs ZERO extra HBM traffic. The
    # alternatives both measured slower on chip: a second [E]-row
    # gather of a_src (r3, 58.6 ms — row gathers are descriptor-bound)
    # and riding a_src as H extra payload columns (72.3 ms — the
    # [V, HC+H] rows break 128-lane alignment and pad to 2x traffic).
    xw_flat = xw.reshape(V, H * C)
    ad_sorted = jnp.take(a_dst, plan.order, axis=0)        # [V, H]
    outs, off = [], 0
    for (n_b, k_b), idx, deg in zip(plan.shapes, plan.pidx, plan.deg):
        ad_b = jax.lax.dynamic_slice_in_dim(ad_sorted, off, n_b, 0)
        off += n_b
        if k_b == 0:
            outs.append(jnp.zeros((n_b, H * C), xw.dtype))
            continue
        lx = jnp.take(xw_flat, idx, axis=0, mode="clip")   # [k_b, n_b, HC]
        if from_att:
            las = (lx.reshape(k_b, n_b, H, C).astype(jnp.float32)
                   * a_src[None, None].astype(jnp.float32)).sum(-1)
        else:
            las = jnp.take(a_src, idx, axis=0, mode="clip")
        # Everything between the gather and the concat stays in FLAT
        # lane-packed layouts: the softmax chain on [k_b, n_b*H] (free
        # reshape — H is the minor axis of the (n, h) flattening) and
        # the weighted reduce on [k_b, n_b, H*C]. The [k_b, n_b, H] /
        # [n_b, H, C] shapes pad their (4, 32) minor tile to (8, 128) =
        # 8-32x traffic per materialized temp; flat measured 61 -> 56 ms
        # on the 2.9M-edge probe graph (gather floor 22.8 ms).
        m = (jax.lax.broadcasted_iota(jnp.int32, (k_b, n_b), 0)
             < deg[None, :])                               # [k_b, n_b]
        mf = jnp.repeat(m, H, axis=1)                      # [k_b, n_b*H]
        e = (las.reshape(k_b, n_b * H)
             + ad_b.reshape(1, n_b * H)).astype(jnp.float32)
        e = jnp.where(e >= 0, e, slope * e)
        e = jnp.where(mf, e, -jnp.inf)
        e = e - jnp.max(e, axis=0, keepdims=True)          # stable
        w = jnp.where(mf, jnp.exp(e), 0.0)
        denom = jnp.maximum(w.sum(0), 1e-30)               # [n_b*H]
        alpha = (w / denom[None]).astype(xw.dtype)
        alpha_f = jnp.repeat(alpha.reshape(k_b, n_b, H), C,
                             axis=2).reshape(k_b, n_b, H * C)
        outs.append((lx * alpha_f).sum(0))                 # [n_b, HC]
    out_sorted = jnp.concatenate(outs, axis=0)
    out = jnp.take(out_sorted, plan.pos, axis=0)           # [V, HC]
    return out.reshape(V, H, C)


def gat_csr(indptr, indices, xw, a_src, a_dst, negative_slope: float = 0.2,
            plan=None, interpret: bool = False, att_src=None):
    """Fused full-graph GAT aggregation over a CSR graph, ALL heads in
    one pass: out[v,h] = sum_j softmax_j(leakyrelu(a_src[j,h] +
    a_dst[v,h])) * xw[j,h] for j in N(v). Rows with no neighbors
    return 0.

    Accepts single-head 2-D inputs (xw [V, C], a_* [V]) or multi-head
    3-D (xw [V, H, C], a_* [V, H]); returns the matching rank.

    ``att_src``: the attention vector ([H, C], or [C] single-head) when
    the caller computes ``a_src = (xw * att_src).sum(-1)`` (every GAT
    layer does) — source logits are then recomputed from the gathered
    value rows instead of read from HBM, the fast path. ``a_src`` is
    ignored on the bucketed path when given (pass None); the tracer
    fallback still needs it.
    """
    del interpret
    xw = jnp.asarray(xw)
    a_dst = jnp.asarray(a_dst)
    single = xw.ndim == 2
    if single:
        xw, a_dst = xw[:, None, :], a_dst[:, None]
        if a_src is not None:
            a_src = jnp.asarray(a_src)[:, None]
        if att_src is not None:
            att_src = jnp.asarray(att_src)[None, :]
    elif a_src is not None:
        a_src = jnp.asarray(a_src)
    if plan is None:
        if isinstance(indptr, jax.core.Tracer) or isinstance(
                indices, jax.core.Tracer):
            # Per-head XLA reference loop (no fused bucketed path under
            # jit without a plan) — warn once so jitted full-graph
            # callers know to pass one (CSRBlock.plan). The only branch
            # that needs per-node a_src — compute it here, not eagerly
            # (the bucketed from_att path never reads it; an up-front
            # (xw * att).sum over all V rows would be wasted work).
            _warn_tracer_fallback("gat_csr")
            if a_src is None:
                a_src = (xw * jnp.asarray(att_src)[None]).sum(-1)
            outs = [gat_csr_reference(indptr, indices, xw[:, h],
                                      a_src[:, h], a_dst[:, h],
                                      negative_slope)
                    for h in range(xw.shape[1])]
            out = jnp.stack(outs, axis=1)
            return out[:, 0] if single else out
        plan = _cached_plan(indptr, indices)
    if att_src is not None:
        out = _gat_bucketed(plan, xw, jnp.asarray(att_src), a_dst,
                            slope=float(negative_slope), from_att=True)
    else:
        if a_src is None:
            raise ValueError("gat_csr needs a_src or att_src")
        out = _gat_bucketed(plan, xw, a_src, a_dst,
                            slope=float(negative_slope))
    return out[:, 0] if single else out


def gat_csr_reference(indptr, indices, xw, a_src, a_dst,
                      negative_slope=0.2):
    """XLA oracle (one head): e = leakyrelu(a_src[src] + a_dst[dst]),
    per-dst softmax, weighted sum of xw[src]."""
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


# ---------------------------------------------------------------------------
# Graph container for the full-graph inference path


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("indptr", "indices", "plan"),
                   meta_fields=("size",))
class CSRBlock:
    """A whole CSR graph as an aggregation block: layers aggregate over
    it with the bucketed-gather SpMM instead of an E-wide edge list (the
    full-graph inference fast path). ``size`` = (src_count, dst_count);
    ``plan`` carries the precomputed degree-bucket layout (None -> built
    on first use from host copies).
    """

    def __init__(self, indptr, indices, size, plan=None):
        self.indptr = indptr
        self.indices = indices
        self.size = tuple(size)
        self.plan = plan


def full_graph_csr(indptr, indices) -> CSRBlock:
    """Whole-graph block for full-graph inference through the bucketed
    SpMM (counterpart of models.nets.full_graph_adj, which materializes
    the E-wide edge list for the XLA segment path). Precomputes the
    degree-bucket plan on the host."""
    V = int(np.asarray(indptr).shape[0]) - 1
    plan = build_bucket_plan(indptr, indices)
    return CSRBlock(jnp.asarray(np.asarray(indptr), jnp.int32),
                    jnp.asarray(np.asarray(indices), jnp.int32),
                    (V, V), plan=plan)


# ---------------------------------------------------------------------------
# Per-edge-DMA Pallas kernels — kept as the explicit-DMA reference
# implementation with a measured do-not-use verdict (see module
# docstring): descriptor-issue-bound at ~32M edges/s on a v5e vs ~200M+
# through the bucketed gather. Exercised by tests/benchmarks only.

_R = 128          # dst rows per grid step
_CHUNK = 128      # edges fetched/accumulated per inner iteration
_INFLIGHT = 16    # concurrent feature-row DMAs


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


def spmm_csr_dma(indptr, indices, x, aggr: str = "mean",
                 interpret: bool = False):
    """Per-edge-DMA Pallas SpMM (reference implementation; measured
    verdict: use ``spmm_csr``). One kernel walks the CSR row blocks,
    DMAs each needed feature row HBM->VMEM and accumulates with an MXU
    one-hot matmul — no [E, D] intermediate, but one DMA descriptor per
    edge caps it near ~32M edges/s on a v5e."""
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


def gat_csr_dma(indptr, indices, xw, a_src, a_dst,
                negative_slope: float = 0.2, interpret: bool = False):
    """Per-edge-DMA fused GAT kernel (one head; reference implementation
    — measured verdict: use ``gat_csr``): SDDMM + online edge softmax +
    weighted SpMM in one pass, flash-attention style; a_src rides as an
    extra feature column so each edge costs one row fetch."""
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
