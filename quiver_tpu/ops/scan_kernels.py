"""Fused sequential-grid Pallas scan for the sort-based dedup postprocess.

After the id sort in ``ops.unique.union_reindex_sorted_edges`` the
remaining work is three T-length scans (forward-fill of each run head's
base-local id, and a cumsum of new-run heads) plus the elementwise
local-id / edge-mask / extraction-key glue. In XLA those are separate
multi-pass scan ops plus fused loops (~5-7 ms at T=786k on a v5e); here
they are ONE linear Pallas pass emitting src/emask/newkey/n_new
directly: the grid walks the array in 32k-element blocks sequentially
(TPU grid steps execute in order on the core), block-internal scans are
Hillis-Steele log-step rolls on the VPU, and the running state (head
seen, last head value, new-head count, previous element) crosses blocks
through four SMEM scalars.

This is the TPU-native replacement for the part of the reference's
hash-table reindex (reindex.cu.hpp:211, quiver_sample.cu:202-255) that
assigns first-occurrence local ids — atomics on GPU, a sorted linear
scan here.

No data-dependent DMA: inputs stream through the automatic BlockSpec
pipeline, so the kernel is safe for the remote-TPU transport (the
wedge-prone pattern is manually-indexed DMA, not this).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 256                      # 32768-element block


def _shift_right(x, t, axis, fill):
    """x shifted right by t along axis (non-circular; `fill` shifts in)."""
    r = pltpu.roll(x, t, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx >= t, r, fill)


def _ff_combine(has, val, h2, v2):
    """Forward-fill combine: keep own value where a head was seen, else
    take the accumulated value from the left. ``has`` is int32 0/1
    (TPU vector rotates only support 32-bit lanes)."""
    return jnp.maximum(has, h2), jnp.where(has > 0, val, v2)


def _dedup_scan_kernel(bc_ref, s_ref, order_ref, src_ref, em_ref, nk_ref,
                       nnew_ref, carry, *, B, capacity, sentinel, rows):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        carry[0] = 0          # head seen in any earlier block
        carry[1] = B          # last head's value (B = "not in base")
        carry[2] = 0          # new-head count so far
        carry[3] = -1         # previous element's id

    s = s_ref[...]
    order = order_ref[...]
    c_has, c_val, c_sum, c_prev = carry[0], carry[1], carry[2], carry[3]

    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)

    # previous element in flattened row-major order
    p_lane = pltpu.roll(s, 1, axis=1)             # [r, 127] at lane 0
    p_row = pltpu.roll(p_lane, 1, axis=0)         # [r-1, 127] at lane 0
    prev = jnp.where(lane > 0, p_lane, p_row)
    prev = jnp.where((lane == 0) & (row == 0), c_prev, prev)

    is_head = (s != prev) & (s != sentinel)
    val = jnp.where(order < B, order, B)

    # -- forward-fill of (is_head, val), block-internal
    has = is_head.astype(jnp.int32)
    v = jnp.where(is_head, val, 0)
    t = 1
    while t < LANES:
        has, v = _ff_combine(has, v, _shift_right(has, t, 1, 0),
                             _shift_right(v, t, 1, 0))
        t *= 2
    row_has = has[:, LANES - 1:LANES]              # [rows, 1]
    row_v = v[:, LANES - 1:LANES]
    t = 1
    while t < rows:
        row_has, row_v = _ff_combine(
            row_has, row_v, _shift_right(row_has, t, 0, 0),
            _shift_right(row_v, t, 0, 0))
        t *= 2
    # exclusive over rows, block carry prepended
    ex_has = _shift_right(row_has, 1, 0, 0)
    ex_v = _shift_right(row_v, 1, 0, 0)
    ex_has, ex_v = _ff_combine(ex_has, ex_v,
                               jnp.minimum(c_has, 1), c_val)
    has, v = _ff_combine(has, v, ex_has, ex_v)
    hv = jnp.where(has > 0, v, B)

    # -- inclusive cumsum of new heads (+ global carry)
    new_head = is_head & (order >= B)
    nh = new_head.astype(jnp.int32)
    t = 1
    while t < LANES:
        nh = nh + _shift_right(nh, t, 1, 0)
        t *= 2
    row_sum = nh[:, LANES - 1:LANES]
    t = 1
    while t < rows:
        row_sum = row_sum + _shift_right(row_sum, t, 0, 0)
        t *= 2
    nh = nh + _shift_right(row_sum, 1, 0, 0) + c_sum

    # -- postprocess, fused (saves separate XLA passes over T):
    # local id per element, edge mask, src, extraction key
    bc = bc_ref[0]
    local = jnp.where(hv < B, hv, bc + nh - 1)
    valid = s != sentinel
    in_cap = local < capacity
    is_cand = valid & (order >= B)
    emask = is_cand & in_cap
    src_ref[...] = jnp.where(emask, local, 0)
    em_ref[...] = emask.astype(jnp.int32)
    nk_ref[...] = jnp.where(new_head & in_cap, s, sentinel)

    last_has = has[rows - 1, LANES - 1]
    carry[0] = jnp.maximum(c_has, last_has)
    carry[1] = jnp.where(last_has > 0, v[rows - 1, LANES - 1], c_val)
    carry[2] = nh[rows - 1, LANES - 1]
    carry[3] = s[rows - 1, LANES - 1]
    nnew_ref[0] = carry[2]


def _use_compiled() -> bool:
    d = jax.devices()[0]
    return ("tpu" in d.platform.lower()
            or "TPU" in str(getattr(d, "device_kind", "")))


@functools.partial(jax.jit, static_argnames=("B", "capacity"))
def fused_dedup_postprocess(s, order, bc, *, B: int, capacity: int):
    """One linear pass over the sorted id array: run-head forward-fill,
    new-head counting, local-id assignment and edge masking.

    Args:
      s: [T] int32 ids sorted ascending (SENTINEL-padded tail).
      order: [T] int32 original position of each sorted element
        (< B = base/frontier slot, >= B = candidate lane B + lane).
      bc: dynamic int32 scalar — valid base count (base local ids are
        0..bc-1; new ids get bc, bc+1, ... in ascending-id order).
      B: static base slot count.
      capacity: static output-table capacity (overflow edges masked).

    Returns:
      src: [T] int32 local id per edge slot (0 where masked).
      emask: [T] bool — element is a valid candidate edge within
        capacity.
      newkey: [T] int32 — the element's id at new-run heads within
        capacity, SENTINEL elsewhere (sort once to compact the new
        unique ids, ascending).
      n_new: scalar int32 — total number of new unique ids.
    """
    from .unique import SENTINEL

    T = s.shape[0]
    blk = ROWS * LANES
    grid = max(1, -(-T // blk))
    Tp = grid * blk
    if Tp != T:
        s = jnp.concatenate(
            [s, jnp.full((Tp - T,), SENTINEL, jnp.int32)])
        order = jnp.concatenate(
            [order, jnp.full((Tp - T,), jnp.int32(B))])
    s2 = s.reshape(grid * ROWS, LANES)
    o2 = order.reshape(grid * ROWS, LANES)

    kernel = functools.partial(_dedup_scan_kernel, B=np.int32(B),
                               capacity=np.int32(capacity),
                               sentinel=np.int32(SENTINEL), rows=ROWS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i, bc: (i, 0)),
                  pl.BlockSpec((ROWS, LANES), lambda i, bc: (i, 0))],
        out_specs=[pl.BlockSpec((ROWS, LANES), lambda i, bc: (i, 0)),
                   pl.BlockSpec((ROWS, LANES), lambda i, bc: (i, 0)),
                   pl.BlockSpec((ROWS, LANES), lambda i, bc: (i, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
    )
    src, em, nk, nnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((grid * ROWS, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((grid * ROWS, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((grid * ROWS, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        interpret=not _use_compiled(),
    )(jnp.reshape(bc.astype(jnp.int32), (1,)), s2, o2)
    return (src.reshape(-1)[:T], em.reshape(-1)[:T] > 0,
            nk.reshape(-1)[:T], nnew[0])
