"""Fused Pallas kernel for block-exact sampling (the strict pipeline's
hot hop).

One kernel pass replaces three XLA stages of ``sample_adjacency_block``
(kernels.py): the [N, 128] block-row gather, the Floyd k-subset draw,
and the k masked lane-selects. Per grid step the kernel DMAs R block
rows HBM->VMEM (descriptor-bound, the same ~50M rows/s as XLA's
gather), then does the header split, the on-chip PRNG draw
(pltpu.prng_seed / prng_random_bits), Floyd positions, and the one-hot
lane selection — without materializing the [N, 128] row block or the
[N, k] position array in HBM. Big rows (deg > lanes-2) still get their
slots (start + position) so the caller's scattered-read fallback needs
no second metadata pass.

Outputs are TRANSPOSED ([k, N] instead of [N, k]) so the minor
dimension is the wide one (TPU tiles want a 128-multiple minor; k is
5-25), and the row count is padded to a sublane multiple.

This is the TPU counterpart of the reference's fused warp-per-row
sampler (``CSRRowWiseSampleKernel`` cuda_random.cu.hpp:8-69 invoked
from the fused ``sample_kernel`` quiver_sample.cu:134-200): one kernel
owns fetch + sample per row.

The XLA path (kernels.sample_adjacency_block) stays the default until
the fused kernel is explicitly enabled (NeighborSampler
``sampling="fused"`` or env QUIVER_TPU_FUSED_SAMPLER=1): manually-
indexed DMA is the one pattern that has wedged the remote-TPU
transport, so the conservative path ships as default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 128          # frontier rows per grid step (one DMA each)
# Max frontier rows per pallas_call: the scalar-prefetch fid operand is
# SMEM-resident (1 MB = 262144 int32); 0.75 MB leaves room for grid
# bookkeeping. Multiple of ROWS so every chunk blocks evenly.
_SMEM_ROWS = 196608


def _floyd_rows(rand01, deg, k):
    """Floyd k-subset positions, row-vector form: rand01 [k, R]
    uniforms, deg [1, R] -> list of k [1, R] position vectors (same
    draw as kernels._floyd_positions; the duplicate hit is replaced by
    the step's own max index, which no earlier step could have
    chosen)."""
    sel = []
    for step in range(k):
        hi = jnp.maximum(deg - k + step, 0)
        t = jnp.minimum((rand01[step:step + 1] *
                         (hi + 1).astype(rand01.dtype)).astype(jnp.int32),
                        hi)
        for prev in sel:
            t = jnp.where(prev == t, hi, t)
        sel.append(t)
    take_all = deg <= k
    return [jnp.where(take_all, jnp.full_like(s, j), s)
            for j, s in enumerate(sel)]


def _kernel(fid_ref, valid_ref, u_ref, blk_hbm, nbr_ref, mask_ref,
            slot_ref, hdr_ref, rows_vmem, sems, *, k, W, R, KP):
    step = pl.program_id(0)
    base = step * R

    def dma(g):
        return pltpu.make_async_copy(blk_hbm.at[fid_ref[base + g]],
                                     rows_vmem.at[g], sems.at[g])

    for g in range(R):
        dma(g).start()
    for g in range(R):
        dma(g).wait()

    rows = rows_vmem[...]                      # [R, W]
    start = rows[:, 0].reshape(1, R)
    valid = valid_ref[...] != 0                # [1, R]
    deg = jnp.where(valid, rows[:, 1].reshape(1, R), 0)

    rand01 = u_ref[:k, :]                      # [k, R] uniforms (input —
    # portable across interpret/compiled; in-kernel prng_seed lowers
    # only on real TPU)
    pos = _floyd_rows(rand01, deg, k)          # k x [1, R]

    body = rows[:, 2:]                         # [R, W-2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, W - 2), 1)
    cnt = jnp.minimum(deg, k)
    is_small = deg <= (W - 2)
    hdr_ref[0, :] = start.reshape(R)
    hdr_ref[1, :] = deg.reshape(R)
    for j in range(KP):
        if j >= k:                              # sublane padding rows
            nbr_ref[j, :] = jnp.zeros((R,), jnp.int32)
            mask_ref[j, :] = jnp.zeros((R,), jnp.int32)
            slot_ref[j, :] = jnp.zeros((R,), jnp.int32)
            continue
        pj = pos[j]                            # [1, R]
        m = iota == pj.reshape(R, 1)
        nbr_ref[j, :] = jnp.sum(jnp.where(m, body, 0), axis=1)
        lane_ok = (j < cnt) & valid
        mask_ref[j, :] = (lane_ok & is_small).reshape(R).astype(jnp.int32)
        # slots stay defined on BIG rows too (the caller's scattered
        # fallback reads them; no second position draw needed)
        slot_ref[j, :] = jnp.where(lane_ok, start + pj, 0).reshape(R)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def sample_block_fused(blk, frontier, frontier_valid, key, k: int,
                       interpret: bool = False):
    """Fused fetch+draw+select over the block layout.

    Args:
      blk: [V, W] int32 block table (HBM resident).
      frontier: [N] int32 node ids (garbage where invalid).
      frontier_valid: [N] bool.
      key: PRNG key for this call.
      k: static fanout (k <= W - 2).

    Returns:
      nbr  [N, k] int32 — sampled neighbors (garbage on big rows),
      mask [N, k] bool  — valid small-row lanes only,
      slot [N, k] int32 — CSR slot per lane, DEFINED ON BIG ROWS TOO,
      start [N] int32, deg [N] int32 — the header, so the caller's
      big-row fallback needs no extra gather.
    """
    V, W = blk.shape
    N = frontier.shape[0]
    R = min(ROWS, max(N, 8))
    Np = -(-N // R) * R
    KP = -(-k // 8) * 8
    fid = jnp.zeros((Np,), jnp.int32).at[:N].set(
        jnp.clip(frontier.astype(jnp.int32), 0, V - 1))
    vld = jnp.zeros((Np,), jnp.int32).at[:N].set(
        frontier_valid.astype(jnp.int32))
    u = jax.random.uniform(key, (KP, Np), jnp.float32)

    def call(fid_c, vld_c, u_c):
        n_c = fid_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_c // R,),
            in_specs=[pl.BlockSpec((1, R), lambda i, fid: (0, i)),
                      pl.BlockSpec((KP, R), lambda i, fid: (0, i)),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=[pl.BlockSpec((KP, R), lambda i, fid: (0, i)),
                       pl.BlockSpec((KP, R), lambda i, fid: (0, i)),
                       pl.BlockSpec((KP, R), lambda i, fid: (0, i)),
                       pl.BlockSpec((8, R), lambda i, fid: (0, i))],
            scratch_shapes=[pltpu.VMEM((R, W), jnp.int32),
                            pltpu.SemaphoreType.DMA((R,))],
        )
        return pl.pallas_call(
            functools.partial(_kernel, k=k, W=W, R=R, KP=KP),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((KP, n_c), jnp.int32),
                       jax.ShapeDtypeStruct((KP, n_c), jnp.int32),
                       jax.ShapeDtypeStruct((KP, n_c), jnp.int32),
                       jax.ShapeDtypeStruct((8, n_c), jnp.int32)],
            interpret=interpret,
        )(fid_c, vld_c.reshape(1, n_c), u_c, blk)

    # The scalar-prefetch fid operand lives in SMEM (1 MB): one call
    # handles <= _SMEM_ROWS frontier rows; bigger frontiers (batch-4096
    # strict pipelines reach ~400k at hop 3) run the SAME kernel over
    # static chunks — caught on hardware by bench_strict_pieces
    # (interpret mode has no SMEM limit).
    if Np <= _SMEM_ROWS:
        nbr_t, mask_t, slot_t, hdr = call(fid, vld, u)
    else:
        parts = [call(fid[a:a + _SMEM_ROWS],
                      vld[a:a + _SMEM_ROWS],
                      u[:, a:a + _SMEM_ROWS])
                 for a in range(0, Np, _SMEM_ROWS)]
        nbr_t, mask_t, slot_t, hdr = (
            jnp.concatenate(cols, axis=1) for cols in zip(*parts))

    nbr = nbr_t[:k].T[:N]
    mask = mask_t[:k].T[:N] > 0
    slot = slot_t[:k].T[:N]
    return nbr, mask, slot, hdr[0, :N], hdr[1, :N]


def _on_tpu() -> bool:
    d = jax.devices()[0]
    return ("tpu" in d.platform.lower()
            or "TPU" in str(getattr(d, "device_kind", "")))


def sample_adjacency_block_fused(blk, indices, frontier, frontier_valid,
                                 k: int, key, big_cap: int,
                                 interpret: bool = None):
    """Drop-in replacement for kernels.sample_adjacency_block built on
    the fused kernel: small rows come straight out of the kernel; big
    rows are compacted and served by scattered flat reads using the
    kernel's own slots (one sort + one element-gather batch, no extra
    metadata pass)."""
    N = frontier.shape[0]
    W = blk.shape[1]
    if W % 128:
        # Mosaic requires 128-aligned VMEM slices of the block row; a
        # 64/32-lane table (NeighborSampler's byte-budget fallback,
        # sampler._pick_block_lanes) compiles in interpret mode but
        # fails on hardware — caught by tools/tpu_correctness.py. Same
        # distribution and contract via the staged block-exact kernel.
        from .kernels import sample_adjacency_block
        return sample_adjacency_block(blk, indices, frontier,
                                      frontier_valid, k, key, big_cap)
    if interpret is None:
        interpret = not _on_tpu()   # Mosaic compiles on real TPU only
    nbr, mask, slot, start, deg = sample_block_fused(
        blk, frontier, frontier_valid, key, k=k, interpret=interpret)

    deg = jnp.where(frontier_valid, deg, 0)
    is_big = (deg > (W - 2)) & frontier_valid
    pos_i = jnp.arange(N, dtype=jnp.int32)
    bigkey = jnp.where(is_big, pos_i, jnp.int32(N))
    bigidx = jax.lax.sort([bigkey], num_keys=1)[0][:big_cap]
    slot_big = jnp.take(slot, jnp.minimum(bigidx, N - 1), axis=0)
    E = indices.shape[0]
    nbr_big = jnp.take(indices, jnp.clip(slot_big, 0, E - 1),
                       mode="clip").astype(jnp.int32)
    nbr = nbr.at[bigidx].set(nbr_big, mode="drop")

    served = jnp.zeros((N,), jnp.bool_).at[bigidx].set(True, mode="drop")
    ar = jnp.arange(k, dtype=jnp.int32)
    big_mask = (ar[None, :] < jnp.minimum(deg, k)[:, None]) & \
        (is_big & served)[:, None]
    mask = mask | big_mask
    return nbr, mask, jnp.where(mask, slot, 0)
