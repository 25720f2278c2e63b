"""Flash-GAT over lane-major sampled blocks (single-pass SDDMM+softmax+SpMM).

The dense sampled-block GAT path previously computed per-lane logits and
the attention softmax through XLA's strided k-slice lowering, measured
at ~75 GB/s on a v5e (9% of the 819 GB/s HBM roofline). This module is
the speed-of-light replacement: ONE streaming pass over the lane-major
DenseBlock (sampling/sampler.py: lane slot j of all F dst rows is the
contiguous slice ``x[F + j*F : F + (j+1)*F]``) that fuses

  - SDDMM: per-lane logits ``a_src . (W x_j)`` computed in VMEM from the
    lane block that is being streamed anyway (plus ``a_dst . (W x_i)``
    from the dst block, stream k),
  - the masked ONLINE softmax over the fanout axis (flash-attention
    style running max / denominator, so no second pass), and
  - the weighted accumulate,

for ALL heads in one kernel. Per-head scalars ([tile, H]) are expanded
to the full [tile, H*C] row width by a matmul with a constant 0/1
block-identity expansion matrix E (E[h*C+c, h] = 1) — an MXU broadcast
that avoids sub-128-lane slices entirely, so any H/C with H*C % 128 == 0
rides the fused path (e.g. the PyG-default 4 heads x 64).

A matching backward kernel (recomputes alpha from the saved running
max/denominator — the flash recomputation trick) makes the op a custom
VJP, so GAT *training* streams at HBM bandwidth too: it re-reads the
k+1 input streams, writes the k+1 gradient streams, and accumulates the
attention-parameter grads in VMEM across grid steps.

Reference parity: the reference's GATConv runs through PyG's fused CUDA
scatter-softmax kernels (used by benchmarks/ogbn-mag240m/
train_quiver_multi_node.py); on TPU the positional lane-major layout
replaces scatter with aligned streaming DMA (same design as
ops/lane_kernels.py, which covers the SAGE/GCN aggregations).

Alignment rules (same as lane_kernels): F % 8 == 0 for the HBM row
offsets; H*C % 128 == 0 for the VMEM minor dim; the kernel tile must
divide F exactly (sampler frontiers always carry the batch's power-of-2
factor) — otherwise the mathematically identical XLA formula runs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_kernels import _is_batched

__all__ = ["flash_gat_lane"]

_SLOTS = 2
_NEG = -1e30
# _VMEM_BUDGET sizes the tile (scratch double-buffers); _VMEM_LIMIT is
# the Mosaic scoped-VMEM ceiling passed to every pallas_call. The gap
# is the margin for pipelined in/out blocks and f32 staging the tile
# formula does not count — at k=10, hc=1024 the bwd kernel measured
# 36 KB over a 44 MB limit with a 44 MB budget (hardware-only failure,
# caught by bench_e2e --model gat; interpret mode has no limit).
_VMEM_BUDGET = 32 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024


def _expansion(h: int, c: int):
    """[H*C, H] 0/1 block-identity: per-head reduce = x @ E,
    per-head broadcast = s @ E.T."""
    e = np.zeros((h * c, h), np.float32)
    for i in range(h):
        e[i * c:(i + 1) * c, i] = 1.0
    return jnp.asarray(e)


def _make_expand(ematT, cdt):
    """Cheap per-head expansion [tile, h] -> [tile, hc], shared by the
    fwd and bwd kernels. The r5 headroom decomposition
    (benchmarks/gat_headroom.py) measured the old f32-HIGHEST expansion
    matmuls at 70% of kernel time (6-pass MXU emulation against a 0/1
    block-identity operand). bf16 compute takes ONE f32-operand DEFAULT
    pass (error below the output dtype's own rounding); f32 compute
    emulates bf16x2 with a hi/lo split of the operand — the 0/1 matrix
    is bf16-exact, so ~2^-16 precision at 2 passes (Mosaic has no
    3-pass precision tier)."""
    f32x2 = cdt == jnp.float32
    ematT_b = ematT.astype(jnp.bfloat16)

    def _edot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    def expand(v):
        if not f32x2:
            return _edot(v, ematT)
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return _edot(hi, ematT_b) + _edot(lo, ematT_b)

    return expand


def _pick_tile(f: int, k: int, hc: int, itemsize: int) -> int:
    """Largest power-of-two tile dividing f whose double-buffered
    read+write stream blocks (bwd needs both sets) fit the VMEM budget;
    0 if no fused-path tile exists."""
    tile = 1024
    while tile >= 256:
        if (f % tile == 0 and f >= 2 * tile
                and 2 * _SLOTS * (k + 1) * tile * hc * itemsize
                <= _VMEM_BUDGET):
            return tile
        tile //= 2
    return 0


# ---------------------------------------------------------------------------
# XLA formulas (fallback + oracle). Emit the same residuals (m, s, a_d)
# as the kernels so fwd/bwd paths mix freely.


@functools.partial(jax.jit, static_argnames=("h", "slope"))
def _xla_gat_fwd(x, asr, adr, maskf, *, h: int, slope: float):
    k, f = maskf.shape
    hc = x.shape[1]
    c = hc // h
    vd = x[:f].astype(jnp.float32)
    a_d = (vd * adr).reshape(f, h, c).sum(-1)                # [f, h]
    lanes = jax.lax.dynamic_slice_in_dim(x, f, k * f, 0).astype(
        jnp.float32).reshape(k, f, hc)
    a_l = (lanes * asr).reshape(k, f, h, c).sum(-1)          # [k, f, h]
    z = a_l + a_d[None]
    z = jnp.where(z >= 0, z, slope * z)
    z = jnp.where(maskf[..., None] > 0, z, _NEG)
    m = z.max(0)                                             # [f, h]
    p = jnp.exp(z - m[None]) * maskf[..., None]
    ssum = p.sum(0)                                          # [f, h]
    w = p / jnp.maximum(ssum, 1e-30)[None]
    out = (lanes.reshape(k, f, h, c) * w[..., None]).sum(0)
    return out.reshape(f, hc).astype(x.dtype), m, ssum, a_d


@functools.partial(jax.jit, static_argnames=("h", "slope"))
def _xla_gat_bwd(g, out, m, ssum, a_d, x, asr, adr, maskf,
                 *, h: int, slope: float):
    k, f = maskf.shape
    hc = x.shape[1]
    c = hc // h
    gf = g.astype(jnp.float32)
    corr = (gf * out.astype(jnp.float32)).reshape(f, h, c).sum(-1)
    inv_s = 1.0 / jnp.maximum(ssum, 1e-30)
    lanes = jax.lax.dynamic_slice_in_dim(x, f, k * f, 0).astype(
        jnp.float32).reshape(k, f, hc)
    a_l = (lanes * asr).reshape(k, f, h, c).sum(-1)
    zraw = a_l + a_d[None]
    z = jnp.where(zraw >= 0, zraw, slope * zraw)
    z = jnp.where(maskf[..., None] > 0, z, _NEG)
    alpha = jnp.exp(z - m[None]) * inv_s[None] * maskf[..., None]
    dalpha = (gf[None] * lanes).reshape(k, f, h, c).sum(-1)
    de = alpha * (dalpha - corr[None])
    dz = de * jnp.where(zraw >= 0, 1.0, slope)               # [k, f, h]
    da_d = dz.sum(0)                                         # [f, h]
    dz_full = jnp.repeat(dz, c, axis=-1)                     # [k, f, hc]
    alpha_full = jnp.repeat(alpha, c, axis=-1)
    dlanes = gf[None] * alpha_full + dz_full * asr
    dasr = (dz_full * lanes).sum((0, 1))                     # [hc]
    vd = x[:f].astype(jnp.float32)
    dad_full = jnp.repeat(da_d, c, axis=-1)                  # [f, hc]
    dadr = (dad_full * vd).sum(0)
    dvd = dad_full * adr[0]
    dx = jnp.concatenate([dvd, dlanes.reshape(k * f, hc)],
                         axis=0).astype(x.dtype)
    return dx, dasr.reshape(1, hc), dadr.reshape(1, hc)


# ---------------------------------------------------------------------------
# Forward kernel


def _fwd_kernel(mk_ref, asr_ref, adr_ref, emat_ref, ematT_ref, x_hbm,
                out_ref, mout_ref, sout_ref, adout_ref, buf, sems,
                *, f, k, tile, nt, h, slope):
    i = pl.program_id(0)

    def cp(j, ii, slot):
        off = (f + j * f) if j < k else 0                    # static per j
        off = pl.multiple_of(off + ii * tile, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(off, tile), :], buf.at[slot, j], sems.at[slot, j])

    @pl.when(i == 0)
    def _():
        for j in range(k + 1):
            cp(j, 0, 0).start()

    @pl.when(i + 1 < nt)
    def _():
        for j in range(k + 1):
            cp(j, i + 1, (i + 1) % _SLOTS).start()

    s = i % _SLOTS
    for j in range(k + 1):
        cp(j, i, s).wait()

    emat, ematT = emat_ref[:], ematT_ref[:]
    asr, adr = asr_ref[:], adr_ref[:]
    mk = mk_ref[:]                                           # [k, tile]
    cdt = buf.dtype                                          # compute dtype
    emat_c = emat.astype(cdt)                                # exact 0/1
    asr_c, adr_c = asr.astype(cdt), adr.astype(cdt)

    # HIGHEST forces true-f32 MXU passes so compiled f32 logits match
    # the XLA oracle bit-for-bit-ish (default f32 contraction runs at
    # reduced precision and can flip LeakyReLU kinks); Mosaic rejects
    # fp32 contract precision on bf16 operands, where bf16 products
    # with f32 accumulation are the exact semantics anyway.
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def reduce_heads(v):                                     # [tile,hc]->[tile,h]
        return jax.lax.dot_general(v, emat_c, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    # cheap per-head expansion (one bf16 MXU pass / hi-lo bf16x2 for
    # f32) — see _make_expand for the r5 headroom rationale
    expand_heads = _make_expand(ematT, cdt)

    # sweep 1 (all k lane blocks are VMEM-resident, so the softmax is
    # exact two-pass, no online rescale): per-lane logits via one MXU
    # head-reduce each, running max over the tiny [tile, h] values
    a_d = reduce_heads(buf[s, k] * adr_c)                    # [tile, h]
    zs = []
    m = jnp.full((tile, h), _NEG, jnp.float32)
    for j in range(k):
        z = reduce_heads(buf[s, j] * asr_c) + a_d
        z = jnp.where(z >= 0, z, slope * z)
        z = jnp.where(mk[j][:, None] > 0, z, _NEG)
        zs.append(z)
        m = jnp.maximum(m, z)
    ps = [jnp.exp(z - m) * mk[j][:, None] for j, z in enumerate(zs)]
    ssum = functools.reduce(jnp.add, ps)
    inv = 1.0 / jnp.maximum(ssum, 1e-30)

    # sweep 2: weighted accumulate; per-head alpha expands to row width
    # by one MXU block-identity matmul per lane (compute-dtype, see
    # expand_heads)
    acc = jnp.zeros((tile, asr.shape[1]), jnp.float32)
    for j in range(k):
        aexp = expand_heads(ps[j] * inv)                     # [tile, hc] f32
        acc = acc + buf[s, j].astype(jnp.float32) * aexp
    out_ref[:] = acc.astype(out_ref.dtype)
    mout_ref[:] = m
    sout_ref[:] = ssum
    adout_ref[:] = a_d


@functools.partial(jax.jit,
                   static_argnames=("f", "k", "tile", "h", "slope",
                                    "interpret"))
def _fwd_pallas(x, asr, adr, maskf, *, f, k, tile, h, slope, interpret):
    hc = x.shape[1]
    nt = f // tile
    emat = _expansion(h, hc // h)
    out, m, ssum, a_d = pl.pallas_call(
        functools.partial(_fwd_kernel, f=f, k=k, tile=tile, nt=nt, h=h,
                          slope=slope),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tile, hc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f, hc), x.dtype),
            jax.ShapeDtypeStruct((f, h), jnp.float32),
            jax.ShapeDtypeStruct((f, h), jnp.float32),
            jax.ShapeDtypeStruct((f, h), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, k + 1, tile, hc), x.dtype),
            pltpu.SemaphoreType.DMA((_SLOTS, k + 1)),
        ],
    )(maskf, asr, adr, emat, emat.T, x)
    return out, m, ssum, a_d


# ---------------------------------------------------------------------------
# Backward kernel: re-reads the k+1 input streams (alpha recomputed from
# the saved running max/denominator), writes the k+1 gradient streams,
# accumulates attention-parameter grads in VMEM-resident outputs.


def _bwd_kernel(mk_ref, g_ref, out_ref, m_ref, s_ref, ad_ref, asr_ref,
                adr_ref, emat_ref, ematT_ref, x_hbm,
                dx_hbm, dasr_ref, dadr_ref, bufr, bufw, rsems, wsems,
                *, f, k, tile, nt, h, slope):
    i = pl.program_id(0)
    s = i % _SLOTS
    hc = asr_ref.shape[1]

    def rcp(j, ii, slot):
        off = (f + j * f) if j < k else 0
        off = pl.multiple_of(off + ii * tile, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(off, tile), :], bufr.at[slot, j],
            rsems.at[slot, j])

    def wcp(j, ii, slot):
        off = (f + j * f) if j < k else 0
        off = pl.multiple_of(off + ii * tile, 8)
        return pltpu.make_async_copy(
            bufw.at[slot, j], dx_hbm.at[pl.ds(off, tile), :],
            wsems.at[slot, j])

    @pl.when(i == 0)
    def _():
        for j in range(k + 1):
            rcp(j, 0, 0).start()
        dasr_ref[:] = jnp.zeros_like(dasr_ref)
        dadr_ref[:] = jnp.zeros_like(dadr_ref)

    @pl.when(i + 1 < nt)
    def _():
        for j in range(k + 1):
            rcp(j, i + 1, (i + 1) % _SLOTS).start()

    # drain this slot's in-flight writes before overwriting bufw
    @pl.when(i >= _SLOTS)
    def _():
        for j in range(k + 1):
            wcp(j, i - _SLOTS, s).wait()

    for j in range(k + 1):
        rcp(j, i, s).wait()

    emat, ematT = emat_ref[:], ematT_ref[:]
    asr, adr = asr_ref[:], adr_ref[:]
    mk = mk_ref[:]
    cdt = bufr.dtype
    emat_c = emat.astype(cdt)                                # exact 0/1
    asr_c, adr_c = asr.astype(cdt), adr.astype(cdt)

    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def reduce_heads(v):
        return jax.lax.dot_general(v, emat_c, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    # cheap per-head expansion shared with the fwd kernel (bwd calls it
    # 2k+2 times per tile) — see _make_expand
    expand_heads = _make_expand(ematT, cdt)

    # Attention-PARAM grads stay full f32: instead of expanding dz to
    # [tile, hc] and row-summing (which would inherit the compute-dtype
    # expansion's rounding), contract over rows in the HEAD domain —
    # one tiny [hp, hc] matmul per lane — and mask to the block
    # diagonal. Param grads sum F*k lanes, where isolated rounding
    # flips accumulate (the fwd/dx streams tolerate compute dtype).
    hp = -(-h // 8) * 8
    blkmask = jnp.concatenate(
        [ematT, jnp.zeros((hp - h, hc), jnp.float32)], 0) \
        if hp > h else ematT

    def param_grad(dzh, v):       # [tile, h] f32, [tile, hc] -> [hp, hc]
        dz8 = (jnp.concatenate(
            [dzh, jnp.zeros((tile, hp - h), jnp.float32)], 1)
            if hp > h else dzh)
        m8 = jax.lax.dot_general(
            dz8, v.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) * blkmask
        if hp > 8:                           # fold into the [8, hc] acc
            m8 = m8.reshape(hp // 8, 8, hc).sum(0)
        return m8

    gv = g_ref[:].astype(cdt)
    corr = reduce_heads(gv * out_ref[:].astype(cdt))         # [tile, h]
    inv_s = 1.0 / jnp.maximum(s_ref[:], 1e-30)
    a_d = ad_ref[:]
    mm = m_ref[:]

    da_d = jnp.zeros((tile, h), jnp.float32)
    for j in range(k):
        vj = bufr[s, j]                                      # cdt
        zraw = reduce_heads(vj * asr_c) + a_d
        z = jnp.where(zraw >= 0, zraw, slope * zraw)
        mj = mk[j][:, None]
        z = jnp.where(mj > 0, z, _NEG)
        alpha = jnp.exp(z - mm) * inv_s * mj                 # [tile, h]
        dalpha = reduce_heads(gv * vj)
        de = alpha * (dalpha - corr)
        dz = de * jnp.where(zraw >= 0, 1.0, slope)
        da_d = da_d + dz
        dzf = expand_heads(dz).astype(cdt)                   # [tile, hc]
        dasr_ref[:] += param_grad(dz, vj)
        bufw[s, j] = (gv * expand_heads(alpha).astype(cdt)
                      + dzf * asr_c)
    vd = bufr[s, k]
    dadf = expand_heads(da_d).astype(cdt)
    dadr_ref[:] += param_grad(da_d, vd)
    bufw[s, k] = dadf * adr_c

    for j in range(k + 1):
        wcp(j, i, s).start()

    @pl.when(i == nt - 1)
    def _():
        for j in range(k + 1):
            wcp(j, i, s).wait()
        if nt >= 2:                                          # nt is static
            for j in range(k + 1):
                wcp(j, i - 1, (i - 1) % _SLOTS).wait()


@functools.partial(jax.jit,
                   static_argnames=("f", "k", "tile", "h", "slope",
                                    "interpret"))
def _bwd_pallas(g, out, m, ssum, a_d, x, asr, adr, maskf,
                *, f, k, tile, h, slope, interpret):
    hc = x.shape[1]
    nt = f // tile
    emat = _expansion(h, hc // h)
    dx, dasr8, dadr8 = pl.pallas_call(
        functools.partial(_bwd_kernel, f=f, k=k, tile=tile, nt=nt, h=h,
                          slope=slope),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((8, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((f * (1 + k), hc), x.dtype),
            jax.ShapeDtypeStruct((8, hc), jnp.float32),
            jax.ShapeDtypeStruct((8, hc), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, k + 1, tile, hc), x.dtype),
            pltpu.VMEM((_SLOTS, k + 1, tile, hc), x.dtype),
            pltpu.SemaphoreType.DMA((_SLOTS, k + 1)),
            pltpu.SemaphoreType.DMA((_SLOTS, k + 1)),
        ],
    )(maskf, g, out, m, ssum, a_d, asr, adr, emat, emat.T, x)
    return dx, dasr8.sum(0, keepdims=True), dadr8.sum(0, keepdims=True)


# ---------------------------------------------------------------------------
# Dispatch + custom VJP


def _use_pallas(x, f: int, k: int, hc: int) -> int:
    if (jax.default_backend() != "tpu" or _is_batched(x) or f % 8
            or hc % 128):
        return 0
    return _pick_tile(f, k, hc, x.dtype.itemsize)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_gat(x, asr, adr, maskf, h, slope):
    tile = _use_pallas(x, maskf.shape[1], maskf.shape[0], x.shape[1])
    if tile:
        out, _, _, _ = _fwd_pallas(x, asr, adr, maskf,
                                   f=maskf.shape[1], k=maskf.shape[0],
                                   tile=tile, h=h, slope=slope,
                                   interpret=False)
        return out
    out, _, _, _ = _xla_gat_fwd(x, asr, adr, maskf, h=h, slope=slope)
    return out


def _flash_gat_fwd(x, asr, adr, maskf, h, slope):
    tile = _use_pallas(x, maskf.shape[1], maskf.shape[0], x.shape[1])
    if tile:
        out, m, ssum, a_d = _fwd_pallas(
            x, asr, adr, maskf, f=maskf.shape[1], k=maskf.shape[0],
            tile=tile, h=h, slope=slope, interpret=False)
    else:
        out, m, ssum, a_d = _xla_gat_fwd(x, asr, adr, maskf, h=h,
                                         slope=slope)
    return out, (x, asr, adr, maskf, out, m, ssum, a_d)


def _flash_gat_bwd(h, slope, res, g):
    x, asr, adr, maskf, out, m, ssum, a_d = res
    tile = _use_pallas(g, maskf.shape[1], maskf.shape[0], x.shape[1])
    if tile:
        dx, dasr, dadr = _bwd_pallas(
            g, out, m, ssum, a_d, x, asr, adr, maskf,
            f=maskf.shape[1], k=maskf.shape[0], tile=tile, h=h,
            slope=slope, interpret=False)
    else:
        dx, dasr, dadr = _xla_gat_bwd(g, out, m, ssum, a_d, x, asr, adr,
                                      maskf, h=h, slope=slope)
    return dx, dasr.astype(asr.dtype), dadr.astype(adr.dtype), \
        jnp.zeros(maskf.shape, maskf.dtype)


_flash_gat.defvjp(_flash_gat_fwd, _flash_gat_bwd)


def flash_gat_lane(x, att_src, att_dst, mask, heads: int,
                   negative_slope: float = 0.2):
    """Fused multi-head GAT aggregation over a lane-major DenseBlock.

    Args:
      x: [F*(1+k), H*C] transformed rows W x (``[dst | lane 0 | ...]``).
      att_src / att_dst: [1, H*C] attention vectors (per-head blocks of
        C, i.e. ``param.reshape(1, H*C)`` of PyG's ``(1, H, C)``).
      mask: [F, k] bool lane validity (DenseBlock.mask).
      heads: H. negative_slope: LeakyReLU slope.

    Returns [F, H*C]: out[i, h*C:(h+1)*C] = sum_j alpha_jih (Wx)_jh with
    alpha = softmax_j over valid lanes of
    leakyrelu(att_src_h . (Wx_j)_h + att_dst_h . (Wx_i)_h); rows with no
    valid lanes return 0 (matching PyG's empty-neighborhood behavior).

    Runs the single-pass flash kernel on TPU when F % 8 == 0,
    H*C % 128 == 0 and a power-of-two tile divides F; the XLA formula
    (identical math, f32 accumulation) elsewhere. Differentiable w.r.t.
    x and both attention vectors via the custom VJP.
    """
    hc = x.shape[1]
    if hc % heads:
        raise ValueError(f"x width {hc} not divisible by heads={heads}")
    maskf = jax.lax.stop_gradient(mask.T.astype(jnp.float32))
    asr = jnp.asarray(att_src, jnp.float32).reshape(1, hc)
    adr = jnp.asarray(att_dst, jnp.float32).reshape(1, hc)
    return _flash_gat(x, asr, adr, maskf, heads, float(negative_slope))
