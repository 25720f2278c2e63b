"""Static-shape neighbor-sampling primitives (jittable, CPU+TPU).

TPU-native replacement for the reference's warp-per-row kernels:
  * uniform k-subset per row  — reference ``CSRRowWiseSampleKernel``
    (cuda_random.cu.hpp:8-69, DGL-style reservoir): we use Floyd's
    algorithm, which draws a uniform k-subset with a *static* k-step
    loop and O(k^2) vector compares — no atomics, no dynamic shapes,
    so it vectorises over the whole frontier on the VPU.
  * weighted sampling with replacement — reference ``weight_sample``
    (cuda_random.cu.hpp:179-221): inverse-CDF via a fixed 32-step
    binary search over a per-row normalized inclusive CDF.
  * ``cal_next_prob`` — reference ``cal_next`` (cuda_random.cu.hpp:72-104):
    hop h -> h+1 access probability, edge-parallel in log space.

All functions take the CSR arrays as device buffers (HBM-resident; the
TPU analogue of the reference's DMA mode) and padded frontiers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.segment import segment_sum


def _row_ranges(indptr, frontier, frontier_valid):
    n_nodes = indptr.shape[0] - 1
    f = jnp.clip(frontier.astype(jnp.int32), 0, n_nodes - 1)
    start = indptr[f]
    deg = indptr[f + 1] - start
    deg = jnp.where(frontier_valid, deg, 0)
    return start.astype(jnp.int32), deg.astype(jnp.int32)


def _floyd_positions(key, deg, k: int):
    """Uniform k-subset of [0, deg) per row via Floyd's algorithm.

    Returns positions [N, k]; rows with deg <= k get arange(k).
    Only the first min(deg, k) lanes are meaningful.
    """
    N = deg.shape[0]
    u = jax.random.uniform(key, (k, N))
    ar = jnp.arange(k, dtype=jnp.int32)

    sel = jnp.zeros((N, k), dtype=jnp.int32)
    for step in range(k):
        i = deg - k + step                      # [N]; >= 0 when deg > k
        hi = jnp.maximum(i, 0)
        t = jnp.minimum((u[step] * (hi + 1).astype(u.dtype)).astype(jnp.int32), hi)
        if step > 0:
            dup = jnp.any(sel[:, :step] == t[:, None], axis=1)
            t = jnp.where(dup, hi, t)
        sel = sel.at[:, step].set(t)

    take_all = (deg <= k)[:, None]
    return jnp.where(take_all, ar[None, :], sel)


def sample_adjacency(indptr, indices, frontier, frontier_valid, k: int, key):
    """Uniform fanout-k sampling without replacement for each frontier row.

    Args:
      indptr: [V+1] int32/int64 CSR row pointers (device).
      indices: [E] int32 CSR column ids (device).
      frontier: [N] int32 global node ids (padded).
      frontier_valid: [N] bool.
      k: static fanout.
      key: PRNG key.

    Returns:
      nbr: [N, k] int32 sampled neighbor global ids (garbage where masked).
      mask: [N, k] bool — lane j of row i valid iff j < min(deg_i, k).
      pos: [N, k] int32 CSR slot of each sampled edge (for edge ids /
        weights), garbage where masked.
    """
    start, deg = _row_ranges(indptr, frontier, frontier_valid)
    pos = _floyd_positions(key, deg, k)
    ar = jnp.arange(k, dtype=jnp.int32)
    cnt = jnp.minimum(deg, k)
    mask = (ar[None, :] < cnt[:, None]) & frontier_valid[:, None]
    slot = start[:, None] + pos
    slot = jnp.where(mask, slot, 0)
    nbr = jnp.take(indices, slot, mode="clip").astype(jnp.int32)
    return nbr, mask, slot


def build_meta2(indptr):
    """Host-side [V, 2] int32 (row start, degree) table: exact-mode
    sampling reads BOTH with one 2-D row gather (~10 ns/row on v5e)
    instead of two scattered indptr element gathers."""
    import numpy as np
    indptr = np.asarray(indptr, np.int64)
    meta = np.empty((indptr.shape[0] - 1, 2), np.int32)
    meta[:, 0] = indptr[:-1]
    meta[:, 1] = indptr[1:] - indptr[:-1]
    return meta


def sample_adjacency_meta(meta2, indices, frontier, frontier_valid,
                          k: int, key):
    """Exact Floyd k-subset sampling, (start, deg) from the meta table.
    Same contract as :func:`sample_adjacency`."""
    V = meta2.shape[0]
    f = jnp.clip(frontier.astype(jnp.int32), 0, V - 1)
    mr = jnp.take(meta2, f, axis=0)                 # [N, 2]
    start = mr[:, 0]
    deg = jnp.where(frontier_valid, mr[:, 1], 0)
    pos = _floyd_positions(key, deg, k)
    ar = jnp.arange(k, dtype=jnp.int32)
    cnt = jnp.minimum(deg, k)
    mask = (ar[None, :] < cnt[:, None]) & frontier_valid[:, None]
    slot = jnp.where(mask, start[:, None] + pos, 0)
    nbr = jnp.take(indices, slot, mode="clip").astype(jnp.int32)
    return nbr, mask, slot


_WINDOW_LANES = 128  # block width of the 2-D adjacency layout


def build_window_layout(indptr, indices, k_max: int):
    """Host-side prep for window sampling: the adjacency as an
    OVERLAPPED 2-D [blocks, 128] int32 array (block row r covers flat
    slots [r*S, r*S + 128) with stride S = 128 - k_max, so consecutive
    rows overlap by k_max lanes) plus a per-node meta table [V, 8]
    (lane 0 = row start slot, lane 1 = degree).

    The overlap guarantees any k<=k_max contiguous window lives inside
    ONE block row: one row-gather per frontier node instead of two —
    half the gather descriptors and half the select width — for a
    128/S ~= 1.13x memory overhead at k_max=15.
    """
    import numpy as np
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int32)
    V = indptr.shape[0] - 1
    E = indices.shape[0]
    W = _WINDOW_LANES
    S = W - int(k_max)
    assert 1 <= S < W, f"k_max {k_max} out of range for window layout"
    blocks = max((E + S - 1) // S, 1)
    flat = np.zeros(((blocks - 1) * S + W,), np.int32)
    flat[:E] = indices
    ind2d = np.lib.stride_tricks.as_strided(
        flat, shape=(blocks, W), strides=(S * 4, 4)).copy()
    meta = np.zeros((V, 8), np.int32)
    meta[:, 0] = indptr[:-1]
    meta[:, 1] = (indptr[1:] - indptr[:-1])
    return ind2d, meta


def window_meta(indptr):
    """Host-side [V, 8] meta table for window sampling (lane 0 = row
    start slot, lane 1 = degree; 8 lanes so a row is one sublane)."""
    import numpy as np
    indptr = np.asarray(indptr, np.int64)
    V = indptr.shape[0] - 1
    meta = np.zeros((V, 8), np.int32)
    meta[:, 0] = indptr[:-1]
    meta[:, 1] = indptr[1:] - indptr[:-1]
    return meta


@functools.partial(jax.jit, static_argnames=("k_max",))
def device_shuffle_window(indptr, flat, key, *, k_max: int):
    """Fresh per-row neighbor permutation + overlapped window layout,
    entirely ON DEVICE: a segmented sort by (row id, random key) is a
    uniform independent permutation of every adjacency row, and the
    overlapped [blocks, 128] layout is pure reshapes of the sorted flat
    array. Replaces the host path (threaded shuffle + layout build +
    ~E*4.5 B re-upload) for per-epoch reshuffles: measured ~0.3 s vs
    11.4 s host+transfer at products scale on a v5e — the epoch-boundary
    analogue of the reference re-drawing reservoir samples on device
    every batch (cuda_random.cu.hpp:8-69).

    Args:
      indptr: [V+1] int32 device CSR row pointers.
      flat: [E] int32 device ORIGINAL-order column ids.
      key: PRNG key for this shuffle.
      k_max: static window width the layout serves.

    Returns:
      ind2d: [blocks, 128] overlapped layout of the shuffled adjacency
        (same contract as :func:`build_window_layout`).
      perm: [E] int32 slot -> original-slot map (``shuffle_eid``).
    """
    E = flat.shape[0]
    W = _WINDOW_LANES
    S = W - int(k_max)
    assert 1 <= S < W, f"k_max {k_max} out of range for window layout"
    blocks = max(-(-E // S), 1)
    # Per-edge row id: +1 at each row boundary, cumsum. Boundaries at E
    # (trailing empty rows) drop out.
    rid = jnp.zeros((E,), jnp.int32).at[indptr[1:-1]].add(1, mode="drop")
    rid = jnp.cumsum(rid)
    rnd = jax.lax.bitcast_convert_type(
        jax.random.bits(key, (E,), jnp.uint32), jnp.int32)
    eid = jnp.arange(E, dtype=jnp.int32)
    _, _, shuf, perm = jax.lax.sort(
        [rid, rnd, flat.astype(jnp.int32), eid], num_keys=2)
    padlen = blocks * S + W
    flat_pad = jax.lax.dynamic_update_slice(
        jnp.zeros((padlen,), jnp.int32), shuf, (0,))
    base = flat_pad[:blocks * S].reshape(blocks, S)
    nxt = flat_pad[S:S + blocks * S].reshape(blocks, S)
    ind2d = jnp.concatenate([base, nxt[:, :W - S]], axis=1)
    return ind2d, perm


def _select_window(rows, rel, k: int):
    """rows [N, 2W], rel [N] -> [N, k] lanes rel..rel+k-1, selected with
    masked VPU reductions (TPU batched per-row gathers are slow)."""
    W2 = rows.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1)
    outs = []
    for j in range(k):
        m = iota == (rel[:, None] + j)
        outs.append(jnp.sum(jnp.where(m, rows, 0), axis=1))
    return jnp.stack(outs, axis=1)


def sample_adjacency_window(meta, ind2d, frontier, frontier_valid,
                            k: int, key, k_max: int = None):
    """Contiguous-window fanout-k sampling over PRE-SHUFFLED rows.

    The TPU-native answer to the warp-per-row reservoir kernel's memory
    pattern: the CUDA kernel reads k scattered elements per row, but on
    TPU scattered element gathers are latency-bound (~100M/s) while
    128-lane *row* gathers cost the same per descriptor. So: each row's
    neighbor order is randomly permuted once at load time
    (``native.shuffle_rows``), the window start is uniform in
    [0, deg-k], and the k *consecutive* neighbors are read with ONE
    overlapped block-row gather + an in-register select (the layout's
    rows overlap by k_max lanes so any window fits one row — see
    :func:`build_window_layout`).

    Distribution: per-POSITION probabilities are slightly edge-biased
    (no wraparound), but positions hold a random permutation of the
    neighbors, so any fixed draw is an unbiased uniform-marginal sample;
    re-shuffle between epochs to refresh the window family. The
    ``exact`` strategy (Floyd) keeps unrestricted k-subsets.

    Same output contract as :func:`sample_adjacency`. ``k_max`` must be
    the value the layout was built with (defaults to k).
    """
    W = _WINDOW_LANES
    if k_max is None:
        k_max = k
    assert k <= k_max <= W - 14, f"fanout {k} > layout k_max {k_max}"
    S = W - k_max
    N = frontier.shape[0]
    V = meta.shape[0]
    f = jnp.clip(frontier.astype(jnp.int32), 0, V - 1)
    mrow = jnp.take(meta, f, axis=0)                     # [N, 8]
    start = mrow[:, 0]
    deg = jnp.where(frontier_valid, mrow[:, 1], 0)

    u = jax.random.uniform(key, (N,))
    span = jnp.maximum(deg - k + 1, 1).astype(u.dtype)
    off = jnp.minimum((u * span).astype(jnp.int32),
                      jnp.maximum(deg - k, 0))
    s = start + off
    g = s // S
    G = ind2d.shape[0]
    rows = jnp.take(ind2d, jnp.clip(g, 0, G - 1), axis=0)   # [N, W]
    rel = s % S
    # rel < S, so the window lives in columns [0, S+k): narrow before
    # the per-lane selects to trim their traffic.
    nbr = _select_window(rows[:, :S + k], rel, k).astype(jnp.int32)

    j = jnp.arange(k, dtype=jnp.int32)[None, :]
    mask = (j < jnp.minimum(deg, k)[:, None]) & frontier_valid[:, None]
    slot = jnp.where(mask, s[:, None] + j, 0)
    return nbr, mask, slot


def build_block_layout(indptr, indices, lanes: int = 128):
    """Host-side prep for BLOCK-EXACT sampling: a ``[V, lanes]`` int32
    table where row v is ``[start_v, deg_v, indices[start_v : start_v +
    min(deg_v, lanes-2)], 0-pad]``.

    Rationale (measured on a v5e): XLA row gathers are *descriptor*-bound
    at ~31-35M rows/s regardless of row width up to 512 B, while element
    gathers cost one descriptor each (~55M/s). The reference's exact
    sampler (CSRRowWiseSampleKernel, cuda_random.cu.hpp:8-69) issues
    1 + k scattered reads per frontier row; with this layout a row whose
    degree fits the block needs exactly ONE descriptor — header and
    neighborhood arrive together. Only rows with deg > lanes-2 (the
    power-law tail) fall back to per-draw scattered reads, behind a
    static capacity (see :func:`sample_adjacency_block`).

    Memory: ``V * lanes * 4`` bytes (1.25 GB for ogbn-products at 128
    lanes) — the graph analogue of the reference keeping indptr always
    HBM-resident (quiver_sample.cu:361-461).
    """
    from .. import native
    assert int(lanes) >= 18, "block layout needs >= 18 lanes (2 header + k)"
    return native.build_blocks(indptr, indices, int(lanes))


def sample_adjacency_block(blk, indices, frontier, frontier_valid, k: int,
                           key, big_cap: int):
    """Exact Floyd k-subset sampling over the block layout.

    Same distribution and output contract as :func:`sample_adjacency`
    (uniform k-subset per row, no replacement), restructured for the
    TPU's descriptor-bound gather:

      * every frontier row: ONE [lanes]-wide row gather of its block
        (header + first lanes-2 neighbors);
      * rows with deg <= lanes-2 select their k sampled lanes with
        masked VPU reductions (no further memory traffic);
      * rows with deg > lanes-2 ("big" rows) are compacted by one
        [N]-length sort into a static ``big_cap`` buffer, draw their k
        slots from flat ``indices`` (k scattered reads each), and are
        row-scattered back.

    ``big_cap`` bounds the scattered work; if a batch contains more big
    rows than ``big_cap``, the overflow rows' lanes are masked out
    (undersampled, never wrong) — the same tunable-capacity contract as
    the reindex buffers. Sizing guidance: deep-hop frontiers are
    edge-biased, so the big fraction is ``sum_{deg_v > lanes-2} deg_v/E``
    -ish, not the node-uniform tail (measured 0.15-0.21 at 126 lanes on
    a products-scale power law); defaults use 0.2 of the frontier.
    """
    W = blk.shape[1]
    V = blk.shape[0]
    N = frontier.shape[0]
    assert k <= W - 2, f"fanout {k} exceeds block body {W - 2}"

    f = jnp.clip(frontier.astype(jnp.int32), 0, V - 1)
    rows = jnp.take(blk, f, axis=0)                   # [N, W] one issue/row
    start = rows[:, 0]
    deg = jnp.where(frontier_valid, rows[:, 1], 0)
    pos = _floyd_positions(key, deg, k)               # [N, k] exact offsets

    ar = jnp.arange(k, dtype=jnp.int32)
    cnt = jnp.minimum(deg, k)
    mask = (ar[None, :] < cnt[:, None]) & frontier_valid[:, None]
    slot = jnp.where(mask, start[:, None] + pos, 0)

    # Small rows: sampled lanes live in the fetched block at 2 + pos.
    body = rows[:, 2:]                                # [N, W-2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, W - 2), 1)
    small_vals = []
    for j in range(k):
        m = iota == pos[:, j:j + 1]
        small_vals.append(jnp.sum(jnp.where(m, body, 0), axis=1))
    nbr = jnp.stack(small_vals, axis=1)               # [N, k]

    # Big rows: compact row indices (one 2-key sort), fetch their
    # (start, pos) metadata with one row gather, then k scattered reads.
    is_big = (deg > (W - 2)) & frontier_valid
    pos_i = jnp.arange(N, dtype=jnp.int32)
    bigkey = jnp.where(is_big, pos_i, jnp.int32(N))
    bigidx = jax.lax.sort([bigkey], num_keys=1)[0][:big_cap]  # [big_cap]
    meta_all = jnp.concatenate([start[:, None], pos], axis=1)  # [N, 1+k]
    meta_big = jnp.take(meta_all, jnp.minimum(bigidx, N - 1),
                        axis=0)                        # [big_cap, 1+k]
    slot_big = meta_big[:, 0:1] + meta_big[:, 1:]      # [big_cap, k]
    E = indices.shape[0]
    nbr_big = jnp.take(indices, jnp.clip(slot_big, 0, E - 1),
                       mode="clip").astype(jnp.int32)
    nbr = nbr.at[bigidx].set(nbr_big, mode="drop")

    # Overflow accounting: big rows that did not fit big_cap keep only
    # masked lanes (their block-path values are partial garbage).
    served = jnp.zeros((N,), jnp.bool_).at[bigidx].set(True, mode="drop")
    mask = mask & (~is_big | served)[:, None]
    return nbr, jnp.where(mask, True, False), jnp.where(mask, slot, 0)


def weighted_sample_adjacency(indptr, indices, row_cdf, frontier,
                              frontier_valid, k: int, key):
    """Weighted fanout-k sampling WITH replacement (reference semantics).

    ``row_cdf``: [E] float32, per-row inclusive CDF (last entry of each
    row == 1.0), built by ``build_row_cdf``. For each draw r ~ U(0,1],
    picks the first CSR slot with cdf >= r via a fixed-depth binary
    search (parity with weight_sample cuda_random.cu.hpp:179-197).
    """
    start, deg = _row_ranges(indptr, frontier, frontier_valid)
    N = frontier.shape[0]
    r = jax.random.uniform(key, (N, k), minval=1e-7, maxval=1.0)

    lo = jnp.zeros((N, k), jnp.int32)
    hi = jnp.broadcast_to((deg - 1)[:, None], (N, k)).astype(jnp.int32)
    hi = jnp.maximum(hi, 0)
    E = row_cdf.shape[0]
    # ceil(log2(max_deg)) bounded by 32 for int32 degrees.
    for _ in range(32):
        mid = (lo + hi) // 2
        slot = jnp.clip(start[:, None] + mid, 0, E - 1)
        cm = jnp.take(row_cdf, slot, mode="clip")
        go_right = cm < r
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    pos = jnp.minimum(lo, jnp.maximum(deg - 1, 0)[:, None])

    ar = jnp.arange(k, dtype=jnp.int32)
    # with replacement: all k lanes valid whenever deg > 0
    mask = (deg > 0)[:, None] & frontier_valid[:, None] & (ar[None, :] < k)
    slot = jnp.where(mask, start[:, None] + pos, 0)
    nbr = jnp.take(indices, slot, mode="clip").astype(jnp.int32)
    return nbr, mask, slot


def build_alias_table(indptr, weights, indices=None):
    """Host-side: per-row Vose alias tables packed as one int32 array,
    replacing the 32-step inverse-CDF binary search (reference
    weight_sample cuda_random.cu.hpp:179-221) with an O(1) draw.

    With ``indices`` (the production layout): [E, 4] rows
    ``(prob bits, alias pos, neighbor at slot, neighbor at alias)`` —
    the NEIGHBOR IDS RIDE THE TABLE, so one 16-byte row gather per draw
    resolves accept-or-redirect AND the neighbor id (row gathers are
    descriptor-bound on TPU regardless of width; eliminating the second
    [N, k]-row gather of ``indices`` halves the descriptors of the
    weighted hot loop). Without ``indices``: the legacy [E, 2]
    ``(prob bits, alias pos)`` layout."""
    import numpy as np
    from .. import native

    prob, alias = native.build_alias(indptr, weights)
    E = prob.shape[0]
    if indices is None:
        packed = np.empty((E, 2), np.int32)
        packed[:, 0] = prob.view(np.int32)
        packed[:, 1] = alias
        return packed
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices)
    start = np.repeat(indptr[:-1], np.diff(indptr))        # [E]
    packed = np.empty((E, 4), np.int32)
    packed[:, 0] = prob.view(np.int32)
    packed[:, 1] = alias
    packed[:, 2] = indices
    packed[:, 3] = indices[np.minimum(start + alias, max(E - 1, 0))]
    return packed


def weighted_sample_alias(indptr, indices, alias2d, frontier,
                          frontier_valid, k: int, key):
    """Weighted fanout-k sampling WITH replacement via alias tables.

    Per lane: one uniform picks a candidate slot, ONE row gather of the
    packed alias entry resolves accept-or-redirect — with the [E, 4]
    layout (build_alias_table with indices) the entry also carries both
    candidate neighbor ids, so that single 16-byte gather is the lane's
    ENTIRE memory traffic (one descriptor per lane instead of the
    legacy two, or the reference's 32 binary-search probes).
    Same contract as :func:`weighted_sample_adjacency`.
    """
    start, deg = _row_ranges(indptr, frontier, frontier_valid)
    N = frontier.shape[0]
    u = jax.random.uniform(key, (2, N, k))
    pos = jnp.minimum((u[0] * deg[:, None].astype(u.dtype)).astype(jnp.int32),
                      jnp.maximum(deg - 1, 0)[:, None])
    slot = jnp.clip(start[:, None] + pos, 0, alias2d.shape[0] - 1)
    pa = jnp.take(alias2d, slot, axis=0)           # [N, k, 2 or 4]
    acc_p = jax.lax.bitcast_convert_type(pa[..., 0], jnp.float32)
    alias_pos = pa[..., 1]
    accept = u[1] <= acc_p
    pos2 = jnp.where(accept, pos, alias_pos)
    slot = start[:, None] + pos2

    ar = jnp.arange(k, dtype=jnp.int32)
    mask = (deg > 0)[:, None] & frontier_valid[:, None] & (ar[None, :] < k)
    slot = jnp.where(mask, slot, 0)
    if alias2d.shape[1] >= 4:
        nbr = jnp.where(accept, pa[..., 2], pa[..., 3])
        return jnp.where(mask, nbr, 0), mask, slot
    nbr = jnp.take(indices, jnp.clip(slot, 0, indices.shape[0] - 1),
                   mode="clip").astype(jnp.int32)
    return nbr, mask, slot


_PACKED_LANES = 64  # block width of the packed triple layout


def build_packed_layout(indptr, indices):
    """Host-side prep for PACKED window sampling: each (pre-shuffled)
    edge is stored as an interleaved triple
    ``(neighbor id, neighbor row start, neighbor degree)`` so a sampled
    lane carries everything the NEXT hop needs — no per-row meta lookup
    at all. Layout: [blocks, 64] int32 over the stride-3 stream.

    Returns (packed2d [B, 64] int32, seed_meta [V, 2] int32).
    """
    import numpy as np
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int32)
    V = indptr.shape[0] - 1
    E = indices.shape[0]
    start = indptr[:-1].astype(np.int32)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int32)
    stream = np.empty(3 * E, np.int32)
    stream[0::3] = indices
    stream[1::3] = start[indices]
    stream[2::3] = deg[indices]
    W = _PACKED_LANES
    blocks = (3 * E + 4 * W) // W + 1
    packed = np.zeros((blocks, W), np.int32)
    packed.reshape(-1)[:3 * E] = stream
    seed_meta = np.stack([start, deg], 1)
    return packed, seed_meta


def sample_adjacency_packed(packed2d, frontier3, frontier_valid, k: int,
                            key):
    """Window sampling over the packed triple layout.

    ``frontier3``: [N, 3] int32 rows (id, row start, degree) — sampled
    lanes of the previous hop, or seed rows built from ``seed_meta``.
    Two narrow block-row gathers per frontier row cover the whole
    window INCLUDING each neighbor's (start, deg), so multi-hop
    sampling does one descriptor fewer per row than the plain window
    kernel. Returns (nbr3 [N, k, 3], mask [N, k], slot [N, k]).
    """
    W = _PACKED_LANES
    assert 3 * k + 2 < 2 * W, f"fanout {k} too large for packed layout"
    N = frontier3.shape[0]
    start = frontier3[:, 1]
    deg = jnp.where(frontier_valid, frontier3[:, 2], 0)

    u = jax.random.uniform(key, (N,))
    span = jnp.maximum(deg - k + 1, 1).astype(u.dtype)
    off = jnp.minimum((u * span).astype(jnp.int32),
                      jnp.maximum(deg - k, 0))
    s = start + off                      # first sampled slot
    lane0 = 3 * s
    g = lane0 // W
    G = packed2d.shape[0]
    gg = jnp.stack([jnp.clip(g, 0, G - 1), jnp.clip(g + 1, 0, G - 1)], 1)
    rows = jnp.take(packed2d, gg.reshape(-1), axis=0).reshape(N, 2 * W)
    rel = lane0 % W

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * W), 1)
    fields = []
    for j in range(k):
        lane_vals = []
        for f in range(3):
            m = iota == (rel[:, None] + 3 * j + f)
            lane_vals.append(jnp.sum(jnp.where(m, rows, 0), axis=1))
        fields.append(jnp.stack(lane_vals, 1))
    nbr3 = jnp.stack(fields, 1)          # [N, k, 3]

    j = jnp.arange(k, dtype=jnp.int32)[None, :]
    mask = (j < jnp.minimum(deg, k)[:, None]) & frontier_valid[:, None]
    slot = jnp.where(mask, s[:, None] + j, 0)
    nbr3 = jnp.where(mask[..., None], nbr3, 0)
    return nbr3, mask, slot


def build_row_cdf(indptr, weights):
    """Host-side: per-row inclusive CDF over CSR edge weights (float64
    accumulation, float32 storage; last entry of each non-empty row == 1).
    Analogue of the reference's ``bucket_weight_functor`` per-bucket
    normalization (quiver.cu.hpp:61-82).
    """
    import numpy as np
    indptr = np.asarray(indptr, dtype=np.int64)
    w = np.asarray(weights, dtype=np.float64)
    cums = np.cumsum(w)
    ex = np.concatenate([[0.0], cums])            # exclusive prefix sums
    deg = np.diff(indptr)
    row_base = ex[indptr[:-1]]                    # sum before each row
    row_tot = ex[indptr[1:]] - row_base           # per-row weight total
    base = np.repeat(row_base, deg)
    tot = np.repeat(row_tot, deg)
    cdf = (cums - base) / np.maximum(tot, 1e-300)
    return cdf.astype(np.float32)


def cal_next_prob(indptr, indices, last_prob, k: int):
    """Hop h -> h+1 access probability (reference cal_next semantics).

    p_next[v] = 1 - (1 - p[v]) * prod_{u in N(v)} skip(u)
      skip(u) = 1                         if deg_u == 0
              = 1 - p[u]                  if deg_u <= k
              = 1 - p[u] * k / deg_u      otherwise
    and p_next[v] = 0 when deg_v == 0.

    Edge-parallel over the full CSR in log space (segment-sum per row).
    """
    V = indptr.shape[0] - 1
    E = indices.shape[0]
    deg = (indptr[1:] - indptr[:-1]).astype(jnp.float32)
    deg_i = (indptr[1:] - indptr[:-1]).astype(jnp.int32)
    p = last_prob.astype(jnp.float32)

    sel_frac = jnp.where(deg_i <= k, 1.0, k / jnp.maximum(deg, 1.0))
    skip = 1.0 - p * jnp.where(deg_i == 0, 0.0, sel_frac)
    skip = jnp.clip(skip, 1e-12, 1.0)
    log_skip_u = jnp.log(skip)                      # [V]

    # row id of each CSR slot: searchsorted over indptr
    rows = jnp.searchsorted(indptr.astype(jnp.int32),
                            jnp.arange(E, dtype=jnp.int32), side="right") - 1
    edge_log = log_skip_u[indices.astype(jnp.int32)]
    acc_log = segment_sum(edge_log, rows, V)
    acc = jnp.exp(acc_log)
    p_next = 1.0 - (1.0 - p) * acc
    return jnp.where(deg_i == 0, 0.0, p_next)
