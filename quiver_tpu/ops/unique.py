"""Order-preserving, static-shape set union + reindex (the "hash table").

TPU-native replacement for the reference's device hash-table reindex
(``DeviceOrderedHashTable`` reindex.cu.hpp:21-158, ``FillWithDuplicates``
quiver_sample.cu:18-63). TPUs have no cheap global atomics, so instead of
an atomicCAS open-addressing table we use sort-based compaction with
*first-occurrence-wins* ordering — the same observable contract: the
base (frontier) ids keep their local ids 0..base_count-1 in order, and
new candidate ids are assigned fresh local ids in first-occurrence order.

Everything is static-shape and jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Sentinel must sort after every real node id. Node ids are < 2**31 - 8.
SENTINEL = jnp.int32(2**31 - 8)


def _forward_fill(x, is_head):
    """x where is_head, else the most recent head value to the left."""
    marked = jnp.where(is_head, x, jnp.int32(-1))

    def combine(a, b):
        return jnp.where(b >= 0, b, a)

    return jax.lax.associative_scan(combine, marked)


def union_reindex(base_ids, base_count, cand, cand_valid, capacity):
    """Union base_ids (already unique) with candidates; assign local ids.

    Args:
      base_ids: [B] int32 global ids; slots >= base_count are ignored.
      base_count: scalar int32, number of valid base ids.
      cand: [M] int32 candidate global ids (may contain duplicates and
        ids already present in base).
      cand_valid: [M] bool mask.
      capacity: static int, size of the output id table (>= B).

    Returns:
      out_ids: [capacity] int32, first-occurrence-ordered unique ids;
        unused slots hold SENTINEL.
      out_count: scalar int32 number of unique ids (clamped to capacity).
      cand_local: [M] int32 local id of each candidate (undefined where
        ~cand_valid or where the id overflowed capacity — pair with
        cand_ok).
      cand_ok: [M] bool — cand_valid and local id < capacity.
    """
    B = base_ids.shape[0]
    M = cand.shape[0]
    T = B + M

    base_valid = jnp.arange(B, dtype=jnp.int32) < base_count
    all_ids = jnp.concatenate([
        jnp.where(base_valid, base_ids.astype(jnp.int32), SENTINEL),
        jnp.where(cand_valid, cand.astype(jnp.int32), SENTINEL),
    ])

    order = jnp.argsort(all_ids, stable=True)      # [T] original positions
    s = all_ids[order]                             # sorted ids
    is_head = jnp.concatenate([
        jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]
    ]) & (s != SENTINEL)

    # Stable sort => the head of each equal run has the smallest original
    # position in the run, i.e. the first occurrence.
    pos_sorted = jnp.arange(T, dtype=jnp.int32)
    head_firstpos = jnp.where(is_head, order.astype(jnp.int32), jnp.int32(T) + pos_sorted)
    # Rank heads by first-occurrence position -> local id assignment order.
    rank_order = jnp.argsort(head_firstpos)        # [T]; heads first, by pos
    local_of_slot = jnp.zeros((T,), jnp.int32).at[rank_order].set(pos_sorted)
    # Each sorted element's run-head slot (forward fill of head indices).
    head_slot = _forward_fill(pos_sorted, is_head)
    local_sorted = local_of_slot[head_slot]        # local id per sorted elem
    # Scatter back to original positions.
    local_orig = jnp.zeros((T,), jnp.int32).at[order].set(local_sorted)

    out_count_full = jnp.sum(is_head).astype(jnp.int32)
    out_count = jnp.minimum(out_count_full, jnp.int32(capacity))

    # Build the output table: out_ids[local] = id for local < out_count.
    head_ids = jnp.where(is_head, s, SENTINEL)
    # rank_order maps rank j -> sorted slot of the j-th head.
    ranked_ids = head_ids[rank_order]              # [T], rank order
    out_ids = jnp.full((capacity,), SENTINEL, dtype=jnp.int32)
    take_n = min(capacity, T)
    out_ids = out_ids.at[:take_n].set(ranked_ids[:take_n])

    cand_local = local_orig[B:]
    cand_ok = cand_valid & (cand_local < capacity)
    return out_ids, out_count, cand_local, cand_ok
