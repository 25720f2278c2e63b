"""Masked segment reductions over padded edge lists.

These are the aggregation primitives under the GNN layers — the TPU
analogue of scatter-based message passing. Edges come from the sampler
as padded static-shape (src, dst, mask) triples; invalid lanes must not
contribute. XLA lowers segment_sum to a sorted-scatter on TPU; a Pallas
SpMM over CSR blocks is layered on top later for the hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_edges(dst, mask, num_segments):
    # Route invalid edges to a scratch segment so they never touch real rows.
    return jnp.where(mask, dst, num_segments)


def segment_sum(data, segment_ids, num_segments, mask=None):
    """sum_{e: dst[e]==v} data[e] with invalid edges dropped."""
    if mask is not None:
        segment_ids = _mask_edges(segment_ids, mask, num_segments)
        data = jnp.where(mask.reshape(mask.shape + (1,) * (data.ndim - 1)),
                         data, 0)
    out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_mean(data, segment_ids, num_segments, mask=None):
    s = segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(segment_ids.shape, dtype=data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, mask)
    cnt = jnp.maximum(cnt, 1)
    return s / cnt.reshape(cnt.shape + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments, mask=None, neutral=None):
    if neutral is None:
        neutral = jnp.finfo(data.dtype).min if jnp.issubdtype(
            data.dtype, jnp.floating) else jnp.iinfo(data.dtype).min
    if mask is not None:
        segment_ids = _mask_edges(segment_ids, mask, num_segments)
        data = jnp.where(mask.reshape(mask.shape + (1,) * (data.ndim - 1)),
                         data, neutral)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_softmax(logits, segment_ids, num_segments, mask=None):
    """Per-destination-segment softmax over edges (for GAT attention).

    logits: [E] or [E, H]; returns same shape, zero on masked lanes.
    """
    m = segment_max(logits, segment_ids, num_segments, mask)
    shifted = logits - m[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(mask.reshape(mask.shape + (1,) * (e.ndim - 1)), e, 0)
    z = segment_sum(e, segment_ids, num_segments, mask)
    z = jnp.maximum(z, jnp.finfo(e.dtype).tiny)
    return e / z[segment_ids]
