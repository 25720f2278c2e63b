"""Fused sample -> gather -> forward/backward training step.

The reference pipeline is host-orchestrated: python loop calls the
sampler kernel, then the feature kernel, then torch autograd
(examples/pyg/reddit_quiver.py:116-123). On TPU the idiomatic shape is
ONE jitted program per step — XLA overlaps the feature gather with
compute, there is a single host->device seed transfer and a single
dispatch per step, and the whole loop is compiler-scheduled.

Works with the dense positional pipeline (``dedup='none'``).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sampling.sampler import (DenseBlock, _sample_layers_dense,
                               NeighborSampler)

__all__ = ["make_sampled_train_step", "make_pipelined_train_step",
           "make_feature_train_step"]


def make_sampled_train_step(model, tx, sampler: NeighborSampler,
                            features, labels, loss_fn=None):
    """Build ``step(params, opt_state, seeds, key) -> (params, opt_state,
    loss, logits)`` fusing sampling, feature gather, forward and backward
    into one XLA program.

    Args:
      model: flax module taking ``(x, adjs)``.
      tx: optax optimizer.
      sampler: a dense-mode ``NeighborSampler`` (TPU backend); its graph
        buffers are closed over as jit constants-by-reference (donated
        arguments would also work — they are read-only).
      features: [V, D] device array.
      labels: [V] int device array.
      loss_fn: optional (logits, y) -> scalar; defaults to softmax CE.
    """
    import optax

    if sampler.dedup != "none" or sampler.mode != "TPU":
        raise ValueError("fused step needs a TPU dense-mode sampler")
    if loss_fn is None:
        def loss_fn(logits, y):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

    sizes = sampler.sizes
    window = sampler.sampling == "window"
    V = features.shape[0]

    @functools.partial(jax.jit, static_argnames=("batch_size",))
    def step(params, opt_state, indptr, indices, edge_table, features, labels,
             seeds, key, *, batch_size):
        frontier, f_valid, layer_outs = _sample_layers_dense(
            indptr, indices, edge_table, seeds, jnp.int32(batch_size), key,
            sizes=sizes, batch_size=batch_size,
            weighted=sampler.weighted, window=window)
        blocks = []
        f_cap = batch_size
        for li, (mask, slot, dst_count) in enumerate(layer_outs):
            k = sizes[li]
            blocks.append(DenseBlock(mask=mask, e_id=slot,
                                     dst_count=dst_count,
                                     size=(f_cap * (1 + k), f_cap),
                                     fanout=k))
            f_cap = f_cap * (1 + k)
        adjs = tuple(reversed(blocks))
        x = jnp.take(features, jnp.clip(frontier, 0, V - 1), axis=0)
        y = jnp.take(labels, seeds, axis=0)

        def compute_loss(p):
            logits = model.apply(p, x, adjs)[: batch_size]
            return loss_fn(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    def run(params, opt_state, seeds, key):
        seeds = jnp.asarray(np.asarray(seeds), jnp.int32)
        return step(params, opt_state, sampler.indptr, sampler.indices,
                    sampler.edge_table, features, labels, seeds, key,
                    batch_size=int(seeds.shape[0]))

    return run


def make_feature_train_step(model, tx, sampler: NeighborSampler,
                            feature, labels, loss_fn=None):
    """Training step whose feature table lives in a tiered ``Feature``
    (table larger than HBM: hot rows on device, cold rows in host RAM /
    mmap — the capability the reference gets from pinned-CPU
    ShardTensor shards, shard_tensor.cu.hpp:19-61).

    Three phases per step, overlap-friendly:
      1. device sampling program (async dispatch);
      2. tiered gather through ``feature[n_id]`` — hot rows never leave
         the device, cold rows ride one host->device scatter, and the
         host-side gather for the NEXT batch can be overlapped via
         ``feature.prefetch``;
      3. one jitted fwd/bwd program.

    Works with any sampler mode/dedup. ``labels`` stays host-side (only
    the batch's labels are shipped). Returns ``step(params, opt_state,
    seeds, key) -> (params, opt_state, loss, logits)`` plus the sampled
    batch via ``step.last_batch`` for inspection.
    """
    import optax

    if loss_fn is None:
        def loss_fn(logits, y):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

    labels = np.asarray(labels)

    @jax.jit
    def train(params, opt_state, x, adjs, y, nb):
        def compute_loss(p):
            logits = model.apply(p, x, adjs)[: y.shape[0]]
            return loss_fn(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    def run(params, opt_state, seeds, key=None):
        seeds = np.asarray(seeds)
        b = sampler.sample(seeds)
        n_id = np.asarray(b.n_id)
        x = feature[n_id]
        y = jnp.asarray(labels[seeds])
        run.last_batch = b
        return train(params, opt_state, x, b.adjs, y, b.n_count)

    run.last_batch = None
    return run


def make_pipelined_train_step(model, tx, sampler: NeighborSampler,
                              features, labels, loss_fn=None):
    """Software-pipelined variant: ONE program trains on batch t while
    sampling batch t+1, so the sampler's gather traffic overlaps the
    model's MXU work (XLA schedules the independent halves).

    Returns ``(prime, step)``:
      carry = prime(seeds0, key)                    # sample first batch
      params, opt, loss, carry = step(params, opt, carry, next_seeds, key)
    The loss returned by call t is for the batch sampled at call t-1.
    On the final call pass any seeds (e.g. the same) and discard carry.
    """
    import optax

    if sampler.dedup != "none" or sampler.mode != "TPU":
        raise ValueError("pipelined step needs a TPU dense-mode sampler")
    if loss_fn is None:
        def loss_fn(logits, y):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

    sizes = sampler.sizes
    window = sampler.sampling == "window"
    V = features.shape[0]

    def _sample(indptr, indices, edge_table, seeds, key, batch_size):
        frontier, f_valid, layer_outs = _sample_layers_dense(
            indptr, indices, edge_table, seeds, jnp.int32(batch_size), key,
            sizes=sizes, batch_size=batch_size,
            weighted=sampler.weighted, window=window)
        return dict(frontier=frontier, seeds=seeds,
                    masks=tuple(m for m, _, _ in layer_outs),
                    slots=tuple(s for _, s, _ in layer_outs),
                    counts=tuple(c for _, _, c in layer_outs))

    def _blocks(carry, batch_size):
        blocks = []
        f_cap = batch_size
        for li, k in enumerate(sizes):
            blocks.append(DenseBlock(
                mask=carry["masks"][li], e_id=carry["slots"][li],
                dst_count=carry["counts"][li],
                size=(f_cap * (1 + k), f_cap), fanout=k))
            f_cap = f_cap * (1 + k)
        return tuple(reversed(blocks))

    @functools.partial(jax.jit, static_argnames=("batch_size",))
    def prime_fn(indptr, indices, edge_table, seeds, key, *, batch_size):
        return _sample(indptr, indices, edge_table, seeds, key, batch_size)

    @functools.partial(jax.jit, static_argnames=("batch_size",))
    def step_fn(params, opt_state, indptr, indices, edge_table, features,
                labels, carry, next_seeds, key, *, batch_size):
        # train on the carried batch ...
        adjs = _blocks(carry, batch_size)
        x = jnp.take(features, jnp.clip(carry["frontier"], 0, V - 1), axis=0)
        y = jnp.take(labels, carry["seeds"], axis=0)

        def compute_loss(p):
            logits = model.apply(p, x, adjs)[: batch_size]
            return loss_fn(logits, y)

        loss, grads = jax.value_and_grad(compute_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # ... while sampling the next one (independent -> overlapped)
        new_carry = _sample(indptr, indices, edge_table, next_seeds, key,
                            batch_size)
        return params, opt_state, loss, new_carry

    def prime(seeds, key):
        seeds = jnp.asarray(np.asarray(seeds), jnp.int32)
        return prime_fn(sampler.indptr, sampler.indices, sampler.edge_table,
                        seeds, key, batch_size=int(seeds.shape[0]))

    def step(params, opt_state, carry, next_seeds, key):
        next_seeds = jnp.asarray(np.asarray(next_seeds), jnp.int32)
        return step_fn(params, opt_state, sampler.indptr, sampler.indices,
                       sampler.edge_table, features, labels, carry, next_seeds,
                       key, batch_size=int(next_seeds.shape[0]))

    return prime, step
