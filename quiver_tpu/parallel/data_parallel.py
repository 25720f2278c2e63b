"""Data-parallel training over a device mesh (the PyTorch-DDP analogue).

The reference delegates gradient data-parallelism to DDP over NCCL with
one process per GPU and IPC-shared samplers/features (SURVEY.md §2.4,
examples/multi_gpu/pyg/ogb-products/dist_sampling_ogb_products_quiver.py:85-134).
On TPU one process drives all chips: per-device sampled batches are
stacked on a leading axis, ``shard_map`` runs the per-device step, and
gradients ride ICI through ``psum``/``pmean`` — no process groups, no
IPC, no NCCL bootstrap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def stack_batches(batches):
    """Stack per-device pytrees (e.g. SampledBatch) on a new leading axis.

    Static metadata (Adj/DenseBlock sizes) must match across devices —
    use one padded batch size so shapes agree.
    """
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *batches)


def unstack_device(tree):
    """Inside shard_map: drop this device's leading axis of size 1."""
    return jax.tree.map(lambda x: x[0], tree)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_leading(tree, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading axis over the named mesh axis."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))


def make_dp_train_step(model, tx, mesh: Mesh, axis: str = "data",
                       loss_fn=None):
    """Build a jitted data-parallel train step.

    The returned ``step(params, opt_state, x, adjs, y)`` expects:
      * ``params`` / ``opt_state`` replicated,
      * ``x``    [n_dev, rows, D]  (features of each device's batch),
      * ``adjs`` stacked blocks (``stack_batches`` of ``batch.adjs``),
      * ``y``    [n_dev, bs] int labels for each device's seeds.

    Loss defaults to masked softmax cross-entropy over the seed rows;
    gradients are ``pmean``-ed over the mesh axis (ICI all-reduce) and
    the optimizer update is applied identically on every device.
    """
    import optax

    if loss_fn is None:
        def loss_fn(logits, y):
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

    def per_device(params, opt_state, x, adjs, y):
        x, adjs, y = unstack_device((x, adjs, y))

        def compute_loss(p):
            logits = model.apply(p, x, adjs)[: y.shape[0]]
            return loss_fn(logits, y)

        loss, grads = jax.value_and_grad(compute_loss)(params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(step)
