"""Device-time measurement helpers for the axon-tunneled TPU.

Two environment hazards make naive timing wrong here (round-2 numbers
were polluted by both):

1. ``jax.block_until_ready`` returns before device completion on this
   transport; the only reliable barrier is a dependent scalar
   device->host read (``force``) — which itself costs a ~30 ms tunnel
   round trip (``rtt``).
2. Back-to-back identical dispatches (same executable, same argument
   values) can be served without re-execution, so "call f(x) N times
   and force the last" can undercount arbitrarily.

The robust pattern is ``chain_time``: run N iterations INSIDE one jit
via ``lax.fori_loop``, perturbing the input with a carry-dependent
zero so every iteration depends on the previous one, then subtract one
``rtt`` from the wall time. This measures pure device time.

Two further hazards (both hit in round 3):

3. The perturbation ``x + (s*0)`` is free ONLY when the consumer can
   fuse it (elementwise/reduce). A pallas_call or gather consumer
   forces XLA to MATERIALIZE the perturbed copy — for a 553 MB operand
   that's ~1.6 ms/iter of phantom traffic. Fix: pass the SMALLEST
   input that forces re-execution as the chained (first) argument
   (e.g. the [k, F] mask, not the [F*(1+k), D] features).
4. The chained argument must be a FLOAT array: for bools/ints XLA
   folds ``or(x, false)`` / ``add(x, 0)`` away, the loop body becomes
   loop-invariant, and LICM hoists the whole computation out — the
   "measurement" then reads one execution divided by N. chain_time
   rejects non-float chained args for this reason.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

_RTT = None


def force(r):
    """Barrier: dependent scalar device->host read."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]))


def rtt() -> float:
    """One force() round-trip cost (measured once, cached)."""
    global _RTT
    if _RTT is None:
        y = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda a: a + 1.0)
        force(f(y))
        t0 = time.time()
        for _ in range(10):
            force(f(y))
        _RTT = (time.time() - t0) / 10
    return _RTT


def chain_time(fn, x, *rest, iters: int = 16, out_like=None) -> float:
    """Per-iteration device time of ``fn(x, *rest)``.

    ``fn`` must be jit-traceable; ``x`` a FLOAT array input that the
    output depends on — pass the smallest such input first (see module
    docstring hazards 3 and 4). Each loop iteration perturbs ``x`` by a
    carry-dependent zero, defeating both dispatch-result caching and
    loop-invariant hoisting.
    """
    if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        raise TypeError(
            "chain_time's chained arg must be float (bool/int perturbations "
            f"constant-fold and the loop body hoists); got {x.dtype}")
    if out_like is None:
        out_like = jax.eval_shape(fn, x, *rest)
    out0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), out_like)

    @jax.jit
    def run(x, *rest):
        def body(i, carry):
            s, _ = carry
            x2 = x + (s * 0).astype(x.dtype)
            o = fn(x2, *rest)
            leaf = jax.tree_util.tree_leaves(o)[0]
            return (jnp.ravel(leaf)[:1].astype(jnp.float32).sum(), o)
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), out0))

    r = run(x, *rest)
    force(r)
    t0 = time.time()
    r = run(x, *rest)
    force(r)
    return max((time.time() - t0 - rtt()) / iters, 1e-9)
