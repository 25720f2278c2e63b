"""Sampler correctness tests, modeled on the reference's strategy
(tests/cpp/test_quiver_cpu.cpp:9-75 `is_sample_valid`: sampled neighbors
must be a subset of the true adjacency with correct counts; distributional
checks instead of bit-exact RNG parity, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quiver_tpu import CSRTopo, NeighborSampler, cal_next_prob
from quiver_tpu.ops.unique import SENTINEL


def simple_graph():
    """The reference's synthetic test graph pattern: known neighbor sets."""
    edges = {
        0: [1, 2, 3, 4, 5],
        1: [0, 2],
        2: [0],
        3: [0, 4],
        4: [],
        5: [0, 1, 2, 3, 4],
    }
    row = np.concatenate([np.full(len(v), k) for k, v in edges.items()])
    col = np.concatenate([np.array(v, np.int64) for v in edges.values()])
    return CSRTopo(edge_index=np.stack([row, col]), num_nodes=6), edges


def _check_batch(batch, edges, seeds, sizes):
    n_id = np.asarray(batch.n_id)
    n_count = int(batch.n_count)
    # Seeds first, in order.
    assert n_id[:len(seeds)].tolist() == list(seeds)
    # n_id unique among valid entries; sentinel beyond.
    valid = n_id[:n_count]
    assert len(set(valid.tolist())) == n_count
    assert np.all(n_id[n_count:] == int(SENTINEL))

    # adjs are reversed: adjs[0] is the outermost (last-sampled) block.
    assert len(batch.adjs) == len(sizes)
    for li, adj in enumerate(reversed(batch.adjs)):  # inner -> outer
        k = sizes[li]
        ei = np.asarray(adj.edge_index)
        mask = np.asarray(adj.mask)
        counts = np.asarray(adj.counts)
        src_cnt, dst_cnt = int(counts[0]), int(counts[1])
        assert adj.size[1] >= dst_cnt and adj.size[0] >= src_cnt
        # Per-edge validity: sampled neighbor must be a true neighbor.
        per_row = {}
        for e in np.where(mask)[0]:
            s_local, d_local = int(ei[0, e]), int(ei[1, e])
            assert d_local < dst_cnt and s_local < src_cnt
            g_dst = int(n_id[d_local]) if li == len(sizes) - 1 else None
            per_row.setdefault(d_local, []).append(s_local)
        # count caps: <= k sampled per row (uniform w/o replacement)
        for d, ss in per_row.items():
            assert len(ss) <= k


@pytest.mark.parametrize("mode,reindex", [("TPU", "auto"), ("TPU", "sort"),
                                          ("TPU", "sort2"), ("TPU", "dense"),
                                          ("CPU", "auto")])
def test_sample_subset_validity(mode, reindex):
    topo, edges = simple_graph()
    sizes = [3, 2]
    s = NeighborSampler(topo, sizes, mode=mode, seed=0, dedup="per_hop",
                        reindex=reindex)
    seeds = [0, 5, 4]
    batch = s.sample(seeds)
    n_id = np.asarray(batch.n_id)

    _check_batch(batch, edges, seeds, sizes)

    # Subset validity on every layer: each sampled edge (src,dst) must be a
    # true edge dst->src in the original graph, with correct per-row counts.
    for li, adj in enumerate(reversed(batch.adjs)):  # inner first
        k = sizes[li]
        ei = np.asarray(adj.edge_index)
        mask = np.asarray(adj.mask)
        rows = {}
        for e in np.where(mask)[0]:
            rows.setdefault(int(ei[1, e]), []).append(int(ei[0, e]))
        for d_local, s_locals in rows.items():
            g_dst = int(n_id[d_local])
            true_nbrs = set(edges[g_dst])
            got = [int(n_id[s]) for s in s_locals]
            assert set(got) <= true_nbrs
            expect = min(len(true_nbrs), k)
            assert len(got) == expect, (g_dst, got, true_nbrs)
            # w/o replacement: no duplicate neighbors for one row
            assert len(set(got)) == len(got)
        # rows with deg 0 (node 4) must produce no edges
        for d_local in range(int(adj.counts[1])):
            if int(n_id[d_local]) == 4:
                assert d_local not in rows


def test_sample_uniformity():
    """High-degree row sampled many times -> each neighbor picked ~k/deg."""
    deg, k, trials = 10, 3, 2000
    row = np.full(deg, 0)
    col = np.arange(1, deg + 1)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=deg + 1)
    s = NeighborSampler(topo, [k], mode="TPU", seed=0, dedup="per_hop")
    counts = np.zeros(deg + 1)
    for _ in range(trials):
        b = s.sample([0])
        adj = b.adjs[0]
        ei = np.asarray(b.n_id)[np.asarray(adj.edge_index[0])]
        counts[ei[np.asarray(adj.mask)]] += 1
    freq = counts[1:] / trials
    np.testing.assert_allclose(freq, k / deg, atol=0.05)


def test_weighted_sampling_distribution():
    deg, k, trials = 4, 1, 4000
    row = np.full(deg, 0)
    col = np.arange(1, deg + 1)
    w = np.array([1.0, 1.0, 2.0, 4.0], np.float32)
    topo = CSRTopo(edge_index=np.stack([row, col]), edge_weight=w,
                   num_nodes=deg + 1)
    s = NeighborSampler(topo, [k], mode="TPU", weighted=True, seed=0, dedup="per_hop")
    counts = np.zeros(deg + 1)
    for _ in range(trials):
        b = s.sample([0])
        adj = b.adjs[0]
        gl = np.asarray(b.n_id)[np.asarray(adj.edge_index[0])]
        counts[gl[np.asarray(adj.mask)]] += 1
    freq = counts[1:] / counts.sum()
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.05)


def test_cal_next_prob_matches_bruteforce():
    """Verify the analytic hop-probability against the reference formula
    computed in numpy (cal_next semantics, cuda_random.cu.hpp:72-104)."""
    topo, edges = simple_graph()
    k = 2
    p0 = np.zeros(6, np.float32)
    p0[[0, 5]] = 1.0
    got = np.asarray(cal_next_prob(jnp.asarray(topo.indptr, jnp.int32),
                                   jnp.asarray(topo.indices, jnp.int32),
                                   jnp.asarray(p0), k))
    deg = topo.degree
    expect = np.zeros(6, np.float32)
    for v in range(6):
        if deg[v] == 0:
            continue
        acc = 1.0
        for u in edges[v]:
            du = deg[u]
            if du == 0:
                skip = 1.0
            elif du <= k:
                skip = 1.0 - p0[u]
            else:
                skip = 1.0 - p0[u] * k / du
            acc *= skip
        expect[v] = 1.0 - (1.0 - p0[v]) * acc
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_sample_prob_monotone():
    topo, _ = simple_graph()
    s = NeighborSampler(topo, [2, 2], mode="TPU")
    p = np.asarray(s.sample_prob([0], 6))
    assert p.shape == (6,)
    assert np.all(p >= 0) and np.all(p <= 1)
    assert p[0] > 0  # seeds stay accessed (deg(0) > 0)


def test_large_random_graph_sampling():
    """Random graph: every layer's unique count fits capacity, ids valid."""
    rng = np.random.default_rng(0)
    n, e = 500, 5000
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=n)
    s = NeighborSampler(topo, [5, 3], mode="TPU", seed=1, dedup="per_hop")
    seeds = rng.choice(n, 32, replace=False)
    b = s.sample(seeds)
    n_id = np.asarray(b.n_id)
    n_count = int(b.n_count)
    assert np.all(n_id[:n_count] < n) and np.all(n_id[:n_count] >= 0)
    adj_sets = {v: set(topo.indices[topo.indptr[v]:topo.indptr[v + 1]].tolist())
                for v in range(n)}
    for adj in b.adjs:
        ei = np.asarray(adj.edge_index)
        mask = np.asarray(adj.mask)
        g_src = n_id[ei[0][mask]]
        g_dst = n_id[ei[1][mask]]
        for gs, gd in zip(g_src.tolist(), g_dst.tolist()):
            assert gs in adj_sets[gd]


@pytest.mark.parametrize("mode", ["TPU", "CPU"])
def test_dense_mode_subset_validity(mode):
    """dedup='none' positional contract: lane (i,j) of a block is a true
    neighbor of the i-th frontier row; n_id layout [dst rows | lanes]."""
    topo, edges = simple_graph()
    sizes = [3, 2]
    s = NeighborSampler(topo, sizes, mode=mode, seed=0, dedup="none")
    seeds = [0, 5, 4]
    b = s.sample(seeds)
    n_id = np.asarray(b.n_id)
    assert n_id[:3].tolist() == seeds
    blocks = list(reversed(b.adjs))  # inner -> outer
    F = b.batch_size
    for li, blk in enumerate(blocks):
        k = sizes[li]
        assert blk.size == (F * (1 + k), F)
        mask = np.asarray(blk.mask)
        eid = np.asarray(blk.e_id)
        for i in range(F):
            gid = int(n_id[i])
            # valid dst row iff its id is a real row (masked rows clamp to 0)
            for j in range(k):
                if mask[i, j]:
                    lane_row = F + j * F + i
                    nbr = int(n_id[lane_row])
                    assert nbr in edges[gid]
                    # e_id is the CSR slot of that edge (in the
                    # sampler's possibly row-shuffled layout)
                    sl = int(eid[i, j])
                    lo, hi = topo.indptr[gid], topo.indptr[gid + 1]
                    assert lo <= sl < hi
                    if getattr(s, "shuffle_eid", None) is not None:
                        orig = int(s.shuffle_eid[sl])
                        assert int(topo.indices[orig]) == nbr
                    else:
                        assert int(topo.indices[sl]) == nbr
            # fanout-capped count of valid lanes for real rows
            if gid in edges and i < int(blk.dst_count):
                deg = len(edges[gid])
                expect = min(deg, k) if (li > 0 or i < 3) else None
        F = F * (1 + k)


def test_dense_mode_matches_per_hop_training_math():
    """Full fanout (k >= max degree): dense-mode model output must equal
    per-hop-dedup model output exactly (same params, deterministic)."""
    import jax.numpy as jnp
    from quiver_tpu.models import GraphSAGE

    topo, edges = simple_graph()
    feat = np.eye(6, dtype=np.float32)
    model = GraphSAGE(hidden_features=8, out_features=3, num_layers=2,
                      dropout=0.0)
    outs = {}
    for dd in ("none", "per_hop"):
        s = NeighborSampler(topo, [6, 6], mode="TPU", seed=0, dedup=dd)
        b = s.sample([0, 5])
        x = jnp.asarray(feat)[np.clip(np.asarray(b.n_id), 0, 5)]
        params = outs.get("params")
        if params is None:
            params = model.init(jax.random.PRNGKey(0), x, b.adjs)
            outs["params"] = params
        outs[dd] = np.asarray(model.apply(params, x, b.adjs))[:2]
    np.testing.assert_allclose(outs["none"], outs["per_hop"],
                               rtol=1e-4, atol=1e-5)


def test_window_sampling_uniform_marginals():
    """Window strategy: neighbor marginals are uniform k/deg *averaged
    over row shuffles* (within one shuffle, positions carry a bounded
    edge bias — the documented trade; reshuffle() refreshes it)."""
    deg, k = 12, 3
    n_shuffles, trials = 8, 400
    row = np.full(deg, 0)
    col = np.arange(1, deg + 1)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=deg + 1)
    counts = np.zeros(deg + 1)
    for seed in range(n_shuffles):
        s = NeighborSampler(topo, [k], mode="TPU", seed=seed, dedup="none",
                            sampling="window")
        assert s.sampling == "window"
        for _ in range(trials):
            b = s.sample([0])
            blk = b.adjs[0]
            F = blk.size[1]
            n_id = np.asarray(b.n_id)
            m = np.asarray(blk.mask)[0]
            lanes = n_id[F::F][:k][m[:k]]
            counts[lanes] += 1
    freq = counts[1:] / (n_shuffles * trials)
    np.testing.assert_allclose(freq, k / deg, atol=0.06)


def test_window_reshuffle_changes_layout():
    rng = np.random.default_rng(0)
    row = np.repeat(np.arange(20), 8)
    col = rng.integers(0, 20, 160)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=20)
    s = NeighborSampler(topo, [4], mode="TPU", seed=0, sampling="window")
    before = np.asarray(s.indices[1]).copy()
    s.reshuffle(seed=123)
    after = np.asarray(s.indices[1])
    assert not np.array_equal(before, after)
    # still the same multiset per row
    b = s.sample(np.arange(8))
    blk = b.adjs[0]
    n_id = np.asarray(b.n_id)
    F, k = blk.size[1], blk.fanout
    mask = np.asarray(blk.mask)
    for i in range(8):
        gid = int(n_id[i])
        true_nbrs = set(topo.indices[topo.indptr[gid]:topo.indptr[gid+1]].tolist())
        got = [int(n_id[F + j*F + i]) for j in range(k) if mask[i, j]]
        assert set(got) <= true_nbrs


def test_window_vs_exact_same_contract():
    """Both strategies produce valid neighbors with min(deg,k) lanes."""
    topo, edges = simple_graph()
    for strat in ("window", "exact"):
        s = NeighborSampler(topo, [3], mode="TPU", seed=1, dedup="none",
                            sampling=strat)
        b = s.sample([0, 5, 4, 2])
        n_id = np.asarray(b.n_id)
        blk = b.adjs[0]
        F, k = blk.size[1], blk.fanout
        mask = np.asarray(blk.mask)
        for i in range(4):
            gid = int(n_id[i])
            got = [int(n_id[F + j * F + i]) for j in range(k) if mask[i, j]]
            assert len(got) == min(len(edges[gid]), k), (strat, gid, got)
            assert set(got) <= set(edges[gid]), (strat, gid, got)
            # window without replacement within a draw
            assert len(set(got)) == len(got)


def test_weighted_alias_distribution_dense():
    """Alias-table weighted sampling (dense mode) matches edge weights."""
    deg, k, trials = 5, 2, 3000
    row = np.full(deg, 0)
    col = np.arange(1, deg + 1)
    w = np.array([1.0, 2.0, 3.0, 6.0, 0.5], np.float32)
    topo = CSRTopo(edge_index=np.stack([row, col]), edge_weight=w,
                   num_nodes=deg + 1)
    s = NeighborSampler(topo, [k], mode="TPU", weighted=True, seed=0,
                        dedup="none")
    counts = np.zeros(deg + 1)
    for _ in range(trials):
        b = s.sample([0])
        blk = b.adjs[0]
        F = blk.size[1]
        n_id = np.asarray(b.n_id)
        m = np.asarray(blk.mask)[0]
        np.add.at(counts, n_id[F::F][:k][m[:k]], 1)  # count repeats!
    freq = counts[1:] / counts.sum()
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.04)


@pytest.mark.parametrize("strat", ["packed"])
def test_packed_sampling_contract(strat):
    """Packed triple layout: valid neighbors, min(deg,k) counts, correct
    slots, and lanes carry consistent (start, deg) for the next hop
    (verified implicitly by 2-hop validity)."""
    topo, edges = simple_graph()
    s = NeighborSampler(topo, [3, 2], mode="TPU", seed=0, dedup="none",
                        sampling=strat)
    assert s.sampling == strat
    b = s.sample([0, 5, 4])
    n_id = np.asarray(b.n_id)
    assert n_id[:3].tolist() == [0, 5, 4]
    blocks = list(reversed(b.adjs))
    F = b.batch_size
    for li, blk in enumerate(blocks):
        k = blk.fanout
        mask = np.asarray(blk.mask)
        eid = np.asarray(blk.e_id)
        for i in range(F):
            gid = int(n_id[i])
            if gid not in edges:
                continue
            got = [int(n_id[F + j * F + i]) for j in range(k) if mask[i, j]]
            assert set(got) <= set(edges[gid]), (li, gid, got)
            if li == 0 and i < 3:
                assert len(got) == min(len(edges[gid]), k)
            for j in range(k):
                if mask[i, j]:
                    sl = int(eid[i, j])
                    lo, hi = topo.indptr[gid], topo.indptr[gid + 1]
                    assert lo <= sl < hi
        F = F * (1 + k)


def test_packed_uniform_marginals_over_shuffles():
    deg, k = 12, 3
    n_shuffles, trials = 16, 250
    row = np.full(deg, 0)
    col = np.arange(1, deg + 1)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=deg + 1)
    counts = np.zeros(deg + 1)
    for seed in range(n_shuffles):
        s = NeighborSampler(topo, [k], mode="TPU", seed=seed, dedup="none",
                            sampling="packed")
        for _ in range(trials):
            b = s.sample([0])
            blk = b.adjs[0]
            F = blk.size[1]
            n_id = np.asarray(b.n_id)
            m = np.asarray(blk.mask)[0]
            np.add.at(counts, n_id[F::F][:k][m[:k]], 1)
    freq = counts[1:] / (n_shuffles * trials)
    np.testing.assert_allclose(freq, k / deg, atol=0.07)


def test_weighted_cdf_matches_alias_distribution():
    """The inverse-CDF path (``weighted_sample_adjacency``, the direct
    parity impl of reference weight_sample cuda_random.cu.hpp:179-221)
    draws from the same per-row distribution as the production alias
    path — both must match the normalized edge weights."""
    from quiver_tpu.sampling.kernels import (
        weighted_sample_adjacency, weighted_sample_alias,
        build_row_cdf, build_alias_table)

    deg = 6
    row = np.full(deg, 0)
    col = np.arange(1, deg + 1)
    w = np.array([1.0, 4.0, 2.0, 8.0, 0.5, 2.5], np.float32)
    topo = CSRTopo(edge_index=np.stack([row, col]), edge_weight=w,
                   num_nodes=deg + 1)
    indptr = jnp.asarray(topo.indptr, jnp.int32)
    indices = jnp.asarray(topo.indices, jnp.int32)
    cdf = jnp.asarray(build_row_cdf(topo.indptr, topo.edge_weight))
    alias = jnp.asarray(build_alias_table(topo.indptr, topo.edge_weight))
    n, k = 256, 4
    frontier = jnp.zeros((n,), jnp.int32)
    valid = jnp.ones((n,), bool)

    counts = {"cdf": np.zeros(deg + 1), "alias": np.zeros(deg + 1)}
    for t in range(20):
        key = jax.random.PRNGKey(t)
        for name, fn, table in (("cdf", weighted_sample_adjacency, cdf),
                                ("alias", weighted_sample_alias, alias)):
            nbr, mask, _ = fn(indptr, indices, table, frontier, valid, k, key)
            np.add.at(counts[name], np.asarray(nbr)[np.asarray(mask)], 1)

    expect = w / w.sum()
    for name in counts:
        freq = counts[name][1:] / counts[name].sum()
        np.testing.assert_allclose(freq, expect, atol=0.02, err_msg=name)


def test_window_vs_exact_planted_community_accuracy():
    """Accuracy A/B on a planted 2-community graph (VERDICT r1 #8): a
    1-layer SAGE trained with window sampling (with per-epoch
    reshuffle) must classify within noise of one trained with exact
    k-subset sampling — the window family's fixed-shuffle bias must not
    cost accuracy when reshuffled."""
    import jax
    import optax
    import flax.linen as nn
    from quiver_tpu.models import SAGEConv

    rng = np.random.default_rng(0)
    n, deg, d = 400, 12, 8
    comm = (np.arange(n) >= n // 2).astype(np.int32)
    # SBM-ish: 85% intra-community edges
    rows = np.repeat(np.arange(n), deg)
    intra = rng.random(n * deg) < 0.85
    cols = np.where(
        intra ^ (comm[rows] == 1),
        rng.integers(n // 2, n, n * deg),   # community 1 targets
        rng.integers(0, n // 2, n * deg))   # community 0 targets
    topo = CSRTopo(edge_index=np.stack([rows, cols]), num_nodes=n)
    # noisy node features: community signal + noise
    feat = (comm[:, None] * 1.0 + rng.normal(0, 2.0, (n, d))).astype(
        np.float32)

    def train_eval(sampling):
        s = NeighborSampler(topo, [5], mode="TPU", seed=3, dedup="none",
                            sampling=sampling)
        model = SAGEConv(2)
        tx = optax.adam(5e-2)
        b0 = s.sample(np.arange(64))
        x0 = jnp.asarray(feat)[jnp.clip(b0.n_id, 0, n - 1)]
        params = model.init(jax.random.PRNGKey(0), x0, b0.adjs[0])
        opt = tx.init(params)

        @jax.jit
        def step(p, o, x, adj, y):
            def lf(p):
                lg = model.apply(p, x, adj)[:64]
                return optax.softmax_cross_entropy_with_integer_labels(
                    lg, y).mean()
            l, g = jax.value_and_grad(lf)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        order = rng.permutation(n)
        for epoch in range(3):
            if epoch:
                s.reshuffle(seed=epoch)
            for i in range(0, n - 64 + 1, 64):
                seeds = order[i:i + 64]
                b = s.sample(seeds)
                x = jnp.asarray(feat)[jnp.clip(b.n_id, 0, n - 1)]
                y = jnp.asarray(comm[seeds])
                params, opt, _ = step(params, opt, x, b.adjs[0], y)
        # eval on all nodes
        correct = 0
        for i in range(0, n, 64):
            seeds = np.arange(i, min(i + 64, n))
            b = s.sample(seeds)
            x = jnp.asarray(feat)[jnp.clip(b.n_id, 0, n - 1)]
            lg = model.apply(params, x, b.adjs[0])[:len(seeds)]
            correct += int((np.asarray(lg.argmax(-1)) == comm[seeds]).sum())
        return correct / n

    acc_exact = train_eval("exact")
    acc_window = train_eval("window")
    assert acc_exact > 0.8, acc_exact          # the task is learnable
    assert acc_window > acc_exact - 0.06, (acc_window, acc_exact)


def test_block_exact_sampler_contract():
    """The block-exact layout (one row gather per small-degree row,
    capacity-bounded scattered fallback for hubs — kernels.py
    sample_adjacency_block) draws the same uniform k-subsets as the meta
    path: subset validity, counts, and no-replacement all hold through
    the full per-hop-dedup pipeline."""
    topo, edges = simple_graph()
    sizes = [3, 2]
    # lanes=18 -> body 16 covers every row here (forced small path);
    # the simple graph's degrees are <= 5.
    s = NeighborSampler(topo, sizes, mode="TPU", seed=0, dedup="per_hop",
                        block_lanes=18)
    assert s.indices[0].shape[1] == 18
    seeds = [0, 5, 4]
    batch = s.sample(seeds)
    _check_batch(batch, edges, seeds, sizes)
    n_id = np.asarray(batch.n_id)
    for li, adj in enumerate(reversed(batch.adjs)):
        k = sizes[li]
        ei = np.asarray(adj.edge_index)
        mask = np.asarray(adj.mask)
        rows = {}
        for e in np.where(mask)[0]:
            rows.setdefault(int(ei[1, e]), []).append(int(ei[0, e]))
        for d_local, s_locals in rows.items():
            g_dst = int(n_id[d_local])
            got = [int(n_id[x]) for x in s_locals]
            assert set(got) <= set(edges[g_dst])
            assert len(got) == min(len(edges[g_dst]), k)
            assert len(set(got)) == len(got)


def test_block_exact_big_row_fallback_and_overflow():
    """Rows with deg > lanes-2 go through the scattered fallback and stay
    exactly uniform; rows beyond big_cap are masked out (undersampled,
    never wrong) — the same capacity contract as the reindex buffers."""
    from quiver_tpu.sampling.kernels import (build_block_layout,
                                             sample_adjacency_block)
    rng = np.random.default_rng(0)
    V, W, k = 64, 24, 5
    deg = rng.integers(1, 80, V)            # many rows exceed W-2=22
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1])).astype(np.int32)
    blk = build_block_layout(indptr, indices, W)

    f = np.arange(V, dtype=np.int32)
    valid = np.ones(V, bool)
    n_big = int((deg > W - 2).sum())
    nbr, mask, slot = sample_adjacency_block(
        jnp.asarray(blk), jnp.asarray(indices), jnp.asarray(f),
        jnp.asarray(valid), k, jax.random.PRNGKey(1), big_cap=V)
    nbr, mask, slot = map(np.asarray, (nbr, mask, slot))
    for v in range(V):
        take = min(deg[v], k)
        assert mask[v].sum() == take
        s = slot[v][mask[v]]
        assert (s >= indptr[v]).all() and (s < indptr[v + 1]).all()
        assert len(set(s.tolist())) == len(s)
        assert (indices[s] == nbr[v][mask[v]]).all()

    # Overflow: big_cap smaller than the number of big rows -> exactly
    # big_cap big rows are served, the rest fully masked; small rows
    # are never affected.
    cap = max(1, n_big // 2)
    _, mask2, _ = sample_adjacency_block(
        jnp.asarray(blk), jnp.asarray(indices), jnp.asarray(f),
        jnp.asarray(valid), k, jax.random.PRNGKey(2), big_cap=cap)
    mask2 = np.asarray(mask2)
    big = deg > W - 2
    served = mask2[big].any(axis=1).sum()
    assert served == cap
    assert (mask2[~big].sum(axis=1) == np.minimum(deg[~big], k)).all()

    # Distribution: a single big row sampled many times has uniform
    # per-neighbor marginals (chi-square within 4 sigma).
    d = 60
    ip = np.array([0, d], np.int64)
    ind = np.arange(d, dtype=np.int32)
    b = build_block_layout(ip, ind, W)
    T = 20000
    nb, mk, _ = sample_adjacency_block(
        jnp.asarray(b), jnp.asarray(ind), jnp.zeros(T, jnp.int32),
        jnp.ones(T, bool), k, jax.random.PRNGKey(3), big_cap=T)
    hits = np.bincount(np.asarray(nb)[np.asarray(mk)], minlength=d)
    expect = T * k / d
    chi2 = ((hits - expect) ** 2 / expect).sum()
    assert abs(chi2 - (d - 1)) < 4 * np.sqrt(2 * (d - 1)), chi2


@pytest.mark.parametrize("dedup", ["none", "per_hop"])
def test_sample_many_matches_per_batch_contract(dedup):
    """sample_many stacks n independent batches in one dispatch; each
    at_batch view must satisfy the same invariants as sample() output
    (and distinct rows must produce distinct samples)."""
    rng = np.random.default_rng(0)
    row = rng.integers(0, 500, 8000)
    col = rng.integers(0, 500, 8000)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=500)
    adj = {v: set(col[row == v].tolist()) for v in range(500)}
    s = NeighborSampler(topo, [4, 3], mode="TPU", dedup=dedup, seed=3)
    seeds2d = np.stack([rng.choice(500, 32, replace=False)
                        for _ in range(5)])
    st = s.sample_many(seeds2d)
    assert st.n_id.shape[0] == 5
    edge_sets = []
    for i in range(5):
        b = st.at_batch(i)
        n_id = np.asarray(b.n_id)
        nc = int(b.n_count)
        if dedup == "per_hop":
            valid = n_id[:nc]
            assert len(set(valid.tolist())) == nc
            assert (valid[:32] == seeds2d[i]).all()
        # subset validity on every block
        for a in b.adjs:
            m = np.asarray(a.mask)
            assert m.any()
            if dedup == "per_hop":
                ei = np.asarray(a.edge_index)
                src_g = n_id[ei[0][m]]
                dst_g = n_id[ei[1][m]]
                for sg, dg in zip(src_g.tolist(), dst_g.tolist()):
                    assert sg in adj[dg]
        edge_sets.append(np.asarray(b.adjs[0].e_id)[
            np.asarray(b.adjs[0].mask)].tobytes())
    assert len(set(edge_sets)) > 1  # rows are independent draws


def test_sample_many_vmap_method():
    """method='vmap' (the throughput mode of the stream-pool analogue):
    same contract as scan — per-batch subset validity against the true
    adjacency, independent draws across rows; per-hop-dedup rejects it."""
    rng = np.random.default_rng(4)
    row = rng.integers(0, 300, 4000)
    col = rng.integers(0, 300, 4000)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=300)
    adj = {v: set(col[row == v].tolist()) for v in range(300)}
    s = NeighborSampler(topo, [4, 3], mode="TPU", dedup="none", seed=3,
                        sampling="exact")
    seeds2d = np.stack([rng.choice(300, 32, replace=False)
                        for _ in range(4)])
    st = s.sample_many(seeds2d, method="vmap")
    assert st.n_id.shape[0] == 4
    edge_sets = []
    for i in range(4):
        b = st.at_batch(i)
        n_id = np.asarray(b.n_id)
        for a in b.adjs:
            m = np.asarray(a.mask)
            assert m.any()
            F = a.size[1]
            k = a.fanout
            for r, j in zip(*np.nonzero(m)):
                v = int(n_id[r])
                nb = int(n_id[F + j * F + r])   # lane-major layout
                assert nb in adj[v], (i, r, j, v, nb)
        edge_sets.append(np.asarray(b.adjs[0].e_id)[
            np.asarray(b.adjs[0].mask)].tobytes())
    assert len(set(edge_sets)) > 1

    strict = NeighborSampler(topo, [3], mode="TPU", dedup="per_hop")
    with pytest.raises(ValueError):
        strict.sample_many(seeds2d, method="vmap")
    with pytest.raises(ValueError):
        s.sample_many(seeds2d, method="nope")


def test_fused_pallas_block_sampler_contract():
    """Interpret-mode contract of the fused Pallas block sampler
    (sampling/pallas_sampler.py) against the CSR ground truth: subset
    validity, per-row counts, distinct slots, big-row fallback."""
    from quiver_tpu.sampling.kernels import build_block_layout
    from quiver_tpu.sampling.pallas_sampler import (
        sample_adjacency_block_fused)

    rng = np.random.default_rng(0)
    V, W, k = 500, 32, 5
    deg = np.maximum(rng.pareto(1.2, V).astype(np.int64), 1)
    deg[::50] = 100                      # big rows (> W-2)
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1])).astype(np.int32)
    blk = jnp.asarray(build_block_layout(indptr, indices, W))
    N = 256
    frontier = rng.integers(0, V, N).astype(np.int32)
    fv = rng.random(N) < 0.9
    nbr, mask, slot = sample_adjacency_block_fused(
        blk, jnp.asarray(indices), jnp.asarray(frontier), jnp.asarray(fv),
        k, jax.random.PRNGKey(3), big_cap=64, interpret=True)
    nbr, mask, slot = map(np.asarray, (nbr, mask, slot))
    for i in range(N):
        d = int(indptr[frontier[i] + 1] - indptr[frontier[i]]) \
            if fv[i] else 0
        got = int(mask[i].sum())
        assert got in (min(d, k), 0)     # 0 only on big-row overflow
        if got:
            s0, s1 = int(indptr[frontier[i]]), int(indptr[frontier[i] + 1])
            sl = slot[i][mask[i]]
            assert (sl >= s0).all() and (sl < s1).all()
            assert len(set(sl.tolist())) == len(sl)
            assert (nbr[i][mask[i]] == indices[sl]).all()


def test_fused_pallas_block_sampler_uniform():
    """Uniform per-neighbor marginals (chi-square within 4 sigma) for
    the fused kernel on a fixed-degree row."""
    from quiver_tpu.sampling.kernels import build_block_layout
    from quiver_tpu.sampling.pallas_sampler import (
        sample_adjacency_block_fused)

    d, W, k, T = 20, 32, 5, 4000
    ip = np.array([0, d], np.int64)
    ind = np.arange(d, dtype=np.int32)
    blk = jnp.asarray(build_block_layout(ip, ind, W))
    nb, mk, _ = sample_adjacency_block_fused(
        blk, jnp.asarray(ind), jnp.zeros(T, jnp.int32),
        jnp.ones(T, bool), k, jax.random.PRNGKey(7), big_cap=T,
        interpret=True)
    hits = np.bincount(np.asarray(nb)[np.asarray(mk)], minlength=d)
    expect = T * k / d
    chi2 = ((hits - expect) ** 2 / expect).sum()
    assert chi2 < d - 1 + 4 * np.sqrt(2 * (d - 1)), chi2


def test_weighted_alias_packed_neighbors_match_legacy():
    """[E, 4] packed alias layout (neighbor ids ride the table, one
    gather per draw) must produce IDENTICAL samples to the legacy
    [E, 2] layout under the same key, including degree-0 rows."""
    from quiver_tpu.sampling.kernels import (weighted_sample_alias,
                                             build_alias_table)

    rng = np.random.default_rng(8)
    V = 300
    deg = rng.integers(0, 9, V)
    deg[5] = 0
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    E = int(indptr[-1])
    indices = rng.integers(0, V, E).astype(np.int64)
    w = (rng.random(E) + 0.1).astype(np.float32)
    t2 = jnp.asarray(build_alias_table(indptr, w))
    t4 = jnp.asarray(build_alias_table(indptr, w, indices))
    ip = jnp.asarray(indptr, jnp.int32)
    idx = jnp.asarray(indices, jnp.int32)
    frontier = jnp.asarray(rng.integers(0, V, 128).astype(np.int32))
    valid = jnp.asarray(rng.random(128) < 0.9)
    key = jax.random.PRNGKey(9)
    n2, m2, s2 = weighted_sample_alias(ip, idx, t2, frontier, valid, 4, key)
    n4, m4, s4 = weighted_sample_alias(ip, idx, t4, frontier, valid, 4, key)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m4))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s4))
    m = np.asarray(m2)
    np.testing.assert_array_equal(np.asarray(n2)[m], np.asarray(n4)[m])
    assert (np.asarray(n4)[~m] == 0).all()


def test_dgl_block_data_adapter():
    """dgl_compat.to_block_data: per-layer block construction data is
    ground-truth valid for BOTH pipelines — every emitted edge's global
    (src, dst) pair is a true graph edge, local ids are in range, and
    layer ordering matches adjs (outermost first)."""
    from quiver_tpu import dgl_compat

    rng = np.random.default_rng(11)
    n = 200
    row = rng.integers(0, n, 3000)
    col = rng.integers(0, n, 3000)
    topo = CSRTopo(edge_index=np.stack([row, col]), num_nodes=n)
    adj = {v: set(col[row == v].tolist()) for v in range(n)}
    indices = np.asarray(topo.indices)

    # sampling="exact" keeps e_id = original CSR slot (window mode's
    # slots index the shuffled layout; see dgl_compat docstring)
    for dedup in ("none", "per_hop"):
        s = NeighborSampler(topo, [4, 3], mode="TPU", dedup=dedup, seed=2,
                            sampling="exact")
        b = s.sample(rng.choice(n, 32, replace=False))
        blocks = dgl_compat.to_block_data(b)
        assert len(blocks) == 2
        # outermost first: first block's dst space is the wider one
        assert blocks[0]["num_dst"] >= blocks[1]["num_dst"]
        for bd in blocks:
            assert bd["edge_src"].shape == bd["edge_dst"].shape \
                == bd["eid"].shape
            assert bd["edge_src"].size > 0
            assert (bd["edge_src"] < bd["num_src"]).all()
            assert (bd["edge_dst"] < bd["num_dst"]).all()
            src_g = bd["src_ids"][bd["edge_src"]]
            dst_g = bd["dst_ids"][bd["edge_dst"]]
            for sg, dg, eid in zip(src_g.tolist(), dst_g.tolist(),
                                   bd["eid"].tolist()):
                assert sg in adj[dg], (dedup, sg, dg)
                assert int(indices[eid]) == sg   # eid -> CSR slot
