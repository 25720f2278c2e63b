"""Unit tests for the static-shape ops (union/reindex, segment reductions,
gather) — the analogue of the reference's reindex/permutation property
tests (tests/cpp/test_reindex.cu) and gather ground-truth checks
(tests/python/cuda/test_shard_tensor.py:44-80)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quiver_tpu.ops import (
    union_reindex,
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    gather_rows,
)
from quiver_tpu.ops.unique import SENTINEL


def _np_union(base, cand):
    """First-occurrence-ordered union oracle."""
    out, local = list(base), {g: i for i, g in enumerate(base)}
    cl = []
    for g in cand:
        if g not in local:
            local[g] = len(out)
            out.append(g)
        cl.append(local[g])
    return out, cl


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_union_reindex_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    base = rng.choice(1000, size=6, replace=False).astype(np.int32)
    cand = rng.integers(0, 1000, size=40).astype(np.int32)
    cand[5:8] = base[1]  # force duplicates of a base id
    valid = rng.random(40) > 0.2
    cap = 64

    out_ids, out_count, cand_local, cand_ok = jax.jit(
        union_reindex, static_argnames="capacity")(
            jnp.asarray(base), jnp.int32(6), jnp.asarray(cand),
            jnp.asarray(valid), capacity=cap)

    oracle_out, oracle_local = _np_union(base.tolist(),
                                         cand[valid].tolist())
    out_count = int(out_count)
    assert out_count == len(oracle_out)
    assert np.asarray(out_ids)[:out_count].tolist() == oracle_out
    assert np.all(np.asarray(out_ids)[out_count:] == int(SENTINEL))
    got_local = np.asarray(cand_local)[valid]
    assert got_local.tolist() == oracle_local
    assert np.array_equal(np.asarray(cand_ok), valid)


def test_union_reindex_capacity_overflow():
    base = jnp.arange(4, dtype=jnp.int32)
    cand = jnp.arange(100, 120, dtype=jnp.int32)
    valid = jnp.ones(20, bool)
    out_ids, out_count, cand_local, cand_ok = union_reindex(
        base, jnp.int32(4), cand, valid, capacity=10)
    assert int(out_count) == 10
    assert np.asarray(out_ids).tolist()[:10] == [0, 1, 2, 3] + list(range(100, 106))
    ok = np.asarray(cand_ok)
    assert ok[:6].all() and not ok[6:].any()


@pytest.mark.parametrize("seed", [0, 3])
def test_union_reindex_dense_matches_contract(seed):
    """Dense variant: base keeps 0..B-1; new ids in ascending-id order;
    cand_local consistent with out_ids; overflow drops largest ids."""
    from quiver_tpu.ops import union_reindex_dense

    rng = np.random.default_rng(seed)
    V = 200
    base = rng.choice(V, size=6, replace=False).astype(np.int32)
    cand = rng.integers(0, V, size=40).astype(np.int32)
    valid = rng.random(40) > 0.2
    cap = 32
    out_ids, out_count, cand_local, cand_ok = jax.jit(
        union_reindex_dense, static_argnames=("capacity", "num_nodes"))(
            jnp.asarray(base), jnp.int32(6), jnp.asarray(cand),
            jnp.asarray(valid), capacity=cap, num_nodes=V)

    new_ids = sorted(set(cand[valid].tolist()) - set(base.tolist()))
    expect = base.tolist() + new_ids
    oc = int(out_count)
    assert oc == min(len(expect), cap)
    got = np.asarray(out_ids)
    assert got[:oc].tolist() == expect[:oc]
    assert np.all(got[oc:] == int(SENTINEL))
    # every ok candidate maps to its id's slot in out_ids
    cl, ok = np.asarray(cand_local), np.asarray(cand_ok)
    for i in range(40):
        if ok[i]:
            assert got[cl[i]] == cand[i]
        elif valid[i]:
            assert cand[i] in expect[cap:]  # dropped by overflow


def test_union_dense_equals_sort_modulo_order():
    rng = np.random.default_rng(7)
    V = 500
    base = rng.choice(V, 8, replace=False).astype(np.int32)
    cand = rng.integers(0, V, 64).astype(np.int32)
    valid = np.ones(64, bool)
    from quiver_tpu.ops import union_reindex_dense

    o1 = union_reindex(jnp.asarray(base), jnp.int32(8), jnp.asarray(cand),
                       jnp.asarray(valid), capacity=128)
    o2 = union_reindex_dense(jnp.asarray(base), jnp.int32(8),
                             jnp.asarray(cand), jnp.asarray(valid),
                             capacity=128, num_nodes=V)
    assert int(o1[1]) == int(o2[1])
    n = int(o1[1])
    assert set(np.asarray(o1[0])[:n].tolist()) == \
        set(np.asarray(o2[0])[:n].tolist())
    # both consistently map candidates onto their own tables
    for out_ids, _, cl, ok in (o1, o2):
        out_ids, cl, ok = map(np.asarray, (out_ids, cl, ok))
        assert np.all(out_ids[cl[ok]] == cand[ok])


def test_segment_ops_against_numpy():
    rng = np.random.default_rng(0)
    E, V, D = 64, 10, 3
    data = rng.normal(size=(E, D)).astype(np.float32)
    seg = rng.integers(0, V, E)
    mask = rng.random(E) > 0.3

    s = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(seg), V,
                               jnp.asarray(mask)))
    ref = np.zeros((V, D), np.float32)
    for e in range(E):
        if mask[e]:
            ref[seg[e]] += data[e]
    np.testing.assert_allclose(s, ref, rtol=1e-5)

    m = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(seg), V,
                                jnp.asarray(mask)))
    cnt = np.maximum(np.bincount(seg[mask], minlength=V), 1)[:, None]
    np.testing.assert_allclose(m, ref / cnt, rtol=1e-5)

    mx = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(seg), V,
                                jnp.asarray(mask)))
    for v in range(V):
        rows = data[mask & (seg == v)]
        if len(rows):
            np.testing.assert_allclose(mx[v], rows.max(0), rtol=1e-5)


def test_segment_softmax_sums_to_one():
    rng = np.random.default_rng(1)
    E, V = 40, 6
    logits = rng.normal(size=E).astype(np.float32)
    seg = rng.integers(0, V, E)
    mask = rng.random(E) > 0.25
    sm = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(seg), V,
                                    jnp.asarray(mask)))
    assert np.all(sm[~mask] == 0)
    for v in range(V):
        tot = sm[mask & (seg == v)].sum()
        if (mask & (seg == v)).any():
            assert abs(tot - 1.0) < 1e-5


def test_gather_rows():
    rng = np.random.default_rng(2)
    table = rng.normal(size=(100, 16)).astype(np.float32)
    ids = rng.integers(0, 100, 33)
    out = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(ids)))
    np.testing.assert_array_equal(out, table[ids])


def test_union_reindex_fused_matches_dense():
    from quiver_tpu.ops import union_reindex_dense, union_reindex_fused

    rng = np.random.default_rng(11)
    V = 300
    for trial in range(3):
        B, M, cap = 16, 96, 64
        bc = rng.integers(4, B + 1)
        base = rng.choice(V, B, replace=False).astype(np.int32)
        cand = rng.integers(0, V, M).astype(np.int32)
        valid = rng.random(M) > 0.3
        a = union_reindex_dense(jnp.asarray(base), jnp.int32(bc),
                                jnp.asarray(cand), jnp.asarray(valid),
                                capacity=cap, num_nodes=V)
        b = union_reindex_fused(jnp.asarray(base), jnp.int32(bc),
                                jnp.asarray(cand), jnp.asarray(valid),
                                capacity=cap)
        # identical contract incl. ascending-id order of new ids
        assert int(a[1]) == int(b[1])
        n = int(a[1])
        np.testing.assert_array_equal(np.asarray(a[0])[:n],
                                      np.asarray(b[0])[:n])
        np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
        ok = np.asarray(a[3])
        np.testing.assert_array_equal(np.asarray(a[2])[ok],
                                      np.asarray(b[2])[ok])


def test_gather_rows_pallas_interpret():
    """Pallas DMA gather matches numpy (interpreter mode on CPU)."""
    from quiver_tpu.ops import gather_rows_pallas

    rng = np.random.default_rng(3)
    table = rng.normal(size=(64, 128)).astype(np.float32)
    ids = rng.integers(0, 64, 24)
    out = np.asarray(gather_rows_pallas(jnp.asarray(table),
                                        jnp.asarray(ids, jnp.int32),
                                        rows_per_step=8, interpret=True))
    np.testing.assert_array_equal(out, table[ids])


def test_spmm_csr_interpret_matches_oracle():
    """Pallas CSR SpMM (interpret mode) vs the XLA gather+segment oracle,
    mean and sum, incl. degree-0 rows and a hub row spanning multiple
    edge chunks."""
    import jax.numpy as jnp
    from quiver_tpu.ops.spmm import spmm_csr, spmm_csr_reference

    rng = np.random.default_rng(0)
    V, D = 300, 128
    deg = rng.integers(0, 9, V)
    deg[7] = 400            # hub spanning several 128-edge chunks
    deg[13] = 0
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    E = int(indptr[-1])
    indices = rng.integers(0, V, E)
    x = rng.normal(size=(V, D)).astype(np.float32)

    for aggr in ("mean", "sum"):
        got = spmm_csr(indptr, indices, jnp.asarray(x), aggr=aggr,
                       interpret=True)
        want = spmm_csr_reference(jnp.asarray(indptr), jnp.asarray(indices),
                                  jnp.asarray(x), aggr=aggr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=aggr)


def test_gat_csr_interpret_matches_oracle():
    """Fused full-graph GAT kernel (SDDMM + online edge softmax +
    weighted SpMM in one pass) vs the XLA segment oracle, incl.
    degree-0 rows and a multi-chunk hub."""
    import jax.numpy as jnp
    from quiver_tpu.ops.spmm import gat_csr, gat_csr_reference

    rng = np.random.default_rng(3)
    V, D = 280, 128
    deg = rng.integers(0, 7, V)
    deg[5] = 300            # hub spanning several chunks
    deg[11] = 0
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    E = int(indptr[-1])
    indices = rng.integers(0, V, E)
    xw = rng.normal(size=(V, D)).astype(np.float32)
    a_src = rng.normal(size=V).astype(np.float32)
    a_dst = rng.normal(size=V).astype(np.float32)

    got = gat_csr(indptr, indices, jnp.asarray(xw), jnp.asarray(a_src),
                  jnp.asarray(a_dst), interpret=True)
    want = gat_csr_reference(jnp.asarray(indptr), jnp.asarray(indices),
                             jnp.asarray(xw), jnp.asarray(a_src),
                             jnp.asarray(a_dst))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_union_reindex_sorted_edges_matches_fused():
    """The 2-sort variant must produce the same unique-id table and the
    same (src_global, dst_row, payload) edge multiset as the 3-sort
    fused version — only the emission order differs (sorted-id vs lane
    order)."""
    from quiver_tpu.ops import union_reindex_fused
    from quiver_tpu.ops.unique import union_reindex_sorted_edges

    rng = np.random.default_rng(7)
    V = 300
    for trial in range(3):
        B, k, cap = 16, 6, 64
        M = B * k
        bc = rng.integers(4, B + 1)
        base = rng.choice(V, B, replace=False).astype(np.int32)
        cand = rng.integers(0, V, M).astype(np.int32)
        valid = rng.random(M) > 0.3
        payload = rng.integers(0, 10_000, M).astype(np.int32)

        f = union_reindex_fused(jnp.asarray(base), jnp.int32(bc),
                                jnp.asarray(cand), jnp.asarray(valid),
                                capacity=cap)
        s = union_reindex_sorted_edges(
            jnp.asarray(base), jnp.int32(bc), jnp.asarray(cand),
            jnp.asarray(valid), jnp.asarray(payload), k, cap)

        # same table
        assert int(f[1]) == int(s[1])
        n = int(f[1])
        np.testing.assert_array_equal(np.asarray(f[0])[:n],
                                      np.asarray(s[0])[:n])

        # same edge multiset in GLOBAL coordinates
        table = np.asarray(f[0])
        ok_f = np.asarray(f[3])
        lanes = np.arange(M)
        ef = sorted(zip(table[np.asarray(f[2])[ok_f]].tolist(),
                        (lanes[ok_f] // k).tolist(),
                        payload[ok_f].tolist()))
        src_s, dst_s, pay_s, em_s = (np.asarray(s[2]), np.asarray(s[3]),
                                     np.asarray(s[4]), np.asarray(s[5]))
        es = sorted(zip(table[src_s[em_s]].tolist(), dst_s[em_s].tolist(),
                        pay_s[em_s].tolist()))
        assert ef == es


def test_fused_dedup_postprocess_matches_oracle():
    """The Pallas sequential-scan kernel (ops/scan_kernels.py) against a
    python oracle, on a T spanning multiple 32k grid blocks so the SMEM
    carries (head value, new count, previous id) cross block borders."""
    import jax.numpy as jnp
    from quiver_tpu.ops.scan_kernels import fused_dedup_postprocess
    from quiver_tpu.ops.unique import SENTINEL

    rng = np.random.default_rng(3)
    B, M = 4096, 70000
    T = B + M
    cap = 30000
    ids = rng.integers(0, 20000, T).astype(np.int32)
    ids = np.where(rng.random(T) > 0.15, ids, SENTINEL)
    pos = np.arange(T, dtype=np.int32)
    o = np.lexsort((pos, ids))
    s, order = ids[o], pos[o].astype(np.int32)
    bc = 3000

    src, emask, newkey, n_new = fused_dedup_postprocess(
        jnp.asarray(s), jnp.asarray(order), jnp.int32(bc), B=B,
        capacity=cap)
    src, emask, newkey = map(np.asarray, (src, emask, newkey))

    prev = np.concatenate([[-1], s[:-1]])
    is_head = (s != prev) & (s != SENTINEL)
    last, seen, c = B, False, 0
    osrc = np.zeros(T, np.int64)
    oem = np.zeros(T, bool)
    onk = np.full(T, SENTINEL, np.int64)
    for i in range(T):
        if is_head[i]:
            last = order[i] if order[i] < B else B
            seen = True
            if order[i] >= B:
                c += 1
        hv = last if seen else B
        local = hv if hv < B else bc + c - 1
        valid = s[i] != SENTINEL
        in_cap = local < cap
        if valid and order[i] >= B and in_cap:
            oem[i] = True
            osrc[i] = local
        if is_head[i] and order[i] >= B and in_cap:
            onk[i] = s[i]
    assert int(n_new) == c
    np.testing.assert_array_equal(emask, oem)
    np.testing.assert_array_equal(src, osrc)
    np.testing.assert_array_equal(newkey, onk)


def test_spmm_csr_dma_interpret_matches_oracle():
    """Per-edge-DMA Pallas reference kernel (interpret) vs the XLA
    oracle — kept correct even though the bucketed path is the default
    (ops/spmm.py measured verdict)."""
    import jax.numpy as jnp
    from quiver_tpu.ops.spmm import spmm_csr_dma, spmm_csr_reference

    rng = np.random.default_rng(1)
    V, D = 260, 128
    deg = rng.integers(0, 8, V)
    deg[3] = 300
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    x = rng.normal(size=(V, D)).astype(np.float32)
    for aggr in ("mean", "sum"):
        got = spmm_csr_dma(indptr, indices, jnp.asarray(x), aggr=aggr,
                           interpret=True)
        want = spmm_csr_reference(jnp.asarray(indptr), jnp.asarray(indices),
                                  jnp.asarray(x), aggr=aggr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=aggr)


def test_gat_csr_dma_interpret_matches_oracle():
    import jax.numpy as jnp
    from quiver_tpu.ops.spmm import gat_csr_dma, gat_csr_reference

    rng = np.random.default_rng(5)
    V, D = 200, 128
    deg = rng.integers(0, 6, V)
    deg[9] = 260
    deg[2] = 0
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    xw = rng.normal(size=(V, D)).astype(np.float32)
    a_src = rng.normal(size=V).astype(np.float32)
    a_dst = rng.normal(size=V).astype(np.float32)
    got = gat_csr_dma(indptr, indices, jnp.asarray(xw), jnp.asarray(a_src),
                      jnp.asarray(a_dst), interpret=True)
    want = gat_csr_reference(jnp.asarray(indptr), jnp.asarray(indices),
                             jnp.asarray(xw), jnp.asarray(a_src),
                             jnp.asarray(a_dst))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_spmm_bucketed_max_and_plan_reuse():
    """Bucketed max aggregation + explicit plan reuse through
    full_graph_csr (degree-0 rows must come out exactly 0)."""
    import jax.numpy as jnp
    from quiver_tpu.ops.spmm import (spmm_csr, spmm_csr_reference,
                                     full_graph_csr)

    rng = np.random.default_rng(7)
    V, D = 350, 64
    deg = rng.integers(0, 11, V)
    deg[0] = 0
    deg[17] = 500
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    x = rng.normal(size=(V, D)).astype(np.float32)
    blk = full_graph_csr(indptr, indices)
    for aggr in ("mean", "sum", "max"):
        got = spmm_csr(blk.indptr, blk.indices, jnp.asarray(x), aggr=aggr,
                       plan=blk.plan)
        want = spmm_csr_reference(jnp.asarray(indptr), jnp.asarray(indices),
                                  jnp.asarray(x), aggr=aggr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=aggr)
    np.testing.assert_array_equal(
        np.asarray(spmm_csr(blk.indptr, blk.indices, jnp.asarray(x),
                            aggr="max", plan=blk.plan))[0],
        np.zeros(D, np.float32))


def test_gat_csr_multihead_one_pass_matches_per_head_oracle():
    """Multi-head gat_csr (single fused pass) vs H independent per-head
    oracle runs."""
    import jax.numpy as jnp
    from quiver_tpu.ops.spmm import gat_csr, gat_csr_reference

    rng = np.random.default_rng(11)
    V, H, C = 180, 4, 32
    deg = rng.integers(0, 7, V)
    deg[4] = 0
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    xw = rng.normal(size=(V, H, C)).astype(np.float32)
    a_src = rng.normal(size=(V, H)).astype(np.float32)
    a_dst = rng.normal(size=(V, H)).astype(np.float32)
    got = np.asarray(gat_csr(indptr, indices, jnp.asarray(xw),
                             jnp.asarray(a_src), jnp.asarray(a_dst)))
    assert got.shape == (V, H, C)
    for h in range(H):
        want = gat_csr_reference(jnp.asarray(indptr), jnp.asarray(indices),
                                 jnp.asarray(xw[:, h]),
                                 jnp.asarray(a_src[:, h]),
                                 jnp.asarray(a_dst[:, h]))
        np.testing.assert_allclose(got[:, h], np.asarray(want),
                                   rtol=1e-4, atol=1e-5, err_msg=f"head {h}")


def test_gat_csr_att_src_path_matches_a_src_path():
    """The att_src fast path (source logits recomputed from the gathered
    value rows, zero extra gather traffic) must equal the per-node a_src
    path with a_src = (xw * att).sum(-1) — the GAT layer contract."""
    import jax.numpy as jnp
    from quiver_tpu.ops.spmm import gat_csr

    rng = np.random.default_rng(13)
    V, H, C = 200, 4, 16
    deg = rng.integers(0, 9, V)
    deg[7] = 0
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    indices = rng.integers(0, V, int(indptr[-1]))
    xw = rng.normal(size=(V, H, C)).astype(np.float32)
    att = rng.normal(size=(H, C)).astype(np.float32)
    a_dst = rng.normal(size=(V, H)).astype(np.float32)
    a_src = (xw * att[None]).sum(-1)
    want = np.asarray(gat_csr(indptr, indices, jnp.asarray(xw),
                              jnp.asarray(a_src), jnp.asarray(a_dst)))
    got = np.asarray(gat_csr(indptr, indices, jnp.asarray(xw), None,
                             jnp.asarray(a_dst),
                             att_src=jnp.asarray(att)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # single-head rank-2 contract
    want1 = np.asarray(gat_csr(indptr, indices, jnp.asarray(xw[:, 0]),
                               jnp.asarray(a_src[:, 0]),
                               jnp.asarray(a_dst[:, 0])))
    got1 = np.asarray(gat_csr(indptr, indices, jnp.asarray(xw[:, 0]),
                              None, jnp.asarray(a_dst[:, 0]),
                              att_src=jnp.asarray(att[0])))
    np.testing.assert_allclose(got1, want1, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Lane-major aggregation kernels (ops/lane_kernels.py)


def _lane_oracle(x, mask, aggr):
    F, k = mask.shape
    lanes = np.asarray(x)[F:F + F * k].reshape(k, F, -1)
    m = np.asarray(mask).T[..., None]
    if aggr == "max":
        out = np.where(m, lanes.astype(np.float64), -np.inf).max(0)
        return np.where(np.isfinite(out), out, 0.0)
    acc = (lanes.astype(np.float64) * m).sum(0)
    if aggr == "mean":
        acc = acc / np.maximum(m.sum(0), 1)
    return acc


def test_lane_aggregate_matches_oracle_all_aggrs():
    """Public lane_aggregate vs a numpy oracle, incl. degree-0 rows."""
    import jax.numpy as jnp
    from quiver_tpu.ops import lane_aggregate

    rng = np.random.default_rng(3)
    F, k, D = 200, 4, 24
    x = rng.normal(size=(F * (1 + k), D)).astype(np.float32)
    mask = rng.random((F, k)) < 0.7
    mask[:5] = False                      # degree-0 rows -> 0
    for aggr in ("mean", "sum", "max"):
        got = np.asarray(lane_aggregate(jnp.asarray(x), jnp.asarray(mask),
                                        aggr))
        np.testing.assert_allclose(got, _lane_oracle(x, mask, aggr),
                                   rtol=1e-5, atol=1e-5, err_msg=aggr)
    np.testing.assert_array_equal(
        np.asarray(lane_aggregate(jnp.asarray(x), jnp.asarray(mask),
                                  "mean"))[0], np.zeros(D, np.float32))


def test_lane_kernels_interpret_fwd_bwd_match_xla():
    """The Pallas fwd/bwd kernels (interpret mode) vs the XLA formulas,
    including the non-TILE-aligned tail path and bf16."""
    import jax.numpy as jnp
    from quiver_tpu.ops import lane_kernels as lk

    rng = np.random.default_rng(4)
    for (F, k, D, dt) in [(520, 5, 128, jnp.float32),
                          (512 + 48, 3, 64, jnp.bfloat16),
                          (512, 1, 32, jnp.float32)]:
        x = jnp.asarray(rng.normal(size=(F * (1 + k), D)).astype(
            np.float32)).astype(dt)
        maskf = jnp.asarray((rng.random((k, F)) < 0.8).astype(np.float32))
        for aggr in ("mean", "sum", "max"):
            ref = lk._xla_aggregate(x, maskf, aggr)
            got = lk._fwd_pallas(x, maskf, f=F, k=k, tile=256, aggr=aggr,
                                 interpret=True)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=1e-5, atol=1e-5, err_msg=f"fwd {aggr} F={F}")
        g = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32)
                        ).astype(dt)
        for mean in (True, False):
            ref = lk._xla_bwd(g, maskf, mean, dt)
            got = lk._bwd_pallas(g, maskf, f=F, k=k, tile=256, mean=mean,
                                 interpret=True, dtype=dt)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref, np.float32),
                rtol=1e-5, atol=1e-5, err_msg=f"bwd mean={mean} F={F}")


def test_lane_aggregate_grad_matches_formula():
    """jax.grad through the custom VJP == grad of the plain formula."""
    import jax
    import jax.numpy as jnp
    from quiver_tpu.ops import lane_aggregate

    rng = np.random.default_rng(5)
    F, k, D = 104, 3, 16
    x = jnp.asarray(rng.normal(size=(F * (1 + k), D)).astype(np.float32))
    mask = jnp.asarray(rng.random((F, k)) < 0.8)

    def loss_api(xv, aggr):
        return (lane_aggregate(xv, mask, aggr) ** 2).sum()

    def loss_ref(xv, aggr):
        lanes = xv[F:].reshape(k, F, D)
        mf = mask.T[..., None].astype(xv.dtype)
        agg = (lanes * mf).sum(0)
        if aggr == "mean":
            agg = agg / jnp.maximum(mf.sum(0), 1)
        return (agg ** 2).sum()

    for aggr in ("mean", "sum"):
        g1 = jax.grad(loss_api)(x, aggr)
        g2 = jax.grad(loss_ref)(x, aggr)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-5, err_msg=aggr)


def test_lane_aggregate_vmap_falls_back():
    """Under vmap the dispatcher must take the XLA path (manual-DMA
    kernels have no batching rule); result equals per-example calls."""
    import jax
    import jax.numpy as jnp
    from quiver_tpu.ops import lane_aggregate

    rng = np.random.default_rng(6)
    B, F, k, D = 3, 64, 2, 8
    xs = jnp.asarray(rng.normal(size=(B, F * (1 + k), D)).astype(np.float32))
    mask = jnp.asarray(rng.random((F, k)) < 0.8)
    got = jax.vmap(lambda xv: lane_aggregate(xv, mask, "mean"))(xs)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(got[b]),
            np.asarray(lane_aggregate(xs[b], mask, "mean")),
            rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Flash-GAT lane kernels (ops/gat_kernels.py)


def _flash_gat_numpy_oracle(x, asr, adr, mask, H, slope):
    """Per-(row, head) softmax attention over valid lanes, float64."""
    F, k = mask.shape
    HC = x.shape[1]
    C = HC // H
    xr = np.asarray(x, np.float64).reshape(-1, H, C)
    a_s = (xr * asr.reshape(1, H, C)).sum(-1)
    a_d = (xr[:F] * adr.reshape(1, H, C)).sum(-1)
    out = np.zeros((F, H, C))
    for i in range(F):
        for h in range(H):
            zs, vs = [], []
            for j in range(k):
                if mask[i, j]:
                    z = a_s[F + j * F + i, h] + a_d[i, h]
                    zs.append(z if z >= 0 else slope * z)
                    vs.append(xr[F + j * F + i, h])
            if zs:
                za = np.array(zs)
                w = np.exp(za - za.max())
                w /= w.sum()
                out[i, h] = (np.stack(vs) * w[:, None]).sum(0)
    return out.reshape(F, HC)


def test_flash_gat_xla_matches_numpy_oracle():
    """The XLA formula (the fallback + the source of truth for the
    kernels) vs a per-edge float64 numpy oracle, incl. degree-0 rows."""
    from quiver_tpu.ops import flash_gat_lane

    rng = np.random.default_rng(7)
    F, k, H, C = 96, 4, 2, 64
    x = rng.normal(size=(F * (1 + k), H * C)).astype(np.float32)
    asr = rng.normal(size=(1, H * C)).astype(np.float32)
    adr = rng.normal(size=(1, H * C)).astype(np.float32)
    mask = rng.random((F, k)) < 0.7
    mask[3] = False                                 # degree-0 row
    got = np.asarray(flash_gat_lane(jnp.asarray(x), jnp.asarray(asr),
                                    jnp.asarray(adr), jnp.asarray(mask),
                                    heads=H, negative_slope=0.2))
    ref = _flash_gat_numpy_oracle(x, asr, adr, mask, H, 0.2)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    assert np.all(got[3] == 0)                      # empty row -> 0


def test_flash_gat_interpret_fwd_bwd_match_xla():
    """The Pallas fwd/bwd kernels (interpret mode) vs the XLA formulas
    and vs autodiff of the XLA forward, f32 and bf16."""
    from quiver_tpu.ops import gat_kernels as gk

    rng = np.random.default_rng(8)
    F, k, H, C = 512, 3, 4, 64
    HC = H * C
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(F * (1 + k), HC)).astype(
            np.float32)).astype(dt)
        asr = jnp.asarray(rng.normal(size=(1, HC)).astype(np.float32))
        adr = jnp.asarray(rng.normal(size=(1, HC)).astype(np.float32))
        mask = rng.random((k, F)) < 0.8
        mask[:, 0] = False
        maskf = jnp.asarray(mask.astype(np.float32))
        # bf16 kernels compute logits from bf16 products (the XLA
        # formula uses f32): a logit landing on the LeakyReLU kink or a
        # softmax near-tie can flip, so allow wider bf16 slack
        tol = dict(rtol=1e-5, atol=1e-5) if dt == jnp.float32 else \
            dict(rtol=0.15, atol=0.12)

        out_x, m, s, a_d = gk._xla_gat_fwd(x, asr, adr, maskf, h=H,
                                           slope=0.2)
        out_p, m_p, s_p, ad_p = gk._fwd_pallas(
            x, asr, adr, maskf, f=F, k=k, tile=256, h=H, slope=0.2,
            interpret=True)
        np.testing.assert_allclose(np.asarray(out_p, np.float32),
                                   np.asarray(out_x, np.float32), **tol)
        np.testing.assert_allclose(np.asarray(ad_p), np.asarray(a_d),
                                   **tol)

        g = jnp.asarray(rng.normal(size=(F, HC)).astype(np.float32)
                        ).astype(dt)

        def f_pure(x_, asr_, adr_):
            o, _, _, _ = gk._xla_gat_fwd(x_, asr_, adr_, maskf, h=H,
                                         slope=0.2)
            return (o.astype(jnp.float32) * g.astype(jnp.float32)).sum()

        gx, gasr, gadr = jax.grad(f_pure, argnums=(0, 1, 2))(x, asr, adr)
        # bwd consumes ITS OWN forward's residuals (m/s must match the
        # recomputed logits' compute dtype)
        dx_p, dasr_p, dadr_p = gk._bwd_pallas(
            g, out_p, m_p, s_p, ad_p, x, asr, adr, maskf, f=F, k=k,
            tile=256, h=H, slope=0.2, interpret=True)
        # bf16 bwd: a logit whose bf16 product lands on the other side
        # of the LeakyReLU kink gets slope 1 vs 0.2 in leaky' — a few
        # isolated grad elements can differ by up to ~1/slope.
        # f32 atol 5e-4: the r5 kernels expand alpha via a hi/lo bf16x2
        # split (~2^-16 relative — Mosaic has no 3-pass precision and
        # HIGHEST cost 70% of kernel time); grads of O(10) scale pick
        # up O(2e-4) absolute noise, 20x under the on-chip tier's 5e-3
        # value-check bound (tools/tpu_correctness.py).
        btol = dict(rtol=1e-3, atol=5e-4) if dt == jnp.float32 else \
            dict(rtol=0.2, atol=0.5)
        np.testing.assert_allclose(np.asarray(dx_p, np.float32),
                                   np.asarray(gx, np.float32), **btol)
        # attention-param grads sum over all F*k lanes: isolated bf16
        # kink flips add O(1) absolute error to O(sqrt(F*k)) sums, so
        # bound them relative to the grad's overall scale
        for got_g, ref_g in ((dasr_p, gasr), (dadr_p, gadr)):
            got_g, ref_g = np.asarray(got_g), np.asarray(ref_g)
            scale = max(np.abs(ref_g).max(), 1e-6)
            frac = 1e-4 if dt == jnp.float32 else 5e-2
            assert np.abs(got_g - ref_g).max() <= frac * scale, \
                f"param grad off by {np.abs(got_g - ref_g).max()} " \
                f"(scale {scale}, dt={dt})"


def test_flash_gat_grad_matches_autodiff():
    """jax.grad through the public custom VJP == autodiff of the plain
    formula (XLA path on CPU), for x and both attention vectors."""
    from quiver_tpu.ops import flash_gat_lane

    rng = np.random.default_rng(9)
    F, k, H, C = 64, 3, 2, 64
    HC = H * C
    x = jnp.asarray(rng.normal(size=(F * (1 + k), HC)).astype(np.float32))
    asr0 = jnp.asarray(rng.normal(size=(1, HC)).astype(np.float32))
    adr0 = jnp.asarray(rng.normal(size=(1, HC)).astype(np.float32))
    mask = jnp.asarray(rng.random((F, k)) < 0.8)

    def loss_api(xv, a1, a2):
        o = flash_gat_lane(xv, a1, a2, mask, heads=H, negative_slope=0.2)
        return (o ** 2).sum()

    def loss_ref(xv, a1, a2):
        xr = xv.reshape(-1, H, C)
        a_s = (xr * a1.reshape(1, H, C)).sum(-1)
        a_d = (xr[:F] * a2.reshape(1, H, C)).sum(-1)
        lanes = xv[F:].reshape(k, F, H, C)
        e = a_s[F:].reshape(k, F, H) + a_d[None]
        e = jnp.where(e >= 0, e, 0.2 * e)
        e = jnp.where(mask.T[..., None], e, -jnp.inf)
        alpha = jax.nn.softmax(e, axis=0)
        alpha = jnp.where(mask.T[..., None], alpha, 0)
        o = (lanes * alpha[..., None]).sum(0).reshape(F, HC)
        return (o ** 2).sum()

    g1 = jax.grad(loss_api, argnums=(0, 1, 2))(x, asr0, adr0)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, asr0, adr0)
    for a, b, nm in zip(g1, g2, ("dx", "dasr", "dadr")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=3e-4, err_msg=nm)


def test_lane_aggregate_rel_matches_per_relation_passes():
    """Single-pass typed aggregation [F, R, D] == R independent
    lane_aggregate calls with per-relation masks; grads flow."""
    import jax
    import jax.numpy as jnp
    from quiver_tpu.ops import lane_aggregate
    from quiver_tpu.ops.lane_kernels import lane_aggregate_rel

    rng = np.random.default_rng(17)
    F, k, D, R = 96, 4, 16, 3
    x = jnp.asarray(rng.normal(size=(F * (1 + k), D)).astype(np.float32))
    mask = jnp.asarray(rng.random((F, k)) < 0.7)
    et = jnp.asarray(rng.integers(0, R, (F, k)).astype(np.int32))
    for aggr in ("mean", "sum"):
        got = np.asarray(lane_aggregate_rel(x, mask, et, R, aggr))
        assert got.shape == (F, R, D)
        for r in range(R):
            want = np.asarray(lane_aggregate(x, mask & (et == r), aggr))
            np.testing.assert_allclose(got[:, r], want, rtol=1e-5,
                                       atol=1e-5, err_msg=f"{aggr} r={r}")
    # grad w.r.t. x: select of per-relation grads (XLA autodiff) ==
    # sum of per-relation path grads
    def loss_one(xv):
        return (lane_aggregate_rel(xv, mask, et, R, "mean") ** 2).sum()

    def loss_ref(xv):
        return sum((lane_aggregate(xv, mask & (et == r), "mean") ** 2
                    ).sum() for r in range(R))

    g1 = jax.grad(loss_one)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_rel_kernels_interpret_fwd_bwd_match_xla():
    """Pallas typed-relation fwd/bwd kernels (interpret mode) vs the
    XLA formulas, including the non-TILE-aligned tail path."""
    import jax.numpy as jnp
    from quiver_tpu.ops import lane_kernels as lk

    rng = np.random.default_rng(23)
    R = 3
    for (F, k, D) in [(520, 5, 128), (512 + 40, 3, 128), (512, 1, 128)]:
        x = jnp.asarray(rng.normal(size=(F * (1 + k), D)).astype(np.float32))
        mask = rng.random((k, F)) < 0.8
        rel = rng.integers(0, R, (k, F))
        relf = jnp.asarray(np.where(mask, rel, -1).astype(np.float32))
        for mean in (True, False):
            ref = lk._xla_rel(x, relf, R, mean)
            got = lk._fwd_rel_pallas(x, relf, f=F, k=k, tile=256, R=R,
                                     mean=mean, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5,
                err_msg=f"fwd mean={mean} F={F}")
            g = jnp.asarray(rng.normal(size=(F, R, D)).astype(np.float32))
            refb = lk._xla_rel_bwd(g, relf, R, mean, jnp.float32)
            gotb = lk._bwd_rel_pallas(g, relf, f=F, k=k, tile=256, R=R,
                                      mean=mean, interpret=True,
                                      dtype=jnp.float32)
            np.testing.assert_allclose(
                np.asarray(gotb), np.asarray(refb), rtol=1e-5, atol=1e-5,
                err_msg=f"bwd mean={mean} F={F}")


def test_lane_aggregate_rel_grad_matches_reference():
    """jax.grad through lane_aggregate_rel's custom VJP == grad of the
    plain per-relation formula."""
    import jax
    import jax.numpy as jnp
    from quiver_tpu.ops import lane_aggregate
    from quiver_tpu.ops.lane_kernels import lane_aggregate_rel

    rng = np.random.default_rng(29)
    F, k, D, R = 96, 4, 16, 3
    x = jnp.asarray(rng.normal(size=(F * (1 + k), D)).astype(np.float32))
    mask = jnp.asarray(rng.random((F, k)) < 0.7)
    et = jnp.asarray(rng.integers(0, R, (F, k)).astype(np.int32))
    for aggr in ("mean", "sum"):
        def loss_one(xv):
            return (lane_aggregate_rel(xv, mask, et, R, aggr) ** 2).sum()

        def loss_ref(xv):
            return sum((lane_aggregate(xv, mask & (et == r), aggr) ** 2
                        ).sum() for r in range(R))

        g1 = jax.grad(loss_one)(x)
        g2 = jax.grad(loss_ref)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5, err_msg=aggr)
