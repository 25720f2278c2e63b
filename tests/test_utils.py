"""CSRTopo / size-parsing tests (reference: tests/python/cpu/test_quiver.py,
test_sparse.py — CSR round-trip and smoke checks)."""
import numpy as np
import pytest

from quiver_tpu import CSRTopo, parse_size, reindex_feature


def test_coo_to_csr_roundtrip():
    rng = np.random.default_rng(0)
    n, e = 50, 400
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    topo = CSRTopo(edge_index=np.stack([row, col]))
    assert topo.node_count == n
    assert topo.edge_count == e
    # Every COO edge appears exactly once in CSR, with eid mapping back.
    for s in range(0, e, 37):
        r, c = row[s], col[s]
        lo, hi = topo.indptr[r], topo.indptr[r + 1]
        slots = np.where(topo.eid[lo:hi] == s)[0]
        assert len(slots) == 1
        assert topo.indices[lo + slots[0]] == c
    assert np.all(topo.degree == np.bincount(row, minlength=n))


def test_csr_direct_and_weights():
    indptr = np.array([0, 2, 3, 3])
    indices = np.array([1, 2, 0])
    topo = CSRTopo(indptr=indptr, indices=indices)
    assert topo.node_count == 3
    assert list(topo.degree) == [2, 1, 0]

    # COO weights must be permuted into CSR slot order.
    row = np.array([1, 0, 0])
    col = np.array([0, 2, 1])
    w = np.array([10.0, 20.0, 30.0])
    t2 = CSRTopo(edge_index=np.stack([row, col]), edge_weight=w)
    lo, hi = t2.indptr[0], t2.indptr[0 + 1]
    got = {(int(t2.indices[i]), float(t2.edge_weight[i])) for i in range(lo, hi)}
    assert got == {(2, 20.0), (1, 30.0)}


def test_parse_size():
    assert parse_size(1024) == 1024
    assert parse_size("200M") == 200 * (1 << 20)
    assert parse_size("1.5G") == int(1.5 * (1 << 30))
    assert parse_size("4g") == 4 * (1 << 30)
    with pytest.raises(ValueError):
        parse_size(object())


def test_reindex_feature_hot_prefix_is_high_degree():
    rng = np.random.default_rng(1)
    n = 100
    # Node i has degree i: node 99 is hottest.
    row = np.concatenate([np.full(i, i) for i in range(n)])
    col = rng.integers(0, n, row.shape[0])
    topo = CSRTopo(edge_index=np.stack([row, col]))
    feat = np.arange(n, dtype=np.float32)[:, None]
    newf, old2new, new2old = reindex_feature(topo, feat, 0.2)
    hot = set(new2old[:20].tolist())
    assert hot == set(range(80, 100))  # top-20 degrees
    # permutation consistency
    assert np.all(new2old[old2new] == np.arange(n))
    assert np.allclose(newf[:, 0], new2old)


def test_public_api_surface():
    """Every exported name resolves (incl. lazy submodule attrs)."""
    import quiver_tpu as qt

    for name in qt.__all__:
        assert getattr(qt, name) is not None
    for lazy in ("Feature", "DistFeature", "PartitionInfo",
                 "partition_without_replication", "generate_neighbour_num",
                 "MixedSampler", "SampleJob", "CommWorld", "models",
                 "serving", "parallel", "checkpoint", "profiling", "native"):
        assert getattr(qt, lazy) is not None
    from quiver_tpu.pyg import GraphSageSampler, MixedGraphSageSampler
    assert GraphSageSampler is qt.NeighborSampler


def test_reference_export_list_resolves():
    """Every name the reference exports at top level (reference
    __init__.py:12-20) resolves on quiver_tpu with the same name, so a
    migrating `from quiver import X` becomes `from quiver_tpu import X`
    with no renames."""
    import quiver_tpu as qt

    reference_exports = [
        "Feature", "DistFeature", "GraphSageSampler", "PartitionInfo",
        "CSRTopo", "MixedGraphSageSampler", "SampleJob",
        "quiver_partition_feature", "load_quiver_feature_partition",
        "p2pCliqueTopo", "init_p2p", "getNcclId", "NcclComm",
        "RequestBatcher", "HybridSampler", "InferenceServer",
        "InferenceServer_Debug", "generate_neighbour_num",
    ]
    for name in reference_exports:
        assert getattr(qt, name) is not None, name
    # and the reference's submodule surface
    assert qt.multiprocessing.reductions.init_reductions() is None
    feat = qt.Feature(device_cache_size=0)
    rebuild, (handle,) = qt.multiprocessing.reductions.reduce_feature(feat)
    assert rebuild(handle) is feat


def test_parse_size_two_letter_suffix():
    """Reference parse_size accepts "KB"/"MB"/"GB" too (ADVICE r1)."""
    from quiver_tpu import parse_size
    assert parse_size("8GB") == 8 << 30
    assert parse_size("200MB") == 200 << 20
    assert parse_size("1.5KB") == int(1.5 * 1024)


def test_partition_accepts_leading_device_arg():
    """Reference signature partition_without_replication(device, probs,
    ids) must keep working for migrated call sites (ADVICE r1)."""
    import numpy as np
    from quiver_tpu.partition import (partition_without_replication,
                                      select_nodes)
    probs = [np.array([0.9, 0.0, 0.1, 0.5]), np.array([0.0, 0.8, 0.4, 0.1])]
    with_dev = partition_without_replication(0, probs)
    without = partition_without_replication(probs)
    for a, b in zip(with_dev, without):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(select_nodes(0, probs), select_nodes(probs))
