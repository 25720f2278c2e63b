"""OGB-format dataset loader tests (quiver_tpu.datasets).

Ground truth is the committed fixture ``tests/fixtures/mini-ogbn`` — a
40-node graph written in the exact on-disk layout the real OGB datasets
use (raw/*.csv.gz + split/<name>/*.csv.gz), with the generating arrays
stored beside it in ``expected.npz``. Mirrors the reference's pattern of
loading real datasets through preprocessing into CSR artifacts
(benchmarks/ogbn-papers100M/preprocess.py:47-115).
"""
from pathlib import Path

import numpy as np
import pytest

from quiver_tpu.datasets import load_ogb, load_npz, save_npz, load_dataset

FIXTURE = Path(__file__).parent / "fixtures" / "mini-ogbn"


@pytest.fixture(scope="module")
def expected():
    return np.load(FIXTURE / "expected.npz")


def test_load_ogb_matches_source_arrays(expected):
    ds = load_ogb(FIXTURE)
    n = expected["feat"].shape[0]
    assert ds.topo.node_count == n
    # undirected + coalesced (PyG to_undirected semantics): each edge in
    # both directions, reciprocal duplicates in the raw file merged
    src, dst = expected["src"], expected["dst"]
    sym = np.unique(np.stack([np.concatenate([src, dst]),
                              np.concatenate([dst, src])]), axis=1)
    assert ds.topo.edge_count == sym.shape[1]
    np.testing.assert_allclose(ds.feat, expected["feat"], atol=1e-4)
    np.testing.assert_array_equal(ds.labels, expected["labels"])
    np.testing.assert_array_equal(np.sort(ds.train_idx),
                                  np.sort(expected["train"]))
    np.testing.assert_array_equal(np.sort(ds.test_idx),
                                  np.sort(expected["test"]))
    assert ds.num_classes == int(expected["labels"].max()) + 1

    # adjacency ground truth: neighbors of node 0 under coalesced
    # symmetrization (duplicates merged)
    want = np.unique(np.concatenate([dst[src == 0], src[dst == 0]]))
    got = np.sort(ds.topo.indices[ds.topo.indptr[0]:ds.topo.indptr[1]])
    np.testing.assert_array_equal(got, want)


def test_load_ogb_directed(expected):
    ds = load_ogb(FIXTURE, undirected=False)
    assert ds.topo.edge_count == len(expected["src"])


def test_npz_round_trip(tmp_path, expected):
    ds = load_ogb(FIXTURE)
    p = tmp_path / "mini.npz"
    save_npz(ds, p)
    ds2 = load_dataset(p)
    np.testing.assert_array_equal(ds2.topo.indptr, ds.topo.indptr)
    np.testing.assert_array_equal(ds2.topo.indices, ds.topo.indices)
    np.testing.assert_allclose(ds2.feat, ds.feat)
    np.testing.assert_array_equal(ds2.labels, ds.labels)
    np.testing.assert_array_equal(ds2.train_idx, ds.train_idx)


def test_load_dataset_dispatch():
    ds = load_dataset(FIXTURE)
    assert ds.name == "mini-ogbn"


def test_end_to_end_sample_on_fixture():
    """The loaded dataset drives the sampler + a feature gather."""
    import quiver_tpu as qt

    ds = load_ogb(FIXTURE)
    s = qt.NeighborSampler(ds.topo, [3, 2], mode="CPU", seed=0,
                           dedup="per_hop")
    b = s.sample(ds.train_idx[:8])
    n_id = np.asarray(b.n_id)[: int(b.n_count)]
    assert len(n_id) >= 8
    x = ds.feat[n_id]
    assert x.shape[1] == ds.feat.shape[1]


def _write_csv_gz(path, arr):
    import gzip
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wt") as fh:
        for row in np.atleast_2d(arr):
            fh.write(",".join(str(int(v)) for v in np.atleast_1d(row)) + "\n")


def test_load_ogb_undirected_coalesces_reciprocal_and_self_edges(tmp_path):
    """Raw files that already store both directions (or self-loops) must
    not become duplicated multi-edges with doubled degree (round-2
    review finding)."""
    root = tmp_path / "tiny"
    _write_csv_gz(root / "raw" / "edge.csv.gz",
                  np.array([[0, 1], [1, 0], [2, 2], [0, 2]]))
    _write_csv_gz(root / "raw" / "num-node-list.csv.gz", np.array([[3]]))
    _write_csv_gz(root / "split" / "s" / "train.csv.gz", np.array([[0]]))
    ds = load_ogb(root)
    # unique symmetrized pairs: (0,1),(1,0),(2,2),(0,2),(2,0) -> 5
    assert ds.topo.edge_count == 5
    n0 = ds.topo.indices[ds.topo.indptr[0]:ds.topo.indptr[1]]
    np.testing.assert_array_equal(np.sort(n0), [1, 2])


def test_load_ogb_missing_split_raises(tmp_path):
    root = tmp_path / "nosplit"
    _write_csv_gz(root / "raw" / "edge.csv.gz", np.array([[0, 1]]))
    _write_csv_gz(root / "raw" / "num-node-list.csv.gz", np.array([[2]]))
    with pytest.raises(FileNotFoundError):
        load_ogb(root)
