"""Dataset loaders for OGB-format node-property-prediction graphs.

The reference consumes real datasets through the ``ogb`` /
``torch_geometric`` packages (examples/pyg/ogbn_products_sage_quiver.py,
benchmarks/ogbn-papers100M/preprocess.py:47-115). Those packages are not
dependencies here; instead this module reads the *on-disk* OGB layout
directly, so a dataset downloaded anywhere (`ogbn-products/`,
`ogbn-arxiv/`, ...) drops in without extra packages:

    root/
      raw/edge.csv.gz            "src,dst" per line
      raw/num-node-list.csv.gz   single integer
      raw/node-feat.csv.gz       comma-separated floats per node
      raw/node-label.csv.gz      one integer per node
      split/<name>/{train,valid,test}.csv.gz

``save_npz``/``load_npz`` give a binary fast-path (the analogue of the
reference's preprocess step writing ``csr_indptr.pt``/... artifacts,
preprocess.py:63-74): parse the CSVs once, then reload in seconds.
"""
from __future__ import annotations

import dataclasses
import gzip
import io
from pathlib import Path
from typing import Optional

import numpy as np

from .utils import CSRTopo


@dataclasses.dataclass
class GraphDataset:
    """A loaded node-classification graph dataset."""

    topo: CSRTopo
    feat: np.ndarray              # [N, D] float32
    labels: np.ndarray            # [N] int64 (-1 where unlabeled)
    train_idx: np.ndarray
    valid_idx: np.ndarray
    test_idx: np.ndarray
    name: str = ""

    @property
    def num_classes(self) -> int:
        return int(self.labels.max()) + 1


def _read_csv_gz(path: Path, dtype):
    with gzip.open(path, "rb") as f:
        data = f.read()
    return np.loadtxt(io.BytesIO(data), delimiter=",", dtype=dtype,
                      ndmin=2)


def load_ogb(root, undirected: bool = True,
             feat_dtype=np.float32) -> GraphDataset:
    """Load an OGB node-prop-pred dataset directory (no ogb package).

    Args:
      root: dataset directory (contains ``raw/`` and ``split/``).
      undirected: symmetrize the edge list (what the reference's
        examples do via PyG ``to_undirected`` for products/reddit).
    """
    root = Path(root)
    raw = root / "raw"
    if not raw.is_dir():
        raise FileNotFoundError(f"no raw/ under {root}")

    edges = _read_csv_gz(raw / "edge.csv.gz", np.int64)
    n = int(_read_csv_gz(raw / "num-node-list.csv.gz", np.int64)[0, 0])
    feat_p = raw / "node-feat.csv.gz"
    feat = (_read_csv_gz(feat_p, feat_dtype) if feat_p.exists()
            else np.zeros((n, 1), feat_dtype))
    lab_p = raw / "node-label.csv.gz"
    labels = (_read_csv_gz(lab_p, np.int64).reshape(-1) if lab_p.exists()
              else np.full((n,), -1, np.int64))

    src, dst = edges[:, 0], edges[:, 1]
    if undirected:
        # Symmetrize + coalesce (PyG to_undirected semantics): raw files
        # that already store both directions (or self-loops) must not
        # become duplicated multi-edges with doubled degree.
        src, dst = (np.concatenate([src, dst]), np.concatenate([dst, src]))
        key = src * n + dst
        _, keep = np.unique(key, return_index=True)
        src, dst = src[keep], dst[keep]
    topo = CSRTopo(edge_index=np.stack([src, dst]), num_nodes=n)

    split_root = root / "split"
    splits = {"train": None, "valid": np.empty(0, np.int64),
              "test": np.empty(0, np.int64)}
    if split_root.is_dir():
        sub = sorted(p for p in split_root.iterdir() if p.is_dir())
        if sub:
            for part in ("train", "valid", "test"):
                p = sub[0] / f"{part}.csv.gz"
                if p.exists():
                    splits[part] = _read_csv_gz(p, np.int64).reshape(-1)
    if splits["train"] is None:
        # Refuse to invent a split: silently training on every node
        # (test set included) would report meaningless accuracy.
        raise FileNotFoundError(
            f"no split/<name>/train.csv.gz under {root}; pass an OGB-layout "
            "dataset directory or build one with save_npz")

    return GraphDataset(topo=topo, feat=feat, labels=labels,
                        train_idx=splits["train"],
                        valid_idx=splits["valid"],
                        test_idx=splits["test"], name=root.name)


def save_npz(ds: GraphDataset, path) -> None:
    """Binary artifact of a loaded dataset (CSR + feat + labels + splits)."""
    np.savez_compressed(
        path, indptr=ds.topo.indptr, indices=ds.topo.indices,
        feat=ds.feat, labels=ds.labels, train_idx=ds.train_idx,
        valid_idx=ds.valid_idx, test_idx=ds.test_idx,
        name=np.array(ds.name))


def load_npz(path) -> GraphDataset:
    z = np.load(path, allow_pickle=False)
    topo = CSRTopo(indptr=z["indptr"], indices=z["indices"])
    return GraphDataset(topo=topo, feat=z["feat"], labels=z["labels"],
                        train_idx=z["train_idx"], valid_idx=z["valid_idx"],
                        test_idx=z["test_idx"], name=str(z["name"]))


def load_dataset(path) -> GraphDataset:
    """Dispatch: ``.npz`` artifact or an OGB directory."""
    p = Path(path)
    if p.suffix == ".npz":
        return load_npz(p)
    return load_ogb(p)
