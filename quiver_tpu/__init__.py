"""quiver-tpu: a TPU-native graph learning acceleration framework.

Rebuild of the capabilities of quiver-team/torch-quiver (GPU-accelerated
graph sampling, tiered feature collection, workload-aware serving) as an
idiomatic JAX/XLA/Pallas framework — see SURVEY.md for the blueprint and
the reference export list at srcs/python/quiver/__init__.py:2-11.
"""
from __future__ import annotations

from .utils import (CSRTopo, parse_size, reindex_by_config,
                    reindex_feature, Topo, init_p2p)

# Reference-compat alias (reference exports `p2pCliqueTopo`, __init__.py:2-11)
p2pCliqueTopo = Topo
from . import datasets  # noqa: E402  (OGB-format loaders, no ogb dep)
from .sampling import (
    NeighborSampler,
    SampledBatch,
    Adj,
    DenseBlock,
    sample_adjacency,
    weighted_sample_adjacency,
    cal_next_prob,
)

__version__ = "0.1.0"


def enable_compilation_cache(path=None):
    """Enable JAX's persistent compilation cache (recommended on axon/TPU,
    where first compiles of big sampling programs take minutes)."""
    import os
    import jax
    path = path or os.path.join(os.path.dirname(__file__), os.pardir,
                                ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__all__ = [
    "CSRTopo",
    "parse_size",
    "reindex_by_config",
    "reindex_feature",
    "Topo",
    "p2pCliqueTopo",
    "init_p2p",
    "NeighborSampler",
    "SampledBatch",
    "Adj",
    "DenseBlock",
    "sample_adjacency",
    "weighted_sample_adjacency",
    "cal_next_prob",
    "__version__",
    # lazy (resolved by __getattr__), mirroring the reference export list
    # (reference __init__.py:12-20)
    "Feature", "DistFeature", "PartitionInfo",
    "GraphSageSampler", "MixedGraphSageSampler", "SampleJob",
    "quiver_partition_feature", "load_quiver_feature_partition",
    "getNcclId", "NcclComm",
    "RequestBatcher", "HybridSampler", "InferenceServer",
    "InferenceServer_Debug",
    "generate_neighbour_num",
]


def __getattr__(name):
    # Heavier subsystems are imported lazily to keep `import quiver_tpu`
    # light (feature store, partitioner, serving, parallel, models).
    if name in ("Feature", "DistFeature", "PartitionInfo", "DeviceConfig"):
        from . import feature as _f
        return getattr(_f, name)
    if name in ("partition_without_replication", "select_nodes",
                "quiver_partition_feature", "load_quiver_feature_partition"):
        from . import partition as _p
        return getattr(_p, name)
    if name == "generate_neighbour_num":
        from .serving.neighbour_num import generate_neighbour_num
        return generate_neighbour_num
    if name in ("MixedSampler", "SampleJob"):
        from .sampling import mixed as _m
        return getattr(_m, name)
    if name in ("GraphSageSampler", "MixedGraphSageSampler",
                "AsyncNeighborSampler"):
        # Reference exports the samplers at top level too (__init__.py:3)
        from . import pyg as _pyg
        return getattr(_pyg, name)
    if name in ("RequestBatcher", "HybridSampler", "InferenceServer",
                "InferenceServer_Debug", "ServerMetrics"):
        # Reference __init__.py:10 exports the serving stack at top level
        from . import serving as _s
        return getattr(_s, name)
    if name == "multiprocessing":
        import importlib
        return importlib.import_module(".multiprocessing", __name__)
    if name in ("CommWorld", "NcclComm", "getNcclId", "init_distributed"):
        from . import comm as _c
        return getattr(_c, name)
    if name in ("models", "serving", "parallel", "feature", "partition",
                "ops", "comm", "checkpoint", "profiling", "native",
                "train", "pyg"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
