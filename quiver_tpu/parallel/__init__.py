from .data_parallel import (
    stack_batches,
    replicate,
    shard_leading,
    make_dp_train_step,
    unstack_device,
)
from .dist_sampler import (DistNeighborSampler, build_graph_shards,
                           make_dist_train_step, partition_feature_shards)

__all__ = [
    "stack_batches",
    "replicate",
    "shard_leading",
    "make_dp_train_step",
    "unstack_device",
    "DistNeighborSampler",
    "build_graph_shards",
    "make_dist_train_step",
    "partition_feature_shards",
]
