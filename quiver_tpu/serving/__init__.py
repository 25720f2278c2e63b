from .neighbour_num import generate_neighbour_num
from .server import (
    RequestBatcher,
    HybridSampler,
    InferenceServer,
    ServerMetrics,
)

__all__ = [
    "generate_neighbour_num",
    "RequestBatcher",
    "HybridSampler",
    "InferenceServer",
    "ServerMetrics",
]
