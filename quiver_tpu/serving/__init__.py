from .neighbour_num import generate_neighbour_num
from .server import (
    RequestBatcher,
    HybridSampler,
    InferenceServer,
    ServerMetrics,
)

# Reference-compat alias (serving.py:236): the reference's _Debug server
# is the same server with latency/throughput accounting bolted on; here
# the ServerMetrics accounting is always on, so the two classes coincide.
InferenceServer_Debug = InferenceServer

__all__ = [
    "generate_neighbour_num",
    "RequestBatcher",
    "HybridSampler",
    "InferenceServer",
    "InferenceServer_Debug",
    "ServerMetrics",
]
