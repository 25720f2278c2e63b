"""PyG-flavored compatibility namespace (reference ``quiver.pyg``).

``GraphSageSampler`` is the reference's public sampler class
(srcs/python/quiver/pyg/sage_sampler.py:40); here it is the same object
as :class:`quiver_tpu.NeighborSampler`. ``MixedGraphSageSampler`` maps
to :class:`quiver_tpu.sampling.mixed.MixedSampler`.
"""
from ..sampling.sampler import NeighborSampler as GraphSageSampler
from ..sampling.sampler import NeighborSampler as AsyncNeighborSampler
from ..sampling.mixed import MixedSampler as MixedGraphSageSampler
from ..sampling.mixed import SampleJob

__all__ = ["GraphSageSampler", "MixedGraphSageSampler", "SampleJob",
           "AsyncNeighborSampler"]
