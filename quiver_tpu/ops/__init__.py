from .unique import union_reindex, union_reindex_dense, union_reindex_fused
from .segment import segment_sum, segment_mean, segment_max, segment_softmax
from .gather import gather_rows, gather_rows_pallas
from .spmm import (spmm_csr, spmm_csr_reference, CSRBlock, full_graph_csr,
                   gat_csr, gat_csr_reference, BucketPlan, build_bucket_plan,
                   spmm_csr_dma, gat_csr_dma)
from .lane_kernels import lane_aggregate, lane_aggregate_rel
from .gat_kernels import flash_gat_lane

__all__ = [
    "union_reindex",
    "union_reindex_dense",
    "union_reindex_fused",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "gather_rows",
    "gather_rows_pallas",
    "spmm_csr",
    "spmm_csr_reference",
    "CSRBlock",
    "full_graph_csr",
    "lane_aggregate",
    "lane_aggregate_rel",
    "flash_gat_lane",
]
