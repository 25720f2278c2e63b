from .unique import union_reindex
from .segment import segment_sum, segment_mean, segment_max, segment_softmax
from .gather import gather_rows, gather_rows_pallas

__all__ = [
    "union_reindex",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "gather_rows",
    "gather_rows_pallas",
]
