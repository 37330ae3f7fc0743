"""Exception surface matching the reference (ceres.py ≈L963-1000).

The reference distinguishes *errors* from *empty results*: fetching an
unknown metric raises ``NodeNotFound``; fetching an empty time range of
a known metric returns a dense all-NULL series. We preserve that
distinction at the API layer (SURVEY.md §2 op #29).
"""


class CeresError(Exception):
    """Base class for all engine errors."""


class NodeNotFound(CeresError):
    """Metric does not exist in the catalog (ceres.py: NodeNotFound)."""


class NodeDeleted(CeresError):
    """Metric was deleted concurrently (ceres.py: NodeDeleted)."""


class InvalidRequest(CeresError):
    """Malformed read request, e.g. fromTime >= untilTime
    (ceres.py: InvalidRequest, raised by CeresSlice.read ≈L750)."""


class InvalidAggregationMethod(CeresError):
    """Aggregation method outside {average,sum,last,max,min}
    (ceres.py: InvalidAggregationMethod, raised by aggregate() ≈L1005)."""


class CorruptNode(CeresError):
    """Metric metadata unreadable (ceres.py: CorruptNode)."""

    def __init__(self, node, problem):
        Exception.__init__(self, problem)
        self.node = node
        self.problem = problem


class NoData(CeresError):
    """Read past end of data (ceres.py: NoData, CeresSlice.read ≈L760)."""


class SliceGapTooLarge(CeresError):
    """Internal in the reference (gap > MAX_SLICE_GAP=80 points forces a
    new slice, ceres.py ≈L45/L790). Kept for API parity; the sparse
    Parquet layout never needs to raise it."""


class SliceDeleted(CeresError):
    """Slice removed by concurrent maintenance (ceres.py: SliceDeleted).
    Append-only Parquet cannot race this way; kept for API parity."""
