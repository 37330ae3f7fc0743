"""ceres_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of graphite-project/ceres.

Ceres (reference: ceres.py, ~1,070 lines) is a file-based time-series
store: hierarchical metric trees, fixed-interval float64 slices,
5 null-skipping aggregation methods, rollup/retention maintenance.
This package re-expresses every one of those capabilities Spark-first
(SURVEY.md §2 is the coverage checklist):

- data model: one tall fact table ``(metric string, ts timestamp,
  value double)`` stored sparse in Parquet; gaps become explicit NULL
  rows only at read time (densify) — see ``operators/series.py``.
- write path: append-only + last-writer-wins dedup on the read path
  (``operators/compact.py``) replacing ceres's in-place slice writes.
- read path: predicate-pushdown Parquet scans replace O(1) positional
  slice seeks; window aggregation replaces ``aggregateSeries``.
- maintenance: rollup/retention/compaction batch jobs
  (``operators/retention.py``) replace plugins/maintenance/*.
- tree/node API: ``tree.py`` gives a CeresTree/CeresNode-compatible
  surface (create/store/fetch/find + exception parity).
- LLM-pipeline extensions (north star): dedup, similarity search,
  text analysis, multimodal plumbing under ``operators/``.
"""

from ceres_spark.errors import (
    CeresError,
    CorruptNode,
    InvalidAggregationMethod,
    InvalidRequest,
    NodeDeleted,
    NodeNotFound,
    NoData,
    SliceDeleted,
    SliceGapTooLarge,
)

__all__ = [
    "CeresError",
    "CorruptNode",
    "InvalidAggregationMethod",
    "InvalidRequest",
    "NodeDeleted",
    "NodeNotFound",
    "NoData",
    "SliceDeleted",
    "SliceGapTooLarge",
]

__version__ = "0.1.0"
