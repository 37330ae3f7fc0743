"""Multi-resolution read reconciliation (op #13).

Reference: inside ``CeresNode.read`` (ceres.py ≈L530-585) a node may
hold slices at different timeSteps. Walking newest→oldest, the first
slice with data fixes the result step; if an older *coarser* slice is
then encountered, the accumulated finer result is re-aggregated up to
the coarser step (via ``aggregateSeries`` semantics), so a read that
touches any coarse archive comes back entirely at the coarsest step
touched. Where two resolutions cover the same instant, the newer
(finer, more recently written) data wins.

Spark-native: resolutions are separate tables (``points/step=60``,
``points/step=300``, …) maintained by the rollup job. A cross-
resolution read is:

1. pick the result step = coarsest resolution whose data the range
   touches (``choose_resolution`` — a cheap min/max probe per table);
2. aggregate each finer table's in-range data up to the result step
   (one shuffle each, map-side combined);
3. reconcile finest-wins per bucket via priority coalesce — a full
   outer join on (metric, ts) across resolutions, finest first;
4. densify to the dense ceres result.

At scale each per-resolution scan is partition-pruned independently,
and the reconcile join runs on bucket-cardinality rows (range/step),
not raw points.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ceres_spark.operators.aggregate import aggregate_series
from ceres_spark.operators.series import densify


def choose_resolution(
    tables: dict[int, DataFrame], from_time: int, until_time: int
) -> int:
    """Coarsest step whose table holds data inside [from, until) —
    the step the reference's newest→oldest walk would settle on.
    Cheap: one min/max aggregate per resolution table."""
    chosen = None
    for step in sorted(tables):
        ext = tables[step].agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        if ext["lo"] is None:
            continue
        if ext["lo"] < until_time and ext["hi"] >= from_time:
            chosen = step  # keep climbing — coarsest touched wins
    if chosen is None:
        chosen = min(tables)  # no data anywhere: dense all-NULL at finest
    return chosen


def read_multi_resolution(
    tables: dict[int, DataFrame],
    metrics: DataFrame,
    from_time: int,
    until_time: int,
    method: str = "average",
    result_step: int | None = None,
) -> DataFrame:
    """Dense fetch across resolution tables, finest-data-wins.

    ``tables``: step → deduped points (metric, ts, value). Pass
    ``result_step`` explicitly for a deterministic plan (oracle
    queries); omit it to let ``choose_resolution`` probe.
    """
    if result_step is None:
        result_step = choose_resolution(tables, from_time, until_time)
    step = int(result_step)
    from_q = int(from_time) - (int(from_time) % step)
    until_q = int(until_time) - (int(until_time) % step)

    per_res: list[DataFrame] = []
    for s in sorted(tables):  # finest first = highest priority
        if s > step:
            continue  # coarser than the result: reference never
            # downscales a coarse archive below its own step
        scoped = tables[s].join(F.broadcast(metrics), "metric").filter(
            (F.col("ts") >= from_q) & (F.col("ts") < until_q)
        )
        if s == step:
            # already on the result grid: pass through untouched — no
            # shuffle, and no value drift from re-aggregating
            per_res.append(scoped.select("metric", "ts", "value"))
        else:
            per_res.append(aggregate_series(scoped, method, step))

    def reconcile(fine: DataFrame, coarse: DataFrame) -> DataFrame:
        f = fine.select("metric", "ts", F.col("value").alias("_f"))
        c = coarse.select("metric", "ts", F.col("value").alias("_c"))
        return (
            f.join(c, ["metric", "ts"], "full_outer")
            .select(
                "metric", "ts", F.coalesce("_f", "_c").alias("value")
            )
        )

    merged = reduce(reconcile, per_res)
    return densify(merged, metrics, from_q, until_q, step)
