"""Range (interval) join — the second named custom operator Spark
lacks as a first-class node (after as-of, SURVEY.md §2.2 guidance).

Problem shape: probe rows carry a scalar; build rows carry
``[lo, hi)`` intervals; match on containment (non-equi). Naively
Spark plans ``BroadcastNestedLoopJoin`` — fine for a broadcastable
band table, quadratic death otherwise.

Scale path implemented here: **bin the intervals**. Each interval is
exploded to the fixed-width bins it overlaps; probes compute their
bin with integer math. The join becomes an EQUI-join on bin (hash,
shuffle-free when the binned build side broadcasts) plus a residual
containment filter. Bin width trades replication (wide intervals →
many bins) against bucket selectivity — pick ~median interval width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    probe: DataFrame,
    build: DataFrame,
    probe_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join probe rows to intervals containing them
    (``lo <= probe_col < hi``).

    With ``bin_width`` set, both sides get integer bin keys and the
    join is equi-on-bin + residual filter (the scalable plan). Without
    it, a plain non-equi join (Catalyst → broadcast nested loop; only
    sane when ``build`` is small)."""
    cond = (probe[probe_col] >= build[lo_col]) & (
        probe[probe_col] < build[hi_col]
    )
    if bin_width is None:
        return probe.join(F.broadcast(build), cond, how)
    w = float(bin_width)
    binned_build = build.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive: last overlapped bin is for hi-ε
                F.floor((F.col(hi_col) - 1e-9) / w).cast("long"),
            )
        ),
    )
    binned_probe = probe.withColumn(
        "_bin", F.floor(F.col(probe_col) / w).cast("long")
    )
    joined = binned_probe.join(
        F.broadcast(binned_build),
        on=[binned_probe["_bin"] == binned_build["_bin"]],
        how=how,
    ).filter(cond)
    return joined.drop("_bin")
