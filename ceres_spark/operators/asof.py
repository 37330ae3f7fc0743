"""As-of join — the canonical "operator Spark lacks" custom op.

Semantics: for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same ``by`` key (time-series
point-in-time join). DuckDB has native ``ASOF JOIN``; Spark has no
built-in, so we express it as a composition of existing DataFrame
ops (preferred over a Pandas UDF — stays in Tungsten):

    union(left tagged, right tagged)
      → window partitionBy(by) orderBy(ts, side)
      → last(right_value, ignorenulls=True) over rows ≤ current
      → keep left rows

One shuffle on ``by`` (the window), no join at all — this is the
standard scalable formulation: each partition is scanned once in
time order, exactly what a merge-based as-of join does, and skew in
``by`` is AQE's problem like any window.

Tie rule: a right row AT the same ts as the left row is visible to
it (<=, DuckDB ASOF default); among equal right ts the last by
``seq_col`` wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    seq_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time join: left rows + latest right ``value_cols`` at
    or before each left ``ts`` (NULL when no prior right row)."""
    l_tag = left.select(
        F.col(by),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    order_seq = (
        F.col(seq_col) if seq_col and seq_col in right.columns else F.lit(0)
    )
    r_tag = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(
            l_tag.schema["_lrow"].dataType
        ).alias("_lrow"),
    ).withColumn("_seq", order_seq)
    l_tag = l_tag.withColumn("_seq", F.lit(0))

    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # same-ts right value is visible to the left row (<= semantics)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    ).filter(F.col("_side") == 1)
    out = filled.select(
        "_lrow.*",
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
