"""Triangle sharding for blocked all-pairs operators.

A blocked pairwise op (`applyInPandas` per block) needs the whole
block in one task. When a block outgrows executor memory, split it
into S shards and run one task per unordered shard pair: each row is
replicated into the S groups it participates in, each group holds at
most 2·n/S rows, and every pair is scorable in EXACTLY one group —
same-shard pairs in the diagonal group (s, s), cross-shard pairs in
their sorted (a, b) group. S(S+1)/2 tasks of (2n/S)² work ≈ 2× the
unsharded flops for an S×/2 drop in peak task memory.

Used by similarity.neardup_pairs_blocked and
dedup.jaccard_pairs_vectorized (`shards=S`); both prove sharded ==
unsharded bit-identically in pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_shard(df: DataFrame, id_col: str, shards: int) -> DataFrame:
    """Replicate each row into its shard-pair groups: adds ``_sh``
    (the row's shard, a deterministic hash of ``id_col``) and the
    group keys ``_ga <= _gb``. Group downstream by
    ``(block, _ga, _gb)``."""
    S = int(shards)
    sh = F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(S)).cast("int")
    groups = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.least(F.col("_sh"), F.lit(t)).alias("ga"),
                    F.greatest(F.col("_sh"), F.lit(t)).alias("gb"),
                )
                for t in range(S)
            ]
        )
    )
    return (
        df.withColumn("_sh", sh)
        .withColumn("_gp", F.explode(groups))
        .select(
            *df.columns,
            "_sh",
            F.col("_gp.ga").alias("_ga"),
            F.col("_gp.gb").alias("_gb"),
        )
    )


def owned_pair_mask(
    pdf: pd.DataFrame, ia: np.ndarray, ib: np.ndarray
) -> np.ndarray:
    """True for index pairs this shard-pair group OWNS (their sorted
    shard pair equals the group key) — apply inside the scoring
    function so no pair is emitted twice across groups."""
    ga = int(pdf["_ga"].iloc[0])
    gb = int(pdf["_gb"].iloc[0])
    shs = pdf["_sh"].to_numpy()
    lo = np.minimum(shs[ia], shs[ib])
    hi = np.maximum(shs[ia], shs[ib])
    return (lo == ga) & (hi == gb)
