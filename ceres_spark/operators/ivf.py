"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantizer scale path for similarity search (north-star §2.2: "an IVF
or LSH-bucketed variant as the scale path"; complements
similarity.topk_lsh).

Structure:
  1. **train**: k centroids via Lloyd's iterations, fully as
     DataFrame ops — assign = crossJoin(broadcast centroids) + min
     distance, update = groupBy(cluster) avg per dimension.
     Deterministic: init takes the first k vectors by id, iteration
     count is fixed; no RNG anywhere.
  2. **index**: each vector assigned to its nearest centroid's list
     (one int column — at scale this is the partition/bucket key).
  3. **search**: a query probes its ``nprobe`` nearest lists and
     re-ranks ONLY those lists' vectors with exact cosine.

At 100 TB the payoff is scan locality: lists are parquet partitions,
so a query touches nprobe/k of the data. Lloyd's here runs a fixed
small number of passes over the data — each pass one broadcast join
+ one groupBy, no collect of vectors to the driver (centroids
themselves are tiny and DO live on the driver between passes).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ceres_spark.operators.similarity import as_double, cosine_prenorm, dot, norm


def _assign(vectors: DataFrame, centroids: list[list[float]],
            id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment by squared L2. Adds ``_list``.

    Distances go into ONE array expression and argmin reads it twice
    (min + position): a chained when(d_i < best)-fold would nest each
    distance into every later branch — ~2^k expression inlining (the
    Catalyst no-let-binding trap; measured 29 s vs 3 s at k=8)."""
    vd = as_double(F.col(vec_col))
    ds = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        # ||v-c||² = v·v - 2 v·c + c·c ; v·v constant per row → rank
        # by c·c - 2 v·c
        cc = float(sum(x * x for x in c))
        ds.append(F.lit(cc) - 2.0 * dot(vd, carr))
    dists = F.array(*ds)
    best = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return vectors.withColumn("_list", best)


def train_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[float]]:
    """Deterministic Lloyd's: init = first k vectors by id; each
    iteration assigns distributed + averages per list (per-dimension
    avg via posexplode — one shuffle on (list, dim))."""
    init = (
        vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init]
    for _ in range(int(iters)):
        assigned = _assign(vectors, centroids, id_col, vec_col)
        means = (
            assigned.select(
                "_list", F.posexplode(as_double(F.col(vec_col))).alias("_d", "_x")
            )
            .groupBy("_list", "_d")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty lists keep old centroid
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            by_list.setdefault(r["_list"], {})[r["_d"]] = r["_m"]
        for li, dims in by_list.items():
            new[li] = [dims[d] for d in range(dim)]
        centroids = new
    return centroids


def build_index(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectors + ``_list`` assignment + precomputed norm (at scale:
    write this partitioned by _list)."""
    return _assign(vectors, centroids, id_col, vec_col).withColumn(
        "_norm", norm(as_double(F.col(vec_col)))
    )


def search(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe each query's ``nprobe`` nearest lists, exact-cosine
    re-rank inside them. Query→list routing happens in the plan (the
    query side is tiny and broadcast)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(as_double(F.col(vec_col))).alias("_qn"),
    )
    qa = _assign(
        q.withColumnRenamed("_qv", vec_col), centroids, "query_id", vec_col
    )
    # nprobe lists per query: rank all centroids by distance
    probes = []
    vd = as_double(F.col(vec_col))
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        cc = float(sum(x * x for x in c))
        probes.append(
            F.struct((F.lit(cc) - 2.0 * dot(vd, carr)).alias("d"),
                     F.lit(i).alias("i"))
        )
    ranked = F.array_sort(F.array(*probes))
    qp = qa.select(
        "query_id",
        F.col(vec_col).alias("_qv"),
        "_qn" if "_qn" in qa.columns else norm(vd).alias("_qn"),
        F.explode(
            F.slice(F.transform(ranked, lambda s: s["i"]), 1, nprobe)
        ).alias("_list"),
    )
    cands = index.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        "_list",
    )
    scored = (
        cands.join(F.broadcast(qp), "_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
