"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantizer scale path for similarity search (north-star §2.2: "an IVF
or LSH-bucketed variant as the scale path"; complements
similarity.topk_lsh).

Structure:
  1. **train**: k centroids via Lloyd's iterations over a BOUNDED
     deterministic sample (first ``sample_n`` vectors by id) in
     driver-side numpy — the FAISS approach: the coarse quantizer is
     trained on O(sample), never O(data), so driver memory is flat
     no matter how large the table is. Deterministic: fixed sample,
     fixed iteration count, float64 numpy; no RNG anywhere.
  2. **index**: each vector assigned to its nearest centroid's list
     (one int column — at scale this is the partition/bucket key).
     Assignment is distributed: one Arrow-batched pandas UDF doing a
     single (batch × k) matmul per batch. An earlier version built
     the k-way argmin as Catalyst expressions (k literal arrays ×
     64-dim HOF dot products); analysis + codegen of that tree cost
     more than the whole job at any scale — measured 3.4 s train +
     3.9 s search at sf0.1 vs ~1 s total for this numpy path.
  3. **search**: a query probes its ``nprobe`` nearest lists and
     re-ranks ONLY those lists' vectors with exact cosine
     (similarity.cosine_prenorm — bit-identical to the brute-force
     path, so full-probe == brute exactly).

At 100 TB the payoff is scan locality: lists are parquet partitions,
so a query touches nprobe/k of the data; the index build is one
narrow pass (no shuffle), and training cost is constant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ceres_spark.operators.similarity import as_double, cosine_prenorm, norm


def _dists_matrix(batch: pd.Series, C: np.ndarray, cc: np.ndarray) -> np.ndarray:
    """(n × k) squared-L2 rank matrix for one Arrow batch.

    ||v-c||² = v·v - 2 v·c + c·c; v·v is constant per row, so ranking
    by c·c - 2 v·c is equivalent and skips a pass."""
    V = np.vstack(batch.to_numpy()).astype(np.float64)
    return cc - 2.0 * (V @ C.T)


def _assign(vectors: DataFrame, centroids: list[list[float]],
            id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment by squared L2. Adds ``_list``.

    Ties break to the lowest centroid index (np.argmin = first min),
    matching the previous Catalyst array_position(min) semantics."""
    C = np.asarray(centroids, dtype=np.float64)
    cc = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def nearest(batch: pd.Series) -> pd.Series:
        d = _dists_matrix(batch, C, cc)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return vectors.withColumn("_list", nearest(F.col(vec_col)))


def train_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sample_n: int = 16384,
) -> list[list[float]]:
    """Deterministic Lloyd's on a bounded sample: init = first k
    sample vectors; empty clusters keep their previous centroid.

    The sample is the first ``sample_n`` rows by ``id_col`` — one
    small collect, after which every iteration is pure numpy on the
    driver. ``dim`` is kept for signature compatibility; the actual
    width comes from the data."""
    rows = (
        vectors.orderBy(id_col).limit(int(sample_n)).select(vec_col).collect()
    )
    S = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    C = S[:k].copy()
    for _ in range(int(iters)):
        d = (C * C).sum(axis=1) - 2.0 * (S @ C.T)
        lists = np.argmin(d, axis=1)
        for li in range(k):
            members = S[lists == li]
            if len(members):
                C[li] = members.mean(axis=0)
    return [[float(x) for x in c] for c in C]


#: trained coarse quantizers, keyed by caller-supplied identity.
#: Centroids are an INDEX ARTIFACT: in a deployed engine they're
#: trained once at index-build time and persisted next to the
#: partitioned lists, not re-trained per query. This cache is the
#: session-scope analogue (training is deterministic, so a cache hit
#: is bit-identical to a retrain).
_CENTROID_CACHE: dict[tuple, list[list[float]]] = {}


def train_centroids_cached(
    vectors: DataFrame,
    cache_key: str,
    k: int = 16,
    iters: int = 3,
    **kw,
) -> list[list[float]]:
    """Memoized :func:`train_centroids`. ``cache_key`` must identify
    the underlying table (e.g. its path) — the DataFrame object
    itself can't be the key because logically-equal plans hash
    differently."""
    key = (cache_key, k, iters, kw.get("sample_n", 16384))
    if key not in _CENTROID_CACHE:
        _CENTROID_CACHE[key] = train_centroids(
            vectors, k=k, iters=iters, **kw
        )
    return _CENTROID_CACHE[key]


def build_index(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectors + ``_list`` assignment + precomputed norm (at scale:
    write this partitioned by _list).

    (spread() was tried here and reverted: the assignment is one
    numpy matmul per Arrow batch — the exchange + 32-worker dispatch
    it adds costs more than the pass itself at any corpus the local
    bench sees, measured 0.88 s → 1.10 s on topk_cosine_ivf.)"""
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
    re-rank inside them. The query side is tiny and broadcast; the
    probe-list ranking is the same numpy matmul as assignment, with
    stable argsort so ties break to the lowest list index (matching
    the previous array_sort((d, i)) semantics)."""
    C = np.asarray(centroids, dtype=np.float64)
    cc = (C * C).sum(axis=1)
    np_ = int(nprobe)

    @F.pandas_udf("array<int>")
    def probe_lists(batch: pd.Series) -> pd.Series:
        d = _dists_matrix(batch, C, cc)
        idx = np.argsort(d, axis=1, kind="stable")[:, :np_]
        return pd.Series(list(idx.astype(np.int32)))

    qp = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(as_double(F.col(vec_col))).alias("_qn"),
        F.explode(probe_lists(F.col(vec_col))).alias("_list"),
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
