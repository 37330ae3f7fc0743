"""Product-quantization (PQ) approximate nearest neighbor — the
memory-compressed scale path for similarity search, completing the
ANN family (brute / LSH / IVF / int8 / PQ) of north-star §2.2.

Design (the standard PQ construction: split the space, quantize each
subspace independently, score with asymmetric distance):

  1. **train**: vectors are L2-normalized (cosine ⇔ L2 on the unit
     sphere: ||a−b||² = 2 − 2·cos), the d dims split into ``m``
     subspaces of d/m dims; per subspace, ``k_sub`` centroids via the
     same bounded-sample deterministic Lloyd's as IVF — codebook is
     m × k_sub × (d/m), driver-trained on O(sample), broadcast.
  2. **encode**: every vector → m uint8 codes (nearest sub-centroid
     per subspace), stored as a ``binary`` column of m bytes. At
     d=64 float32 that is 256 B → 8 B per vector (32×): the index a
     1000-executor cluster keeps in memory when the raw vectors
     don't fit.
  3. **search (ADC)**: per query, the m × k_sub table of sub-distances
     is built ONCE; each candidate's approximate distance is then m
     table lookups + adds — numpy fancy-indexing over the whole
     Arrow batch, no per-candidate float math, inside mapInPandas.
  4. **refine**: the ADC top-``refine`` per query re-ranks with exact
     cosine against the original vectors (two-stage retrieval;
     ``refine`` is the recall dial). With ``refine`` ≥ corpus size
     the result is bit-identical to brute force — pytest pins that.

Scale shape: training is O(sample) on the driver; encode is one
narrow Arrow pass; search streams the code table once per query
BATCH (all queries scored against each batch simultaneously), emits
per-batch top-``refine`` only, and the exact re-rank touches
refine × n_queries rows. No shuffle anywhere except the final
per-query top-k window over refine-sized groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ceres_spark.operators.similarity import as_double, cosine_prenorm, norm

#: Hard cap on the query-set size for the driver-materialized ADC
#: paths (search_pq / ivfpq.search_ivfpq). The ADC tables are
#: nq × m × k_sub float64 built on the driver and closed into the
#: scan UDF; an unbounded query set would OOM the driver silently.
#: Callers with more queries should chunk the query DataFrame and
#: union the results — each chunk's scan is independent.
MAX_QUERIES = 4096


def bounded_query_rows(queries: DataFrame, cols: list[str],
                       max_queries: int = MAX_QUERIES) -> list:
    """Collect the query side under the bounded-query contract.

    Fetches at most ``max_queries + 1`` rows and raises if the extra
    row shows up — the failure mode is a clear error at the API
    boundary instead of a silent driver OOM."""
    rows = queries.select(*cols).limit(int(max_queries) + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"query set exceeds the bounded-query contract "
            f"(> {max_queries} rows); chunk the query DataFrame and "
            f"union the per-chunk results"
        )
    return rows


def exact_rerank(
    shortlist: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine re-rank of an ADC shortlist (query_id,
    neighbor_id) against the original vectors — the second stage of
    every two-stage retrieval here (PQ, IVF×PQ). Bit-identical to the
    brute-force scorer on the same pairs."""
    vecs = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(as_double(F.col(vec_col))).alias("_cn"),
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(as_double(F.col(vec_col))).alias("_qn"),
    )
    scored = (
        shortlist.join(vecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn(
            "cosine_sim",
            cosine_prenorm(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
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


def _normalized_sample(
    vectors: DataFrame, id_col: str, vec_col: str, sample_n: int
) -> np.ndarray:
    rows = (
        vectors.orderBy(id_col).limit(int(sample_n)).select(vec_col).collect()
    )
    S = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    n = np.linalg.norm(S, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return S / n


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 16384,
) -> list[list[list[float]]]:
    """Per-subspace deterministic Lloyd's on a bounded normalized
    sample (init = first k_sub sample rows, empty clusters keep their
    centroid — the IVF training contract, m times on d/m-dim slices).
    Returns codebooks[m][k_sub][d/m]."""
    if int(k_sub) > 256:
        # codes are stored uint8 — a larger codebook would silently
        # wrap argmin indices at encode time (mirrors the dim % m check)
        raise ValueError(f"k_sub={k_sub} > 256 cannot fit uint8 codes")
    S = _normalized_sample(vectors, id_col, vec_col, sample_n)
    d = S.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = []
    for j in range(m):
        Sj = S[:, j * sub : (j + 1) * sub]
        C = Sj[: int(k_sub)].copy()
        for _ in range(int(iters)):
            dist = (C * C).sum(axis=1) - 2.0 * (Sj @ C.T)
            assign = np.argmin(dist, axis=1)
            for li in range(len(C)):
                members = Sj[assign == li]
                if len(members):
                    C[li] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


#: trained codebooks keyed by caller identity — an index artifact,
#: same contract as ivf._CENTROID_CACHE (deterministic training ⇒
#: cache hit is bit-identical to retrain)
_PQ_CACHE: dict[tuple, list[list[list[float]]]] = {}


def train_pq_cached(
    vectors: DataFrame, cache_key: str, m: int = 8, k_sub: int = 16, **kw
) -> list[list[list[float]]]:
    key = (cache_key, m, k_sub, kw.get("sample_n", 16384))
    if key not in _PQ_CACHE:
        _PQ_CACHE[key] = train_pq(vectors, m=m, k_sub=k_sub, **kw)
    return _PQ_CACHE[key]


def encode_pq(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """(id, codes binary) — m bytes per vector. One Arrow-batched
    pass; per subspace a (batch × k_sub) matmul picks the nearest
    sub-centroid (argmin = first-min tie-break, everywhere).

    ``normalize=False`` skips the unit-sphere projection — the dial
    the integer-lattice portable twin uses so every distance addend
    stays integer-exact (production cosine search keeps the
    default)."""
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    sub = B[0].shape[1]

    @F.pandas_udf("binary")
    def codes(batch: pd.Series) -> pd.Series:
        V = np.vstack(batch.to_numpy()).astype(np.float64)
        if normalize:
            n = np.linalg.norm(V, axis=1, keepdims=True)
            n[n == 0] = 1.0
            V = V / n
        out = np.empty((len(V), m), dtype=np.uint8)
        for j in range(m):
            Vj = V[:, j * sub : (j + 1) * sub]
            C = B[j]
            dist = (C * C).sum(axis=1) - 2.0 * (Vj @ C.T)
            out[:, j] = np.argmin(dist, axis=1).astype(np.uint8)
        return pd.Series([row.tobytes() for row in out])

    return vectors.select(
        F.col(id_col).alias("vec_id"), codes(F.col(vec_col)).alias("codes")
    )


def search_pq(
    index_codes: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERIES,
) -> DataFrame:
    """ADC scan of the code table + exact cosine re-rank of the ADC
    top-``refine`` per query.

    The query set is bounded (ENFORCED — :func:`bounded_query_rows`
    raises past ``max_queries`` instead of silently OOMing the
    driver); its ADC tables are built driver-side once (nq × m ×
    k_sub floats) and closed over; each Arrow batch of codes scores
    ALL queries at once via np.take-based gather and emits only its
    per-query top-``refine`` — the global candidate set is then
    ≤ refine × nq × n_batches rows, re-ranked exactly.
    """
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    sub = B[0].shape[1]
    k_sub = B[0].shape[0]

    qrows = bounded_query_rows(queries, [id_col, vec_col], max_queries)
    qids = np.asarray([r[id_col] for r in qrows])
    Q = np.asarray([r[vec_col] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    # ADC tables: tables[q, j, c] = ||Qn[q]_j − codebook[j][c]||²
    tables = np.empty((len(Qn), m, k_sub), dtype=np.float64)
    for j in range(m):
        Qj = Qn[:, j * sub : (j + 1) * sub]
        C = B[j]
        tables[:, j, :] = (
            (Qj * Qj).sum(axis=1, keepdims=True)
            - 2.0 * (Qj @ C.T)
            + (C * C).sum(axis=1)
        )
    r = int(refine)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codes = np.frombuffer(
                b"".join(pdf["codes"].to_numpy()), dtype=np.uint8
            ).reshape(len(pdf), m)
            ids = pdf["vec_id"].to_numpy()
            # dist[q, v] = Σ_j tables[q, j, codes[v, j]]
            dist = np.zeros((len(tables), len(codes)))
            for j in range(m):
                dist += tables[:, j, :][:, codes[:, j]]
            top = min(r, dist.shape[1])
            part = np.argpartition(dist, top - 1, axis=1)[:, :top]
            out_q, out_id, out_d = [], [], []
            for qi in range(len(tables)):
                sel = part[qi]
                out_q.extend([qids[qi]] * len(sel))
                out_id.extend(ids[sel])
                out_d.extend(dist[qi, sel])
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    "neighbor_id": out_id,
                    "adc_dist": out_d,
                }
            )

    cand = index_codes.mapInPandas(
        scan, "query_id long, neighbor_id long, adc_dist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w_adc = Window.partitionBy("query_id").orderBy(
        "adc_dist", "neighbor_id"
    )
    shortlist = (
        cand.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= r)
        .select("query_id", "neighbor_id")
    )
    return exact_rerank(shortlist, vectors, queries, k, id_col, vec_col)


def topk_cosine_pq(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    m: int = 8,
    k_sub: int = 16,
    refine: int = 50,
    cache_key: str = "",
) -> DataFrame:
    """End-to-end PQ retrieval with the registry signature: train
    (cached), encode, ADC scan, exact re-rank."""
    q = queries if queries is not None else emb.filter(F.col("vec_id") < 5)
    books = train_pq_cached(emb, cache_key or "default", m=m, k_sub=k_sub)
    codes = encode_pq(emb, books)
    return search_pq(codes, emb, q, books, k=k, refine=refine)
