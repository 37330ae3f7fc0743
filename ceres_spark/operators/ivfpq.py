"""IVF×PQ — the composed production ANN index: IVF coarse lists of
PQ residual codes (the FAISS ``IVFPQ`` construction, composed from
this repo's two existing halves, ivf.py + pq.py).

Why the composition matters at 100 TB: IVF alone prunes the SCAN
(a query touches nprobe/k_lists of the data) but still re-ranks raw
float vectors; PQ alone compresses the TABLE (8 B/vector) but scans
all of it. Composed, a probe touches only nprobe partitions AND each
touched row costs m byte-lookups — the standard billion-scale
memory/recall trade.

Structure:
  1. **train**: coarse centroids via ivf.train_centroids (bounded
     deterministic sample); PQ codebooks trained on the RESIDUALS
     ``v_norm − centroid[list(v)]`` of that same sample — residual
     quantization is what makes per-list codes sharp (vectors in a
     list share the coarse part; PQ only has to encode the delta).
  2. **index**: every vector → ``(_list, codes)``: nearest-list
     assignment + m uint8 residual codes, one Arrow-batched pass.
     At scale: write partitioned by ``_list`` (the probe prunes
     parquet partitions — plan-asserted in tests/test_ivf.py).
  3. **search**: per query, rank lists (same numpy matmul as
     assignment), keep ``nprobe``; build one ADC table PER
     (query, probed list) from the query's residual against that
     list — nq × nprobe × m × k_sub floats, driver-built under the
     ENFORCED bounded-query contract (pq.bounded_query_rows). The
     scan filters the index to the probed lists (partition-prunable
     ``isin``), scores each Arrow batch with np gather per list, and
     emits per-batch top-``refine``; exact cosine re-ranks the
     global shortlist (pq.exact_rerank — bit-identical to brute on
     the same pairs, so full-probe + refine ≥ corpus == brute,
     pytest-pinned).

No shuffle anywhere except the shortlist window + re-rank join
(refine × nq rows); the code-table scan is map-only over pruned
partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ceres_spark.operators import ivf
from ceres_spark.operators.pq import (
    MAX_QUERIES,
    _normalized_sample,
    bounded_query_rows,
    exact_rerank,
)


def train_ivfpq(
    vectors: DataFrame,
    k_lists: int = 8,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 16384,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """(coarse centroids, residual PQ codebooks), both trained on the
    same bounded deterministic sample (first ``sample_n`` by id, the
    ivf/pq contract: fixed init, no RNG)."""
    if int(k_sub) > 256:
        # codes are stored uint8 — a larger codebook would silently
        # wrap argmin indices at encode time (mirrors the dim % m check)
        raise ValueError(f"k_sub={k_sub} > 256 cannot fit uint8 codes")
    centroids = ivf.train_centroids(
        vectors, k=k_lists, iters=iters, id_col=id_col, vec_col=vec_col,
        sample_n=sample_n,
    )
    S = _normalized_sample(vectors, id_col, vec_col, sample_n)
    C = np.asarray(centroids, dtype=np.float64)
    d = (C * C).sum(axis=1) - 2.0 * (S @ C.T)
    R = S - C[np.argmin(d, axis=1)]  # residuals vs assigned list
    dim = R.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        Rj = R[:, j * sub : (j + 1) * sub]
        B = Rj[: int(k_sub)].copy()
        for _ in range(int(iters)):
            dist = (B * B).sum(axis=1) - 2.0 * (Rj @ B.T)
            assign = np.argmin(dist, axis=1)
            for li in range(len(B)):
                members = Rj[assign == li]
                if len(members):
                    B[li] = members.mean(axis=0)
        books.append([[float(x) for x in b] for b in B])
    return centroids, books


#: index artifacts keyed by caller identity (same contract as
#: ivf._CENTROID_CACHE: deterministic training ⇒ hit == retrain)
_IVFPQ_CACHE: dict[tuple, tuple] = {}


def train_ivfpq_cached(
    vectors: DataFrame, cache_key: str, k_lists: int = 8, m: int = 8,
    k_sub: int = 16, **kw,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    key = (cache_key, k_lists, m, k_sub, kw.get("sample_n", 16384))
    if key not in _IVFPQ_CACHE:
        _IVFPQ_CACHE[key] = train_ivfpq(
            vectors, k_lists=k_lists, m=m, k_sub=k_sub, **kw
        )
    return _IVFPQ_CACHE[key]


def build_ivfpq(
    vectors: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, _list int, codes binary) — list assignment + m-byte
    residual codes in ONE Arrow pass (no shuffle; at scale write
    partitioned by ``_list``)."""
    C = np.asarray(centroids, dtype=np.float64)
    cc = (C * C).sum(axis=1)
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    sub = B[0].shape[1]
    if any(b.shape[0] > 256 for b in B):
        raise ValueError("codebook with > 256 centroids cannot fit uint8 codes")

    def assign_encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(V, axis=1, keepdims=True)
            n[n == 0] = 1.0
            V = V / n
            lists = np.argmin(cc - 2.0 * (V @ C.T), axis=1)
            R = V - C[lists]
            out = np.empty((len(V), m), dtype=np.uint8)
            for j in range(m):
                Rj = R[:, j * sub : (j + 1) * sub]
                Bj = B[j]
                dist = (Bj * Bj).sum(axis=1) - 2.0 * (Rj @ Bj.T)
                out[:, j] = np.argmin(dist, axis=1).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "_list": lists.astype(np.int32),
                    "codes": [row.tobytes() for row in out],
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        assign_encode, "vec_id long, _list int, codes binary"
    )


def search_ivfpq(
    index: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = MAX_QUERIES,
) -> DataFrame:
    """nprobe list probe → per-list residual ADC scan → exact cosine
    re-rank of the global top-``refine`` per query.

    The ``_list IN (probed)`` filter is applied BEFORE the scan UDF,
    so an index written ``partitionBy("_list")`` is read with parquet
    partition pruning — a probe touches nprobe/k_lists of the files
    (asserted in tests/test_ivf.py::test_ivfpq_probe_prunes_partitions).
    """
    C = np.asarray(centroids, dtype=np.float64)
    cc = (C * C).sum(axis=1)
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    sub = B[0].shape[1]
    k_sub = B[0].shape[0]
    np_, r = int(nprobe), int(refine)

    qrows = bounded_query_rows(queries, [id_col, vec_col], max_queries)
    qids = np.asarray([row[id_col] for row in qrows])
    Q = np.asarray([row[vec_col] for row in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    # stable argsort: ties to the lowest list index (the ivf contract)
    order = np.argsort(cc - 2.0 * (Qn @ C.T), axis=1, kind="stable")
    probes = order[:, :np_]  # (nq, nprobe)
    probed_lists = sorted({int(li) for row in probes for li in row})
    # per probed list: which queries probe it, and their ADC tables
    # built from the RESIDUAL q − centroid[list] (matches encoding)
    per_list: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for li in probed_lists:
        qsel = np.nonzero((probes == li).any(axis=1))[0]
        Rq = Qn[qsel] - C[li]  # (nsel, d)
        tables = np.empty((len(qsel), m, k_sub), dtype=np.float64)
        for j in range(m):
            Rj = Rq[:, j * sub : (j + 1) * sub]
            Bj = B[j]
            tables[:, j, :] = (
                (Rj * Rj).sum(axis=1, keepdims=True)
                - 2.0 * (Rj @ Bj.T)
                + (Bj * Bj).sum(axis=1)
            )
        per_list[li] = (qsel, tables)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codes = np.frombuffer(
                b"".join(pdf["codes"].to_numpy()), dtype=np.uint8
            ).reshape(len(pdf), m)
            ids = pdf["vec_id"].to_numpy()
            lvals = pdf["_list"].to_numpy()
            out_q, out_id, out_d = [], [], []
            for li in np.unique(lvals):
                hit = per_list.get(int(li))
                if hit is None:
                    continue
                qsel, tables = hit
                mask = lvals == li
                bc, bids = codes[mask], ids[mask]
                dist = np.zeros((len(qsel), len(bc)))
                for j in range(m):
                    dist += tables[:, j, :][:, bc[:, j]]
                top = min(r, dist.shape[1])
                part = np.argpartition(dist, top - 1, axis=1)[:, :top]
                for qi in range(len(qsel)):
                    sel = part[qi]
                    out_q.extend([qids[qsel[qi]]] * len(sel))
                    out_id.extend(bids[sel])
                    out_d.extend(dist[qi, sel])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_id, "adc_dist": out_d}
            )

    cand = (
        index.filter(F.col("_list").isin(probed_lists))  # partition-prunable
        .mapInPandas(scan, "query_id long, neighbor_id long, adc_dist double")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    shortlist = (
        cand.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= r)
        .select("query_id", "neighbor_id")
    )
    return exact_rerank(shortlist, vectors, queries, k, id_col, vec_col)


def topk_cosine_ivfpq(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    k_lists: int = 8,
    m: int = 8,
    k_sub: int = 16,
    nprobe: int = 4,
    refine: int = 50,
    cache_key: str = "",
) -> DataFrame:
    """End-to-end IVF×PQ retrieval with the registry signature:
    train (cached), build, probe+ADC scan, exact re-rank."""
    q = queries if queries is not None else emb.filter(F.col("vec_id") < 5)
    centroids, books = train_ivfpq_cached(
        emb, cache_key or "default", k_lists=k_lists, m=m, k_sub=k_sub
    )
    idx = build_ivfpq(emb, centroids, books)
    return search_ivfpq(
        idx, emb, q, centroids, books, k=k, nprobe=nprobe, refine=refine
    )
