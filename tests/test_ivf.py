"""IVF ANN: deterministic training, index/search recall vs brute."""

import pytest
from pyspark.sql import functions as F

import ceres_spark.operators.ivf as ivf
import ceres_spark.operators.similarity as sim


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(spark, emb):
    return ivf.train_centroids(emb, k=8, iters=2)


def test_training_deterministic(spark, emb, centroids):
    again = ivf.train_centroids(emb, k=8, iters=2)
    assert centroids == again


def test_index_partitions_all_vectors(spark, emb, centroids):
    idx = ivf.build_index(emb, centroids)
    assert idx.count() == emb.count()
    lists = idx.groupBy("_list").count().collect()
    assert len(lists) >= 2  # data actually spreads over lists
    assert sum(r["count"] for r in lists) == emb.count()


def test_search_recall_vs_brute(spark, emb, centroids):
    queries = emb.filter(F.col("vec_id") < 10)
    idx = ivf.build_index(emb, centroids)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.topk_brute(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.search(idx, queries, centroids, k=10, nprobe=4).collect()
    }
    recall = len(approx & brute) / len(brute)
    # nprobe=4 of 8 lists scans ~half the data; on weakly-clustered
    # fixture vectors expect well above that share of the true top-k
    assert recall >= 0.5, f"ivf recall {recall}"


def test_full_probe_equals_brute(spark, emb, centroids):
    # probing ALL lists must recover the exact brute-force top-k
    queries = emb.filter(F.col("vec_id") < 5)
    idx = ivf.build_index(emb, centroids)
    brute = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in sim.topk_brute(emb, queries, k=10)
        .select("query_id", "neighbor_id", "rank")
        .collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf.search(idx, queries, centroids, k=10, nprobe=8).collect()
    }
    assert full == brute


def test_centroid_cache_hit_is_identical(spark, emb):
    import ceres_spark.operators.ivf as ivf

    ivf._CENTROID_CACHE.clear()
    a = ivf.train_centroids_cached(emb, "k1", k=4, iters=1)
    b = ivf.train_centroids_cached(emb, "k1", k=4, iters=1)
    assert a is b                       # second call: no Spark job at all
    c = ivf.train_centroids_cached(emb, "k1", k=8, iters=1)
    assert len(c) == 8                  # different params → distinct entry


# ----------------------------------------------------------- PQ-ADC

def test_pq_full_refine_equals_brute(spark):
    import ceres_spark.operators.pq as pq
    import ceres_spark.operators.similarity as sim
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq.topk_cosine_pq(
            emb, q, k=10, refine=n, cache_key="t_full"
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sim.topk_brute(emb, q, k=10).collect()
    }
    # refine >= corpus ⇒ exact re-rank covers everything ⇒ brute-equal
    assert got == want


def test_pq_recall_with_small_refine(spark):
    import ceres_spark.operators.pq as pq
    import ceres_spark.operators.similarity as sim
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in pq.topk_cosine_pq(
            emb, q, k=10, refine=50, cache_key="t_small"
        ).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.topk_brute(emb, q, k=10).collect()
    }
    assert len(got & want) / len(want) >= 0.5


def test_pq_codes_are_m_bytes_and_deterministic(spark):
    import ceres_spark.operators.pq as pq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq.train_pq(emb, m=8, k_sub=16)
    a = {r["vec_id"]: r["codes"] for r in pq.encode_pq(emb, books).collect()}
    b = {r["vec_id"]: r["codes"] for r in pq.encode_pq(emb, books).collect()}
    assert a == b
    assert all(len(c) == 8 for c in a.values())


def test_pq_bounded_query_contract_raises(spark):
    """An oversized query set must FAIL LOUDLY at the API boundary,
    not silently collect() the driver into OOM (the ADC tables are
    nq × m × k_sub driver-side floats)."""
    import ceres_spark.operators.pq as pq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq.train_pq_cached(emb, "t_bound", m=8, k_sub=16)
    codes = pq.encode_pq(emb, books)
    with pytest.raises(ValueError, match="bounded-query contract"):
        pq.search_pq(codes, emb, emb, books, k=5, max_queries=10).collect()
    # at the cap exactly: no raise
    small = emb.filter(F.col("vec_id") < 3)
    out = pq.search_pq(codes, emb, small, books, k=5, max_queries=3)
    assert out.count() > 0


# ------------------------------------------------------- IVF × PQ

def test_ivfpq_full_probe_full_refine_equals_brute(spark):
    """nprobe = all lists and refine >= corpus ⇒ the composed index
    degrades to exact brute force (every vector reached, exact
    re-rank covers the whole shortlist)."""
    import ceres_spark.operators.ivfpq as ivfpq
    import ceres_spark.operators.similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivfpq.topk_cosine_ivfpq(
            emb, q, k=10, k_lists=8, nprobe=8, refine=n, cache_key="t_full"
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sim.topk_brute(emb, q, k=10).collect()
    }
    assert got == want


def test_ivfpq_recall_with_pruned_probe(spark):
    import ceres_spark.operators.ivfpq as ivfpq
    import ceres_spark.operators.similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq.topk_cosine_ivfpq(
            emb, q, k=10, k_lists=8, nprobe=4, refine=50, cache_key="t_rec"
        ).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.topk_brute(emb, q, k=10).collect()
    }
    assert len(got & want) / len(want) >= 0.5


def test_ivfpq_codes_and_lists_deterministic(spark):
    import ceres_spark.operators.ivfpq as ivfpq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, books = ivfpq.train_ivfpq(emb, k_lists=8, m=8, k_sub=16)
    a = {
        r["vec_id"]: (r["_list"], r["codes"])
        for r in ivfpq.build_ivfpq(emb, cents, books).collect()
    }
    b = {
        r["vec_id"]: (r["_list"], r["codes"])
        for r in ivfpq.build_ivfpq(emb, cents, books).collect()
    }
    assert a == b
    assert all(len(c) == 8 for _l, c in a.values())
    assert len({l for l, _c in a.values()}) >= 2  # data spreads over lists


def test_ivfpq_probe_prunes_partitions(spark, tmp_path):
    """The composed-index scale claim: an index written partitionBy
    ('_list') is probed with parquet PartitionFilters — the search
    plan reads only the nprobe lists' files."""
    import contextlib
    import io

    import ceres_spark.operators.ivfpq as ivfpq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, books = ivfpq.train_ivfpq(emb, k_lists=8, m=8, k_sub=16)
    path = str(tmp_path / "ivfpq_index")
    ivfpq.build_ivfpq(emb, cents, books).write.mode("overwrite").partitionBy(
        "_list"
    ).parquet(path)
    idx = spark.read.parquet(path)
    q = emb.filter(F.col("vec_id") < 3)
    out = ivfpq.search_ivfpq(idx, emb, q, cents, books, k=5, nprobe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "_list" in seg, plan
    assert out.count() > 0


def test_ivfpq_bounded_query_contract_raises(spark):
    import ceres_spark.operators.ivfpq as ivfpq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, books = ivfpq.train_ivfpq(emb, k_lists=4, m=8, k_sub=16)
    idx = ivfpq.build_ivfpq(emb, cents, books)
    with pytest.raises(ValueError, match="bounded-query contract"):
        ivfpq.search_ivfpq(
            idx, emb, emb, cents, books, k=5, max_queries=10
        ).collect()


def test_ivf_lists_prune_as_partitions(spark, tmp_path):
    """The IVF scale claim made concrete: lists written as parquet
    partitions, a probe of nprobe lists reads ONLY those partitions
    (PartitionFilters in the scan, not a full-table filter)."""
    import io, contextlib
    import ceres_spark.operators.ivf as ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = ivf.train_centroids(emb, k=8, iters=1)
    idx = ivf.build_index(emb, centroids)
    path = str(tmp_path / "ivf_index")
    idx.write.mode("overwrite").partitionBy("_list").parquet(path)

    probe = spark.read.parquet(path).filter("_list IN (0, 3)")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "_list" in seg, plan
    # and the pruned read returns exactly those lists' vectors
    lists = {r["_list"] for r in probe.select("_list").distinct().collect()}
    assert lists <= {0, 3}


def test_pq_codebook_size_over_256_raises(spark):
    # ADVICE r3: uint8 codes — k_sub > 256 would silently wrap argmin
    # indices at encode time; the trainers must refuse up front
    import ceres_spark.operators.ivfpq as ivfpq
    import ceres_spark.operators.pq as pq

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="256"):
        pq.train_pq(vecs, m=2, k_sub=257)
    with pytest.raises(ValueError, match="256"):
        ivfpq.train_ivfpq(vecs, k_lists=2, m=2, k_sub=257)
