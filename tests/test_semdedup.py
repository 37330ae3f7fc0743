"""semantic_dedup must equal a pure-numpy reference of the same
spec (assign to trained centroids → per-cluster ≥tau cosine
components → min-id representative) and be partitioning-independent.
"""

import numpy as np
import pytest

import ceres_spark.operators.ivf as ivf
import ceres_spark.operators.semdedup as sd


def make_vectors(spark, n=60, dim=8, seed=7, dup_every=5):
    rng = np.random.RandomState(seed)
    V = rng.randn(n, dim)
    # plant exact/near duplicates: every dup_every-th vector is a
    # tiny perturbation of its predecessor
    for i in range(1, n):
        if i % dup_every == 0:
            V[i] = V[i - 1] * 1.0001
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ),
        V,
    )


def ref_semdedup(V, centroids, tau):
    C = np.asarray(centroids)
    d = (C * C).sum(axis=1) - 2.0 * (V @ C.T)
    lists = np.argmin(d, axis=1)
    out = {}
    for li in np.unique(lists):
        ids = np.nonzero(lists == li)[0]
        U = V[ids] / np.linalg.norm(V[ids], axis=1)[:, None]
        sim = U @ U.T
        # naive O(n³) closure is fine at test size
        adj = sim >= tau
        comp = {i: i for i in range(len(ids))}
        changed = True
        while changed:
            changed = False
            for a in range(len(ids)):
                for b in range(len(ids)):
                    if adj[a, b] and comp[b] < comp[a]:
                        comp[a] = comp[b]
                        changed = True
        for a in range(len(ids)):
            out[int(ids[a])] = (int(li), int(ids[comp[a]]))
    return out


@pytest.fixture(scope="module")
def planted(spark):
    df, V = make_vectors(spark)
    return df, V


def test_matches_numpy_reference(spark, planted):
    df, V = planted
    cents = ivf.train_centroids_cached(df, "semdedup-test", k=4)
    want = ref_semdedup(V, cents, 0.95)
    got = {
        r["vec_id"]: (r["cluster"], r["group_head"], r["is_kept"])
        for r in sd.semantic_dedup(
            df, tau=0.95, k=4, cache_key="semdedup-test"
        ).collect()
    }
    assert len(got) == len(want)
    for vid, (cl, head) in want.items():
        assert got[vid] == (cl, head, vid == head)


def test_partitioning_invariance(spark, planted):
    df, _ = planted
    a = sorted(
        map(
            tuple,
            sd.semantic_dedup(
                df.repartition(1), tau=0.95, k=4, cache_key="semdedup-test"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sd.semantic_dedup(
                df.repartition(7, "vec_id"),
                tau=0.95,
                k=4,
                cache_key="semdedup-test",
            ).collect(),
        )
    )
    assert a == b


def test_planted_dups_dropped(spark, planted):
    df, _ = planted
    res = sd.semantic_dedup(
        df, tau=0.999, k=4, cache_key="semdedup-test"
    ).collect()
    dropped = [r for r in res if not r["is_kept"]]
    # the planted near-identical pairs (i-1, i) must collapse: at
    # least one drop per planted pair, head is always the lower id
    assert len(dropped) >= 10
    for r in dropped:
        assert r["group_head"] < r["vec_id"]
    # exactly one kept representative per group
    heads = {r["group_head"] for r in res}
    for r in res:
        if r["vec_id"] in heads:
            assert r["is_kept"] == (r["vec_id"] == r["group_head"])


def test_oversized_cluster_raises(spark, planted):
    import pytest as _pt

    df, _ = planted
    with _pt.raises(Exception, match="max_cluster_rows"):
        sd.semantic_dedup(
            df, tau=0.95, k=4, cache_key="semdedup-test",
            max_cluster_rows=3,
        ).collect()


def test_target_cluster_rows_scales_k(spark, planted):
    df, _ = planted  # 60 vectors
    # target 10 rows/cluster → k = ceil(60/10) = 6 clusters minimum
    res = sd.semantic_dedup(
        df, tau=0.95, k=2, cache_key="semdedup-test-dial",
        target_cluster_rows=10,
    )
    n_clusters = res.select("cluster").distinct().count()
    assert n_clusters >= 4  # 6 trained; some may be empty
    # and the explicit k still wins when it is larger
    res2 = sd.semantic_dedup(
        df, tau=0.95, k=8, cache_key="semdedup-test-dial8",
        target_cluster_rows=60,
    )
    assert res2.select("cluster").distinct().count() >= 5


def test_adversarial_all_duplicates_corpus(spark):
    """VERDICT r3 #9: the pathological corpus — EVERY vector identical,
    so k-means collapses everything into one cluster no matter how k
    is dialed. Below the cap: one global group, head = min id. Above
    the cap: the loud cap error (not an OOM) is what surfaces, even
    with the auto-k dial engaged."""
    import pytest as _pt

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    # under the cap: the all-dup corpus collapses to one kept head
    res = sd.semantic_dedup(
        df, tau=0.95, k=8, cache_key="semdedup-alldup",
        target_cluster_rows=5,       # dial asks for 8 clusters...
    ).collect()
    assert {r["group_head"] for r in res} == {0}
    assert sum(r["is_kept"] for r in res) == 1
    # ...but identical vectors can't be split: over the cap the
    # guard must fire with the actionable message, not an OOM
    with _pt.raises(Exception, match="max_cluster_rows"):
        sd.semantic_dedup(
            df, tau=0.95, k=8, cache_key="semdedup-alldup-cap",
            target_cluster_rows=5, max_cluster_rows=10,
        ).collect()
