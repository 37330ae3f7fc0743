"""Salted and bucketed joins — correctness + plan-shape assertions."""

import re

from pyspark.sql import functions as F

import ceres_spark.operators.join_strategies as js
from tests.test_plans import plan_of


def test_salted_join_matches_plain_join(spark):
    # skewed big side: key 'hot' is 90% of rows
    big = spark.createDataFrame(
        [("hot" if i % 10 else f"k{i}", i) for i in range(1000)],
        "key string, payload int",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k10", 2.0), ("k20", 3.0)], "key string, weight double"
    )
    plain = big.join(small, "key").groupBy("key").agg(
        F.count("*").alias("n"), F.sum("weight").alias("w")
    )
    salted = js.salted_join(big, small, "key").groupBy("key").agg(
        F.count("*").alias("n"), F.sum("weight").alias("w")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(100)], "key string, payload int"
    )
    small = spark.createDataFrame([("hot", 1.0)], "key string, weight double")
    joined = js.salted_join(big, small, "key", salt=8)
    # pre-drop, the join key was (key, _salt): the single hot key is
    # spread across up to 8 salt partitions; verify via distinct salt
    # count on the salted big side
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).cast(
            "int"
        ),
    )
    assert salted_big.select("_salt").distinct().count() > 1
    assert joined.count() == 100


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is set at session build (session.py); the
    # in-memory catalog forgets tables across sessions but their
    # directories persist — clear both before writing
    import shutil

    for t in ("t_orders_b", "t_items_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    orders = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    items = spark.range(0, 3000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("b")
    )
    js.write_bucketed(orders, "t_orders_b", "k", buckets=4)
    js.write_bucketed(items, "t_items_b", "k", buckets=4)
    # force the sort-merge path (tiny test tables would broadcast,
    # which hides the property under test: no exchange when bucketed)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = js.bucketed_join(spark, "t_orders_b", "t_items_b", "k")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        # co-located: no shuffle on either side
        assert not re.search(r"\(\d+\) Exchange", plan), plan
        assert joined.count() == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE t_orders_b")
        spark.sql("DROP TABLE t_items_b")
