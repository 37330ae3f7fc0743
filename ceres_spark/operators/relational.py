"""Star-schema relational query pack (north-star §2.2).

Ceres has no relational algebra at all (SURVEY.md §2 "operators ceres
does NOT have"); these queries prove the general query surface —
joins (broadcast dims vs shuffled facts), hash aggregation, grouping
sets, ranking windows, top-k — against the DuckDB oracle on the
TPC-H-style fixtures.

Scale choices, stated once:
- dimension tables (region/nation/customer/supplier/part) are
  broadcast — no shuffle for the fact side of dim joins;
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key, which
  AQE re-plans at runtime (skew split, partition coalesce);
- money sums accumulate in DECIMAL(30,10): exact, order-independent,
  oracle-identical (double summation would be partitioning-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import ceres_spark.sources.tables as tbl


def _dec_sum(col):
    # decimal→string→double: decimal→double is off-by-1-ulp in some
    # engines (DuckDB); string parse is correctly rounded everywhere.
    #
    # Cast-INTO-decimal policy: money inputs here are short decimals
    # (2–4 fractional digits exactly representable to within ~1e-12),
    # far from any 10th-digit rounding boundary relative to double
    # error, so the direct double→decimal cast agrees across engines.
    # Derived FULL-mantissa doubles (squares, running means) do hit
    # boundaries where Spark (shortest-repr) and DuckDB (binary
    # expansion) round differently — those sites route the cast
    # through a string on BOTH sides instead (surfaced at sf0.1 in
    # anomaly_zscore/moving_stddev; see operators/series.py).
    return F.sum(col.cast("decimal(30,10)")).cast("string").cast("double")


def _dec_avg(col):
    return _dec_sum(col) / F.count(col)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted: pricing summary over lineitem shipped by
    2000-09-02 (well past fixture range end → all rows; the filter
    still exercises parquet predicate pushdown on l_shipdate)."""
    li = tbl.load(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(disc_price).alias("sum_disc_price"),
            _dec_sum(charge).alias("sum_charge"),
            _dec_avg(F.col("l_quantity")).alias("avg_qty"),
            _dec_avg(F.col("l_extendedprice")).alias("avg_price"),
            _dec_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3 adapted: top-k revenue orders for BUILDING-segment
    customers ordered before 1998-03-15 with lineitems shipped after.
    customer is broadcast; orders⋈lineitem shuffles on o_orderkey."""
    cust = tbl.load(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tbl.load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = tbl.load(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    return (
        joined.groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(_dec_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adapted (no partsupp in fixtures): revenue per nation
    where customer and supplier share the nation, one region, one
    year. All dims broadcast; the join tree keeps the two fact
    tables' shuffle on the same key."""
    region = tbl.load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = tbl.load(spark, "nation", sf_dir)
    cust = tbl.load(spark, "customer", sf_dir)
    supp = tbl.load(spark, "supplier", sf_dir)
    orders = tbl.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = tbl.load(spark, "lineitem", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        _dec_sum(revenue).alias("revenue")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — every predicate is
    parquet-pushable (shipdate range, discount band, quantity cap), so
    the scan reads only matching row groups and 4 of 11 columns."""
    li = tbl.load(spark, "lineitem", sf_dir)
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        _dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


def q10_returned_items(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 adapted: top-k customers by revenue lost to returns
    in one quarter. customer/nation broadcast; orders⋈lineitem
    shuffles on orderkey."""
    cust = tbl.load(spark, "customer", sf_dir)
    nation = tbl.load(spark, "nation", sf_dir)
    orders = tbl.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = tbl.load(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(_dec_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status, priority), (status), ()) over orders —
    sub-total lattice in one pass (partial aggregation handles the
    rollup; no union of scans)."""
    orders = tbl.load(spark, "orders", sf_dir)
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
                   AS total_price,
               COUNT(*) AS n_orders
        FROM _orders_gs
        GROUP BY GROUPING SETS (
            (o_orderstatus, o_orderpriority), (o_orderstatus), ()
        )
        """
    )


def rank_orders_per_customer(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Ranking window: top-k orders per customer by totalprice.
    One shuffle on custkey; row_number ties broken by orderkey."""
    orders = tbl.load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts, status rows × priority columns. Spark's
    pivot with an explicit value list stays a single pass (no distinct
    scan for the pivot domain)."""
    orders = tbl.load(spark, "orders", sf_dir)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .count()
    )
    # stable oracle-friendly column names
    renames = {
        "1-URGENT": "n_urgent", "2-HIGH": "n_high", "3-MEDIUM": "n_medium",
        "4-NOT SPECIFIED": "n_notspec", "5-LOW": "n_low",
    }
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no order in 1998 Q1 (every
    fixture customer has SOME order, so the unfiltered variant is
    vacuous). The date filter is pushed into the build side before
    the anti hash."""
    cust = tbl.load(spark, "customer", sf_dir)
    orders = tbl.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window frame: running order-value total per customer
    in order-key order. Decimal accumulation in the frame keeps the
    running values order-independent across partitions; o_orderkey is
    unique so the frame ordering is total."""
    orders = tbl.load(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = (
        F.sum(F.col("o_totalprice").cast("decimal(30,10)"))
        .over(w)
        .cast("string")
        .cast("double")
    )
    return orders.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        running.alias("running_total"),
    )


def ntile_buckets(idx, n: int, n_buckets: int):
    """Vectorized SQL-standard ntile: 0-indexed global positions →
    1-indexed buckets. The first ``n mod B`` buckets take
    ``ceil(n/B)`` rows, the rest ``floor(n/B)`` (SQL:2003 / Spark /
    DuckDB agree; property-tested vs a row-at-a-time reference)."""
    import numpy as np

    base, rem = divmod(int(n), int(n_buckets))
    idx = np.asarray(idx, dtype=np.int64)
    cut = rem * (base + 1)  # rows covered by the fat buckets
    return (
        np.where(
            idx < cut,
            idx // (base + 1),
            rem + (idx - cut) // max(base, 1),
        )
        + 1
    )


def global_exact_ntile(
    df: DataFrame,
    order_cols: list[str],
    key_col: str,
    n_buckets: int = 4,
    bucket_name: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT ``ntile(n)`` over a global ordering with NO
    single-partition sort — the distributed-ranking (TeraSort) shape:

      1. range-exchange on the sort key + sorted runs
         (``repartitionByRange`` + ``sortWithinPartitions``), pinned
         with an eager ``localCheckpoint`` so both passes below see
         the identical split (range bounds come from a sample);
      2. per-partition row counts — a P-row collect;
      3. broadcast cumulative offsets; one streaming ``mapInPandas``
         pass assigns ``global_rank = offset[pid] + local_pos`` and
         applies the SQL-standard ntile formula (first ``n mod B``
         buckets get the extra row).

    Cost: one materialization of (key, order cols) + a map pass —
    what any distributed sort pays — instead of funnelling 100 TB
    through one task. ``order_cols`` must be a TOTAL order (include a
    unique tiebreak) or ranks would be partitioning-dependent.
    Returns ``(key_col, bucket_name)`` for joining back.
    """
    import numpy as np
    import pandas as pd
    from pyspark import TaskContext

    spark = df.sparkSession
    P = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    keep = [key_col] + [c for c in order_cols if c != key_col]
    sorted_df = (
        df.select(*keep)
        .repartitionByRange(P, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .localCheckpoint()  # eager: pins the sampled range bounds
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in sorted_df.groupBy(
            F.spark_partition_id().alias("pid")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for pid in range(P):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    def assign(batches):
        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, 0)
        for pdf in batches:
            idx = np.arange(pos, pos + len(pdf), dtype=np.int64)
            pos += len(pdf)
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    bucket_name: ntile_buckets(idx, n, n_buckets),
                }
            )

    key_type = df.schema[key_col].dataType.simpleString()
    return sorted_df.mapInPandas(
        assign, f"{key_col} {key_type}, {bucket_name} long"
    )


def order_value_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offset/distribution window functions in one pass:
    lag/lead (previous/next order value per customer), first_value
    (each customer's first-order value), EXACT ntile quartile over
    the global price distribution. The per-customer windows share one
    custkey shuffle; the global quartile comes from
    :func:`global_exact_ntile` — the distributed-ranking shape, so
    the plan has NO single-partition Exchange (plan-asserted in
    tests/test_plans.py) while keeping bit-exact ntile semantics the
    oracle can hash-check. Every ordering is made total with the
    unique o_orderkey, so results are partitioning-independent."""
    orders = tbl.load(spark, "orders", sf_dir)
    per_cust = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    quartiles = global_exact_ntile(
        orders,
        ["o_totalprice", "o_orderkey"],
        key_col="o_orderkey",
        n_buckets=4,
        bucket_name="price_quartile",
    )
    windowed = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(per_cust).alias("prev_price"),
        F.lead("o_totalprice").over(per_cust).alias("next_price"),
        F.first_value(F.col("o_totalprice")).over(per_cust).alias(
            "first_price"
        ),
    )
    return windowed.join(quartiles, "o_orderkey").select(
        "o_custkey", "o_orderkey", "o_totalprice",
        "prev_price", "next_price", "first_price", "price_quartile",
    )


def order_quartiles_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-safe quartile path promised in
    :func:`order_value_analytics`'s scale note: instead of
    ``ntile(4)`` over a global ordering (a single-partition sort by
    definition), compute the three exact interpolated quartile
    boundaries with one `percentile` aggregate (distributed — partial
    per-partition value maps, merged map-side; no row shuffle), then
    assign buckets with a broadcast of the 1-row boundary frame and a
    scan-parallel projection.

    Bucket semantics differ from ntile only at exact-boundary ties
    (here: value ≤ boundary → lower bucket; ntile: fixed bucket
    SIZES). The oracle computes the identical rule with
    ``quantile_cont`` (≡ Spark `percentile`, bit-exact — the same
    equivalence winsorize relies on), so this query is fully
    hash-checked, not rows-only. Plan shape asserted in
    tests/test_plans.py: no single-partition Exchange, one
    BroadcastNestedLoopJoin of a 1-row side.
    """
    orders = tbl.load(spark, "orders", sf_dir)
    bounds = orders.agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.25)).alias("_b1"),
        F.percentile(F.col("o_totalprice"), F.lit(0.50)).alias("_b2"),
        F.percentile(F.col("o_totalprice"), F.lit(0.75)).alias("_b3"),
    )
    quartile = (
        F.when(F.col("o_totalprice") <= F.col("_b1"), F.lit(1))
        .when(F.col("o_totalprice") <= F.col("_b2"), F.lit(2))
        .when(F.col("o_totalprice") <= F.col("_b3"), F.lit(3))
        .otherwise(F.lit(4))
        .cast("long")
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy(quartile.alias("price_quartile"))
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice")).alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


def top_parts_by_size(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Global top-k with tie-safe ordering — Spark turns
    orderBy+limit into TakeOrderedAndProject (no full sort at scale)."""
    part = tbl.load(spark, "part", sf_dir)
    return (
        part.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(k)
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (fixture has no l_commitdate/l_receiptdate):
    orders placed in 1997H1 with at least one line shipped more than
    120 days after the order date, counted per priority. The EXISTS
    becomes a LEFT SEMI join: the fact side shuffles once on
    l_orderkey; the non-equi lateness predicate rides on the same
    join, so no second pass over lineitem."""
    orders = tbl.load(spark, "orders", sf_dir)
    li = tbl.load(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    sem = o.join(
        li,
        (li["l_orderkey"] == o["o_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 120 DAYS")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for September 1997. part is a
    dimension -> broadcast; lineitem never shuffles (the aggregate is
    global, map-side partials only)."""
    li = tbl.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = tbl.load(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return j.agg(
        (
            F.lit(100.0)
            * _dec_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / _dec_sum(rev)
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_items"),
    )


def q18_large_volume_customers(
    spark: SparkSession, sf_dir: str, threshold: float = 200.0
) -> DataFrame:
    """TPC-H Q18: customers with orders whose total quantity exceeds
    `threshold` (fixture p90 is 180). The HAVING subquery is one
    groupBy on the fact's natural key (l_orderkey), then the
    surviving handful of orderkeys joins orders and broadcast
    customer — the second join is tiny by construction."""
    li = tbl.load(spark, "lineitem", sf_dir)
    orders = tbl.load(spark, "orders", sf_dir)
    customer = tbl.load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > threshold)
    )
    j = orders.join(big, orders["o_orderkey"] == big["l_orderkey"]).join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    )
    return j.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_totalprice",
        "total_qty",
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted (no p_container): revenue from three
    brand/size/quantity bands OR-ed together. One broadcast hash join
    on p_partkey carries all three disjuncts; Catalyst keeps the
    common equi-key and evaluates the residual OR as a post-join
    filter — no union-of-three-scans."""
    li = tbl.load(spark, "lineitem", sf_dir)
    part = tbl.load(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(1, smax))
        & (F.col("l_quantity").between(qlo, qhi))
    )
    j = j.filter(
        arm("Brand#12", 15, 1, 21) | arm("Brand#23", 20, 10, 30) | arm("Brand#34", 30, 20, 50)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        _dec_sum(rev).alias("revenue"), F.count("*").alias("n_items")
    )


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no c_phone): customers with above-average
    positive balance and no 1998+ orders, totalled per market
    segment. The scalar AVG subquery is a 1-row broadcast; the NOT
    EXISTS is a LEFT ANTI join against the date-pruned orders scan."""
    customer = tbl.load(spark, "customer", sf_dir)
    orders = tbl.load(spark, "orders", sf_dir)
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        _dec_avg(F.col("c_acctbal")).alias("_avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, customer["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            _dec_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (fixture has no l_shipmode/l_commitdate —
    same adaptation family as q4): for lines shipped more than 90
    days after their order date during 1997, count high-priority vs
    low-priority orders per line status.

    Scale shape: both sides are facts, so this is one shuffle join on
    the order key; the date/lateness predicates are evaluated on the
    joined row (lateness needs both sides), while the shipdate year
    filter prunes lineitem at the scan. The aggregate is 2-group —
    map-side partials collapse it to nothing."""
    orders = tbl.load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = tbl.load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    ).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q21_waiting_supplier(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """TPC-H Q21 adapted (no l_commitdate/l_receiptdate): suppliers in
    EUROPE who were the SOLE late shipper (>100 days after order date)
    on a multi-supplier order, ranked by how often.

    The reference EXISTS / NOT EXISTS pair is re-expressed as one
    per-order aggregate — n_suppliers and n_late_suppliers via two
    count-distincts: 'exists another supplier' ⇔ n_suppliers >= 2,
    'not exists another late supplier' ⇔ n_late_suppliers == 1. The
    sole late supplier is read off the SAME aggregate
    (max(when(late, suppkey)) — with n_late_suppliers == 1 every late
    row carries that one suppkey, so max equals the oracle's DISTINCT
    late row), which removes the join-back branch that re-evaluated
    the lineitem⋈orders subtree a second time (optimization r12,
    guide §2.4): one lineitem scan + one l_orderkey exchange instead
    of two of each plus a pair-side distinct. supplier⋈nation is a
    broadcast dim."""
    orders = tbl.load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    ).filter(F.col("o_orderstatus") == "F")
    li = tbl.load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).withColumn(
        "_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")
        ).cast("int"),
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("_late") == 1, F.col("l_suppkey"))
        ).alias("_n_late_supp"),
        F.max(
            F.when(F.col("_late") == 1, F.col("l_suppkey"))
        ).alias("_late_supp"),
    )
    sole_late = (
        per_order
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_late_supp") == 1))
        .select("l_orderkey", F.col("_late_supp").alias("l_suppkey"))
    )
    supplier = tbl.load(spark, "supplier", sf_dir)
    nation = tbl.load(spark, "nation", sf_dir)
    region = tbl.load(spark, "region", sf_dir)
    dim = (
        supplier.join(
            F.broadcast(
                nation.join(
                    region.filter(F.col("r_name") == "EUROPE"),
                    nation["n_regionkey"] == region["r_regionkey"],
                )
            ),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .select("s_suppkey", "s_name")
    )
    return (
        sole_late.join(F.broadcast(dim), sole_late["l_suppkey"] == dim["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def partsupp_view(
    spark: SparkSession, sf_dir: str, part: DataFrame | None = None
) -> DataFrame:
    """Deterministic ``partsupp`` derived from part × supplier-count
    with pure modular arithmetic — the fixture ships no partsupp
    table, and this construction is reproducible bit-identically in
    any engine, so TPC-H Q2/Q9/Q11/Q16/Q20 become fully
    oracle-checkable rather than unimplementable.

    Each part gets 4 candidate (supplier, availqty, supplycost) rows:
      ps_suppkey        = (p_partkey·7 + i·13) mod S + 1
      ps_availqty       = (p_partkey·31 + i·17) mod 9999 + 1
      cost_cents        = (p_partkey·53 + i·19) mod 100000 + 100
      ps_supplycost     = cost_cents / 100.0   (single division)
    collapsed by (partkey, suppkey) with MIN on both measures when two
    i values collide on the same supplier. All integer arithmetic —
    engine-portable; the one division is exact (cents/100).

    Scale: 4×|part| rows built scan-side from the part table; the
    supplier count is a 1-row broadcast. No data is materialized —
    it's a view composed into each query's plan.

    ``part`` (optimization r12, guide §2.3/§3.2 — reduce before the
    explode): a caller that inner-joins the view against a FILTERED
    part set can pass that frame here and the synthesis runs over
    4×|σ(part)| rows instead of 4×|part| — synthesized rows for
    filtered-out parts could only die in the caller's join anyway
    (the min-collapse groups on ps_partkey, so dropping whole parts
    changes no surviving group). The ``_S`` supplier-count seed stays
    the FULL supplier table regardless — it is part of the suppkey
    formula, not a join reduction.
    """
    if part is None:
        part = tbl.load(spark, "part", sf_dir)
    part = part.select("p_partkey")
    s_cnt = tbl.load(spark, "supplier", sf_dir).agg(
        F.count("*").alias("_S")
    )
    ps0 = (
        part.join(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            "_S",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("_i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (F.col("p_partkey") * 7 + F.col("_i") * 13) % F.col("_S")
                + 1
            ).alias("ps_suppkey"),
            (
                (F.col("p_partkey") * 31 + F.col("_i") * 17) % 9999 + 1
            ).alias("_qty"),
            (
                (F.col("p_partkey") * 53 + F.col("_i") * 19) % 100000
                + 100
            ).alias("_cents"),
        )
    )
    return ps0.groupBy("ps_partkey", "ps_suppkey").agg(
        F.min("_qty").alias("ps_availqty"),
        F.min("_cents").alias("ps_cents"),
        (F.min("_cents") / F.lit(100.0)).alias("ps_supplycost"),
    )


# the same construction as a SQL CTE prefix for the DuckDB oracles
PARTSUPP_SQL = """
s_cnt AS (SELECT COUNT(*) AS S FROM supplier),
ps0 AS (
  SELECT p_partkey,
         (p_partkey*7 + i*13) % S + 1 AS ps_suppkey,
         (p_partkey*31 + i*17) % 9999 + 1 AS qty,
         (p_partkey*53 + i*19) % 100000 + 100 AS cents
  FROM part CROSS JOIN s_cnt
  CROSS JOIN (SELECT unnest([0,1,2,3]) AS i)
),
partsupp AS (
  SELECT p_partkey AS ps_partkey, ps_suppkey,
         MIN(qty) AS ps_availqty, MIN(cents) AS ps_cents,
         MIN(cents)/100.0 AS ps_supplycost
  FROM ps0 GROUP BY 1, 2
)
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for size-15 parts, the EUROPE supplier(s) offering
    the minimum supply cost. The correlated MIN subquery becomes a
    per-part min drawn beside every row in ONE p_partkey-partitioned
    window pass (optimization r12, guide §2.4) — the earlier
    aggregate + equality join-back consumed the partsupp⋈part⋈dim
    subtree twice and Catalyst re-evaluated it per consumer (24
    scans in the census plan). Keeping rows equal to the per-group
    min is exactly what the equality join-back kept. Supplier⋈
    nation⋈region is a broadcast dim."""
    part = tbl.load(spark, "part", sf_dir).filter(
        F.col("p_size") == 15
    )
    # seed the partsupp synthesis with the filtered part set (guide
    # §2.3): 4×|size-15 parts| synthesized rows instead of 4×|part| —
    # the inner join below dropped the rest anyway
    ps = partsupp_view(spark, sf_dir, part=part)
    supplier = tbl.load(spark, "supplier", sf_dir)
    nation = tbl.load(spark, "nation", sf_dir)
    region = tbl.load(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    dim = supplier.join(
        F.broadcast(
            nation.join(
                region, nation["n_regionkey"] == region["r_regionkey"]
            ).select("n_nationkey", "n_name")
        ),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    # filtered part and the supplier dim scale with data — unhinted
    eu_ps = ps.join(
        part.select("p_partkey", "p_type"),
        ps["ps_partkey"] == F.col("p_partkey"),
    ).join(dim, ps["ps_suppkey"] == dim["s_suppkey"])
    from pyspark.sql.window import Window

    w = Window.partitionBy("p_partkey")
    return (
        eu_ps.withColumn(
            "_min_cost", F.min("ps_supplycost").over(w)
        )
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            "p_type", "ps_supplycost",
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on 'red' parts per nation and order year:
    SUM(l_extendedprice·(1-l_discount) − ps_supplycost·l_quantity).
    partsupp and part are broadcast dims against the lineitem fact;
    the only fact shuffle is the orderkey join to orders for the
    year, then the small (nation, year) aggregate."""
    part = tbl.load(spark, "part", sf_dir).filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    # red-filtered synthesis seed (guide §2.3) — the li⋈part inner
    # join kept only red parts' ps rows anyway
    ps = partsupp_view(spark, sf_dir, part=part)
    li = tbl.load(spark, "lineitem", sf_dir)
    orders = tbl.load(spark, "orders", sf_dir).select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    supplier = tbl.load(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    nation = tbl.load(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    # part/partsupp/supplier scale WITH the data (4x|part| rows etc.)
    # so no broadcast hints — AQE broadcasts them at small SF and
    # falls back to shuffle joins at scale; only nation (bounded) is
    # hinted
    j = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(
            ps,
            (li["l_partkey"] == ps["ps_partkey"])
            & (li["l_suppkey"] == ps["ps_suppkey"]),
        )
        .join(
            supplier.join(
                F.broadcast(nation),
                supplier["s_nationkey"] == nation["n_nationkey"],
            ).select("s_suppkey", "n_name"),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(_dec_sum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_stock(
    spark: SparkSession, sf_dir: str, fraction: float = 0.01
) -> DataFrame:
    """TPC-H Q11: parts whose NATION_3 stock value
    (SUM ps_supplycost·ps_availqty) exceeds ``fraction`` of that
    nation's total. The scalar total is a 1-row broadcast against the
    per-part aggregate — no second pass over partsupp."""
    ps = partsupp_view(spark, sf_dir)
    supplier = tbl.load(spark, "supplier", sf_dir)
    nation = tbl.load(spark, "nation", sf_dir).filter(
        F.col("n_name") == "NATION_3"
    )
    nat_ps = ps.join(
        F.broadcast(
            supplier.join(
                F.broadcast(nation),
                supplier["s_nationkey"] == nation["n_nationkey"],
            ).select("s_suppkey")
        ),
        ps["ps_suppkey"] == F.col("s_suppkey"),
    )
    # stock value in integer CENTS: cents·qty is exact BIGINT, so the
    # sums are engine-identical; the single /100.0 at the end is the
    # only float op (cents/100 doubles sit exactly on decimal rounding
    # boundaries, where double→DECIMAL rounding differs across engines)
    value_cents = F.col("ps_cents") * F.col("ps_availqty")
    # ONE partsupp evaluation (optimization r12, guide §5.3): the
    # old separate per-part and scalar aggregates each re-derived
    # the 4x|part| partsupp explode (16 scans in the census plan).
    # The per-part aggregate keeps the exact BIGINT cents sum and is
    # staged eagerly; the grand total is the BIGINT sum OVER those
    # sums — associative integer addition, so both the total and
    # every stock_value divide the identical integers as before.
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.sum(value_cents).alias("_cents")
    ).localCheckpoint(eager=False)
    total = per_part.agg(
        (F.sum("_cents") / F.lit(100.0)).alias("_total")
    )
    return (
        per_part.withColumn(
            "stock_value", F.col("_cents") / F.lit(100.0)
        )
        .join(F.broadcast(total))
        .filter(
            F.col("stock_value") > F.col("_total") * F.lit(float(fraction))
        )
        .select("ps_partkey", "stock_value")
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no s_comment complaints — negative account
    balance stands in for the excluded-supplier predicate): distinct
    supplier count per (brand, type, size) for non-PROMO, non-Brand#1
    parts in the probe sizes. Anti-join of the excluded suppliers
    rides the broadcast; the count-distinct is the only shuffle."""
    part = tbl.load(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 23, 31, 42, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    # filtered synthesis seed (guide §2.3) — the inner part join kept
    # only these parts' ps rows anyway
    ps = partsupp_view(spark, sf_dir, part=part)
    bad_supp = tbl.load(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    # part/bad_supp scale with the data — unhinted, AQE decides
    j = ps.join(
        part, ps["ps_partkey"] == part["p_partkey"]
    ).join(
        bad_supp,
        ps["ps_suppkey"] == bad_supp["s_suppkey"],
        "left_anti",
    )
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


def q20_excess_stock_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20: EUROPE suppliers holding stock of a 'blue' part
    exceeding half of what they shipped of it during 1997 (region
    rather than single nation — the fixture has only 4 suppliers per
    nation). The correlated 0.5·SUM(l_quantity) subquery decorrelates
    into one (partkey, suppkey) aggregate of the date-pruned lineitem
    scan, joined to partsupp on the same composite key — a LEFT SEMI
    from supplier finishes the EXISTS."""
    part = tbl.load(spark, "part", sf_dir).filter(
        F.col("p_name").like("blue%")
    ).select("p_partkey")
    # blue-filtered synthesis seed (guide §2.3) — the ps⋈part inner
    # join kept only blue parts' ps rows anyway
    ps = partsupp_view(spark, sf_dir, part=part)
    li = tbl.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        _dec_sum(F.col("l_quantity")).alias("_qty")
    )
    qualifying = (
        ps.join(part, ps["ps_partkey"] == part["p_partkey"])
        .join(
            shipped,
            (ps["ps_partkey"] == shipped["l_partkey"])
            & (ps["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supplier = tbl.load(spark, "supplier", sf_dir)
    nation = tbl.load(spark, "nation", sf_dir)
    region = tbl.load(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    eu_nations = nation.join(
        region, nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey")
    return (
        supplier.join(
            F.broadcast(eu_nations),
            supplier["s_nationkey"] == F.col("n_nationkey"),
        )
        .join(
            qualifying,
            supplier["s_suppkey"] == qualifying["ps_suppkey"],
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers who ordered in 1997 but not in 1998
    (EXCEPT distinct semantics, the dual of intersect_custkeys)."""
    orders = tbl.load(spark, "orders", sf_dir)
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    y98 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y97.subtract(y98)  # EXCEPT (distinct) semantics


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations per year. The
    two-nation filter is pushed into each broadcast nation dim BEFORE
    the join, so the fact-side rows that survive the supplier/customer
    joins are already restricted to the two nations; the residual OR
    only picks the direction. One shuffle (orders⋈lineitem)."""
    nation = tbl.load(spark, "nation", sf_dir)
    pair = ("NATION_1", "NATION_2")
    n_supp = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp = tbl.load(spark, "supplier", sf_dir)
    cust = tbl.load(spark, "customer", sf_dir)
    orders = tbl.load(spark, "orders", sf_dir)
    li = tbl.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(_dec_sum(volume).alias("revenue"))


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 adapted (bare p_type categories): NATION_1's share of
    ECONOMY-part revenue sold into AMERICA, per order year. Market
    share is a ratio of two exact-decimal sums (numerator CASE-gated),
    both materialized via-string so the double division is
    bit-identical to the oracle. Dims broadcast; one fact shuffle."""
    region = tbl.load(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    nation = tbl.load(spark, "nation", sf_dir)
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    part = tbl.load(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    supp = tbl.load(spark, "supplier", sf_dir)
    cust = tbl.load(spark, "customer", sf_dir)
    orders = tbl.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = tbl.load(spark, "lineitem", sf_dir)
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    target_vol = F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(
        F.lit(0.0)
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (_dec_sum(target_vol) / _dec_sum(volume)).alias("mkt_share"),
            _dec_sum(volume).alias("total_volume"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 adapted (no o_comment; the NOT-LIKE filter becomes a
    priority exclusion): distribution of customers by order count,
    including zero-order customers via LEFT join. Two shuffles by
    construction (customer⋈orders on custkey, then regroup by count)
    — the second groups a customer-cardinality input, not the fact."""
    customer = tbl.load(spark, "customer", sf_dir).select("c_custkey")
    orders = (
        tbl.load(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The
    max and the equality test both stay in exact DECIMAL(30,10) —
    comparing doubles here would make the tie-set partitioning-
    dependent. The 1-row max and the supplier dim are broadcast."""
    li = tbl.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,10)"
            )
        ).alias("_rev_dec")
    )
    max_rev = rev.agg(F.max("_rev_dec").alias("_max_rev"))
    supp = tbl.load(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev), F.col("_rev_dec") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev_dec").cast("string").cast("double").alias("total_revenue"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted (no p_container; brand+type pick the part
    class): yearly-averaged revenue from orders whose quantity is
    under 20% of the part's average. The per-part average reuses the
    part-filtered fact subset (computed once, self-joined on
    l_partkey); the 0.2× threshold is evaluated in doubles on an
    exact-decimal average so both engines see the same boundary."""
    part = tbl.load(spark, "part", sf_dir).filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = tbl.load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pl = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    # per-part average drawn BESIDE every row in one l_partkey window
    # pass (optimization r12, guide §2.4 — the q2/batch-3 idiom): the
    # old aggregate + broadcast join-back consumed the lineitem⋈part
    # subtree twice, i.e. a second full lineitem scan at any scale.
    # The window's sum/count are the SAME decimal operands the groupBy
    # computed, so the 0.2× threshold sees identical values; the extra
    # l_partkey exchange carries only the part-filtered subset
    # (brand+type selective), which a second fact scan dwarfs.
    w = Window.partitionBy("l_partkey")
    # same expression chain as _dec_avg with the window attached to
    # the aggregates themselves (the casts live OUTSIDE the sum):
    # sum(decimal) → string → double, divided by count — identical
    # operands and rounding to the groupBy form
    avg_beside = (
        F.sum(F.col("l_quantity").cast("decimal(30,10)")).over(w)
        .cast("string").cast("double")
        / F.count(F.col("l_quantity")).over(w)
    )
    return (
        pl.withColumn("_avg_qty", avg_beside)
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_avg_qty"))
        .agg(
            (_dec_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )
