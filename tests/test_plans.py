"""Physical-plan audits: the scale properties SURVEY.md §4 promises
must be visible in the plan, not just intended — predicate pushdown
to parquet, broadcast joins for dims, map-side partial aggregation,
no shuffle for map-only ops. These assertions are what '.explain and
iterate' hardens into."""

import contextlib
import io

from pyspark.sql import functions as F

import ceres_spark.operators.relational as rel
import ceres_spark.operators.text as text
import ceres_spark.sources.tables as tbl

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_points_scan_pushes_metric_filter(spark):
    pts = tbl.points(spark, SF).filter(F.col("metric") == "click")
    plan = plan_of(pts)
    assert "PushedFilters" in plan
    # the metric (event_type) equality must reach the parquet reader
    assert "EqualTo(event_type,click)" in plan.replace(" ", ""), plan


def test_points_time_bounds_push_to_raw_column(spark):
    # range bounds must reach the parquet reader via the RAW ts column
    # (epoch-nanos long) — a filter on the derived quantized column
    # cannot be pushed
    pts = tbl.points(spark, SF, from_time=1704067200, until_time=1704153600)
    plan = plan_of(pts)
    pushed = plan.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed, plan


def test_q1_pushes_shipdate_filter(spark):
    plan = plan_of(rel.q1_pricing_summary(spark, SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q3_broadcasts_customer(spark):
    plan = plan_of(rel.q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_all_dims(spark):
    plan = plan_of(rel.q5_local_supplier_volume(spark, SF))
    # 4 dim joins broadcast; the orders⋈lineitem fact join may be
    # broadcast at this tiny SF (AQE) — assert no fallback to
    # BroadcastNestedLoop (which would mean a missing equi-condition)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_stats_is_map_only(spark):
    plan = plan_of(text.text_stats(tbl.load(spark, "documents", SF)))
    assert "Exchange" not in plan  # pure per-row projection: no shuffle


def test_aggregate_series_partial_agg(spark):
    import ceres_spark.operators.aggregate as agg

    df = spark.createDataFrame(
        [("m", 0, 1.0)], "metric string, ts long, value double"
    )
    import re

    plan = plan_of(agg.aggregate_series(df, "average", 300))
    # map-side partial combine around exactly one exchange
    assert "partial_sum" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_column_pruning_reaches_scan(spark):
    docs = tbl.load(spark, "documents", SF).select("doc_id")
    plan = plan_of(docs)
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in rs and "text" not in rs  # only doc_id scanned


def test_topk_uses_take_ordered(spark):
    plan = plan_of(rel.top_parts_by_size(spark, SF))
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_q18_broadcasts_aggregated_big_orders(spark):
    # the HAVING-subquery side (tiny after its agg) must be the build
    # side, never the fact table
    plan = plan_of(rel.q18_large_volume_customers(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q4_semi_join_no_second_lineitem_pass(spark):
    # EXISTS compiles to ONE LeftSemi join carrying the non-equi
    # lateness predicate — lineitem is scanned exactly once
    plan = plan_of(rel.q4_order_priority(spark, SF))
    assert "LeftSemi" in plan
    assert plan.count("lineitem.parquet") == 1, plan


def test_stratified_split_is_map_only(spark):
    import ceres_spark.operators.corpus as corp
    plan = plan_of(corp.stratified_split(tbl.load(spark, "documents", SF)))
    assert "Exchange" not in plan, plan


def test_tfidf_df_join_is_broadcast(spark):
    import ceres_spark.operators.corpus as corp
    plan = plan_of(corp.tfidf_top_terms(tbl.load(spark, "documents", SF)))
    # both the vocabulary (df) join and the 1-row N join broadcast;
    # the fact-sized tf table must not be on any build side
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row N cross join
    # partial aggregation before the (doc_id, token) shuffle
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_anomaly_stats_single_window_pass(spark):
    # optimization r12: the per-metric stats are drawn beside every
    # point in ONE metric-partitioned window pass — the old aggregate
    # + broadcast join-back (whose two branches each re-evaluated the
    # upstream) is gone, so the plan has NO join and exactly one
    # metric-keyed Window over the input's exchange
    import re

    import ceres_spark.operators.series as ser
    hourly = tbl.points(spark, SF).groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("ts")
    ).agg(F.avg("value").alias("value"))
    plan = plan_of(ser.anomaly_zscore(hourly))
    assert "Join" not in plan, plan
    n_windows = len(re.findall(r"^\(\d+\) Window", plan, re.M))
    assert n_windows == 1, plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_series_functions_single_sort_exchange(spark):
    import ceres_spark.operators.series as ser
    hourly = tbl.points(spark, SF).groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("ts")
    ).agg(F.avg("value").alias("value"))
    plan = plan_of(ser.series_functions(hourly))
    # all three window frames share one partitionBy(metric) sort: the
    # window stage adds exactly one Exchange beyond the groupBy's
    # (formatted explain lists each node twice — count detail headers)
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    n_windows = len(re.findall(r"^\(\d+\) Window", plan, re.M))
    assert n_exchanges <= 2, plan
    assert n_windows == 1, plan


def test_q7_broadcasts_all_dims_one_fact_shuffle(spark):
    # supplier/customer/nation×2 broadcast; the only shuffled join is
    # orders⋈lineitem; the nation-pair filter must not degrade the
    # equi-joins into a nested loop
    plan = plan_of(rel.q7_volume_shipping(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q8_broadcasts_all_dims(spark):
    plan = plan_of(rel.q8_market_share(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q13_left_join_preserves_zero_order_customers(spark):
    plan = plan_of(rel.q13_customer_distribution(spark, SF))
    assert "LeftOuter" in plan, plan
    # priority exclusion reaches the orders parquet scan
    assert "o_orderpriority" in plan.split("PushedFilters")[1][:400], plan


def test_q15_broadcasts_max_and_supplier(spark):
    # the 1-row MAX and the supplier dim are both build sides; the
    # revenue agg (supplier-cardinality) is never the probe target
    plan = plan_of(rel.q15_top_supplier(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q17_broadcasts_part_and_avg(spark):
    plan = plan_of(rel.q17_small_quantity_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_histogram_quantiles_partial_agg(spark):
    import ceres_spark.operators.sketches as sk
    ev = tbl.load(spark, "events", SF).select(
        F.col("event_type").alias("metric"), "value"
    )
    plan = plan_of(sk.histogram_quantiles(ev, "metric", "value"))
    assert "partial_count" in plan, plan  # map-side histogram combine


def test_as_percent_totals_join_unhinted(spark):
    # VERDICT r9 "What's wrong" #1: the per-ts totals table is
    # TS-cardinality — the unbounded axis at 100 TB — so as_percent
    # must NOT force a broadcast; at render-window sizes AQE picks
    # the broadcast on its own, which the executed plan shows.
    import ceres_spark.operators.series as ser
    hourly = tbl.points(spark, SF).groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("ts")
    ).agg(F.avg("value").alias("value"))
    df = ser.as_percent(hourly)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, final  # AQE's choice, not ours


def test_remove_between_percentile_bands_join_unhinted(spark):
    # same discipline for the other ts-cardinality band table
    import ceres_spark.operators.series as ser
    hourly = tbl.points(spark, SF).groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("ts")
    ).agg(F.avg("value").alias("value"))
    df = ser.remove_between_percentile(hourly, n=80)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # the one remaining hint is the series-cardinality KEEPER panel
    assert analyzed.count("ResolvedHint") <= 1, analyzed


def test_top_series_uses_take_ordered(spark):
    import ceres_spark.operators.series as ser
    hourly = tbl.points(spark, SF).groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("ts")
    ).agg(F.avg("value").alias("value"))
    plan = plan_of(ser.top_series(hourly))
    assert "TakeOrderedAndProject" in plan, plan   # no global sort
    assert "partial_max_by" in plan or "partial_" in plan, plan


def test_mixture_sample_single_scan_partial_agg(spark):
    import ceres_spark.operators.corpus as corp
    plan = plan_of(corp.mixture_sample(
        tbl.load(spark, "documents", SF), {"src0": 0.5}
    ))
    assert plan.count("documents.parquet") == 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    # only the two needed columns reach the scan
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in rs, rs


def test_funnel_single_pass_no_joins(spark):
    # optimization r12: the reach-join chain (which re-evaluated every
    # prior step's subtree per step — 6 scans for 3 steps) became ONE
    # user-partitioned window pass + a per-user aggregate reusing the
    # window's partitioning: a single events scan and NO join anywhere
    import re

    import ceres_spark.operators.analytics as ana
    plan = plan_of(ana.funnel(tbl.load(spark, "events", SF)))
    assert "Join" not in plan, plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_salted_join_spreads_hot_keys(spark):
    import __spark_entry__ as m
    plan = plan_of(m.queries()["salted_join"](spark, SF))
    # the join key must be (event_type, _salt) — the hot key spread
    assert "_salt" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_melt_uses_native_expand(spark):
    import __spark_entry__ as m
    plan = plan_of(m.queries()["melt_stats"](spark, SF))
    # unpivot compiles to one Expand over the aggregated row — the
    # deduped input is scanned/aggregated once, not once per stat
    assert "Expand" in plan, plan
    assert plan.count("events.parquet") == 1, plan


def test_node_read_prunes_date_partitions(spark, tmp_path):
    from ceres_spark.tree import CeresTree

    tree = CeresTree.create_tree(spark, str(tmp_path / "wh"))
    node = tree.create_node("m.cpu", timeStep=60)
    pts = spark.createDataFrame(
        [(t, 1.0) for t in range(1704067200, 1704067200 + 3 * 86400, 7200)],
        "ts long, value double",
    )
    node.write(pts)
    plan = plan_of(node.read(1704067200, 1704067200 + 3600))
    # the date PARTITION filter must appear — ts stats alone still
    # list every date directory at scale
    pf = plan.split("PartitionFilters")[1][:200]
    assert "date" in pf and "isnotnull" in pf.replace(" ", "").lower(), plan


def test_q8_topk_broadcasts_queries(spark):
    import ceres_spark.operators.similarity as sim
    emb = tbl.load(spark, "embeddings", SF)
    plan = plan_of(sim.topk_cosine_quantized(emb))
    # the 5-query side is the broadcast build side; candidates stream
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_group_by_node_partial_agg(spark):
    import ceres_spark.operators.series as ser
    hourly = tbl.points(spark, SF).groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("ts")
    ).agg(F.avg("value").alias("value"))
    plan = plan_of(ser.group_by_node(hourly, 0, "sum"))
    assert "partial_sum" in plan, plan


def test_moving_median_single_window_sort(spark):
    import re
    import ceres_spark.operators.series as ser
    hourly = tbl.points(spark, SF).groupBy(
        "metric", (F.col("ts") - F.col("ts") % 3600).alias("ts")
    ).agg(F.avg("value").alias("value"))
    plan = plan_of(ser.moving_median(hourly))
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1, plan


def test_order_quartiles_scaled_no_global_sort(spark):
    # the whole point of the scale path: NO single-partition Exchange
    # (the exact-ntile variant necessarily has one) and the 1-row
    # boundary frame joined via broadcast, not shuffle
    import re
    import ceres_spark.operators.relational as rel
    plan = plan_of(rel.order_quartiles_scaled(spark, SF))
    # no global sort of the full table: the only SinglePartition
    # exchange allowed is the 1-row boundary aggregate, and ntile's
    # Window/rangepartitioning must be gone entirely. (formatted mode
    # prints Exchange args on their own "Arguments:" line.)
    assert not re.search(r"rangepartitioning", plan), plan
    assert not re.search(r"^\(\d+\) Window", plan, re.M), plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_order_analytics_exact_ntile_no_global_sort(spark):
    # round-3 rewrite: the registered exact-ntile query now uses the
    # distributed-ranking shape (range exchange + offset broadcast,
    # relational.global_exact_ntile) — NO single-partition Exchange
    # anywhere in the plan, and no ntile Window at all
    import re
    import ceres_spark.operators.relational as rel
    plan = plan_of(rel.order_value_analytics(spark, SF))
    assert "SinglePartition" not in plan, plan
    assert not re.search(r"ntile", plan, re.I), plan


def test_global_exact_ntile_empty_input(spark):
    import ceres_spark.operators.relational as rel
    empty = spark.createDataFrame([], "k long, v double")
    assert rel.global_exact_ntile(empty, ["v", "k"], "k").count() == 0


def test_global_exact_ntile_matches_window_ntile(spark):
    # the distributed formula must be BIT-IDENTICAL to Spark's own
    # ntile() on the same total order (incl. the n%B fat buckets)
    from pyspark.sql.window import Window as W
    import ceres_spark.operators.relational as rel
    orders = tbl.load(spark, "orders", SF).limit(1003)  # non-divisible n
    got = {
        r["o_orderkey"]: r["q"]
        for r in rel.global_exact_ntile(
            orders, ["o_totalprice", "o_orderkey"], "o_orderkey",
            n_buckets=7, bucket_name="q",
        ).collect()
    }
    want = {
        r["o_orderkey"]: r["q"]
        for r in orders.select(
            "o_orderkey",
            F.ntile(7).over(
                W.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
            ).cast("long").alias("q"),
        ).collect()
    }
    assert got == want


def test_q20_pushes_shipdate_filter(spark):
    import ceres_spark.operators.relational as rel
    plan = plan_of(rel.q20_excess_stock_suppliers(spark, SF))
    # the lineitem scan (one of several) must carry the date range
    pushed = [seg[:400] for seg in plan.split("PushedFilters")[1:]]
    assert any("l_shipdate" in seg for seg in pushed), plan


def test_new_tpch_no_unbounded_cartesian(spark):
    # partsupp construction cross-joins a 1-ROW count — fine; anything
    # else cartesian would be a planning bug
    import re
    import ceres_spark.operators.relational as rel
    for fn in (rel.q2_min_cost_supplier, rel.q9_product_profit,
               rel.q11_important_stock, rel.q16_supplier_part_counts,
               rel.q20_excess_stock_suppliers):
        plan = plan_of(fn(spark, SF))
        assert "CartesianProduct" not in plan, (fn.__name__, plan)


def test_partsupp_view_deterministic(spark):
    import ceres_spark.operators.relational as rel
    a = sorted(map(tuple, rel.partsupp_view(spark, SF).collect()))
    b = sorted(map(tuple, rel.partsupp_view(spark, SF).collect()))
    assert a == b and len(a) > 0
    # composite key is unique after the MIN collapse
    keys = [(r[0], r[1]) for r in a]
    assert len(keys) == len(set(keys))


def test_bucketed_series_windows_zero_exchange(spark):
    import re
    import ceres_spark.operators.join_strategies as js
    import ceres_spark.operators.compact as cp
    import ceres_spark.operators.aggregate as agg
    deduped = cp.compact(tbl.points(spark, SF), 60)
    hourly = agg.aggregate_series(deduped, "average", 3600)
    plan = plan_of(js.bucketed_series_windows(spark, hourly,
                                              table="bp_points_t"))
    # the whole point: bucketed-by-metric scan satisfies the Window's
    # distribution — no Exchange anywhere in the read plan
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan
    assert re.findall(r"^\(\d+\) Window", plan, re.M), plan


def test_fuzzy_pairs_dispatcher_picks_plan_by_regime(spark):
    # tight dials (4d <= p) must produce the PassJoin segment-keyed
    # plan; loose dials must fall back to the quadratic body — the
    # segment index column appearing in the plan is the discriminator
    import ceres_spark.operators.dedup as dd
    docs = tbl.load(spark, "documents", SF)
    tight = plan_of(dd.fuzzy_pairs(docs, prefix_len=32, max_dist=4))
    assert "_seg#" in tight, tight
    loose = plan_of(dd.fuzzy_pairs(docs, prefix_len=24, max_dist=12))
    assert "_seg#" not in loose, loose
    quad = plan_of(dd.fuzzy_pairs_quadratic(docs, prefix_len=32,
                                            max_dist=4))
    assert "_seg#" not in quad, quad


def test_fuzzy_pairs_registered_entry_has_no_blockwise_selfjoin(spark):
    # the registered fuzzy_pairs query must never contain a Σ block²
    # self-join: every non-broadcast join carries the segment key, and
    # block-only keyed joins are broadcast (the bounded length dim and
    # the degenerate-short catch-all)
    import re
    import __spark_entry__ as m
    plan = plan_of(m.queries()["fuzzy_pairs"](spark, SF))
    assert "_seg#" in plan, plan
    for sec in re.split(r"\n\(\d+\) ", plan):
        head = sec.split("\n", 1)[0]
        if "Join" in head and "Broadcast" not in head:
            assert "_seg#" in sec, sec


def test_bigram_lm_linear_no_window_no_cartesian(spark):
    import ceres_spark.operators.corpus as corp

    plan = plan_of(corp.bigram_lm_score(tbl.load(spark, "documents", SF)))
    # linear agg/join shape: never a window, never an all-pairs join
    assert "Window" not in plan
    assert "Cartesian" not in plan
    # partial aggregation feeds every exchange (distinct keys per
    # task cross the wire, not per-occurrence bigrams)
    assert "partial_count" in plan or "partial_sum" in plan
    # only doc_id + text are scanned
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in rs and "lang" not in rs and "source" not in rs


def test_semantic_dedup_single_cluster_exchange(spark):
    import re

    import ceres_spark.operators.semdedup as sd

    vecs = tbl.load(spark, "embeddings", SF)
    plan = plan_of(
        sd.semantic_dedup(vecs, tau=0.9, k=4, cache_key=SF + "/embeddings")
    )
    # the ONLY exchange is the groupBy on the cluster id — pairwise
    # similarity never becomes shuffled rows
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Cartesian" not in plan and "Join" not in plan


def test_quality_classifier_is_map_only(spark):
    import ceres_spark.operators.corpus as corp

    plan = plan_of(
        corp.quality_classifier(tbl.load(spark, "documents", SF))
    )
    # model inference = one projection over the scan: no shuffle,
    # no join, no UDF
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan  # stays in whole-stage codegen


def test_text_normalize_is_map_only(spark):
    plan = plan_of(text.text_normalize(tbl.load(spark, "documents", SF)))
    assert "Exchange" not in plan  # one codegen projection, no shuffle


def test_bloom_decontaminate_probes_are_broadcast(spark):
    import ceres_spark.operators.dedup as dd

    docs = tbl.load(spark, "documents", SF)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    rest = docs.filter(F.col("doc_id") % 97 != 0)
    plan = plan_of(dd.bloom_decontaminate(rest, ev, n_hashes=2))
    # both bloom word-table probes are map-side broadcast hash joins —
    # the corpus side must not shuffle before the exact verify
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_hard_negatives_broadcasts_queries(spark):
    import ceres_spark.operators.similarity as sim

    emb = tbl.load(spark, "embeddings", SF)
    plan = plan_of(sim.hard_negatives(
        emb.filter(F.col("vec_id") >= 25), emb.filter(F.col("vec_id") < 25)
    ))
    # non-equi pair scoring via broadcast NLJ (queries tiny), band
    # filter BEFORE the single per-query window; Spark 4's
    # WindowGroupLimit must prune the top-k BEFORE the exchange
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Window (") == 1
    assert "WindowGroupLimit" in plan


def test_source_similarity_joins_vocab_not_corpus(spark):
    import ceres_spark.operators.corpus as corp

    plan = plan_of(corp.source_similarity(tbl.load(spark, "documents", SF)))
    # per-source sizes are broadcast; the self-join runs on the
    # DISTINCT vocabulary (HashAggregate above the scan, below the join)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "HashAggregate" in plan


def test_ngram_novelty_single_gram_exchange(spark):
    import re

    import ceres_spark.operators.dedup as dd

    plan = plan_of(dd.ngram_novelty(tbl.load(spark, "documents", SF)))
    # linear shape (optimization r12): the per-gram MIN rides a
    # gram-partitioned Window beside every span row — ONE span
    # explode, no join of any kind, then the doc-keyed aggregate
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan
    n_windows = len(re.findall(r"^\(\d+\) Window", plan, re.M))
    assert n_windows == 1, plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_temperature_mix_single_corpus_scan(spark):
    import ceres_spark.operators.corpus as corp

    plan = plan_of(corp.temperature_mix(tbl.load(spark, "documents", SF)))
    # ONE scan of documents: everything after the per-source aggregate
    # operates on source-cardinality rows
    assert plan.count("Scan parquet") - plan.count("Scan parquet (") <= 2 \
        or plan.count("documents.parquet") >= 1


def test_morton_key_matches_pure_python_interleave(spark):
    import ceres_spark.operators.layout as lay

    def ref(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (0x1234, 0xABCD),
             (4095, 7), (65536 + 5, 3)]  # last: masked to low 16 bits
    df = spark.createDataFrame(cases, "x long, y long")
    got = [r["z"] for r in df.select(
        lay.morton_key(F.col("x"), F.col("y")).alias("z")
    ).collect()]
    assert got == [ref(x & 0xFFFF, y & 0xFFFF) for x, y in cases]


def test_zorder_layout_beats_time_sort_on_metric_locality(spark):
    # 64 metrics x 64 days; split into 16 range partitions: a
    # time-sorted layout puts ALL 64 metrics in every partition, the
    # z-ordered layout bounds each partition to a compact square
    import ceres_spark.operators.layout as lay

    rows = [(f"m{m:02d}", d * 86400, 1.0)
            for m in range(64) for d in range(64)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    z = lay.zorder_points(df)

    def mean_metrics_per_partition(d, key):
        parts = d.repartitionByRange(16, key).select(
            F.spark_partition_id().alias("p"), "metric"
        ).groupBy("p").agg(F.count_distinct("metric").alias("n")).collect()
        return sum(r["n"] for r in parts) / len(parts)

    ts_spread = mean_metrics_per_partition(z, F.col("ts"))
    z_spread = mean_metrics_per_partition(z, F.col("zkey"))
    assert ts_spread == 64.0          # every partition sees all metrics
    assert z_spread < 0.5 * ts_spread  # z-order: compact squares
