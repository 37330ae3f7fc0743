"""applyInPandasWithState custom operator: state must accumulate
across micro-batches (the property a stateless foreachBatch can't
give you)."""

from pyspark.sql import functions as F

import ceres_spark.streaming.stateful as st


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    batches = [
        [("m", 60, 1.0), ("m", 120, 2.0), ("other", 60, 5.0)],
        [("m", 180, 3.0)],
    ]
    for rows in batches:
        spark.createDataFrame(
            rows, "metric string, ts long, value double"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "metric string, ts long, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = st.running_stats_stream(stream)
    q = out.writeStream.format("memory").queryName("rs").outputMode(
        "update"
    ).trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ck")
    ).start()
    q.awaitTermination(120)

    rows = spark.sql("select * from rs").collect()
    # the LAST emission per metric carries the accumulated totals
    final = {}
    for r in rows:
        cur = final.get(r["metric"])
        if cur is None or r["n_events"] >= cur["n_events"]:
            final[r["metric"]] = r
    m = final["m"]
    assert m["n_events"] == 3 and m["sum_value"] == 6.0
    assert m["last_ts"] == 180 and m["last_value"] == 3.0
    o = final["other"]
    assert o["n_events"] == 1 and o["sum_value"] == 5.0
    # state persisted across at least 2 micro-batches for metric m
    m_emissions = [r for r in rows if r["metric"] == "m"]
    assert len(m_emissions) >= 2
