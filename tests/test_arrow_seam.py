"""Pin the private-PySpark Arrow seam (VERDICT r8 "What's wrong" #3).

The replay fixture writer (__spark_entry__._write_arrival_files)
rides ``DataFrame.toArrow`` (public since Spark 4.0 — r9 moved it
off the private ``_collect_as_arrow`` VERDICT r8 flagged) to write n
arrival files driver-side with zero Spark jobs. A PySpark change
that breaks the Arrow collect would degrade GRACEFULLY (the
partitionBy fallback is correct) but silently re-inflate the replay
floor by ~1.5-3 s per replay. These tests make that bump fail pytest
loudly instead, and prove the fallback engages (with a log line) and
produces byte-identical arrival semantics.
"""

import glob
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def _mk_df(spark):
    from pyspark.sql import functions as F

    return (
        spark.range(40)
        .select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 3).cast("double").alias("v"),
            (F.col("id") % 4).cast("int").alias("_part"),
        )
    )


def test_to_arrow_exists_and_returns_expected_schema(spark):
    """The version probe: fails the moment a PySpark bump drops or
    reshapes DataFrame.toArrow (public since Spark 4.0, SPARK-47365
    — r9 replaced the private _collect_as_arrow with it), so the
    fast path can't silently die."""
    df = _mk_df(spark)
    assert hasattr(type(df), "toArrow"), (
        "PySpark dropped DataFrame.toArrow — the arrow arrival fast "
        "path in _write_arrival_files is now dead code; re-point it "
        "at the supported replacement or accept the partitionBy "
        "fallback and delete the fast path."
    )
    import pyarrow as pa

    tbl = df.toArrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 40
    assert tbl.column_names == ["k", "v", "_part"]
    # the fast path relies on Spark's own Arrow schema (types must
    # match what a Spark parquet write would have produced)
    assert tbl.schema.field("k").type == pa.int64()
    assert tbl.schema.field("v").type == pa.float64()
    assert tbl.schema.field("_part").type == pa.int32()


def test_fast_path_writes_arrival_files_without_spark_jobs(spark, tmp_path):
    src = str(tmp_path / "fast")
    entry._write_arrival_files(_mk_df(spark), src, 4)
    files = sorted(glob.glob(os.path.join(src, "arrival-*.parquet")))
    assert [os.path.basename(f) for f in files] == [
        f"arrival-{i:02d}.parquet" for i in range(4)
    ]
    # mtimes pin arrival order for the file streaming source
    assert [int(os.path.getmtime(f)) for f in files] == [
        1000, 1001, 1002, 1003
    ]


def test_fallback_engages_loudly_and_matches_fast_path(
    spark, tmp_path, monkeypatch, capsys
):
    """Simulate the PySpark bump: with toArrow raising, the
    partitionBy fallback must (a) log the seam loudly and (b) produce
    the same per-file rows and mtime ladder as the fast path."""
    import duckdb

    df = _mk_df(spark)
    fast = str(tmp_path / "fast")
    entry._write_arrival_files(df, fast, 4)

    monkeypatch.setattr(
        type(df),
        "toArrow",
        lambda self, *a, **kw: (_ for _ in ()).throw(
            AttributeError("simulated PySpark bump")
        ),
    )
    slow = str(tmp_path / "slow")
    entry._write_arrival_files(df, slow, 4)
    err = capsys.readouterr().err
    assert "arrow arrival fast path unavailable" in err
    assert "partitionBy" in err

    con = duckdb.connect()
    for i in range(4):
        f_fast = os.path.join(fast, f"arrival-{i:02d}.parquet")
        f_slow = os.path.join(slow, f"arrival-{i:02d}.parquet")
        q = (
            "SELECT k, v FROM read_parquet('{}') ORDER BY k"
        )
        assert (
            con.execute(q.format(f_fast)).fetchall()
            == con.execute(q.format(f_slow)).fetchall()
        )
        assert int(os.path.getmtime(f_slow)) == 1000 + i


def test_empty_split_raises_not_silently_shrinks(spark, tmp_path):
    # 3 distinct _part values but n=4 → batch 3 empty → loud error on
    # BOTH paths (the replay would otherwise run with a wrong
    # micro-batch count)
    from pyspark.sql import functions as F

    df = spark.range(12).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("_part")
    )
    with pytest.raises(entry._BadArrivalSplit):
        entry._write_arrival_files(df, str(tmp_path / "bad"), 4)

def test_ranged_split_matches_spark_quartile_path(spark, tmp_path):
    """Optimization r13: _write_arrival_files_ranged computes the
    contiguous time-range split driver-side from the Arrow collect.
    The files must be row-identical to the old Spark-side
    _with_time_quartile + _write_arrival_files path (same integer
    split rule), including the drop= helper-column handling."""
    import duckdb
    from pyspark.sql import functions as F

    df = spark.range(97).select(
        (F.col("id") * 7 + 13).cast("long").alias("ts"),
        (F.col("id").cast("double") / 3).alias("v"),
    )
    new = str(tmp_path / "new")
    entry._write_arrival_files_ranged(df, "ts", new, 4)
    old = str(tmp_path / "old")
    entry._write_arrival_files(
        entry._with_time_quartile(df, "ts", 4), old, 4
    )
    con = duckdb.connect()
    for i in range(4):
        q = "SELECT * FROM read_parquet('{}/arrival-%02d.parquet')" % i
        assert (
            con.execute(q.format(new)).fetchall()
            == con.execute(q.format(old)).fetchall()
        )
    # drop= removes the helper column AFTER the split is computed
    dropped = str(tmp_path / "dropped")
    entry._write_arrival_files_ranged(df, "ts", dropped, 4, drop=("ts",))
    cols = con.execute(
        f"SELECT * FROM read_parquet('{dropped}/arrival-00.parquet') LIMIT 0"
    ).description
    assert [c[0] for c in cols] == ["v"]


def test_half_split_matches_agg_mid_path(spark, tmp_path):
    """_write_arrival_files_half: batch 1 is id > max(id)//2 — the
    split rule the corpus/simhash/ann replays used, with the max(id)
    scalar job folded into the Arrow collect."""
    import duckdb
    from pyspark.sql import functions as F

    df = spark.range(31).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    new = str(tmp_path / "new")
    entry._write_arrival_files_half(df, "doc_id", new)
    mid = df.agg(F.max("doc_id")).collect()[0][0] // 2
    old = str(tmp_path / "old")
    entry._write_arrival_files(
        df.withColumn("_part", (F.col("doc_id") > mid).cast("int")),
        old,
        2,
    )
    con = duckdb.connect()
    for i in range(2):
        q = "SELECT * FROM read_parquet('{}/arrival-%02d.parquet')" % i
        assert (
            con.execute(q.format(new)).fetchall()
            == con.execute(q.format(old)).fetchall()
        )
