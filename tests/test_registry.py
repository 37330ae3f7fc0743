"""Driver-contract hygiene: the registry must stay importable and
internally consistent — a single broken import or dangling oracle key
would take down EVERY query in the driver's gate at once."""

import inspect

import __spark_entry__ as entrymod


def test_every_query_is_callable_with_driver_signature():
    qs = entrymod.queries()
    assert len(qs) >= 100
    for name, fn in qs.items():
        assert callable(fn), name
        params = inspect.signature(fn).parameters
        assert len(params) == 2, (name, "must take (spark, sf_dir)")


def test_every_oracle_key_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    dangling = [k for k in os_ if k not in qs]
    assert dangling == []
    # oracle SQL must be non-trivial text
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in os_.values())


def test_driver_prefix_holds_50_entries_with_no_duplicates():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert len(names) >= 50    # the driver-checked prefix exists


def test_entry_points_at_flagship(spark):
    df = entrymod.entry(spark)
    assert df.columns  # stable schema, driver collects it


def test_oracle_paired_entries_emit_only_scalar_columns(spark):
    """The driver's value hasher (pandas hash table) cannot hash
    list/map cells — an oracle-paired entry with an array column
    errors externally even when values match (CORRECTNESS_r03
    hash_embed). Pin the contract at schema level so the local gate
    predicts the driver gate; rows-only entries are exempt."""
    from pyspark.sql import types as T

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    sf_dir = "/root/testdata/sf0.001"
    bad = []
    for name, fn in qs.items():
        if name not in os_:
            continue
        schema = fn(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert bad == [], bad
