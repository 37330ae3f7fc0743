"""Repo-wide physical-plan audit: EVERY registry entry's plan is
machine-checked for the two anti-patterns this engine bans outright —
row-at-a-time Python UDFs (BatchEvalPython; all Python must be
Arrow-batched) and unbounded cartesian products. Individual plan
SHAPES (pushdown, broadcast, partial agg) are pinned per-query in
tests/test_plans.py; this is the fleet-wide backstop that new
operators cannot regress silently."""

import contextlib
import io

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_no_banned_plan_shapes(spark, name):
    df = entrymod.queries()[name](spark, SF)
    plan = _plan(df)
    # Arrow-batched Python shows as ArrowEvalPython / MapInPandas /
    # FlatMapGroupsInPandas; BatchEvalPython is the row-at-a-time
    # serializer and must never appear
    assert "BatchEvalPython" not in plan, name
    if name == "series_arithmetic":
        # documented 1-row broadcast bounds table (relational.py) is
        # the only sanctioned cross join in the repo
        return
    assert "CartesianProduct" not in plan, name
