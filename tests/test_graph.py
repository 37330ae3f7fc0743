"""Connected-components semantics on hand-built graphs."""

import pytest

import ceres_spark.operators.graph as gr


def edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_chain_collapses_to_min_label(spark):
    # 1-2-3-4 chain plus disjoint 10-11: transitivity across hops
    e = edges(spark, [(2, 1), (2, 3), (3, 4), (10, 11)])
    out = {r["node"]: r["comp"] for r in gr.connected_components(e).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_nodes_only_from_edges(spark):
    # singletons are the caller's job — CC labels only edge endpoints
    e = edges(spark, [(5, 7)])
    out = gr.connected_components(e).collect()
    assert {r["node"] for r in out} == {5, 7}
    assert all(r["comp"] == 5 for r in out)


def test_direction_irrelevant(spark):
    a = gr.connected_components(edges(spark, [(1, 2), (3, 2)])).collect()
    b = gr.connected_components(edges(spark, [(2, 1), (2, 3)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_non_convergence_raises(spark):
    # a 12-node chain cannot converge in 2 rounds — must raise, never
    # return a partial labelling
    chain = [(i, i + 1) for i in range(11)]
    with pytest.raises(RuntimeError, match="converge"):
        gr.connected_components(edges(spark, chain), max_iter=2)
