"""connected_components edge cases: long chains (diameter >> rounds without
compression), singletons, and multiple components."""

from __future__ import annotations

import pytest

# full-gate lane: multi-minute property/identity/streaming work (see pytest.ini)
pytestmark = pytest.mark.slow


def _cc(spark, node_ids, edge_pairs):
    from e_commerce_data_warehouse_recommendation_system_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(n,) for n in node_ids], "node bigint")
    edges = spark.createDataFrame(edge_pairs or [(0, 0)], "a bigint, b bigint")
    if not edge_pairs:
        edges = edges.filter("a < 0")  # empty frame, same schema
    out = connected_components(nodes, edges)
    return {r.node: r.label for r in out.collect()}


def test_long_chain_converges(spark):
    """A 200-node path has diameter 199 — plain min-propagation would need
    199 rounds; path compression must converge within the round cap."""
    n = 200
    got = _cc(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_multiple_components_and_singletons(spark):
    got = _cc(spark, range(10), [(1, 2), (2, 3), (5, 6), (8, 8)])
    want = {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}
    assert got == want


def test_no_edges_all_singletons(spark):
    got = _cc(spark, range(5), [])
    assert got == {i: i for i in range(5)}
