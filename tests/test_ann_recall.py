"""ANN quality floors: approximate paths must actually find neighbors.

"Runs without error" is not a useful bar for an ANN operator — these pin
recall@5 against the exact brute-force top-k (measured ~0.44 LSH / ~0.64
IVF at sf0.001; floors set with margin). A regression that silently
degrades bucketing (e.g. back to one over-fine table, which measured 0.04)
fails here."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def exact_pairs(spark):
    from e_commerce_data_warehouse_recommendation_system_spark.operators.similarity import (
        sim_cosine_topk,
    )

    return {(r.query_id, r.neighbor_id) for r in sim_cosine_topk(spark, SF0001).collect()}


def _recall(spark, fn, exact):
    approx = {(r.query_id, r.neighbor_id) for r in fn(spark, SF0001).collect()}
    return len(exact & approx) / len(exact)


def test_lsh_recall_floor(spark, exact_pairs):
    from e_commerce_data_warehouse_recommendation_system_spark.operators.similarity import (
        sim_ann_lsh_topk,
    )

    assert _recall(spark, sim_ann_lsh_topk, exact_pairs) >= 0.3


def test_ivf_recall_floor(spark, exact_pairs):
    from e_commerce_data_warehouse_recommendation_system_spark.operators.similarity import (
        sim_ann_ivf_topk,
    )

    assert _recall(spark, sim_ann_ivf_topk, exact_pairs) >= 0.5
