"""Data-quality rule semantics on tiny frames."""

from __future__ import annotations

from e_commerce_data_warehouse_recommendation_system_spark.operators.quality import (
    accepted_values,
    in_range,
    matches_regex,
    not_null,
    unique,
    validate,
)


def _violations(spark, rows, rules):
    df = spark.createDataFrame(rows, schema="k int, v string")
    return {r.rule: r.violations for r in validate(df, rules).collect()}


def test_rules_count_violations(spark):
    rows = [(1, "a"), (1, "b"), (None, "c"), (4, None), (9, "a")]
    got = _violations(
        spark,
        rows,
        [
            not_null("k"),
            unique("k"),
            in_range("k", 0, 5),
            accepted_values("v", ("a", "b")),
            matches_regex("v", "^[ab]$"),
        ],
    )
    assert got["not_null(k)"] == 1
    assert got["unique(k)"] == 1  # two 1s -> one surplus; nulls ignored
    assert got["in_range(k,0,5)"] == 1  # 9
    # null v is neither a violation nor a pass for isin/rlike (SQL null
    # semantics: the predicate is NULL, sum skips it) -> only 'c' counts
    assert got["accepted_values(v)"] == 1
    assert got["matches_regex(v)"] == 1


def test_approx_distinct_within_rsd_bound(spark):
    from e_commerce_data_warehouse_recommendation_system_spark.operators.relational import (
        a6b_approx_distinct,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import load_table
    from tests.conftest import SF0001

    (row,) = a6b_approx_distinct(spark, SF0001).collect()
    li = load_table(spark, SF0001, "lineitem")
    exact_orders = li.select("l_orderkey").distinct().count()
    exact_parts = li.select("l_partkey").distinct().count()
    # rsd=0.02 -> allow 3 sigma
    assert abs(row.approx_orders - exact_orders) <= 0.06 * exact_orders
    assert abs(row.approx_parts - exact_parts) <= 0.06 * exact_parts


def test_all_green_on_clean_data(spark):
    rows = [(1, "a"), (2, "b")]
    got = _violations(spark, rows, [not_null("k"), unique("k"), in_range("k", 0, 5)])
    assert set(got.values()) == {0}
