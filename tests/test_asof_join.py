"""asof_join edge cases on tiny frames (the oracle covers bulk semantics)."""

from __future__ import annotations

import datetime as dt

from e_commerce_data_warehouse_recommendation_system_spark.operators.relational import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, schema="k int, lt timestamp, ev string")
    right = spark.createDataFrame(right_rows, schema="k int, rt timestamp, val string")
    out = asof_join(left, right, key="k", left_time="lt", right_time="rt", value_cols=["val"])
    return {(r.k, r.ev): r.val for r in out.collect()}


def test_asof_picks_latest_at_or_before(spark):
    got = _run(
        spark,
        [(1, _ts("2026-01-01T10:00"), "e1"), (1, _ts("2026-01-01T12:00"), "e2")],
        [(1, _ts("2026-01-01T09:00"), "a"), (1, _ts("2026-01-01T11:00"), "b")],
    )
    assert got == {(1, "e1"): "a", (1, "e2"): "b"}


def test_asof_equal_timestamp_is_inclusive(spark):
    got = _run(
        spark,
        [(1, _ts("2026-01-01T10:00"), "e1")],
        [(1, _ts("2026-01-01T10:00"), "a")],
    )
    assert got == {(1, "e1"): "a"}


def test_asof_left_before_any_right_is_null(spark):
    got = _run(
        spark,
        [(1, _ts("2026-01-01T08:00"), "e1")],
        [(1, _ts("2026-01-01T09:00"), "a")],
    )
    assert got == {(1, "e1"): None}


def test_asof_key_isolation(spark):
    got = _run(
        spark,
        [(1, _ts("2026-01-01T10:00"), "e1"), (2, _ts("2026-01-01T10:00"), "e2")],
        [(1, _ts("2026-01-01T09:00"), "a")],
    )
    assert got == {(1, "e1"): "a", (2, "e2"): None}


def test_asof_null_value_column_propagates(spark):
    """A matched right row whose value column is legitimately NULL must win
    over an older non-null row (DuckDB ASOF semantics) — the struct-carry
    form, not per-column last(ignorenulls)."""
    got = _run(
        spark,
        [(1, _ts("2026-01-01T12:00"), "e1")],
        [(1, _ts("2026-01-01T09:00"), "old"), (1, _ts("2026-01-01T11:00"), None)],
    )
    assert got == {(1, "e1"): None}
