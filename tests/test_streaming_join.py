"""Stream-stream interval join == its batch twin after AvailableNow drain."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def test_stream_stream_join_matches_batch(spark):
    from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import prepare
    from e_commerce_data_warehouse_recommendation_system_spark.streaming.queries import (
        STREAM_JOIN_WINDOW_S,
        stream_stream_event_pairs,
    )

    streamed = stream_stream_event_pairs(spark, SF0001)
    got = {(r.event_a, r.event_b) for r in streamed.collect()}

    prepare(spark, SF0001)
    ev = spark.table("events").select("event_id", "user_id", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    batch = a.join(
        b,
        F.expr(
            f"""a.user_id = b.user_id AND a.event_id < b.event_id
            AND b.ts >= a.ts - interval {STREAM_JOIN_WINDOW_S} seconds
            AND b.ts <= a.ts + interval {STREAM_JOIN_WINDOW_S} seconds"""
        ),
    ).select(F.col("a.event_id").alias("event_a"), F.col("b.event_id").alias("event_b"))
    want = {(r.event_a, r.event_b) for r in batch.collect()}
    assert got == want
    assert len(got) > 0
