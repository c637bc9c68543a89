"""Stream-stream interval join == its batch twin after AvailableNow drain."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF0001

# full-gate lane: multi-minute property/identity/streaming work (see pytest.ini)
pytestmark = pytest.mark.slow


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


def test_left_outer_join_null_padding_gates_on_watermark(spark, tmp_path):
    """Constructed-boundary pin for stream_left_outer_enrich's oracle
    predicate: the global watermark is min(max event time across BOTH
    watermarked sides) - delay, and a left row whose timestamp EQUALS the
    final watermark is HELD (strict <). Three purchases:

    - P2 far below the watermark -> null-padded row emitted;
    - P1 exactly AT the watermark (max click at P1 + delay, max purchase
      beyond it, so wm == P1.ts) -> held;
    - P3 above the watermark -> held.
    """
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from e_commerce_data_warehouse_recommendation_system_spark.streaming.queries import (
        LOUTER_DELAY_S,
        LOUTER_WINDOW_S,
        _events_stream,
        _events_stream_schema,
    )

    delay_us = LOUTER_DELAY_S * 1_000_000
    base = 1_704_067_200_000_000
    rows = [
        (1, base, 10, "purchase"),  # P1: ts == final watermark exactly
        (2, base - 10 * delay_us, 11, "purchase"),  # P2: long expired
        (3, base + 2 * delay_us, 12, "purchase"),  # P3: beyond the watermark
        (4, base + delay_us, 99, "click"),  # max click -> wm = base
    ]
    tmp = str(tmp_path)
    df = spark.createDataFrame(
        [(e, t * 1000, u, ty, 1.0, None) for e, t, u, ty in rows],
        schema=_events_stream_schema(T.LongType()),
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/src")
    part = next(f for f in os.listdir(f"{tmp}/src") if f.endswith(".parquet"))
    os.makedirs(f"{tmp}/sf", exist_ok=True)
    os.rename(f"{tmp}/src/{part}", f"{tmp}/sf/events.parquet")

    purch = (
        _events_stream(spark, f"{tmp}/sf", f"{tmp}/landing")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", f"{LOUTER_DELAY_S} seconds")
    )
    clicks = (
        _events_stream(spark, f"{tmp}/sf", f"{tmp}/landing")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", f"{LOUTER_DELAY_S} seconds")
    )
    joined = purch.join(
        clicks,
        F.expr(
            f"p_user = c_user AND c_ts >= p_ts - interval {LOUTER_WINDOW_S} seconds"
            " AND c_ts <= p_ts"
        ),
        "leftOuter",
    ).select("p_id", "c_id")
    out = f"{tmp}/out"
    (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    res = spark.read.parquet(out)
    assert sorted(
        r.p_id for r in res.filter(F.col("c_id").isNull()).collect()
    ) == [2], "only the long-expired purchase may null-pad; the tie row is HELD"
