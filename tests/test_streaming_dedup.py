"""dropDuplicatesWithinWatermark: a doubled source yields each event once."""

from __future__ import annotations

import pytest

import os
import shutil
import tempfile

from tests.conftest import SF0001

# full-gate lane: multi-minute property/identity/streaming work (see pytest.ini)
pytestmark = pytest.mark.slow


def test_stream_dedup_drops_replayed_files(spark):
    from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import (
        load_table,
    )
    from e_commerce_data_warehouse_recommendation_system_spark.streaming.queries import (
        stream_dedup_events,
    )

    tmp = tempfile.mkdtemp(prefix="ecomdw_test_dedup_")
    try:
        stage = f"{tmp}/landing"
        os.makedirs(stage)
        src = f"{SF0001}/events.parquet"
        # the same data lands twice — a replayed delivery
        shutil.copy(src, f"{stage}/events_a.parquet")
        shutil.copy(src, f"{stage}/events_b.parquet")
        out = f"{tmp}/deduped"
        stream_dedup_events(spark, SF0001, stage, out, f"{tmp}/ckpt")
        got = spark.read.parquet(out)
        n_distinct_src = load_table(spark, SF0001, "events").count()
        assert got.count() == n_distinct_src
        assert got.select("event_id").distinct().count() == n_distinct_src
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_late_replay_is_dropped_as_late_not_deduped(spark):
    """The boundary half of dropDuplicatesWithinWatermark's contract,
    PROBED rather than assumed (round 7): the naive reading is that a
    replay arriving after the watermark expired the first copy's dedup
    state passes through as a duplicate. It does NOT in this topology —
    because any replay old enough to outlive the dedup state
    (event_time + delay < watermark) is by construction LATE
    (event_time < watermark), and the watermark's late-row filter drops
    it BEFORE the dedup operator ever sees it. State expiry and the late
    filter compose, so exactly-once survives even a 10-day-late replay.
    Three files forced into separate micro-batches: (1) event A; (2) an
    advancer 10 days later pushing the 1-day watermark far past A;
    (3) A replayed. The terminal sink holds A exactly ONCE."""
    from pyspark.sql import types as T

    from e_commerce_data_warehouse_recommendation_system_spark.streaming.queries import (
        _events_stream_schema,
        _events_ts_layout,
    )
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="ecomdw_test_dedup_wm_")
    try:
        stage = f"{tmp}/landing"
        os.makedirs(stage)
        base_us = 1_704_067_200_000_000
        day_us = 86_400 * 1_000_000
        schema = _events_stream_schema(T.LongType())  # nanos-as-long layout

        def drop_file(name, rows):
            d = f"{tmp}/{name}_src"
            spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(d)
            part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
            os.rename(f"{d}/{part}", f"{stage}/{name}.parquet")

        a = (1, base_us * 1000, 10, "click", 1.0, None)
        drop_file("f1_first", [a])
        drop_file("f2_advancer", [(2, (base_us + 10 * day_us) * 1000, 11, "click", 1.0, None)])
        drop_file("f3_replay", [a])

        s, normalize = _events_ts_layout(spark, stage)
        events = (
            normalize(
                spark.readStream.schema(s)
                .option("maxFilesPerTrigger", "1")
                .parquet(stage)
            )
            .withWatermark("ts", "1 day")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        out = f"{tmp}/out"
        (
            events.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        got = spark.read.parquet(out)
        n_a = got.filter(F.col("event_id") == 1).count()
        assert n_a == 1, (
            "a late replay must be dropped by the watermark's late-row "
            f"filter (not pass as a duplicate) — saw event 1 {n_a}x"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
