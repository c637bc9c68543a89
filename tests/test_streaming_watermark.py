"""Watermark semantics: late events are dropped once the watermark passes.

Two files forced into separate micro-batches: the second carries an event
whose timestamp is far behind the watermark established by the first. The
windowed aggregate must ignore it (its window's state was finalized), so
the late event changes nothing — the documented update-mode contract the
streaming daily rollup relies on.
"""

from __future__ import annotations

import pytest

import shutil
import tempfile

from pyspark.sql import functions as F

from e_commerce_data_warehouse_recommendation_system_spark.functions.scalar import dec_sum
from pyspark.sql import types as T

from e_commerce_data_warehouse_recommendation_system_spark.streaming.queries import (
    _events_stream_schema,
    _events_ts_layout,
    _run_foreach_batch_upsert,
)

# full-gate lane: multi-minute property/identity/streaming work (see pytest.ini)
pytestmark = pytest.mark.slow

#: This test writes its OWN fixture files with nanos-as-long ts — the legacy
#: testdata layout — so it doubles as coverage for _events_ts_layout's bigint
#: branch (the probe must pick the LONG schema + DIV 1000 rebuild here).
_LEGACY_LONG_SCHEMA = _events_stream_schema(T.LongType())

US_PER_DAY = 86_400 * 1_000_000


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, schema=_LEGACY_LONG_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_late_event_beyond_watermark_is_dropped(spark):
    tmp = tempfile.mkdtemp(prefix="ecomdw_test_wm_")
    try:
        landing = f"{tmp}/landing"
        base = 1_600_000_000 * 1_000_000  # epoch µs, day-aligned enough
        day = lambda d: base + d * US_PER_DAY  # noqa: E731
        # batch 1: days 0 and 5 -> watermark advances to day 4
        _write_events(
            spark,
            landing,
            [
                (1, day(0) * 1000, 10, "click", 1.0, None),
                (2, day(5) * 1000, 10, "click", 1.0, None),
            ],
        )
        # ts column stores NANOS (hence *1000 above); the probe must detect
        # the long layout and apply the DIV 1000 rebuild itself
        schema, normalize = _events_ts_layout(spark, landing)
        assert schema["ts"].dataType == T.LongType()
        stream = normalize(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(landing)
        )
        agg = (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("total_value"))
            .select(
                F.col("window.start").cast("date").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        )
        out = f"{tmp}/out"
        _run_foreach_batch_upsert(agg, ["window_start", "event_type"], out, f"{tmp}/ckpt1")
        first = {
            (str(r.window_start)): r.n_events for r in spark.read.parquet(out).collect()
        }
        assert sum(first.values()) == 2

        # batch 2 (new file, resumed checkpoint): a day-0 event, now far
        # behind the day-4 watermark -> must be dropped, plus a fresh day-6
        # event that must land
        _write_events(
            spark,
            f"{tmp}/late",
            [
                (3, day(0) * 1000, 10, "click", 1.0, None),
                (4, day(6) * 1000, 10, "click", 1.0, None),
            ],
        )
        import os

        os.rename(
            [f"{tmp}/late/{f}" for f in os.listdir(f"{tmp}/late") if f.endswith(".parquet")][0],
            f"{landing}/f2.parquet",
        )
        _run_foreach_batch_upsert(agg, ["window_start", "event_type"], out, f"{tmp}/ckpt1")
        final = {(str(r.window_start)): r.n_events for r in spark.read.parquet(out).collect()}
        # day-0 window unchanged at 1 (late event dropped); day-6 landed
        assert sum(final.values()) == 3, f"late event must be dropped: {final}"
        assert max(final.values()) == 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ts_layout_probe_fails_fast_on_empty_landing_dir(spark, tmp_path):
    """An empty landing dir must raise at setup — declaring a guessed
    stream schema would fail mid-stream (or silently misread instants) far
    from the cause."""
    import pytest

    empty = tmp_path / "landing_empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no readable parquet"):
        _events_ts_layout(spark, str(empty))
