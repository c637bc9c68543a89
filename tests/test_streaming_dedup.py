"""dropDuplicatesWithinWatermark: a doubled source yields each event once."""

from __future__ import annotations

import os
import shutil
import tempfile

from tests.conftest import SF0001


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
