"""Stream-static dimension join == the batch join after AvailableNow."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF0001


def test_stream_static_enrichment_matches_batch(spark):
    from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import prepare
    from e_commerce_data_warehouse_recommendation_system_spark.streaming.queries import (
        stream_enrich_events,
    )

    prepare(spark, SF0001)
    tmp = tempfile.mkdtemp(prefix="ecomdw_test_enrich_")
    try:
        stage = f"{tmp}/landing"
        os.makedirs(stage)
        os.symlink(f"{SF0001}/events.parquet", f"{stage}/events.parquet")
        out = f"{tmp}/enriched"
        stream_enrich_events(spark, SF0001, stage, out, f"{tmp}/ckpt")
        got = {
            (r.event_id, r.segment)
            for r in spark.read.parquet(out).select("event_id", "segment").collect()
        }
        ev = spark.table("events").select("event_id", "user_id")
        cust = spark.table("customer").select(
            F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
        )
        want = {
            (r.event_id, r.segment)
            for r in ev.join(cust, "user_id", "left").select("event_id", "segment").collect()
        }
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
