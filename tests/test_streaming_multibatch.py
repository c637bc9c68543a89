"""Streaming upsert across MULTIPLE micro-batches.

The registered streaming queries drain the single-file testdata source in
one batch; this test splits events into several files and forces
one-file-per-trigger so the foreachBatch upsert and the stateful
sessionizer actually exercise cross-batch merge/state paths, then checks
the terminal state equals the batch computation.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import load_table
from e_commerce_data_warehouse_recommendation_system_spark.streaming.queries import (
    _events_ts_layout,
    _run_foreach_batch_upsert,
)
from tests.conftest import SF0001

# full-gate lane: multi-minute property/identity/streaming work (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def split_events_dir(spark):
    """events.parquet split into 4 files. The raw (unnormalized) batch read
    round-trips whatever physical ts layout the testdata carries — the
    stream side must cope via _events_ts_layout, same as production."""
    tmp = tempfile.mkdtemp(prefix="ecomdw_test_stream_")
    raw = spark.read.parquet(f"{SF0001}/events.parquet")
    raw.repartition(4).write.mode("overwrite").parquet(f"{tmp}/landing")
    yield f"{tmp}/landing"
    shutil.rmtree(tmp, ignore_errors=True)


def test_multibatch_ingest_upsert_matches_batch(spark, split_events_dir):
    tmp = tempfile.mkdtemp(prefix="ecomdw_test_stream_out_")
    try:
        schema, normalize = _events_ts_layout(spark, split_events_dir)
        stream = normalize(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(split_events_dir)
        )
        out = f"{tmp}/ingested"
        _run_foreach_batch_upsert(stream, ["event_id"], out, f"{tmp}/ckpt")
        got = spark.read.parquet(out)
        batch = load_table(spark, SF0001, "events")
        assert got.count() == batch.count()
        assert got.select("event_id").distinct().count() == batch.count()
        # spot-check content equality on an aggregate
        g = {r.event_type: r.n for r in got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
        b = {r.event_type: r.n for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert g == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_partition_scoped_upsert_rejects_null_partition(spark, split_events_dir):
    """A NULL partition value would silently exclude old NULL-partition rows
    from the merge read (isin never matches NULL) while the batch still
    writes __HIVE_DEFAULT_PARTITION__ — duplicate keys across batches. The
    helper must refuse instead of corrupting."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    tmp = tempfile.mkdtemp(prefix="ecomdw_test_stream_out_")
    try:
        schema, normalize = _events_ts_layout(spark, split_events_dir)
        stream = normalize(
            spark.readStream.schema(schema).parquet(split_events_dir)
            # event_type 'view' -> NULL partition value
        ).withColumn(
            "_part",
            F.when(F.col("event_type") != "view", F.col("event_type")),
        )
        with pytest.raises(StreamingQueryException, match="NULL"):
            _run_foreach_batch_upsert(
                stream, ["event_id"], f"{tmp}/out", f"{tmp}/ckpt", partition_col="_part"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_multibatch_upsert_overwrites_colliding_keys(spark, split_events_dir):
    # Feed the SAME file set twice (two landing subdirs with identical
    # content but distinct names) — every key collides on the second pass,
    # so the terminal count must not double.
    tmp = tempfile.mkdtemp(prefix="ecomdw_test_stream_out_")
    try:
        landing2 = f"{tmp}/landing2"
        shutil.copytree(split_events_dir, landing2)
        import os

        for f_ in os.listdir(landing2):
            if f_.endswith(".parquet"):
                os.rename(f"{landing2}/{f_}", f"{landing2}/dup-{f_}")
        merged_landing = f"{tmp}/landing_all"
        os.makedirs(merged_landing)
        for src in (split_events_dir, landing2):
            for f_ in os.listdir(src):
                if f_.endswith(".parquet"):
                    os.symlink(f"{src}/{f_}", f"{merged_landing}/{f_}")
        schema, normalize = _events_ts_layout(spark, merged_landing)
        stream = normalize(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(merged_landing)
        )
        out = f"{tmp}/ingested"
        _run_foreach_batch_upsert(stream, ["event_id"], out, f"{tmp}/ckpt")
        batch = load_table(spark, SF0001, "events")
        assert spark.read.parquet(out).count() == batch.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_checkpoint_survives_restart_exactly_once(spark, split_events_dir):
    """Exactly-once ACROSS RESTARTS: a second AvailableNow run against the
    same checkpoint must (a) process nothing when no new files arrived —
    the target is byte-identical, no key duplicated — and (b) after a new
    file lands, merge ONLY that file's keys. This is the operational
    contract that lets the scheduled catch-up job (the reference's daily
    DAG shape) die and rerun safely at any point."""
    import os

    tmp = tempfile.mkdtemp(prefix="ecomdw_test_stream_rst_")
    landing = f"{tmp}/landing"
    shutil.copytree(split_events_dir, landing)
    try:
        out, ckpt = f"{tmp}/ingested", f"{tmp}/ckpt"

        def drain():
            schema, normalize = _events_ts_layout(spark, landing)
            stream = normalize(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(landing)
            )
            _run_foreach_batch_upsert(stream, ["event_id"], out, ckpt)

        drain()
        first = spark.read.parquet(out)
        n_first = first.count()
        total_value_1 = first.agg(
            F.sum(F.col("value").cast("decimal(28,8)")).alias("tv")
        ).collect()[0].tv

        # restart with nothing new: no reprocessing, no duplicates
        drain()
        again = spark.read.parquet(out)
        assert again.count() == n_first
        assert again.select("event_id").distinct().count() == n_first

        # a new file restates 10 existing keys with value+1000: the third
        # run merges exactly those keys, count unchanged, sum shifted
        restated = (
            spark.read.parquet(landing)
            .orderBy("event_id")
            .limit(10)
            .withColumn("value", F.col("value") + 1000.0)
        )
        restated.coalesce(1).write.parquet(f"{tmp}/extra")
        part = [f for f in os.listdir(f"{tmp}/extra") if f.endswith(".parquet")][0]
        shutil.copy(f"{tmp}/extra/{part}", f"{landing}/restated.parquet")
        drain()
        final = spark.read.parquet(out)
        assert final.count() == n_first, "restated keys must merge, not append"
        total_value_3 = final.agg(
            F.sum(F.col("value").cast("decimal(28,8)")).alias("tv")
        ).collect()[0].tv
        assert abs(float(total_value_3) - float(total_value_1) - 10000.0) < 1e-6
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_event_time_timeout_evicts_inactive_state(spark, tmp_path):
    """applyInPandasWithState + EventTimeTimeout — the custom-stateful
    expiry surface the gap sessionizer doesn't use (it keeps state to the
    terminal batch): a key that stops receiving events gets its state
    EVICTED once the watermark passes its inactivity timeout, and the
    function observes hasTimedOut=True exactly once with the accumulated
    state intact. A key whose timeout the final watermark never reached
    stays open — AvailableNow does NOT force-expire live state."""
    import os

    import pandas as pd  # noqa: F401 — used inside the stateful fn
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from e_commerce_data_warehouse_recommendation_system_spark.streaming.queries import (
        _events_stream_schema,
        _events_ts_layout,
    )

    tmp = str(tmp_path)
    stage = f"{tmp}/landing"
    os.makedirs(stage)
    base = 1_704_067_200_000_000
    day = 86_400 * 1_000_000
    schema = _events_stream_schema(T.LongType())

    def drop(name, rows):
        d = f"{tmp}/{name}_src"
        spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(f"{d}/{part}", f"{stage}/{name}.parquet")

    drop(
        "f1",
        [
            (1, base * 1000, 1, "click", 1.0, None),
            (2, (base + 1_000_000) * 1000, 1, "click", 1.0, None),
        ],
    )
    # ten days later: the 1-hour watermark sails past user 1's 30-min timeout
    drop("f2", [(3, (base + 10 * day) * 1000, 2, "click", 1.0, None)])

    s, normalize = _events_ts_layout(spark, stage)
    events = (
        normalize(
            spark.readStream.schema(s)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        .select("user_id", "ts")
        .withWatermark("ts", "1 hour")
    )
    gap_ms = 30 * 60 * 1000

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            last_ms, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]], "kind": ["closed"], "n": [n]})
        else:
            batch = pd.concat(list(pdfs), ignore_index=True)
            last_ms = int(batch["ts"].max().timestamp() * 1000)
            n = len(batch)
            if state.exists:
                p_last, p_n = state.get
                last_ms = max(last_ms, p_last)
                n += p_n
            state.update((last_ms, n))
            state.setTimeoutTimestamp(last_ms + gap_ms)
            yield pd.DataFrame({"user_id": [key[0]], "kind": ["open"], "n": [n]})

    out_df = events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id bigint, kind string, n bigint",
        stateStructType="last_ms bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out = f"{tmp}/out"
    (
        out_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(
        (r.user_id, r.kind, r.n) for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, "closed", 2),  # evicted with the full accumulated count
        (1, "open", 2),
        (2, "open", 1),  # timeout never reached -> no closed row
    ]
