"""Registered queries that exercise the sink/maintenance operators (S5-S12).

Round 1 shipped the writers (sources/writers.py) with no driver-visible
coverage — every op here routes a real dataset through a writer and returns
a deterministic, SQL-expressible digest, so upsert/delete/append/truncate
and the parquet/CSV round-trips all get hash-matched oracle rows.

Each oracle simulates the writer's relational semantics in pure SQL (e.g.
upsert = new ∪ (old ⟂ new-keys)), which is exactly the contract the
join-based implementations claim.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_data_warehouse_recommendation_system_spark.registry import component, register
from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import (
    prepare,
    read_csv,
    read_json,
)
from e_commerce_data_warehouse_recommendation_system_spark.sources.writers import (
    append_rows,
    delete_by_keys,
    export_csv,
    truncate_like,
    upsert,
    write_table,
)

# "new" rows for the upsert: every 10th order, with a restated total.
_SQL_UPSERT = """
    WITH new AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    survivors AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM new)
    ),
    merged AS (SELECT * FROM new UNION ALL SELECT * FROM survivors)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS total_price
    FROM merged GROUP BY o_orderstatus
"""


@component(
    "wr_upsert",
    oracle=_SQL_UPSERT,
    cols=[("o_orderstatus", "str"), ("n_orders", "num"), ("total_price", "num")],
)
def wr_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/D4: MERGE-emulation upsert (reference: plugins/mysql_operator.py:28-59)
    — restate every 10th order's total, merge, digest by status."""
    prepare(spark, sf_dir)
    old = spark.table("orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = old.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merged = upsert(old, new, ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,8)")).alias("total_price"),
    )


@component(
    "wr_delete_by_keys",
    cols=[("o_orderstatus", "str"), ("n_orders", "num")],
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    GROUP BY o_orderstatus
    """,
)
def wr_delete_by_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/J5: DELETE-by-key as an anti-join
    (reference: plugins/mysql_operator.py:61-80) — purge orders of
    negative-balance customers."""
    prepare(spark, sf_dir)
    orders = spark.table("orders")
    bad = (
        spark.table("customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    remaining = delete_by_keys(orders, bad, ["o_custkey"])
    return remaining.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_orders"))


@component(
    "wr_append_union",
    cols=[("n_rows", "num"), ("n_distinct", "num")],
    oracle="""
    WITH appended AS (
      SELECT o_orderkey FROM orders
      UNION ALL
      SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
    )
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_distinct
    FROM appended
    """,
)
def wr_append_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/SO4: plain append (reference: plugins/mysql_operator.py:82-92) —
    duplicates preserved, proven by count vs distinct-count."""
    prepare(spark, sf_dir)
    orders = spark.table("orders").select("o_orderkey")
    high = spark.table("orders").filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    appended = append_rows(orders, high)
    return appended.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct"),
    )


@component(
    "wr_truncate",
    oracle="SELECT COUNT(*) AS n_rows FROM orders WHERE FALSE",
    cols=[("n_rows", "num")],
)
def wr_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: TRUNCATE analog — schema preserved, zero rows
    (reference: plugins/mysql_operator.py:94-110)."""
    prepare(spark, sf_dir)
    return truncate_like(spark.table("orders")).agg(F.count(F.lit(1)).alias("n_rows"))


@component(
    "wr_parquet_roundtrip",
    cols=[("n_name", "str"), ("n_customers", "num"), ("total_balance", "dbl")],
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS total_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def wr_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: overwrite-mode parquet materialization then re-read — the
    replace-then-append idempotent load (reference: dags/extract_data.py:55-71)
    collapsed to an atomic overwrite. Digest proves write+read lose nothing."""
    prepare(spark, sf_dir)
    c, n = spark.table("customer"), spark.table("nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name", "c_custkey", "c_acctbal"
    )
    tmp = tempfile.mkdtemp(prefix="ecomdw_wr_")
    try:
        path = f"{tmp}/cust_nation"
        write_table(joined, path)
        back = spark.read.parquet(path)
        result = (
            back.groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(28,8)"))
                .cast("double")
                .alias("total_balance"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@component(
    "wr_json_roundtrip",
    cols=[("event_type", "str"), ("n_events", "num"), ("total_value", "dbl")],
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def wr_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + explicit-schema JSON source (readers.read_json):
    events projected to JSONL, read back with a declared schema (never
    inferSchema — the engine's explicit-schema rule, SURVEY §1.4), digest
    proves the format round-trip loses nothing."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    prepare(spark, sf_dir)
    ev = spark.table("events").select("event_id", "event_type", "value")
    tmp = tempfile.mkdtemp(prefix="ecomdw_wr_")
    try:
        path = f"{tmp}/events_jsonl"
        ev.write.mode("overwrite").json(path)
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        back = read_json(spark, path, schema)
        result = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(28,8)")).cast("double").alias("total_value"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@component(
    "wr_orc_roundtrip",
    cols=[("o_orderpriority", "str"), ("n_orders", "num"), ("total_price", "num")],
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def wr_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round-trip — the third columnar interchange format
    next to parquet and CSV/JSON (Spark-native, zstd-compressed here like a
    warehouse export would be). Same columnar benefits as parquet
    (predicate pushdown, column pruning, vectorized read), so the engine's
    scan posture carries over unchanged; the digest proves write+read lose
    nothing through the format boundary."""
    prepare(spark, sf_dir)
    o = spark.table("orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="ecomdw_wr_")
    try:
        path = f"{tmp}/orders_orc"
        o.write.mode("overwrite").option("compression", "zstd").orc(path)
        back = spark.read.orc(path)
        result = (
            back.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(28,8)")).alias(
                    "total_price"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "wr_bucketed_join",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def wr_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — the pre-shuffle lever for repeated joins
    on the same key at 100 TB: both tables written with
    ``bucketBy(orderkey)``, so the join needs NO Exchange on either side
    (bucket info replaces the shuffle; verified in the plan below). The
    reference re-materializes through Postgres between stages with no
    physical co-location at all (reference: dags/extract_data.py:55-71).

    Result digest is oracle-identical to the plain join.
    """
    import shutil
    import tempfile
    import uuid

    prepare(spark, sf_dir)
    suffix = uuid.uuid4().hex[:8]
    tmp = tempfile.mkdtemp(prefix="ecomdw_bkt_")
    o_tbl, li_tbl = f"orders_bkt_{suffix}", f"lineitem_bkt_{suffix}"
    # external tables (explicit path) so no spark-warehouse dir appears in cwd
    (
        spark.table("orders")
        .select("o_orderkey", "o_orderstatus")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{tmp}/{o_tbl}")
        .mode("overwrite")
        .saveAsTable(o_tbl)
    )
    (
        spark.table("lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{tmp}/{li_tbl}")
        .mode("overwrite")
        .saveAsTable(li_tbl)
    )
    try:
        o_b, li_b = spark.table(o_tbl), spark.table(li_tbl)
        joined = o_b.join(li_b, o_b.o_orderkey == li_b.l_orderkey)
        result = (
            joined.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.col("l_quantity").cast("decimal(28,8)"))
                .cast("double")
                .alias("total_qty"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {o_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {li_tbl}")
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@component(
    "wr_csv_roundtrip",
    cols=[("r_name", "str"), ("n_nations", "num")],
    oracle="""
    SELECT r_name, COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def wr_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S10/S12: CSV export (reference: postgres_reader.py:131-145) then
    CSV bulk load with an explicit schema (reference: load_data.sql:1-35) —
    the full file round-trip through both CSV operators."""
    prepare(spark, sf_dir)
    n, r = spark.table("nation"), spark.table("region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )
    tmp = tempfile.mkdtemp(prefix="ecomdw_wr_")
    try:
        path = f"{tmp}/nation_region_csv"
        export_csv(joined, path, single_file=True)
        back = read_csv(
            spark,
            path,
            schema="n_nationkey INT, n_name STRING, r_name STRING",
        )
        result = (
            back.groupBy("r_name")
            .agg(F.count(F.lit(1)).alias("n_nations"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare: list[str]
) -> DataFrame:
    """CDC between two table snapshots: one full outer join on the key,
    rows classified insert/delete/update/unchanged by comparing the
    ``compare`` columns null-safely.

    Scale posture: exactly one co-partitioned shuffle on the key (both
    sides hash-partition identically, so AQE can plan a plain sort-merge
    join); the comparison is a map-side expression. For very wide rows at
    100 TB, pre-hash the compare columns (md5 of a canonical concat) on
    each side so the join carries key + one hash instead of the full row —
    same classification, a fraction of the shuffle bytes."""
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_oc_{c}") for c in compare],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_nc_{c}") for c in compare],
    )
    cond = [o[f"_ok_{k}"] == n[f"_nk_{k}"] for k in keys]
    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"_oc_{c}").eqNullSafe(F.col(f"_nc_{c}"))
    return o.join(n, cond, "full_outer").select(
        F.when(F.col(f"_ok_{keys[0]}").isNull(), F.lit("insert"))
        .when(F.col(f"_nk_{keys[0]}").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type")
    )


# The "next" snapshot, derived deterministically from orders itself so the
# oracle can rebuild it in SQL: every 10th order deleted, every 7th
# surviving order's total restated (+1), and every 13th order re-inserted
# under a fresh (negative) key.
_SQL_CDC_NEW_SNAPSHOT = """
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 10 <> 0
    UNION ALL
    SELECT -o_orderkey AS o_orderkey, 'O' AS o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 13 = 0
"""


@component(
    "wr_snapshot_cdc",
    oracle=f"""
    WITH new_snap AS ({_SQL_CDC_NEW_SNAPSHOT}),
    diff AS (
      SELECT CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                  WHEN b.o_orderkey IS NULL THEN 'delete'
                  WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                       OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                       THEN 'update'
                  ELSE 'unchanged' END AS change_type
      FROM orders a FULL OUTER JOIN new_snap b ON a.o_orderkey = b.o_orderkey
    )
    SELECT change_type, COUNT(*) AS n_rows FROM diff GROUP BY change_type
    """,
    cols=[("change_type", "str"), ("n_rows", "num")],
)
def wr_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots of a table — the
    incremental-load primitive the reference approximates by re-extracting
    full tables every DAG run (reference: dags/extract_data.py:33-81 full
    SELECT *). Detecting the delta instead is what makes a daily 100 TB
    sync feasible: downstream only reprocesses insert/update/delete rows.
    Classifies via ``snapshot_diff`` (one key-partitioned full outer
    join), then digests to per-class counts."""
    prepare(spark, sf_dir)
    old = spark.table("orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    survivors = old.filter(F.col("o_orderkey") % 10 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    inserts = (
        old.filter(F.col("o_orderkey") % 13 == 0)
        .select(
            (-F.col("o_orderkey")).alias("o_orderkey"),
            F.lit("O").alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    new = survivors.unionByName(inserts)
    diff = snapshot_diff(
        old, new, keys=["o_orderkey"], compare=["o_orderstatus", "o_totalprice"]
    )
    return diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_rows"))


# --------------------------------------------------------------------------
# Small-file compaction (table maintenance / OPTIMIZE)
# --------------------------------------------------------------------------

#: compaction target: files below this size are "small"; the compactor
#: plans output partitions as ceil(total_bytes / target). Tuned tiny for
#: the testdata; production uses 128-512 MB (HDFS-block / parquet
#: row-group scale).
COMPACT_TARGET_BYTES = 256 * 1024
_FRAGMENT_PARTS = 64


@component(
    "wr_compact_small_files",
    cols=[
        ("n_rows", "num"),
        ("sum_doc_id", "num"),
        ("sum_n_chars", "num"),
        ("files_reduced", "bool"),
        ("meets_target_count", "bool"),
    ],
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           TRUE AS files_reduced,
           TRUE AS meets_target_count
    FROM documents
    """,
)
def wr_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the OPTIMIZE/maintenance pass every
    long-running ingest needs: streaming sinks and per-batch appends leave
    thousands of KB-scale files whose open/footer costs eventually dominate
    scans. This fragments the documents table into 64 files, then
    compacts by planning ceil(total_bytes / target) output files from the
    directory listing (driver-side file METADATA — bounded by file count,
    never data) and rewriting with ``coalesce`` (narrow, shuffle-free: at
    100 TB compaction is IO-bound and the one thing to avoid is adding a
    full shuffle on top of the rewrite; range-clustered layouts would use
    ``repartitionByRange`` instead and buy data-skipping with the extra
    shuffle).

    Contract: row count and content digests (SQL-derivable — compaction
    must be a byte-level no-op on the DATA) plus flags computed from the
    real before/after listings: file count strictly reduced, and the
    compacted count within one file of the byte-planned target.
    """
    prepare(spark, sf_dir)
    import math
    import os

    docs = spark.table("documents").select("doc_id", "n_chars")
    tmp = tempfile.mkdtemp(prefix="ecomdw_compact_")
    try:
        frag_dir, out_dir = f"{tmp}/frag", f"{tmp}/compact"
        docs.repartition(_FRAGMENT_PARTS).write.mode("overwrite").parquet(frag_dir)

        def parquet_files(d: str) -> list[str]:
            return [f for f in os.listdir(d) if f.endswith(".parquet")]

        frag_files = parquet_files(frag_dir)
        total_bytes = sum(os.path.getsize(f"{frag_dir}/{f}") for f in frag_files)
        n_target = max(1, math.ceil(total_bytes / COMPACT_TARGET_BYTES))
        fragmented = spark.read.parquet(frag_dir)
        fragmented.coalesce(n_target).write.mode("overwrite").parquet(out_dir)
        out_files = parquet_files(out_dir)
        compacted = spark.read.parquet(out_dir)
        stats = compacted.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("n_chars").alias("sum_n_chars"),
        ).collect()[0]
        return spark.createDataFrame(
            [
                (
                    stats.n_rows,
                    stats.sum_doc_id,
                    stats.sum_n_chars,
                    len(out_files) < len(frag_files),
                    len(out_files) <= n_target + 1,
                )
            ],
            schema=(
                "n_rows bigint, sum_doc_id bigint, sum_n_chars bigint, "
                "files_reduced boolean, meets_target_count boolean"
            ),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Z-order clustered layout (multi-dimensional data skipping)
# --------------------------------------------------------------------------

#: bits per dimension for the Morton interleave: 1024 bins per dim, 20-bit
#: z-values. Enough resolution that file-level min/max stats separate a
#: 2-D box predicate from the bulk of the table; coarse enough that the
#: bin arithmetic stays exact in 64-bit integers at any realistic domain.
_Z_BITS = 10
_Z_BINS = 1 << _Z_BITS
_Z_FILES = 8
#: the demo skipping predicate: lowest quartile of both binned dims —
#: exactly the z-range [0, 2^(2*(_Z_BITS-2))) by the interleave structure.
_Z_BOX = _Z_BINS // 4


def zorder_value(xb, yb):
    """Morton/Z-order interleave of two ``_Z_BITS``-bit bin columns.

    Pure Column bit arithmetic (shift/and/or) — JVM-side, codegen'd, no
    UDF. Bit i of x lands at position 2i, bit i of y at 2i+1, so sorting
    by the result places rows close in BOTH dims into the same parquet
    files and their footer min/max stats become selective for
    multi-dimensional predicates — the layout trick behind
    OPTIMIZE ZORDER BY in lakehouse engines, here as a plain write plan:
    compute z, ``repartitionByRange(z)``, ``sortWithinPartitions(z)``."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _zvalue_sql(xb: str, yb: str) -> str:
    """The identical interleave as DuckDB SQL (oracle side)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_SQL_ZORDER = f"""
    WITH b AS (
      SELECT CAST(o_custkey AS BIGINT) AS x,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS y
      FROM orders
    ),
    mm AS (
      SELECT MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy
      FROM b
    ),
    binned AS (
      SELECT ((x - minx) * {_Z_BINS}) // (maxx - minx + 1) AS xb,
             ((y - miny) * {_Z_BINS}) // (maxy - miny + 1) AS yb
      FROM b, mm
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM({_zvalue_sql('xb', 'yb')}) AS BIGINT) AS sum_zval,
           CAST(SUM(CASE WHEN xb < {_Z_BOX} AND yb < {_Z_BOX} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_box_rows,
           TRUE AS files_ok,
           TRUE AS zorder_prunes,
           TRUE AS skip_scan_exact
    FROM binned
"""


@component(
    "wr_zorder_layout",
    oracle=_SQL_ZORDER,
    cols=[
        ("n_rows", "num"),
        ("sum_zval", "num"),
        ("n_box_rows", "num"),
        ("files_ok", "bool"),
        ("zorder_prunes", "bool"),
        ("skip_scan_exact", "bool"),
    ],
)
def wr_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write — the multi-dimensional data-skipping layout
    (Delta/Iceberg ``OPTIMIZE ZORDER BY``, re-expressed as a plain Spark
    write plan). Partition-pruning handles ONE dimension (the fact table
    partitions by order year, plans/etl.run_pipeline); a 100 TB scan
    filtered on TWO dimensions (customer AND date) still reads every file
    under the matching partitions unless the layout itself clusters both.
    Morton-interleaving the range-binned dims and range-partitioning +
    sorting by the z-value makes each parquet file cover a small box in
    (customer, date) space, so footer min/max stats exclude most files for
    any 2-D box predicate.

    Digest: n_rows / sum_zval / n_box_rows are layout-independent and
    SQL-derivable (the oracle reproduces the identical bin + interleave
    bit math); the flags come from the real written layouts — file count
    within target, the z-ordered layout needs at most as many files as a
    hash layout for the box predicate and strictly fewer than all of them,
    and a min/max-pruned scan over only the intersecting files returns
    exactly the full box row count (skipping loses nothing). Bin edges via
    floor-of-double division: exact for spans below ~2^40 since the true
    quotient sits at least 1/span from an integer while double error is
    ~1e-13 of it.
    """
    prepare(spark, sf_dir)
    import os

    base = spark.table("orders").select(
        F.col("o_custkey").cast("long").alias("x"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("y"),
    )
    mm = base.agg(
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
    ).collect()[0]
    spanx = mm.maxx - mm.minx + 1
    spany = mm.maxy - mm.miny + 1
    binned = base.select(
        F.floor((F.col("x") - F.lit(mm.minx)) * _Z_BINS / F.lit(spanx)).alias("xb"),
        F.floor((F.col("y") - F.lit(mm.miny)) * _Z_BINS / F.lit(spany)).alias("yb"),
    )
    zdf = binned.withColumn("zval", zorder_value(F.col("xb"), F.col("yb")))
    in_box = (F.col("xb") < _Z_BOX) & (F.col("yb") < _Z_BOX)
    totals = zdf.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("zval").alias("sum_zval"),
        F.sum(in_box.cast("long")).alias("n_box_rows"),
    ).collect()[0]

    tmp = tempfile.mkdtemp(prefix="ecomdw_zorder_")
    try:
        z_dir, naive_dir = f"{tmp}/zorder", f"{tmp}/naive"
        (
            zdf.repartitionByRange(_Z_FILES, "zval")
            .sortWithinPartitions("zval")
            .write.mode("overwrite")
            .parquet(z_dir)
        )
        zdf.repartition(_Z_FILES, "xb", "yb").write.mode("overwrite").parquet(naive_dir)

        def file_boxes(d: str) -> list[tuple[str, int, int]]:
            """(path, min_xb, min_yb) per file — the footer-stat proxy.

            Driver loop bounded by the file count (= _Z_FILES), reading
            only 1-row min aggregates; box intersection with
            [0, _Z_BOX) x [0, _Z_BOX) needs only the minima."""
            out = []
            for f in sorted(os.listdir(d)):
                if not f.endswith(".parquet"):
                    continue
                p = f"{d}/{f}"
                r = spark.read.parquet(p).agg(
                    F.min("xb").alias("mnx"), F.min("yb").alias("mny")
                ).collect()[0]
                out.append((p, r.mnx, r.mny))
            return out

        def hits(boxes: list[tuple[str, int, int]]) -> list[str]:
            return [p for p, mnx, mny in boxes if mnx < _Z_BOX and mny < _Z_BOX]

        z_boxes, naive_boxes = file_boxes(z_dir), file_boxes(naive_dir)
        z_hits, naive_hits = hits(z_boxes), hits(naive_boxes)
        pruned_count = (
            spark.read.parquet(*z_hits).filter(in_box).count() if z_hits else 0
        )
        return spark.createDataFrame(
            [
                (
                    totals.n_rows,
                    totals.sum_zval,
                    totals.n_box_rows,
                    1 <= len(z_boxes) <= _Z_FILES,
                    len(z_hits) <= len(naive_hits) and len(z_hits) < len(z_boxes),
                    pruned_count == totals.n_box_rows,
                )
            ],
            schema=(
                "n_rows bigint, sum_zval bigint, n_box_rows bigint, "
                "files_ok boolean, zorder_prunes boolean, skip_scan_exact boolean"
            ),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Schema evolution (mergeSchema read over mixed-generation files)
# --------------------------------------------------------------------------


@component(
    "wr_schema_evolution",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_legacy_rows,
           SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS total_price,
           CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END)
                AS BIGINT) AS n_status_classes,
           TRUE AS schema_merged
    FROM orders
    """,
    cols=[
        ("n_rows", "num"),
        ("n_legacy_rows", "num"),
        ("total_price", "num"),
        ("n_status_classes", "num"),
        ("schema_merged", "bool"),
    ],
)
def wr_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a landing table — the long-lived-pipeline
    reality the reference's fixed CREATE TABLEs can't absorb: a producer
    adds a column mid-stream and the table directory now mixes
    generations. Writes a legacy generation (orderkey, totalprice) and an
    evolved one (+ orderstatus) into ONE parquet directory, reads back
    with ``mergeSchema`` (footer-union at planning time — a metadata
    operation over file schemas, not a data pass, so it costs file-count
    not bytes at 100 TB), and digests the merged view: legacy rows
    surface the new column as NULL, evolved rows keep their values, and
    nothing is dropped or double-counted. The oracle rebuilds the same
    numbers from the source table and the generation split (even keys =
    legacy)."""
    prepare(spark, sf_dir)
    orders = spark.table("orders")
    legacy = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    evolved = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    tmp = tempfile.mkdtemp(prefix="ecomdw_schevo_")
    try:
        target = f"{tmp}/landing"
        legacy.write.mode("overwrite").parquet(target)
        evolved.write.mode("append").parquet(target)
        merged = spark.read.option("mergeSchema", "true").parquet(target)
        row = merged.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_orderstatus").isNull().cast("long")).alias("n_legacy_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(28,8)")).alias("total_price"),
            F.count_distinct("o_orderstatus").alias("n_status_classes"),
        ).collect()[0]
        return spark.createDataFrame(
            [
                (
                    row.n_rows,
                    row.n_legacy_rows,
                    row.total_price,
                    row.n_status_classes,
                    "o_orderstatus" in merged.columns,
                )
            ],
            schema=(
                "n_rows bigint, n_legacy_rows bigint, total_price decimal(38,8), "
                "n_status_classes bigint, schema_merged boolean"
            ),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Write-audit-publish round-trip (quality-gated atomic publication)
# --------------------------------------------------------------------------


@component(
    "wr_wap_publish",
    cols=[("phase", "str"), ("n_rows", "num"), ("published", "bool")],
    oracle="""
    WITH good AS (SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F')
    SELECT 'v1_good' AS phase, CAST(n AS BIGINT) AS n_rows, TRUE AS published FROM good
    UNION ALL
    SELECT 'v2_corrupt', CAST(n + 2 AS BIGINT), FALSE FROM good
    UNION ALL
    SELECT 'reader_after_v2', CAST(n AS BIGINT), TRUE FROM good
    """,
)
def wr_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish round-trip (writers.wap_publish/wap_read): v1
    (the 'F'-status orders) passes the audit — non-empty, no NULL keys —
    and publishes; v2 (v1 plus two corrupt NULL-key rows) fails the audit
    and is NEVER published; a reader resolving the manifest AFTER the
    failed v2 attempt still sees exactly v1's rows. That last row is the
    point of the pattern: a bad load attempt leaves zero reader-visible
    damage — the guarantee the reference's replace-then-append load
    (reference: dags/extract_data.py:55-71) lacks (a failed replace leaves
    the table empty).

    The audit runs on the STAGED files read back, not the in-memory frame
    — it validates what readers would actually see, catching write-path
    corruption too. Counts are SQL-derivable; the manifest flip is
    os.replace-atomic (object-storage analog: conditional PUT)."""
    from e_commerce_data_warehouse_recommendation_system_spark.sources.writers import (
        wap_publish,
        wap_read,
    )

    from e_commerce_data_warehouse_recommendation_system_spark.sources.writers import (
        null_key_audit,
    )

    prepare(spark, sf_dir)
    audit = null_key_audit("o_orderkey")
    good = spark.table("orders").filter(F.col("o_orderstatus") == "F")
    corrupt = good.limit(2).select(
        F.lit(None).cast("bigint").alias("o_orderkey"),
        *[F.col(c) for c in good.columns if c != "o_orderkey"],
    ).select(*good.columns)
    tmp = tempfile.mkdtemp(prefix="ecomdw_wap_")
    try:
        v1_ok = wap_publish(spark, tmp, good, "1", audit)
        v1_rows = wap_read(spark, tmp).count()
        v2 = good.unionByName(corrupt)
        v2_ok = wap_publish(spark, tmp, v2, "2", audit)
        reader_rows = wap_read(spark, tmp).count()
        n_good = good.count()
        return spark.createDataFrame(
            [
                ("v1_good", v1_rows if v1_ok else -1, v1_ok),
                ("v2_corrupt", n_good + 2, v2_ok),
                ("reader_after_v2", reader_rows, True),
            ],
            schema="phase string, n_rows bigint, published boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Right-to-be-forgotten: cascading multi-table erasure
# --------------------------------------------------------------------------

#: deterministic erasure cohort: every 97th customer key. Prime modulus so
#: the cohort cuts across all order/lineitem distributions.
_ERASE_MOD = 97


@component(
    "wr_gdpr_erasure",
    cols=[
        ("table_name", "str"),
        ("rows_before", "num"),
        ("rows_after", "num"),
        ("no_refs_left", "bool"),
    ],
    oracle=f"""
    WITH erased AS (SELECT c_custkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0),
    erased_orders AS (
      SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM erased)
    )
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM customer) AS rows_before,
           (SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT c_custkey FROM erased)) AS rows_after,
           TRUE AS no_refs_left
    UNION ALL
    SELECT 'orders', (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM erased)), TRUE
    UNION ALL
    SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM erased_orders)), TRUE
    UNION ALL
    SELECT 'events', (SELECT COUNT(*) FROM events),
           (SELECT COUNT(*) FROM events
            WHERE user_id NOT IN (SELECT c_custkey FROM erased)), TRUE
    """,
)
def wr_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten: erase a customer cohort EVERYWHERE it
    appears, respecting referential order — customer rows, their orders,
    the lineitems of those orders (two FK hops from the erased key), and
    their event stream. The flag column re-checks each table AFTER erasure
    for surviving references (anti-join back to the erased key set /
    erased orders), so the digest proves the cascade left no orphaned or
    residual personal data — the auditable part of a GDPR/CCPA deletion
    job, and a multi-table workout of the S7 delete operator
    (writers.delete_by_keys, reference: plugins/mysql_operator.py:61-80,
    which deletes from one table with no cascade notion).

    Scale: the erased-key set is a tiny fraction of the key domain ->
    broadcast anti-joins for customer/orders/events; the erased-ORDERS set
    scales with the cohort's order count, so the lineitem hop uses a plain
    key-shuffle anti-join (AQE-skew-safe) rather than assuming it
    broadcasts. Each table is one anti-join pass; nothing collects beyond
    the audit scalars."""
    from e_commerce_data_warehouse_recommendation_system_spark.sources.writers import (
        delete_by_keys,
    )

    prepare(spark, sf_dir)
    cust = spark.table("customer")
    orders = spark.table("orders")
    li = spark.table("lineitem")
    events = spark.table("events")
    erased = cust.filter(F.col("c_custkey") % _ERASE_MOD == 0).select("c_custkey")
    erased_orders = orders.join(
        F.broadcast(erased), orders.o_custkey == erased.c_custkey
    ).select("o_orderkey")

    cust_after = delete_by_keys(cust, erased, ["c_custkey"])
    orders_after = delete_by_keys(
        orders, erased.select(F.col("c_custkey").alias("o_custkey")), ["o_custkey"]
    )
    li_after = delete_by_keys(
        li, erased_orders.select(F.col("o_orderkey").alias("l_orderkey")), ["l_orderkey"]
    )
    events_after = delete_by_keys(
        events, erased.select(F.col("c_custkey").alias("user_id")), ["user_id"]
    )

    def residual(df: DataFrame, col: str, keys: DataFrame, key_col: str) -> F.Column:
        n = df.join(
            F.broadcast(keys.select(F.col(key_col).alias(col))), col, "left_semi"
        ).count()
        return n == 0

    rows = [
        ("customer", cust.count(), cust_after.count(),
         residual(cust_after, "c_custkey", erased, "c_custkey")),
        ("orders", orders.count(), orders_after.count(),
         residual(orders_after, "o_custkey", erased, "c_custkey")),
        ("lineitem", li.count(), li_after.count(),
         li_after.join(erased_orders.select(F.col("o_orderkey").alias("l_orderkey")),
                       "l_orderkey", "left_semi").count() == 0),
        ("events", events.count(), events_after.count(),
         residual(events_after, "user_id", erased, "c_custkey")),
    ]
    return spark.createDataFrame(
        rows,
        schema="table_name string, rows_before bigint, rows_after bigint, no_refs_left boolean",
    )


@component(
    "wr_xml_roundtrip",
    cols=[("o_orderstatus", "str"), ("n_orders", "num"), ("total_price", "num")],
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def wr_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source round-trip via Spark 4's NATIVE xml data source
    (spark-xml was an external package through Spark 3; no jar needed now)
    — the B2B/legacy interchange format next to CSV/JSON/parquet/ORC/
    gated-Avro. Row-tagged export, schema-inferred read-back; the digest
    proves write+read lose nothing through the format boundary. XML stays
    an EDGE format here (feeds land, exports leave) — the engine's
    columnar posture is parquet/ORC; nothing scans XML twice."""
    prepare(spark, sf_dir)
    o = spark.table("orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="ecomdw_wr_")
    try:
        path = f"{tmp}/orders_xml"
        (
            o.write.mode("overwrite")
            .format("xml")
            .option("rootTag", "orders")
            .option("rowTag", "order")
            .save(path)
        )
        back = spark.read.format("xml").option("rowTag", "order").load(path)
        result = (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(28,8)")).alias(
                    "total_price"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


# --------------------------------------------------------------------------
# Snapshot retention (VACUUM / expire_snapshots)
# --------------------------------------------------------------------------


@component(
    "wr_wap_vacuum",
    cols=[
        ("phase", "str"),
        ("n_value", "num"),
        ("ok", "bool"),
    ],
    oracle="""
    WITH f AS (SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F')
    SELECT 'versions_before' AS phase, CAST(3 AS BIGINT) AS n_value, TRUE AS ok
    UNION ALL
    SELECT 'deleted', CAST(1 AS BIGINT), TRUE
    UNION ALL
    SELECT 'versions_after', CAST(2 AS BIGINT), TRUE
    UNION ALL
    SELECT 'current_survives', CAST(0 AS BIGINT), TRUE
    UNION ALL
    SELECT 'reader_after_vacuum', CAST(n AS BIGINT), TRUE FROM f
    """,
)
def wr_wap_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot retention (writers.wap_vacuum) — the storage-reclaim half
    of the WAP lifecycle, completing the table-maintenance set next to
    compaction, z-order, and time travel (Delta VACUUM / Iceberg
    expire_snapshots). Scenario, fully deterministic: publish v1 and v2
    (both pass), attempt v3 with corrupt NULL-key rows (audit rejects it,
    so the manifest still points at v2 while v3's staged files linger for
    forensics — three version dirs on disk). Vacuum keep=2 must then
    delete exactly v1 (the oldest), retain v2+v3, NEVER touch the version
    the manifest points to, and leave the reader's view byte-identical:
    the post-vacuum read returns exactly the published 'F'-order rows,
    which is the SQL-derivable anchor. current_survives re-reads the
    manifest version AFTER the sweep.

    Scale: the sweep is version METADATA (one directory listing) plus
    recursive dir deletes (object-store prefix deletes); data rows never
    move — retention cost is independent of table size."""
    from e_commerce_data_warehouse_recommendation_system_spark.sources.writers import (
        null_key_audit,
        wap_publish,
        wap_read,
        wap_vacuum,
        wap_versions,
    )

    prepare(spark, sf_dir)
    audit = null_key_audit("o_orderkey")
    good = spark.table("orders").filter(F.col("o_orderstatus") == "F")
    corrupt = good.unionByName(
        good.limit(2)
        .select(
            F.lit(None).cast("bigint").alias("o_orderkey"),
            *[F.col(c) for c in good.columns if c != "o_orderkey"],
        )
        .select(*good.columns)
    )
    tmp = tempfile.mkdtemp(prefix="ecomdw_wapvac_")
    try:
        assert wap_publish(spark, tmp, good, "1", audit)
        assert wap_publish(spark, tmp, good, "2", audit)
        assert not wap_publish(spark, tmp, corrupt, "3", audit)  # stays staged
        before = wap_versions(tmp)
        deleted = wap_vacuum(tmp, keep=2)
        after = wap_versions(tmp)
        reader_rows = wap_read(spark, tmp).count()
        with open(f"{tmp}/MANIFEST") as fh:
            current = fh.read().strip()
        rows = [
            ("versions_before", len(before), before == ["1", "2", "3"]),
            ("deleted", len(deleted), deleted == ["1"]),
            ("versions_after", len(after), after == ["2", "3"]),
            ("current_survives", 0, current == "v_2"),
            ("reader_after_vacuum", reader_rows, True),
        ]
        return spark.createDataFrame(
            rows, schema="phase string, n_value bigint, ok boolean"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@component(
    "s19_corrupt_json_quarantine",
    cols=[("bucket", "str"), ("n_rows", "num"), ("sum_event_id", "num")],
    oracle="""
    WITH cls AS (
      SELECT CASE WHEN event_id % 13 = 3 THEN 'corrupt' ELSE 'parsed' END AS bucket,
             CASE WHEN event_id % 13 = 3 THEN NULL ELSE event_id END AS eid
      FROM events
    )
    SELECT bucket, COUNT(*) AS n_rows, CAST(SUM(eid) AS BIGINT) AS sum_event_id
    FROM cls GROUP BY bucket
    """,
)
def s19_corrupt_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record quarantine on a JSON source — the production
    ingestion posture the clean round-trips never exercise: a feed where
    some lines are broken must load WITHOUT dropping data silently
    (DROPMALFORMED) or failing the batch (FAILFAST). PERMISSIVE mode with
    an explicit ``_corrupt_record`` column keeps every line — parsed
    fields for good rows, the raw line for bad ones — so the bad rows can
    be counted, quarantined, and replayed after a parser fix.

    The feed is synthesized deterministically from ``events``: every row
    serializes to one JSONL line, and lines for ``event_id % 13 == 3``
    are truncated (losing the closing brace — structurally invalid JSON).
    The oracle therefore knows exactly which rows must land in which
    bucket without reading the file: quarantine classification is pure
    arithmetic on the source table. Corrupt rows parse with NULL fields,
    so their ``sum_event_id`` is NULL — asserting the parser never
    half-recovers a field from a broken line.

    Scale: text write + JSON read are both narrow per-partition passes;
    the only shuffle is the final two-row aggregation. The declared
    schema (never inferSchema — SURVEY §1.4) keeps the read single-pass."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    prepare(spark, sf_dir)
    ev = spark.table("events").select("event_id", "event_type")
    js = F.to_json(F.struct("event_id", "event_type"))
    lines = ev.select(
        F.when(
            F.col("event_id") % 13 == 3,
            F.substring(js, 1, F.length(js) - F.lit(5)),
        )
        .otherwise(js)
        .alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="ecomdw_wr_")
    try:
        path = f"{tmp}/events_dirty_jsonl"
        lines.write.mode("overwrite").text(path)
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("_corrupt_record", T.StringType()),
            ]
        )
        back = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
        result = (
            back.select(
                F.when(F.col("_corrupt_record").isNotNull(), F.lit("corrupt"))
                .otherwise(F.lit("parsed"))
                .alias("bucket"),
                "event_id",
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("event_id").cast("long").alias("sum_event_id"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@component(
    "s21_fixed_width_roundtrip",
    cols=[("p_brand", "str"), ("n_parts", "num"), ("sum_price_cents", "num")],
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_price_cents
    FROM part GROUP BY p_brand
    """,
)
def s21_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width flat-file interchange — the mainframe/ERP legacy feed
    format the CSV/JSON/XML/ORC round-trips don't cover: no delimiters,
    no quoting, columns live at byte offsets. The layout here is
    [partkey: 10, zero-padded][brand: 12, space-padded][price-cents: 12,
    zero-padded]; writing is one format_string projection, parsing is
    three substring/cast projections over a text scan — both pure
    column expressions, both trivially vectorizable, and the digest
    proves the byte-offset round trip loses nothing (prices cross as
    exact integer cents, never floats).

    Scale: text write and read are narrow per-partition passes with no
    shuffle until the final brand rollup; a real feed would add a
    malformed-line guard exactly like s19's quarantine."""
    import shutil
    import tempfile

    prepare(spark, sf_dir)
    p = spark.table("part").select(
        F.format_string(
            "%010d%-12s%012d",
            F.col("p_partkey"),
            F.col("p_brand"),
            (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long"),
        ).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="ecomdw_wr_")
    try:
        path = f"{tmp}/part_fixed_width"
        p.write.mode("overwrite").text(path)
        back = spark.read.text(path).select(
            F.substring("value", 1, 10).cast("long").alias("p_partkey"),
            F.trim(F.substring("value", 11, 12)).alias("p_brand"),
            F.substring("value", 23, 12).cast("long").alias("price_cents"),
        )
        result = (
            back.groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).alias("n_parts"),
                F.sum("price_cents").cast("long").alias("sum_price_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@component(
    "wr_pseudonymize_vault",
    cols=[
        ("c_nationkey", "num"),
        ("n_customers", "num"),
        ("n_tokens", "num"),
        ("total_balance", "dbl"),
        ("reid_ok", "bool"),
    ],
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_name) AS n_tokens,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS total_balance,
           TRUE AS reid_ok
    FROM customer GROUP BY c_nationkey
    """,
)
def wr_pseudonymize_vault(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization with a re-identification vault — the governance
    pattern between plaintext analytics and irreversible erasure
    (wr_gdpr_erasure): direct identifiers are replaced by deterministic
    keyed tokens (sha2 over a salted name) in the ANALYTIC table, and the
    token→identity mapping lives in a separate restricted VAULT table;
    analysts join facts on tokens, only vault-privileged re-identification
    recovers names. Deterministic tokenization keeps the token a stable
    join key across loads — the property naive random tokenization loses.

    The digest proves three things per nation: the analytic table lost no
    rows or balances through the tokenize→write→read round trip, the
    token space is exactly 1:1 with the identity space (n_tokens ==
    distinct names — a collision or salt drift breaks this), and
    ``reid_ok`` — the vault join recovers the ORIGINAL name set exactly
    (two EXCEPT ALL checks, both empty).

    Scale: tokenization is a map-side projection (sha2 is a JVM
    codegen'd expression); the vault is identity-cardinality, written
    once; the re-id join is a broadcast for dimension-sized identity
    spaces and a plain keyed join beyond."""
    import shutil
    import tempfile

    prepare(spark, sf_dir)
    cust = spark.table("customer")
    token = F.sha2(F.concat(F.lit("vault-salt-v1:"), F.col("c_name")), 256)
    tmp = tempfile.mkdtemp(prefix="ecomdw_wr_")
    try:
        analytic_path, vault_path = f"{tmp}/analytic", f"{tmp}/vault"
        cust.select(
            token.alias("token"), "c_nationkey", "c_acctbal"
        ).write.parquet(analytic_path)
        cust.select(token.alias("token"), "c_name").distinct().write.parquet(
            vault_path
        )
        analytic = spark.read.parquet(analytic_path)
        vault = spark.read.parquet(vault_path)
        reid = analytic.join(F.broadcast(vault), "token")
        # re-identification must recover the original name multiset exactly
        diff1 = reid.select("c_name").exceptAll(cust.select("c_name")).count()
        diff2 = cust.select("c_name").exceptAll(reid.select("c_name")).count()
        reid_ok = diff1 == 0 and diff2 == 0
        result = (
            reid.groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.countDistinct("token").alias("n_tokens"),
                F.sum(F.col("c_acctbal").cast("decimal(28,8)"))
                .cast("double")
                .alias("total_balance"),
            )
            .withColumn("reid_ok", F.lit(reid_ok))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


# --------------------------------------------------------------------------
# binaryFile source: raw media/blob ingest (the first hop of any media lake)
# --------------------------------------------------------------------------

#: 1-in-N documents exported as standalone blob files (bounds the fixture)
BINARYFILE_MODULUS = 25


@component(
    "s23_binaryfile_ingest",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id % {BINARYFILE_MODULUS} = 0
    """,
    cols=[("doc_id", "num"), ("n_bytes", "num"), ("content_md5", "str")],
)
def s23_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source ingest — the landing hop of a media lake:
    opaque blobs on disk (images, audio, documents) read as
    (path, length, content) rows without any parsing, the upstream of the
    multimodal probe/decode family (mm_*). The fixture exports a
    deterministic 1-in-{BINARYFILE_MODULUS} document subset as standalone
    ``doc_<id>.bin`` files (driver-side write of a modulus-bounded list —
    the write is fixture setup; the READ is the operator), then the
    binaryFile scan recovers id from the path, byte length, and content
    md5 — value-checked against the same bytes still sitting in the
    parquet column (DuckDB hashes the UTF-8 string bytes; the files carry
    exactly those bytes).

    Scale: binaryFile is a standard FileScan — partitions by file,
    predicate pushdown on path/length metadata, content streamed per
    file. At 100 TB the pattern holds (one task per blob batch);
    pathGlobFilter/recursiveFileLookup prune directories before any byte
    is read. Small-file pressure is the known cost — the compaction op
    (wr_compact_small_files) is the standing answer."""
    prepare(spark, sf_dir)
    subset = (
        spark.table("documents")
        .filter(F.col("doc_id") % BINARYFILE_MODULUS == 0)
        .select("doc_id", "text")
    )
    rows = subset.collect()  # modulus-bounded fixture list, never the corpus
    tmp = tempfile.mkdtemp(prefix="ecomdw_binf_")
    try:
        for r in rows:
            with open(f"{tmp}/doc_{r['doc_id']:010d}.bin", "wb") as fh:
                fh.write(r["text"].encode("utf-8"))
        back = spark.read.format("binaryFile").load(tmp)
        result = (
            back.select(
                F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
                .cast("long")
                .alias("doc_id"),
                F.col("length").cast("long").alias("n_bytes"),
                F.md5(F.col("content")).alias("content_md5"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result
