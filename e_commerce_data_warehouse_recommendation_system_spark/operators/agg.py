"""Aggregation operators (SURVEY.md SS2.4 A-series + A-ext rungs).

Pure move from operators/relational.py in round 11 (the graph.py recipe:
registry names unchanged, relational.py star-re-exports every public
symbol at the original registration point, so import paths and the
driver's 50-slot registration order are untouched). Holds the A1-A10 core
(counts, summary stats, null profile, collect, distinct/approx-distinct,
cube, percentiles, sketches) plus the aggregation extensions: HLL
mergeable rollup, count-min sketch, OLS trend from integer moments, CLV
per segment, new-vs-returning revenue, bitmap-index distinct, bitwise
flag rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_data_warehouse_recommendation_system_spark.functions.scalar import dec_avg, dec_sum
from e_commerce_data_warehouse_recommendation_system_spark.operators._base import _davg, _dsum
from e_commerce_data_warehouse_recommendation_system_spark.registry import component
from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import prepare


# ==========================================================================
# SS2.4 Aggregations
# ==========================================================================


@component(
    "a1_count_star",
    oracle="SELECT COUNT(*) AS total_rows FROM lineitem",
    cols=[("total_rows", "num")],
)
def a1_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: scalar COUNT(*) (reference: postgres_reader.py:96)."""
    prepare(spark, sf_dir)
    return spark.table("lineitem").agg(F.count(F.lit(1)).alias("total_rows"))


@component(
    "a3_summary_stats",
    cols=[
        ("column_name", "str"),
        ("n", "num"),
        ("mean", "dbl"),
        ("min_value", "dbl"),
        ("max_value", "dbl"),
        ("std", "dbl"),
    ],
    oracle=f"""
    SELECT 'l_quantity' AS column_name,
           COUNT(l_quantity) AS n,
           {_davg('l_quantity')} AS mean,
           MIN(l_quantity) AS min_value,
           MAX(l_quantity) AS max_value,
           sqrt(({_dsum('l_quantity * l_quantity')} - {_dsum('l_quantity')} * {_dsum('l_quantity')} / COUNT(l_quantity)) / (COUNT(l_quantity) - 1)) AS std
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           COUNT(l_extendedprice),
           {_davg('l_extendedprice')},
           MIN(l_extendedprice),
           MAX(l_extendedprice),
           sqrt(({_dsum('l_extendedprice * l_extendedprice')} - {_dsum('l_extendedprice')} * {_dsum('l_extendedprice')} / COUNT(l_extendedprice)) / (COUNT(l_extendedprice) - 1))
    FROM lineitem
    """,
)
def a3_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: ``df.describe()`` summary statistics
    (reference: postgres_reader.py:117-120). Mean/std computed from exact
    decimal moments so they are shuffle-order-independent — the engine's
    distributed-deterministic replacement for pandas describe()."""
    prepare(spark, sf_dir)
    li = spark.table("lineitem")

    def stats(col: str) -> DataFrame:
        c = F.col(col)
        n = F.count(c)
        s1 = dec_sum(c)
        s2 = dec_sum(c * c)
        return li.agg(
            F.lit(col).alias("column_name"),
            n.alias("n"),
            dec_avg(c).alias("mean"),
            F.min(c).alias("min_value"),
            F.max(c).alias("max_value"),
            F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("std"),
        )

    return stats("l_quantity").unionByName(stats("l_extendedprice"))


@component(
    "a4_null_profile",
    cols=[
        ("user_id_nulls", "num"),
        ("value_nulls", "num"),
        ("props_nulls", "num"),
        ("total_rows", "num"),
    ],
    oracle="""
    SELECT CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
           CAST(SUM(CASE WHEN value   IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
           CAST(SUM(CASE WHEN props   IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_nulls,
           COUNT(*) AS total_rows
    FROM events
    """,
)
def a4_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-column null counts (reference: postgres_reader.py:123-127)."""
    prepare(spark, sf_dir)
    ev = spark.table("events")

    def nulls(c: str) -> F.Column:
        return F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")

    return ev.agg(nulls("user_id"), nulls("value"), nulls("props"), F.count(F.lit(1)).alias("total_rows"))


@component(
    "a5_group_collect",
    cols=[
        ("user_id", "num"),
        ("n_items", "num"),
        ("min_item", "num"),
        ("max_item", "num"),
    ],
    oracle="""
    SELECT o_custkey AS user_id,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_items,
           MIN(l_partkey) AS min_item,
           MAX(l_partkey) AS max_item
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey
    """,
)
def a5_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: group-by collect-to-set — the recommender's per-user ground-truth
    sets (reference: mf_knn_recommender.py:390-392). Built with
    ``collect_set`` then reduced to order-insensitive scalars (size/min/max)
    because array column ordering is not canonical across engines."""
    prepare(spark, sf_dir)
    o, li = spark.table("orders"), spark.table("lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.collect_set("l_partkey").alias("items"))
        .select(
            "user_id",
            F.size("items").cast("long").alias("n_items"),
            F.array_min("items").alias("min_item"),
            F.array_max("items").alias("max_item"),
        )
    )


@component(
    "a6_distinct_count",
    cols=[("n_customers", "num"), ("n_priorities", "num")],
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders
    """,
)
def a6_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: exact distinct counts (reference: mf_knn_recommender.py:83-88).
    At 100 TB the engine offers ``approx_count_distinct`` (HLL, no shuffle
    of distinct values) — exact form kept here for oracle parity."""
    prepare(spark, sf_dir)
    return spark.table("orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


def a6b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 at scale: HyperLogLog++ distinct counts — the sketch path for
    columns whose exact distinct would itself be a massive shuffle at
    100 TB. rsd=0.02; the raw sketch values are engine-specific, so the
    driver-visible form is ``a6b_approx_distinct_bound`` (estimate-vs-exact
    flags, oracle-checked); the raw estimates are bound-tested in
    tests/test_quality.py."""
    prepare(spark, sf_dir)
    li = spark.table("lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


@component(
    "a6b_approx_distinct_bound",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS orders_within_bound,
           TRUE AS parts_within_bound
    FROM lineitem
    """,
    cols=[
        ("exact_orders", "num"),
        ("exact_parts", "num"),
        ("orders_within_bound", "bool"),
        ("parts_within_bound", "bool"),
    ],
)
def a6b_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL sketch's oracle-checkable contract: |estimate - exact| <=
    3*rsd*exact (rsd=0.02 -> 6%). Exact counts anchor the row; the bound
    flags are computed from the genuine sketch values, so a broken sketch
    flips the digest red even though the estimate itself isn't portable."""
    prepare(spark, sf_dir)
    li = spark.table("lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    bound = 3 * 0.02
    return agg.select(
        "exact_orders",
        "exact_parts",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= bound * F.col("exact_orders")
        ).alias("orders_within_bound"),
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= bound * F.col("exact_parts")
        ).alias("parts_within_bound"),
    )


@component(
    "a8_cube",
    cols=[
        ("l_returnflag", "str"),
        ("l_linestatus", "str"),
        ("sum_qty", "dbl"),
        ("n", "num"),
    ],
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def a8_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE subtotals — free in Spark, listed as the engine's dashboard-
    rollup surface (SURVEY.md SS2.4 note; reference README.md:117-121)."""
    prepare(spark, sf_dir)
    return (
        spark.table("lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dec_sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


_PCTS = (0.25, 0.5, 0.75, 0.9)


@component(
    "a11_percentiles",
    oracle="\n    UNION ALL\n".join(
        f"SELECT CAST({p} AS DOUBLE) AS pct, "
        f"quantile_cont(o_totalprice, {p}) AS val FROM orders"
        for p in _PCTS
    ),
    cols=[("pct", "dbl"), ("val", "dbl")],
)
def a11_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (A-family extension): Spark's
    ``percentile`` (exact, sort-based — NOT approx_percentile's GK sketch)
    against DuckDB's ``quantile_cont``; both use the same linear
    interpolation, verified to match bit-for-bit. At 100 TB swap in
    ``approx_percentile`` (mergeable sketch, no global sort) — the exact
    form here is the oracle-checkable contract."""
    prepare(spark, sf_dir)
    o = spark.table("orders")
    parts = [
        o.agg(
            F.lit(float(p)).alias("pct"),
            F.expr(f"percentile(o_totalprice, {p})").alias("val"),
        )
        for p in _PCTS
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


@component(
    "a12_corr_moments",
    oracle=f"""
    WITH m AS (
      SELECT COUNT(*) AS n,
             {_dsum('l_quantity')} AS sx,
             {_dsum('l_extendedprice')} AS sy,
             {_dsum('l_quantity * l_extendedprice')} AS sxy,
             {_dsum('l_quantity * l_quantity')} AS sxx,
             {_dsum('l_extendedprice * l_extendedprice')} AS syy
      FROM lineitem
    )
    SELECT n,
           (sxy - sx * sy / n) / (n - 1) AS covar_samp,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr
    FROM m
    """,
    cols=[("n", "num"), ("covar_samp", "dbl"), ("corr", "dbl")],
)
def a12_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance + Pearson correlation from DECIMAL-exact co-moments
    (the a3 pattern): built-in ``corr``/``covar_samp`` stream their moments
    in shuffle order (float, nondeterministic across engines), so the engine
    computes the five exact sums once — one aggregation pass, map-side
    partial, order-independent — and derives both statistics in identical
    double arithmetic on both engines."""
    prepare(spark, sf_dir)
    li = spark.table("lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(x).alias("sx"),
        dec_sum(y).alias("sy"),
        dec_sum(x * y).alias("sxy"),
        dec_sum(x * x).alias("sxx"),
        dec_sum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return m.select("n", cov.alias("covar_samp"), corr.alias("corr"))


HIST_BIN_WIDTH = 50_000


@component(
    "a13_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
           CAST(FLOOR(o_totalprice / {HIST_BIN_WIDTH}) * {HIST_BIN_WIDTH} AS DOUBLE) AS bin_low,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1, 2
    """,
    cols=[("bin", "num"), ("bin_low", "dbl"), ("n_orders", "num")],
)
def a13_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bin = floor(x / width) — one map-side
    expression + one aggregation shuffle, the scalable form of a value
    distribution profile (vs sorting for exact quantiles)."""
    prepare(spark, sf_dir)
    o = spark.table("orders")
    b = F.floor(F.col("o_totalprice") / HIST_BIN_WIDTH)
    return o.groupBy(
        b.cast("bigint").alias("bin"),
        (b * HIST_BIN_WIDTH).cast("double").alias("bin_low"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


#: equi-depth bucket count (boundaries at i/B quantiles, i = 1..B-1)
EQUIDEPTH_BUCKETS = 8


@component(
    "a16_equidepth_histogram",
    oracle=f"""
    WITH b AS (
      SELECT {', '.join(
          f'quantile_cont(o_totalprice, {i / EQUIDEPTH_BUCKETS}) AS q{i}'
          for i in range(1, EQUIDEPTH_BUCKETS)
      )}
      FROM orders
    )
    SELECT CAST({' + '.join(
        f'(CASE WHEN o.o_totalprice > b.q{i} THEN 1 ELSE 0 END)'
        for i in range(1, EQUIDEPTH_BUCKETS)
    )} AS INT) AS bucket,
           COUNT(*) AS n_orders
    FROM orders o CROSS JOIN b
    GROUP BY 1
    """,
    cols=[("bucket", "num"), ("n_orders", "num")],
)
def a16_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram — the companion of a13's fixed-width bins and
    what ANALYZE-style optimizer statistics actually store for skewed
    columns (equal-population buckets adapt to the distribution where
    fixed-width bins collapse into one hot bin). Boundaries are the
    i/{EQUIDEPTH_BUCKETS} exact interpolated quantiles (the a11-proven
    percentile ≡ quantile_cont cross-engine contract); bucket membership
    is a map-side CASE chain against the broadcast 1-row boundary frame —
    boundary ties go to the LOWER bucket deterministically (strict >).

    Scale: the boundary aggregate is the only sort-bearing step and runs
    on the aggregated column, not the table; at 100 TB it swaps for
    approx_percentile (mergeable GK sketch) with the same downstream
    shape — broadcast bounds + one aggregation shuffle."""
    prepare(spark, sf_dir)
    o = spark.table("orders")
    bounds = o.agg(
        *[
            F.expr(f"percentile(o_totalprice, {i / EQUIDEPTH_BUCKETS})").alias(f"q{i}")
            for i in range(1, EQUIDEPTH_BUCKETS)
        ]
    )
    bucket = sum(
        (F.col("o_totalprice") > F.col(f"q{i}")).cast("int")
        for i in range(1, EQUIDEPTH_BUCKETS)
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Mergeable-sketch rollup (HLL union across grain levels)
# --------------------------------------------------------------------------

#: acceptance band for the merged estimate vs the exact distinct. The
#: default Datasketches lgConfigK=12 gives ~1.6% standard error; 5% is a
#: regression tripwire, not a precision claim.
_SKETCH_REL_ERR = 0.05


@component(
    "a15_sketch_rollup",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
    ),
    daily AS (SELECT day, COUNT(DISTINCT user_id) AS du FROM d GROUP BY day),
    monthly AS (
      SELECT strftime(day, '%Y-%m') AS month,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(MAX(du) AS BIGINT) AS max_daily_distinct
      FROM daily GROUP BY 1
    ),
    exact AS (
      SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m') AS month,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT m.month, e.exact_distinct, m.n_days, m.max_daily_distinct,
           TRUE AS merge_within_bound, TRUE AS merge_monotone
    FROM monthly m JOIN exact e ON m.month = e.month
    """,
    cols=[
        ("month", "str"),
        ("exact_distinct", "num"),
        ("n_days", "num"),
        ("max_daily_distinct", "num"),
        ("merge_within_bound", "bool"),
        ("merge_monotone", "bool"),
    ],
)
def a15_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the incremental-distinct pattern that makes
    "monthly unique users" computable WITHOUT re-touching the raw events:
    each day aggregates once into a Datasketches HLL sketch
    (``hll_sketch_agg``, KB-scale state, map-side partial like any agg);
    coarser grains come from ``hll_union_agg`` over the stored daily
    sketches — bytes-per-day input, so a 100 TB backfill month costs a
    union over ≤31 sketches instead of a distinct over a month of raw
    rows, and a late-arriving day only replaces its own sketch. The
    digest compares the merged estimate against the exact per-month
    distinct (re-derived from raw events here purely as verification):
    within the error band, and never materially below the largest single
    day (union monotonicity). Exact counts and day/month structure are
    SQL-derivable; the estimate itself is flag-checked because DuckDB has
    no Datasketches HLL."""
    prepare(spark, sf_dir)
    ev = spark.table("events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("du"),
    )
    monthly = daily.groupBy(F.date_format("day", "yyyy-MM").alias("month")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_days"),
        F.max("du").alias("max_daily_distinct"),
    )
    exact = ev.groupBy(F.date_format("day", "yyyy-MM").alias("month")).agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    rel_err = F.abs(F.col("est") - F.col("exact_distinct")) / F.col("exact_distinct")
    return (
        monthly.join(exact, "month")
        .select(
            "month",
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("max_daily_distinct").cast("bigint").alias("max_daily_distinct"),
            (rel_err <= _SKETCH_REL_ERR).alias("merge_within_bound"),
            (F.col("est") >= F.col("max_daily_distinct") * 0.95).alias("merge_monotone"),
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy-hitter bounds (the third classic sketch)
# --------------------------------------------------------------------------

CMS_EPS = 0.01
CMS_CONFIDENCE = 0.99
CMS_SEED = 42
CMS_PROBE_K = 10


@component(
    "a18_cms_heavy_hitters",
    oracle=f"""
    WITH counts AS (
      SELECT l_suppkey AS key, COUNT(*) AS n_exact
      FROM lineitem GROUP BY l_suppkey
    ),
    topk AS (
      SELECT key, CAST(n_exact AS BIGINT) AS n_exact,
             ROW_NUMBER() OVER (ORDER BY n_exact DESC, key) AS rnk
      FROM counts
    )
    SELECT key, n_exact,
           TRUE AS ge_exact,
           TRUE AS within_eps
    FROM topk WHERE rnk <= {CMS_PROBE_K}
    """,
    cols=[
        ("key", "num"),
        ("n_exact", "num"),
        ("ge_exact", "bool"),
        ("within_eps", "bool"),
    ],
)
def a18_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation — the third classic mergeable
    sketch next to HLL (a15_sketch_rollup / a6b) and GK percentiles
    (a11b), completing the approximate-aggregation trio a 100 TB ANALYZE
    or streaming top-k layer is built from. The sketch is built by
    Spark's ``count_min_sketch`` aggregate (seeded — deterministic), ships
    as KB-scale bytes however large the keyed data, and the exact top-K
    heavy hitters (SQL-derivable) are probed against it driver-side.

    The contract flags are the CMS's actual guarantees, checked per key:
    ``ge_exact`` — a count-min estimate NEVER underestimates (a
    deterministic structural property, not probabilistic); ``within_eps``
    — the overestimate is bounded by ε·N (ε={CMS_EPS}, N = total rows;
    the 1-δ probabilistic bound is deterministic here under the fixed
    seed and data). Estimates themselves are sketch-internal (same digest
    class as ALS factors); the EXACT counts cross as oracle-checked
    values.

    Scale: one pass + KB merge for the sketch; the probe set is the
    bounded top-K; nothing driver-side is O(rows)."""
    prepare(spark, sf_dir)
    li = spark.table("lineitem")
    n_total = li.count()
    topk = [
        (r.key, r.n_exact)
        for r in li.groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("key"))
        .limit(CMS_PROBE_K)
        .collect()
    ]
    sk = li.agg(
        F.expr(
            f"count_min_sketch(l_suppkey, {CMS_EPS}d, {CMS_CONFIDENCE}d, {CMS_SEED})"
        ).alias("s")
    ).collect()[0].s
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytearray(sk))
    slack = CMS_EPS * n_total
    rows = [
        (
            int(key),
            int(n_exact),
            bool(cms.estimateCount(jvm.java.lang.Long(int(key))) >= n_exact),
            bool(cms.estimateCount(jvm.java.lang.Long(int(key))) <= n_exact + slack),
        )
        for key, n_exact in topk
    ]
    return spark.createDataFrame(
        rows, schema="key bigint, n_exact bigint, ge_exact boolean, within_eps boolean"
    )


# ==========================================================================
# OLS trend fit from exact integer moments (A ext)
# ==========================================================================


@component(
    "a22_ols_trend",
    oracle="""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS y_cents
      FROM orders GROUP BY 1
    ),
    centered AS (
      SELECT ym - (SELECT MIN(ym) FROM monthly) AS x, y_cents AS y
      FROM monthly
    ),
    mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM centered
    )
    SELECT n AS n_months, sy AS total_cents,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
                        / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
           END AS slope_micro,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(FLOOR(CAST(sy * sxx - sx * sxy AS DOUBLE) * 1000000.0
                        / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
           END AS intercept_micro,
           (n * sxy - sx * sy) > 0 AS rising
    FROM mo
    """,
    cols=[
        ("n_months", "num"),
        ("total_cents", "num"),
        ("slope_micro", "num"),
        ("intercept_micro", "num"),
        ("rising", "bool"),
    ],
)
def a22_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares revenue trend: the closed-form OLS fit of monthly
    revenue against a centered month index, computed entirely from the
    five integer moments (n, Σx, Σy, Σxy, Σx²) — no MLlib, no float
    accumulation, no second pass. slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and
    intercept = (ΣyΣx²−ΣxΣxy)/(nΣx²−(Σx)²) cross the engine boundary
    through the FLOOR-micro divide with the double op-tree EXPLICIT on
    both sides: the intercept numerator exceeds 2^53 at sf0.01, and a
    bare ``x * 1000000.0`` is a trap there — DuckDB types the literal
    DECIMAL(8,1) so its product stays exact (ONE rounding at the divide)
    while Spark rounds twice (int64→double, then ×1e6), a probed 1-unit
    floor divergence. ``CAST(num AS DOUBLE) * 1e6 / CAST(den AS DOUBLE)``
    pins both engines to the identical correctly-rounded IEEE sequence.
    The ``rising`` flag binds to the sign of the exact integer numerator,
    so the trend verdict can never disagree. Centering x at MIN(ym) keeps
    every int64 product below ~1e17 at sf0.1 (documented bound; at 100 TB
    the moment columns widen to DECIMAL(38,0), the algebra unchanged).

    Scale: one map-side-combined month rollup (calendar-bounded), the
    min(ym) scalar rides a broadcast cross join, then ONE single-row
    moment aggregate — the regression itself costs O(months), not
    O(orders)."""
    prepare(spark, sf_dir)
    monthly = (
        spark.table("orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long").alias("ym")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("y_cents")
        )
    )
    base = monthly.agg(F.min("ym").alias("ym0"))
    centered = monthly.crossJoin(F.broadcast(base)).select(
        (F.col("ym") - F.col("ym0")).alias("x"), F.col("y_cents").alias("y")
    )
    mo = centered.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    # den = 0 exactly when the table spans a single month (n=1, x≡0) —
    # a degenerate fit: emit NULL slope/intercept instead of ±Infinity
    # feeding floor() with engine-divergent results
    return mo.select(
        F.col("n").alias("n_months"),
        F.col("sy").alias("total_cents"),
        F.when(den != 0, F.floor(num * 1000000.0 / den).cast("long")).alias(
            "slope_micro"
        ),
        F.when(den != 0, F.floor(inum * 1000000.0 / den).cast("long")).alias(
            "intercept_micro"
        ),
        (num > 0).alias("rising"),
    )


# ==========================================================================
# Customer lifetime value heuristic per market segment (A ext)
# ==========================================================================


@component(
    "a25_clv_segments",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_mktsegment,
             o.o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders_c,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS rev_cents_c,
             CAST(MAX(year(o.o_orderdate) * 12 + month(o.o_orderdate))
                  - MIN(year(o.o_orderdate) * 12 + month(o.o_orderdate))
                  + 1 AS BIGINT) AS active_months_c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(n_orders_c) AS BIGINT) AS n_orders,
           CAST(SUM(rev_cents_c) AS BIGINT) AS revenue_cents,
           CAST(SUM(active_months_c) AS BIGINT) AS active_months,
           CAST(FLOOR(CAST(SUM(rev_cents_c) AS DOUBLE)
                      / CAST(SUM(n_orders_c) AS DOUBLE)) AS BIGINT)
             AS aov_cents,
           CAST(FLOOR(CAST(SUM(rev_cents_c) AS DOUBLE) * 12.0
                      / CAST(SUM(active_months_c) AS DOUBLE)) AS BIGINT)
             AS clv12_cents
    FROM per_cust GROUP BY 1
    """,
    cols=[
        ("c_mktsegment", "str"),
        ("n_customers", "num"),
        ("n_orders", "num"),
        ("revenue_cents", "num"),
        ("active_months", "num"),
        ("aov_cents", "num"),
        ("clv12_cents", "num"),
    ],
)
def a25_clv_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value heuristic per market segment — the classic
    CLV ≈ AOV × purchase-rate × horizon readout (reference scope: the
    dashboard analytics family, dags/load_to_warehouse.py's
    revenue-by-segment rollups imply but never compute a forward value).
    Two-level plan: per-customer order count / exact revenue cents /
    active-month span (first-to-last order month, inclusive), then one
    segment rollup. AOV and the 12-month CLV projection cross the engine
    boundary through the FLOOR-micro divide with the double op-tree
    explicit on both sides; everything upstream is exact int64 cents
    (sf0.1 total revenue ≈ 6e11 cents, three orders under 2^53).

    Scale: the orders→customer join shuffles on custkey (dim broadcasts
    when it fits — AQE decides); the per-customer rollup reuses that
    partitioning (same key, no extra exchange); the segment rollup is
    map-side-combined onto a 5-key grain. O(scan) work, catalog-bounded
    output at any data size."""
    prepare(spark, sf_dir)
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    per_cust = (
        spark.table("orders")
        .join(spark.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders_c"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("rev_cents_c"),
            (F.max(ym) - F.min(ym) + 1).cast("long").alias("active_months_c"),
        )
    )
    seg = per_cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("n_orders_c").cast("long").alias("n_orders"),
        F.sum("rev_cents_c").cast("long").alias("revenue_cents"),
        F.sum("active_months_c").cast("long").alias("active_months"),
    )
    return seg.select(
        "c_mktsegment",
        "n_customers",
        "n_orders",
        "revenue_cents",
        "active_months",
        F.floor(
            F.col("revenue_cents").cast("double") / F.col("n_orders").cast("double")
        )
        .cast("long")
        .alias("aov_cents"),
        F.floor(
            F.col("revenue_cents").cast("double") * 12.0
            / F.col("active_months").cast("double")
        )
        .cast("long")
        .alias("clv12_cents"),
    )


# ==========================================================================
# New vs returning customer revenue split by month (A ext)
# ==========================================================================


@component(
    "a26_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS first_ym
      FROM orders GROUP BY 1
    ),
    classified AS (
      SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT) AS ym,
             o.o_custkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate)) = f.first_ym AS is_new
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT ym,
           CAST(SUM(CASE WHEN is_new THEN cents ELSE 0 END) AS BIGINT)
             AS new_rev_cents,
           CAST(SUM(CASE WHEN is_new THEN 0 ELSE cents END) AS BIGINT)
             AS returning_rev_cents,
           CAST(COUNT(DISTINCT CASE WHEN is_new THEN o_custkey END) AS BIGINT)
             AS n_new_customers,
           CAST(COUNT(DISTINCT CASE WHEN NOT is_new THEN o_custkey END) AS BIGINT)
             AS n_returning_customers,
           CAST(FLOOR(CAST(SUM(CASE WHEN is_new THEN cents ELSE 0 END) AS DOUBLE)
                      * 1000000.0
                      / CAST(SUM(cents) AS DOUBLE)) AS BIGINT) AS new_share_micro
    FROM classified GROUP BY ym
    """,
    cols=[
        ("ym", "num"),
        ("new_rev_cents", "num"),
        ("returning_rev_cents", "num"),
        ("n_new_customers", "num"),
        ("n_returning_customers", "num"),
        ("new_share_micro", "num"),
    ],
)
def a26_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly new-vs-returning revenue split — the acquisition-vs-retention
    lens every growth dashboard leads with: an order is "new" revenue iff
    it lands in its customer's FIRST active calendar month (month-grain
    first-touch — no same-day orderkey tiebreak needed, so the class is
    engine-deterministic by construction), everything later is returning.
    Exact int64 cents throughout; the monthly new-revenue share crosses as
    the FLOOR-micro divide.

    Scale: the first-month frame aggregates orders on custkey, then joins
    back to orders on the same key — at 100 TB both sides shuffle once on
    custkey and the rollup onto the calendar-bounded month grain is
    map-side-combined. The distinct-customer counts shuffle on (ym,
    custkey) — bounded by active customers per month. No windows over the
    full fact, no broadcast of anything unbounded."""
    prepare(spark, sf_dir)
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    firsts = spark.table("orders").groupBy("o_custkey").agg(F.min(ym).alias("first_ym"))
    classified = (
        spark.table("orders")
        .join(firsts, "o_custkey")
        .select(
            ym.alias("ym"),
            "o_custkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            (ym == F.col("first_ym")).alias("is_new"),
        )
    )
    new_cents = F.sum(F.when(F.col("is_new"), F.col("cents")).otherwise(F.lit(0)))
    ret_cents = F.sum(F.when(F.col("is_new"), F.lit(0)).otherwise(F.col("cents")))
    return classified.groupBy("ym").agg(
        new_cents.cast("long").alias("new_rev_cents"),
        ret_cents.cast("long").alias("returning_rev_cents"),
        F.countDistinct(F.when(F.col("is_new"), F.col("o_custkey")))
        .cast("long")
        .alias("n_new_customers"),
        F.countDistinct(F.when(~F.col("is_new"), F.col("o_custkey")))
        .cast("long")
        .alias("n_returning_customers"),
        F.floor(
            new_cents.cast("double") * 1000000.0 / F.sum("cents").cast("double")
        )
        .cast("long")
        .alias("new_share_micro"),
    )


# ==========================================================================
# Bitmap-index distinct counting (exact + mergeable, the HLL alternative)
# ==========================================================================


@component(
    "a27_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct_bitmap,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct_exact,
           TRUE AS bitmap_matches
    FROM lineitem GROUP BY l_returnflag
    """,
    cols=[
        ("l_returnflag", "str"),
        ("n_distinct_bitmap", "num"),
        ("n_distinct_exact", "num"),
        ("bitmap_matches", "bool"),
    ],
)
def a27_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index distinct counting — the EXACT mergeable alternative to
    the HLL sketch (a6b/a15): every key maps to one (bucket, bit) slot via
    ``bitmap_bucket_number``/``bitmap_bit_position``, per-(group, bucket)
    partials OR together with ``bitmap_construct_agg``, and popcounts
    (``bitmap_count``) ADD across buckets because the bucket spaces are
    disjoint — distinct-count becomes an associative aggregation with no
    distinct shuffle of raw keys and no approximation. The engine runs
    BOTH the bitmap path and the plain COUNT(DISTINCT) in one query and
    emits the equality verdict alongside the counts; the oracle pins the
    counts with SQL's exact distinct (TRUE twin for the verdict — the
    claim IS that the paths agree).

    Scale: this is exactly how warehouse engines accelerate COUNT(DISTINCT
    intkey) at 100 TB — partials are 4 KB bitmaps per bucket, map-side
    combined, mergeable across days for incremental rollups (the exact
    analogue of the a15 HLL union). Key-space caveat documented: buckets
    scale with max(key)/32768, dense int64 surrogate keys are the fit;
    arbitrary strings go through the HLL path instead."""
    prepare(spark, sf_dir)
    li = spark.table("lineitem")
    partial = (
        li.select(
            "l_returnflag",
            F.bitmap_bucket_number(F.col("l_partkey")).alias("bkt"),
            F.bitmap_bit_position(F.col("l_partkey")).alias("pos"),
        )
        .groupBy("l_returnflag", "bkt")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    via_bitmap = partial.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count(F.col("bm"))).cast("long").alias("n_distinct_bitmap")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_distinct_exact")
    )
    return via_bitmap.join(exact, "l_returnflag").select(
        "l_returnflag",
        "n_distinct_bitmap",
        "n_distinct_exact",
        (F.col("n_distinct_bitmap") == F.col("n_distinct_exact")).alias("bitmap_matches"),
    )


# ==========================================================================
# Bitwise aggregate rollups: flag masks per group (A ext)
# ==========================================================================


@component(
    "a28_bitwise_flags",
    oracle="""
    WITH coded AS (
      SELECT o_orderstatus,
             CAST(1 AS BIGINT) << (CAST(substring(o_orderpriority, 1, 1) AS INT) - 1)
               AS mask
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(bit_or(mask) AS BIGINT) AS priorities_seen,
           CAST(bit_and(mask) AS BIGINT) AS priorities_common,
           CAST(bit_xor(mask) AS BIGINT) AS priorities_parity
    FROM coded GROUP BY o_orderstatus
    """,
    cols=[
        ("o_orderstatus", "str"),
        ("n_orders", "num"),
        ("priorities_seen", "num"),
        ("priorities_common", "num"),
        ("priorities_parity", "num"),
    ],
)
def a28_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate rollups — ``bit_or``/``bit_and``/``bit_xor`` over
    per-row flag masks, the compact feature-presence pattern behind
    permission audits and capability matrices: each order contributes the
    one-hot bit of its priority class (bit p−1 for priority p), and per
    status the OR mask answers "which priorities ever occur", the AND
    mask "which occur in EVERY order" (degenerates to 0 the moment two
    priorities mix), and the XOR mask the per-bit parity. All pure int64
    bit algebra — associative, commutative, shuffle-order-independent by
    construction, so the crossing needs no exactness machinery at all.

    Scale: one map-side-combined aggregation onto the |status| grain —
    bitwise aggregates are the cheapest mergeable state there is (8 bytes
    per group per mask); the 100 TB form is identical."""
    prepare(spark, sf_dir)
    # shiftleft needs a literal bit count; the one-hot masks for the five
    # priority classes are a 5-entry literal map instead
    one_hot = F.create_map(*[F.lit(x) for p in range(1, 6) for x in (p, 1 << (p - 1))])
    mask = one_hot[F.substring("o_orderpriority", 1, 1).cast("int")].cast("long")
    return (
        spark.table("orders")
        .select("o_orderstatus", mask.alias("mask"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.bit_or("mask").cast("long").alias("priorities_seen"),
            F.bit_and("mask").cast("long").alias("priorities_common"),
            F.bit_xor("mask").cast("long").alias("priorities_parity"),
        )
    )
