"""Window / ranking operators (SURVEY.md SS2.6 W-series + W-ext rungs).

Pure move from operators/relational.py in round 11 (the graph.py recipe:
registry names unchanged, relational.py star-re-exports every public
symbol at the original registration point). Holds W1-W3 (surrogate keys
incl. the two-phase form, category codes, per-group top-k), the running
aggregates (running total, lag/lead, RANGE frames, windowed distinct,
the w8 two-phase sweep-line), plus gaps-and-islands streaks and the
inter-purchase interval distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from e_commerce_data_warehouse_recommendation_system_spark.registry import component
from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import prepare


# ==========================================================================
# SS2.6 Window / ranking
# ==========================================================================


@component(
    "w1_surrogate_key",
    cols=[("nation_key", "num"), ("n_name", "str")],
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_nationkey) AS INT) AS nation_key, n_name
    FROM nation
    """,
)
def w1_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: sequential surrogate key = row_number over an explicit natural-key
    order (reference: ``df.index + 1``, dags/transform_dim_customers.py:19).
    Global row_number is a total-order sort — dimension tables only."""
    prepare(spark, sf_dir)
    w = Window.orderBy("n_nationkey")
    return spark.table("nation").select(F.row_number().over(w).alias("nation_key"), "n_name")


def surrogate_key(
    df: DataFrame,
    order_col: str,
    key_name: str,
    buckets: int | None = None,
    bounds: "list | None" = None,
) -> DataFrame:
    """Two-phase distributed surrogate key: identical result to
    ``ROW_NUMBER() OVER (ORDER BY order_col)`` without a single-partition
    global sort (the reference's ``df.index + 1``, W1, at cluster scale).

    Bucket boundaries are approximate quantiles of the (numeric) key,
    computed ONCE and embedded as plan literals — every consumer of the
    bucketed frame assigns identical buckets, which range-repartitioning
    cannot promise when the input's row order is itself nondeterministic
    (e.g. downstream of a join, each re-execution re-samples and the
    local-rank branch and the offset branch can disagree; caught by an
    sf0.1 oracle run). Phase 1: partition-local row_number per bucket.
    Phase 2: per-bucket counts -> cumulative offsets (a ``buckets``-row
    window) broadcast back; ``key = offset + local_rank``. O(buckets)
    driver state, never a one-task sort. Boundary placement only affects
    balance, never the result, so approxQuantile's error tolerance is
    harmless. Keys are assumed unique + non-null (natural keys).

    ``bounds`` (r15 opt, guide §1.2 fewer passes): callers that build
    SEVERAL surrogate keys over one scan may precompute all boundary
    lists in a single aggregation job (e.g. one ``percentile_approx``
    pass over two columns) and pass each list here, skipping this
    function's own eager approxQuantile action. Because any MONOTONE
    bucketing of the key yields the identical final rank (bucket-local
    rank + exact cumulative offsets reconstruct the global order
    regardless of where the boundaries fall), the boundary SOURCE cannot
    change the result — only task balance.
    """
    spark = df.sparkSession
    n = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    qs = [i / n for i in range(1, n)]
    if bounds is None:
        bounds = df.stat.approxQuantile(order_col, qs, 0.001)
    bounds = sorted(set(bounds))
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(order_col) > b, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    with_bucket = df.withColumn("_bkt", bucket)
    local = with_bucket.withColumn(
        "_lrn", F.row_number().over(Window.partitionBy("_bkt").orderBy(order_col))
    )
    counts = with_bucket.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(key_name, (F.col("_off") + F.col("_lrn")).cast("int"))
        .drop("_bkt", "_lrn", "_off")
    )


@component(
    "w1b_surrogate_key_two_phase",
    cols=[("customer_key", "num"), ("c_custkey", "num")],
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS INT) AS customer_key,
           c_custkey
    FROM customer
    """,
)
def w1b_surrogate_key_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 at scale: the two-phase surrogate key on the largest growing dim,
    oracle-proven equal to a global ROW_NUMBER. This is the form the ETL
    dims use (plans/etl.py) — no single-partition WindowExec anywhere."""
    prepare(spark, sf_dir)
    c = spark.table("customer").select("c_custkey")
    return surrogate_key(c, "c_custkey", "customer_key").select("customer_key", "c_custkey")


@component(
    "w2_category_codes",
    cols=[("o_orderpriority", "str"), ("priority_code", "num")],
    oracle="""
    SELECT o_orderpriority, CAST(DENSE_RANK() OVER (ORDER BY o_orderpriority) AS INT) AS priority_code
    FROM (SELECT DISTINCT o_orderpriority FROM orders)
    """,
)
def w2_category_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: pandas ``astype('category').cat.codes + 1`` — codes follow the
    lexicographic order of categories (reference:
    dags/transform_fact_orders.py:48) -> dense_rank over the sorted domain."""
    prepare(spark, sf_dir)
    w = Window.orderBy("o_orderpriority")
    return (
        spark.table("orders")
        .select("o_orderpriority")
        .distinct()
        .withColumn("priority_code", F.dense_rank().over(w).cast("int"))
    )


@component(
    "w3_topk_per_group",
    cols=[
        ("p_brand", "str"),
        ("p_partkey", "num"),
        ("p_retailprice", "dbl"),
        ("rank_in_brand", "num"),
    ],
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rank_in_brand FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rank_in_brand
      FROM part
    ) WHERE rank_in_brand <= 3
    """,
)
def w3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: per-group top-k — the single most important window op for the
    engine: ``recommendForAllUsers`` reduces to it (reference global form:
    mf_knn_recommender.py:272-273). Ties broken by key for determinism."""
    prepare(spark, sf_dir)
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        spark.table("part")
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rank_in_brand", F.row_number().over(w).cast("int"))
        .filter(F.col("rank_in_brand") <= 3)
    )


@component(
    "w4_running_total",
    cols=[("o_custkey", "num"), ("o_orderkey", "num"), ("running_spend", "dbl")],
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def w4_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over an analytic frame — beyond the reference's
    surface (SURVEY.md SS2.6 notes it has none) but core warehouse
    functionality; decimal accumulation keeps the running values exact."""
    prepare(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spark.table("orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,8)")).over(w).cast("double").alias("running_spend"),
    )


@component(
    "w5_analytic_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) - CAST(LAG(o_orderdate) OVER w AS DATE) AS prev_gap_days,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS spend_quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    cols=[
        ("o_custkey", "num"),
        ("o_orderkey", "num"),
        ("prev_gap_days", "num"),
        ("next_orderkey", "num"),
        ("first_orderkey", "num"),
        ("spend_quartile", "num"),
        ("pct_rank", "dbl"),
        ("cume", "dbl"),
    ],
)
def w5_analytic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full analytic-window surface beyond ranking (W-family extension):
    lag/lead/first_value/ntile/percent_rank/cume_dist over each customer's
    order timeline — one shuffle on the partition key, linear per-key
    sweeps. The ORDER BY includes the unique orderkey, so frames have no
    peer rows and every function is engine-deterministic."""
    prepare(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate")
    return spark.table("orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(d, F.lag(d).over(w)).alias("prev_gap_days"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.ntile(4).over(w).cast("int").alias("spend_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@component(
    "w6_rolling_7day_revenue",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_num,
             o_totalprice
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8)))
                OVER (PARTITION BY o_custkey ORDER BY day_num
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS revenue_7d
    FROM o
    """,
    cols=[("o_custkey", "num"), ("o_orderkey", "num"), ("revenue_7d", "dbl")],
)
def w6_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling aggregate (W-family extension): each order's
    trailing-7-day customer revenue via a RANGE frame over day numbers —
    the moving-metric shape every dashboard needs. RANGE frames include
    peer rows (same customer, same day), so both engines produce identical
    sums for tied rows; decimal accumulation keeps them exact. One shuffle
    on the partition key, linear per-key sweep."""
    prepare(spark, sf_dir)
    o = spark.table("orders").withColumn(
        "day_num", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,8)"))
        .over(w)
        .cast("double")
        .alias("revenue_7d"),
    )


@component(
    "w7_windowed_distinct_count",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS dr
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(MAX(dr) OVER (PARTITION BY o_custkey) AS INT) AS n_distinct_priorities
    FROM ranked
    """,
    cols=[("o_custkey", "num"), ("o_orderkey", "num"), ("n_distinct_priorities", "num")],
)
def w7_windowed_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a window — neither engine supports
    COUNT(DISTINCT) OVER directly, so this is the standard two-window
    rewrite: dense_rank within the partition ordered by the value, then
    max(dense_rank) over the partition. Both windows share the partition
    key, so the whole thing costs ONE shuffle (Catalyst reuses the
    exchange) plus two linear sweeps."""
    prepare(spark, sf_dir)
    w_rank = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w_part = Window.partitionBy("o_custkey")
    return (
        spark.table("orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.dense_rank().over(w_rank).alias("dr"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.max("dr").over(w_part).cast("int").alias("n_distinct_priorities"),
        )
    )


@component(
    "w8_interval_concurrency",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS s,
             MAX(CAST(l.l_shipdate AS DATE)) AS e
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT s AS d, 1 AS delta FROM iv
      UNION ALL
      SELECT e + 1 AS d, -1 AS delta FROM iv
    ),
    net AS (SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY d),
    cum AS (SELECT d, SUM(net) OVER (ORDER BY d) AS open_cnt FROM net)
    SELECT CAST(date_trunc('month', d) AS DATE) AS month,
           CAST(MAX(open_cnt) AS BIGINT) AS max_open,
           CAST(COUNT(*) AS BIGINT) AS n_delta_days
    FROM cum GROUP BY 1
    """,
    cols=[("month", "date"), ("max_open", "num"), ("n_delta_days", "num")],
)
def w8_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap concurrency (sweep line): each order is "in
    flight" from its order date to its last line-item ship date; the
    metric is the maximum number of simultaneously open orders per month —
    the warehouse-load / working-capital question a dashboard asks of any
    interval table, and the one aggregation windows can't express without
    the +1/-1 boundary-event trick used here.

    The oracle writes the textbook single global running sum; the Spark
    plan computes the SAME prefix sums in TWO PHASES so no corpus-sized
    data ever passes through a single partition: per-date net deltas
    (one groupBy), then a month-level prefix (a window over the
    calendar-bounded month table — dozens of rows at any data size, like
    w1b's two-phase surrogate keys), plus a within-month cumulative sum
    partitioned BY month. prefix(month) + within-month cumsum ==
    global cumsum, exactly, in integers.

    Scale: one shuffle for the per-order interval rollup, one for the
    date-level net, one partition-by-month window; the only ordered-global
    structure is the month table, bounded by the calendar, not the data."""
    prepare(spark, sf_dir)
    iv = (
        spark.table("orders")
        .join(
            spark.table("lineitem").select("l_orderkey", "l_shipdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("s"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("e"))
    )
    # both boundary events from ONE pass over iv (a union of two selects
    # would replay the interval rollup twice) — map-side explode, no shuffle
    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("d"), F.lit(1).alias("delta")),
                F.struct(F.date_add("e", 1).alias("d"), F.lit(-1).alias("delta")),
            )
        ).alias("ev")
    ).select("ev.d", "ev.delta")
    net = (
        deltas.groupBy("d")
        .agg(F.sum("delta").cast("long").alias("net"))
        .withColumn("month", F.trunc("d", "MM"))
        .cache()  # calendar-bounded (one row per active date); feeds both
        # the month-prefix build and the day-level cumsum — uncached, the
        # interval rollup + date aggregation replay per consumer
    )
    w_months = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, -1)
    month_prefix = (
        net.groupBy("month")
        .agg(F.sum("net").alias("mnet"))
        .select(
            "month",
            F.coalesce(F.sum("mnet").over(w_months), F.lit(0)).alias("prefix"),
        )
    )
    w_days = (
        Window.partitionBy("month")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = net.join(F.broadcast(month_prefix), "month").select(
        "month", "d", (F.col("prefix") + F.sum("net").over(w_days)).alias("open_cnt")
    )
    return cum.groupBy("month").agg(
        F.max("open_cnt").cast("long").alias("max_open"),
        F.count(F.lit(1)).alias("n_delta_days"),
    )


@component(
    "a11b_approx_percentile_bound",
    oracle="""
    SELECT quantile_cont(o_totalprice, 0.5) AS exact_median,
           TRUE AS approx_within_rank_bound
    FROM orders
    """,
    cols=[("exact_median", "dbl"), ("approx_within_rank_bound", "bool")],
)
def a11b_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The percentile sketch path's contract (the a6b pattern for
    quantiles): ``approx_percentile`` (Greenwald-Khanna, mergeable — no
    global sort at 100 TB) must land between the exact quantiles at
    p ± 1/accuracy. The flag is computed from the genuine sketch value;
    the exact median anchors the row."""
    prepare(spark, sf_dir)
    o = spark.table("orders")
    agg = o.agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 100)").alias("approx"),
        F.expr("percentile(o_totalprice, 0.49)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.51)").alias("hi"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
    )
    return agg.select(
        "exact_median",
        ((F.col("approx") >= F.col("lo")) & (F.col("approx") <= F.col("hi"))).alias(
            "approx_within_rank_bound"
        ),
    )


# ==========================================================================
# Gaps-and-islands: consecutive-activity streaks (W ext)
# ==========================================================================


@component(
    "w9_order_streaks",
    oracle="""
    WITH m AS (
      SELECT DISTINCT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym
      FROM orders
    ),
    isl AS (
      SELECT o_custkey, ym,
             ym - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY ym)
               AS island
      FROM m
    ),
    runs AS (
      SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT) AS len
      FROM isl GROUP BY 1, 2
    )
    SELECT o_custkey,
           CAST(SUM(len) AS BIGINT) AS n_active_months,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY o_custkey
    """,
    cols=[
        ("o_custkey", "num"),
        ("n_active_months", "num"),
        ("n_streaks", "num"),
        ("longest_streak", "num"),
    ],
)
def w9_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each customer's longest streak of CONSECUTIVE
    active months — the retention question ("how long do customers stay
    habitual?") that no plain aggregation answers. The classic trick: for
    the sorted distinct month indices of one customer, ``ym − row_number``
    is constant exactly within a consecutive run, so one window plus two
    aggregations recovers every island without self-joins or recursion.
    Month index = year*12+month (integer, engine-identical); every value
    in flight is an integer, so both engines agree bit-for-bit.

    Scale: the distinct() keys on (customer, month) — strictly tighter
    than orders — and the window, the island groupBy, and the final
    per-customer rollup all share the o_custkey hash partitioning, so one
    exchange serves the whole chain; per-partition window state is bounded
    by the calendar (months per customer), never by order volume."""
    prepare(spark, sf_dir)
    m = (
        spark.table("orders")
        .select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("ym")
    isl = m.select("o_custkey", "ym", (F.col("ym") - F.row_number().over(w)).alias("island"))
    runs = isl.groupBy("o_custkey", "island").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("o_custkey").agg(
        F.sum("len").cast("long").alias("n_active_months"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


# ==========================================================================
# Inter-purchase interval distribution (W ext)
# ==========================================================================

#: (band label, inclusive upper bound in days) — last band is open-ended
GAP_BANDS: tuple[tuple[str, int], ...] = (
    ("within_week", 7),
    ("within_month", 30),
    ("within_quarter", 90),
)


@component(
    "w10_interpurchase_gaps",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS d,
             LAG(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
             ) AS prev_d
      FROM orders
    ),
    gaps AS (
      SELECT CAST(datediff('day', prev_d, d) AS BIGINT) AS gap_days
      FROM seq WHERE prev_d IS NOT NULL
    ),
    banded AS (
      SELECT CASE WHEN gap_days <= 7 THEN 'within_week'
                  WHEN gap_days <= 30 THEN 'within_month'
                  WHEN gap_days <= 90 THEN 'within_quarter'
                  ELSE 'beyond_quarter' END AS band,
             gap_days
      FROM gaps
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
           CAST(FLOOR(CAST(SUM(gap_days) AS DOUBLE) * 1000000.0
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS avg_gap_micro
    FROM banded GROUP BY band
    """,
    cols=[
        ("band", "str"),
        ("n_gaps", "num"),
        ("total_gap_days", "num"),
        ("min_gap_days", "num"),
        ("max_gap_days", "num"),
        ("avg_gap_micro", "num"),
    ],
)
def w10_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution — the repeat-purchase cadence
    signal behind replenishment reminders and churn scoring: per customer,
    the day gap between consecutive orders (LAG over the per-customer
    date sequence, orderkey tiebreak pins determinism; same-day repeat
    orders contribute gap 0), banded into week/month/quarter/beyond
    buckets. Band assignment binds to exact integer day counts, so the
    histogram is engine-deterministic; the per-band mean gap crosses as
    the FLOOR-micro divide.

    Scale: one window shuffle on custkey (per-customer sequences are
    order-count bounded), then a map-side-combined 4-key rollup — the
    same partitioning pattern as w4_running_total; no joins, O(scan)
    work, constant output."""
    prepare(spark, sf_dir)
    d = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy(d, F.col("o_orderkey"))
    seq = spark.table("orders").select(
        "o_custkey", d.alias("d"), F.lag(d).over(w).alias("prev_d")
    )
    gaps = seq.filter(F.col("prev_d").isNotNull()).select(
        F.datediff(F.col("d"), F.col("prev_d")).cast("long").alias("gap_days")
    )
    band = F.when(F.col("gap_days") <= GAP_BANDS[0][1], F.lit(GAP_BANDS[0][0]))
    for label, ub in GAP_BANDS[1:]:
        band = band.when(F.col("gap_days") <= ub, F.lit(label))
    band = band.otherwise(F.lit("beyond_quarter"))
    return (
        gaps.select(band.alias("band"), "gap_days")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_days").cast("long").alias("total_gap_days"),
            F.min("gap_days").cast("long").alias("min_gap_days"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
            F.floor(
                F.sum("gap_days").cast("double")
                * 1000000.0
                / F.count(F.lit(1)).cast("double")
            )
            .cast("long")
            .alias("avg_gap_micro"),
        )
    )
