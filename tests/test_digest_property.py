"""Property test: digest_df (Spark) == digest_sql (DuckDB) on random frames.

The digest layer is the correctness-critical seam for every suite component,
so it is fuzzed directly: random rows with nulls, negatives, unicode,
extreme-but-in-domain doubles — the Spark digest and the generated DuckDB
digest SQL must agree cell-for-cell.

Domain note (documented precondition, not a bug): doubles must be finite —
NaN/Inf never reach digests, no engine path produces them. Magnitude is
unrestricted: the fold clamps to ±DBL_CLAMP identically on both engines
(this fuzzer originally caught the unclamped divergence at |x| > 2^63/1e6,
where Spark's floor->LONG saturates and DuckDB floors in double).

Round-7 hardening, after the round-6 driver red that this file failed to
catch: ``num`` columns fuzz over the FULL int64 range (epoch-microsecond
magnitudes included — the old ±2^40 cap kept every sum inside double's
exact-integer range, masking the decimal→double 1-ulp divergence), and
comparison is BIT-EXACT on doubles (IEEE bit pattern — the old
10-significant-digit rounding was exactly the weakness that let the 1-ulp
bug ship). ``num``/``dbl`` sums now cross engines as exact decimal
strings, so bit-exact parity must hold at any magnitude.
"""

from __future__ import annotations

import math
import shutil
import struct
import tempfile

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# full-gate lane: multi-minute property/identity/streaming work (see pytest.ini)
pytestmark = pytest.mark.slow

COLS = (
    ("k", "num"),
    ("x", "dbl"),
    ("s", "str"),
    ("b", "bool"),
    ("d", "date"),
    ("t", "ts"),
)

# date/ts domains: the full parquet-portable range both engines read back
# losslessly (years 1–9999 for DATE; timestamps kept within the int64
# epoch-µs span both engines share).
_EPOCH_DAY_MIN, _EPOCH_DAY_MAX = -719162, 2932896  # 0001-01-01 .. 9999-12-31
_EPOCH_US_MIN = -62135596800 * 1_000_000  # 0001-01-01T00:00:00Z
_EPOCH_US_MAX = 253402300799 * 1_000_000  # 9999-12-31T23:59:59Z

row_st = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1)),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False),
    ),
    st.one_of(st.none(), st.text(max_size=12)),
    st.one_of(st.none(), st.booleans()),
    st.one_of(st.none(), st.integers(min_value=_EPOCH_DAY_MIN, max_value=_EPOCH_DAY_MAX)),
    st.one_of(st.none(), st.integers(min_value=_EPOCH_US_MIN, max_value=_EPOCH_US_MAX)),
)


def _norm(rows):
    out = []
    for r in rows:
        cells = []
        for v in r:
            if isinstance(v, float):
                # bit-exact, like the driver's value hash — NEVER round here
                cells.append("nan" if math.isnan(v) else struct.pack(">d", v).hex())
            else:
                cells.append(v)
        out.append(tuple(cells))
    out.sort(key=lambda row: [(v is None, str(v)) for v in row])
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(row_st, min_size=0, max_size=25))
@pytest.mark.usefixtures("spark")
def test_digest_cross_engine_parity(spark, rows):
    from e_commerce_data_warehouse_recommendation_system_spark.operators.digest import (
        digest_df,
        digest_sql,
    )

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(
        rows, schema="k long, x double, s string, b boolean, d_days int, t_us long"
    ).select(
        "k",
        "x",
        "s",
        "b",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("d_days")).alias("d"),
        F.timestamp_micros(F.col("t_us")).alias("t"),
    )
    got = [tuple(r) for r in digest_df(sdf, "fuzz", COLS).collect()]

    tmp = tempfile.mkdtemp(prefix="ecomdw_digest_fuzz_")
    try:
        sdf.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/t")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW src AS SELECT k, x, s, b, d, t FROM '{tmp}/t/*.parquet'")
        want = con.execute(digest_sql("fuzz", "SELECT * FROM src", COLS)).fetchall()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert _norm(got) == _norm(want)


def test_digest_num_epoch_us_sum_regression(spark):
    """Pinned reproduction of the round-6 driver red: a `num` column of
    epoch-microsecond values whose SUM (~1.6e19) exceeds double's 2^53
    exact range. The old double-valued sum digest diverged by 1 ulp
    between Spark's BigDecimal→double and DuckDB's int128→double rounding
    (0x43EC3A774C3AB4D7 vs …D8); the string-valued decimal sum must be
    bit-identical at any magnitude."""
    from e_commerce_data_warehouse_recommendation_system_spark.operators.digest import (
        digest_df,
        digest_sql,
    )

    # ~9,549 values near 1.7e15 µs (2024-era timestamps): sum ≈ 1.6e19,
    # the exact magnitude class of stream_session_window_native's
    # session_start_us column at sf0.01.
    base = 1_704_067_200_000_000  # 2024-01-01 in epoch µs
    rows = [(base + i * 171_003_337,) for i in range(9_549)]
    cols = (("t_us", "num"),)
    sdf = spark.createDataFrame(rows, schema="t_us long")
    got = [tuple(r) for r in digest_df(sdf, "epochus", cols).collect()]

    tmp = tempfile.mkdtemp(prefix="ecomdw_digest_epoch_")
    try:
        sdf.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/t")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW src AS SELECT t_us FROM '{tmp}/t/*.parquet'")
        want = con.execute(digest_sql("epochus", "SELECT * FROM src", cols)).fetchall()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert _norm(got) == _norm(want)
    # and the sum really is out of double's exact-integer range — i.e. this
    # test would have been red on the round-6 tree
    total = sum(r[0] for r in rows)
    assert total > 2**53
    sum_row = [r for r in got if r[1] == "sum:t_us"]
    assert sum_row and sum_row[0][3] == f"{total}.000000"
