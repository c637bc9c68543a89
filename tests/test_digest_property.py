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
"""

from __future__ import annotations

import math
import shutil
import tempfile

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

COLS = (("k", "num"), ("x", "dbl"), ("s", "str"), ("b", "bool"))

row_st = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-(2**40), max_value=2**40)),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False),
    ),
    st.one_of(st.none(), st.text(max_size=12)),
    st.one_of(st.none(), st.booleans()),
)


def _norm(rows):
    out = []
    for r in rows:
        cells = []
        for v in r:
            if isinstance(v, float):
                cells.append("nan" if math.isnan(v) else float(f"{v:.9e}"))
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

    sdf = spark.createDataFrame(rows, schema="k long, x double, s string, b boolean")
    got = [tuple(r) for r in digest_df(sdf, "fuzz", COLS).collect()]

    tmp = tempfile.mkdtemp(prefix="ecomdw_digest_fuzz_")
    try:
        sdf.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/t")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW src AS SELECT k, x, s, b FROM '{tmp}/t/*.parquet'")
        want = con.execute(digest_sql("fuzz", "SELECT * FROM src", COLS)).fetchall()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert _norm(got) == _norm(want)
