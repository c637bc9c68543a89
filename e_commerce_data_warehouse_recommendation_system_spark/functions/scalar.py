"""Scalar functions (SURVEY.md SS2.9) and the pandas-parity layer (SS4.3 #1).

Two concerns live here:

1. **Pandas-parity wrappers** — the reference's transforms use pandas string/
   date semantics that differ subtly from Spark built-ins (F3 title-case,
   F6 weekday origin, F11 fractional-day durations, F2 zfill). Each wrapper
   is a pure Column expression (JVM-side, codegen'd — no UDFs).

2. **Deterministic aggregation helpers** — double summation is
   order-dependent, and Spark's shuffle order differs from any single-node
   oracle. ``dec_sum`` routes sums through DECIMAL(38,s) accumulation:
   exact, associative, order-independent — so results hash-match DuckDB
   bit-for-bit while map-side partial aggregation still applies. The final
   cast back to double keeps oracle schemas aligned.

   Round-7 hardening: that final decimal→double cast is itself a hazard
   once the decimal needs >53 mantissa bits (|sum| > 2^53/10^scale ≈ 9e7
   at scale 8) — Spark's BigDecimal rounding and DuckDB's int128 rounding
   can then diverge by 1 ulp (caught bit-exactly on q_revenue_rollup's
   grand-total row at sf0.01). Driver-visible query OUTPUT columns
   therefore use the ``*_exact`` variants, which never cast a wide
   decimal to double.

   Round-8 hardening: a raw DecimalType OUTPUT column is itself NOT
   driver-hashable — the round-7 driver artifact red-flagged all 11
   queries that emitted one (rows/schema green, hash red: the oracle
   fetch path collapses DECIMAL to float64, so no canonicalization can
   match a Spark ``Decimal`` object against it). The convention, proven
   green by 13 digest suites across two rounds: exact sums CROSS THE
   ENGINE BOUNDARY AS SCALE-PINNED STRINGS. ``dec_sum_exact`` stays the
   internal exact accumulator (keep using it for downstream ±
   arithmetic); every driver-visible emission goes through
   ``dec_sum_str`` / ``dec_str`` (probed: Spark decimal→string and
   DuckDB decimal→VARCHAR render identically at every scale, including
   zero — both emit plain notation, e.g. ``0.00000000``).
   ``dec_avg_exact`` divides exact int64 units — int64→double conversion
   is correctly rounded and identical everywhere, unlike decimal→double.
   ``dec_sum``/``dec_avg`` remain for INTERNAL arithmetic and for suite
   components, whose driver-visible form is the (overflow-safe) digest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Deterministic aggregation (order-independent across shuffles)
# --------------------------------------------------------------------------


def dec_sum(col: Column | str, scale: int = 8) -> Column:
    """SUM through DECIMAL(28,scale): exact and shuffle-order-independent,
    cast back to double. Oracle-side twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 8) -> Column:
    """AVG with a deterministic numerator: exact decimal sum divided by the
    bigint count — both engines then perform the identical double division.
    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE)/COUNT(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def dec_sum_exact(col: Column | str, scale: int = 8) -> Column:
    """Exact SUM as DecimalType(38,scale) — the INTERNAL accumulator,
    exact at any magnitude. NOT driver-hashable as an output column: the
    round-7 driver artifact red-flagged every query that emitted a raw
    DecimalType (the oracle fetch path collapses DECIMAL to float64, so
    Spark ``Decimal`` objects can never hash-match it; the round-7
    docstring claimed this crossing was "probed" but the probe only ran
    through a scale-blind local comparator). Use for downstream ±
    arithmetic, then emit through ``dec_str``/``dec_sum_str``.
    Same-scale decimals add/subtract exactly in both engines; do NOT
    divide the result (decimal division scale rules differ across
    engines — use dec_avg_exact or micro-units for ratios)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})"))


def dec_str(col: Column | str) -> Column:
    """Emit a decimal column across the engine boundary as its scale-pinned
    plain string — the driver-hashable form of an exact decimal (13 digest
    suites green on it for two rounds). Spark's decimal→string cast and
    DuckDB's decimal→VARCHAR both render plain notation with the type's
    full scale (probed round 8: zero renders ``0.00000000`` on both, never
    ``0E-8``), so bit-identical values serialize to identical strings.
    Oracle twin: wrap the matching decimal expression in
    ``CAST(... AS VARCHAR)`` (scales must agree — Spark SUM of
    DECIMAL(28,8) is DECIMAL(38,8); DuckDB SUM of DECIMAL(28,8) widens to
    DECIMAL(38,8) — both render 8 fraction digits)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def dec_sum_str(col: Column | str, scale: int = 8) -> Column:
    """``dec_sum_exact`` emitted in the driver-hashable string form.
    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(28,8))) AS VARCHAR)``."""
    return dec_str(dec_sum_exact(col, scale))


def dec_avg_exact(col: Column | str, scale: int = 8) -> Column:
    """Bit-identical cross-engine AVG as double: the exact decimal sum is
    converted to INT64 units (exact while |sum| < 2^63/10^scale ≈ 9.2e10
    at scale 8 — orders of magnitude above any per-group sum here), then
    one int64→double conversion per operand (correctly rounded, identical
    in every IEEE implementation) and one double division (exactly
    rounded). No decimal→double cast ever happens. Oracle twin:
    ``CAST(CAST(SUM(CAST(x AS DECIMAL(28,8))) * 100000000 AS BIGINT)
    AS DOUBLE) / CAST(COUNT(x) * 100000000 AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    units = (F.sum(c.cast(f"decimal(28,{scale})")) * F.lit(10**scale)).cast("long")
    return units.cast("double") / (F.count(c) * F.lit(10**scale)).cast("double")


# --------------------------------------------------------------------------
# Pandas-parity string functions
# --------------------------------------------------------------------------


def zfill(col: Column | str, width: int = 5) -> Column:
    """F2: ``str.zfill(width)`` for non-negative strings
    (reference: dags/transform_dim_customers.py:14). ``lpad`` alone would
    TRUNCATE inputs longer than ``width`` (pandas zfill never does), so
    longer strings pass through unchanged. Exact for zip codes (zfill's
    '-' handling never triggers on non-negative input)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) >= width, c).otherwise(F.lpad(c, width, "0"))


def pandas_title(col: Column | str) -> Column:
    """F3: pandas ``str.title()`` (reference: transform_dim_customers.py:15).

    Pandas capitalizes the first letter after ANY non-alpha character
    ('sao-paulo' -> 'Sao-Paulo'); Spark's ``initcap`` only after whitespace
    ('Sao-paulo'). Reproduced without a UDF: lowercase, then uppercase every
    alpha that starts an alpha-run, via regexp_replace on the run heads.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _title_runs(F.lower(c))


def _title_runs(lowered: Column) -> Column:
    """Title-case helper: split on alpha-run boundaries, initcap each token.

    Implemented as: split into characters-preserving tokens around non-alpha
    boundaries using a zero-width split, transform each token, reassemble.
    Pure Column expressions (split/transform/concat_ws), no UDF.
    """
    # Zero-width split points: between a non-alpha and an alpha.
    tokens = F.split(lowered, r"(?<![A-Za-z])(?=[A-Za-z])")
    titled = F.transform(
        tokens, lambda t: F.concat(F.upper(F.substring(t, 1, 1)), F.substring(t, 2, 2147483646))
    )
    return F.array_join(titled, "")


def word_title(col: Column | str) -> Column:
    """Space-delimited title-case (the oracle-friendly variant): lowercase,
    split on single spaces, capitalize each word head. Matches the DuckDB
    expression built from ``string_split`` + ``list_transform`` exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.split(F.lower(c), " ")
    titled = F.transform(
        tokens, lambda t: F.concat(F.upper(F.substring(t, 1, 1)), F.substring(t, 2, 2147483646))
    )
    return F.array_join(titled, " ")


# --------------------------------------------------------------------------
# Pandas-parity date/time functions
# --------------------------------------------------------------------------


def pandas_dayofweek(col: Column | str) -> Column:
    """F6: pandas ``.dt.dayofweek`` is Mon=0..Sun=6; Spark ``dayofweek`` is
    Sun=1..Sat=7 (reference: dags/transform_dim_dates.py:19). Shifted."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.dayofweek(c) + 5) % 7


def duration_days(end: Column | str, start: Column | str) -> Column:
    """F11: fractional-day duration ``(t2-t1).dt.total_seconds()/86400``
    (reference: dags/transform_fact_orders.py:33-34). NOT ``datediff``,
    which truncates to whole days."""
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    return (F.unix_timestamp(e) - F.unix_timestamp(s)) / 86400.0
