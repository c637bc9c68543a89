"""Shared DuckDB-oracle SQL fragments for decimal-exact numeric parity.

Split from operators/relational.py in round 11 so the agg/window/
time-series modules extracted from it (pure moves) can share these without
importing each other. Every cross-engine double sum accumulates in
DECIMAL(28,8) — see functions/scalar.py for the Spark-side twins and the
1-ulp divergence these exist to prevent.
"""

from __future__ import annotations


def _dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,8))) AS DOUBLE)"


def _dsum_exact(expr: str) -> str:
    # money-magnitude sums cross AS DECIMAL — the double cast diverges by
    # 1 ulp between engines above 2^53 (see functions/scalar.py)
    return f"SUM(CAST({expr} AS DECIMAL(28,8)))"


def _davg(expr: str) -> str:
    return f"{_dsum(expr)} / COUNT({expr})"
