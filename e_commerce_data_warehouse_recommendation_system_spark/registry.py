"""Single inventory of every driver-visible query.

Each operator/query from SURVEY.md SS2 registers itself here with an optional
DuckDB oracle SQL string. ``__spark_entry__.queries()`` / ``oracle_sql()``
and ``bench.py`` all read from this registry, so coverage is declared in
exactly one place.

Contract notes (see /root/repo/__spark_entry__.py docstring):
- query callables take ``(spark, sf_dir)`` and return a DataFrame;
- oracle SQL runs in DuckDB against views named after the testdata tables;
- column names must match between the two (the driver sorts columns by name
  before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_BENCH: list[str] = []


def register(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator: register a query, optionally its DuckDB oracle SQL, and
    whether it is a headline benchmark query."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if bench:
            _BENCH.append(name)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def bench_queries() -> list[str]:
    _load_all()
    return list(_BENCH)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import e_commerce_data_warehouse_recommendation_system_spark.plans.queries  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.plans.etl  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.operators.relational  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.operators.dedup  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.operators.similarity  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.operators.text  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.operators.multimodal  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.operators.quality  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.recommend.queries  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.streaming.queries  # noqa: F401
    import e_commerce_data_warehouse_recommendation_system_spark.sources.writer_queries  # noqa: F401

    _LOADED = True
