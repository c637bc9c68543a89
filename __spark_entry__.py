"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real coverage lives in the package registry
(``e_commerce_data_warehouse_recommendation_system_spark.registry``);
this module only delegates, so adding an operator means registering it
once in the package and never touching this file.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from e_commerce_data_warehouse_recommendation_system_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by region — the Spark analog of the reference's headline
    dashboard rollup (reference: README.md:119 "revenue by region"):
    lineitem ⋈ orders shuffle join once, then broadcast dims, one agg.
    """
    return registry.queries()["q3_revenue_by_region"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys are rows-only checks."""
    return registry.oracles()
