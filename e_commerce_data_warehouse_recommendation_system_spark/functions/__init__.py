"""Scalar function layer (SURVEY.md SS2.9) incl. pandas-parity wrappers."""

from e_commerce_data_warehouse_recommendation_system_spark.functions.scalar import (
    dec_avg,
    dec_sum,
    duration_days,
    pandas_dayofweek,
    pandas_title,
    zfill,
)

__all__ = [
    "dec_avg",
    "dec_sum",
    "duration_days",
    "pandas_dayofweek",
    "pandas_title",
    "zfill",
]
