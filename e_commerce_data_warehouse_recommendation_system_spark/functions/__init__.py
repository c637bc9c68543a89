"""Scalar function layer (SURVEY.md SS2.9) incl. pandas-parity wrappers."""

from e_commerce_data_warehouse_recommendation_system_spark.functions.scalar import (
    dec_avg,
    dec_avg_exact,
    dec_sum,
    dec_str,
    dec_sum_exact,
    dec_sum_str,
    duration_days,
    pandas_dayofweek,
    pandas_title,
    zfill,
)

__all__ = [
    "dec_avg",
    "dec_avg_exact",
    "dec_sum",
    "dec_str",
    "dec_sum_exact",
    "dec_sum_str",
    "duration_days",
    "pandas_dayofweek",
    "pandas_title",
    "zfill",
]
