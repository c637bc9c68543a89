"""read_jdbc option plumbing, column guard, and the two-phase surrogate key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from e_commerce_data_warehouse_recommendation_system_spark.operators.relational import (
    select_or_default,
    surrogate_key,
)
from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import read_jdbc


def test_read_jdbc_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, "jdbc:postgresql://x/db", "t", partition_column="id")


def test_select_or_default_existing_and_missing(spark):
    df = spark.createDataFrame([(1, "a")], schema="k int, v string")
    out = select_or_default(df, "v", "dflt", alias="v2")
    out = select_or_default(out, "missing", "dflt", alias="m")
    (row,) = out.collect()
    assert (row.v2, row.m) == ("a", "dflt")


def test_surrogate_key_matches_global_row_number(spark):
    # 1000 shuffled keys across 8 partitions; two-phase result must equal
    # ROW_NUMBER() OVER (ORDER BY k) exactly.
    keys = [(k,) for k in range(5000, 6000)]
    df = spark.createDataFrame(keys, schema="k bigint").repartition(8)
    got = {
        r.k: r.sk for r in surrogate_key(df, "k", "sk", buckets=8).collect()
    }
    expected = {
        r.k: r.sk
        for r in df.select(
            "k", F.row_number().over(Window.orderBy("k")).alias("sk")
        ).collect()
    }
    assert got == expected
