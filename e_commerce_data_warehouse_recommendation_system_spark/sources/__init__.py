"""Sources and sinks (SURVEY.md SS2.1, S1-S16)."""

from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import (
    SCHEMAS,
    TABLES,
    calendar_frame,
    describe_table,
    list_tables,
    load_table,
    prepare,
    read_csv,
    read_jdbc,
    read_json,
    register_views,
)

__all__ = [
    "SCHEMAS",
    "TABLES",
    "calendar_frame",
    "describe_table",
    "list_tables",
    "load_table",
    "prepare",
    "read_csv",
    "read_jdbc",
    "read_json",
    "register_views",
]
