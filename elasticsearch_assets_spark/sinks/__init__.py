"""Sink surface (SURVEY.md §2.1 S7/S8): declarative Spark re-expression of the
reference's elasticsearch_index_selector + elasticsearch_bulk operators."""

from elasticsearch_assets_spark.sinks.index_selector import (
    assign_actions,
    timeseries_index_expr,
    with_target_index,
)
from elasticsearch_assets_spark.sinks.bulk import split_bulk_array, route_by_key
from elasticsearch_assets_spark.sinks.keyed_table import KeyedParquetTable

__all__ = [
    "assign_actions",
    "timeseries_index_expr",
    "with_target_index",
    "split_bulk_array",
    "route_by_key",
    "KeyedParquetTable",
]
