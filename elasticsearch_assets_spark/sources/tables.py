"""Pluggable table IO — Parquet in the sandbox, Iceberg as a config swap.

SURVEY.md §7.3(6): no Iceberg jar ships with local PySpark 4.1.2, so every
read/write goes through this module. Production sets
``SPARK_GRAFT_TABLE_FORMAT=iceberg`` (and adds the runtime jar via
``--packages``); nothing else in the engine changes. Predicate pushdown,
partition pruning, and column pruning behave equivalently for the operations
we use (range/prefix predicates, projection).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_FORMAT = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def load_table(spark: SparkSession, path_or_name: str) -> DataFrame:
    if TABLE_FORMAT == "iceberg":
        return spark.read.format("iceberg").load(path_or_name)
    return spark.read.parquet(path_or_name)


def write_table(
    df: DataFrame,
    path_or_name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if TABLE_FORMAT == "iceberg":
        writer.format("iceberg").save(path_or_name)
    else:
        writer.parquet(path_or_name)


def load_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver-provided testdata tables."""
    return load_table(spark, os.path.join(sf_dir, f"{name}.parquet"))
