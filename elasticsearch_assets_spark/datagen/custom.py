"""User-supplied generator schemas (SURVEY.md §2.11 U2).

The reference's data generator accepts a user Node module exporting a
mocker-data-generator schema
(/root/reference/asset/elasticsearch_data_generator/index.js:9-29). The
Spark-native equivalent: the user supplies either

* a dict of column -> callable(ids: np.ndarray) -> array-like  (vectorized,
  deterministic from the id — the engine's determinism contract C7), or
* a callable(pdf: pd.DataFrame) -> pd.DataFrame taking the (id) frame.

Generation is `spark.range(n)` + `mapInPandas`, so it scales exactly like
the built-in corpora (no driver-side data, any target size).
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ColumnGen = Callable[[np.ndarray], "np.ndarray | list"]


def generator_df(
    spark: SparkSession,
    n: int,
    schema: "Mapping[str, ColumnGen] | Callable[[pd.DataFrame], pd.DataFrame]",
    out_schema: str,
    partitions: int = 8,
) -> DataFrame:
    """Deterministic synthetic DataFrame from a user schema.

    `out_schema` is the Spark DDL string for the produced columns (the user
    knows their types; no sampling pass needed).
    """
    base = spark.range(0, n, numPartitions=partitions)

    if callable(schema):
        fn_user = schema

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield fn_user(pdf.rename(columns={"id": "id"}))

    else:
        colgens = dict(schema)

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids = pdf["id"].to_numpy(dtype=np.int64)
                yield pd.DataFrame({c: g(ids) for c, g in colgens.items()})

    return base.mapInPandas(gen, schema=out_schema)
