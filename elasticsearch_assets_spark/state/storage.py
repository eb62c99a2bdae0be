"""Cached keyed state storage — the `elasticsearch_state_storage` API
(/root/reference/asset/elasticsearch_state_storage/api.js:6-33, config
schema.js:5-49) rebuilt on the keyed MERGE table.

The reference pairs an LRU cache with ES mget/mset (chunk_size 2500,
concurrency 10). In Spark the bulk path is declarative — mget becomes a
broadcast-semi/left join, mset an upsert — and the LRU survives as a small
driver-side cache for the single-key get/set convenience calls (the bulk
path never touches it; at scale state lives in the table and joins
executor-side).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from elasticsearch_assets_spark.sinks.keyed_table import KeyedParquetTable


class CachedStateStorage:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "_key",
        cache_size: int = 2_097_152,  # reference default, schema.js:7-10
        num_buckets: int = 64,
        persist: bool = True,
    ):
        self.spark = spark
        self.key = key
        self.persist = persist
        self.table = KeyedParquetTable(spark, path, key=key, num_buckets=num_buckets)
        self._lru: OrderedDict[Any, Row] = OrderedDict()
        self._cache_size = cache_size

    # -- bulk (the distributed path) ----------------------------------------
    def mset(self, df: DataFrame) -> None:
        """Upsert a keyed batch into the store (reference mset)."""
        self.table.upsert(df)
        # the driver LRU is NOT bulk-populated — same as the reference, whose
        # mset writes through to ES and only `set` touches the LRU

    def mget(self, keys: DataFrame | list) -> DataFrame:
        """Fetch present rows for a key set (reference mget): broadcast the
        (small) key list against the bucket-pruned table read."""
        if isinstance(keys, list):
            keys = self.spark.createDataFrame(
                [(k,) for k in keys], f"{self.key} string"
            )
        if not self.table.exists():
            return keys.select(self.key).limit(0)
        return self.table.read().join(
            F.broadcast(keys.select(self.key).distinct()), self.key, "left_semi"
        )

    def enrich(self, df: DataFrame, how: str = "left") -> DataFrame:
        """Join stored state onto a stream/batch of records by key — the
        reference's cache-enrichment pattern. State columns are suffixed
        `_state` on collision."""
        if not self.table.exists():
            return df
        state = self.table.read()
        clash = (set(df.columns) & set(state.columns)) - {self.key}
        for c in clash:
            state = state.withColumnRenamed(c, f"{c}_state")
        return df.join(state, self.key, how)

    def count(self) -> int:
        return self.table.read().count() if self.table.exists() else 0

    def delete(self, keys: DataFrame | list) -> None:
        if isinstance(keys, list):
            keys = self.spark.createDataFrame([(k,) for k in keys], f"{self.key} string")
        self.table.delete(keys)

    # -- single-key convenience (driver LRU in front, reference `get`/`set`) -
    def set(self, row: dict) -> None:
        k = row[self.key]
        self._lru[k] = Row(**row)
        self._lru.move_to_end(k)
        while len(self._lru) > self._cache_size:
            self._lru.popitem(last=False)
        if self.persist:
            self.table.upsert(self.spark.createDataFrame([Row(**row)]))

    def get(self, key: Any) -> Row | None:
        if key in self._lru:
            self._lru.move_to_end(key)
            return self._lru[key]
        if not self.table.exists():
            return None
        rows = (
            self.table.read().where(F.col(self.key) == F.lit(key)).limit(1).collect()
        )
        if not rows:
            return None
        self._lru[key] = rows[0]
        return rows[0]
