"""Session-5 batch tests: runtime fields (ES runtime_mappings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.sources.reader import (
    DateReader,
    ReaderConfig,
    apply_runtime_mappings,
)

SF = "/root/testdata/sf0.001"


def test_runtime_field_query_and_chain(spark):
    cfg = ReaderConfig(
        path=f"{SF}/events.parquet",
        date_field_name="ts",
        query="vk:high",
        runtime_mappings={
            "vk": "CASE WHEN value >= 100 THEN 'high' ELSE 'low' END",
            "is_high": "vk = 'high'",  # chained: references a runtime field
        },
    )
    rows = DateReader(spark, cfg).dataframe().collect()
    raw = spark.read.parquet(f"{SF}/events.parquet")
    expect = raw.where("value >= 100").count()
    assert len(rows) == expect and expect > 0
    assert all(r["vk"] == "high" and r["is_high"] is True for r in rows)


def test_runtime_field_shadowing_and_sort(spark):
    # ES runtime fields may shadow mapped fields; sortable like any column
    cfg = ReaderConfig(
        path=f"{SF}/events.parquet",
        date_field_name="ts",
        fields=["event_id", "value"],
        runtime_mappings={"value": "-value"},
    )
    out = DateReader(spark, cfg).dataframe()
    raw = spark.read.parquet(f"{SF}/events.parquet")
    got = {r["event_id"]: r["value"] for r in out.collect()}
    want = {r["event_id"]: -r["value"] for r in raw.collect()}
    assert got == want


def test_runtime_field_pushdown_preserved(spark):
    # a predicate on a MAPPED column keeps its parquet pushdown even when
    # runtime fields are present
    cfg = ReaderConfig(
        path=f"{SF}/events.parquet",
        date_field_name="ts",
        query="vk:high AND event_type:click",
        runtime_mappings={
            "vk": "CASE WHEN value >= 100 THEN 'high' ELSE 'low' END"
        },
    )
    plan = DateReader(spark, cfg).dataframe()._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "event_type" in plan.split("PushedFilters")[1][:300]


def test_runtime_field_name_validation():
    with pytest.raises(ValueError, match="identifier"):
        ReaderConfig(
            path=f"{SF}/events.parquet",
            runtime_mappings={"bad name": "1"},
        )


def test_apply_runtime_mappings_order(spark):
    df = spark.range(3)
    out = apply_runtime_mappings(
        df, {"a": "id * 2", "b": "a + 1"}
    ).orderBy("id").collect()
    assert [(r["a"], r["b"]) for r in out] == [(0, 1), (2, 3), (4, 5)]
