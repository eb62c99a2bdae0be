"""Ingest pipelines: processor-chain compilation, failure semantics,
simulate. Reference contract: ES _ingest/pipeline processor docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.sinks.ingest import (
    ERROR_COL,
    run_pipeline,
    simulate_pipeline,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("a", "Hello World", "42", "2024-01-05"),
         ("b", "Spark, SQL", "nope", "2024-02-30")],
        "id string, txt string, num string, day string",
    )


def test_set_copy_override_and_if(spark, df):
    out = {r["id"]: r for r in run_pipeline(df, [
        {"set": {"field": "tag", "value": "x"}},
        {"set": {"field": "txt2", "copy_from": "txt"}},
        {"set": {"field": "tag", "value": "y", "if": "id = 'b'"}},
    ]).collect()}
    assert out["a"]["tag"] == "x" and out["b"]["tag"] == "y"
    assert out["a"]["txt2"] == "Hello World"


def test_rename_remove_validation(spark, df):
    with pytest.raises(ValueError, match="does not exist"):
        run_pipeline(df, [{"rename": {"field": "zzz", "target_field": "w"}}])
    # ignore_missing skips silently
    out = run_pipeline(df, [
        {"rename": {"field": "zzz", "target_field": "w",
                    "ignore_missing": True}},
        {"remove": {"field": "day"}},
    ])
    assert "day" not in out.columns and "w" not in out.columns
    with pytest.raises(ValueError, match="already exists"):
        run_pipeline(df, [{"rename": {"field": "txt", "target_field": "num"}}])


def test_convert_failure_modes(spark, df):
    tagged = run_pipeline(df, [{"convert": {"field": "num", "type": "long"}}])
    rows = {r["id"]: r for r in tagged.collect()}
    assert rows["a"]["num"] == 42 and rows["a"][ERROR_COL] is None
    assert rows["b"]["num"] is None and "convert" in rows["b"][ERROR_COL]
    dropped = run_pipeline(
        df, [{"convert": {"field": "num", "type": "long"}}],
        on_failure="drop",
    )
    assert [r["id"] for r in dropped.collect()] == ["a"]
    assert ERROR_COL not in dropped.columns
    with pytest.raises(ValueError, match="pipeline failed"):
        run_pipeline(
            df, [{"convert": {"field": "num", "type": "long"}}],
            on_failure="fail",
        ).collect()


def test_date_parse_and_failure_tag(spark, df):
    out = {r["id"]: r for r in run_pipeline(df, [
        {"date": {"field": "day", "formats": ["yyyy-MM-dd"]}},
    ]).collect()}
    assert out["a"]["@timestamp"] is not None
    # 2024-02-30 is not a date -> tagged, null timestamp
    assert out["b"]["@timestamp"] is None
    assert "date" in out["b"][ERROR_COL]


def test_split_join_gsub_grok(spark, df):
    out = {r["id"]: r for r in run_pipeline(df, [
        {"split": {"field": "txt", "separator": ", ",
                   "target_field": "parts"}},
        {"join": {"field": "parts", "separator": "|",
                  "target_field": "joined"}},
        {"gsub": {"field": "txt", "pattern": "[lo]", "replacement": "*",
                  "target_field": "starred"}},
        {"grok": {"field": "txt", "pattern": "%{WORD:w1}"}},
    ]).collect()}
    assert out["b"]["parts"] == ["Spark", "SQL"]
    assert out["b"]["joined"] == "Spark|SQL"
    assert out["a"]["starred"] == "He*** W*r*d"
    assert out["a"]["w1"] == "Hello"
    with pytest.raises(ValueError, match="portable"):
        run_pipeline(df, [{"gsub": {"field": "txt", "pattern": "x",
                                    "replacement": "$1"}}])


def test_drop_and_unknown_processor(spark, df):
    out = run_pipeline(df, [{"drop": {"if": "id = 'a'"}}])
    assert [r["id"] for r in out.collect()] == ["b"]
    with pytest.raises(ValueError, match="unknown ingest processor"):
        run_pipeline(df, [{"frobnicate": {}}])


def test_simulate_roundtrip(spark):
    docs = [{"msg": "u=7 t=click"}, {"msg": "u=9 t=view"}]
    out = simulate_pipeline(spark, docs, [
        {"dissect": {"field": "msg", "pattern": "u=%{uid} t=%{etype}"}},
        {"convert": {"field": "uid", "type": "integer"}},
    ])
    assert out[0]["uid"] == 7 and out[0]["etype"] == "click"
    assert out[1]["uid"] == 9 and out[1]["etype"] == "view"
