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


def test_json_schema_required_and_error_tag(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 3}'), ("b", "{not json"), ("c", None)],
        "id string, payload string",
    )
    with pytest.raises(ValueError, match="json"):
        run_pipeline(df, [{"json": {"field": "payload"}}])
    out = {r["id"]: r for r in run_pipeline(df, [
        {"json": {"field": "payload", "schema": "k INT",
                  "target_field": "o"}},
    ]).collect()}
    assert out["a"]["o"]["k"] == 3
    assert out["b"]["o"] is None and "json" in out["b"][ERROR_COL]
    assert out["c"][ERROR_COL] is None  # null input is not a parse error


def test_kv_exclude_and_map_target(spark):
    df = spark.createDataFrame([("a", "x=1&y=2&z=3")], "id string, qs string")
    out = run_pipeline(df, [
        {"kv": {"field": "qs", "field_split": "&", "value_split": "=",
                "exclude_keys": ["y"], "target_field": "m"}},
    ]).collect()[0]
    assert out["m"] == {"x": "1", "z": "3"}


def test_uri_parts_missing_components_null(spark):
    df = spark.createDataFrame(
        [("a", "https://example.com/plain")], "id string, url string",
    )
    r = run_pipeline(df, [{"uri_parts": {"field": "url"}}]).collect()[0]
    assert r["url_domain"] == "example.com" and r["url_path"] == "/plain"
    for c in ("url_port", "url_query", "url_fragment", "url_user_info",
              "url_extension"):
        assert r[c] is None, c


def test_registered_domain_edges(spark):
    df = spark.createDataFrame(
        [("a", "co.uk"), ("b", "site.co.uk"), ("c", "localhost")],
        "id string, host string",
    )
    out = {r["id"]: r for r in run_pipeline(
        df, [{"registered_domain": {"field": "host"}}]
    ).collect()}
    # host IS the suffix: tld set, no registered domain / subdomain
    assert out["a"]["url_top_level_domain"] == "co.uk"
    assert out["a"]["url_registered_domain"] is None
    assert out["b"]["url_registered_domain"] == "site.co.uk"
    assert out["b"]["url_subdomain"] is None
    # unknown suffix: everything null
    assert out["c"]["url_top_level_domain"] is None
    assert out["c"]["url_registered_domain"] is None


def test_bytes_and_csv_error_tags(spark):
    df = spark.createDataFrame(
        [("a", "1.5kb", "1,2,3"), ("b", "weird", "only,two")],
        "id string, sz string, line string",
    )
    out = {r["id"]: r for r in run_pipeline(df, [
        {"bytes": {"field": "sz", "target_field": "n"}},
        {"csv": {"field": "line", "target_fields": ["c1", "c2", "c3"]}},
    ]).collect()}
    assert out["a"]["n"] == 1536 and out["a"]["c3"] == "3"
    assert out["b"]["n"] is None
    # first failing processor wins the tag (ES aborts the doc's pipeline)
    assert "bytes" in out["b"][ERROR_COL]
    assert out["b"]["c3"] is None  # short line -> NULL, not an index error
    with pytest.raises(ValueError, match="quote"):
        run_pipeline(df, [{"csv": {"field": "line", "quote": '"',
                                   "target_fields": ["a"]}}])


def test_date_index_name_bad_rounding(spark, df):
    with pytest.raises(ValueError, match="date_rounding"):
        run_pipeline(df, [{"date_index_name": {
            "field": "day", "date_rounding": "q"}}])


def test_append_promote_extend_dedup(spark):
    df = spark.createDataFrame([("a", "t0")], "id string, tag string")
    r1 = run_pipeline(df, [
        {"append": {"field": "tag", "value": "t1"}},
        {"append": {"field": "tag", "value": ["t0", "t2"],
                    "allow_duplicates": False}},
        {"append": {"field": "fresh", "value": "n"}},
    ]).collect()[0]
    assert r1["tag"] == ["t0", "t1", "t2"]
    assert r1["fresh"] == ["n"]


def test_user_agent_other_fallback(spark):
    df = spark.createDataFrame([("a", "curl/8.4.0")], "id string, ua string")
    r = run_pipeline(df, [{"user_agent": {"field": "ua"}}]).collect()[0]
    assert r["user_agent_name"] == "Other"
    assert r["user_agent_version"] is None
    assert r["user_agent_os"] == "Other"
    assert r["user_agent_device"] == "Desktop"
