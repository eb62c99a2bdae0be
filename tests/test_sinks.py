"""Sink surface tests (SURVEY.md §2.1 S7/S8) with the reference's pinned
golden values (index_selector-spec.js:82-106, elasticsearch_bulk-spec.js:61-91)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from elasticsearch_assets_spark.sinks.bulk import route_by_key, split_bulk_array
from elasticsearch_assets_spark.sinks.index_selector import (
    assign_actions,
    with_target_index,
)
from elasticsearch_assets_spark.sinks.keyed_table import KeyedParquetTable


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# index selector
# ---------------------------------------------------------------------------


def test_weekly_index_pinned_golden_values(spark):
    # reference test/index_selector-spec.js:93-105 pins 2582/2582/2583/2584
    data = [
        Row(i=1, ts=_ts("2019-07-02T00:00:00.001+00:00")),
        Row(i=2, ts=_ts("2019-07-03T23:59:59.999+00:00")),
        Row(i=3, ts=_ts("2019-07-04T00:14:01.032+00:00")),
        Row(i=4, ts=_ts("2019-07-11T00:06:35.672+00:00")),
    ]
    df = spark.createDataFrame(data)
    out = (
        with_target_index(df, timeseries="weekly", index_prefix="weekly-test")
        .orderBy("i")
        .select("_index")
        .collect()
    )
    assert [r["_index"] for r in out] == [
        "weekly-test-2582",
        "weekly-test-2582",
        "weekly-test-2583",
        "weekly-test-2584",
    ]


@pytest.mark.parametrize(
    "granularity,expected",
    [
        ("daily", "idx-2019.07.02"),
        ("monthly", "idx-2019.07"),
        ("yearly", "idx-2019"),
    ],
)
def test_timeseries_granularities(spark, granularity, expected):
    df = spark.createDataFrame([Row(ts=_ts("2019-07-02T10:00:00+00:00"))])
    out = with_target_index(df, timeseries=granularity, index_prefix="idx").collect()
    assert out[0]["_index"] == expected


def test_static_index_and_trailing_dash_prefix(spark):
    df = spark.createDataFrame([Row(ts=_ts("2019-07-02T00:00:00+00:00"))])
    assert (
        with_target_index(df, index="fixed").collect()[0]["_index"] == "fixed"
    )
    # prefix already ending in '-' is not doubled (index.js:38-44)
    out = with_target_index(df, timeseries="yearly", index_prefix="p-").collect()
    assert out[0]["_index"] == "p-2019"


def test_assign_actions_id_precedence(spark):
    df = spark.createDataFrame([Row(uid="u1", val=2)])
    r = assign_actions(df, action="update", id_field="uid").collect()[0]
    assert (r["_action"], r["_id"]) == ("update", "u1")
    # no id source -> deterministic content hash (same content, same id)
    a = assign_actions(df, action="index").collect()[0]["_id"]
    b = assign_actions(df, action="index").collect()[0]["_id"]
    assert a == b and len(a) == 40
    with pytest.raises(ValueError):
        assign_actions(df, action="explode")


# ---------------------------------------------------------------------------
# bulk split + routing
# ---------------------------------------------------------------------------


def test_split_golden_101_19():
    # reference elasticsearch_bulk-spec.js:61-77: 120 plain docs, size 50
    data = [{"some": "data"} for _ in range(120)]
    chunks = split_bulk_array(data, 50)
    assert [len(c) for c in chunks] == [101, 19]


def test_split_no_split_at_or_under_2x():
    data = []
    for _ in range(50):
        data.extend([{"index": {}}, {"some": "data"}])
    chunks = split_bulk_array(data, 50)
    assert [len(c) for c in chunks] == [100]


def test_split_preserves_meta_doc_pairs():
    # reference elasticsearch_bulk-spec.js:79-91: size=2, delete has no doc
    data = [
        {"create": {}},
        {"some": "data"},
        {"update": {}},
        {"other": "data"},
        {"delete": {}},
        {"index": {}},
        {"final": "data"},
    ]
    chunks = split_bulk_array(data, 2)
    assert chunks == [data[:5], data[5:]]
    # no chunk may end with non-delete metadata
    for c in chunks:
        last = c[-1]
        assert not any(k in last for k in ("index", "create", "update"))


def test_route_by_key(spark):
    df = spark.createDataFrame(
        [Row(_id="abc", _index="i"), Row(_id="bxy", _index="i"), Row(_id="zzz", _index="i")]
    )
    routed = route_by_key(
        df, {"a": "c1", "b": "c2", "*": "cstar"}, index_col="_index", index_append=True
    ).orderBy("_id").collect()
    assert [r["_connection"] for r in routed] == ["c1", "c2", "cstar"]
    # index_append only applies to explicitly mapped selectors
    assert [r["_index"] for r in routed] == ["i-a", "i-b", "i"]


def test_route_without_fallback_is_null(spark):
    df = spark.createDataFrame([Row(_id="zzz")])
    out = route_by_key(df, {"a": "c1"}).collect()
    assert out[0]["_connection"] is None


# ---------------------------------------------------------------------------
# keyed table MERGE semantics
# ---------------------------------------------------------------------------


@pytest.fixture()
def ktable(spark, tmp_path):
    return KeyedParquetTable(spark, str(tmp_path / "kt"), key="_id", num_buckets=4)


def _rows(spark, *triples):
    return spark.createDataFrame(
        [Row(_id=k, a=a, b=b) for k, a, b in triples], "  _id string, a int, b string"
    )


def _snapshot(t):
    return {
        r["_id"]: (r["a"], r["b"])
        for r in t.read().select("_id", "a", "b").collect()
    }


def test_index_insert_or_replace(spark, ktable):
    ktable.index(_rows(spark, ("k1", 1, "x"), ("k2", 2, "y")))
    ktable.index(_rows(spark, ("k2", 20, "Y"), ("k3", 3, "z")))
    assert _snapshot(ktable) == {"k1": (1, "x"), "k2": (20, "Y"), "k3": (3, "z")}


def test_create_only_inserts_new(spark, ktable):
    ktable.create(_rows(spark, ("k1", 1, "x")))
    ktable.create(_rows(spark, ("k1", 99, "NO"), ("k2", 2, "y")))
    assert _snapshot(ktable) == {"k1": (1, "x"), "k2": (2, "y")}


def test_upsert_full_and_field_subset(spark, ktable):
    ktable.index(_rows(spark, ("k1", 1, "x"), ("k2", 2, "y")))
    ktable.upsert(_rows(spark, ("k2", 20, "IGNORED"), ("k3", 3, "z")), update_fields=["a"])
    snap = _snapshot(ktable)
    assert snap["k2"] == (20, "y")  # only field a updated
    assert snap["k3"] == (3, "z")  # unmatched row inserted whole
    assert snap["k1"] == (1, "x")


def test_update_touches_existing_only(spark, ktable):
    ktable.index(_rows(spark, ("k1", 1, "x")))
    ktable.update(_rows(spark, ("k1", 10, "X"), ("knew", 5, "n")))
    assert _snapshot(ktable) == {"k1": (10, "X")}


def test_delete_removes_keys_and_empty_buckets(spark, ktable):
    rows = [(f"k{i}", i, "v") for i in range(20)]
    ktable.index(_rows(spark, *rows))
    ktable.delete(spark.createDataFrame([Row(_id=f"k{i}") for i in range(19)]))
    assert _snapshot(ktable) == {"k19": (19, "v")}
    # deleting everything leaves an empty (but readable-as-absent) table
    ktable.delete(spark.createDataFrame([Row(_id="k19")]))
    assert not ktable.exists() or _snapshot(ktable) == {}


def test_merge_prunes_to_affected_buckets(spark, ktable):
    ktable.index(_rows(spark, *[(f"k{i}", i, "v") for i in range(50)]))
    upd = _rows(spark, ("k7", 700, "V"))
    buckets = ktable._affected_buckets(upd)
    assert len(buckets) == 1  # one key -> one bucket rewritten, not the table
    ktable.upsert(upd)
    assert _snapshot(ktable)["k7"] == (700, "V")
    assert _snapshot(ktable)["k8"] == (8, "v")


def test_update_exprs_scripted_increment(spark, ktable):
    """U1: the reference's Painless script case (`ctx._source.count += add`
    with script_params, index_selector-spec.js:245-290) as a MERGE update
    expression. Matched rows run the expression; non-listed columns keep
    target values; unmatched source rows are ignored by update() and
    inserted by upsert()."""
    ktable.index(_rows(spark, ("k1", 1, "x"), ("k2", 2, "y")))
    src = spark.createDataFrame(
        [Row(_id="k1", a=0, b="IGNORED", add=5), Row(_id="knew", a=7, b="n", add=1)],
        "_id string, a int, b string, add int",
    )
    ktable.update(src, update_exprs={"a": "t.a + s.add"})
    assert _snapshot(ktable) == {"k1": (6, "x"), "k2": (2, "y")}

    ktable.upsert(src, update_exprs={"a": "t.a + s.add"})
    snap = _snapshot(ktable)
    assert snap["k1"] == (11, "x")  # scripted again: 6 + 5
    assert snap["k2"] == (2, "y")  # untouched
    assert snap["knew"] == (7, "n")  # unmatched source row inserted whole


def test_update_exprs_with_coalesce_default(spark, ktable):
    """script with a missing-field default: coalesce(t.a, 0) + s.add."""
    ktable.index(
        spark.createDataFrame(
            [Row(_id="k1", a=None, b="x")], "_id string, a int, b string"
        )
    )
    src = spark.createDataFrame([Row(_id="k1", add=3)], "_id string, add int")
    ktable.update(src, update_exprs={"a": "coalesce(t.a, 0) + s.add"})
    assert _snapshot(ktable) == {"k1": (3, "x")}


# ---------------------------------------------------------------------------
# merge strictness (ADVICE round 2: typo'd update field must fail loudly)
# ---------------------------------------------------------------------------


def test_update_exprs_unknown_column_raises(spark, tmp_path):
    t = KeyedParquetTable(spark, str(tmp_path / "kt"), key="_id", num_buckets=4)
    t.append(spark.createDataFrame([(1, 10)], "_id long, count long"))
    src = spark.createDataFrame([(1, 5)], "_id long, add long")
    with pytest.raises(ValueError, match="not updatable"):
        t.upsert(src, update_exprs={"cuont": "t.count + s.add"})  # typo
    with pytest.raises(ValueError, match="not updatable"):
        t.update(src, update_exprs={"_id": "s._id"})  # key not updatable


def test_update_fields_unknown_source_column_raises(spark, tmp_path):
    t = KeyedParquetTable(spark, str(tmp_path / "kt"), key="_id", num_buckets=4)
    t.append(spark.createDataFrame([(1, 10)], "_id long, count long"))
    src = spark.createDataFrame([(1, 5)], "_id long, count long")
    with pytest.raises(ValueError, match="not source"):
        t.upsert(src, update_fields=["cuont"])


def test_upsert_all_fields_tolerates_extra_source_columns(spark, tmp_path):
    """Derived-from-source exprs (update_fields=None) stay lenient: extra
    source columns are legitimate script params, not typos."""
    t = KeyedParquetTable(spark, str(tmp_path / "kt"), key="_id", num_buckets=4)
    t.append(spark.createDataFrame([(1, 10)], "_id long, count long"))
    src = spark.createDataFrame([(1, 99, 5)], "_id long, count long, extra long")
    t.upsert(src)  # must not raise
    rows = t.read().collect()
    assert [(r["_id"], r["count"]) for r in rows] == [(1, 99)]
