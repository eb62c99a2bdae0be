"""ES|QL pipe compiler (query/esql.py): command semantics, expression
sugar, plan shape, and error contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.query.esql import _split_commas, _split_pipes, esql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_split_helpers():
    assert _split_pipes('FROM a | WHERE x == "p|q" | LIMIT 3') == [
        "FROM a", 'WHERE x == "p|q"', "LIMIT 3",
    ]
    assert _split_commas("a = f(x, y), b = g(z)") == ["a = f(x, y)", "b = g(z)"]
    assert _split_commas("a = 'x,y', b") == ["a = 'x,y'", "b"]


def test_where_eval_stats(events):
    out = esql(
        "FROM events | WHERE event_type == 'click'"
        " | STATS n = count(*), mx = max(value) BY user_id"
        " | SORT user_id",
        tables={"events": events},
    ).collect()
    brute: dict = {}
    for r in events.where(F.col("event_type") == "click").collect():
        n, mx = brute.get(r["user_id"], (0, float("-inf")))
        brute[r["user_id"]] = (n + 1, max(mx, r["value"]))
    assert {r["user_id"]: (r["n"], r["mx"]) for r in out} == brute
    assert [r["user_id"] for r in out] == sorted(brute)


def test_global_stats_and_rename_keep_drop(events):
    row = esql(
        "FROM events | STATS total = count(*)", tables={"events": events}
    ).collect()[0]
    assert row["total"] == events.count()
    out = esql(
        "FROM events | RENAME value AS v | KEEP event_id, v | LIMIT 5",
        tables={"events": events},
    )
    assert out.columns == ["event_id", "v"]
    assert out.count() == 5
    out2 = esql("FROM events | DROP props, value", tables={"events": events})
    assert "props" not in out2.columns and "value" not in out2.columns


def test_sort_directions_and_eval_chain(events):
    out = esql(
        "FROM events | EVAL v2 = value * 2, v3 = v2 + 1"
        " | SORT v3 DESC, event_id ASC | KEEP event_id, v3 | LIMIT 3",
        tables={"events": events},
    ).collect()
    brute = sorted(
        ((r["value"] * 2 + 1), r["event_id"]) for r in events.collect()
    )
    want = sorted(brute, key=lambda t: (-t[0], t[1]))[:3]
    assert [(r["v3"], r["event_id"]) for r in out] == want


def test_filter_pushdown_plan(spark, events):
    plan = esql(
        "FROM events | WHERE event_type == 'click' | KEEP event_id",
        spark=spark, sf_dir=SF,
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_type" in plan


def test_error_contracts(events):
    t = {"events": events}
    with pytest.raises(ValueError, match="must start with FROM"):
        esql("WHERE x = 1", tables=t)
    with pytest.raises(ValueError, match="unknown index"):
        esql("FROM nope", tables=t)
    with pytest.raises(ValueError, match="not supported"):
        esql("FROM events | SHOW INFO", tables=t)
    with pytest.raises(ValueError, match="unknown ES\\|QL command"):
        esql("FROM events | FOO bar", tables=t)
    with pytest.raises(ValueError, match="LIMIT needs an integer"):
        esql("FROM events | LIMIT ten", tables=t)
    with pytest.raises(ValueError, match="needs `name = expr`"):
        esql("FROM events | EVAL 3x = 1", tables=t)
    with pytest.raises(ValueError, match="at least one aggregation"):
        esql("FROM events | STATS BY user_id", tables=t)
    with pytest.raises(ValueError, match="bad SORT direction"):
        esql("FROM events | SORT value SIDEWAYS", tables=t)
    with pytest.raises(ValueError, match="RENAME needs"):
        esql("FROM events | RENAME value TO v", tables=t)


def test_eq_sugar_leaves_operators_alone(events):
    # == becomes =, but !=, <=, >= survive
    a = esql(
        "FROM events | WHERE value != 1.0 AND value >= 2.0 AND value <= 90.0"
        " | STATS n = count(*)",
        tables={"events": events},
    ).collect()[0]["n"]
    b = events.where("value <> 1.0 AND value >= 2.0 AND value <= 90.0").count()
    assert a == b


def test_grok_typed_extraction(spark, events):
    out = esql(
        "FROM events | GROK props '\"k\": %{NUMBER:k:int}'"
        " | KEEP event_id, k | SORT event_id | LIMIT 5",
        tables={"events": events},
    ).collect()
    import json

    want = {
        r["event_id"]: json.loads(r["props"])["k"]
        for r in events.orderBy("event_id").limit(5).collect()
    }
    assert {r["event_id"]: r["k"] for r in out} == want
    assert all(isinstance(r["k"], int) for r in out)


def test_grok_no_match_is_null(spark):
    df = spark.createDataFrame(
        [(1, "x=5"), (2, "no digits here")], "id long, s string"
    )
    out = {
        r["id"]: r["v"]
        for r in esql(
            "FROM t | GROK s 'x=%{INT:v:int}'", tables={"t": df}
        ).collect()
    }
    assert out == {1: 5, 2: None}


def test_dissect_anchored(spark):
    df = spark.createDataFrame(
        [(1, "a - b"), (2, "a - b - extra"), (3, "nope")],
        "id long, s string",
    )
    out = {
        r["id"]: (r["x"], r["y"])
        for r in esql(
            "FROM t | DISSECT s '%{x} - %{y}'", tables={"t": df}
        ).collect()
    }
    assert out[1] == ("a", "b")
    assert out[2] == ("a", "b - extra")  # last hole is greedy
    assert out[3] == (None, None)  # anchored: whole string must fit


def test_grok_dissect_errors(events):
    t = {"events": events}
    with pytest.raises(ValueError, match="unknown grok pattern"):
        esql("FROM events | GROK props '%{NOPE:x}'", tables=t)
    with pytest.raises(ValueError, match="unknown grok type"):
        esql("FROM events | GROK props '%{INT:x:complex}'", tables=t)
    with pytest.raises(ValueError, match="extracts no fields"):
        esql("FROM events | GROK props '%{INT}'", tables=t)
    with pytest.raises(ValueError, match="must be quoted"):
        esql("FROM events | DISSECT props %{x}", tables=t)
    with pytest.raises(ValueError, match="COMPLETION needs"):
        esql("FROM events | COMPLETION x WITH y", tables=t)
    with pytest.raises(ValueError, match="not supported"):
        esql("FROM events | SHOW INFO", tables=t)
    with pytest.raises(ValueError, match="RERANK needs"):
        esql("FROM events | RERANK x ON y", tables=t)


def test_lookup_join_left_semantics(spark):
    facts = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    out = {
        r["k"]: r["name"]
        for r in esql(
            "FROM facts | LOOKUP JOIN dim ON k",
            tables={"facts": facts, "dim": dim},
        ).collect()
    }
    assert out == {1: "a", 2: "b", 3: None}  # left join keeps unmatched
    with pytest.raises(ValueError, match="must exist on both sides"):
        esql("FROM facts | LOOKUP JOIN dim ON missing",
             tables={"facts": facts, "dim": dim})
    with pytest.raises(ValueError, match="LOOKUP needs"):
        esql("FROM facts | LOOKUP dim ON k",
             tables={"facts": facts, "dim": dim})


def test_mv_expand_outer(spark):
    df = spark.createDataFrame(
        [(1, [10, 20]), (2, []), (3, None)],
        "id long, xs array<int>",
    )
    out = sorted(
        (r["id"], r["xs"])
        for r in esql("FROM t | MV_EXPAND xs", tables={"t": df}).collect()
    )
    assert out == [(1, 10), (1, 20), (2, None), (3, None)]
    assert esql("FROM t | MV_EXPAND xs", tables={"t": df}).columns == ["id", "xs"]
    with pytest.raises(ValueError, match="does not exist"):
        esql("FROM t | MV_EXPAND nope", tables={"t": df})


def test_row_literal_source(spark, events):
    out = esql("ROW a = 1, b = 'x' | EVAL c = a + 1", spark=spark).collect()
    assert out == [(1, "x", 2)] or (
        out[0]["a"], out[0]["b"], out[0]["c"]
    ) == (1, "x", 2)
    # ROW also resolves spark from the tables dict
    out2 = esql("ROW z = 41 + 1", tables={"events": events}).collect()
    assert out2[0]["z"] == 42
    with pytest.raises(ValueError, match="ROW needs `name = expr`"):
        esql("ROW 1x = 2", spark=spark)


def test_enrich_policy_join(spark):
    facts = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 5.0)], "k long, v double"
    )
    pol = spark.createDataFrame(
        [(1, "gold", "x"), (2, "silver", "y")],
        "k long, tier string, junk string",
    )
    out = esql(
        "FROM facts | ENRICH pol ON k WITH tier",
        tables={"facts": facts, "pol": pol},
    )
    assert "junk" not in out.columns  # only the WITH fields project
    got = {r["k"]: r["tier"] for r in out.collect()}
    assert got == {1: "gold", 2: "silver", 3: None}
    with pytest.raises(ValueError, match="ENRICH needs"):
        esql("FROM facts | ENRICH pol", tables={"facts": facts, "pol": pol})
    with pytest.raises(ValueError, match="not in policy"):
        esql("FROM facts | ENRICH pol ON k WITH nope",
             tables={"facts": facts, "pol": pol})
    with pytest.raises(ValueError, match="both sides"):
        esql("FROM facts | ENRICH pol ON v WITH tier",
             tables={"facts": facts, "pol": pol})


def test_sample_deterministic(events):
    a = esql(
        "FROM events | SAMPLE 0.5 BY event_id | STATS n = count(*)",
        tables={"events": events},
    ).collect()[0]["n"]
    b = esql(
        "FROM events | SAMPLE 0.5 BY event_id | STATS n = count(*)",
        tables={"events": events},
    ).collect()[0]["n"]
    assert a == b  # replayable
    total = events.count()
    assert abs(a / total - 0.5) < 0.05  # calibrated
    assert esql(
        "FROM events | SAMPLE 0.0 BY event_id", tables={"events": events}
    ).count() == 0
    assert esql(
        "FROM events | SAMPLE 1.0 BY event_id", tables={"events": events}
    ).count() == total
    with pytest.raises(ValueError, match="probability"):
        esql("FROM events | SAMPLE 1.5 BY event_id", tables={"events": events})
    with pytest.raises(ValueError, match="SAMPLE needs"):
        esql("FROM events | SAMPLE 0.5", tables={"events": events})


def test_stats_per_agg_filter(events):
    out = esql(
        "FROM events"
        " | STATS clicks = count(*) WHERE event_type == 'click',"
        " errors = count(*) WHERE event_type == 'error',"
        " total = count(*)",
        tables={"events": events},
    ).collect()[0]
    assert out["clicks"] == events.where("event_type = 'click'").count()
    assert out["errors"] == events.where("event_type = 'error'").count()
    assert out["total"] == events.count()


def test_keep_wildcards_and_sort_nulls(spark, events):
    out = esql(
        "FROM events | KEEP event_*, value", tables={"events": events}
    )
    assert out.columns == ["event_id", "event_type", "value"]
    with pytest.raises(ValueError, match="matches nothing"):
        esql("FROM events | KEEP zz*", tables={"events": events})
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 1.0)], "id long, v double"
    )
    first = esql(
        "FROM t | SORT v DESC NULLS FIRST | KEEP id", tables={"t": df}
    ).collect()
    assert [r["id"] for r in first] == [2, 1, 3]
    last = esql(
        "FROM t | SORT v ASC NULLS LAST | KEEP id", tables={"t": df}
    ).collect()
    assert [r["id"] for r in last] == [3, 1, 2]


def test_match_fulltext_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "Spark JOIN tables fast"),
            (2, "spark alone here"),
            (3, "join without the other term"),
            (4, "spark and join together again"),
        ],
        "id long, text string",
    )
    out = sorted(
        r["id"]
        for r in esql(
            "FROM t | WHERE MATCH(text, 'spark join') | KEEP id",
            tables={"t": df},
        ).collect()
    )
    assert out == [1, 4]  # analyzed (lowercased), AND semantics
    # composes with structured predicates
    out2 = esql(
        "FROM t | WHERE MATCH(text, 'spark') AND id > 1 | KEEP id",
        tables={"t": df},
    ).collect()
    assert sorted(r["id"] for r in out2) == [2, 4]
    with pytest.raises(ValueError, match="analyzable term"):
        esql("FROM t | WHERE MATCH(text, '!!!')", tables={"t": df})


def test_from_multi_index_and_patterns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a string")
    b = spark.createDataFrame([(2, 9.5)], "id long, b double")
    t = {"logs-a": a, "logs-b": b, "metrics": a}
    out = esql("FROM logs-a,logs-b | SORT id", tables=t).collect()
    assert [(r["id"], r["a"], r["b"]) for r in out] == [
        (1, "x", None), (2, None, 9.5),
    ]
    pat = esql("FROM logs-* | STATS n = count(*)", tables=t).collect()
    assert pat[0]["n"] == 2
    with pytest.raises(ValueError, match="matches nothing"):
        esql("FROM zz-*", tables=t)
    with pytest.raises(ValueError, match="unknown index"):
        esql("FROM nope,logs-a", tables=t)


def test_bucket_time_fixed_and_calendar(events):
    # 6-hour fixed span: tz-free epoch floor
    out = esql(
        "FROM events | STATS n = count(*) BY h = BUCKET(ts, 6 hours) | SORT h",
        tables={"events": events},
    ).collect()
    brute: dict = {}
    for r in events.collect():
        ep = int(r["ts"].timestamp())
        brute[ep // 21600 * 21600] = brute.get(ep // 21600 * 21600, 0) + 1
    assert [r["n"] for r in out] == [
        brute[k] for k in sorted(brute)
    ]
    for r in out:
        assert r["h"].minute == 0 and r["h"].hour % 6 == 0
    # calendar unit with N=1 truncates exactly like date_trunc
    cal = esql(
        "FROM events | STATS n = count(*) BY d = BUCKET(ts, 1 day) | SORT d",
        tables={"events": events},
    )
    ref = (
        events.groupBy(F.date_trunc("day", "ts").alias("d"))
        .count().orderBy("d").collect()
    )
    assert [(r["d"], r["n"]) for r in cal.collect()] == [
        (r["d"], r["count"]) for r in ref
    ]


def test_bucket_numeric_and_errors(events):
    out = esql(
        "FROM events | STATS n = count(*) BY b = BUCKET(value, 50) | SORT b",
        tables={"events": events},
    ).collect()
    brute: dict = {}
    for r in events.collect():
        k = r["value"] // 50 * 50
        brute[k] = brute.get(k, 0) + 1
    assert {r["b"]: r["n"] for r in out} == brute
    # the 4-arg auto form is now supported (see test_round4c_ops); a
    # 3-arg call is still a shape error
    with pytest.raises(ValueError, match="BUCKET takes"):
        esql(
            "FROM events | STATS n = count(*) BY b = BUCKET(value, 10, 0)",
            tables={"events": events},
        )
    with pytest.raises(ValueError, match="fixed-width"):
        esql(
            "FROM events | STATS n = count(*) BY b = BUCKET(ts, 3 months)",
            tables={"events": events},
        )


def test_inlinestats_window(events):
    # argmax per group: INLINESTATS column usable downstream
    out = esql(
        "FROM events | INLINESTATS mx = max(value) BY event_type"
        " | WHERE value == mx | KEEP event_type, value",
        tables={"events": events},
    ).collect()
    ref = {
        r["event_type"]: r["mx"]
        for r in events.groupBy("event_type").agg(F.max("value").alias("mx")).collect()
    }
    assert {r["event_type"]: r["value"] for r in out} == ref
    # global (no BY) window
    g = esql(
        "FROM events | INLINESTATS tot = sum(value) | LIMIT 1 | KEEP tot",
        tables={"events": events},
    ).collect()
    assert abs(g[0]["tot"] - events.agg(F.sum("value")).head()[0]) < 1e-6
    # rows are KEPT (unlike STATS)
    n = esql(
        "FROM events | INLINESTATS m = avg(value) BY user_id",
        tables={"events": events},
    ).count()
    assert n == events.count()
    with pytest.raises(ValueError, match="plain columns"):
        esql(
            "FROM events | INLINESTATS m = max(value) BY d = BUCKET(ts, 1 day)",
            tables={"events": events},
        )


def test_fork_branches(events):
    out = esql(
        'FROM events | FORK (WHERE event_type == "click" | STATS n = count(*))'
        " (WHERE value > 100 | STATS n = count(*))"
        " (STATS n = count(*)) | SORT _fork",
        tables={"events": events},
    ).collect()
    n_click = events.where("event_type = 'click'").count()
    n_big = events.where("value > 100").count()
    assert [(r["_fork"], r["n"]) for r in out] == [
        ("fork1", n_click), ("fork2", n_big), ("fork3", events.count()),
    ]
    # heterogeneous branch schemas union by name with null fill
    het = esql(
        "FROM events | FORK (STATS n = count(*)) (STATS m = max(value))",
        tables={"events": events},
    ).collect()
    assert {r["_fork"]: (r["n"], r["m"]) for r in het} == {
        "fork1": (events.count(), None),
        "fork2": (None, events.agg(F.max("value")).head()[0]),
    }
    with pytest.raises(ValueError, match="at least two"):
        esql("FROM events | FORK (LIMIT 1)", tables={"events": events})
    with pytest.raises(ValueError, match="parenthesized"):
        esql("FROM events | FORK LIMIT 1 (LIMIT 2)", tables={"events": events})


def test_change_point(spark):
    # a clean step: 10 then 50 — detector must flag the first high bucket
    rows = [(i, 10.0 if i < 6 else 50.0) for i in range(12)]
    df = spark.createDataFrame(rows, "k int, v double")
    out = esql(
        "FROM t | CHANGE_POINT v ON k", tables={"t": df}
    ).orderBy("k").collect()
    assert len(out) == 12
    flagged = [r for r in out if r["type"] is not None]
    assert len(flagged) == 1
    assert flagged[0]["k"] == 6 and flagged[0]["type"] == "step_change"
    assert flagged[0]["pvalue"] == pytest.approx(40.0)
    with pytest.raises(ValueError, match="does not exist"):
        esql("FROM t | CHANGE_POINT nope ON k", tables={"t": df})
