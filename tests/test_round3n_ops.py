"""Round-3 batch 22: term-range queries, parent_id, msearch templates,
temperature mixture math, deterministic upsampling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.operators.relations import parent_id
from elasticsearch_assets_spark.operators.sampling import (
    temperature_rates,
    upsample,
)
from elasticsearch_assets_spark.query.engine import InvertedIndex

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_n") / "i")
    build_index(spark, pages_df(spark, 600, partitions=4), d,
                num_segments=4, num_chunks=1)
    return InvertedIndex(spark, d)


def test_term_range_equals_or_of_expansion(index):
    terms = [
        r["term"] for r in index.stats.collect()
        if "so" <= r["term"] <= "sz"
    ]
    assert terms
    a = [
        (r["doc_id"], r["score"])
        for r in index.search_term_range("so", "sz", k=None).collect()
    ]
    b = [
        (r["doc_id"], r["score"])
        for r in index.search(sorted(terms), k=None, mode="or").collect()
    ]
    assert a == b and len(a) > 0
    # exclusive bounds shrink the expansion
    excl = index.search_term_range(
        terms[0], terms[-1], include_lower=False, include_upper=False, k=None
    )
    incl = index.search_term_range(terms[0], terms[-1], k=None)
    assert excl.count() <= incl.count()
    assert index.search_term_range("zzza", "zzzb", k=None).count() == 0
    with pytest.raises(ValueError, match="lo <= hi"):
        index.search_term_range("b", "a")


def test_msearch_template_matches_direct(index):
    out = index.msearch_template([
        ({"query": "spark {{x}}", "mode": "and", "k": 4}, {"x": "join"}),
        ({"query": "{{t}}", "mode": "or", "k": 3}, {"t": "table"}),
    ])
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    a = [(r["doc_id"], r["score"])
         for r in index.search(["spark", "join"], k=4, mode="and").collect()]
    b = [(r["doc_id"], r["score"])
         for r in index.search(["table"], k=3, mode="or").collect()]
    assert got[0] == a and got[1] == b
    with pytest.raises(KeyError, match="unbound"):
        index.msearch_template([({"query": "{{nope}}"}, {})])


def test_parent_id_filter(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    key = li.agg(F.min("l_orderkey")).head()[0]
    out = parent_id(li, "l_orderkey", key)
    assert out.count() == li.where(F.col("l_orderkey") == key).count() > 0
    assert out.where(F.col("l_orderkey") != key).count() == 0


def test_temperature_rates_math(spark):
    acct = spark.createDataFrame(
        [("en", 9000), ("de", 900), ("fr", 100)], "lang string, toks long"
    )
    rows = {
        r["lang"]: r
        for r in temperature_rates(acct, "lang", "toks", 0.5, 1000).collect()
    }
    z = math.sqrt(9000) + math.sqrt(900) + math.sqrt(100)
    for lang, n in (("en", 9000), ("de", 900), ("fr", 100)):
        w = math.sqrt(n) / z
        assert rows[lang]["weight"] == pytest.approx(w, rel=1e-12)
        assert rows[lang]["target_tokens"] == pytest.approx(w * 1000, rel=1e-12)
        assert rows[lang]["rate"] == pytest.approx(w * 1000 / n, rel=1e-12)
    # tau=0 -> uniform; tau=1 -> natural proportions
    u = {r["lang"]: r["weight"]
         for r in temperature_rates(acct, "lang", "toks", 0.0, 1000).collect()}
    assert all(v == pytest.approx(1 / 3) for v in u.values())
    nat = {r["lang"]: r["weight"]
           for r in temperature_rates(acct, "lang", "toks", 1.0, 1000).collect()}
    assert nat["en"] == pytest.approx(0.9)
    with pytest.raises(ValueError, match="tau"):
        temperature_rates(acct, "lang", "toks", -1, 1000)
    with pytest.raises(ValueError, match="token_budget"):
        temperature_rates(acct, "lang", "toks", 1, 0)


def test_upsample_deterministic_and_calibrated(spark):
    n = 4000
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(n)],
        "doc_id long, lang string",
    )
    rates = {"en": 2.5, "fr": 0.4}
    a = sorted(
        (r["doc_id"], r["copy"])
        for r in upsample(df, "lang", rates).collect()
    )
    b = sorted(
        (r["doc_id"], r["copy"])
        for r in upsample(df, "lang", rates).collect()
    )
    assert a == b  # replayable
    from collections import Counter

    per_doc = Counter(d for d, _ in a)
    en_copies = sum(c for d, c in per_doc.items() if d % 2 == 0)
    fr_copies = sum(c for d, c in per_doc.items() if d % 2 == 1)
    assert en_copies / (n / 2) == pytest.approx(2.5, abs=0.1)
    assert fr_copies / (n / 2) == pytest.approx(0.4, abs=0.1)
    # en docs emit 2 or 3 copies; fr docs 0 or 1; copy index is 0-based
    assert all(c in (2, 3) for d, c in per_doc.items() if d % 2 == 0)
    assert all(c == 1 for d, c in per_doc.items() if d % 2 == 1)
    assert {c for d, c in a if d % 2 == 0} <= {0, 1, 2}
    with pytest.raises(ValueError, match="negative rate"):
        upsample(df, "lang", {"en": -1})


def test_downsample_rollup(spark):
    from elasticsearch_assets_spark.operators.transforms import downsample

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = downsample(ev, "ts", "day", ["event_type"], ["value"]).collect()
    brute: dict = {}
    for r in ev.collect():
        key = (r["ts"].date(), r["event_type"])
        mn, mx, s, c = brute.get(key, (float("inf"), float("-inf"), 0.0, 0))
        brute[key] = (min(mn, r["value"]), max(mx, r["value"]),
                      s + r["value"], c + 1)
    assert len(out) == len(brute)
    for r in out:
        key = (r["tbucket"].date(), r["event_type"])
        mn, mx, s, c = brute[key]
        assert r["value_min"] == mn and r["value_max"] == mx
        assert r["value_sum"] == pytest.approx(s, rel=1e-12)
        assert r["value_value_count"] == c
    with pytest.raises(ValueError, match="at least one metric"):
        downsample(ev, "ts", "day", ["event_type"], [])


def test_balanced_shards_snake(spark):
    from elasticsearch_assets_spark.operators.packing import balanced_shards

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = balanced_shards(docs, 4).collect()
    assert {r["shard"] for r in out} == {0, 1, 2, 3}
    # balance: shard token totals within a few percent of each other
    totals: dict = {}
    for r in out:
        totals[r["shard"]] = totals.get(r["shard"], 0) + r["n_tokens"]
    lo, hi = min(totals.values()), max(totals.values())
    assert (hi - lo) / hi < 0.05
    # snake order: the 4 largest docs land on 0,1,2,3 and the next 4
    # reverse to 3,2,1,0
    ranked = sorted(out, key=lambda r: (-r["n_tokens"], r["doc_id"]))
    assert [r["shard"] for r in ranked[:8]] == [0, 1, 2, 3, 3, 2, 1, 0]
    with pytest.raises(ValueError, match="n_shards"):
        balanced_shards(docs, 0)
