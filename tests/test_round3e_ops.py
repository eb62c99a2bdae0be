"""Round-3 batch 13: _msearch fused multi-query execution, _mget,
script query, wrapper query, terms-lookup.

Reference surface: the ES request APIs the reference's facade reaches
(/root/reference/asset/elasticsearch_reader/index.js pass-through bodies;
semantics from the ES docs), re-expressed as one fused segment scan
(msearch), broadcast semi joins (mget / terms-lookup), and Catalyst-compiled
script expressions."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.operators.relations import terms_lookup
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 600, partitions=4).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_e") / "plain")
    build_index(spark, corpus, d, num_segments=8, num_chunks=2)
    return InvertedIndex(spark, d)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


# ---------------------------------------------------------------------------
# msearch
# ---------------------------------------------------------------------------


MSEARCH_SPECS = [
    {"query": ["spark", "join"], "mode": "and", "k": 7},
    {"query": ["hash", "merge"], "mode": "or", "k": 5},
    {"query": ["table"], "mode": "and", "k": None},
    {"query": ["spark", "join", "merge"], "mode": "or", "min_should_match": 2, "k": 9},
    {"query": ["spark"], "mode": "and", "boosts": {"spark": 2.5}, "k": 6},
    {"query": ["spark"], "mode": "and", "must_not": ["join"], "k": 8},
]


def test_msearch_bit_identical_to_search(index):
    out = index.msearch(MSEARCH_SPECS)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, s in enumerate(MSEARCH_SPECS):
        alone = index.search(
            s["query"],
            k=s["k"],
            mode=s.get("mode", "and"),
            min_should_match=s.get("min_should_match"),
            boosts=s.get("boosts"),
            must_not=s.get("must_not"),
        )
        assert got.get(qid, []) == _rows(alone), f"query {qid} diverged"


def test_msearch_unsatisfiable_and_query_is_absent(index):
    out = index.msearch(
        [["spark"], ["spark", "zzzznotaterm"], ["join"]], k=4
    )
    qids = {r["query_id"] for r in out.collect()}
    assert 1 not in qids and {0, 2} <= qids


def test_msearch_plain_strings_and_default_k(index):
    out = index.msearch(["spark join", "hash"], k=3).collect()
    per = {}
    for r in out:
        per.setdefault(r["query_id"], []).append(r["doc_id"])
    assert len(per[0]) == 3 and len(per[1]) == 3


def test_msearch_empty(index):
    assert index.msearch([]).count() == 0
    assert index.msearch([[]]).count() == 0


def test_msearch_single_scan_plan(index):
    """The fused plan reads the segment table once — exactly one
    FlatMapGroupsInPandas (and one scan feeding it) for M queries."""
    plan = index.msearch(MSEARCH_SPECS)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1


# ---------------------------------------------------------------------------
# mget
# ---------------------------------------------------------------------------


def test_mget_found_and_missing(index, corpus):
    out = index.mget([3, 1, 10**9, 3], corpus)
    ids = [r["doc_id"] for r in out.collect()]
    assert ids == [1, 3]
    assert set(out.columns) == set(corpus.columns)


def test_mget_tombstoned_doc_not_found(spark, corpus, tmp_path_factory):
    from elasticsearch_assets_spark.index.tombstones import add_tombstones

    d = str(tmp_path_factory.mktemp("idx_e") / "tomb")
    build_index(spark, corpus, d, num_segments=4, num_chunks=1)
    add_tombstones(d, [5])
    idx = InvertedIndex(spark, d)
    ids = [r["doc_id"] for r in idx.mget([4, 5, 6], corpus).collect()]
    assert ids == [4, 6]


def test_mget_all_missing(index, corpus):
    assert index.mget([10**9], corpus).count() == 0


# ---------------------------------------------------------------------------
# script query
# ---------------------------------------------------------------------------


def test_script_query_filter_context(index, corpus):
    out = index.script_query(corpus, "doc_id % 5 = 0 AND length(text) > 0")
    assert out.count() == corpus.where("doc_id % 5 = 0 AND length(text) > 0").count()


def test_script_query_with_ranking_matches_search_filtered(index, corpus):
    got = index.script_query(
        corpus, "doc_id % 3 = 0", query=["spark", "join"], k=10, mode="or"
    )
    exp = index.search_filtered(
        ["spark", "join"], corpus.where("doc_id % 3 = 0"), k=10, mode="or"
    )
    assert _rows(got) == _rows(exp)


# ---------------------------------------------------------------------------
# wrapper query
# ---------------------------------------------------------------------------


def test_wrapper_query_decodes_and_delegates(index, corpus):
    q = "spark AND jo*"
    b64 = base64.b64encode(q.encode()).decode()
    got = index.search_wrapper(b64, corpus, k=8)
    exp = index.search_querystring(q, corpus, k=8)
    assert _rows(got) == _rows(exp)


# ---------------------------------------------------------------------------
# terms lookup
# ---------------------------------------------------------------------------


def test_terms_lookup_scalar_path(spark):
    lookup = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, tag string"
    )
    corpus = spark.createDataFrame(
        [(10, "alpha"), (11, "beta"), (12, "alpha")], "doc long, tag string"
    )
    out = terms_lookup(corpus, "tag", lookup, F.col("id") == 1, "tag")
    assert sorted(r["doc"] for r in out.collect()) == [10, 12]


def test_terms_lookup_array_path(spark):
    lookup = spark.createDataFrame(
        [(1, "a b c")], "id long, tags string"
    )
    corpus = spark.createDataFrame(
        [(10, "a"), (11, "z"), (12, "c")], "doc long, tag string"
    )
    out = terms_lookup(
        corpus, "tag", lookup, F.col("id") == 1, "split(tags, ' ')"
    )
    assert sorted(r["doc"] for r in out.collect()) == [10, 12]


def test_terms_lookup_missing_doc_matches_nothing(spark):
    lookup = spark.createDataFrame([(1, "a")], "id long, tag string")
    corpus = spark.createDataFrame([(10, "a")], "doc long, tag string")
    out = terms_lookup(corpus, "tag", lookup, F.col("id") == 99, "tag")
    assert out.count() == 0
