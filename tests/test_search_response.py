"""Multi-section response composition (round-4 verdict item #6).

search_response returns hits + aggs + suggest + highlight + total from
ONE request body as a dict of frames, the query side scanning once (the
post_filter one-scan pattern generalized). Every section must be
row-identical to its single-section spelling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.query.dsl import (
    aggs_dsl,
    search_dsl,
    search_response,
    suggest_dsl,
)
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    corpus = (
        pages_df(spark, 400, partitions=4)
        .withColumn("lang", F.expr("CASE WHEN doc_id % 3 = 0 THEN 'en' "
                                   "WHEN doc_id % 3 = 1 THEN 'de' "
                                   "ELSE 'fr' END"))
        .withColumn("n_chars", F.length("text"))
        .cache()
    )
    d = str(tmp_path_factory.mktemp("resp") / "idx")
    build_index(spark, corpus, d, num_segments=4, num_chunks=1)
    return InvertedIndex(spark, d), corpus


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_hits_aggs_total_in_one_body(setup):
    idx, corpus = setup
    body = {
        "query": {"match": {"text": "data"}},
        "size": 10,
        "track_total_hits": True,
        "aggs": {
            "bylang": {
                "terms": {"field": "lang"},
                "aggs": {"chars": {"avg": {"field": "n_chars"}}},
            }
        },
    }
    resp = search_response(idx, body, corpus)
    assert set(resp) == {"hits", "total", "aggs:bylang"}
    # hits == plain search_dsl page
    exp_hits = search_dsl(
        idx, {"query": body["query"], "size": 10}, corpus
    )
    assert _rows(resp["hits"]) == _rows(exp_hits)
    # total == full match count
    matched = search_dsl(idx, {"query": body["query"], "size": None}, corpus)
    assert _rows(resp["total"]) == [(matched.count(), "eq")]
    # aggs == aggs_dsl over the SAME match set
    exp_aggs = aggs_dsl(body["aggs"], matched, corpus)["bylang"]
    assert _rows(resp["aggs:bylang"]) == _rows(exp_aggs)


def test_capped_total_and_min_score(setup):
    idx, corpus = setup
    body = {
        "query": {"match": {"text": "data"}},
        "size": 5,
        "min_score": 0.01,
        "track_total_hits": 3,
    }
    resp = search_response(idx, body, corpus)
    t = resp["total"].collect()[0]
    matched = search_dsl(
        idx,
        {"query": body["query"], "size": None, "min_score": 0.01},
        corpus,
    )
    n = matched.count()
    if n > 3:
        assert (t["total_hits"], t["relation"]) == (3, "gte")
    else:
        assert (t["total_hits"], t["relation"]) == (n, "eq")
    assert _rows(resp["hits"]) == _rows(
        search_dsl(idx, {"query": body["query"], "size": 5,
                         "min_score": 0.01}, corpus)
    )


def test_highlight_rides_the_hit_page(setup):
    idx, corpus = setup
    body = {
        "query": {"match": {"text": "data"}},
        "size": 5,
        "highlight": {"fields": {"text": {"fragment_size": 60}}},
        "aggs": {"bylang": {"terms": {"field": "lang"}}},
    }
    resp = search_response(idx, body, corpus)
    exp = search_dsl(
        idx,
        {"query": body["query"], "size": 5,
         "highlight": body["highlight"]},
        corpus,
    )
    assert _rows(resp["hits"]) == _rows(exp)
    assert "aggs:bylang" in resp


def test_suggest_composes_with_query(setup):
    idx, corpus = setup
    body = {
        "query": {"match": {"text": "data"}},
        "size": 5,
        "suggest": {"fix": {"text": "dta", "term": {"max_edits": 2}}},
    }
    resp = search_response(idx, body, corpus)
    assert set(resp) == {"hits", "suggest:fix"}
    exp = suggest_dsl(idx, body["suggest"])["fix"]
    assert _rows(resp["suggest:fix"]) == _rows(exp)
    # suggest-only body works too (no query side)
    only = search_response(idx, {"suggest": body["suggest"]})
    assert set(only) == {"suggest:fix"}


def test_agg_tree_section_keys(setup):
    idx, corpus = setup
    resp = search_response(
        idx,
        {
            "query": {"match": {"text": "data"}},
            "aggs": {
                "bylang": {
                    "terms": {"field": "lang"},
                    "aggs": {
                        "hist": {
                            "histogram": {"field": "n_chars",
                                          "interval": 100.0}
                        }
                    },
                }
            },
        },
        corpus,
    )
    assert "aggs:bylang>hist" in resp
    assert {"bylang", "hist", "doc_count"} <= set(
        resp["aggs:bylang>hist"].columns
    )


def test_non_composable_sections_stay_loud(setup):
    idx, corpus = setup
    with pytest.raises(NotImplementedError, match="single-section"):
        search_response(
            idx,
            {"query": {"match": {"text": "data"}},
             "collapse": {"field": "lang"}},
            corpus,
        )
    with pytest.raises(ValueError, match="needs query"):
        search_response(idx, {"aggs": {}})


def test_prefix_auto_route_inside_composed_response(
    spark, setup, tmp_path_factory
):
    """Round-5 features compose: a composed hits+aggs body whose query is
    a prefix auto-routes to the sayt companion (hits == the explicit sayt
    call) while the aggs section sees the routed match set."""
    from elasticsearch_assets_spark.index.build import build_sayt_index

    idx, corpus = setup
    sd = str(tmp_path_factory.mktemp("respsayt") / "companion")
    build_sayt_index(spark, corpus, sd, lo=2, hi=4, num_segments=4)
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    idx.attach_sayt(InvertedIndex(spark, sd), lo=2, hi=4)
    try:
        resp = search_response(
            idx,
            {
                "query": {"prefix": {"text": "dat"}},
                "size": 5,
                "aggs": {"bylang": {"terms": {"field": "lang"}}},
            },
            corpus,
        )
        assert _rows(resp["hits"]) == _rows(
            idx.search_prefix_sayt("dat", k=5)
        )
        matched = idx.search_prefix_sayt("dat", k=None)
        agg_total = sum(
            r["doc_count"] for r in resp["aggs:bylang"].collect()
        )
        assert agg_total == matched.count()
    finally:
        del idx._sayt  # leave the shared fixture unrouted
