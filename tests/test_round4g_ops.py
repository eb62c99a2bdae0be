"""Session-11 batch 1: ES Query DSL completion — every remaining engine
kernel reachable from the JSON body compiler (query/dsl.py), parity-tested
clause shape by clause shape against the direct kernel calls (the same
strategy as test_round4f_ops.py's DSL batteries; rank semantics are the
kernels' own oracle-pinned contracts, so these tests pin the DELEGATION,
not the math).

Reference surface: the reader facade forwards caller-built JSON bodies
straight to ES (/root/reference/asset/elasticsearch_reader/index.js);
query-type semantics from the public ES Query DSL docs.
"""

from __future__ import annotations

import base64
import json

import pytest

from elasticsearch_assets_spark.query.dsl import search_dsl


@pytest.fixture(scope="module")
def dsl_index(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [
        # doc_id, text, title, views (rank_feature), ts (distance_feature),
        # msm (terms_set per-doc requirement)
        (0, "spark join table spark shuffle", "spark guide", 10.0, 100.0, 2),
        (1, "join table row filter", "table talk", 50.0, 200.0, 1),
        (2, "spark row row join order", "row spark", 0.0, 150.0, 3),
        (3, "table table join spark row", "join notes", 25.0, 110.0, 2),
        (4, "jolt jolt row order by", "jolt intro", None, 400.0, 1),
        (5, "spark jolt table shuffle join", "spark jolt", 5.0, 120.0, 2),
        (6, "order by table spark spark", "order desk", 80.0, 300.0, 1),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "title", "views", "ts", "msm"]
    )
    d = str(tmp_path_factory.mktemp("dslidx"))
    build_index(spark, docs, d, num_segments=2, num_chunks=1, positions=True)
    dt = str(tmp_path_factory.mktemp("dslidx_title"))
    build_index(
        spark, docs.select("doc_id", docs["title"].alias("text")), dt,
        num_segments=2, num_chunks=1, positions=True,
    )
    return InvertedIndex(spark, d), InvertedIndex(spark, dt), docs


def _pairs(df):
    return [(r[0], r[1]) for r in df.collect()]


def test_dsl_boosting_and_pinned(dsl_index):
    idx, _, docs = dsl_index
    body = {"query": {"boosting": {
        "positive": {"match": {"text": "spark join"}},
        "negative": {"match": {"text": "jolt"}},
        "negative_boost": 0.25,
    }}, "size": None}
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(idx.boosting("spark join", "jolt", 0.25, k=None, mode="or"))
    assert got == exp and got

    body = {"query": {"pinned": {
        "ids": [4, 99, 2],
        "organic": {"match": {"text": {"query": "spark table",
                                       "operator": "and"}}},
    }}, "size": 5}
    got = _pairs(search_dsl(idx, body, docs))
    exp = _pairs(idx.pinned([4, 99, 2], "spark table", k=5, mode="and",
                            corpus=docs))
    assert got == exp and got[0][0] == 4


def test_dsl_terms_set_script_score_mlt(dsl_index):
    idx, _, docs = dsl_index
    body = {"query": {"terms_set": {"text": {
        "terms": ["spark", "jolt", "order"],
        "minimum_should_match_field": "msm",
    }}}, "size": None}
    got = _pairs(search_dsl(idx, body, docs))
    exp = _pairs(idx.terms_set(["spark", "jolt", "order"], docs, "msm",
                               k=None))
    assert got == exp and got

    body = {"query": {"script_score": {
        "query": {"match": {"text": "spark"}},
        "script": {"source": "_score * coalesce(views, 0.0)"},
    }}, "size": 4}
    got = _pairs(search_dsl(idx, body, docs))
    exp = _pairs(idx.script_score("spark", docs,
                                  "_score * coalesce(views, 0.0)",
                                  k=4, mode="and"))
    assert got == exp and got

    body = {"query": {"more_like_this": {
        "like": [{"_id": 0}], "unlike": [{"_id": 4}],
        "max_query_terms": 3,
    }}, "size": 4}
    got = _pairs(search_dsl(idx, body, docs))
    exp = _pairs(idx.more_like_this(0, docs, max_terms=3, k=4, unlike=[4]))
    assert got == exp and got


def test_dsl_multiterm_rewrites_and_sqs(dsl_index):
    idx, _, docs = dsl_index
    got = _pairs(search_dsl(
        idx, {"query": {"regexp": {"text": {"value": "jo.*"}}}, "size": None}
    ))
    exp = _pairs(idx.search_regexp("jo.*", k=None))
    assert got == exp and got

    got = _pairs(search_dsl(
        idx, {"query": {"match_phrase_prefix": {"text": "table jo"}},
              "size": None}
    ))
    exp = _pairs(idx.search_phrase_prefix("table jo", k=None))
    assert got == exp and got

    got = _pairs(search_dsl(
        idx, {"query": {"match_bool_prefix": {
            "text": {"query": "spark jo", "operator": "and"}}},
            "size": None}
    ))
    exp = _pairs(idx.match_bool_prefix("spark jo", k=None, operator="and"))
    assert got == exp and got

    got = _pairs(search_dsl(
        idx, {"query": {"simple_query_string": {
            "query": "spark + -jolt", "default_operator": "and"}},
            "size": None}
    ))
    exp = _pairs(idx.search_simple_query_string(
        "spark + -jolt", k=None, default_operator="and"
    ))
    assert got == exp


def test_dsl_sparse_wrapper_intervals(dsl_index):
    idx, _, docs = dsl_index
    qv = {"spark": 2.0, "shuffle": 0.5}
    got = _pairs(search_dsl(
        idx, {"query": {"sparse_vector": {"field": "text",
                                          "query_vector": qv}},
              "size": None}
    ))
    exp = _pairs(idx.search_sparse(qv, k=None))
    assert got == exp and got

    payload = base64.b64encode(b"spark AND join").decode()
    got = _pairs(search_dsl(
        idx, {"query": {"wrapper": {"query": payload}}, "size": 5}
    ))
    exp = _pairs(idx.search_querystring("spark AND join", k=5))
    assert got == exp and got

    got = _pairs(search_dsl(
        idx, {"query": {"intervals": {"text": {"match": {
            "query": "spark join", "max_gaps": 1, "ordered": True,
        }}}}, "size": None}
    ))
    exp = _pairs(idx.search_intervals(["spark", "join"], max_gaps=1, k=None))
    assert got == exp and got


def test_dsl_span_family(dsl_index):
    idx, _, docs = dsl_index
    st = lambda t: {"span_term": {"text": t}}  # noqa: E731

    body = {"query": {"span_near": {
        "clauses": [st("spark"), st("join")], "slop": 1, "in_order": True,
    }}, "size": None}
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(idx.search_span_near(["spark", "join"], slop=1,
                                      in_order=True, k=None))
    assert got == exp and got

    body = {"query": {"span_first": {"match": st("spark"), "end": 1}},
            "size": None}
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(idx.search_span_first("spark", 1, k=None))
    assert got == exp and got

    body = {"query": {"span_not": {
        "include": st("join"), "exclude": st("jolt"), "pre": 2, "post": 2,
    }}, "size": None}
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(idx.search_span_not("join", "jolt", pre=2, post=2, k=None))
    assert got == exp

    body = {"query": {"span_or": {"clauses": [
        st("jolt"),
        {"span_multi": {"match": {"prefix": {"text": "shuf"}}}},
    ]}}, "size": None}
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(idx.search_span_or(
        [("term", "jolt"), idx.span_multi("shuf", kind="prefix")], k=None
    ))
    assert got == exp and got

    # nested two-term span_near composes inside span_containing
    body = {"query": {"span_containing": {
        "big": {"span_near": {"clauses": [st("table"), st("join")],
                              "slop": 3, "in_order": False}},
        "little": st("table"),
    }}, "size": None}
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(idx.search_span_containing(
        ("near", "table", "join", 3, False), ("term", "table"), k=None
    ))
    assert got == exp

    body = {"query": {"span_within": {
        "little": st("table"),
        "big": {"span_near": {"clauses": [st("table"), st("join")],
                              "slop": 3, "in_order": False}},
    }}, "size": None}
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(idx.search_span_within(
        ("term", "table"), ("near", "table", "join", 3, False), k=None
    ))
    assert got == exp


def test_dsl_feature_boosters(dsl_index):
    idx, _, docs = dsl_index
    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "should": [{"rank_feature": {
            "field": "views", "boost": 1.5, "log": {"scaling_factor": 2.0},
        }}],
    }}, "size": None}
    got = _pairs(search_dsl(idx, body, docs))
    exp = _pairs(idx.rank_feature(
        "spark", docs, "views", function="log", scaling_factor=2.0,
        boost=1.5, k=None, mode="and",
    ))
    assert got == exp and got

    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "should": [{"distance_feature": {
            "field": "ts", "origin": 100.0, "pivot": 50.0, "boost": 2.0,
        }}],
    }}, "size": None}
    got = _pairs(search_dsl(idx, body, docs))
    exp = _pairs(idx.distance_feature(
        "spark", docs, "ts", origin=100.0, pivot=50.0, boost=2.0,
        k=None, mode="and",
    ))
    assert got == exp and got


def test_dsl_multifield_forms(dsl_index):
    from elasticsearch_assets_spark.query.engine import (
        combined_fields,
        cross_fields,
        multi_match,
    )

    idx, tidx, docs = dsl_index
    fidx = {"text": idx, "title": tidx}

    body = {"query": {"multi_match": {
        "query": "spark table", "fields": ["text", "title^2"],
        "type": "best_fields", "tie_breaker": 0.3,
    }}, "size": None}
    got = _pairs(search_dsl(idx, body, field_indexes=fidx))
    exp = _pairs(multi_match(
        {"text": (idx, 1.0), "title": (tidx, 2.0)}, "spark table",
        match_type="best_fields", tie_breaker=0.3, k=None,
    ))
    assert got == exp and got

    body = {"query": {"multi_match": {
        "query": "spark table", "fields": ["text", "title"],
        "type": "cross_fields",
    }}, "size": None}
    got = _pairs(search_dsl(idx, body, field_indexes=fidx))
    exp = _pairs(cross_fields(
        {"text": (idx, 1.0), "title": (tidx, 1.0)}, "spark table", k=None
    ))
    assert got == exp and got

    body = {"query": {"combined_fields": {
        "query": "spark table", "fields": ["text", "title^2"],
    }}, "size": None}
    got = _pairs(search_dsl(idx, body, docs, field_indexes=fidx))
    exp = _pairs(combined_fields(
        {"text": (idx, 1.0), "title": (tidx, 2.0)}, docs,
        {"text": "text", "title": "title"}, "spark table", k=None,
    ))
    assert got == exp and got


def test_dsl_aggs_subaggs(dsl_index):
    from elasticsearch_assets_spark.operators.facets import (
        facet_terms_metrics,
        facet_terms_nested,
    )
    from elasticsearch_assets_spark.query.dsl import aggs_dsl

    idx, _, docs = dsl_index
    matches = idx.search("spark", k=None, mode="or")

    out = aggs_dsl(
        {"by_msm": {
            "terms": {"field": "msm", "order": {"mean_views": "desc"}},
            "aggs": {"mean_views": {"avg": {"field": "views"}},
                     "total_views": {"sum": {"field": "views"}}},
        }},
        matches, docs,
    )
    exp = facet_terms_metrics(
        matches, docs, "msm", "views", order_by="avg", ascending=False
    )
    assert out["by_msm"].collect() == exp.collect()

    out = aggs_dsl(
        {"nested": {
            "terms": {"field": "msm"},
            "aggs": {"by_title": {"terms": {"field": "title"}}},
        }},
        matches, docs,
    )
    exp = facet_terms_nested(matches, docs, "msm", "title")
    assert out["nested"].collect() == exp.collect()

    # round-5: the shapes the one-level compiler rejected now compile
    # through the general tree path (full semantics in test_aggs_tree.py;
    # here just pin that they run and key by level path)
    deep = aggs_dsl({"x": {"terms": {"field": "msm"}, "aggs": {
        "y": {"terms": {"field": "title"},
              "aggs": {"z": {"avg": {"field": "views"}}}}}}},
        matches, docs)
    assert set(deep) == {"x>y"} and "z" in deep["x>y"].columns
    mixed = aggs_dsl({"x": {"terms": {"field": "msm"}, "aggs": {
        "y": {"terms": {"field": "title"}},
        "z": {"avg": {"field": "views"}}}}}, matches, docs)
    assert set(mixed) == {"x", "x>y"} and "z" in mixed["x"].columns
    twof = aggs_dsl({"x": {"terms": {"field": "msm"}, "aggs": {
        "y": {"avg": {"field": "views"}},
        "z": {"sum": {"field": "ts"}}}}}, matches, docs)
    assert set(twof) == {"x"}
    assert {"y", "z"} <= set(twof["x"].columns)


def test_dsl_delegation_strictness(dsl_index):
    idx, _, docs = dsl_index
    with pytest.raises(NotImplementedError):  # unordered intervals
        search_dsl(idx, {"query": {"intervals": {"text": {"match": {
            "query": "spark join", "ordered": False}}}}})
    with pytest.raises(ValueError):  # terms_set without corpus
        search_dsl(idx, {"query": {"terms_set": {"text": {
            "terms": ["spark"], "minimum_should_match_field": "msm"}}}})
    with pytest.raises(ValueError):  # multi_match without field_indexes
        search_dsl(idx, {"query": {"multi_match": {
            "query": "spark", "fields": ["text"]}}})
    with pytest.raises(NotImplementedError):  # two feature clauses
        search_dsl(idx, {"query": {"bool": {
            "must": [{"match": {"text": "spark"}}],
            "should": [
                {"rank_feature": {"field": "views"}},
                {"rank_feature": {"field": "ts"}},
            ],
        }}}, docs)
    # a mixed should (feature + scoring clause) still hits the
    # optional-should rejection, not the feature fast-path
    with pytest.raises(NotImplementedError):
        search_dsl(idx, {"query": {"bool": {
            "must": [{"match": {"text": "spark"}}],
            "should": [{"rank_feature": {"field": "views"}},
                       {"match": {"text": "join"}}],
        }}}, docs)
    # wrapper payload round-trips through json-free transport
    assert json.loads(json.dumps({"q": 1}))  # sanity: stdlib available
