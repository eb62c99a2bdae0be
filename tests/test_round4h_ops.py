"""Session-11 batch 2: the search body's response-shape sections wired to
their kernels (post_filter / rescore / collapse / highlight / _source /
fields / track_total_hits / suggest), plus the two composition gaps the
DSL used to reject — minimum_should_match under a structured filter
(min_should_match threaded through search_filtered, all three strategies
rank-identical) and must_not over match_phrase (index-assisted anti-join
exclusion). Parity is against the direct kernel calls — the kernels'
math is already oracle-pinned, these tests pin the DELEGATION.

Reference surface: the reader facade forwards caller-built JSON bodies
straight to ES (/root/reference/asset/elasticsearch_reader/index.js);
section semantics from the public ES search-body docs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.query.dsl import search_dsl, suggest_dsl


@pytest.fixture(scope="module")
def shp_index(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [
        (0, "spark join table spark shuffle", "spark guide", 10.0, 2),
        (1, "join table row filter", "table talk", 50.0, 1),
        (2, "spark row row join order", "row spark", 0.0, 3),
        (3, "table table join spark row", "join notes", 25.0, 2),
        (4, "jolt jolt row order by", "jolt intro", 75.0, 1),
        (5, "spark jolt table shuffle join", "spark jolt", 5.0, 2),
        (6, "order by table spark spark", "order desk", 80.0, 1),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "title", "views", "grp"]
    )
    d = str(tmp_path_factory.mktemp("shpidx"))
    build_index(spark, docs, d, num_segments=2, num_chunks=1, positions=True)
    return InvertedIndex(spark, d), docs


def _pairs(df):
    return [(r[0], r[1]) for r in df.collect()]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# -- composition gaps ---------------------------------------------------------


def test_msm_with_filter(shp_index):
    idx, docs = shp_index
    toks = ["spark", "join", "shuffle"]
    filt = docs.where(F.col("views") >= 5)

    # ground truth: membership (>= 2 distinct terms) is filter-independent
    exp = _pairs(
        idx.search(toks, k=None, mode="or", min_should_match=2)
        .join(filt.select(F.col("doc_id")), "doc_id", "semi")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    assert exp  # non-degenerate fixture

    # every strategy rank-identical
    for strat in ("exhaustive", "broadcast", "cogroup"):
        got = _pairs(idx.search_filtered(
            toks, filt, k=None, mode="or", min_should_match=2,
            strategy=strat,
        ))
        assert got == exp, strat

    # the DSL body compiles onto the filtered kernel
    body = {"query": {"bool": {
        "should": [{"match": {"text": "spark"}},
                   {"match": {"text": "join"}},
                   {"match": {"text": "shuffle"}}],
        "minimum_should_match": 2,
        "filter": [{"range": {"views": {"gte": 5}}}],
    }}, "size": None}
    assert _pairs(search_dsl(idx, body, docs)) == exp

    with pytest.raises(ValueError):  # msm needs mode='or'
        idx.search_filtered(toks, filt, mode="and", min_should_match=2)


def test_phrase_with_must_not(shp_index):
    idx, docs = shp_index
    base = idx.search_phrase(["spark", "join"], k=None)
    ex = idx.search(["order"], k=None, mode="or").select("doc_id")
    exp = _pairs(
        base.join(ex, "doc_id", "left_anti")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    body = {"query": {"bool": {
        "must": [{"match_phrase": {"text": "spark join"}}],
        "must_not": [{"match": {"text": "order"}}],
    }}, "size": None}
    got = _pairs(search_dsl(idx, body, docs))
    assert got == exp and got
    # exclusion only ever removes rows
    assert set(d for d, _ in got) <= set(d for d, _ in _pairs(base))


# -- response-shape sections --------------------------------------------------


def test_body_post_filter(shp_index):
    idx, docs = shp_index
    body = {"query": {"match": {"text": "spark"}},
            "post_filter": {"range": {"views": {"gte": 20}}}, "size": 3}
    got = _rows(search_dsl(idx, body, docs))
    exp = _rows(idx.search_post_filter(
        ["spark"], docs.where(F.col("views") >= 20), k=3, mode="or"
    ))
    assert got == exp and got
    # total_before_filter counts EVERY query match (the agg side)
    assert got[0][2] == idx.search(["spark"], k=None, mode="or").count()


def test_body_rescore(shp_index):
    idx, docs = shp_index
    body = {"query": {"match": {"text": "spark"}},
            "rescore": {"window_size": 4, "query": {
                "rescore_query": {"match": {"text": "join"}},
                "query_weight": 0.7, "rescore_query_weight": 1.2,
                "score_mode": "total",
            }}, "size": 4}
    got = _pairs(search_dsl(idx, body, docs))
    exp = _pairs(idx.rescore(
        ["spark"], ["join"], window_size=4, k=4, mode="or",
        query_weight=0.7, rescore_query_weight=1.2, score_mode="total",
    ))
    assert got == exp and got
    # list form (ES allows a rescore array) — single stage accepted
    body["rescore"] = [body["rescore"]]
    assert _pairs(search_dsl(idx, body, docs)) == exp


def test_body_collapse(shp_index):
    idx, docs = shp_index
    from elasticsearch_assets_spark.operators.facets import collapse_topk

    body = {"query": {"match": {"text": "spark table"}},
            "collapse": {"field": "grp"}, "size": 2}
    got = _rows(search_dsl(idx, body, docs))
    exp = _rows(collapse_topk(
        idx.search(["spark", "table"], k=None, mode="or"), docs, "grp", k=2
    ))
    assert got == exp and got
    keys = [r for r in got]
    assert len({r[2] for r in keys}) == len(keys)  # one winner per group


def test_body_highlight(shp_index):
    idx, docs = shp_index
    from elasticsearch_assets_spark.operators.highlight import (
        highlight_first,
        highlight_fragments,
    )

    cor2 = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    body = {"query": {"match": {"text": "shuffle"}},
            "highlight": {"fields": {"text": {}}}, "size": 5}
    got = _rows(search_dsl(idx, body, docs))
    hits = idx.search(["shuffle"], k=5, mode="or")
    exp = _rows(hits.join(
        highlight_first(hits, cor2, ["shuffle"], width=80), "doc_id", "left"
    ))
    assert got == exp and got
    assert all("shuffle" in r[-1] for r in got)  # snippet covers the term

    body["highlight"]["fields"]["text"] = {
        "number_of_fragments": 2, "fragment_size": 20,
    }
    got = _rows(search_dsl(idx, body, docs))
    exp = _rows(hits.join(
        highlight_fragments(hits, cor2, ["shuffle"], n_fragments=2, width=20),
        "doc_id", "left",
    ))
    assert got == exp and got


def test_body_source_and_fields(shp_index):
    idx, docs = shp_index
    hits = idx.search(["spark"], k=3, mode="or")

    body = {"query": {"match": {"text": "spark"}},
            "_source": {"includes": ["t*"], "excludes": ["text"]},
            "size": 3}
    got = _rows(search_dsl(idx, body, docs))
    exp = _rows(idx.fetch_source(
        hits, docs, includes=["t*"], excludes=["text"]
    ))
    assert got == exp and got

    # list + string + false forms
    assert _rows(search_dsl(
        idx, {**body, "_source": ["title"]}, docs
    )) == _rows(idx.fetch_source(hits, docs, includes=["title"]))
    assert _rows(search_dsl(
        idx, {**body, "_source": False}, docs
    )) == _rows(hits)

    body = {"query": {"match": {"text": "spark"}},
            "fields": ["title", "views"], "size": 3}
    got = _rows(search_dsl(idx, body, docs))
    exp = _rows(idx.fetch_fields(hits, docs, ["title", "views"]))
    assert got == exp and got


def test_body_track_total_hits(shp_index):
    idx, docs = shp_index
    body = {"query": {"match": {"text": "spark"}},
            "track_total_hits": 3, "size": 2}
    got = _rows(search_dsl(idx, body, docs))
    exp = _rows(idx.search_tracked(
        ["spark"], k=2, mode="or", track_total_hits=3
    ))
    assert got == exp and got
    assert all(r[2] == 3 and r[3] == "gte" for r in got)

    # true -> exact count; false -> plain hits
    got = _rows(search_dsl(
        idx, {**body, "track_total_hits": True}, docs
    ))
    n = idx.search(["spark"], k=None, mode="or").count()
    assert all(r[2] == n and r[3] == "eq" for r in got)
    assert _rows(search_dsl(
        idx, {**body, "track_total_hits": False}, docs
    )) == _rows(idx.search(["spark"], k=2, mode="or"))


def test_body_suggest(shp_index):
    idx, docs = shp_index
    got = _rows(search_dsl(idx, {"suggest": {
        "fix": {"text": "spak", "term": {"field": "text"}},
    }}, docs))
    assert got == _rows(idx.suggest("spak")) and got

    named = suggest_dsl(idx, {
        "fix": {"text": "spak", "term": {"field": "text"}},
        "didyou": {"text": "spark joib", "phrase": {
            "field": "text", "collate": {"prune": True},
        }},
        "sayt": {"prefix": "sp", "completion": {"field": "text"}},
        "sayt_fz": {"prefix": "sq", "completion": {
            "field": "text", "fuzzy": {"fuzziness": 1},
        }},
    })
    assert set(named) == {"fix", "didyou", "sayt", "sayt_fz"}
    assert _rows(named["didyou"]) == _rows(idx.suggest_phrase(
        "spark joib", collate=True, collate_prune=True
    ))
    assert _rows(named["sayt"]) == _rows(idx.suggest_completion("sp"))
    assert _rows(named["sayt_fz"]) == _rows(
        idx.suggest_completion_fuzzy("sq", fuzziness=1)
    )


def test_body_shape_strictness(shp_index):
    idx, docs = shp_index
    with pytest.raises(NotImplementedError):  # two shape sections
        search_dsl(idx, {"query": {"match": {"text": "spark"}},
                         "collapse": {"field": "grp"},
                         "track_total_hits": 3}, docs)
    with pytest.raises(NotImplementedError):  # suggest next to a query
        search_dsl(idx, {"query": {"match": {"text": "spark"}},
                         "suggest": {"s": {"text": "spak",
                                           "term": {"field": "text"}}}},
                   docs)
    with pytest.raises(NotImplementedError):  # two rescore stages
        search_dsl(idx, {"query": {"match": {"text": "spark"}},
                         "rescore": [{"query": {"rescore_query":
                                                {"match": {"text": "join"}}}},
                                     {"query": {"rescore_query":
                                                {"match": {"text": "row"}}}}]},
                   docs)
