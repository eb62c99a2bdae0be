"""Sayt auto-routing (round-4 verdict item #1).

ES `index_prefixes` rewrites prefix-shaped queries to the companion
subfield TRANSPARENTLY — the caller never opts in per query. Here the
DSL (`prefix`, `match_bool_prefix`, one-term `match_phrase_prefix`) and
query-string (`foo*`) compilers route to the attached sayt companion
automatically when the prefix is inside its gram window; out-of-window
prefixes, explicit `rewrite`/`max_expansions` requests, operator=and,
and attach_sayt(auto=False) all keep the rank-exact expansion path.
Match sets must be identical either way (the index_prefixes contract);
routed scores follow the documented companion term-BM25 deviation.
"""

from __future__ import annotations

import pytest

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index, build_sayt_index
from elasticsearch_assets_spark.query.dsl import search_dsl
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 400, partitions=4).cache()


@pytest.fixture(scope="module")
def pair(spark, corpus, tmp_path_factory):
    """(routed, unrouted): same main index dir, one handle with the
    companion auto-attached and one bare — the A/B for every test."""
    d = str(tmp_path_factory.mktemp("saytroute") / "main")
    build_index(spark, corpus, d, num_segments=4, num_chunks=1, positions=True)
    sd = str(tmp_path_factory.mktemp("saytroute") / "companion")
    build_sayt_index(spark, corpus, sd, lo=2, hi=4, num_segments=4)
    routed = InvertedIndex(spark, d)
    routed.attach_sayt(InvertedIndex(spark, sd), lo=2, hi=4)
    bare = InvertedIndex(spark, d)
    return routed, bare


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_dsl_prefix_auto_routes(pair):
    """A plain `{"prefix": ...}` body on a sayt-attached index returns
    the accelerated path's frame (scores = companion term BM25), with
    the match set of the expansion path."""
    routed, bare = pair
    body = {"query": {"prefix": {"text": "dat"}}, "size": None}
    got = _rows(search_dsl(routed, body))
    assert got == _rows(routed.search_prefix_sayt("dat", k=None))
    assert {d for d, _ in got} == _ids(search_dsl(bare, body))


def test_dsl_prefix_opt_outs_keep_expansion(pair):
    routed, bare = pair
    exact = _rows(
        search_dsl(bare, {"query": {"prefix": {"text": "dat"}}, "size": None})
    )
    # attach-time opt-out
    off = InvertedIndex(routed.spark, routed.index_dir)
    off.attach_sayt(routed._sayt[0], lo=2, hi=4, auto=False)
    assert _rows(
        search_dsl(off, {"query": {"prefix": {"text": "dat"}}, "size": None})
    ) == exact
    # per-query opt-out: an explicit rewrite keeps the requested rewrite
    body = {
        "query": {
            "prefix": {"text": {"value": "dat", "rewrite": "scoring_boolean"}}
        },
        "size": None,
    }
    assert _rows(search_dsl(routed, body)) == exact


def test_dsl_prefix_out_of_window_is_rank_exact(pair):
    """Prefixes outside [lo, hi] never touch the companion — scores equal
    the bare expansion path bit-for-bit (both directions: too short and
    too long)."""
    routed, bare = pair
    for p in ("d", "datab"):
        body = {"query": {"prefix": {"text": p}}, "size": None}
        assert _rows(search_dsl(routed, body)) == _rows(
            search_dsl(bare, body)
        ), p


def test_dsl_prefix_boost_scales_routed_scores(pair):
    routed, _ = pair
    base = _rows(
        search_dsl(routed, {"query": {"prefix": {"text": "dat"}}, "size": None})
    )
    boosted = _rows(
        search_dsl(
            routed,
            {
                "query": {"prefix": {"text": {"value": "dat", "boost": 2.0}}},
                "size": None,
            },
        )
    )
    assert boosted == [(d, s * 2.0) for d, s in base]


def test_dsl_prefix_min_score_composes_with_route(pair):
    routed, _ = pair
    allr = _rows(
        search_dsl(routed, {"query": {"prefix": {"text": "dat"}}, "size": None})
    )
    assert allr
    cut = sorted(s for _, s in allr)[len(allr) // 2]
    kept = _rows(
        search_dsl(
            routed,
            {
                "query": {"prefix": {"text": "dat"}},
                "size": None,
                "min_score": cut,
            },
        )
    )
    assert kept == [(d, s) for d, s in allr if s >= cut]


def test_dsl_match_bool_prefix_auto_routes(pair):
    routed, bare = pair
    body = {
        "query": {"match_bool_prefix": {"text": "data pro"}},
        "size": None,
    }
    got = _rows(search_dsl(routed, body))
    assert got == _rows(routed.match_bool_prefix_sayt("data pro", k=None))
    assert {d for d, _ in got} == _ids(search_dsl(bare, body))
    # operator=and keeps the exact kernel (the sayt compound is or-only)
    for b2 in (
        {"query": "data pro", "operator": "and"},
        {"query": "data pro", "max_expansions": 50},
    ):
        body2 = {"query": {"match_bool_prefix": {"text": b2}}, "size": None}
        assert _rows(search_dsl(routed, body2)) == _rows(
            search_dsl(bare, body2)
        ), b2


def test_dsl_match_phrase_prefix_single_token_routes(pair):
    """A one-term match_phrase_prefix IS a prefix query (the ES
    degenerate case) — it rides the same route; multi-term phrase
    prefixes stay on the positional expansion path."""
    routed, bare = pair
    one = {"query": {"match_phrase_prefix": {"text": "dat"}}, "size": None}
    got = _rows(search_dsl(routed, one))
    assert got == _rows(routed.search_prefix_sayt("dat", k=None))
    assert {d for d, _ in got} == _ids(search_dsl(bare, one))
    multi = {
        "query": {"match_phrase_prefix": {"text": "data pro"}},
        "size": None,
    }
    assert _rows(search_dsl(routed, multi)) == _rows(search_dsl(bare, multi))


def test_querystring_prefix_auto_routes(pair):
    routed, bare = pair
    got = _rows(routed.search_querystring("dat*", k=None))
    assert got == _rows(routed.search_prefix_sayt("dat", k=None))
    assert {d for d, _ in got} == _ids(bare.search_querystring("dat*", k=None))
    # caret boost scales the routed scores (rank-preserving)
    boosted = _rows(routed.search_querystring("dat*^2", k=None))
    assert boosted == [(d, s * 2.0) for d, s in got]


def test_querystring_compound_keeps_expansion(pair):
    """Only a WHOLE-query single prefix clause routes — compounds keep
    the clause-level expansion semantics bit-for-bit."""
    routed, bare = pair
    for q in ("data AND dat*", "dat* OR query", "datab*"):
        assert _rows(routed.search_querystring(q, k=None)) == _rows(
            bare.search_querystring(q, k=None)
        ), q


def test_routed_prefix_respects_deletes(pair, spark, corpus, tmp_path_factory):
    """The routed DSL path excludes main-index tombstones the moment the
    delete lands (same contract as the explicit sayt entry points)."""
    d = str(tmp_path_factory.mktemp("saytroutedel") / "main")
    build_index(spark, corpus, d, num_segments=2, num_chunks=1)
    sd = str(tmp_path_factory.mktemp("saytroutedel") / "companion")
    build_sayt_index(spark, corpus, sd, lo=2, hi=4, num_segments=2)
    i = InvertedIndex(spark, d)
    i.attach_sayt(InvertedIndex(spark, sd), lo=2, hi=4)
    body = {"query": {"prefix": {"text": "dat"}}, "size": None}
    before = _ids(search_dsl(i, body))
    victims = _ids(i.search(["data"], k=None))
    assert victims
    assert i.delete_by_query(["data"]) == len(victims)
    after = _ids(search_dsl(i, body))
    assert not after & victims
    assert after == before - victims


def test_mbp_sayt_fused_bit_identical(pair):
    """Round-4 verdict item #7: the fused one-scan compound must be
    bit-identical to the two-plan reference path (same kernels, same
    stats per side, one union scan instead of two plans)."""
    routed, _ = pair
    for q in ("data pro", "the data pro", "dat", "zzz dat"):
        fused = _rows(routed.match_bool_prefix_sayt(q, k=None))
        legacy = _rows(routed.match_bool_prefix_sayt(q, k=None, fused=False))
        assert fused == legacy, q
    assert _rows(routed.match_bool_prefix_sayt("data pro", k=None))
