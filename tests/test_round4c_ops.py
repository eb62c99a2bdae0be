"""Round-3 session-8 ops: phrase + scoring-clause composition.

Closes the query-string surface gap named in query/querystring.py —
`"phrase" AND term AND jo*` (a Lucene BooleanQuery holding a PhraseQuery
next to other scoring clauses, the shape the reference's `q=` surface
accepts via Elasticsearch, /root/reference/test/simple_api_reader-spec.js).
Contract: a doc matches iff it contains the phrase consecutively AND >= 1
term of every group; the score sums every matched term (the engine's
scoring_boolean contract), i.e. exactly `search(groups=...)` restricted to
phrase-matching docs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 900, partitions=4).cache()


@pytest.fixture(scope="module")
def pos_index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx4c") / "pos")
    build_index(spark, corpus, d, num_segments=8, num_chunks=2, positions=True)
    return InvertedIndex(spark, d)


PHRASE = ["the", "join"]
GROUPS = [["data", "spark"], ["query"]]


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_phrase_groups_matches_manual_composition(pos_index):
    got = pos_index.search_phrase(PHRASE, k=None, groups=GROUPS)
    ph_ids = np.array(
        sorted(r["doc_id"] for r in pos_index.search_phrase(PHRASE, k=None).collect()),
        dtype=np.int64,
    )
    allg = [[t] for t in sorted(set(PHRASE))] + GROUPS
    want = pos_index.search(
        [], k=None, mode="and", groups=allg, allowed=ph_ids
    )
    assert _rows(got) == _rows(want) and got.count() > 0
    # the groups genuinely restrict (otherwise the test proves nothing)
    assert got.count() < len(ph_ids)


def test_phrase_groups_serving_parity(pos_index):
    dist = _rows(pos_index.search_phrase(PHRASE, k=None, groups=GROUPS))
    loc = pos_index.search_phrase_local(PHRASE, k=None, groups=GROUPS)
    assert [(int(d), pytest.approx(s)) for d, s in loc] == [
        (d, pytest.approx(s)) for d, s in dist
    ]


def test_phrase_groups_filtered_strategies_rank_identical(pos_index, corpus):
    filt = corpus.where(F.col("doc_id") % 2 == 0)
    outs = [
        _rows(
            pos_index.search_phrase_filtered(
                PHRASE, filt, k=None, strategy=s, groups=GROUPS
            )
        )
        for s in ("cogroup", "broadcast", "exhaustive")
    ]
    assert outs[0] == outs[1] == outs[2] and outs[0]
    assert all(d % 2 == 0 for d, _ in outs[0])


def test_querystring_phrase_with_scoring_clauses(pos_index, corpus):
    got = pos_index.search_querystring(
        '"the join" AND data AND doc_id:>=100', corpus, k=None
    )
    filt = corpus.where(F.col("doc_id") >= 100)
    want = pos_index.search_phrase_filtered(
        PHRASE, filt, k=None, groups=[["data"]]
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_phrase_groups_unsatisfiable_group_is_empty(pos_index):
    got = pos_index.search_phrase(PHRASE, k=None, groups=[["zzzznope"]])
    assert got.count() == 0


def test_phrase_groups_missing_term_dropped_from_group(pos_index):
    # a globally-absent term in a group is dropped (MultiTermQuery-rewrite
    # rule); the group still matches through its present terms
    with_missing = _rows(
        pos_index.search_phrase(PHRASE, k=None, groups=[["data", "zzzznope"]])
    )
    clean = _rows(pos_index.search_phrase(PHRASE, k=None, groups=[["data"]]))
    assert with_missing == clean and with_missing
