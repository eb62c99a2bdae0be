"""Search-as-you-type prefix acceleration (round-3 verdict item #4).

The sayt companion index turns a prefix query into ONE posting lookup.
Scoring is BM25 of the prefix as a term of the edge-ngram field (the ES
index_prefixes rewrite — a documented deviation from scoring_boolean);
the MATCH SET must be identical to the dictionary-expansion path, and
out-of-window prefixes must fall back to it exactly.
"""

from __future__ import annotations

import pytest

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index, build_sayt_index
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 400, partitions=4).cache()


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sayt") / "main")
    build_index(spark, corpus, d, num_segments=4, num_chunks=1)
    i = InvertedIndex(spark, d)
    sd = str(tmp_path_factory.mktemp("sayt") / "companion")
    build_sayt_index(spark, corpus, sd, lo=2, hi=4, num_segments=4)
    i.attach_sayt(InvertedIndex(spark, sd), lo=2, hi=4)
    return i


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_sayt_match_set_identical(idx):
    for p in ("da", "dat", "data"):
        fast = _ids(idx.search_prefix_sayt(p, k=None))
        exact = _ids(idx.search_prefix(p, k=None))
        assert fast == exact and fast, p


def test_sayt_scores_are_single_term_bm25(idx):
    """The accelerated path's scores equal a plain term query for the
    gram on the sayt index — the documented scoring contract."""
    sayt_idx = idx._sayt[0]
    via = [
        (r["doc_id"], r["score"])
        for r in idx.search_prefix_sayt("dat", k=None).collect()
    ]
    direct = [
        (r["doc_id"], r["score"])
        for r in sayt_idx.search(["dat"], k=None, mode="and").collect()
    ]
    assert via == direct


def test_sayt_out_of_window_falls_back_rank_exact(idx):
    """A prefix longer than hi routes to the scoring_boolean expansion —
    results (ids AND scores) identical to search_prefix."""
    fast = [
        (r["doc_id"], r["score"])
        for r in idx.search_prefix_sayt("datab", k=None).collect()
    ]
    exact = [
        (r["doc_id"], r["score"])
        for r in idx.search_prefix("datab", k=None).collect()
    ]
    assert fast == exact
    one = [
        (r["doc_id"], r["score"])
        for r in idx.search_prefix_sayt("d", k=None).collect()
    ]
    assert one == [
        (r["doc_id"], r["score"])
        for r in idx.search_prefix("d", k=None).collect()
    ]


def test_sayt_requires_attachment(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sayt") / "bare")
    build_index(spark, corpus, d, num_segments=2, num_chunks=1)
    bare = InvertedIndex(spark, d)
    with pytest.raises(ValueError, match="no sayt index"):
        bare.search_prefix_sayt("da")


def test_sayt_fuzz_match_set_identity(idx, corpus):
    """Random prefixes of random lengths (1..6): the accelerated path's
    MATCH SET equals the dictionary-expansion path's for every prefix —
    in-window ones through the companion lookup, out-of-window ones
    through the rank-exact fallback (which must also be score-equal)."""
    import random

    from elasticsearch_assets_spark.analysis.tokenizer import tokenize_series

    pdf = corpus.select("text").limit(50).toPandas()
    vocab = sorted({t for toks in tokenize_series(pdf["text"]) for t in toks})
    rng = random.Random(7)
    seen = set()
    for _ in range(15):
        tok = rng.choice(vocab)
        p = tok[: rng.randint(1, min(6, len(tok)))]
        if p in seen:
            continue
        seen.add(p)
        fast = idx.search_prefix_sayt(p, k=None)
        exact = idx.search_prefix(p, k=None)
        assert _ids(fast) == _ids(exact), p
        if not 2 <= len(p) <= 4:  # fallback arm: scores must match too
            assert [
                (r["doc_id"], r["score"]) for r in fast.collect()
            ] == [(r["doc_id"], r["score"]) for r in exact.collect()], p


def test_sayt_respects_main_index_deletes(spark, corpus, tmp_path_factory):
    """Deleting on the MAIN index hides the docs from the accelerated
    path immediately (ES's index_prefixes subfield shares deletes) —
    without touching the companion's tombstone files."""
    import glob as _glob
    import os as _os

    d = str(tmp_path_factory.mktemp("saytdel") / "main")
    build_index(spark, corpus, d, num_segments=2, num_chunks=1)
    i = InvertedIndex(spark, d)
    sd = str(tmp_path_factory.mktemp("saytdel") / "companion")
    build_sayt_index(spark, corpus, sd, lo=2, hi=4, num_segments=2)
    i.attach_sayt(InvertedIndex(spark, sd), lo=2, hi=4)
    assert _ids(i.search_prefix_sayt("dat", k=None))
    deleted = _ids(i.search(["data"], k=None))
    assert deleted
    assert i.delete_by_query(["data"], mode="or") == len(deleted)
    after = _ids(i.search_prefix_sayt("dat", k=None))
    assert not after & deleted
    # parity with the exact path, which excludes main tombstones natively
    assert after == _ids(i.search_prefix("dat", k=None))
    # the companion's own tombstone FILES stayed untouched
    assert not _glob.glob(_os.path.join(sd, "tombstones", "*"))


def test_match_bool_prefix_sayt_match_set(idx):
    fast = _ids(idx.match_bool_prefix_sayt("the dat", k=None))
    exact = _ids(idx.match_bool_prefix("the dat", k=None))
    assert fast == exact and fast
    # prefix-only text: pure sayt lookup
    fast1 = _ids(idx.match_bool_prefix_sayt("dat", k=None))
    exact1 = _ids(idx.match_bool_prefix("dat", k=None))
    assert fast1 == exact1
