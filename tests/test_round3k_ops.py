"""Round-3 batch 19: fuzzy completion, _count API, indices_boost."""

from __future__ import annotations

import pytest

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.query.sharded import ShardedIndex


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 800, partitions=4).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_k") / "i")
    build_index(spark, corpus, d, num_segments=4, num_chunks=1)
    return InvertedIndex(spark, d)


def test_completion_fuzzy_ranks_exact_first(index):
    rows = index.suggest_completion_fuzzy("quer", size=10, fuzziness=1).collect()
    assert rows, "expected candidates"
    # exact-prefix block strictly precedes the fuzzy block
    exact_flags = [r["exact"] for r in rows]
    assert exact_flags == sorted(exact_flags, reverse=True)
    assert any(r["suggestion"] == "query" and r["exact"] for r in rows)
    # typo prefix: no exact match, still suggests the real term
    typo = index.suggest_completion_fuzzy("quary", size=5, fuzziness=1).collect()
    assert any(r["suggestion"] == "query" for r in typo)
    assert all(not r["exact"] for r in typo if r["suggestion"] == "query")
    with pytest.raises(ValueError, match="non-empty"):
        index.suggest_completion_fuzzy("")
    with pytest.raises(ValueError, match="fuzziness"):
        index.suggest_completion_fuzzy("a", fuzziness=-1)


def test_count_query_matches_search(index, corpus):
    n = index.count_query("spark AND jo*", corpus)
    m = index.search_querystring("spark AND jo*", corpus, k=None).count()
    assert n == m > 0


def test_indices_boost_rank_and_scores(spark, corpus, index, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idx_ib"))
    dirs = []
    for p in (0, 1):
        d = f"{base}/s{p}"
        build_index(
            spark, corpus.where(f"doc_id % 2 = {p}"), d,
            num_segments=2, num_chunks=1,
        )
        dirs.append(d)
    sharded = ShardedIndex(spark, dirs)
    plain = dict(sharded.search_local(["spark", "join"], k=None))
    boosted = dict(
        sharded.search_local(["spark", "join"], k=None, boosts=[1.0, 2.0])
    )
    assert set(plain) == set(boosted)
    for d, s in plain.items():
        want = s * (2.0 if d % 2 == 1 else 1.0)
        assert boosted[d] == pytest.approx(want, rel=1e-12)
    # global-stats invariant: unboosted sharded == monolithic
    mono = dict(
        (r["doc_id"], r["score"])
        for r in index.search(["spark", "join"], k=None).collect()
    )
    for d, s in plain.items():
        assert s == pytest.approx(mono[d], rel=1e-12)
    with pytest.raises(ValueError, match="one multiplier per shard"):
        sharded.search_local(["spark"], boosts=[1.0])


def test_terminate_after_contract(index):
    full = index.search(["spark"], k=None).collect()
    first_ids = sorted(r["doc_id"] for r in full)[:30]
    scores = {r["doc_id"]: r["score"] for r in full}
    got = index.search_terminate_after(["spark"], 30, k=None).collect()
    assert sorted(r["doc_id"] for r in got) == first_ids
    for r in got:
        assert r["score"] == scores[r["doc_id"]]  # global stats untouched
    got10 = index.search_terminate_after(["spark"], 30, k=10).collect()
    want10 = sorted(
        ((scores[d], d) for d in first_ids), key=lambda t: (-t[0], t[1])
    )[:10]
    assert [(r["score"], r["doc_id"]) for r in got10] == want10
    with pytest.raises(ValueError, match="terminate_after"):
        index.search_terminate_after(["spark"], 0)


def test_facet_terms_partition_covers_keyspace(spark, index, corpus):
    from collections import Counter

    from elasticsearch_assets_spark.analysis.tokenizer import tokenize_series
    from elasticsearch_assets_spark.operators.facets import (
        facet_terms_partition,
    )

    matches = index.search(["spark"], k=None)
    parts: dict = {}
    for p in range(3):
        for r in facet_terms_partition(
            matches, corpus, "text", p, 3, n=10_000
        ).collect():
            assert r["term"] not in parts  # disjoint
            parts[r["term"]] = r["doc_count"]
    ids = {r["doc_id"] for r in matches.select("doc_id").collect()}
    pdf = corpus.select("doc_id", "text").toPandas()
    full: Counter = Counter()
    for d, ts in zip(pdf["doc_id"], tokenize_series(pdf["text"])):
        if int(d) in ids:
            full.update(set(ts))
    assert parts == dict(full)  # covering with identical doc counts
    with pytest.raises(ValueError, match="partition must"):
        facet_terms_partition(matches, corpus, "text", 5, 3)
