"""Round-3 batch 31: query rules, _mtermvectors."""

from __future__ import annotations

import pytest

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.query.rules import (
    match_rules,
    search_with_rules,
)


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_v") / "i")
    build_index(spark, pages_df(spark, 500, partitions=4), d,
                num_segments=4, num_chunks=1)
    return InvertedIndex(spark, d)


RULES = [
    {"rule_id": "r1", "type": "pinned",
     "criteria": [{"type": "contains", "metadata": "user_query",
                   "values": ["spark"]}],
     "ids": [7, 3]},
    {"rule_id": "r2", "type": "pinned",
     "criteria": [{"type": "always"}],
     "ids": [3, 9]},  # 3 already pinned -> keeps rank from r1
    {"rule_id": "r3", "type": "exclude",
     "criteria": [{"type": "prefix", "metadata": "user_query",
                   "values": ["spark"]}],
     "ids": [11, 3]},  # 3 is pinned -> pin wins
    {"rule_id": "r4", "type": "exclude",
     "criteria": [{"type": "exact", "metadata": "user_query",
                   "values": ["nope"]}],
     "ids": [999]},
]


def test_match_rules_semantics():
    pins, excl = match_rules(RULES, {"user_query": "spark join"})
    assert pins == [7, 3, 9]
    assert excl == {11}
    pins2, excl2 = match_rules(RULES, {"user_query": "other"})
    assert pins2 == [3, 9] and excl2 == set()
    with pytest.raises(ValueError, match="unknown rule type"):
        match_rules([{"type": "boost", "criteria": [{"type": "always"}]}], {})
    with pytest.raises(ValueError, match="unknown criteria type"):
        match_rules([{"type": "pinned",
                      "criteria": [{"type": "regex"}]}], {})
    with pytest.raises(ValueError, match="at least one criterion"):
        match_rules([{"type": "pinned", "criteria": []}], {})


def test_search_with_rules_pins_and_excludes(index):
    organic = [r["doc_id"] for r in index.search("spark join", k=12, mode="or").collect()]
    out = search_with_rules(index, "spark join", RULES, k=10, mode="or").collect()
    got = [(r["rank"], r["doc_id"]) for r in out]
    assert [d for _, d in got[:3]] == [7, 3, 9]      # pins in rule order
    tail = [d for _, d in got[3:]]
    assert 11 not in tail                            # excluded
    assert all(d not in (7, 3, 9) for d in tail)     # pins deduped
    want_tail = [d for d in organic if d not in (7, 3, 9, 11)][:7]
    assert tail == want_tail                         # organic order kept
    assert [r for r, _ in got] == list(range(1, 11))


def test_mtermvectors_fused(index):
    single = {
        (3, r["term"]): (r["tf"], r["df"])
        for r in index.termvectors(3).collect()
    }
    single.update({
        (9, r["term"]): (r["tf"], r["df"])
        for r in index.termvectors(9).collect()
    })
    multi = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"])
        for r in index.mtermvectors([3, 9, 10**9]).collect()
    }
    assert multi == single  # unknown id contributes nothing
    assert index.mtermvectors([10**9]).count() == 0


def test_analyze_filter_chain(index):
    toks = index.analyze("The Tables JOINS the queries", filters=[])
    assert toks == list(enumerate(["the", "tables", "joins", "the", "queries"]))
    stopped = index.analyze(
        "The Tables JOINS the queries", filters=["stop"]
    )
    assert [t for _, t in stopped] == ["tables", "joins", "queries"]
    stemmed = index.analyze(
        "The Tables JOINS the queries", filters=["stop", "s_stem"]
    )
    assert [t for _, t in stemmed] == ["table", "join", "query"]
    uniq = index.analyze("a b a b c", filters=["unique"])
    assert [t for _, t in uniq] == ["a", "b", "c"]
    edge = index.analyze("query", filters=["edge_ngram"])
    assert [t for _, t in edge] == ["qu", "que", "quer", "query"]
    # `reverse` graduated to a supported filter in session 8
    with pytest.raises(ValueError, match="unknown token filter"):
        index.analyze("x", filters=["bogus_filter"])


def test_bloom_prejoin_dedup_exact_and_pruning(spark):
    from elasticsearch_assets_spark.operators.dedup import bloom_prejoin_dedup

    base = spark.createDataFrame(
        [(i, f"base document number {i} content") for i in range(500)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        # 100 exact dups of base + 400 novel docs
        [(i, f"base document number {i} content") for i in range(100)]
        + [(10_000 + i, f"fresh text {i} never seen") for i in range(400)],
        "doc_id long, text string",
    )
    out = sorted(
        r["doc_id"]
        for r in bloom_prejoin_dedup(new, base, m_bits=1 << 14).collect()
    )
    assert out == sorted(10_000 + i for i in range(400))  # exact output
    # tiny filter (high FP) still yields the exact result — the verify
    # join corrects every false positive
    out2 = sorted(
        r["doc_id"]
        for r in bloom_prejoin_dedup(new, base, m_bits=1 << 8).collect()
    )
    assert out2 == out
    # determinism across runs
    out3 = sorted(
        r["doc_id"]
        for r in bloom_prejoin_dedup(new, base, m_bits=1 << 14).collect()
    )
    assert out3 == out
    with pytest.raises(ValueError, match="power of two"):
        bloom_prejoin_dedup(new, base, m_bits=1000)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_prejoin_dedup(new, base, k_hashes=0)


def test_warm_cache_identity_and_staleness_contract(index):
    cold = [(r["doc_id"], r["score"])
            for r in index.search(["spark", "join"], k=20).collect()]
    index.warm()
    warm = [(r["doc_id"], r["score"])
            for r in index.search(["spark", "join"], k=20).collect()]
    assert warm == cold  # bit-identical through the pinned scans
    # warm() is idempotent
    index.warm()
    # a warmed handle serves the warmed snapshot; cool() returns to live
    from elasticsearch_assets_spark.index.tombstones import (
        add_tombstones,
        clear_tombstones,
    )

    victim = cold[0][0]
    try:
        add_tombstones(index.index_dir, [victim])
        index.refresh_tombstones()
        # tombstones are handle state, not scan state: visible even warm
        got = {r["doc_id"] for r in index.search(["spark", "join"], k=20).collect()}
        assert victim not in got
    finally:
        index.cool()
        clear_tombstones(index.index_dir)
        index.refresh_tombstones()
    assert index.search(["spark", "join"], k=20).collect()[0]["doc_id"] == victim
