"""Round-3 session-7 batch: scroll facade (keyset batches), rescorer
retriever tree (rescore_with over rrf_fuse), and seasonal MAD anomaly
scoring.

Contract twins: scroll_page3, retriever_tree, anomaly_mad.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators.anomaly import mad_outliers
from elasticsearch_assets_spark.operators.similarity import (
    rescore_with, rrf_fuse,
)
from elasticsearch_assets_spark.sources.scroll import (
    scroll_page, scroll_pages,
)


@pytest.fixture(scope="module")
def nums(spark):
    # 2 sort-key duplicates per n value force the tiebreak column to matter
    rows = [(i, i // 2) for i in range(23)]
    return spark.createDataFrame(rows, "id long, n long")


# --- scroll -----------------------------------------------------------------

def test_scroll_pages_cover_everything_once(nums):
    seen = []
    for page in scroll_pages(nums, ["n", "id"], 5):
        assert len(page) <= 5
        seen.extend(r["id"] for r in page)
    assert seen == list(range(23))  # id order == (n, id) order here


def test_scroll_page_equals_offset(nums):
    pages = scroll_pages(nums, ["n", "id"], 5)
    next(pages)
    p2 = next(pages)
    cursor = (p2[-1]["n"], p2[-1]["id"])
    got = [r["id"] for r in
           scroll_page(nums, ["n", "id"], 5, after=cursor).collect()]
    assert got == [10, 11, 12, 13, 14]


def test_scroll_descending_and_short_last_page(nums):
    pages = list(scroll_pages(nums, ["n", "id"], 10, ascending=False))
    assert [len(p) for p in pages] == [10, 10, 3]
    assert pages[0][0]["id"] == 22 and pages[-1][-1]["id"] == 0


def test_scroll_cursor_arity_checked(nums):
    with pytest.raises(ValueError, match="arity"):
        scroll_page(nums, ["n", "id"], 5, after=(3,))


def test_scroll_max_pages_bounds(nums):
    assert len(list(scroll_pages(nums, ["n", "id"], 5, max_pages=2))) == 2


# --- rescorer retriever ------------------------------------------------------

def test_rescore_with_reranks_window(spark):
    hits = spark.createDataFrame(
        [(1, 10.0), (2, 9.0), (3, 8.0)], "doc_id long, score double"
    )
    feats = spark.createDataFrame(
        [(1, 0), (2, 500), (3, 100), (99, 9999)], "doc_id long, n long"
    )
    out = rescore_with(hits, feats, "n / 100.0", k=3).collect()
    # combined: 1 -> 10.0, 2 -> 14.0, 3 -> 9.0; doc 99 not in window
    assert [(r.doc_id, r.score) for r in out] == [
        (2, 14.0), (1, 10.0), (3, 9.0)
    ]


def test_rescore_with_missing_feature_keeps_weighted_score(spark):
    hits = spark.createDataFrame(
        [(1, 4.0), (2, 3.0)], "doc_id long, score double"
    )
    feats = spark.createDataFrame([(2, 50)], "doc_id long, n long")
    out = rescore_with(
        hits, feats, "n / 10.0", k=2, query_weight=0.5
    ).collect()
    # doc 1 has no feature row: 0.5*4 = 2.0; doc 2: 0.5*3 + 5 = 6.5
    assert [(r.doc_id, r.score) for r in out] == [(2, 6.5), (1, 2.0)]


def test_rescore_composes_with_rrf(spark):
    a = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 9.0), (2, 1.0)], "doc_id long, score double"
    )
    fused = rrf_fuse([a, b], k_const=60, k=3)
    feats = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, n long"
    )
    out = rescore_with(fused, feats, "0.0", k=3).collect()
    # rescore with zero feature == the rrf order itself
    assert [r.doc_id for r in out] == [
        r.doc_id for r in fused.collect()
    ]


# --- MAD anomaly -------------------------------------------------------------

def test_mad_outliers_flags_the_planted_spike(spark):
    rows = [(i, i % 2, 10.0 + (i % 5)) for i in range(40)]
    rows.append((100, 0, 500.0))  # planted anomaly in season 0
    df = spark.createDataFrame(rows, "id long, season_src int, v double")
    out = mad_outliers(df, "v", F.col("season_src")).collect()
    assert [r.id for r in out] == [100]
    assert out[0].score > 100


def test_mad_outliers_constant_season_yields_nothing(spark):
    df = spark.createDataFrame(
        [(i, 0, 7.0) for i in range(10)] + [(99, 0, 7.0)],
        "id long, season_src int, v double",
    )
    assert mad_outliers(df, "v", F.col("season_src")).count() == 0


def test_mad_outliers_threshold_validated(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "id long, s int, v double")
    with pytest.raises(ValueError, match="threshold"):
        mad_outliers(df, "v", F.col("s"), threshold=0.0)


# --- general spans-near-spans kernel -----------------------------------------

def _spans(*triples):
    import numpy as np
    if not triples:
        e = np.array([], dtype="int64")
        return e, e, e
    d, s, e = zip(*triples)
    import numpy as np
    return (np.array(d, dtype="int64"), np.array(s, dtype="int64"),
            np.array(e, dtype="int64"))


def test_near_span_pairs_width_aware_slop():
    from elasticsearch_assets_spark.query.phrase import near_span_pairs
    # a: width-2 span [2,4) in doc 1; b: width-1 [5,6) -> cover 4, widths 3
    a = _spans((1, 2, 4))
    b = _spans((1, 5, 6))
    d, s, e = near_span_pairs(a, b, slop=1)
    assert list(d) == [1] and list(s) == [2] and list(e) == [6]
    d, s, e = near_span_pairs(a, b, slop=0)
    assert d.size == 0  # gap of 1 needs slop >= 1


def test_near_span_pairs_ordered_requires_non_overlap_in_order():
    from elasticsearch_assets_spark.query.phrase import near_span_pairs
    a = _spans((1, 5, 6))
    b = _spans((1, 2, 3))
    # unordered matches (cover 4 - widths 2 = 2)
    assert near_span_pairs(a, b, slop=2)[0].size == 1
    # ordered: b starts before a ends -> no match
    assert near_span_pairs(a, b, slop=2, ordered=True)[0].size == 0
    assert near_span_pairs(b, a, slop=2, ordered=True)[0].size == 1


def test_near_span_pairs_overlap_matches_any_slop():
    from elasticsearch_assets_spark.query.phrase import near_span_pairs
    a = _spans((3, 2, 5))
    b = _spans((3, 3, 4))  # nested inside a: cover 3 - widths 4 = -1
    assert near_span_pairs(a, b, slop=0)[0].size == 1


def test_near_span_pairs_doc_isolation_and_empty():
    from elasticsearch_assets_spark.query.phrase import near_span_pairs
    a = _spans((1, 0, 1), (2, 10, 11))
    b = _spans((2, 11, 12), (3, 0, 1))
    d, s, e = near_span_pairs(a, b, slop=0)
    assert list(d) == [2] and list(s) == [10] and list(e) == [12]
    assert near_span_pairs(_spans(), b, slop=5)[0].size == 0


# --- BPE merge-pair counting ---------------------------------------------------

def test_bpe_pair_counts_hand_checked(spark):
    from elasticsearch_assets_spark.operators.textstats import bpe_pair_counts
    df = spark.createDataFrame(
        [(0, "low low lower"), (1, "NEW low")], "doc_id long, text string"
    )
    out = {r.pair: r.cnt for r in bpe_pair_counts(df, n=10).collect()}
    # words: low x3, lower x1, new x1 (lowercased)
    assert out["lo"] == 4 and out["ow"] == 4
    assert out["we"] == 1 and out["er"] == 1
    assert out["ne"] == 1 and out["ew"] == 1
    assert len(out) == 6


def test_bpe_pair_counts_orders_and_limits(spark):
    from elasticsearch_assets_spark.operators.textstats import bpe_pair_counts
    df = spark.createDataFrame(
        [(0, "ab ab ac")], "doc_id long, text string"
    )
    rows = bpe_pair_counts(df, n=1).collect()
    assert [(r.pair, r.cnt) for r in rows] == [("ab", 2)]
    import pytest as _pt
    with _pt.raises(ValueError):
        bpe_pair_counts(df, n=0)


def test_bpe_pair_counts_skips_single_char_words(spark):
    from elasticsearch_assets_spark.operators.textstats import bpe_pair_counts
    df = spark.createDataFrame([(0, "a a a bc")], "doc_id long, text string")
    out = {r.pair: r.cnt for r in bpe_pair_counts(df).collect()}
    assert out == {"bc": 1}


# --- sparse-vector pruning + filter sweep --------------------------------------

def test_sparse_prune_drops_frequent_weak_tokens(spark, tmp_path):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex
    rows = [(i, ("the common " * 5) + ("rare" if i == 0 else "filler"))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx")
    build_index(spark, df, out, num_segments=2, num_chunks=1)
    idx = InvertedIndex(spark, out)
    w = {"rare": 1.0, "the": 0.05}
    pruned = idx.search_sparse(w, k=None, prune=True,
                               tokens_freq_ratio_threshold=1.5)
    # 'the' (df 20 > 1.5 * avg_df 10.5, weight 0.05 < 0.4) pruned ->
    # only doc 0 scores (via 'rare')
    assert [r.doc_id for r in pruned.collect()] == [0]
    # strong weight keeps an equally frequent token (both-conditions rule)
    kept = idx.search_sparse({"rare": 1.0, "the": 0.9}, k=None, prune=True,
                             tokens_freq_ratio_threshold=1.5)
    assert kept.count() == 20


def test_sparse_prune_all_pruned_is_empty(spark, tmp_path):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex
    rows = [(i, "the the x") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx2")
    build_index(spark, df, out, num_segments=1, num_chunks=1)
    idx = InvertedIndex(spark, out)
    # single matched token: avg_df == its own df -> ratio can never
    # exceed 1 -> never pruned (degenerate case stays scored)
    assert idx.search_sparse({"the": 0.01}, k=None, prune=True).count() == 10


def test_filter_sweep_monotone_and_exact(spark):
    from elasticsearch_assets_spark.operators.textstats import filter_sweep
    rows = [(i, " ".join(f"w{j}" for j in range(5 + 10 * i)))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = filter_sweep(df, [0.15, 0.35, 0.55]).collect()
    assert [r.threshold for r in out] == [0.15, 0.35, 0.55]
    docs = [r.docs_kept for r in out]
    toks = [r.tokens_kept for r in out]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert out[0].doc_frac <= 1.0 and out[0].token_frac <= 1.0
    import pytest as _pt
    with _pt.raises(ValueError):
        filter_sweep(df, [])


# --- cross-field field_masking_span ---------------------------------------------

@pytest.fixture(scope="module")
def masked_pair(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex
    base = tmp_path_factory.mktemp("fm")
    rows = [
        (0, "alpha beta gamma delta"),      # title: alpha beta
        (1, "gamma beta alpha delta"),      # title: gamma beta
        (2, "delta delta alpha beta"),      # title: delta delta
        (3, "beta alpha"),                  # title: beta alpha
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    title = df.selectExpr(
        "doc_id",
        "concat_ws(' ', slice(split(text, ' '), 1, 2)) AS title"
    )
    tdir, ldir = str(base / "text"), str(base / "title")
    build_index(spark, df, tdir, num_segments=2, num_chunks=1,
                positions=True)
    build_index(spark, title, ldir, id_col="doc_id", text_col="title",
                num_segments=2, num_chunks=1, positions=True)
    return InvertedIndex(spark, tdir), InvertedIndex(spark, ldir)


def test_masked_clause_restricted_to_other_field(masked_pair):
    text_idx, title_idx = masked_pair
    # gamma near beta, but gamma's positions come from the TITLE (first
    # 2 tokens): doc 1 has title-gamma@0 near text-beta@1; doc 0's gamma
    # is at position 2 — outside the title, so masked lookup misses it
    out = text_idx.search_span_near_masked(
        title_idx, ("term", "beta"), ("term", "gamma"), slop=0, k=None
    ).collect()
    assert [r.doc_id for r in out] == [1]


def test_masked_scoring_uses_primary_terms_only(masked_pair):
    text_idx, title_idx = masked_pair
    out = text_idx.search_span_near_masked(
        title_idx, ("term", "beta"), ("term", "alpha"), slop=3, k=None
    )
    rows = {r.doc_id: r.score for r in out.collect()}
    # every doc has alpha in title or text; matching docs score as the
    # plain 'beta' query does (masked term contributes no score)
    plain = {r.doc_id: r.score
             for r in text_idx.search(["beta"], k=None).collect()}
    for d, s in rows.items():
        assert s == plain[d]


def test_masked_geometry_mismatch_raises(spark, masked_pair, tmp_path):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex
    text_idx, _ = masked_pair
    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    odir = str(tmp_path / "odd")
    build_index(spark, df, odir, num_segments=4, num_chunks=1,
                positions=True)
    with pytest.raises(ValueError, match="segment geometry"):
        text_idx.search_span_near_masked(
            InvertedIndex(spark, odir), ("term", "x"), ("term", "y")
        )


# --- URL quality pre-filters ------------------------------------------------------

def test_url_quality_flags(spark):
    from elasticsearch_assets_spark.operators.urls import url_quality_flags
    rows = [
        (0, "http://ads.tracker.net/x"),
        (1, "http://ok.org/feed/1.XML"),
        (2, "http://ok.org/a/b/c/d/e/f/g/h"),
        (3, "http://ok.org/p?q=" + "x" * 100),
        (4, "http://ok.org/fine"),
        (5, "http://tracker.net/bare-host"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in
           url_quality_flags(df, "url", ["tracker.net"]).collect()}
    assert out[0].blocked_domain and not out[0].keep
    assert out[1].bad_ext  # extension match is case-insensitive
    assert out[2].deep_path
    assert out[3].long_query
    assert out[4].keep and not any(
        [out[4].blocked_domain, out[4].bad_ext, out[4].deep_path,
         out[4].long_query])
    assert out[5].blocked_domain  # exact host, not just subdomain
    import pytest as _pt
    with _pt.raises(ValueError):
        url_quality_flags(df, "url", [])


def test_near_span_pairs_fuzz_vs_brute_force():
    import random
    import numpy as np
    from elasticsearch_assets_spark.query.phrase import near_span_pairs

    rng = random.Random(7)

    def brute(a, b, slop, ordered):
        out = set()
        for i in range(a[0].size):
            for j in range(b[0].size):
                if a[0][i] != b[0][j]:
                    continue
                s = min(a[1][i], b[1][j])
                e = max(a[2][i], b[2][j])
                w = (a[2][i] - a[1][i]) + (b[2][j] - b[1][j])
                if (e - s) - w > slop:
                    continue
                if ordered and b[1][j] < a[2][i]:
                    continue
                out.add((int(a[0][i]), int(s), int(e)))
        return out

    def mk(n):
        d = np.array(sorted(rng.randrange(4) for _ in range(n)),
                     dtype=np.int64)
        s = np.array([rng.randrange(12) for _ in range(n)], dtype=np.int64)
        w = np.array([1 + rng.randrange(3) for _ in range(n)],
                     dtype=np.int64)
        return d, s, s + w

    for _ in range(200):
        a, b = mk(rng.randrange(1, 7)), mk(rng.randrange(1, 7))
        slop = rng.randrange(0, 5)
        ordered = rng.random() < 0.5
        got = near_span_pairs(a, b, slop, ordered=ordered)
        gs = set(zip(got[0].tolist(), got[1].tolist(), got[2].tolist()))
        assert gs == brute(a, b, slop, ordered)
