"""Session-13: weighted_tokens query (ES 8.13 — precomputed sparse
pairs under the field name, pruning_config incl.
only_score_pruned_tokens) and the script_fields response section
(computed hit columns in the engine's one Spark-SQL script dialect).

Reference surface: the reader facade forwards caller-built JSON bodies
straight to ES (/root/reference/asset/elasticsearch_reader/index.js);
query-type semantics from the public ES Query DSL docs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from elasticsearch_assets_spark.query.dsl import search_dsl


@pytest.fixture(scope="module")
def wt_index(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [
        (0, "the spark join table spark shuffle", "en", 34),
        (1, "the join table row filter", "en", 25),
        (2, "the spark row row join order", "de", 28),
        (3, "the the the join row", "en", 20),
        (4, "jolt jolt row order by the", "fr", 26),
        (5, "the spark jolt table shuffle join", "en", 33),
        (6, "the order by table spark spark", "de", 30),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    d = str(tmp_path_factory.mktemp("wtidx"))
    build_index(spark, docs, d, num_segments=2, num_chunks=1)
    return InvertedIndex(spark, d), docs


def _pairs(df):
    return [(r[0], round(r[1], 9)) for r in df.collect()]


def test_weighted_tokens_routes_sparse_kernel(wt_index):
    idx, _ = wt_index
    qv = {"spark": 2.0, "shuffle": 0.5}
    got = _pairs(search_dsl(
        idx, {"query": {"weighted_tokens": {"text": {"tokens": qv}}},
              "size": None}
    ))
    exp = _pairs(idx.search_sparse(qv, k=None))
    assert got == exp and got


def test_weighted_tokens_pruning_config(wt_index):
    idx, _ = wt_index
    qv = {"spark": 1.0, "the": 0.05}
    got = _pairs(search_dsl(
        idx, {"query": {"weighted_tokens": {"text": {
            "tokens": qv,
            "pruning_config": {"tokens_freq_ratio_threshold": 1.2},
        }}}, "size": None}
    ))
    exp = _pairs(idx.search_sparse(
        qv, k=None, prune=True, tokens_freq_ratio_threshold=1.2
    ))
    assert got == exp and got


def test_only_score_pruned_tokens_is_the_complement(wt_index):
    """kept-set scores + pruned-set scores == unpruned scores per doc
    (the rescore contract: the complement pass adds back exactly what
    pruning dropped)."""
    idx, _ = wt_index
    qv = {"spark": 1.0, "the": 0.05}
    full = dict(_pairs(idx.search_sparse(qv, k=None)))
    kept = dict(_pairs(idx.search_sparse(
        qv, k=None, prune=True, tokens_freq_ratio_threshold=1.2
    )))
    pruned = dict(_pairs(idx.search_sparse(
        qv, k=None, prune=True, tokens_freq_ratio_threshold=1.2,
        only_score_pruned_tokens=True,
    )))
    assert kept != full and pruned  # the prune really dropped a token
    for d, s in full.items():
        assert kept.get(d, 0.0) + pruned.get(d, 0.0) == pytest.approx(s)
    # the DSL spelling routes the knob
    got = _pairs(search_dsl(
        idx, {"query": {"weighted_tokens": {"text": {
            "tokens": qv,
            "pruning_config": {"tokens_freq_ratio_threshold": 1.2,
                               "only_score_pruned_tokens": True},
        }}}, "size": None}
    ))
    assert dict(got) == pruned


def test_only_score_pruned_requires_prune(wt_index):
    idx, _ = wt_index
    with pytest.raises(ValueError):
        idx.search_sparse({"spark": 1.0}, only_score_pruned_tokens=True)


def test_script_fields_section(wt_index):
    idx, docs = wt_index
    out = search_dsl(
        idx,
        {"query": {"match": {"text": "spark"}},
         "script_fields": {
             "twice": {"script": {"source": "n_chars * 2"}},
             "loud_lang": {"script": "upper(lang)"},
         },
         "size": 3},
        docs,
    ).collect()
    assert len(out) == 3
    stored = {r["doc_id"]: r for r in docs.collect()}
    base = idx.search("spark", k=3).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in base]
    for r in out:
        assert r["twice"] == stored[r["doc_id"]]["n_chars"] * 2
        assert r["loud_lang"] == stored[r["doc_id"]]["lang"].upper()


def test_script_fields_strictness(wt_index):
    idx, docs = wt_index
    with pytest.raises(ValueError):  # needs corpus
        search_dsl(idx, {"query": {"match": {"text": "spark"}},
                         "script_fields": {"x": {"script": "1"}}})
    with pytest.raises(NotImplementedError):  # entry without a source
        search_dsl(idx, {"query": {"match": {"text": "spark"}},
                         "script_fields": {"x": {"script": {}}}}, docs)
    # empty section is the identity
    got = _pairs(search_dsl(
        idx, {"query": {"match": {"text": "spark"}},
              "script_fields": {}, "size": None}, docs
    ))
    exp = _pairs(search_dsl(
        idx, {"query": {"match": {"text": "spark"}}, "size": None}, docs
    ))
    assert got == exp


def test_sparse_boost_scales_scores_not_pruning(wt_index):
    """Query-level boost on sparse_vector / weighted_tokens multiplies
    every score (linearity) and cannot change the pruning decision (the
    weight rule is a ratio to the best weight — scale-invariant)."""
    idx, _ = wt_index
    qv = {"spark": 1.0, "the": 0.05}
    base = dict(_pairs(search_dsl(
        idx, {"query": {"weighted_tokens": {"text": {
            "tokens": qv,
            "pruning_config": {"tokens_freq_ratio_threshold": 1.2},
        }}}, "size": None}
    )))
    boosted = dict(_pairs(search_dsl(
        idx, {"query": {"weighted_tokens": {"text": {
            "tokens": qv, "boost": 3.0,
            "pruning_config": {"tokens_freq_ratio_threshold": 1.2},
        }}}, "size": None}
    )))
    assert set(base) == set(boosted) and base
    for d, s in base.items():
        assert boosted[d] == pytest.approx(3.0 * s)
    sv = dict(_pairs(search_dsl(
        idx, {"query": {"sparse_vector": {
            "field": "text", "query_vector": qv, "boost": 2.0}},
            "size": None}
    )))
    un = dict(_pairs(search_dsl(
        idx, {"query": {"sparse_vector": {
            "field": "text", "query_vector": qv}}, "size": None}
    )))
    assert set(sv) == set(un)
    for d, s in un.items():
        assert sv[d] == pytest.approx(2.0 * s)


# --- nested query (child passage index + score_mode roll-up) -------------

@pytest.fixture(scope="module")
def nested_setup(spark, wt_index, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.operators.relations import passage_corpus
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    _, docs = wt_index
    passages = passage_corpus(docs, n=3, slot_base=16)
    d = str(tmp_path_factory.mktemp("childidx"))
    build_index(spark, passages, d, num_segments=2, num_chunks=1)
    return InvertedIndex(spark, d), passages


def test_passage_corpus_shape(nested_setup, wt_index):
    _, passages = nested_setup
    _, docs = wt_index
    rows = {r["doc_id"]: r["text"] for r in passages.collect()}
    # doc 0: "the spark join table spark shuffle" -> 2 passages of 3
    assert rows[0 * 16 + 0] == "the spark join"
    assert rows[0 * 16 + 1] == "table spark shuffle"
    # doc 3: 5 tokens -> "the the the", "join row"
    assert rows[3 * 16 + 0] == "the the the"
    assert rows[3 * 16 + 1] == "join row"
    # parent reassembly: passages rejoined == original text
    import collections
    per = collections.defaultdict(list)
    for pid, txt in rows.items():
        per[pid // 16].append((pid % 16, txt))
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for parent, parts in per.items():
        joined = " ".join(t for _, t in sorted(parts))
        assert joined == orig[parent]


def test_nested_score_modes_match_manual(nested_setup, wt_index):
    from elasticsearch_assets_spark.query.dsl import search_dsl

    child_idx, _ = nested_setup
    idx, _ = wt_index
    # child-level hits, straight from the oracle-pinned kernel
    child = {
        r["doc_id"]: r["score"]
        for r in child_idx.search(["spark", "table"], k=None,
                                  mode="or").collect()
    }
    assert child
    import collections
    per = collections.defaultdict(list)
    for pid, s in child.items():
        per[pid // 16].append(s)
    for mode, fn in [
        ("max", max), ("sum", sum), ("min", min),
        ("avg", lambda v: sum(v) / len(v)),
    ]:
        got = dict(_pairs(search_dsl(
            idx,
            {"query": {"nested": {
                "path": "passages",
                "query": {"match": {"text": "spark table"}},
                "score_mode": mode,
            }}, "size": None},
            nested_paths={"passages": (child_idx, 16)},
        )))
        exp = {p: round(fn(v), 9) for p, v in per.items()}
        assert got == exp, mode
    # none: match-only, score 0
    got = _pairs(search_dsl(
        idx,
        {"query": {"nested": {
            "path": "passages",
            "query": {"match": {"text": "spark table"}},
            "score_mode": "none",
        }}, "size": None},
        nested_paths={"passages": (child_idx, 16)},
    ))
    assert got == [(p, 0.0) for p in sorted(per)]
    # boost scales the rolled-up score
    boosted = dict(_pairs(search_dsl(
        idx,
        {"query": {"nested": {
            "path": "passages",
            "query": {"match": {"text": "spark table"}},
            "score_mode": "max", "boost": 2.0,
        }}, "size": None},
        nested_paths={"passages": (child_idx, 16)},
    )))
    for p, v in per.items():
        assert boosted[p] == pytest.approx(2.0 * max(v))


def test_nested_vs_flat_ranking_differs(nested_setup, wt_index):
    """The point of nested: per-passage scoring, not whole-doc — a doc
    whose terms are spread across passages scores lower under MaxP than
    a doc with one dense passage, even when flat BM25 ties them."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    child_idx, _ = nested_setup
    idx, _ = wt_index
    with pytest.raises(NotImplementedError, match="nested"):
        search_dsl(idx, {"query": {"nested": {
            "path": "passages", "query": {"match": {"text": "spark"}},
        }}})
    with pytest.raises(ValueError, match="score_mode"):
        from elasticsearch_assets_spark.query.engine import nested_topk
        nested_topk(
            child_idx.search(["spark"], k=None, mode="or"), 16,
            score_mode="geometric",
        )


def test_nested_inner_hits(nested_setup, wt_index):
    from elasticsearch_assets_spark.query.dsl import search_dsl

    child_idx, _ = nested_setup
    idx, _ = wt_index
    child = {
        r["doc_id"]: r["score"]
        for r in child_idx.search(["spark", "table"], k=None,
                                  mode="or").collect()
    }
    import collections
    per = collections.defaultdict(list)
    for pid, s in child.items():
        per[pid // 16].append((pid % 16, s))
    got = search_dsl(
        idx,
        {"query": {"nested": {
            "path": "passages",
            "query": {"match": {"text": "spark table"}},
            "inner_hits": {"size": 2},
        }}, "size": None},
        nested_paths={"passages": (child_idx, 16)},
    ).collect()
    exp = []
    for parent in sorted(per):
        ranked = sorted(per[parent], key=lambda t: (-t[1], t[0]))[:2]
        for rank, (slot, s) in enumerate(ranked, 1):
            exp.append((parent, slot, round(s, 9), rank))
    assert [
        (r["doc_id"], r["slot"], round(r["child_score"], 9),
         r["child_rank"])
        for r in got
    ] == exp
    with pytest.raises(ValueError, match="size"):
        from elasticsearch_assets_spark.query.engine import nested_inner_hits
        nested_inner_hits(
            child_idx.search(["spark"], k=None, mode="or"), 16, size=0
        )


def test_stored_and_docvalue_fields_alias_fields_api(wt_index):
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx, docs = wt_index
    want = [
        (r["doc_id"], r["lang"])
        for r in search_dsl(
            idx, {"query": {"match": {"text": "spark"}},
                  "fields": ["lang"], "size": 3}, docs
        ).collect()
    ]
    for section in ("stored_fields", "docvalue_fields"):
        got = [
            (r["doc_id"], r["lang"])
            for r in search_dsl(
                idx, {"query": {"match": {"text": "spark"}},
                      section: ["lang"], "size": 3}, docs
            ).collect()
        ]
        assert got == want and got
    none = search_dsl(
        idx, {"query": {"match": {"text": "spark"}},
              "stored_fields": "_none_", "size": 3}, docs
    )
    assert none.columns == ["doc_id", "score"] and none.count() == 3


def test_min_score_on_delegating_kinds_is_loud(wt_index):
    """min_score next to a delegating kind was a silent drop — it raises
    with guidance now; the compiled scoring surface keeps honoring it."""
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx, _ = wt_index
    with pytest.raises(NotImplementedError, match="min_score"):
        search_dsl(idx, {
            "query": {"sparse_vector": {"field": "text",
                                        "query_vector": {"spark": 1.0}}},
            "min_score": 0.5,
        })
    with pytest.raises(NotImplementedError, match="min_score"):
        search_dsl(idx, {
            "query": {"nested": {"path": "p", "query": {}}},
            "min_score": 0.5,
        })
    # the compiled surface still honors it
    allr = dict(_pairs(search_dsl(
        idx, {"query": {"match": {"text": "spark"}}, "size": None}
    )))
    vals = sorted(set(allr.values()))
    assert len(vals) >= 2  # two score tiers in this corpus
    cut = (vals[0] + vals[-1]) / 2  # strictly between tiers
    kept = dict(_pairs(search_dsl(
        idx, {"query": {"match": {"text": "spark"}}, "size": None,
              "min_score": cut}
    )))
    assert kept and kept == {d: s for d, s in allr.items() if s >= cut}


def test_body_rank_rrf_fuses_query_and_knn(spark, wt_index):
    """ES 8.8 `rank: {rrf: ...}`: the body's query and knn result sets
    fuse by reciprocal rank (each list cut to rank_window_size) instead
    of score-summing."""
    import numpy as np

    from elasticsearch_assets_spark.operators.similarity import (
        cosine_topk, rrf_fuse,
    )
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx, docs = wt_index
    rng = np.random.default_rng(3)
    emb = docs.select("doc_id").toPandas()
    emb["embedding"] = [rng.standard_normal(8).tolist() for _ in range(len(emb))]
    corpus = spark.createDataFrame(emb).join(docs, "doc_id")
    qv = rng.standard_normal(8).tolist()
    body = {
        "query": {"match": {"text": "spark table"}},
        "knn": {"field": "embedding", "query_vector": qv, "k": 3},
        "rank": {"rrf": {"rank_window_size": 4, "rank_constant": 10}},
        "size": 5,
    }
    got = _pairs(search_dsl(idx, body, corpus))
    exp = _pairs(rrf_fuse(
        [
            cosine_topk(corpus, qv, k=4, vec_col="embedding",
                        id_col="doc_id"),
            search_dsl(idx, {"query": {"match": {"text": "spark table"}},
                             "size": 4}, corpus),
        ],
        k_const=10, k=5,
    ))
    assert got == exp and got
    with pytest.raises(NotImplementedError, match="rrf"):
        search_dsl(idx, {"query": {"match": {"text": "spark"}},
                         "rank": {"rrf": {}}}, corpus)
    with pytest.raises(NotImplementedError, match="rrf"):
        search_dsl(idx, {**body, "rank": {"fancy": {}}}, corpus)


def test_body_rank_linear(spark, wt_index):
    """ES 8.16 `rank: {linear: ...}`: minmax-normalized weighted sum of
    the knn and query result lists (knn clauses first, query last)."""
    import numpy as np

    from elasticsearch_assets_spark.operators.similarity import (
        cosine_topk, linear_fuse,
    )
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx, docs = wt_index
    rng = np.random.default_rng(5)
    emb = docs.select("doc_id").toPandas()
    emb["embedding"] = [rng.standard_normal(8).tolist() for _ in range(len(emb))]
    corpus = spark.createDataFrame(emb).join(docs, "doc_id")
    qv = rng.standard_normal(8).tolist()
    body = {
        "query": {"match": {"text": "spark table"}},
        "knn": {"field": "embedding", "query_vector": qv, "k": 3},
        "rank": {"linear": {"rank_window_size": 4,
                            "weights": [2.0, 1.0]}},
        "size": 5,
    }
    got = _pairs(search_dsl(idx, body, corpus))
    exp = _pairs(linear_fuse(
        [
            cosine_topk(corpus, qv, k=4, vec_col="embedding",
                        id_col="doc_id"),
            search_dsl(idx, {"query": {"match": {"text": "spark table"}},
                             "size": 4}, corpus),
        ],
        weights=[2.0, 1.0], k=5,
    ))
    assert got == exp and got


def test_retriever_tree(spark, wt_index):
    """ES 8.14 retriever tree: standard/knn leaves, rrf/linear compounds
    nest recursively; the rrf spelling matches the rank.rrf body."""
    import numpy as np

    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx, docs = wt_index
    rng = np.random.default_rng(3)
    emb = docs.select("doc_id").toPandas()
    emb["embedding"] = [rng.standard_normal(8).tolist() for _ in range(len(emb))]
    corpus = spark.createDataFrame(emb).join(docs, "doc_id")
    qv = rng.standard_normal(8).tolist()
    tree = {
        "retriever": {"rrf": {
            "retrievers": [
                {"standard": {"query": {"match": {"text": "spark table"}}}},
                {"knn": {"field": "embedding", "query_vector": qv}},
            ],
            "rank_window_size": 4, "rank_constant": 10,
        }},
        "size": 5,
    }
    got = _pairs(search_dsl(idx, tree, corpus))
    rank_body = {
        "query": {"match": {"text": "spark table"}},
        "knn": {"field": "embedding", "query_vector": qv, "k": 4},
        "rank": {"rrf": {"rank_window_size": 4, "rank_constant": 10}},
        "size": 5,
    }
    exp_raw = _pairs(search_dsl(idx, rank_body, corpus))
    assert dict(got) == dict(exp_raw) and got
    # linear compound with per-entry weights, nesting an rrf child
    nested_tree = {
        "retriever": {"linear": {
            "retrievers": [
                {"retriever": {"standard": {"query": {
                    "match": {"text": "spark"}}}}, "weight": 2.0},
                {"retriever": {"rrf": {"retrievers": [
                    {"standard": {"query": {"match": {"text": "table"}}}},
                    {"knn": {"field": "embedding", "query_vector": qv}},
                ], "rank_window_size": 3}}, "weight": 1.0},
            ],
            "rank_window_size": 4,
        }},
        "size": 5,
    }
    out = search_dsl(idx, nested_tree, corpus).collect()
    # minmax normalizes each list's minimum to 0, so 0.0 totals are legal
    assert out and all(r["score"] >= 0 for r in out)
    assert out[0]["score"] > 0  # and the ranking is non-degenerate
    # strictness
    with pytest.raises(NotImplementedError, match="retriever"):
        search_dsl(idx, {"retriever": {"standard": {
            "query": {"match": {"text": "x"}}}}, "query": {}}, corpus)
    with pytest.raises(NotImplementedError, match="retriever type"):
        search_dsl(idx, {"retriever": {"magic": {}}}, corpus)
    with pytest.raises(NotImplementedError, match="normalizer"):
        search_dsl(idx, {"retriever": {"linear": {"retrievers": [
            {"retriever": {"standard": {"query": {"match": {"text": "a"}}}},
             "normalizer": "minmax"},
            {"retriever": {"standard": {"query": {"match": {"text": "b"}}}},
             "normalizer": "none"},
        ]}}}, corpus)


def test_retriever_text_similarity_reranker(wt_index):
    """8.15 semantic reranker: the child's top-window hits re-score by
    the stand-in semantic kernel over the document field."""
    from elasticsearch_assets_spark.operators.semantic import semantic_topk
    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx, docs = wt_index
    tree = {
        "retriever": {"text_similarity_reranker": {
            "retriever": {"standard": {"query": {
                "match": {"text": "spark table"}}}},
            "inference_text": "table shuffle order",
            "rank_window_size": 4,
        }},
        "size": 4,
    }
    got = _pairs(search_dsl(idx, tree, docs))
    base = search_dsl(
        idx, {"query": {"match": {"text": "spark table"}}, "size": 4}, docs
    )
    import pyspark.sql.functions as SF
    sub = docs.join(base.select("doc_id"), "doc_id")
    exp = _pairs(semantic_topk(sub, "table shuffle order", k=4))
    assert got == exp and got
    # the rerank really reorders vs the child
    child_order = [r["doc_id"] for r in base.collect()]
    assert [d for d, _ in got] != child_order[: len(got)] or len(got) < 4
    with pytest.raises(ValueError, match="corpus"):
        search_dsl(idx, tree)


def test_retriever_filters(spark, wt_index):
    """standard/knn retriever `filter` keys are wired (were the silent-
    drop shape): standard folds into a bool filter context, knn
    pre-filters the scan (every survivor satisfies the filter)."""
    import numpy as np

    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx, docs = wt_index
    rng = np.random.default_rng(7)
    emb = docs.select("doc_id").toPandas()
    emb["embedding"] = [rng.standard_normal(8).tolist() for _ in range(len(emb))]
    corpus = spark.createDataFrame(emb).join(docs, "doc_id")
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    got = search_dsl(idx, {
        "retriever": {"standard": {
            "query": {"match": {"text": "spark table"}},
            "filter": {"term": {"lang": "en"}},
        }}, "size": None}, corpus).collect()
    assert got and all(langs[r["doc_id"]] == "en" for r in got)
    exp = search_dsl(idx, {
        "query": {"bool": {"must": [{"match": {"text": "spark table"}}],
                           "filter": [{"term": {"lang": "en"}}]}},
        "size": None}, corpus).collect()
    assert [(r[0], r[1]) for r in got] == [(r[0], r[1]) for r in exp]
    qv = rng.standard_normal(8).tolist()
    kn = search_dsl(idx, {
        "retriever": {"knn": {
            "field": "embedding", "query_vector": qv, "k": 4,
            "filter": {"term": {"lang": "en"}},
        }}, "size": None}, corpus).collect()
    assert kn and all(langs[r["doc_id"]] == "en" for r in kn)


def test_reader_cache_freshness_across_compaction(spark, tmp_path):
    """ONE handle across a compaction: the layout-keyed reader cache
    serves identical results before and after merge_segments (the key
    moves, the stale file listing is dropped), and the cached reader
    object is REUSED while the layout is unchanged."""
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.index.merge import merge_segments
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [(i, f"alpha beta w{i % 7} gamma") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "idx")
    build_index(spark, df, d, num_segments=8, num_chunks=1)
    idx = InvertedIndex(spark, d)
    before = [(r[0], r[1]) for r in idx.search("alpha beta", k=None).collect()]
    seg_a = idx.segments
    assert idx.segments is seg_a  # unchanged layout -> same reader object
    merge_segments(spark, d, 2, apply_tombstones=True)
    seg_b = idx.segments
    assert seg_b is not seg_a  # compaction moved the key
    after = [(r[0], r[1]) for r in idx.search("alpha beta", k=None).collect()]
    assert after == before


def test_retriever_child_truncates_to_rank_window(spark, wt_index):
    """Round-3 advice #1: a child knn with explicit k LARGER than the
    compound's rank_window_size contributes only its top-`window` ranks
    to the fusion — identical to running it with k == window (ES
    truncates each child result set to rank_window_size before fusing)."""
    import numpy as np

    from elasticsearch_assets_spark.query.dsl import search_dsl

    idx, docs = wt_index
    rng = np.random.default_rng(11)
    emb = docs.select("doc_id").toPandas()
    emb["embedding"] = [rng.standard_normal(8).tolist() for _ in range(len(emb))]
    corpus = spark.createDataFrame(emb).join(docs, "doc_id")
    qv = rng.standard_normal(8).tolist()

    def run(knn_k):
        tree = {
            "retriever": {"rrf": {
                "retrievers": [
                    {"standard": {"query": {"match": {"text": "spark table"}}}},
                    {"knn": {"field": "embedding", "query_vector": qv,
                             "k": knn_k}},
                ],
                "rank_window_size": 3, "rank_constant": 10,
            }},
            "size": 10,
        }
        return [
            (r["doc_id"], round(r["score"], 10))
            for r in search_dsl(idx, tree, corpus).collect()
        ]

    big = run(50)   # k >> window: must be cut to the window
    ref = run(3)    # k == window
    assert big == ref and big
