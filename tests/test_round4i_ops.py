"""Session-12 batch 1: ES bool optional-should scoring — must + should in
ONE body (the composition the DSL used to reject outright). Matching is
the must side alone; each should clause ADDS weight × its BM25 sum;
minimum_should_match counts matched should CLAUSES. Semantics are pinned
against the already-oracle-pinned kernels (AND search + per-clause OR
search composed frame-side), the double-count contract (a term in BOTH
sides scores twice — Lucene sums independent clause scores), and the
segment-count rank identity.

Reference surface: the reader facade forwards caller-built JSON bodies
straight to ES (/root/reference/asset/elasticsearch_reader/index.js);
bool must/should semantics from the public ES bool-query docs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.query.dsl import search_dsl


@pytest.fixture(scope="module")
def opt_index(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [
        (0, "spark join table spark shuffle"),
        (1, "join table row filter"),
        (2, "spark row row join order"),
        (3, "table table join spark row"),
        (4, "jolt jolt row order by"),
        (5, "spark jolt table shuffle join"),
        (6, "order by table spark spark"),
        (7, "spark join hash merge partition"),
        (8, "hash merge hash row order"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("optidx"))
    build_index(spark, docs, d, num_segments=2, num_chunks=1)
    return InvertedIndex(spark, d), docs


def _pairs(df):
    return [(r[0], round(r[1], 9)) for r in df.collect()]


def _expected(idx, must, clauses, msm=0):
    """Compose from oracle-pinned kernels: AND scores + per-clause OR
    scores left-joined on the must match set."""
    base = idx.search(must, k=None, mode="and").select(
        "doc_id", F.col("score").alias("s")
    )
    nmatched = F.lit(0)
    total = F.col("s")
    for i, (terms, w) in enumerate(clauses):
        cl = idx.search(terms, k=None, mode="or").select(
            "doc_id", (F.col("score") * F.lit(w)).alias(f"c{i}")
        )
        base = base.join(cl, "doc_id", "left")
        nmatched = nmatched + F.when(
            F.col(f"c{i}").isNotNull(), F.lit(1)
        ).otherwise(F.lit(0))
        total = total + F.coalesce(F.col(f"c{i}"), F.lit(0.0))
    out = base.select("doc_id", total.alias("score"), nmatched.alias("nm"))
    if msm:
        out = out.where(F.col("nm") >= msm)
    return out.select("doc_id", "score").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )


def test_opt_should_matches_kernel_composition(opt_index):
    idx, _ = opt_index
    clauses = [(["table"], 1.0), (["hash", "merge"], 2.0)]
    got = idx.search_optional_should(["spark", "join"], clauses, k=None)
    exp = _expected(idx, ["spark", "join"], clauses)
    assert _pairs(got) == _pairs(exp)
    # match set = the must AND set, never widened by should postings
    and_ids = {r[0] for r in idx.search(["spark", "join"], k=None).collect()}
    assert {r[0] for r in got.collect()} == and_ids


def test_opt_should_double_counts_shared_term(opt_index):
    idx, _ = opt_index
    # `join` in BOTH must and a should clause: each clause scores
    # independently and sums — the Lucene bool contract
    got = idx.search_optional_should(
        ["spark", "join"], [(["join"], 1.0)], k=None
    )
    exp = _expected(idx, ["spark", "join"], [(["join"], 1.0)])
    assert _pairs(got) == _pairs(exp)
    base = dict(_pairs(idx.search(["spark", "join"], k=None)))
    for doc, s in _pairs(got):
        assert s > base[doc]  # join's contribution genuinely added again


def test_opt_should_msm_counts_clauses(opt_index):
    idx, _ = opt_index
    clauses = [(["join"], 1.0), (["table"], 1.0), (["hash"], 1.0)]
    for m in (0, 1, 2, 3):
        got = idx.search_optional_should(
            ["spark"], clauses, k=None, minimum_should_match=m
        )
        exp = _expected(idx, ["spark"], clauses, msm=m)
        assert _pairs(got) == _pairs(exp), f"msm={m}"
    # msm beyond the clause count: empty, not an error
    assert (
        idx.search_optional_should(
            ["spark"], clauses, k=None, minimum_should_match=4
        ).count()
        == 0
    )


def test_opt_should_must_not_and_missing_terms(opt_index):
    idx, _ = opt_index
    # must_not composes (index-assisted exclusion before ranking)
    got = idx.search_optional_should(
        ["spark"], [(["table"], 1.0)], k=None, must_not=["jolt"]
    )
    jolt_ids = {r[0] for r in idx.search(["jolt"], k=None).collect()}
    assert {r[0] for r in got.collect()}.isdisjoint(jolt_ids)
    # a should clause with only out-of-vocabulary terms contributes 0
    a = _pairs(idx.search_optional_should(["spark"], [(["zzzz"], 5.0)], k=None))
    b = _pairs(idx.search(["spark"], k=None))
    assert a == b
    # missing must term: empty result (AND semantics)
    assert (
        idx.search_optional_should(["zzzz"], [(["table"], 1.0)], k=None).count()
        == 0
    )


def test_opt_should_segment_count_rank_identity(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [
        (i, t)
        for i, t in enumerate(
            [
                "spark join table",
                "spark hash merge join",
                "table hash spark",
                "join join spark table hash",
                "merge spark join",
                "spark table",
            ]
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    results = []
    for nseg in (1, 3):
        d = str(tmp_path_factory.mktemp(f"optseg{nseg}"))
        build_index(spark, docs, d, num_segments=nseg, num_chunks=1)
        idx = InvertedIndex(spark, d)
        results.append(
            _pairs(
                idx.search_optional_should(
                    ["spark"], [(["table"], 1.5), (["hash", "merge"], 1.0)],
                    k=None,
                )
            )
        )
    assert results[0] == results[1]


# -- DSL routing ---------------------------------------------------------------


def test_dsl_bool_must_and_should(opt_index):
    idx, _ = opt_index
    body = {
        "query": {
            "bool": {
                "must": [
                    {"match": {"text": {"query": "spark join",
                                        "operator": "and"}}}
                ],
                "should": [
                    {"match": {"text": "table"}},
                    {"match": {"text": {"query": "hash merge", "boost": 2.0}}},
                ],
            }
        },
        "size": None,
    }
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(
        idx.search_optional_should(
            ["spark", "join"],
            [(["table"], 1.0), (["hash", "merge"], 2.0)],
            k=None,
        )
    )
    assert got == exp
    # a must match with the DEFAULT operator (or) is ONE ≥-1-of group —
    # docs matching either must term rank (clause-level semantics)
    body_or = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "spark join"}}],
                "should": [{"match": {"text": "table"}}],
            }
        },
        "size": None,
    }
    got_or = _pairs(search_dsl(idx, body_or))
    exp_or = _pairs(
        idx.search_optional_should(
            [], [(["table"], 1.0)], k=None, groups=[["join", "spark"]]
        )
    )
    assert got_or == exp_or
    or_ids = {r[0] for r in idx.search(["spark", "join"], k=None,
                                       mode="or").collect()}
    assert {d for d, _ in got_or} == or_ids


def test_dsl_opt_should_msm_and_must_not(opt_index):
    idx, _ = opt_index
    body = {
        "query": {
            "bool": {
                "must": {"match": {"text": "spark"}},
                "should": [
                    {"term": {"text": "join"}},
                    {"term": {"text": "table"}},
                    {"term": {"text": "hash"}},
                ],
                "must_not": [{"term": {"text": "jolt"}}],
                "minimum_should_match": 2,
            }
        },
        "size": None,
    }
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(
        idx.search_optional_should(
            ["spark"],
            [(["join"], 1.0), (["table"], 1.0), (["hash"], 1.0)],
            k=None,
            minimum_should_match=2,
            must_not=["jolt"],
        )
    )
    assert got == exp


def test_dsl_opt_should_strictness(opt_index):
    idx, _ = opt_index
    # structured must next to should: no filtered kernel yet — loud
    with pytest.raises(NotImplementedError):
        search_dsl(
            idx,
            {
                "query": {
                    "bool": {
                        "must": {"range": {"views": {"gte": 1}}},
                        "should": [{"term": {"text": "join"}}],
                    }
                }
            },
        )
    # operator=and inside an optional should clause: ALL-required
    # sub-query semantics — the composed path runs the clause's own AND
    # kernel and LEFT-JOINs it on (session-12 follow-up; parity below in
    # test_dsl_opt_should_composed_clauses)
    # boosted must terms next to should: the composed path keeps the
    # boost on the base kernel only — a must boost can never leak into
    # a should clause's contribution, even for a SHARED term
    got = _pairs(search_dsl(
        idx,
        {
            "query": {
                "bool": {
                    "must": {
                        "match": {"text": {"query": "spark", "boost": 2.0}}
                    },
                    # the shared term `spark` in the should: its clause
                    # contribution must be UNBOOSTED
                    "should": [{"term": {"text": "spark"}},
                               {"term": {"text": "join"}}],
                }
            },
            "size": None,
        },
    ))
    base = idx.search(["spark"], k=None, boosts={"spark": 2.0}).select(
        "doc_id", F.col("score").alias("s")
    )
    c0 = idx.search(["spark"], k=None, mode="or").select(
        "doc_id", F.col("score").alias("c0")
    )
    c1 = idx.search(["join"], k=None, mode="or").select(
        "doc_id", F.col("score").alias("c1")
    )
    exp = _pairs(
        base.join(c0, "doc_id", "left").join(c1, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("s") + F.coalesce("c0", F.lit(0.0))
             + F.coalesce("c1", F.lit(0.0))).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    assert got == exp and got


# -- optional-should under a structured filter ---------------------------------


def test_opt_should_filtered_strategies_rank_identical(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [
        (i, t, float(i * 10))
        for i, t in enumerate(
            [
                "spark join table",
                "spark hash merge join",
                "table hash spark",
                "join join spark table hash",
                "merge spark join",
                "spark table",
                "spark join merge table",
                "hash merge row",
            ]
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "views"])
    d = str(tmp_path_factory.mktemp("optfidx"))
    build_index(spark, docs, d, num_segments=2, num_chunks=1)
    idx = InvertedIndex(spark, d)
    filt = docs.where(F.col("views") >= 20)
    clauses = [(["table"], 1.5), (["hash", "merge"], 1.0)]

    # ground truth from the unfiltered kernel + frame-side semi join
    exp = _pairs(
        idx.search_optional_should(["spark", "join"], clauses, k=None)
        .join(filt.select("doc_id"), "doc_id", "semi")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    assert exp  # non-degenerate

    for strat in ("exhaustive", "broadcast", "cogroup"):
        got = _pairs(
            idx.search_filtered(
                ["spark", "join"], filt, k=None, strategy=strat,
                opt_should=clauses,
            )
        )
        assert got == exp, strat

    # opt_msm counts clauses among filter survivors too
    exp_m = _pairs(
        idx.search_optional_should(
            ["spark", "join"], clauses, k=None, minimum_should_match=2
        )
        .join(filt.select("doc_id"), "doc_id", "semi")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    for strat in ("exhaustive", "broadcast", "cogroup"):
        got = _pairs(
            idx.search_filtered(
                ["spark", "join"], filt, k=None, strategy=strat,
                opt_should=clauses, opt_msm=2,
            )
        )
        assert got == exp_m, strat


def test_dsl_opt_should_with_filter_section(opt_index):
    idx, docs = opt_index
    body = {
        "query": {
            "bool": {
                "must": {"match": {"text": {"query": "spark join",
                                            "operator": "and"}}},
                "should": [
                    {"term": {"text": "table"}},
                    {"match": {"text": {"query": "hash merge",
                                        "boost": 2.0}}},
                ],
                "filter": [{"range": {"doc_id": {"lte": 5}}}],
            }
        },
        "size": None,
    }
    got = _pairs(search_dsl(idx, body, corpus=docs))
    exp = _pairs(
        idx.search_filtered(
            ["spark", "join"], docs.where(F.col("doc_id") <= 5), k=None,
            opt_should=[(["table"], 1.0), (["hash", "merge"], 2.0)],
        )
    )
    assert got == exp
    assert got  # non-degenerate


# -- bool{filter, should}: the ES default minimum_should_match is 0 ------------


def test_dsl_filter_should_default_zero(opt_index):
    idx, docs = opt_index
    filt_ids = set(range(6))  # doc_id <= 5
    body = {
        "query": {"bool": {
            "should": [{"term": {"text": "table"}}],
            "filter": [{"range": {"doc_id": {"lte": 5}}}],
        }},
        "size": None,
    }
    got = _pairs(search_dsl(idx, body, corpus=docs))
    # every filter survivor matches (ES default msm=0 next to a filter)
    assert {d for d, _ in got} == filt_ids
    pos = _pairs(
        idx.search_filtered(
            ["table"], docs.where(F.col("doc_id") <= 5), k=None, mode="or"
        )
    )
    zeros = sorted(filt_ids - {d for d, _ in pos})
    assert got == pos + [(d, 0.0) for d in zeros]  # zeros sort last
    # explicit minimum_should_match: 1 restores the requiring behavior
    body_msm = {
        "query": {"bool": {
            "should": [{"term": {"text": "table"}}],
            "filter": [{"range": {"doc_id": {"lte": 5}}}],
            "minimum_should_match": 1,
        }},
        "size": None,
    }
    assert _pairs(search_dsl(idx, body_msm, corpus=docs)) == pos
    # should-only keeps the ES default of 1 (no zero-score union)
    body_pure = {"query": {"bool": {
        "should": [{"term": {"text": "table"}}]}}, "size": None}
    pure = _pairs(search_dsl(idx, body_pure))
    assert all(s > 0 for _, s in pure)


def test_dsl_terms_sibling_boost_and_prefix_should(opt_index):
    idx, _ = opt_index
    # ES terms query boost is a SIBLING key of the field; it folds into
    # the idf exactly like a match boost (was a silent no-op pre-s12)
    got = _pairs(search_dsl(idx, {"query": {"bool": {"must": [
        {"terms": {"text": ["table", "hash"], "boost": 2.0}},
    ]}}, "size": None}))
    exp = _pairs(
        idx.search([], k=None, mode="and", groups=[["hash", "table"]],
                   boosts={"hash": 2.0, "table": 2.0})
    )
    assert got == exp and got
    # a prefix should-clause next to a must: the dictionary rewrite is
    # ONE group, so it rides the optional-should path like any clause
    got2 = _pairs(search_dsl(idx, {"query": {"bool": {
        "must": [{"term": {"text": "spark"}}],
        "should": [{"prefix": {"text": {"value": "tab", "boost": 3.0}}}],
    }}, "size": None}))
    exp2 = _pairs(
        idx.search_optional_should(
            ["spark"], [(idx.expand_prefix("tab"), 3.0)], k=None
        )
    )
    assert got2 == exp2 and got2


def test_opt_should_serving_and_msearch_parity(opt_index):
    idx, _ = opt_index
    clauses = [(["table"], 1.0), (["hash", "merge"], 2.0)]
    dist = _pairs(
        idx.search_optional_should(
            ["spark"], clauses, k=None, minimum_should_match=1,
            must_not=["jolt"],
        )
    )
    # serving path: same kernel over driver-fetched postings
    local = [
        (d, round(s, 9))
        for d, s in idx.search_local(
            ["spark"], k=None, opt_should=clauses, opt_msm=1,
            must_not=["jolt"],
        )
    ]
    assert local == dist
    # msearch: the bool body batches through the fused scan, per-query
    # rows bit-identical to the solo kernel
    ms = idx.msearch(
        [
            {"query": ["spark"], "opt_should": clauses, "opt_msm": 1,
             "must_not": ["jolt"], "k": None},
            {"query": ["spark", "join"], "mode": "and", "k": None},
        ],
        k=None,
    )
    rows = ms.collect()
    q0 = [(r["doc_id"], round(r["score"], 9)) for r in rows
          if r["query_id"] == 0]
    q1 = [(r["doc_id"], round(r["score"], 9)) for r in rows
          if r["query_id"] == 1]
    assert q0 == dist
    assert q1 == _pairs(idx.search(["spark", "join"], k=None))


def test_dsl_opt_should_composed_clauses(spark, tmp_path_factory):
    """Phrase and operator=and should-clauses next to a must: the composed
    path runs each clause's own kernel and LEFT-JOINs its scored frame
    onto the must set — parity against the hand-built composition of the
    same (oracle-pinned) kernels."""
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [
        (0, "spark join table spark shuffle"),
        (1, "join table row filter"),
        (2, "spark row hash merge join order"),
        (3, "table table join spark row"),
        (4, "spark hash merge table"),
        (5, "spark jolt table shuffle join"),
        (6, "merge hash spark spark"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("optcomp"))
    build_index(spark, docs, d, num_segments=2, num_chunks=1,
                positions=True)
    idx = InvertedIndex(spark, d)

    body = {
        "query": {"bool": {
            "must": [{"term": {"text": "spark"}}],
            "should": [
                {"match_phrase": {"text": {"query": "hash merge",
                                           "boost": 2.0}}},
                {"match": {"text": {"query": "join table",
                                    "operator": "and"}}},
                {"term": {"text": "shuffle"}},
            ],
            "minimum_should_match": 1,
        }},
        "size": None,
    }
    got = _pairs(search_dsl(idx, body))

    # hand-built: must scores + per-clause kernel frames left-joined
    base = idx.search(["spark"], k=None).select(
        "doc_id", F.col("score").alias("s")
    )
    ph = idx.search_phrase(["hash", "merge"], k=None).select(
        "doc_id", (F.col("score") * 2.0).alias("c0")
    )
    an = idx.search(["join", "table"], k=None, mode="and").select(
        "doc_id", F.col("score").alias("c1")
    )
    orc = idx.search(["shuffle"], k=None, mode="or").select(
        "doc_id", F.col("score").alias("c2")
    )
    j = base.join(ph, "doc_id", "left").join(an, "doc_id", "left").join(
        orc, "doc_id", "left"
    )
    nm = sum(
        F.when(F.col(c).isNotNull(), 1).otherwise(0)
        for c in ("c0", "c1", "c2")
    )
    tot = (
        F.col("s") + F.coalesce("c0", F.lit(0.0))
        + F.coalesce("c1", F.lit(0.0)) + F.coalesce("c2", F.lit(0.0))
    )
    exp = _pairs(
        j.select("doc_id", tot.alias("score"), nm.alias("nm"))
        .where(F.col("nm") >= 1)
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    assert got == exp and got
    # phrase membership is positional: doc 6 has merge+hash NON-adjacent
    # in phrase order, so its phrase clause must NOT fire
    by_doc = dict(got)
    base_d = dict(_pairs(idx.search(["spark"], k=None)))
    if 6 in by_doc:
        assert by_doc[6] == pytest.approx(base_d[6], abs=1e-9)

    # ... and under a structured filter (composed + filtered base)
    body_f = {
        "query": {"bool": {
            "must": [{"term": {"text": "spark"}}],
            "should": [
                {"match_phrase": {"text": "hash merge"}},
            ],
            "filter": [{"range": {"doc_id": {"lte": 4}}}],
        }},
        "size": None,
    }
    got_f = _pairs(search_dsl(idx, body_f, corpus=docs))
    base_f = idx.search_filtered(
        ["spark"], docs.where(F.col("doc_id") <= 4), k=None
    ).select("doc_id", F.col("score").alias("s"))
    ph1 = idx.search_phrase(["hash", "merge"], k=None).select(
        "doc_id", F.col("score").alias("c0")
    )
    exp_f = _pairs(
        base_f.join(ph1, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("s") + F.coalesce("c0", F.lit(0.0))).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    assert got_f == exp_f and got_f


def test_dsl_phrase_must_with_should(spark, tmp_path_factory):
    """match_phrase in MUST next to should clauses: base = the positional
    kernel (adjacency-exact), clauses LEFT-JOIN on — parity vs the
    hand-built composition; must_not anti-join and the filtered variant
    ride along."""
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rows = [
        (0, "spark join table row"),
        (1, "join spark table shuffle"),
        (2, "spark join spark join hash"),
        (3, "table spark join merge"),
        (4, "join table spark row"),
        (5, "spark join jolt"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("optph"))
    build_index(spark, docs, d, num_segments=2, num_chunks=1,
                positions=True)
    idx = InvertedIndex(spark, d)

    body = {
        "query": {"bool": {
            "must": [{"match_phrase": {"text": "spark join"}}],
            "should": [{"term": {"text": "table"}}],
            "must_not": [{"term": {"text": "jolt"}}],
        }},
        "size": None,
    }
    got = _pairs(search_dsl(idx, body))
    base = idx.search_phrase(["spark", "join"], k=None)
    ex = idx.search(["jolt"], k=None).select("doc_id")
    base = base.join(ex, "doc_id", "left_anti").select(
        "doc_id", F.col("score").alias("s")
    )
    cl = idx.search(["table"], k=None, mode="or").select(
        "doc_id", F.col("score").alias("c0")
    )
    exp = _pairs(
        base.join(cl, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("s") + F.coalesce("c0", F.lit(0.0))).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    assert got == exp and got
    # phrase matching stays adjacency-exact: doc 1 (join spark, reversed)
    # and doc 4 (non-adjacent) never rank; doc 5 excluded by must_not
    assert {d_ for d_, _ in got} == {0, 2, 3}

    # filtered: phrase base restricted by the structured filter
    body_f = {
        "query": {"bool": {
            "must": [{"match_phrase": {"text": "spark join"}}],
            "should": [{"term": {"text": "table"}}],
            "filter": [{"range": {"doc_id": {"lte": 2}}}],
        }},
        "size": None,
    }
    got_f = _pairs(search_dsl(idx, body_f, corpus=docs))
    base_f = idx.search_phrase_filtered(
        ["spark", "join"], docs.where(F.col("doc_id") <= 2), k=None
    ).select("doc_id", F.col("score").alias("s"))
    exp_f = _pairs(
        base_f.join(cl, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("s") + F.coalesce("c0", F.lit(0.0))).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    assert got_f == exp_f and got_f


def test_opt_should_sharded_rank_identity(spark, tmp_path_factory):
    """Sharded vs monolithic rank identity extends to optional-should:
    global (idfs, avgdl) substituted into the same kernel per shard,
    doc-disjoint shards make per-shard clause counting global."""
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex
    from elasticsearch_assets_spark.query.sharded import ShardedIndex

    rows = [
        (i, t)
        for i, t in enumerate(
            [
                "spark join table",
                "spark hash merge join",
                "table hash spark",
                "join join spark table hash",
                "merge spark join",
                "spark table",
                "spark join merge table",
                "hash merge spark",
            ]
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    mono_d = str(tmp_path_factory.mktemp("optmono"))
    build_index(spark, docs, mono_d, num_segments=2, num_chunks=1)
    mono = InvertedIndex(spark, mono_d)
    shard_dirs = []
    for sh in (0, 1):
        d = str(tmp_path_factory.mktemp(f"optsh{sh}"))
        build_index(
            spark, docs.where(F.col("doc_id") % 2 == sh), d,
            num_segments=1, num_chunks=1,
        )
        shard_dirs.append(d)
    sharded = ShardedIndex(spark, shard_dirs)

    clauses = [(["table"], 1.5), (["hash", "merge"], 1.0)]
    for msm in (0, 1, 2):
        exp = _pairs(
            mono.search_optional_should(
                ["spark"], clauses, k=None, minimum_should_match=msm
            )
        )
        got = [
            (d, round(s, 9))
            for d, s in sharded.search_local(
                ["spark"], k=None, opt_should=clauses, opt_msm=msm
            )
        ]
        assert got == exp, f"msm={msm}"


def test_opt_should_routed_and_kwargs_guard(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.routing import (
        RoutedIndex,
        build_routed_shards,
    )

    rows = [
        (i, t, f"u{i % 3}")
        for i, t in enumerate(
            [
                "spark join table",
                "spark hash merge",
                "table spark",
                "join spark table hash",
                "merge spark",
                "spark table merge",
            ]
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "user"])
    base = str(tmp_path_factory.mktemp("optroute"))
    build_routed_shards(spark, docs, base, n_shards=2, routing_col="user")
    ridx = RoutedIndex(spark, base)

    clauses = [(["table"], 1.0), (["merge"], 2.0)]
    # routed = the routing shard's docs only, GLOBAL stats — compare to
    # the all-shard result restricted to that shard's doc set
    got = ridx.search_local(
        ["spark"], k=None, routing="u1", opt_should=clauses, opt_msm=1
    )
    shard_pos = ridx._shard_idx[ridx.shard_of("u1")]
    shard_docs = {
        r["doc_id"]
        for r in ridx.shards[shard_pos].segments.select("seg_id").limit(0).collect()
    } or None
    full = ridx.search_local(["spark"], k=None, opt_should=clauses, opt_msm=1)
    got_ids = {d for d, _ in got}
    assert got and got_ids <= {d for d, _ in full}
    full_map = dict(full)
    for d, s in got:
        assert s == full_map[d]  # global stats: same score routed or not
    # unknown kwargs under routing raise instead of silently dropping
    with pytest.raises(TypeError, match="unsupported kwargs"):
        ridx.search_local(["spark"], k=5, routing="u1", boosts=[1.0, 2.0])


def test_semantic_engines_bit_identical(spark):
    """The mapInPandas batch embedder (md5 per UNIQUE token per batch, np
    scatter-add) and the pure-SQL fold produce bit-identical results:
    integer dims are exact under any evaluation order."""
    from elasticsearch_assets_spark.operators.semantic import semantic_topk

    rows = [
        (0, "spark join table row"),
        (1, "alpha beta gamma spark spark"),
        (2, ""),
        (3, "join merge hash table index query"),
        (4, "spark"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for q in ("spark join", "table row hash"):
        a = semantic_topk(docs, q, k=None if False else 10,
                          engine="pandas").collect()
        b = semantic_topk(docs, q, k=10, engine="sql").collect()
        assert a == b, q


def test_opt_should_review_fixes(opt_index, spark):
    """Session-12 review regressions: empty-rewrite should clauses, a
    single-object should, explicit minimum_should_match: 0 under a
    filter, NULL text under the pandas semantic engine, unknown engine
    strings, and the routed mode guard."""
    from elasticsearch_assets_spark.operators.semantic import semantic_topk

    idx, docs = opt_index
    # a should clause whose rewrite matches nothing contributes nothing
    # (no IndexError), and never counts toward msm
    body = {"query": {"bool": {
        "must": [{"term": {"text": "spark"}}],
        "should": [{"prefix": {"text": {"value": "zzzzzz"}}},
                   {"term": {"text": "table"}}],
        "minimum_should_match": 1,
    }}, "size": None}
    got = _pairs(search_dsl(idx, body))
    exp = _pairs(
        idx.search_optional_should(
            ["spark"], [(["table"], 1.0)], k=None, minimum_should_match=1
        )
    )
    assert got == exp and got
    # single-object (non-list) should — legal ES spelling
    one = _pairs(search_dsl(idx, {"query": {"bool": {
        "must": [{"term": {"text": "spark"}}],
        "should": {"term": {"text": "table"}},
    }}, "size": None}))
    assert one == _pairs(
        idx.search_optional_should(["spark"], [(["table"], 1.0)], k=None)
    )
    # explicit minimum_should_match: 0 ≡ the omitted-key default next to
    # a filter (both union the zero-score filter survivors)
    fbody = {"query": {"bool": {
        "should": [{"term": {"text": "dup" if False else "table"}}],
        "filter": [{"range": {"doc_id": {"lte": 5}}}],
    }}, "size": None}
    implicit = _pairs(search_dsl(idx, fbody, corpus=docs))
    fbody["query"]["bool"]["minimum_should_match"] = 0
    explicit = _pairs(search_dsl(idx, fbody, corpus=docs))
    assert implicit == explicit
    # ... but msm: 0 with no filter is loud (would match every doc)
    with pytest.raises(NotImplementedError, match="match_all"):
        search_dsl(idx, {"query": {"bool": {
            "should": [{"term": {"text": "table"}}],
            "minimum_should_match": 0,
        }}})
    # NULL text rows: the pandas engine drops them like the SQL path
    ndocs = spark.createDataFrame(
        [(0, "spark join"), (1, None), (2, "table spark")],
        "doc_id long, text string",
    )
    a = semantic_topk(ndocs, "spark", k=10, engine="pandas").collect()
    b = semantic_topk(ndocs, "spark", k=10, engine="sql").collect()
    assert a == b and 1 not in {r["doc_id"] for r in a}
    # unknown engine strings are loud
    with pytest.raises(ValueError, match="engine"):
        semantic_topk(ndocs, "spark", engine="arrow")


def test_routed_opt_should_mode_guard(spark, tmp_path_factory):
    from elasticsearch_assets_spark.query.routing import (
        RoutedIndex,
        build_routed_shards,
    )

    docs = spark.createDataFrame(
        [(0, "spark join", "u0"), (1, "table spark", "u1")],
        ["doc_id", "text", "user"],
    )
    base = str(tmp_path_factory.mktemp("optrg"))
    build_routed_shards(spark, docs, base, n_shards=2, routing_col="user")
    ridx = RoutedIndex(spark, base)
    # same contract routed or not: opt_should is must semantics
    with pytest.raises(ValueError, match="mode='and'"):
        ridx.search_local(["spark"], k=5, mode="or", routing="u1",
                          opt_should=[(["table"], 1.0)])
