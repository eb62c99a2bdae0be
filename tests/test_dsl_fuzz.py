"""Session-11 batch 2: randomized DSL-body fuzz — search_dsl vs an
INDEPENDENT naive interpreter (pure-Python BM25 + the published clause
semantics), so the compiler's folding rules (groups, boosts, msm,
must_not) are checked against the spec rather than against the kernels
they delegate to.

Naive semantics mirrored from the public ES/Lucene contracts (not from
the engine code): a bool is an AND of clause-groups; each group matches
a doc when ≥ 1 of its terms is present; the score sums idf·tfnorm over
ALL matched distinct terms (boost multiplies a term's contribution);
must_not excludes docs containing any excluded token; should+msm is a
flat OR requiring ≥ m distinct matched terms.
"""

from __future__ import annotations

import math
import random

import pytest

from elasticsearch_assets_spark.analysis.tokenizer import tokenize
from elasticsearch_assets_spark.index.stats import B, K1
from elasticsearch_assets_spark.query.dsl import search_dsl

VOCAB = [
    "spark", "join", "table", "row", "order", "filter",
    "shuffle", "index", "query", "scan", "merge", "sort",
]


def _mk_docs(rng: random.Random, n: int = 40):
    return {
        d: " ".join(rng.choices(VOCAB, k=rng.randint(3, 12)))
        for d in range(n)
    }


@pytest.fixture(scope="module")
def fuzz_index(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    rng = random.Random(20260820)
    docs = _mk_docs(rng)
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("fuzzidx"))
    build_index(spark, df, d, num_segments=3, num_chunks=1)
    return InvertedIndex(spark, d), docs


# --- the naive interpreter ---------------------------------------------------


def _naive(docs, groups, boosts, must_not, msm=None):
    toks = {d: tokenize(t) for d, t in docs.items()}
    n = len(docs)
    dls = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dls.values()) / n
    all_terms = sorted({t for g in groups for t in g})
    tfs = {
        d: {t: ts.count(t) for t in all_terms if t in ts}
        for d, ts in toks.items()
    }
    dfs = {t: sum(1 for d in docs if t in tfs[d]) for t in all_terms}
    out = []
    for d in docs:
        if any(x in toks[d] for x in must_not):
            continue
        matched = [t for t in all_terms if t in tfs[d]]
        if msm is not None:
            if len(matched) < msm:
                continue
        elif not all(any(t in tfs[d] for t in g) for g in groups):
            continue
        s = 0.0
        for t in sorted(matched):
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = tfs[d][t]
            tfn = tf * (K1 + 1.0) / (
                tf + K1 * (1.0 - B + B * dls[d] / avgdl)
            )
            s += boosts.get(t, 1.0) * idf * tfn
        out.append((d, s))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out


def _expansions(docs, prefix):
    seen = set()
    for ts in (tokenize(t) for t in docs.values()):
        seen.update(x for x in ts if x.startswith(prefix))
    return sorted(seen)


# --- the body generator ------------------------------------------------------


def _gen_body(rng: random.Random, docs):
    """(body, groups, boosts, must_not, msm) — the body plus the published
    semantics it should compile to."""
    shape = rng.choice(["match", "bool_must", "should", "msm", "prefix"])
    boosts: dict = {}
    if shape == "match":
        txt = " ".join(rng.choices(VOCAB, k=rng.randint(1, 3)))
        op = rng.choice(["or", "and"])
        w = rng.choice([1.0, 2.0, 0.5])
        body = {"query": {"match": {"text": {
            "query": txt, "operator": op, "boost": w}}}, "size": None}
        toks = tokenize(txt)
        groups = [[t] for t in toks] if op == "and" else [sorted(set(toks))]
        if w != 1.0:
            boosts = {t: w for t in toks}
        return body, groups, boosts, [], None
    if shape == "bool_must":
        clauses, groups = [], []
        for _ in range(rng.randint(1, 3)):
            kind = rng.choice(["match", "term", "terms"])
            if kind == "match":
                txt = " ".join(rng.choices(VOCAB, k=rng.randint(1, 2)))
                op = rng.choice(["or", "and"])
                clauses.append({"match": {"text": {
                    "query": txt, "operator": op}}})
                toks = tokenize(txt)
                groups += (
                    [[t] for t in toks] if op == "and"
                    else [sorted(set(toks))]
                )
            elif kind == "term":
                t = rng.choice(VOCAB)
                clauses.append({"term": {"text": t}})
                groups.append([t])
            else:
                vals = rng.sample(VOCAB, rng.randint(1, 3))
                clauses.append({"terms": {"text": vals}})
                groups.append(sorted(set(vals)))
        must_not = []
        body_bool = {"must": clauses}
        if rng.random() < 0.5:
            ex = rng.choice(VOCAB)
            body_bool["must_not"] = [{"term": {"text": ex}}]
            must_not = [ex]
        return (
            {"query": {"bool": body_bool}, "size": None},
            groups, {}, must_not, None,
        )
    if shape in ("should", "msm"):
        terms = rng.sample(VOCAB, rng.randint(2, 4))
        clauses = [{"term": {"text": t}} for t in terms]
        body_bool: dict = {"should": clauses}
        msm = None
        if shape == "msm":
            msm = rng.randint(1, len(terms))
            body_bool["minimum_should_match"] = msm
        # a pure should is ONE flat OR over the clauses' terms; under msm
        # the naive side counts distinct matched terms itself
        return (
            {"query": {"bool": body_bool}, "size": None},
            [sorted(set(terms))],
            {}, [], msm,
        )
    # prefix rewrite — the caller fills in the corpus-derived expansions
    pre = rng.choice(["s", "jo", "ta", "sh", "me"])
    body = {"query": {"prefix": {"text": pre}}, "size": None}
    return body, [[]], {}, [], None


def test_dsl_fuzz_against_naive(fuzz_index):
    idx, docs = fuzz_index
    rng = random.Random(99)
    n_checked = 0
    for trial in range(14):
        body, groups, boosts, must_not, msm = _gen_body(rng, docs)
        if groups and groups[0] and groups[0][0] is None:
            continue
        # prefix expansions need the corpus vocabulary
        if "prefix" in body["query"]:
            pre = body["query"]["prefix"]["text"]
            groups = [_expansions(docs, pre)]
            if not groups[0]:
                continue
        exp = _naive(docs, groups, boosts, must_not, msm=msm)
        got = [
            (r["doc_id"], r["score"])
            for r in search_dsl(idx, body).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], (
            f"trial {trial}: rank mismatch for {body!r}"
        )
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, abs=1e-9), (
                f"trial {trial}: score mismatch doc {gd} for {body!r}"
            )
        n_checked += 1
    assert n_checked >= 10


def test_dsl_fuzz_should_pure_or_semantics(fuzz_index):
    # a pure should with no msm matches ANY clause (flat OR), scored over
    # every matched term — the single spec point the generator's msm arm
    # does not cover at msm=1 (identical match set, identical scoring).
    idx, docs = fuzz_index
    body = {"query": {"bool": {"should": [
        {"term": {"text": "spark"}}, {"term": {"text": "merge"}},
    ]}}, "size": None}
    exp = _naive(docs, [["merge", "spark"]], {}, [], msm=None)
    got = [
        (r["doc_id"], r["score"]) for r in search_dsl(idx, body).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
