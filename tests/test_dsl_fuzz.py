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
    vals = {d: rng.randint(0, 100) for d in docs}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(d, t, vals[d]) for d, t in docs.items()],
        ["doc_id", "text", "val"],
    )
    d = str(tmp_path_factory.mktemp("fuzzidx"))
    build_index(spark, df, d, num_segments=3, num_chunks=1, positions=True)
    return InvertedIndex(spark, d), docs, vals, corpus


# --- the naive interpreter ---------------------------------------------------


def _naive(docs, groups, boosts, must_not, msm=None, allowed=None,
           phrase=None, opt_clauses=None, opt_msm=0):
    """`allowed` restricts RANKING to a doc set (collection stats stay
    global — the ES filter-context contract); `phrase` requires the token
    sequence to occur adjacently (scored as BM25 over its distinct
    terms — the match_phrase contract the positional oracle pins).
    `opt_clauses` = [(terms, weight)] optional-should next to the must
    groups: never required, each matching clause ADDS weight × its
    per-term BM25 sum (a term in both sides scores twice — Lucene sums
    independent clauses); `opt_msm` requires ≥ that many matched
    CLAUSES."""
    toks = {d: tokenize(t) for d, t in docs.items()}
    n = len(docs)
    dls = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dls.values()) / n
    opt_terms = {t for ts, _ in (opt_clauses or []) for t in ts}
    all_terms = sorted({t for g in groups for t in g} | opt_terms)
    tfs = {
        d: {t: ts.count(t) for t in all_terms if t in ts}
        for d, ts in toks.items()
    }
    dfs = {t: sum(1 for d in docs if t in tfs[d]) for t in all_terms}

    def _w(d, t):
        idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        tf = tfs[d][t]
        return idf * tf * (K1 + 1.0) / (
            tf + K1 * (1.0 - B + B * dls[d] / avgdl)
        )

    out = []
    must_terms = sorted({t for g in groups for t in g})
    for d in docs:
        if allowed is not None and d not in allowed:
            continue
        if any(x in toks[d] for x in must_not):
            continue
        if phrase is not None and not any(
            toks[d][i:i + len(phrase)] == phrase
            for i in range(len(toks[d]) - len(phrase) + 1)
        ):
            continue
        if opt_clauses is not None:
            if not all(any(t in tfs[d] for t in g) for g in groups):
                continue
            n_cl = sum(
                1 for ts, _ in opt_clauses if any(t in tfs[d] for t in ts)
            )
            if n_cl < opt_msm:
                continue
            # `boosts` = MUST-side boosts only: the composed path keeps
            # them on the base kernel, never on a clause's contribution
            s = sum(
                boosts.get(t, 1.0) * _w(d, t)
                for t in must_terms if t in tfs[d]
            )
            for ts, w in opt_clauses:
                s += w * sum(_w(d, t) for t in sorted(set(ts))
                             if t in tfs[d])
            out.append((d, s))
            continue
        matched = [t for t in all_terms if t in tfs[d]]
        if msm is not None:
            if len(matched) < msm:
                continue
        elif phrase is None and not all(
            any(t in tfs[d] for t in g) for g in groups
        ):
            continue
        s = sum(boosts.get(t, 1.0) * _w(d, t) for t in sorted(matched))
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
    """(body, groups, boosts, must_not, msm, gte, phrase) — the body plus
    the published semantics it should compile to (`gte` = structured
    filter threshold on `val`, or None; `phrase` = required adjacent
    token sequence, or None)."""
    shape = rng.choice([
        "match", "bool_must", "should", "msm", "prefix",
        "filtered", "msm_filter", "phrase",
    ])
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
        return body, groups, boosts, [], None, None, None
    if shape == "filtered":
        # bool must match + structured range filter (+ optional must_not):
        # ranking restricted under GLOBAL stats, the filter-context contract
        txt = " ".join(rng.choices(VOCAB, k=rng.randint(1, 3)))
        op = rng.choice(["or", "and"])
        gte = rng.randint(10, 90)
        toks = tokenize(txt)
        groups = [[t] for t in toks] if op == "and" else [sorted(set(toks))]
        bool_body: dict = {
            "must": [{"match": {"text": {"query": txt, "operator": op}}}],
            "filter": [{"range": {"val": {"gte": gte}}}],
        }
        must_not = []
        if rng.random() < 0.5:
            ex = rng.choice(VOCAB)
            bool_body["must_not"] = [{"term": {"text": ex}}]
            must_not = [ex]
        return (
            {"query": {"bool": bool_body}, "size": None},
            groups, {}, must_not, None, gte, None,
        )
    if shape == "msm_filter":
        terms = rng.sample(VOCAB, rng.randint(2, 4))
        msm = rng.randint(1, len(terms))
        gte = rng.randint(10, 90)
        body = {"query": {"bool": {
            "should": [{"term": {"text": t}} for t in terms],
            "minimum_should_match": msm,
            "filter": [{"range": {"val": {"gte": gte}}}],
        }}, "size": None}
        return body, [sorted(set(terms))], {}, [], msm, gte, None
    if shape == "phrase":
        # a real adjacent pair from a random doc (so hits exist), plus an
        # optional must_not exclusion — the anti-join composition
        src = tokenize(docs[rng.choice(sorted(docs))])
        while len(src) < 2:
            src = tokenize(docs[rng.choice(sorted(docs))])
        i = rng.randrange(len(src) - 1)
        phrase = src[i:i + 2]
        bool_body = {"must": [
            {"match_phrase": {"text": " ".join(phrase)}}
        ]}
        must_not = []
        if rng.random() < 0.5:
            ex = rng.choice(VOCAB)
            bool_body["must_not"] = [{"term": {"text": ex}}]
            must_not = [ex]
        return (
            {"query": {"bool": bool_body}, "size": None},
            [[t] for t in sorted(set(phrase))],
            {}, must_not, None, None, phrase,
        )
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
            groups, {}, must_not, None, None, None,
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
            {}, [], msm, None, None,
        )
    # prefix rewrite — the caller fills in the corpus-derived expansions
    pre = rng.choice(["s", "jo", "ta", "sh", "me"])
    body = {"query": {"prefix": {"text": pre}}, "size": None}
    return body, [[]], {}, [], None, None, None


def test_dsl_fuzz_against_naive(fuzz_index):
    idx, docs, vals, corpus = fuzz_index
    rng = random.Random(99)
    n_checked = 0
    shapes_hit = set()
    for trial in range(22):
        body, groups, boosts, must_not, msm, gte, phrase = _gen_body(
            rng, docs
        )
        if groups and groups[0] and groups[0][0] is None:
            continue
        # prefix expansions need the corpus vocabulary
        if "prefix" in body["query"]:
            pre = body["query"]["prefix"]["text"]
            groups = [_expansions(docs, pre)]
            if not groups[0]:
                continue
        allowed = (
            {d for d, v in vals.items() if v >= gte}
            if gte is not None else None
        )
        exp = _naive(
            docs, groups, boosts, must_not, msm=msm, allowed=allowed,
            phrase=phrase,
        )
        got = [
            (r["doc_id"], r["score"])
            for r in search_dsl(idx, body, corpus).collect()
        ]
        shapes_hit.add((gte is not None, phrase is not None, msm is not None))
        assert [d for d, _ in got] == [d for d, _ in exp], (
            f"trial {trial}: rank mismatch for {body!r}"
        )
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, abs=1e-9), (
                f"trial {trial}: score mismatch doc {gd} for {body!r}"
            )
        n_checked += 1
    assert n_checked >= 15
    # the new composition arms all fired: filtered, msm+filter, phrase
    assert {(True, False, False), (True, False, True),
            (False, True, False)} <= shapes_hit


def test_dsl_fuzz_should_pure_or_semantics(fuzz_index):
    # a pure should with no msm matches ANY clause (flat OR), scored over
    # every matched term — the single spec point the generator's msm arm
    # does not cover at msm=1 (identical match set, identical scoring).
    idx, docs, _, _ = fuzz_index
    body = {"query": {"bool": {"should": [
        {"term": {"text": "spark"}}, {"term": {"text": "merge"}},
    ]}}, "size": None}
    exp = _naive(docs, [["merge", "spark"]], {}, [], msm=None)
    got = [
        (r["doc_id"], r["score"]) for r in search_dsl(idx, body).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]


# --- optional-should (must + should) arm --------------------------------------


def _gen_opt_body(rng: random.Random):
    """(body, groups, must_boosts, opt_clauses, opt_msm, must_not, gte) —
    a bool with BOTH must and should (+ optional filter / must_not / msm /
    must-side boosts, which force the composed path), plus the published
    semantics it should compile to."""
    # must: 1-2 scoring clauses, sometimes boosted (composed-path arm)
    groups, must_clauses = [], []
    must_boosts: dict = {}
    for _ in range(rng.randint(1, 2)):
        mw = 2.0 if rng.random() < 0.3 else 1.0
        if rng.random() < 0.5:
            t = rng.choice(VOCAB)
            cfg = {"value": t, "boost": mw} if mw != 1.0 else t
            must_clauses.append({"term": {"text": cfg}})
            groups.append([t])
            if mw != 1.0:
                must_boosts[t] = mw
        else:
            txt = " ".join(rng.choices(VOCAB, k=rng.randint(1, 2)))
            op = rng.choice(["or", "and"])
            mcfg: dict = {"query": txt, "operator": op}
            if mw != 1.0:
                mcfg["boost"] = mw
            must_clauses.append({"match": {"text": mcfg}})
            toks = tokenize(txt)
            groups += (
                [[t] for t in toks] if op == "and" else [sorted(set(toks))]
            )
            if mw != 1.0:
                must_boosts.update({t: mw for t in toks})
    # should: 1-3 optional clauses, each a term or an OR match, some boosted
    opt_clauses, should_clauses = [], []
    for _ in range(rng.randint(1, 3)):
        w = rng.choice([1.0, 1.0, 2.0, 0.5])
        if rng.random() < 0.5:
            t = rng.choice(VOCAB)
            cfg = {"value": t, "boost": w} if w != 1.0 else t
            should_clauses.append({"term": {"text": cfg}})
            opt_clauses.append(([t], w))
        else:
            txt = " ".join(rng.choices(VOCAB, k=rng.randint(1, 2)))
            cfg = {"query": txt}
            if w != 1.0:
                cfg["boost"] = w
            should_clauses.append({"match": {"text": cfg}})
            opt_clauses.append((sorted(set(tokenize(txt))), w))
    bool_body: dict = {"must": must_clauses, "should": should_clauses}
    opt_msm = 0
    if rng.random() < 0.4:
        opt_msm = rng.randint(1, len(should_clauses))
        bool_body["minimum_should_match"] = opt_msm
    must_not = []
    if rng.random() < 0.4:
        ex = rng.choice(VOCAB)
        bool_body["must_not"] = [{"term": {"text": ex}}]
        must_not = [ex]
    gte = None
    if rng.random() < 0.4:
        gte = rng.randint(10, 90)
        bool_body["filter"] = [{"range": {"val": {"gte": gte}}}]
    return (
        {"query": {"bool": bool_body}, "size": None},
        groups, must_boosts, opt_clauses, opt_msm, must_not, gte,
    )


def test_dsl_fuzz_opt_should_against_naive(fuzz_index):
    idx, docs, vals, corpus = fuzz_index
    rng = random.Random(1212)
    n_checked, n_filtered, n_msm, n_boosted, n_mboost = 0, 0, 0, 0, 0
    for trial in range(25):
        (body, groups, must_boosts, opt_clauses, opt_msm, must_not,
         gte) = _gen_opt_body(rng)
        allowed = (
            {d for d, v in vals.items() if v >= gte}
            if gte is not None else None
        )
        exp = _naive(
            docs, groups, must_boosts, must_not, allowed=allowed,
            opt_clauses=opt_clauses, opt_msm=opt_msm,
        )
        got = [
            (r["doc_id"], r["score"])
            for r in search_dsl(idx, body, corpus).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], (
            f"trial {trial}: rank mismatch for {body!r}"
        )
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, abs=1e-9), (
                f"trial {trial}: score mismatch doc {gd} for {body!r}"
            )
        n_checked += 1
        n_filtered += gte is not None
        n_msm += opt_msm > 0
        n_boosted += any(w != 1.0 for _, w in opt_clauses)
        n_mboost += bool(must_boosts)
    assert n_checked == 25
    # every composition axis fired (must boosts = the composed path)
    assert (n_filtered >= 3 and n_msm >= 3 and n_boosted >= 3
            and n_mboost >= 3)


def _naive_rrf(lists, kconst):
    contrib = {}
    for lst in lists:
        for rank, (d, _s) in enumerate(lst, 1):
            contrib[d] = contrib.get(d, 0.0) + 1.0 / (kconst + rank)
    return sorted(contrib.items(), key=lambda p: (-p[1], p[0]))


def test_dsl_fuzz_retriever_rrf(fuzz_index):
    """Random rrf retriever trees of 2-3 standard children (AND match
    bodies) vs reciprocal-rank fusion over the naive interpreter's
    ranked lists — the 8.14 retriever surface checked against the
    published formula, not the kernels it delegates to."""
    idx, docs, vals, corpus = fuzz_index
    rng = random.Random(1313)
    for trial in range(10):
        n_child = rng.randint(2, 3)
        window = rng.randint(3, 8)
        kconst = rng.choice([10, 60])
        children, naive_lists = [], []
        for _ in range(n_child):
            terms = sorted(
                set(rng.choices(VOCAB, k=rng.randint(1, 2)))
            )
            children.append({"standard": {"query": {"match": {"text": {
                "query": " ".join(terms), "operator": "and"}}}}})
            naive_lists.append(
                _naive(docs, [[t] for t in terms], {}, [])[:window]
            )
        tree = {
            "retriever": {"rrf": {
                "retrievers": children,
                "rank_window_size": window,
                "rank_constant": kconst,
            }},
            "size": None,
        }
        got = [
            (r["doc_id"], r["score"])
            for r in search_dsl(idx, tree, corpus).collect()
        ]
        exp = _naive_rrf(naive_lists, kconst)
        assert [d for d, _ in got] == [d for d, _ in exp], (
            trial, got, exp
        )
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12), (trial, gd)
