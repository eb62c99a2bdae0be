"""ES Query DSL (the JSON request-body language) compiled onto this engine.

The reference never builds queries itself — its facade passes the caller's
JSON search body straight to Elasticsearch
(/root/reference/asset/elasticsearch_reader/index.js builds `body` from
user input; simple_api_reader composes `q=` strings). The Lucene string
surface covered the `q=` form; this module covers the body form: a
`{"query": {...}}` tree compiled onto the SAME engine entry points, so
every rank-semantics guarantee (rank identity, oracle parity, tombstone
exclusion) is inherited rather than re-implemented.

Supported scoring-context tree (the subset with exact engine semantics —
anything else raises with guidance, the repo's strict-surface rule):

    match                 {"match": {f: "q"}} or {f: {"query", "operator",
                          "boost", "minimum_should_match"}} — f analyzed
    match_phrase          {"match_phrase": {f: "..."}} (positional index)
    term / terms          on the analyzed field: exact-token clause(s)
    prefix/wildcard/fuzzy on the analyzed field: dictionary rewrites
    query_string          {"query_string": {"query": "..."}} (delegates)
    match_all             constant 1.0 over live docs
    ids                   {"ids": {"values": [...]}}
    constant_score        {"filter": <filter tree>, "boost": b}
    dis_max               {"queries": [<match-like>...], "tie_breaker"}
    bool                  must / filter / must_not / should (+
                          minimum_should_match); should-only composes as
                          a pure OR (next to a filter the ES DEFAULT msm
                          is 0 — filter-only docs rank at score 0);
                          must + should = optional-clause scoring — must
                          decides matching, each should clause ADDS its
                          weighted BM25 sum, msm counts clauses; flat-OR
                          clauses over unboosted musts take the fused
                          single-scan kernel (search_optional_should,
                          also via search_filtered / search_local /
                          msearch), phrase / operator=and / boosted-must
                          shapes take the composed path (each clause's
                          own kernel LEFT-JOINed on). NO must+should
                          shape is rejected. A should of ONE
                          rank_feature / distance_feature clause over
                          one must delegates to the feature-booster
                          kernels (exactly their semantics)

Delegating top-level forms (each compiles onto its own oracle-pinned
kernel, so rank semantics are inherited):

    simple_query_string   search_simple_query_string
    boosting              positive/negative/negative_boost
    pinned                ids + organic (rank-contract output)
    terms_set             per-doc minimum_should_match_field
    script_score          Spark-SQL `source` over `_score` + doc fields
                          (the painless boundary, documented deviation)
    more_like_this        like/unlike [{"_id": ...}] + max_query_terms
    regexp                dictionary rewrite (whole-token, RE2 subset)
    match_phrase_prefix   positional prefix phrase
    match_bool_prefix     terms + trailing prefix clause
    sparse_vector         {token: weight} query vector (+ pruning knobs)
    weighted_tokens       precomputed (token, weight) pairs under the
                          field name + pruning_config (ES 8.13; same
                          sparse kernel, incl. only_score_pruned_tokens)
    wrapper               base64 payload -> the query-string surface
    nested                child-index recursion + score_mode roll-up
                          (nested_paths maps path -> (child_index,
                          slot_base); max == MaxP passage retrieval)
    intervals             ordered `match` rule with max_gaps
    span_near / span_first / span_not / span_or / span_containing /
    span_within           positional span algebra (span_term, span_multi
                          prefix/wildcard/regexp/fuzzy rewrites, nested
                          two-term span_near)
    multi_match           best_fields / most_fields / phrase /
                          cross_fields over `field_indexes` (field ->
                          InvertedIndex; `f^2` boost suffixes)
    combined_fields       BM25F over field_indexes (^w = tf weights)

Filter context (`bool.filter`, `constant_score.filter`, and every
structured clause) compiles to the Lucene-surface AST (query/lucene.py
nodes) and from there to pushed-down Spark predicates — term / terms /
range {gt,gte,lt,lte} / exists / prefix / wildcard / match /
match_phrase / nested bool, the ES filter algebra.

must_not folds index-assisted when the engine path allows it (pure scoring
query) and as Not-filters when a structured filter is present — identical
match semantics either way (token membership), only the physical plan
differs.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame

from elasticsearch_assets_spark.analysis.tokenizer import tokenize
from elasticsearch_assets_spark.query.lucene import (
    And,
    Cmp,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    Term,
    Wildcard,
    compile_filter,
)


@dataclass
class _Spec:
    groups: list = dc_field(default_factory=list)   # list[list[str]]
    boosts: dict = dc_field(default_factory=dict)   # term -> weight
    phrase: "list[str] | None" = None
    phrase_boost: float = 1.0
    filters: list = dc_field(default_factory=list)  # lucene AST nodes
    must_not_terms: list = dc_field(default_factory=list)
    mode: str = "and"
    msm: "int | None" = None
    flat_terms: "list[str] | None" = None  # msm path (flat OR kernel)
    # must+should optional-clause scoring: [(clause terms, weight)] —
    # spec.groups stays the must side (search_optional_should)
    opt_should: "list | None" = None
    # bool{filter, should} with NO explicit minimum_should_match: the ES
    # default is 0 next to a filter — filter survivors matching no should
    # clause still match, at score 0 (the execution unions them in)
    zero_should: bool = False
    # composed optional-should: clause descriptors [(kind, terms, w)]
    # with kind in {"or", "and", "phrase"} — used instead of opt_should
    # when a clause needs its own kernel (phrase / operator=and); the
    # execution LEFT-JOINs each clause's scored frame onto the must set
    opt_composed: "list | None" = None


def _err(msg: str):
    raise NotImplementedError(f"Query DSL: {msg}")


def _one(node: dict) -> tuple:
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"a DSL clause is a single-key object: {node!r}")
    return next(iter(node.items()))


def _match_cfg(body) -> tuple:
    """(query_text, operator, boost, msm) from the short or long form."""
    if isinstance(body, str):
        return body, "or", 1.0, None
    return (
        body["query"],
        body.get("operator", "or"),
        float(body.get("boost", 1.0)),
        body.get("minimum_should_match"),
    )


def _note(spec: _Spec, terms: list[str], w: float) -> None:
    if w == 1.0:
        return
    for t in terms:
        spec.boosts[t] = max(spec.boosts[t], w) if t in spec.boosts else w


# -- filter context ----------------------------------------------------------


def filter_ast(node: dict, *, text_col: str = "text", analyzed=None):
    """Compile a DSL filter tree to the Lucene-surface AST."""
    analyzed = analyzed or {text_col}
    kind, body = _one(node)
    if kind == "bool":
        parts = []
        for c in body.get("must", []) + body.get("filter", []):
            parts.append(filter_ast(c, text_col=text_col, analyzed=analyzed))
        should = [
            filter_ast(c, text_col=text_col, analyzed=analyzed)
            for c in body.get("should", [])
        ]
        if should:
            parts.append(should[0] if len(should) == 1 else Or(tuple(should)))
        for c in body.get("must_not", []):
            parts.append(
                Not(filter_ast(c, text_col=text_col, analyzed=analyzed))
            )
        if not parts:
            raise ValueError("empty bool filter")
        return parts[0] if len(parts) == 1 else And(tuple(parts))
    if kind == "term":
        f, v = _one(body)
        v = v["value"] if isinstance(v, dict) else v
        return Term(f, str(v))
    if kind == "terms":
        f, vals = _one(body)
        ts = [Term(f, str(v)) for v in vals]
        return ts[0] if len(ts) == 1 else Or(tuple(ts))
    if kind == "range":
        f, cfg = _one(body)
        lo = cfg.get("gte", cfg.get("gt"))
        hi = cfg.get("lte", cfg.get("lt"))
        if lo is not None and hi is not None:
            return Range(
                f, str(lo), str(hi), "gte" in cfg, "lte" in cfg
            )
        if lo is not None:
            return Cmp(f, ">=" if "gte" in cfg else ">", str(lo))
        if hi is not None:
            return Cmp(f, "<=" if "lte" in cfg else "<", str(hi))
        raise ValueError(f"empty range for {f!r}")
    if kind == "exists":
        return Term("_exists_", body["field"])
    if kind == "prefix":
        f, v = _one(body)
        v = v["value"] if isinstance(v, dict) else v
        return Prefix(f, str(v))
    if kind == "wildcard":
        f, v = _one(body)
        v = v["value"] if isinstance(v, dict) else v
        return Wildcard(f, str(v))
    if kind == "match":
        f, body2 = _one(body)
        q, op, _, _ = _match_cfg(body2)
        toks = tokenize(q)
        if not toks:
            raise ValueError("empty match in filter context")
        nodes = [Term(None if f in analyzed else f, t) for t in toks]
        if len(nodes) == 1:
            return nodes[0]
        return And(tuple(nodes)) if op == "and" else Or(tuple(nodes))
    if kind == "match_phrase":
        f, body2 = _one(body)
        q = body2["query"] if isinstance(body2, dict) else body2
        return Phrase(None if f in analyzed else f, q)
    _err(f"unsupported filter clause {kind!r}")


# -- kernel-argument helpers -------------------------------------------------


def _match_like(node: dict, analyzed) -> tuple:
    """(query_terms, mode) from a match / term / terms clause — the shape
    the delegating kernels (boosting, pinned, script_score, rank_feature,
    distance_feature) take as their query argument."""
    kind, body = _one(node)
    if kind == "match":
        f, b2 = _one(body)
        if f not in analyzed:
            _err(f"match on non-analyzed field {f!r}")
        q, op, _, _ = _match_cfg(b2)
        toks = tokenize(q)
        if not toks:
            _err("empty match where a match-like clause is expected")
        return toks, op
    if kind == "term":
        f, v = _one(body)
        if f not in analyzed:
            _err(f"term on non-analyzed field {f!r} where scoring is needed")
        v = v["value"] if isinstance(v, dict) else v
        return [str(v).lower()], "or"
    if kind == "terms":
        f, vals = _one(body)
        if f not in analyzed:
            _err(f"terms on non-analyzed field {f!r} where scoring is needed")
        return sorted({str(x).lower() for x in vals}), "or"
    _err(f"{kind!r} where a match-like clause (match/term/terms) is expected")


def _span_ast(node: dict, idx):
    """Compile a DSL span clause to the engine's span expr tuples:
    ("term", t) | ("any", [terms]) (span_multi rewrites) |
    ("near", t1, t2, slop, ordered) (two-span_term span_near)."""
    kind, body = _one(node)
    if kind == "span_term":
        f, v = _one(body)
        v = v["value"] if isinstance(v, dict) else v
        return ("term", str(v).lower())
    if kind == "span_multi":
        mkind, mbody = _one(body["match"])
        if mkind not in ("prefix", "wildcard", "regexp", "fuzzy"):
            _err(f"span_multi wraps a multiterm query, got {mkind!r}")
        _, v = _one(mbody)
        cfg = v if isinstance(v, dict) else {"value": v}
        return idx.span_multi(
            str(cfg["value"]).lower(), kind=mkind,
            max_expansions=cfg.get("max_expansions"),
        )
    if kind == "span_near":
        clauses = [_span_ast(c, idx) for c in body["clauses"]]
        if len(clauses) == 2 and all(c[0] == "term" for c in clauses):
            return (
                "near", clauses[0][1], clauses[1][1],
                int(body.get("slop", 0)), bool(body.get("in_order", False)),
            )
        _err("a NESTED span_near takes exactly two span_term clauses "
             "(top-level span_near composes general clauses)")
    _err(f"unsupported span clause {kind!r}")


# -- scoring context ---------------------------------------------------------


def _scoring_clause(spec: _Spec, kind: str, body, idx, text_col, analyzed):
    """Fold one scoring-context clause into the spec (must semantics)."""
    if kind == "match":
        f, b2 = _one(body)
        if f not in analyzed:
            _err(f"match on non-analyzed field {f!r} scores — filter it")
        q, op, w, msm = _match_cfg(b2)
        toks = tokenize(q)
        if not toks:
            _err("empty match (zero_terms_query goes through search_match)")
        if msm is not None:
            _err("per-clause minimum_should_match: put it on the bool")
        if op == "and":
            for t in toks:
                spec.groups.append([t])
        else:
            spec.groups.append(sorted(set(toks)))
        _note(spec, toks, w)
        return
    if kind in ("term", "terms"):
        w = 1.0
        if kind == "terms" and isinstance(body, dict) and "boost" in body:
            # ES terms query: {field: [...], boost: w} — boost is a
            # sibling key of the field, not nested in its value
            body = dict(body)
            w = float(body.pop("boost"))
        f, v = _one(body)
        if f not in analyzed:
            _err(
                f"scoring {kind} on non-analyzed field {f!r} — move it to "
                "bool.filter"
            )
        if kind == "term":
            cfg = v if isinstance(v, dict) else {"value": v}
            w = float(cfg.get("boost", w))
            g = [str(cfg["value"]).lower()]
        else:
            g = sorted({str(x).lower() for x in v})
        spec.groups.append(g)
        _note(spec, g, w)
        return
    if kind == "match_phrase":
        if spec.phrase is not None:
            _err("one match_phrase per query (the engine contract)")
        f, b2 = _one(body)
        if f not in analyzed:
            _err(f"match_phrase on non-analyzed field {f!r}")
        q = b2["query"] if isinstance(b2, dict) else b2
        w = float(b2.get("boost", 1.0)) if isinstance(b2, dict) else 1.0
        spec.phrase = tokenize(q)
        _note(spec, spec.phrase, w)
        return
    if kind in ("prefix", "wildcard", "fuzzy"):
        f, v = _one(body)
        if f not in analyzed:
            _err(f"scoring {kind} on non-analyzed field {f!r}")
        cfg = v if isinstance(v, dict) else {"value": v}
        val = str(cfg["value"]).lower()
        w = float(cfg.get("boost", 1.0))
        if kind == "prefix":
            g = idx.expand_prefix(val)
        elif kind == "wildcard":
            g = idx.expand_wildcard(val)
        else:
            edits = cfg.get("fuzziness", 2)
            g = idx.expand_fuzzy(val, max_edits=int(edits))
        spec.groups.append(g)
        _note(spec, g, w)
        return
    _err(f"unsupported scoring clause {kind!r} inside bool.must")


def compile_body(
    query: dict,
    idx,
    *,
    text_col: str = "text",
    analyzed_fields: "set[str] | None" = None,
) -> _Spec:
    """Normalize a DSL `query` tree into the engine execution spec."""
    analyzed = analyzed_fields or {text_col}
    spec = _Spec()
    kind, body = _one(query)
    if kind == "bool":
        must = body.get("must", [])
        if isinstance(must, dict):
            must = [must]
        should = body.get("should", [])
        if isinstance(should, dict):
            should = [should]
        filters = body.get("filter", [])
        if isinstance(filters, dict):
            filters = [filters]
        must_not = body.get("must_not", [])
        if isinstance(must_not, dict):
            must_not = [must_not]
        for c in must:
            ckind, cbody = _one(c)
            if ckind in ("term", "terms") and isinstance(cbody, dict):
                # terms carries `boost` as a SIBLING of the field key
                cfield = next(
                    (kk for kk in cbody if kk != "boost"), None
                )
                structured = cfield not in analyzed
            else:
                structured = ckind in ("range", "exists")
            if structured:
                spec.filters.append(
                    filter_ast(c, text_col=text_col, analyzed=analyzed)
                )
            else:
                _scoring_clause(spec, ckind, cbody, idx, text_col, analyzed)
        for c in filters:
            spec.filters.append(
                filter_ast(c, text_col=text_col, analyzed=analyzed)
            )
        if should and must:
            # bool with BOTH must and should: optional-clause scoring —
            # must decides matching, each should clause ADDS its score
            # (engine.search_optional_should; minimum_should_match counts
            # matched should CLAUSES, the ES with-must semantics)
            if not spec.groups and spec.phrase is None:
                _err("optional-should (must+should) needs ≥ 1 scoring "
                     "must clause (structured-only musts: move them to "
                     "`filter` — filter+should alone is the should-only "
                     "path)")
            descs: list = []
            for c in should:
                sub = _Spec()
                ckind, cbody = _one(c)
                _scoring_clause(sub, ckind, cbody, idx, text_col, analyzed)
                if sub.phrase is not None:
                    # phrase should-clause: needs the positional kernel —
                    # composed execution (its scored frame LEFT-JOINs on)
                    w = sub.boosts.get(sub.phrase[0], 1.0)
                    descs.append(("phrase", sub.phrase, w))
                elif len(sub.groups) == 1:
                    terms_c = sub.groups[0]
                    if not terms_c:
                        # an empty rewrite (prefix/wildcard/fuzzy matching
                        # no dictionary term, or terms: []) can never
                        # match — the clause contributes nothing and never
                        # counts toward minimum_should_match (ES shape)
                        continue
                    w = sub.boosts.get(terms_c[0], 1.0)
                    descs.append(("or", terms_c, w))
                else:
                    # match operator=and: the clause matches only when ALL
                    # its terms do — its own AND kernel, composed
                    terms_c = sorted({t for g in sub.groups for t in g})
                    w = sub.boosts.get(terms_c[0], 1.0)
                    descs.append(("and", terms_c, w))
            if (
                spec.phrase is None
                and not spec.boosts
                and all(kind == "or" for kind, _, _ in descs)
            ):
                # every clause is a flat OR sub-query over an unboosted
                # term/match must: the fused single-scan kernel path
                spec.opt_should = [(ts, w) for _, ts, w in descs]
            else:
                # phrase/boosts in must, or a clause needing its own
                # kernel: composed execution — the base and clause frames
                # score independently, so a must boost can never leak
                # into a should clause's contribution for a shared term
                spec.opt_composed = descs
            msm = body.get("minimum_should_match")
            if msm is not None:
                spec.msm = int(msm)
            spec.mode = "and"
        elif should:
            spec.mode = "or"
            flat: list[str] = []
            all_single = True
            for c in should:
                sub = _Spec()
                ckind, cbody = _one(c)
                _scoring_clause(sub, ckind, cbody, idx, text_col, analyzed)
                if sub.phrase is not None:
                    _err("match_phrase inside should")
                for g in sub.groups:
                    if len(g) > 1:
                        all_single = False
                    spec.groups.append(g)
                    flat.extend(g)
                spec.boosts.update(sub.boosts)
            msm = body.get("minimum_should_match")
            if msm is not None and int(msm) == 0:
                # explicit 0 ≡ the omitted-key default next to a filter
                # (ES defines the with-filter default as exactly 0);
                # without a filter it would match EVERY doc at score 0 —
                # that needs the corpus, spell it match_all
                if not filters:
                    _err(
                        "minimum_should_match: 0 on a should-only bool "
                        "matches every doc — compose match_all with the "
                        "scored shoulds instead"
                    )
                spec.zero_should = True
            elif msm is not None:
                if not all_single:
                    _err(
                        "minimum_should_match with multi-term should "
                        "clauses (rewrites) — the engine counts distinct "
                        "terms, not clauses"
                    )
                spec.msm = int(msm)
                spec.groups = []
                spec.flat_terms = sorted(set(flat))
            elif filters:
                # ES: next to a filter the DEFAULT minimum_should_match
                # is 0 — shoulds become optional, filter-only docs match
                # at score 0 (should-only bools keep the default of 1)
                spec.zero_should = True
        else:
            spec.mode = "and"
        for c in must_not:
            ckind, cbody = _one(c)
            if ckind in ("match", "term") and (
                _one(cbody)[0] in analyzed
            ):
                if ckind == "match":
                    q, _, _, _ = _match_cfg(_one(cbody)[1])
                    spec.must_not_terms.extend(tokenize(q))
                else:
                    v = _one(cbody)[1]
                    v = v["value"] if isinstance(v, dict) else v
                    spec.must_not_terms.append(str(v).lower())
            else:
                spec.filters.append(
                    Not(filter_ast(c, text_col=text_col, analyzed=analyzed))
                )
        return spec
    # single-clause query (no bool wrapper)
    if kind in (
        "match", "term", "terms", "match_phrase", "prefix", "wildcard",
        "fuzzy",
    ):
        _scoring_clause(spec, kind, body, idx, text_col, analyzed)
        return spec
    _err(f"unsupported top-level query {kind!r} in compile_body (match_all/"
         "ids/query_string/constant_score/dis_max go through search_dsl)")


# response-shape body sections: each changes the output frame's shape, so
# exactly one per body — ES merges them into one response object; the
# set-oriented spelling is one shaped frame per request
_SHAPE_SECTIONS = (
    "post_filter", "rescore", "collapse", "highlight",
    "_source", "fields", "stored_fields", "docvalue_fields",
    "script_fields", "track_total_hits",
)


def suggest_dsl(idx, suggest: dict) -> "dict[str, DataFrame]":
    """The search body's `suggest` section: each named suggester compiles
    to its engine entry point (term -> InvertedIndex.suggest, phrase ->
    suggest_phrase incl. the collate query, completion ->
    suggest_completion / _fuzzy) and comes back as a DataFrame keyed by
    the caller's name — the set-oriented spelling of the ES response's
    `suggest` object."""
    out: dict[str, DataFrame] = {}
    for name, node in suggest.items():
        kinds = [kk for kk in ("term", "phrase", "completion") if kk in node]
        if len(kinds) != 1:
            _err("a named suggester holds exactly one of "
                 "term / phrase / completion")
        kind = kinds[0]
        cfg = node[kind] or {}
        text = node.get("text", node.get("prefix"))
        if text is None:
            text = cfg.get("text", cfg.get("prefix"))
        if not text:
            raise ValueError(f"suggester {name!r} needs text/prefix")
        if kind == "term":
            out[name] = idx.suggest(
                text,
                max_edits=int(cfg.get("max_edits", 2)),
                prefix_length=int(cfg.get("prefix_length", 0)),
                size=cfg.get("size", 5),
                suggest_mode=cfg.get("suggest_mode", "always"),
            )
        elif kind == "phrase":
            collate = cfg.get("collate")
            out[name] = idx.suggest_phrase(
                text,
                max_edits=int(cfg.get("max_edits", 2)),
                per_token=int(cfg.get("per_token", 3)),
                size=cfg.get("size", 5),
                collate=collate is not None,
                collate_prune=bool((collate or {}).get("prune", False)),
            )
        else:
            fuzzy = cfg.get("fuzzy")
            if fuzzy:
                fz = fuzzy if isinstance(fuzzy, dict) else {}
                out[name] = idx.suggest_completion_fuzzy(
                    text, size=cfg.get("size", 5),
                    fuzziness=int(fz.get("fuzziness", 1)),
                )
            else:
                out[name] = idx.suggest_completion(
                    text, size=cfg.get("size", 5)
                )
    return out


def _highlight_hits(
    hits, cfg: dict, query: dict, corpus, *, text_col: str, analyzed,
    id_col: str,
):
    """Decorate a hit frame with highlight columns (the ES `highlight`
    section): ONE field entry, fragments from operators/highlight over
    the k-bounded hit list. Hits keep their rank; docs where no query
    term occurs literally keep null highlight columns (ES omits the
    highlight key there). Shared by the single-section _shaped path and
    the multi-section search_response composition."""
    from pyspark.sql import functions as F

    from elasticsearch_assets_spark.operators import highlight as H

    if corpus is None:
        raise ValueError("highlight needs corpus (the text)")
    fields_cfg = cfg.get("fields")
    if not fields_cfg or len(fields_cfg) != 1:
        _err("highlight takes exactly one field entry")
    hf, hcfg = _one(fields_cfg)
    hcfg = hcfg or {}
    if hf not in analyzed:
        _err(f"highlight on non-analyzed field {hf!r}")
    mtoks, _ = _match_like(query, analyzed)
    cor2 = corpus.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col)
    )
    nf = int(hcfg.get("number_of_fragments", 1))
    if nf <= 1:
        hl = H.highlight_first(
            hits, cor2, mtoks,
            width=int(hcfg.get("fragment_size", 80)),
            text_col=text_col, id_col="doc_id",
        )
        order = [F.col("score").desc(), F.col("doc_id").asc()]
    else:
        hl = H.highlight_fragments(
            hits, cor2, mtoks, n_fragments=nf,
            width=int(hcfg.get("fragment_size", 40)),
            text_col=text_col, id_col="doc_id",
        )
        order = [
            F.col("score").desc(), F.col("doc_id").asc(),
            F.col("frag").asc(),
        ]
    return hits.join(hl, "doc_id", "left").orderBy(*order)


def _shaped(
    idx, body: dict, section: str, corpus, *, text_col: str,
    analyzed, id_col: str, field_indexes, nested_paths=None,
):
    """Apply ONE response-shape section over the body's query result —
    each delegates to (or mirrors row-for-row) its oracle-pinned kernel;
    the query side recurses through search_dsl so every query shape
    composes."""
    from pyspark.sql import functions as F

    sub = {kk: v for kk, v in body.items() if kk != section}
    cfg = body[section]
    k = body.get("size", 10)

    def run(size):
        b = dict(sub)
        b["size"] = size
        return search_dsl(
            idx, b, corpus, text_col=text_col, analyzed_fields=analyzed,
            id_col=id_col, field_indexes=field_indexes,
            nested_paths=nested_paths,
        )

    if section == "post_filter":
        # aggregations see EVERY query match; only the hit list narrows
        # (search_post_filter's contract, same plan: one scored scan,
        # semi join, 1-row broadcast total)
        if corpus is None:
            raise ValueError("post_filter needs corpus")
        pred = compile_filter(
            filter_ast(cfg, text_col=text_col, analyzed=analyzed),
            text_col=text_col, analyzed_fields=analyzed,
        )
        matched = run(None)
        ids = corpus.where(pred).select(
            F.col(id_col).cast("long").alias("doc_id")
        )
        hits = matched.join(ids, "doc_id", "semi").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        if k is not None:
            hits = hits.limit(k)
        total = matched.agg(
            F.count("*").cast("long").alias("total_before_filter")
        )
        return hits.crossJoin(F.broadcast(total))

    if section == "rescore":
        if isinstance(cfg, list):
            if len(cfg) != 1:
                _err("one rescore stage (chain engine.rescore for more)")
            cfg = cfg[0]
        if "query" not in sub:
            _err("rescore needs a query section")
        qc = cfg["query"]
        mtoks, mmode = _match_like(sub["query"], analyzed)
        rtoks, _ = _match_like(qc["rescore_query"], analyzed)
        return idx.rescore(
            mtoks, rtoks,
            window_size=int(cfg.get("window_size", 50)), k=k, mode=mmode,
            query_weight=float(qc.get("query_weight", 1.0)),
            rescore_query_weight=float(qc.get("rescore_query_weight", 1.0)),
            score_mode=qc.get("score_mode", "total"),
        )

    if section == "collapse":
        if corpus is None:
            raise ValueError("collapse needs corpus (the collapse field)")
        from elasticsearch_assets_spark.operators.facets import collapse_topk

        return collapse_topk(run(None), corpus, cfg["field"], k=k,
                             id_col=id_col)

    if section == "highlight":
        if "query" not in sub:
            _err("highlight needs a query section")
        return _highlight_hits(
            run(k), cfg, sub["query"], corpus,
            text_col=text_col, analyzed=analyzed, id_col=id_col,
        )

    if section == "script_fields":
        # computed hit fields: each named entry's script (the engine's
        # ONE script dialect — Spark SQL via F.expr, like the ingest
        # `script` processor and script_score) projects over the stored
        # doc columns; the k-bounded hit list broadcasts into the stored
        # scan, ES's per-hit script evaluation as one fused projection
        if corpus is None:
            raise ValueError("script_fields needs corpus (the stored doc)")
        hits = run(k)
        stored = corpus
        if id_col != "doc_id":
            stored = stored.withColumnRenamed(id_col, "doc_id")
        exprs = []
        for name, spec in cfg.items():
            script = spec.get("script") if isinstance(spec, dict) else None
            src = (
                script.get("source") if isinstance(script, dict) else script
            )
            if not src:
                _err(f"script_fields entry {name!r} needs script.source")
            exprs.append(F.expr(str(src)).alias(str(name)))
        if not exprs:
            return hits
        ids = hits.select(F.col("doc_id").cast("long").alias("doc_id"),
                          "score")
        side = stored.withColumn(
            "doc_id", F.col("doc_id").cast("long")
        )
        # exprs project AFTER the broadcast join so scripts evaluate on
        # the k surviving rows, not the full stored scan
        return (
            F.broadcast(ids)
            .join(side, "doc_id", "inner")
            .select("doc_id", ids["score"], *exprs)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        )

    if section in ("_source", "fields", "stored_fields", "docvalue_fields"):
        if corpus is None:
            raise ValueError(f"{section} needs corpus (the stored fields)")
        hits = run(k)
        stored = corpus
        if id_col != "doc_id":
            stored = stored.withColumnRenamed(id_col, "doc_id")
        if section in ("fields", "stored_fields", "docvalue_fields"):
            # stored_fields / docvalue_fields are the pre-7.x spellings of
            # the fields API — same name/{field,format} entries, same
            # projection kernel (this engine stores columns, so "stored"
            # vs "doc-values" is a distinction without a difference here);
            # stored_fields: "_none_" -> the bare hit list
            if section == "stored_fields" and cfg == "_none_":
                return hits
            return idx.fetch_fields(hits, stored, cfg, id_col="doc_id")
        if cfg is False:
            return hits
        if isinstance(cfg, str):
            inc, exc = [cfg], None
        elif isinstance(cfg, list):
            inc, exc = [str(x) for x in cfg], None
        elif isinstance(cfg, dict):
            inc, exc = cfg.get("includes"), cfg.get("excludes")
        else:
            _err(f"unsupported _source form {cfg!r}")
        return idx.fetch_source(
            hits, stored, includes=inc, excludes=exc, id_col="doc_id"
        )

    # track_total_hits: the capped incremental count (search_tracked's
    # contract — CollectLimit over the match-id stream, never a full
    # count above the cap)
    if cfg is False:
        return run(k)
    hits = run(k)
    probe = run(None).select("doc_id")
    if cfg is True:
        total, rel = probe.count(), "eq"
    else:
        cap = int(cfg)
        if cap <= 0:
            raise ValueError("track_total_hits must be positive")
        n = probe.limit(cap + 1).count()
        total, rel = (cap, "gte") if n > cap else (n, "eq")
    return hits.select(
        "doc_id", "score",
        F.lit(int(total)).cast("long").alias("total_hits"),
        F.lit(rel).alias("relation"),
    )


def _run_opt_composed(idx, spec, k, *, filtered=None, id_col="doc_id"):
    """Composed optional-should: each clause's own kernel produces a
    scored frame (phrase → positional kernel, operator=and → AND kernel,
    flat → OR kernel) that LEFT-JOINs onto the must match set — score =
    must + Σ weight × clause, msm = count of non-NULL clause joins. The
    join side is ≤ |clause matches| rows of (id, double); the fused
    single-scan kernel (spec.opt_should) remains the default whenever
    every clause is a flat OR."""
    from pyspark.sql import functions as F

    mn = sorted(set(spec.must_not_terms)) or None
    wb = spec.boosts or None  # must-side boosts stay on the base kernel
    if spec.phrase is not None:
        # phrase in must: base = the positional kernel (adjacency-exact),
        # ANDed with any other scoring groups — search_phrase's contract
        if filtered is not None:
            base = idx.search_phrase_filtered(
                spec.phrase, filtered, k=None, id_col=id_col,
                groups=spec.groups or None, boosts=wb,
            )
        else:
            base = idx.search_phrase(
                spec.phrase, k=None, groups=spec.groups or None, boosts=wb
            )
            if mn:
                # same index-assisted anti-join as the plain phrase path
                ex = idx.search(mn, k=None, mode="or").select("doc_id")
                base = base.join(ex, "doc_id", "left_anti")
    elif filtered is not None:
        # must_not already folded into `filtered` by the caller
        base = idx.search_filtered(
            [], filtered, k=None, id_col=id_col, groups=spec.groups,
            boosts=wb,
        )
    else:
        base = idx.search(
            [], k=None, mode="and", groups=spec.groups, must_not=mn,
            boosts=wb,
        )
    base = base.select("doc_id", F.col("score").alias("__s"))
    nm = F.lit(0)
    total = F.col("__s")
    for i, (kind, terms, w) in enumerate(spec.opt_composed):
        if kind == "phrase":
            cl = idx.search_phrase(terms, k=None)
        elif kind == "and":
            cl = idx.search(terms, k=None, mode="and")
        else:
            cl = idx.search(terms, k=None, mode="or")
        cl = cl.select(
            "doc_id", (F.col("score") * F.lit(float(w))).alias(f"__c{i}")
        )
        base = base.join(cl, "doc_id", "left")
        nm = nm + F.when(F.col(f"__c{i}").isNotNull(), F.lit(1)).otherwise(
            F.lit(0)
        )
        total = total + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    out = base.select("doc_id", total.alias("score"), nm.alias("__nm"))
    if spec.msm:
        out = out.where(F.col("__nm") >= spec.msm)
    out = out.select("doc_id", "score").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return out.limit(k) if k is not None else out


def _run_retriever(
    idx, node: dict, corpus, k, *, text_col, analyzed, id_col, nested_paths,
):
    """One retriever-tree node -> a (doc_id, score) frame. `standard`
    recurses through search_dsl (every query shape composes), `knn` is
    the exact cosine kernel, `rrf` / `linear` fuse their children's
    k-bounded lists (rank_window_size per child). linear children carry
    per-entry weight; ES's per-entry normalizer is supported when uniform
    (linear_fuse normalizes per list with ONE rule — mixed per-child
    normalizers raise rather than approximate)."""
    from pyspark.sql import functions as F

    kind, cfg = _one(node)
    if kind == "standard":
        q = cfg["query"]
        flt = cfg.get("filter")
        if flt is not None:
            # the standard retriever's filter folds into a bool filter
            # context (the fully-wired composition) — never dropped
            q = {"bool": {
                "must": [q],
                "filter": flt if isinstance(flt, list) else [flt],
            }}
        return search_dsl(
            idx, {"query": q, "size": k}, corpus,
            text_col=text_col, analyzed_fields=analyzed, id_col=id_col,
            nested_paths=nested_paths,
        )
    if kind == "knn":
        from elasticsearch_assets_spark.operators.similarity import (
            cosine_topk,
        )

        if corpus is None:
            raise ValueError("knn retriever needs corpus (the vector col)")
        flt = cfg.get("filter")
        if flt is not None:
            # ES filtered kNN: the filter applies DURING the search (the
            # k survivors all satisfy it), which is exactly a pre-filtered
            # scan feeding the exact cosine kernel
            preds = flt if isinstance(flt, list) else [flt]
            for fnode in preds:
                corpus = corpus.where(compile_filter(
                    filter_ast(fnode, text_col=text_col, analyzed=analyzed),
                    text_col=text_col, analyzed_fields=analyzed,
                ))
        out = cosine_topk(
            corpus,
            [float(x) for x in cfg["query_vector"]],
            k=int(cfg.get("k", k if k is not None else 10)),
            vec_col=cfg.get("field", "embedding"),
            id_col=id_col,
            similarity=cfg.get("similarity"),
        )
        return out.select(
            F.col(id_col).cast("long").alias("doc_id"), "score"
        )
    if kind in ("rrf", "linear"):
        from elasticsearch_assets_spark.operators.similarity import (
            linear_fuse,
            rrf_fuse,
        )

        window = int(cfg.get("rank_window_size", 10))
        entries = cfg["retrievers"]
        if not isinstance(entries, list) or not entries:
            _err(f"{kind} retriever needs a non-empty retrievers list")
        children, weights, normalizers = [], [], set()
        for e in entries:
            if isinstance(e, dict) and "retriever" in e:
                child, w = e["retriever"], float(e.get("weight", 1.0))
                normalizers.add(str(e.get("normalizer", "minmax")))
            else:
                child, w = e, 1.0
            cf = _run_retriever(
                idx, child, corpus, window, text_col=text_col,
                analyzed=analyzed, id_col=id_col,
                nested_paths=nested_paths,
            )
            # ES truncates EACH child result set to the compound's
            # rank_window_size before fusing — a child knn with explicit
            # k > window (or a nested compound, which returns unbounded)
            # must not contribute ranks beyond the window (round-3
            # advice). Same ordering rule the fusers rank by, so the cut
            # is exactly the child's top-`window`; ≤k rows, trivial cost.
            from pyspark.sql import Window as _W

            _w = _W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            cf = (
                cf.withColumn("_rw", F.row_number().over(_w))
                .where(F.col("_rw") <= window)
                .drop("_rw")
            )
            children.append(cf)
            weights.append(w)
        if kind == "rrf":
            return rrf_fuse(
                children, k_const=int(cfg.get("rank_constant", 60)),
                k=None,
            )
        if len(normalizers) > 1:
            _err(
                "linear retriever with MIXED per-child normalizers — "
                "linear_fuse applies one rule; split the fusion"
            )
        return linear_fuse(
            children, weights=weights,
            normalizer=(normalizers.pop() if normalizers else "minmax"),
            k=None,
        )
    if kind == "text_similarity_reranker":
        # 8.15 semantic reranker: the child's top rank_window_size hits
        # are RE-SCORED by semantic similarity between inference_text and
        # the document's field — here the declared-boundary stand-in
        # embedder (operators/semantic.py); a real cross-encoder swaps
        # into the same k-bounded plan. Docs embedding to the zero
        # vector drop (no direction), the kernel's documented shape.
        from elasticsearch_assets_spark.operators.semantic import (
            semantic_topk,
        )

        if corpus is None:
            raise ValueError(
                "text_similarity_reranker needs corpus (the reranked field)"
            )
        window = int(cfg.get("rank_window_size", 10))
        hits = _run_retriever(
            idx, cfg["retriever"], corpus, window, text_col=text_col,
            analyzed=analyzed, id_col=id_col, nested_paths=nested_paths,
        )
        stored = corpus
        if id_col != "doc_id":
            stored = stored.withColumnRenamed(id_col, "doc_id")
        sub = F.broadcast(
            hits.select(F.col("doc_id").cast("long").alias("doc_id"))
        ).join(stored.withColumn(
            "doc_id", F.col("doc_id").cast("long")
        ), "doc_id")
        return semantic_topk(
            sub, str(cfg["inference_text"]), k=window,
            text_col=str(cfg.get("field", text_col)), id_col="doc_id",
        )
    _err(
        f"retriever type {kind!r} (standard/knn/rrf/linear/"
        "text_similarity_reranker are wired)"
    )


# top-level kinds whose handlers return their kernel frame directly
# (before the compile_body scoring surface where generic min_score lives)
_NO_MIN_SCORE_KINDS = frozenset({
    "match_all", "ids", "query_string", "constant_score", "function_score",
    "dis_max", "simple_query_string", "boosting", "pinned", "terms_set",
    "script_score", "more_like_this", "regexp", "match_phrase_prefix",
    "match_bool_prefix", "sparse_vector", "nested", "weighted_tokens",
    "wrapper", "intervals", "span_near", "span_first", "span_not",
    "span_or", "span_containing", "span_within", "multi_match",
    "combined_fields",
})


def search_dsl(
    idx,
    body: dict,
    corpus: DataFrame | None = None,
    *,
    text_col: str = "text",
    analyzed_fields: "set[str] | None" = None,
    id_col: str = "doc_id",
    field_indexes: "dict | None" = None,
    nested_paths: "dict | None" = None,
) -> DataFrame:
    """Execute an ES search body: `{"query": {...}, "size": k,
    "min_score": s, "knn": {...}, "sort": [...], "search_after": [...],
    "aggs": via aggs_dsl}`. Structured filters need `corpus` (the
    reference's reader scan). Returns the engine's (doc_id, score)
    contract frame — or (doc_id, sort_col) under a field sort.

    Response-shape sections are wired to their kernels (ONE per body —
    each changes the output frame's shape, and set-oriented composition
    means stacking them is an explicit pipeline, not a mega-response):
    `post_filter` (hits + total_before_filter, the faceted-navigation
    contract), `rescore` -> engine.rescore, `collapse` ->
    facets.collapse_topk, `highlight` -> operators/highlight columns on
    the hits, `_source`/`fields` -> fetch_source / fetch_fields,
    `script_fields` -> computed hit columns (Spark-SQL scripts over the
    stored doc, broadcast join on the k-bounded hit list),
    `track_total_hits` -> the capped-count columns, `suggest` (alone in
    its body) -> the suggester frame (several named suggesters: call
    suggest_dsl directly for the name -> DataFrame dict)."""
    from pyspark.sql import functions as F

    analyzed = analyzed_fields or {text_col}
    if "suggest" in body:
        if set(body) - {"suggest"}:
            _err("suggest composes alone in a body — suggesters rank "
                 "dictionary terms, not documents (separate frames)")
        named = suggest_dsl(idx, body["suggest"])
        if len(named) != 1:
            _err("one named suggester per search_dsl body; suggest_dsl "
                 "returns the name -> DataFrame dict for several")
        return next(iter(named.values()))
    shape = [s for s in _SHAPE_SECTIONS if s in body]
    if len(shape) > 1:
        _err(f"one response-shape section per body (got {shape}); "
             "stack them as an explicit pipeline over the entry points")
    if shape:
        return _shaped(
            idx, body, shape[0], corpus, text_col=text_col,
            analyzed=analyzed, id_col=id_col, field_indexes=field_indexes,
            nested_paths=nested_paths,
        )
    k = body.get("size", 10)
    min_score = body.get("min_score")

    if "retriever" in body:
        # ES 8.14+ retriever tree — the modern spelling of hybrid
        # retrieval: standard (a query body), knn, and the rrf / linear
        # compound retrievers nest recursively; leaves run their own
        # kernels, compounds fuse k-bounded result lists
        if set(body) - {"retriever", "size", "min_score"}:
            _err(
                "retriever composes with size/min_score only (its tree "
                "replaces query/knn/rank)"
            )
        res = _run_retriever(
            idx, body["retriever"], corpus, k,
            text_col=text_col, analyzed=analyzed, id_col=id_col,
            nested_paths=nested_paths,
        )
        if min_score is not None:
            res = res.where(F.col("score") >= float(min_score))
        res = res.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        return res.limit(k) if k is not None else res

    if "query" not in body and "knn" not in body:
        raise ValueError("search body needs a query and/or a knn section")

    rank = body.get("rank")
    if rank is not None and "knn" not in body:
        _err(
            "rank.rrf fuses the body's query and knn result sets — add a "
            "knn section (for arbitrary result lists call "
            "similarity.rrf_fuse directly)"
        )
    if "knn" in body:
        # body-level knn section (ES 8.x): each clause retrieves its own
        # top-k by cosine; a doc found by several clauses — or by the
        # query side too — SUMS the boosted scores (the documented ES
        # combination), then the global size cut applies. `corpus` must
        # carry the vector column for the knn clauses. With a
        # `rank: {rrf: ...}` section (8.8) the result sets fuse by
        # reciprocal-rank instead: each list cut to rank_window_size,
        # score = Σ 1/(rank_constant + rank) — rank-based, so clause
        # boosts can't change it (they never reorder their own list).
        from elasticsearch_assets_spark.operators.similarity import (
            cosine_topk,
        )

        if corpus is None:
            raise ValueError("knn section needs corpus (with the vector col)")
        if "sort" in body:
            _err(
                "knn with a field sort: kNN retrieval is score-ordered by "
                "definition — sort the hits after materialization"
            )
        if rank is not None:
            method = sorted(rank)
            if method not in (["rrf"], ["linear"]):
                _err(f"rank supports rrf | linear, got {method}")
            method = method[0]
            from elasticsearch_assets_spark.operators.similarity import (
                linear_fuse,
                rrf_fuse,
            )

            rcfg = rank[method] or {}
            # strict composition (round-3 advice): a shape section inside
            # a rank body would be forwarded into the recursive query-side
            # search_dsl and fuse a wrongly-shaped frame — reject, same
            # rule the retriever path enforces
            bad = [s for s in _SHAPE_SECTIONS if s in body]
            if bad:
                _err(
                    f"rank body cannot carry response-shape sections {bad}"
                    " — apply them over the fused result as a pipeline"
                )
            window = int(rcfg.get("rank_window_size", 10))
            spec_knn = body["knn"]
            kcls = (
                [spec_knn] if isinstance(spec_knn, dict) else list(spec_knn)
            )
            lists = [
                cosine_topk(
                    corpus,
                    [float(x) for x in c["query_vector"]],
                    k=window,
                    vec_col=c.get("field", "embedding"),
                    id_col=id_col,
                    similarity=c.get("similarity"),
                ).select(F.col(id_col).cast("long").alias("doc_id"), "score")
                for c in kcls
            ]
            if "query" in body:
                sub = {kk: v for kk, v in body.items()
                       if kk not in ("knn", "rank", "size", "min_score")}
                sub["size"] = window
                lists.append(
                    search_dsl(
                        idx, sub, corpus, text_col=text_col,
                        analyzed_fields=analyzed, id_col=id_col,
                        nested_paths=nested_paths,
                    ).select("doc_id", "score")
                )
            if method == "rrf":
                res = rrf_fuse(
                    lists, k_const=int(rcfg.get("rank_constant", 60)),
                    k=None,
                )
            else:
                # linear method (8.16): minmax-normalized weighted sum;
                # knn clauses first, the query list last — weights follow
                # that order
                ws = rcfg.get("weights")
                res = linear_fuse(
                    lists,
                    weights=[float(w) for w in ws] if ws else None,
                    normalizer=str(rcfg.get("normalizer", "minmax")),
                    k=None,
                )
            if min_score is not None:
                res = res.where(F.col("score") >= float(min_score))
            res = res.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            return res.limit(k) if k is not None else res
        spec_knn = body["knn"]
        clauses = [spec_knn] if isinstance(spec_knn, dict) else list(spec_knn)
        union = None
        for c in clauses:
            part = cosine_topk(
                corpus,
                [float(x) for x in c["query_vector"]],
                k=int(c.get("k", 10)),
                vec_col=c.get("field", "embedding"),
                id_col=id_col,
                similarity=c.get("similarity"),
            ).select(
                F.col(id_col).cast("long").alias("doc_id"),
                (F.col("score") * F.lit(float(c.get("boost", 1.0)))).alias(
                    "score"
                ),
            )
            union = part if union is None else union.unionByName(part)
        if "query" in body:
            sub = {kk: v for kk, v in body.items()
                   if kk not in ("knn", "size", "min_score")}
            sub["size"] = None
            qres = search_dsl(
                idx, sub, corpus, text_col=text_col,
                analyzed_fields=analyzed, id_col=id_col,
            ).select("doc_id", "score")
            union = union.unionByName(qres)
        res = union.groupBy("doc_id").agg(F.sum("score").alias("score"))
        if min_score is not None:
            # exclusion BEFORE the size cut — dropped docs never occupy
            # the window (the ES min_score contract)
            res = res.where(F.col("score") >= float(min_score))
        res = res.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        if k is not None:
            res = res.limit(k)
        return res

    if "sort" in body:
        # field sort replaces relevance order (`sort: [{field: {order}}]`,
        # one field + implicit doc_id tiebreak — the search_sorted
        # contract; search_after rides the same path via `after`)
        sort = body["sort"]
        if isinstance(sort, dict):
            sort = [sort]
        if len(sort) != 1:
            _err("multi-field sort: one field + the doc_id tiebreak")
        sf, scfg = _one(sort[0])
        order = (scfg or {}).get("order", "asc") if isinstance(
            scfg, dict
        ) else (scfg or "asc")
        qkind, qb = _one(body["query"])
        if qkind != "match":
            _err("sort supports the match query (search_sorted's surface)")
        f, b2 = _one(qb)
        qtext, op, _, _ = _match_cfg(b2)
        if corpus is None:
            raise ValueError("sort needs corpus")
        res = idx.search_sorted(
            tokenize(qtext), corpus, sf,
            ascending=(order == "asc"), k=k, mode=op, id_col=id_col,
            after=tuple(body["search_after"]) if "search_after" in body
            else None,
        )
        return res

    query = body["query"]
    kind, qbody = _one(query)

    # min_score composes with the compiled scoring surface (compile_body
    # paths), knn, and the bool optional-should paths; the delegating
    # kinds below return their kernel's frame directly, so a min_score
    # there would be SILENTLY dropped — raise instead (the silent-no-op
    # bug class). Callers: run size=None and filter the score column.
    if min_score is not None and kind in _NO_MIN_SCORE_KINDS:
        _err(
            f"min_score with {kind!r} is not wired — run the query with "
            "size: None and filter the returned score column (generic "
            "min_score covers match/term/bool bodies and knn)"
        )

    # delegating top-level forms
    if kind == "match_all":
        if corpus is None:
            raise ValueError("match_all needs corpus")
        out = idx.match_all(corpus, k=k, id_col=id_col)
        return out
    if kind == "ids":
        if corpus is None:
            raise ValueError("ids needs corpus")
        return idx.ids_query(
            [int(v) for v in qbody["values"]], corpus,
            boost=float(qbody.get("boost", 1.0)), id_col=id_col,
        )
    if kind == "query_string":
        return idx.search_querystring(
            qbody["query"], corpus, k=k,
            text_col=text_col, analyzed_fields=analyzed, id_col=id_col,
        )
    if kind == "constant_score":
        w = float(qbody.get("boost", 1.0))
        fnode = qbody["filter"]
        fkind, fbody = _one(fnode)
        if fkind in ("match", "term") and _one(fbody)[0] in analyzed:
            if fkind == "match":
                q, op, _, _ = _match_cfg(_one(fbody)[1])
                return idx.constant_score(tokenize(q), boost=w, k=k, mode=op)
            v = _one(fbody)[1]
            v = v["value"] if isinstance(v, dict) else v
            return idx.constant_score([str(v).lower()], boost=w, k=k)
        if corpus is None:
            raise ValueError("structured constant_score filter needs corpus")
        pred = compile_filter(
            filter_ast(fnode, text_col=text_col, analyzed=analyzed),
            text_col=text_col, analyzed_fields=analyzed,
        )
        out = idx.match_all(corpus.where(pred), k=None, id_col=id_col)
        out = out.select(
            "doc_id", (F.col("score") * F.lit(w)).alias("score")
        ).orderBy(F.col("doc_id").asc())
        return out.limit(k) if k is not None else out
    if kind == "function_score":
        inner = qbody["query"]
        ikind, ibody = _one(inner)
        if ikind != "match" or _one(ibody)[0] not in analyzed:
            _err("function_score v1 wraps a match query on an analyzed field")
        if "field_value_factor" not in qbody:
            _err("function_score v1 supports field_value_factor (decay "
                 "functions go through similarity/function entry points)")
        if corpus is None:
            raise ValueError("function_score needs corpus (the factor field)")
        q, op, _, _ = _match_cfg(_one(ibody)[1])
        fvf = qbody["field_value_factor"]
        return idx.function_score(
            tokenize(q), corpus, fvf["field"],
            factor=float(fvf.get("factor", 1.0)),
            modifier=fvf.get("modifier", "none"),
            missing=float(fvf.get("missing", 1.0)),
            boost_mode=qbody.get("boost_mode", "multiply"),
            k=k, mode=op, id_col=id_col,
        )
    if kind == "dis_max":
        subs = []
        for sq in qbody["queries"]:
            skind, sbody = _one(sq)
            if skind != "match" or _one(sbody)[0] not in analyzed:
                _err("dis_max v1 takes match subqueries on analyzed fields")
            q, _, _, _ = _match_cfg(_one(sbody)[1])
            subs.append(tokenize(q))
        return idx.dis_max(
            subs, tie_breaker=float(qbody.get("tie_breaker", 0.0)), k=k
        )
    if kind == "simple_query_string":
        return idx.search_simple_query_string(
            qbody["query"], k=k,
            default_operator=qbody.get("default_operator", "or"),
        )
    if kind == "boosting":
        pos, pmode = _match_like(qbody["positive"], analyzed)
        neg, _ = _match_like(qbody["negative"], analyzed)
        return idx.boosting(
            pos, neg,
            negative_boost=float(qbody.get("negative_boost", 0.5)),
            k=k, mode=pmode,
        )
    if kind == "pinned":
        org, omode = _match_like(qbody["organic"], analyzed)
        return idx.pinned(
            [int(i) for i in qbody["ids"]], org, k=k, mode=omode,
            corpus=corpus, id_col=id_col,
        )
    if kind == "terms_set":
        f, cfg = _one(qbody)
        if f not in analyzed:
            _err(f"terms_set on non-analyzed field {f!r}")
        if corpus is None:
            raise ValueError("terms_set needs corpus (the msm field)")
        return idx.terms_set(
            [str(t).lower() for t in cfg["terms"]], corpus,
            cfg["minimum_should_match_field"], k=k, id_col=id_col,
        )
    if kind == "script_score":
        inner, imode = _match_like(qbody["query"], analyzed)
        script = qbody["script"]
        src = script["source"] if isinstance(script, dict) else str(script)
        if corpus is None:
            raise ValueError("script_score needs corpus (the script fields)")
        return idx.script_score(inner, corpus, src, k=k, mode=imode,
                                id_col=id_col)
    if kind == "more_like_this":
        like = qbody["like"]
        like = [like] if isinstance(like, dict) else list(like)
        ids = [int(d["_id"]) for d in like]
        unlike = qbody.get("unlike")
        if unlike is not None:
            unlike = [unlike] if isinstance(unlike, dict) else list(unlike)
            unlike = [int(d["_id"]) for d in unlike]
        if corpus is None:
            raise ValueError("more_like_this needs corpus (the like docs)")
        return idx.more_like_this(
            ids if len(ids) > 1 else ids[0], corpus,
            text_col=text_col, id_col=id_col,
            max_terms=int(qbody.get("max_query_terms", 10)),
            k=k, unlike=unlike,
        )
    if kind == "regexp":
        f, v = _one(qbody)
        if f not in analyzed:
            _err(f"regexp on non-analyzed field {f!r} scores — filter it")
        cfg = v if isinstance(v, dict) else {"value": v}
        return idx.search_regexp(
            str(cfg["value"]).lower(), k=k,
            max_expansions=cfg.get("max_expansions"),
        )
    if kind == "match_phrase_prefix":
        f, b2 = _one(qbody)
        if f not in analyzed:
            _err(f"match_phrase_prefix on non-analyzed field {f!r}")
        q = b2["query"] if isinstance(b2, dict) else b2
        me = b2.get("max_expansions") if isinstance(b2, dict) else None
        toks = tokenize(q)
        if (
            len(toks) == 1
            and me is None
            and idx.sayt_routes(len(toks[0]))
        ):
            # a one-term phrase prefix IS a prefix query (the ES
            # degenerate case) — route it like one; multi-term phrase
            # prefixes stay on the positional expansion path (the sayt
            # companion carries no position-aligned gram stream, so the
            # consecutive-occurrence check needs the main index's terms)
            return idx.search_prefix_sayt(toks[0], k=k)
        return idx.search_phrase_prefix(q, k=k, max_expansions=me)
    if kind == "match_bool_prefix":
        f, b2 = _one(qbody)
        if f not in analyzed:
            _err(f"match_bool_prefix on non-analyzed field {f!r}")
        q, op, _, _ = _match_cfg(b2)
        me = b2.get("max_expansions") if isinstance(b2, dict) else None
        toks = tokenize(q)
        if (
            op == "or"
            and me is None
            and toks
            and idx.sayt_routes(len(toks[-1]))
        ):
            # ES index_prefixes rewrite: the trailing prefix clause
            # becomes one sayt posting lookup (an explicit max_expansions
            # opts out — its truncated match set is expansion-path
            # semantics; operator=and keeps the exact kernel)
            return idx.match_bool_prefix_sayt(q, k=k)
        return idx.match_bool_prefix(q, k=k, operator=op, max_expansions=me)
    if kind == "sparse_vector":
        qv = qbody["query_vector"]
        # a query-level boost multiplies the final score == scaling every
        # query weight (the sparse dot product is linear in them); folding
        # it here keeps the kernel boost-free. NOTE it must NOT change the
        # pruning decision — tokens_weight_threshold compares weights to
        # the BEST weight, a ratio the uniform scale cancels out of, so
        # folding before the kernel's prune is exact.
        qb = float(qbody.get("boost", 1.0))
        return idx.search_sparse(
            {str(t).lower(): float(w) * qb for t, w in qv.items()}, k=k,
            prune=bool(qbody.get("prune", False)),
            **{
                kk: float(qbody[kk])
                for kk in (
                    "tokens_freq_ratio_threshold", "tokens_weight_threshold",
                )
                if kk in qbody
            },
        )
    if kind == "nested":
        # ES nested query, Spark-first: nested objects live in a CHILD
        # index (operators/relations.passage_corpus — child id = parent *
        # slot_base + slot, the explicit Lucene block encoding), the
        # inner query recurses through search_dsl against it (every
        # scoring shape composes), and engine.nested_topk rolls matching-
        # children scores up with score_mode (max == MaxP, sum == SumP;
        # ES default avg; `none` = match-only). `nested_paths` maps path
        # -> (child_index, slot_base) — the mapping ES derives from the
        # mapping's `nested` type declaration.
        from elasticsearch_assets_spark.query.engine import nested_topk

        path = qbody["path"]
        if not nested_paths or path not in nested_paths:
            _err(
                f"nested path {path!r}: pass nested_paths={{path: "
                "(child_index, slot_base)}} (the nested-mapping "
                "declaration)"
            )
        child_idx, slot_base = nested_paths[path]
        hits = search_dsl(
            child_idx, {"query": qbody["query"], "size": None},
            text_col=text_col, analyzed_fields=analyzed,
        )
        if "inner_hits" in qbody:
            # which passages made the parent match — the inner_hits frame
            # replaces the parent frame (one shaped frame per request,
            # the repo's response-shape convention)
            from elasticsearch_assets_spark.query.engine import (
                nested_inner_hits,
            )

            ih = qbody["inner_hits"] or {}
            return nested_inner_hits(
                hits, int(slot_base), size=int(ih.get("size", 3))
            )
        boost = float(qbody.get("boost", 1.0))
        out = nested_topk(
            hits, int(slot_base),
            score_mode=qbody.get("score_mode", "avg"), k=k,
        )
        if boost != 1.0:
            out = out.select(
                "doc_id", (F.col("score") * boost).alias("score")
            ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
        return out
    if kind == "weighted_tokens":
        # ES 8.13: precomputed (token, weight) pairs nested under the
        # FIELD name, pruning knobs under pruning_config — the same
        # sparse dot-product kernel as sparse_vector, different body
        # shape (weighted_tokens ships the model output verbatim;
        # sparse_vector runs inference server-side)
        f, cfg = _one(qbody)
        if f not in analyzed:
            _err(f"weighted_tokens on non-analyzed field {f!r}")
        pc = cfg.get("pruning_config") or {}
        # boost folds into the weights exactly like sparse_vector's (the
        # ratio-based pruning rule is scale-invariant, so this is exact)
        wb = float(cfg.get("boost", 1.0))
        return idx.search_sparse(
            {str(t).lower(): float(w) * wb for t, w in cfg["tokens"].items()},
            k=k,
            prune=bool(cfg.get("pruning_config")),
            **{
                kk: float(pc[kk])
                for kk in (
                    "tokens_freq_ratio_threshold", "tokens_weight_threshold",
                )
                if kk in pc
            },
            only_score_pruned_tokens=bool(
                pc.get("only_score_pruned_tokens", False)
            ),
        )
    if kind == "wrapper":
        return idx.search_wrapper(qbody["query"], corpus, k=k)
    if kind == "intervals":
        f, cfg = _one(qbody)
        if f not in analyzed:
            _err(f"intervals on non-analyzed field {f!r}")
        m = cfg.get("match")
        if m is None:
            _err("intervals v1 supports the `match` rule")
        if not m.get("ordered", False):
            _err("intervals v1 implements the ordered match rule — set "
                 "ordered: true (unordered has no engine kernel)")
        return idx.search_intervals(
            tokenize(m["query"]), max_gaps=int(m.get("max_gaps", 0)), k=k
        )
    if kind == "span_near":
        clauses = qbody["clauses"]
        slop = int(qbody.get("slop", 0))
        in_order = bool(qbody.get("in_order", False))
        exprs = [_span_ast(c, idx) for c in clauses]
        if all(e[0] == "term" for e in exprs):
            return idx.search_span_near(
                [e[1] for e in exprs], slop=slop, in_order=in_order, k=k
            )
        if len(exprs) != 2:
            _err("span_near with non-term clauses takes exactly two clauses")
        return idx.search_span_near_spans(
            exprs[0], exprs[1], slop=slop, in_order=in_order, k=k
        )
    if kind == "span_first":
        e = _span_ast(qbody["match"], idx)
        if e[0] != "term":
            _err("span_first's match must be a span_term")
        return idx.search_span_first(e[1], int(qbody["end"]), k=k)
    if kind == "span_not":
        inc = _span_ast(qbody["include"], idx)
        exc = _span_ast(qbody["exclude"], idx)
        if inc[0] != "term" or exc[0] != "term":
            _err("span_not v1 takes span_term include/exclude")
        return idx.search_span_not(
            inc[1], exc[1], pre=int(qbody.get("pre", 0)),
            post=int(qbody.get("post", 0)), k=k,
        )
    if kind == "span_or":
        return idx.search_span_or(
            [_span_ast(c, idx) for c in qbody["clauses"]], k=k
        )
    if kind == "span_containing":
        return idx.search_span_containing(
            _span_ast(qbody["big"], idx), _span_ast(qbody["little"], idx), k=k
        )
    if kind == "span_within":
        return idx.search_span_within(
            _span_ast(qbody["little"], idx), _span_ast(qbody["big"], idx), k=k
        )
    if kind in ("multi_match", "combined_fields"):
        from elasticsearch_assets_spark.query import engine as EM

        if field_indexes is None:
            raise ValueError(f"{kind} needs field_indexes "
                             "(field -> InvertedIndex)")
        fi = {}
        for fspec in qbody["fields"]:
            name, _, b = str(fspec).partition("^")
            if name not in field_indexes:
                raise ValueError(f"no index registered for field {name!r}")
            fi[name] = (field_indexes[name], float(b) if b else 1.0)
        if kind == "combined_fields":
            # per-field ^weights thread through as the BM25F tf weights
            if corpus is None:
                raise ValueError("combined_fields needs corpus (doclens)")
            return EM.combined_fields(
                fi, corpus, {f: f for f in fi}, qbody["query"], k=k,
                mode=qbody.get("operator", "or"), id_col=id_col,
            )
        ty = qbody.get("type", "best_fields")
        if ty == "cross_fields":
            return EM.cross_fields(
                fi, qbody["query"], k=k, mode=qbody.get("operator", "or"),
                tie_breaker=float(qbody.get("tie_breaker", 0.0)),
            )
        return EM.multi_match(
            fi, qbody["query"], match_type=ty,
            tie_breaker=float(qbody.get("tie_breaker", 0.0)), k=k,
            mode=qbody.get("operator", "or"),
        )
    if kind == "bool":
        # feature boosters (rank_feature / distance_feature) live in
        # `should` next to a `must` match — ES's documented composition;
        # the engine kernel IS that composition (BM25 + boost·S(f)), so
        # detect it BEFORE compile_body's must+should rejection.
        should = qbody.get("should", [])
        if isinstance(should, dict):
            should = [should]
        feats = [
            c for c in should
            if isinstance(c, dict)
            and len(c) == 1
            and next(iter(c)) in ("rank_feature", "distance_feature")
        ]
        if feats and len(feats) == len(should):
            must = qbody.get("must", [])
            if isinstance(must, dict):
                must = [must]
            if len(feats) != 1 or len(must) != 1:
                _err("feature boosters v1: exactly one rank_feature/"
                     "distance_feature should-clause over one must clause")
            if qbody.get("filter") or qbody.get("must_not"):
                _err("feature boosters v1 compose with a bare must clause")
            if corpus is None:
                raise ValueError("feature boosters need corpus (the field)")
            mtoks, mmode = _match_like(must[0], analyzed)
            fkind, fb = _one(feats[0])
            if fkind == "rank_feature":
                fn = next(
                    (n for n in ("saturation", "log", "sigmoid") if n in fb),
                    "saturation",
                )
                cfg = fb.get(fn) or {}
                return idx.rank_feature(
                    mtoks, corpus, fb["field"], function=fn,
                    pivot=float(cfg.get("pivot", 1.0)),
                    boost=float(fb.get("boost", 1.0)),
                    exponent=float(cfg.get("exponent", 1.0)),
                    scaling_factor=float(cfg.get("scaling_factor", 1.0)),
                    k=k, mode=mmode, id_col=id_col,
                )
            return idx.distance_feature(
                mtoks, corpus, fb["field"],
                origin=float(fb["origin"]), pivot=float(fb["pivot"]),
                boost=float(fb.get("boost", 1.0)), k=k, mode=mmode,
                id_col=id_col,
            )

    if kind == "prefix":
        f, v = _one(qbody)
        cfg = v if isinstance(v, dict) else {"value": v}
        val = str(cfg.get("value", "")).lower()
        if f in analyzed and "rewrite" not in cfg and idx.sayt_routes(len(val)):
            # ES index_prefixes transparent rewrite (round-4 verdict #1):
            # the prefix becomes a term query on the attached sayt
            # companion — one posting lookup instead of the N-term scored
            # OR, identical match set, the companion's documented
            # term-BM25 scoring. An explicit `rewrite` key keeps the
            # requested expansion rewrite; attach_sayt(auto=False) is the
            # global opt-out.
            w = float(cfg.get("boost", 1.0))
            res = idx.search_prefix_sayt(
                val, k=None if min_score is not None else k
            )
            if w != 1.0:
                res = res.select(
                    "doc_id", (F.col("score") * w).alias("score")
                )
            if min_score is not None:
                res = res.where(F.col("score") >= float(min_score))
            if w != 1.0 or min_score is not None:
                res = res.orderBy(
                    F.col("score").desc(), F.col("doc_id").asc()
                )
                if min_score is not None and k is not None:
                    res = res.limit(k)
            return res
    spec = compile_body(
        query, idx, text_col=text_col, analyzed_fields=analyzed
    )
    # min_score excludes docs BEFORE the size window (the ES contract):
    # run the kernels uncut, filter, then cut
    _kq = None if min_score is not None else k
    boosts = spec.boosts or None
    flat = spec.flat_terms
    if spec.opt_composed is not None and not spec.filters:
        res = _run_opt_composed(idx, spec, _kq, id_col=id_col)
        if min_score is not None:
            res = res.where(F.col("score") >= float(min_score))
            res = res.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            if k is not None:
                res = res.limit(k)
        return res
    if spec.opt_should is not None and not spec.filters:
        # must+should optional-clause scoring (the filtered composition
        # rides search_filtered's opt_should path below)
        res = idx.search_optional_should(
            [], spec.opt_should, k=_kq,
            minimum_should_match=spec.msm or 0,
            must_not=sorted(set(spec.must_not_terms)) or None,
            groups=spec.groups,
        )
        if min_score is not None:
            res = res.where(F.col("score") >= float(min_score))
            res = res.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            if k is not None:
                res = res.limit(k)
        return res
    if not spec.groups and spec.phrase is None and spec.msm is None:
        # filter-only bool: every match scores 1.0 (the ES filter-context
        # contract), tombstones excluded by match_all
        if not spec.filters:
            raise ValueError("bool query with no clauses")
        if corpus is None:
            raise ValueError("structured DSL filters need corpus")
        pred = None
        for node in spec.filters:
            c = compile_filter(
                node, text_col=text_col, analyzed_fields=analyzed
            )
            pred = c if pred is None else (pred & c)
        if spec.must_not_terms:
            ex = compile_filter(
                Not(Or(tuple(
                    Term(None, t) for t in sorted(set(spec.must_not_terms))
                ))),
                text_col=text_col, analyzed_fields=analyzed,
            )
            pred = pred & ex
        return idx.match_all(corpus.where(pred), k=_kq, id_col=id_col)
    if spec.filters:
        if corpus is None:
            raise ValueError("structured DSL filters need corpus")
        pred = None
        for node in spec.filters:
            c = compile_filter(
                node, text_col=text_col, analyzed_fields=analyzed
            )
            pred = c if pred is None else (pred & c)
        filtered = corpus.where(pred)
        if spec.must_not_terms:
            # fold exclusions into the filter (identical token semantics;
            # the pure-scoring path uses the index-assisted exclusion)
            ex = compile_filter(
                Not(Or(tuple(
                    Term(None, t) for t in sorted(set(spec.must_not_terms))
                ))),
                text_col=text_col, analyzed_fields=analyzed,
            )
            filtered = filtered.where(ex)
        if spec.opt_composed is not None:
            res = _run_opt_composed(
                idx, spec, _kq, filtered=filtered, id_col=id_col
            )
        elif spec.opt_should is not None:
            # optional-should under a structured filter: must∩filter
            # decides matching, clauses add score — all three
            # search_filtered strategies rank-identical (tested)
            res = idx.search_filtered(
                [], filtered, k=_kq, mode="and", id_col=id_col,
                groups=spec.groups, opt_should=spec.opt_should,
                opt_msm=spec.msm or 0,
            )
        elif spec.phrase is not None:
            res = idx.search_phrase_filtered(
                spec.phrase, filtered, k=_kq, id_col=id_col,
                groups=spec.groups or None, boosts=boosts,
            )
        elif spec.msm is not None:
            # membership (>= msm distinct terms) is filter-independent,
            # so the filtered kernels apply the same count before the
            # allowed-set cut — rank-identical across strategies (tested)
            res = idx.search_filtered(
                flat or [], filtered, k=_kq, mode="or", id_col=id_col,
                boosts=boosts, min_should_match=spec.msm,
            )
        elif spec.zero_should:
            # bool{filter, should}, no explicit msm — the ES default is
            # 0: score the shoulds over the filter survivors, then union
            # the no-should survivors back in at score 0 (they sort after
            # every positive BM25 score; doc_id tiebreak as everywhere)
            scored = idx.search_filtered(
                flat or [], filtered, k=None, mode="or",
                id_col=id_col, groups=spec.groups or None, boosts=boosts,
            )
            zeros = (
                idx.match_all(filtered, k=None, id_col=id_col)
                .join(scored.select("doc_id"), "doc_id", "left_anti")
                .select("doc_id", F.lit(0.0).alias("score"))
            )
            res = scored.unionByName(zeros).orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            )
            if _kq is not None:
                res = res.limit(_kq)
        else:
            res = idx.search_filtered(
                flat or [], filtered, k=_kq, mode=spec.mode,
                id_col=id_col, groups=spec.groups or None, boosts=boosts,
            )
    else:
        if spec.phrase is not None:
            ex_terms = sorted(set(spec.must_not_terms))
            res = idx.search_phrase(
                spec.phrase, k=None if ex_terms else _kq,
                groups=spec.groups or None, boosts=boosts,
            )
            if ex_terms:
                # index-assisted exclusion: docs holding ANY not-term come
                # from one pushed OR posting scan; anti-join only removes
                # rows, so the phrase ranking stays rank-safe
                ex = idx.search(ex_terms, k=None, mode="or").select("doc_id")
                res = res.join(ex, "doc_id", "left_anti").orderBy(
                    F.col("score").desc(), F.col("doc_id").asc()
                )
                if _kq is not None:
                    res = res.limit(_kq)
        elif spec.msm is not None:
            res = idx.search(
                flat or [], k=_kq, mode="or", min_should_match=spec.msm,
                boosts=boosts,
                must_not=sorted(set(spec.must_not_terms)) or None,
            )
        else:
            res = idx.search(
                [], k=_kq, mode=spec.mode, groups=spec.groups or None,
                boosts=boosts,
                must_not=sorted(set(spec.must_not_terms)) or None,
            )
    if min_score is not None:
        res = res.where(F.col("score") >= float(min_score))
        res = res.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        if k is not None:
            res = res.limit(k)
    return res


def aggs_dsl(
    aggs: dict,
    matches: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzed_fields: "set[str] | None" = None,
) -> "dict[str, DataFrame]":
    """The search body's `aggs` section: each named aggregation compiles to
    its facets-module plan over (match set x corpus) and comes back as a
    DataFrame keyed by the caller's agg name — the set-oriented spelling
    of the ES response's `aggregations` object. Flat types map 1:1 onto
    the oracle-pinned facet ops: terms (size / include / exclude),
    histogram, date_histogram (calendar_interval), range, filters, stats,
    cardinality, value_count, missing.

    Sub-aggregation TREES compile recursively (round-5, verdict item #2):
    any chain of bucket aggs (terms / histogram / date_histogram / range /
    filters) nested to any depth, each level carrying any mix of metric
    children (avg / sum / min / max / value_count / cardinality / stats)
    and sibling-path pipeline children (avg_bucket / sum_bucket /
    min_bucket / max_bucket). The whole chain executes as ONE rollup
    shuffle (operators/facets.facet_tree — every level's buckets and
    metrics are grouping sets of the same pass, the ES sub-collector
    execution model); a terms `size` at any depth is a per-parent
    row_number cut (the QUALIFY shape) whose survivors prune deeper
    levels via a broadcast semi join. The two round-3 one-level shapes
    keep their original single-kernel plans and column names
    (facet_terms_metrics / facet_terms_nested).

    Tree response shape: deep results come back keyed by LEVEL PATH —
    `"outer>inner"` for the leaf frame of a 2-level chain (columns =
    one key column per level named by its agg name, `doc_count`, the
    leaf level's metric children) plus one extra `"outer"`-style entry
    for every SHALLOWER level that carries its own metric children, and
    `"outer>pipe_name"` entries for pipeline children (grouped by their
    owning level's keys, column `value`). A node with several bucket
    children emits one path per branch — branches are independent in ES
    too; shared prefix levels are emitted once."""
    from elasticsearch_assets_spark.operators import facets as OFA

    analyzed = analyzed_fields or {text_col}
    out: dict[str, DataFrame] = {}
    for name, node in aggs.items():
        kind, cfg = _one(
            {kk: v for kk, v in node.items()
             if kk not in ("aggs", "aggregations")}
        )
        sub = node.get("aggs", node.get("aggregations"))
        if sub is not None and not sub:
            _err(f"aggregation {name!r}: empty `aggs` object")
        if sub is not None:
            from pyspark.sql import functions as F

            if kind == "global":
                # ES global agg: sub-aggs see the WHOLE corpus, ignoring
                # the query's match set — recurse with an all-ids match
                # frame; results nest under "<name>>"
                if cfg:
                    _err("global agg takes an empty body")
                inner = aggs_dsl(
                    sub, corpus.select(F.col(id_col)), corpus,
                    id_col=id_col, text_col=text_col,
                    analyzed_fields=analyzed,
                )
                out.update({f"{name}>{kk}": v for kk, v in inner.items()})
                continue
            if kind == "filter":
                # ES filter agg: sub-aggs over (match set ∩ filter) —
                # the filter compiles to a pushed corpus predicate and
                # narrows the id frame with one semi join
                pred = compile_filter(
                    filter_ast(cfg, text_col=text_col, analyzed=analyzed),
                    text_col=text_col, analyzed_fields=analyzed,
                )
                ids = corpus.where(pred).select(F.col(id_col))
                m2 = matches.select(F.col(id_col)).join(
                    ids, id_col, "left_semi"
                )
                inner = aggs_dsl(
                    sub, m2, corpus, id_col=id_col, text_col=text_col,
                    analyzed_fields=analyzed,
                )
                out.update({f"{name}>{kk}": v for kk, v in inner.items()})
                continue
            if kind == "sampler":
                # deterministic sampler (facet_sampler's contract): v1
                # sub-agg = one terms child, the kernel's built-in shape
                ck, cc = _one_child(sub, "sampler", "terms")
                out[name] = OFA.facet_sampler(
                    matches, corpus, cc["field"],
                    shard_size=int(cfg.get("shard_size", 100)),
                    id_col=id_col,
                )
                continue
            if kind == "terms" and len(sub) == 1:
                (cn, cnode), = sub.items()
                ck2, cc2 = _one(
                    {kk: v for kk, v in cnode.items()
                     if kk not in ("aggs", "aggregations")}
                )
                deeper2 = cnode.get("aggs", cnode.get("aggregations"))
                if ck2 == "top_hits" and not deeper2:
                    # terms + top_hits child: the grouped-top-k window
                    # kernel; needs a SCORED match frame (the hit ranks
                    # order per bucket)
                    if "score" not in matches.columns:
                        _err(
                            "top_hits needs a scored match frame "
                            "(pass the search result, not bare ids)"
                        )
                    extra = set(cfg) - {"field"}
                    if extra:
                        _err(
                            f"terms+top_hits composes with a plain field "
                            f"terms (got extra keys {sorted(extra)})"
                        )
                    out[name] = OFA.facet_top_hits(
                        matches, corpus, cfg["field"],
                        per_bucket=int(cc2.get("size", 1)), id_col=id_col,
                    )
                    continue
            # the one-level fast path only understands these cfg keys —
            # anything else (min_doc_count, include/exclude, ...) must NOT
            # be silently dropped: route to the general tree instead
            if kind == "terms" and set(cfg) <= {
                "field", "size", "order", "missing"
            }:
                try:
                    out[name] = _terms_subaggs(sub, cfg, matches, corpus,
                                               OFA, id_col=id_col)
                    continue
                except NotImplementedError:
                    pass  # not a one-level fast-path shape: general tree
            out.update(_aggs_tree(
                name, node, matches, corpus, OFA, id_col=id_col,
                text_col=text_col, analyzed=analyzed,
            ))
            continue
        f = cfg.get("field")
        if kind == "range":
            out[name] = OFA.facet_range(
                matches, corpus, f, _range_edges(cfg), id_col=id_col
            )
        elif kind == "filters":
            out[name] = OFA.facet_filters(
                corpus,
                {
                    fn: compile_filter(
                        filter_ast(q, text_col=text_col, analyzed=analyzed),
                        text_col=text_col, analyzed_fields=analyzed,
                    )
                    for fn, q in cfg["filters"].items()
                },
                matches=matches, id_col=id_col,
                other_bucket=bool(cfg.get("other_bucket", False)),
            )
        elif kind == "terms":
            if "include" in cfg or "exclude" in cfg:
                out[name] = OFA.facet_counts_regex(
                    matches, corpus, f, cfg.get("size"),
                    include_re=cfg.get("include"),
                    exclude_re=cfg.get("exclude"), id_col=id_col,
                )
            else:
                out[name] = OFA.facet_counts(
                    matches, corpus, f, cfg.get("size"), id_col=id_col
                )
        elif kind == "histogram":
            out[name] = OFA.facet_histogram(
                matches, corpus, f, float(cfg["interval"]), id_col=id_col,
                min_doc_count=int(cfg.get("min_doc_count", 1)),
            )
        elif kind == "date_histogram":
            out[name] = OFA.facet_date_histogram(
                matches, corpus, f,
                cfg.get("calendar_interval", cfg.get("interval", "month")),
                id_col=id_col,
            )
        elif kind == "stats":
            out[name] = OFA.facet_stats(matches, corpus, f, id_col=id_col)
        elif kind == "cardinality":
            out[name] = OFA.facet_cardinality(
                matches, corpus, f, id_col=id_col
            )
        elif kind == "value_count":
            out[name] = OFA.facet_value_count(
                matches, corpus, f, id_col=id_col
            )
        elif kind == "missing":
            out[name] = OFA.facet_missing(matches, corpus, f, id_col=id_col)
        elif kind == "percentiles":
            out[name] = OFA.facet_percentiles(
                matches, corpus, f,
                [float(p) for p in cfg.get(
                    "percents", [1, 5, 25, 50, 75, 95, 99]
                )],
                id_col=id_col,
            )
        elif kind == "percentile_ranks":
            out[name] = OFA.facet_percentile_ranks(
                matches, corpus, f, [float(v) for v in cfg["values"]],
                id_col=id_col,
            )
        elif kind == "extended_stats":
            out[name] = OFA.facet_extended_stats(
                matches, corpus, f, sigma=float(cfg.get("sigma", 2.0)),
                id_col=id_col,
            )
        elif kind == "weighted_avg":
            out[name] = OFA.facet_weighted_avg(
                matches, corpus, cfg["value"]["field"],
                cfg["weight"]["field"], id_col=id_col,
            )
        elif kind == "rare_terms":
            out[name] = OFA.facet_rare_terms(
                matches, corpus, f,
                max_doc_count=int(cfg.get("max_doc_count", 1)),
                id_col=id_col,
            )
        elif kind == "multi_terms":
            out[name] = OFA.facet_multi_terms(
                matches, corpus, [t["field"] for t in cfg["terms"]],
                n=cfg.get("size"), id_col=id_col,
            )
        elif kind == "median_absolute_deviation":
            out[name] = OFA.facet_mad(matches, corpus, f, id_col=id_col)
        elif kind == "boxplot":
            out[name] = OFA.facet_boxplot(matches, corpus, f, id_col=id_col)
        elif kind == "string_stats":
            out[name] = OFA.facet_string_stats(
                matches, corpus, f, id_col=id_col
            )
        elif kind == "auto_date_histogram":
            out[name] = OFA.facet_auto_date_histogram(
                matches, corpus, f,
                target_buckets=int(cfg.get("buckets", 10)), id_col=id_col,
            )
        elif kind == "adjacency_matrix":
            out[name] = OFA.facet_adjacency_matrix(
                matches, corpus,
                {
                    fn: compile_filter(
                        filter_ast(q, text_col=text_col, analyzed=analyzed),
                        text_col=text_col, analyzed_fields=analyzed,
                    )
                    for fn, q in cfg["filters"].items()
                },
                sep=cfg.get("separator", "&"), id_col=id_col,
            )
        elif kind == "composite":
            keys = []
            for s in cfg["sources"]:
                sname, sdef = _one(s)
                skind, sc = _one(sdef)
                if skind != "terms":
                    _err(
                        f"composite source {sname!r}: only terms sources "
                        "compile (date_histogram/histogram sources: "
                        "pre-project the bucket column)"
                    )
                keys.append(sc["field"])
            after = cfg.get("after")
            at = (
                tuple(after[_one(s)[0]] for s in cfg["sources"])
                if after is not None else None
            )
            out[name] = OFA.facet_composite(
                corpus, keys, size=cfg.get("size"), after=at,
                matches=matches, id_col=id_col,
            )
        else:
            _err(f"unsupported aggregation {kind!r} in aggs_dsl")
    return out


def _terms_subaggs(
    sub: dict, cfg: dict, matches, corpus, OFA, *, id_col: str
):
    """One level of children under a `terms` bucket agg — the two shapes
    with single-pass kernels (extra partials on the bucket shuffle; no
    second pass over the data, the ES execution model)."""
    if any("aggs" in node or "aggregations" in node for node in sub.values()):
        raise NotImplementedError(
            "aggs_dsl supports ONE level of sub-aggregation"
        )
    kinds = {n: _one(node) for n, node in sub.items()}
    if all(k in ("avg", "sum") for k, _ in kinds.values()):
        fields = {c.get("field") for _, c in kinds.values()}
        if len(fields) != 1:
            raise NotImplementedError(
                "metric children must share one field "
                "(facet_terms_metrics computes sum+avg in the same pass)"
            )
        order_by, ascending = "count", False
        order = cfg.get("order")
        if order:
            oname, odir = _one(order)
            ascending = odir == "asc"
            if oname == "_count":
                order_by = "count"
            elif oname in kinds:
                order_by = kinds[oname][0]
            else:
                raise ValueError(f"order references unknown child {oname!r}")
        return OFA.facet_terms_metrics(
            matches, corpus, cfg["field"], next(iter(fields)),
            n=cfg.get("size"), id_col=id_col,
            order_by=order_by, ascending=ascending,
            missing=cfg.get("missing"),
        )
    if len(kinds) == 1 and next(iter(kinds.values()))[0] == "terms":
        if "size" in cfg:
            raise NotImplementedError(
                "terms-in-terms returns ALL buckets (facet_terms_nested); "
                "apply the size cut on the result frame"
            )
        (_, (_, inner_cfg)), = kinds.items()
        return OFA.facet_terms_nested(
            matches, corpus, cfg["field"], inner_cfg["field"], id_col=id_col
        )
    raise NotImplementedError(
        "supported children: avg/sum metrics (one shared field) or a "
        "single nested terms"
    )


# -- general aggregation trees (round-5, verdict item #2) --------------------

_TREE_BUCKET_KINDS = frozenset(
    {"terms", "histogram", "date_histogram", "range", "filters"}
)
_TREE_METRIC_KINDS = frozenset(
    {"avg", "sum", "min", "max", "value_count", "cardinality", "stats",
     "percentiles"}
)
_TREE_PIPE_KINDS = frozenset(
    {"avg_bucket", "sum_bucket", "min_bucket", "max_bucket",
     "cumulative_sum", "derivative", "moving_fn"}
)
_TREE_CAL_INTERVALS = (
    "year", "quarter", "month", "week", "day", "hour", "minute",
)


def _one_child(sub: dict, parent: str, want: str) -> tuple:
    """The single sub-agg of `parent`, asserting it is a `want` node with
    no deeper children; returns (kind, cfg)."""
    if len(sub) != 1:
        _err(f"{parent} agg v1 takes exactly one sub-aggregation")
    (cn, cnode), = sub.items()
    kind, cfg = _one(
        {kk: v for kk, v in cnode.items()
         if kk not in ("aggs", "aggregations")}
    )
    if kind != want or cnode.get("aggs", cnode.get("aggregations")):
        _err(f"{parent} agg v1: the sub-aggregation must be a flat {want}")
    return kind, cfg


def _range_edges(cfg: dict) -> list[float]:
    """ES `ranges` [{to}, {from,to}, ..., {from}] -> the contiguous edge
    list facet_range keys by. The engine's range buckets are the
    contiguous half-open partition (*-e0, e0-e1, ..., en-*); overlapping
    or gapped range lists raise (they need per-range conditional counts —
    spell them as a `filters` agg, which IS that plan)."""
    ranges = cfg.get("ranges")
    if not ranges:
        raise ValueError("range agg needs `ranges`")
    edges: list[float] = []
    prev_to = None
    for i, r in enumerate(ranges):
        lo, hi = r.get("from"), r.get("to")
        if i == 0:
            if lo is not None:
                raise ValueError(
                    "range agg: first range must be open (*-to); gapped/"
                    "overlapping range lists: use a `filters` agg"
                )
        elif lo is None or float(lo) != prev_to:
            raise ValueError(
                "range agg: ranges must be contiguous (from == previous "
                "to); gapped/overlapping lists: use a `filters` agg"
            )
        if i < len(ranges) - 1:
            if hi is None:
                raise ValueError("range agg: only the last range is *-open")
            edges.append(float(hi))
            prev_to = float(hi)
        elif hi is not None:
            raise ValueError("range agg: last range must be open (from-*)")
    return edges


def _tree_level(name: str, kind: str, cfg: dict, *, text_col, analyzed):
    """One bucket level of an agg tree -> the facets.facet_tree level dict
    (key Column per bucket kind, the ES key formulas shared with the flat
    kernels: terms value, floor(v/interval)*interval, date_trunc, range
    bucket index, filters explode)."""
    from pyspark.sql import functions as F

    if kind == "terms":
        key = F.col(cfg["field"])
        if cfg.get("missing") is not None:
            key = F.coalesce(key, F.lit(cfg["missing"]))
        order = None
        if cfg.get("order"):
            oname, odir = _one(cfg["order"])
            order = (
                "_count" if oname == "_count"
                else "_key" if oname == "_key" else oname,
                odir == "asc",
            )
        return {
            "name": name, "key": key,
            "size": cfg.get("size"), "order": order,
            "min_doc_count": cfg.get("min_doc_count"),
            # include/exclude prune the bucket UNIVERSE before the count
            # shuffle (facet_counts_regex's anchored-whole-string rule)
            "include_re": cfg.get("include"),
            "exclude_re": cfg.get("exclude"),
        }
    if kind == "histogram":
        iv = float(cfg["interval"])
        key = (F.floor(F.col(cfg["field"]) / F.lit(iv)) * F.lit(iv)).cast(
            "double"
        )
        mdc = cfg.get("min_doc_count")
        if mdc is not None and int(mdc) == 0:
            raise ValueError(
                "histogram min_doc_count=0 (empty-bucket fill) is a flat-"
                "path feature — empty buckets have no rows to roll up in "
                "a tree; use the flat histogram agg"
            )
        return {"name": name, "key": key, "min_doc_count": mdc}
    if kind == "date_histogram":
        if "fixed_interval" in cfg:
            # epoch-floored fixed buckets ("30s"/"5m"/"1h"/"7d") — the
            # session timezone is pinned UTC (session.py), so epoch
            # flooring here == DuckDB's epoch() on naive timestamps
            secs = _fixed_interval_seconds(cfg["fixed_interval"])
            key = F.timestamp_seconds(
                F.floor(F.unix_timestamp(F.col(cfg["field"])) / F.lit(secs))
                * F.lit(secs)
            )
            return {"name": name, "key": key,
                    "min_doc_count": cfg.get("min_doc_count")}
        interval = cfg.get("calendar_interval", cfg.get("interval", "month"))
        if interval not in _TREE_CAL_INTERVALS:
            raise ValueError(f"unsupported calendar interval {interval!r}")
        return {
            "name": name,
            "key": F.date_trunc(interval, F.col(cfg["field"])),
            "min_doc_count": cfg.get("min_doc_count"),
        }
    if kind == "range":
        edges = _range_edges(cfg)
        v = F.col(cfg["field"]).cast("double")
        bidx = sum(
            (F.when(v >= F.lit(float(e)), 1).otherwise(0) for e in edges),
            F.lit(0),
        )
        # key = bucket INDEX (0 = *-e0), matching facet_range's bidx —
        # label strings would re-introduce float formatting into oracles.
        # Missing field drops (null-guarded: null comparisons would
        # otherwise land in bucket 0)
        return {"name": name, "key": F.when(v.isNotNull(), bidx)}
    if kind == "filters":
        named = cfg["filters"]
        arrs = []
        for fn in sorted(named):
            cond = compile_filter(
                filter_ast(named[fn], text_col=text_col, analyzed=analyzed),
                text_col=text_col, analyzed_fields=analyzed,
            )
            arrs.append(
                F.when(F.coalesce(cond, F.lit(False)), F.array(F.lit(fn)))
                .otherwise(F.array().cast("array<string>"))
            )
        return {"name": name, "explode": F.concat(*arrs)}
    _err(f"unsupported bucket agg {kind!r} in agg tree")


def _tree_metric(child: str, kind: str, cfg: dict) -> list:
    """Metric child -> [(out column name, agg Column)] — extra partials on
    the tree's shared rollup shuffle (`stats` fans out to its five
    columns, prefixed by the child name like the ES response object)."""
    from pyspark.sql import functions as F

    v = F.col(cfg["field"]).cast("double")
    if kind == "avg":
        return [(child, F.avg(v))]
    if kind == "sum":
        return [(child, F.sum(v))]
    if kind == "min":
        return [(child, F.min(v))]
    if kind == "max":
        return [(child, F.max(v))]
    if kind == "value_count":
        return [(child, F.count(F.col(cfg["field"])))]
    if kind == "cardinality":
        return [(child, F.countDistinct(F.col(cfg["field"])))]
    if kind == "stats":
        return [
            (f"{child}_count", F.count(v)),
            (f"{child}_min", F.min(v)),
            (f"{child}_max", F.max(v)),
            (f"{child}_sum", F.sum(v)),
            (f"{child}_avg", F.avg(v)),
        ]
    if kind == "percentiles":
        # EXACT variant (linear interpolation at rank p*(n-1)) — Spark's
        # `percentile` and DuckDB's quantile_cont share the definition
        # (facet_percentiles' oracle argument); at 10^12 docs swap
        # percentile_approx into the same slot and drop to rows-only
        pcts = cfg.get("percents", [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0])
        return [
            (
                f"{child}_{float(p):g}".replace(".", "_"),
                F.percentile(v, F.lit(float(p) / 100.0)),
            )
            for p in pcts
        ]
    raise AssertionError(kind)


def _fixed_interval_seconds(spec: str) -> int:
    """ES fixed_interval ("30s", "5m", "3h", "7d") -> seconds."""
    units = {"s": 1, "m": 60, "h": 3600, "d": 86400}
    s = str(spec).strip().lower()
    if not s or s[-1] not in units or not s[:-1].isdigit():
        raise ValueError(
            f"unsupported fixed_interval {spec!r} (use <n>[smhd])"
        )
    n = int(s[:-1])
    if n <= 0:
        raise ValueError("fixed_interval must be positive")
    return n * units[s[-1]]


def _aggs_tree(
    name: str, node: dict, matches, corpus, OFA, *,
    id_col: str, text_col: str, analyzed,
) -> "dict[str, DataFrame]":
    """Compile one named agg NODE with sub-aggregations into frames via
    the single-rollup kernel (facets.facet_tree). The tree flattens to
    root-to-leaf bucket CHAINS (a node with several bucket children
    branches into one chain per child — ES computes sibling branches
    independently too; shared prefix levels are emitted once, from the
    first branch). Response keys are level paths (aggs_dsl docstring)."""
    from pyspark.sql import Window, functions as F

    chains: list[list[dict]] = []   # parsed level dicts, one list per path
    pipes: list[tuple[int, str, str, dict, list]] = []

    def walk(aggname: str, n_: dict, prefix: list) -> None:
        kind, cfg = _one(
            {kk: v for kk, v in n_.items()
             if kk not in ("aggs", "aggregations")}
        )
        if kind not in _TREE_BUCKET_KINDS:
            _err(
                f"agg tree node {aggname!r}: {kind!r} cannot carry "
                f"sub-aggregations (bucket kinds: "
                f"{sorted(_TREE_BUCKET_KINDS)})"
            )
        lv = _tree_level(aggname, kind, cfg, text_col=text_col,
                         analyzed=analyzed)
        metrics: list = []
        buckets: list = []
        sub = n_.get("aggs", n_.get("aggregations")) or {}
        for cn, cnode in sub.items():
            ckind, ccfg = _one(
                {kk: v for kk, v in cnode.items()
                 if kk not in ("aggs", "aggregations")}
            )
            deeper = cnode.get("aggs", cnode.get("aggregations"))
            if ckind in _TREE_METRIC_KINDS and not deeper:
                metrics.extend(_tree_metric(cn, ckind, ccfg))
            elif ckind in _TREE_PIPE_KINDS and not deeper:
                pipes.append((len(prefix), cn, ckind, ccfg, prefix + [lv]))
            elif ckind in _TREE_BUCKET_KINDS:
                buckets.append((cn, cnode))
            else:
                _err(
                    f"unsupported child agg {ckind!r} under {aggname!r} "
                    f"(metrics: {sorted(_TREE_METRIC_KINDS)}, pipelines: "
                    f"{sorted(_TREE_PIPE_KINDS)}, buckets: "
                    f"{sorted(_TREE_BUCKET_KINDS)})"
                )
        lv["metrics"] = metrics
        chain = prefix + [lv]
        if not buckets:
            chains.append(chain)
            return
        for cn, cnode in buckets:
            walk(cn, cnode, chain)

    walk(name, node, [])

    for chain in chains:
        ei = next(
            (i for i, c in enumerate(chain) if c.get("explode") is not None),
            None,
        )
        if ei is None:
            continue
        # a filters level EXPLODES overlapping buckets — correct for the
        # filters level and everything beneath it, but a doc matching two
        # filters would be counted twice by any SHALLOWER level's metrics
        # / count-ordered size cut / min_doc_count. Refuse those
        # combinations instead of silently double-counting.
        bad = [
            c["name"] for c in chain[:ei]
            if c.get("metrics") or c.get("size") is not None
            or c.get("min_doc_count") is not None
        ]
        if bad:
            _err(
                f"levels {bad} sit above the overlapping-buckets filters "
                f"level {chain[ei]['name']!r}: their metrics/size/"
                "min_doc_count would double-count docs matching several "
                "filters — attach them as a sibling named agg, or make "
                "the filters level outermost"
            )

    out: dict[str, DataFrame] = {}
    emitted: set[str] = set()
    for chain in chains:
        frames = OFA.facet_tree(matches, corpus, chain, id_col=id_col)
        for i, lv in enumerate(chain):
            path = ">".join(c["name"] for c in chain[: i + 1])
            if path in emitted:
                continue
            # leaf frames always ship; shallower levels only when they
            # carry their own metric children (otherwise their counts
            # are derivable and the response stays lean)
            if i == len(chain) - 1 or lv["metrics"]:
                out[path] = frames[i]
                emitted.add(path)
        # resolve pipeline children whose owning level lies on this chain
        for owner_depth, pn, pkind, pcfg, owner_chain in pipes:
            owner_path = ">".join(c["name"] for c in owner_chain)
            this_path = ">".join(c["name"] for c in chain[: owner_depth + 1])
            key = f"{owner_path}>{pn}"
            if key in emitted or this_path != owner_path:
                continue
            bpath = pcfg["buckets_path"].split(">")
            target_names = [c["name"] for c in chain]
            want = [c["name"] for c in owner_chain] + bpath[:-1]
            if target_names[: len(want)] != want:
                continue  # the referenced branch is a different chain
            tcol = bpath[-1]
            tcol = "doc_count" if tcol == "_count" else tcol
            depth = len(want) - 1
            if any(
                c.get("explode") is not None for c in chain[depth + 1:]
            ):
                _err(
                    f"pipeline {pn!r}: its bucket series sits above an "
                    "overlapping-buckets filters level — doc counts there "
                    "double-count docs matching several filters; attach "
                    "the pipeline as a sibling named agg"
                )
            keys = [c["name"] for c in owner_chain]
            if pkind in ("cumulative_sum", "derivative", "moving_fn"):
                # SERIAL pipeline aggs: one value PER child bucket, a
                # window over the bucket series ordered by the child's
                # key, partitioned by the owning level's keys — bucket
                # cardinality, not doc cardinality (facet_pipeline's
                # safety argument). ES restricts these to histogram-
                # family parents; the key ordering generalizes.
                ser_keys = [c["name"] for c in chain[: depth + 1]]
                w = Window.partitionBy(*keys).orderBy(
                    *[F.col(c).asc() for c in ser_keys[len(keys):]]
                )
                if pkind == "cumulative_sum":
                    val = F.sum(tcol).over(
                        w.rowsBetween(Window.unboundedPreceding, 0)
                    )
                elif pkind == "derivative":
                    # first bucket's derivative is null (the ES contract)
                    val = F.col(tcol) - F.lag(tcol, 1).over(w)
                else:
                    mw = int(pcfg.get("window", 3))
                    # ES moving_fn default shapes: trailing window
                    # INCLUDING the current bucket; v1 script = the avg
                    # (MovingFunctions.unweightedAvg)
                    val = F.avg(tcol).over(w.rowsBetween(-(mw - 1), 0))
                out[key] = (
                    frames[depth]
                    .withColumn("value", val)
                    .select(
                        *ser_keys, F.col(tcol).alias("series"), "value"
                    )
                    .orderBy(*[F.col(c).asc() for c in ser_keys])
                )
                emitted.add(key)
                continue
            fn = {
                "avg_bucket": F.avg, "sum_bucket": F.sum,
                "min_bucket": F.min, "max_bucket": F.max,
            }[pkind]
            out[key] = (
                frames[depth]
                .groupBy(*keys)
                .agg(fn(F.col(tcol)).alias("value"))
                .orderBy(*[F.col(c).asc() for c in keys])
            )
            emitted.add(key)
    for owner_depth, pn, pkind, pcfg, owner_chain in pipes:
        key = ">".join(c["name"] for c in owner_chain) + f">{pn}"
        if key not in emitted:
            _err(
                f"pipeline {pn!r}: buckets_path "
                f"{pcfg.get('buckets_path')!r} does not resolve to a "
                "descendant bucket level + metric/_count"
            )
    return out


def search_response(
    idx,
    body: dict,
    corpus: DataFrame | None = None,
    *,
    text_col: str = "text",
    analyzed_fields: "set[str] | None" = None,
    id_col: str = "doc_id",
    field_indexes: "dict | None" = None,
    nested_paths: "dict | None" = None,
    persist_matches: bool = True,
) -> "dict[str, DataFrame]":
    """Multi-section ES response (round-5, verdict item #6): one request
    body returns hits + aggs + suggest + highlight + total TOGETHER, as a
    dict of frames — the set-oriented spelling of the one ES response
    object (each section is a differently-shaped frame, so a dict of
    frames IS the faithful relational encoding; `search_dsl` remains the
    single-frame entry point and keeps its one-shape-per-body rule).

    Keys: ``"hits"`` (the ranked (doc_id, score) page, highlight columns
    joined on when a `highlight` section is present), ``"total"`` (the
    track_total_hits capped-count single row, when requested),
    ``"aggs:<name-or-level-path>"`` per aggs_dsl entry, and
    ``"suggest:<name>"`` per named suggester.

    Plan: the query side runs ONCE — the uncut match frame (doc_id,
    score — 16 bytes/row, match-set not corpus cardinality) feeds the hit
    page, the total probe, AND every aggregation's semi join, exactly the
    post_filter one-scan pattern generalized. ``persist_matches`` (default
    True) pins that id+score frame MEMORY_AND_DISK so the N consuming
    jobs reuse one scored scan instead of re-ranking per section; at
    10^9-match scale that is ~16 GB cluster-wide — the same working set
    ES's aggregation phase holds. Callers streaming sections lazily can
    pass False and unpersist nothing. The caller owns the returned
    frames' lifetime: call ``response["hits"].sparkSession`` -> nothing
    to release; the pinned frame unpersists with the session (or
    collect every section eagerly and the pin is short-lived).

    Sections NOT composable here (rescore/collapse/post_filter/field
    fetching) keep the explicit single-section or pipeline spelling —
    each REPLACES the hit frame's shape, so stacking them is an explicit
    pipeline by design."""
    from pyspark.sql import functions as F

    analyzed = analyzed_fields or {text_col}
    section_keys = {"aggs", "aggregations", "suggest", "highlight",
                    "track_total_hits"}
    query_keys = {"query", "knn", "size", "min_score"}
    extra = set(body) - section_keys - query_keys
    if extra:
        _err(
            f"search_response composes query/knn/size/min_score with "
            f"{sorted(section_keys)}; {sorted(extra)} keep the "
            "single-section search_dsl / pipeline spelling"
        )
    out: dict[str, DataFrame] = {}
    if "suggest" in body:
        for sname, frame in suggest_dsl(idx, body["suggest"]).items():
            out[f"suggest:{sname}"] = frame
    if "query" not in body and "knn" not in body:
        if not out:
            raise ValueError("search_response body needs query/knn/suggest")
        return out

    qbody = {kk: v for kk, v in body.items() if kk in ("query", "knn",
                                                       "min_score")}
    qbody["size"] = None
    matched = search_dsl(
        idx, qbody, corpus, text_col=text_col, analyzed_fields=analyzed,
        id_col=id_col, field_indexes=field_indexes,
        nested_paths=nested_paths,
    ).select("doc_id", "score")
    if persist_matches:
        from pyspark import StorageLevel

        matched = matched.persist(StorageLevel.MEMORY_AND_DISK)

    k = body.get("size", 10)
    hits = matched.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    if k is not None:
        hits = hits.limit(k)
    if "highlight" in body:
        if "query" not in body:
            _err("highlight needs a query section")
        hits = _highlight_hits(
            hits, body["highlight"], body["query"], corpus,
            text_col=text_col, analyzed=analyzed, id_col=id_col,
        )
    out["hits"] = hits

    tth = body.get("track_total_hits")
    if tth is not None and tth is not False:
        if tth is True:
            total = matched.agg(
                F.count("*").cast("long").alias("total_hits"),
            ).select("total_hits", F.lit("eq").alias("relation"))
        else:
            cap = int(tth)
            if cap <= 0:
                raise ValueError("track_total_hits must be positive")
            n = matched.limit(cap + 1).count()
            t, rel = (cap, "gte") if n > cap else (n, "eq")
            total = matched.sparkSession.createDataFrame(
                [(int(t), rel)], "total_hits long, relation string"
            )
        out["total"] = total

    aggs = body.get("aggs", body.get("aggregations"))
    if aggs:
        if corpus is None:
            raise ValueError("aggs need corpus")
        for aname, frame in aggs_dsl(
            aggs, matched.select(F.col("doc_id").alias(id_col)), corpus,
            id_col=id_col, text_col=text_col, analyzed_fields=analyzed,
        ).items():
            out[f"aggs:{aname}"] = frame
    return out
