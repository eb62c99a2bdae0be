"""simple_query_string: the lenient, never-throws ES query language.

Supported subset (the operators ES enables by default, minus field
prefixes — this engine is single-field):

    word word          clauses combined with default_operator (and/or)
    +word              explicit AND prefix (same as default and)
    -word              negation (bool must_not)
    a|b|c              alternation — ONE clause matching any alternative
    wor*               trailing * = prefix expansion (per alternative)
    "a b c"            phrase — supported as the WHOLE query (delegates
                       to the positional phrase plan); mixing a phrase
                       with other clauses raises with guidance

Each alternative analyzes to exactly one token under the engine's
tokenizer contract (multi-token words raise — ES would silently
re-shape the query; this engine prefers loud contracts). Unlike
query_string, the grammar has no parens/ranges/fields, which is the
point of SQS: every input is a valid query.

Compilation: clauses become clause-level boolean groups (a doc must
match ≥ 1 alternative of EVERY clause under default_operator=and —
wand.topk_group_conjunctive), negations ride the kernels' excluded set
(index-assisted must_not), prefixes expand against the distributed term
dictionary. default_operator=or flattens to a scored union.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from elasticsearch_assets_spark.analysis.tokenizer import tokenize


@dataclass
class SQSQuery:
    groups: list = field(default_factory=list)  # [[(token, is_prefix)]]
    nots: list = field(default_factory=list)    # [(token, is_prefix)]
    phrase: list | None = None


def _one_token(word: str) -> str:
    toks = tokenize(word)
    if len(toks) != 1:
        raise ValueError(
            f"simple_query_string alternative {word!r} analyzes to "
            f"{len(toks)} tokens; each alternative must be one token"
        )
    return toks[0]


def parse_sqs(q: str) -> SQSQuery:
    q = q.strip()
    out = SQSQuery()
    if q.startswith('"') and q.endswith('"') and len(q) >= 2:
        out.phrase = tokenize(q[1:-1])
        return out
    if '"' in q:
        raise ValueError(
            "simple_query_string phrases are supported as the whole "
            'query ("...") — compose a phrase with other clauses via '
            "search_phrase + search_filtered"
        )
    for raw in q.split():
        neg = raw.startswith("-")
        if raw.startswith(("-", "+")):
            raw = raw[1:]
        if not raw:
            continue
        alts = []
        for alt in raw.split("|"):
            if not alt:
                continue
            is_prefix = alt.endswith("*")
            word = alt[:-1] if is_prefix else alt
            if not word:
                continue
            alts.append((_one_token(word), is_prefix))
        if not alts:
            continue
        if neg:
            out.nots.extend(alts)
        else:
            out.groups.append(alts)
    return out
