"""Index-assisted execution of Lucene query strings (round 3).

The reference ANDs a user Lucene `q=` string onto every read and delegates
both relevance and filtering to Elasticsearch
(/root/reference/asset/elasticsearch_reader/index.js:118-122,
simple_api_reader/index.js:67-84). Round 2 gave the string FILTER semantics
(query/lucene.py compile_filter — a corpus scan). This module gives it the
ES behavior: analyzed clauses SCORE through the inverted index (BM25, with
multi-term clauses dictionary-rewritten), structured clauses FILTER, and
the two compose through search_filtered's distributed restriction.

Supported shapes (the reference's tested surface and its natural
extensions):

  spark AND join AND n_chars:>=500      terms + structured filter
  jo* OR quer?                          multi-term rewrites, clause-level OR
  spark~1 AND lang:en                   fuzzy rewrite + keyword filter
  text:"hash table" AND date:[a TO b]   phrase (positional index) + range

Clause-level boolean semantics are exact: `spark AND jo*` requires spark
AND (any jo*-expansion term) per doc — the engine's `groups` kernel
(wand.topk_group_conjunctive), not a flat term-list AND.

Phrases compose with other scoring clauses under AND
(`"hash table" AND spark AND jo*` — search_phrase(groups=...), one phrase
per query). Not supported (raise, by design): scoring an OR of a text
clause with a structured filter (`spark OR n_chars:>=500` — ES gives
constant scores to filter legs; this engine has no constant-score leg),
OR of a phrase with other scoring clauses, more than one phrase, and NOT
over text clauses in the scoring position (NOT filters, it never scores —
put it in the structured part).
"""

from __future__ import annotations

from dataclasses import dataclass

from elasticsearch_assets_spark.analysis.tokenizer import tokenize
from elasticsearch_assets_spark.query.lucene import (
    And,
    Cmp,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    Term,
    Wildcard,
    parse_lucene,
)


@dataclass
class QueryPlan:
    """What the engine executes: scoring groups (one per text clause, each
    a dictionary-expanded term list), an optional phrase, the structured
    residue (AST nodes for compile_filter), and the boolean mode."""

    groups: list[list[str]]
    phrase: list[str] | None
    filters: list
    mode: str  # "and" | "or"
    # caret boosts (`term^2`, `jo*^1.5`, `"a b"^3`): term -> multiplicative
    # idf weight, exactly search(boosts=)'s contract. A multi-term rewrite's
    # boost applies to every expansion term; a term named by two boosted
    # clauses takes the max (documented — the engine scores each distinct
    # term once, unlike Lucene's per-clause scorers).
    boosts: dict[str, float] | None = None


def _is_text(node, analyzed: set[str]) -> bool:
    return isinstance(node, (Term, Prefix, Wildcard, Fuzzy, Phrase)) and (
        node.field is None or node.field in analyzed
    )


def plan_querystring(q: str, index, analyzed_fields: set[str]) -> QueryPlan:
    """Parse + route: text clauses expand against `index`'s term
    dictionary (vocabulary-level Spark filters, see query/expand.py);
    everything else stays AST for compile_filter."""
    node = parse_lucene(q)
    if isinstance(node, And):
        clauses, mode = list(node.children), "and"
    elif isinstance(node, Or):
        clauses, mode = list(node.children), "or"
    else:
        clauses, mode = [node], "and"

    groups: list[list[str]] = []
    phrase: list[str] | None = None
    filters: list = []
    boosts: dict[str, float] = {}

    def _note_boosts(terms: list[str], w: float) -> None:
        if w == 1.0:
            return
        for t in terms:
            # first boosted clause sets the term's weight; a SECOND boosted
            # clause naming the same term takes the max (documented —
            # boosts below 1.0 must register, so no default-1.0 floor here)
            boosts[t] = max(boosts[t], w) if t in boosts else w

    for c in clauses:
        if _is_text(c, analyzed_fields):
            if isinstance(c, Term):
                g = [c.value.lower()]
            elif isinstance(c, Prefix):
                g = index.expand_prefix(c.value.lower())
            elif isinstance(c, Wildcard):
                g = index.expand_wildcard(c.value.lower())
            elif isinstance(c, Fuzzy):
                g = index.expand_fuzzy(c.value.lower(), max_edits=c.max_edits)
            else:  # Phrase
                if phrase is not None:
                    raise NotImplementedError(
                        "one phrase per query string (phrase scoring does "
                        "not compose with other phrases here)"
                    )
                phrase = tokenize(c.value)
                _note_boosts(phrase, c.boost)
                continue
            groups.append(g)
            _note_boosts(g, c.boost)
        else:
            if mode == "or":
                raise NotImplementedError(
                    "OR of a text clause with a structured filter has no "
                    "score for the filter leg — restructure as "
                    "'(text...) AND filter' or use compile_filter"
                )
            filters.append(c)
    if phrase is not None and groups and mode == "or":
        raise NotImplementedError(
            "OR of a phrase with other scoring clauses is not supported — "
            "AND composition ('\"phrase\" AND term ...') is"
        )
    # silently-empty expansions: an AND clause that matches no dictionary
    # term can never match a doc; an OR clause just drops out
    if mode == "or":
        groups = [g for g in groups if g]
    return QueryPlan(
        groups=groups, phrase=phrase, filters=filters, mode=mode,
        boosts=boosts or None,
    )


def and_node(filters: list):
    return filters[0] if len(filters) == 1 else And(tuple(filters))


__all__ = [
    "QueryPlan",
    "plan_querystring",
    "and_node",
    # re-exports used by callers composing plans
    "And", "Or", "Not", "Term", "Phrase", "Prefix", "Wildcard", "Fuzzy",
    "Cmp", "Range",
]
