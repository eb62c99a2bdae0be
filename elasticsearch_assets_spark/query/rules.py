"""ES query rules (the `_query_rules` ruleset API + rule retriever,
ES 8.10+): curated pin/exclude actions triggered by criteria over the
query's metadata — the "searchandizing" layer merchandisers drive without
touching relevance.

A ruleset is a list of dicts in ruleset order:

    {"rule_id": "promo1",
     "type": "pinned" | "exclude",
     "criteria": [{"type": "exact" | "contains" | "prefix" | "suffix"
                          | "always",
                   "metadata": "user_query", "values": ["winter sale"]}],
     "ids": [14, 2]}

A rule fires iff ALL its criteria match (each criterion matches when the
named metadata value matches ANY of its values under the criterion type —
the ES contract); pinned ids accumulate in ruleset order (first rule's
pins outrank the second's, duplicates keep their first position), exclude
ids drop from the organic results entirely. Matching is pure driver-side
planning over O(rules) — the search itself stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CRIT_TYPES = ("exact", "contains", "prefix", "suffix", "always")
_RULE_TYPES = ("pinned", "exclude")


def _criterion_matches(crit: dict, metadata: dict) -> bool:
    ctype = crit.get("type")
    if ctype not in _CRIT_TYPES:
        raise ValueError(f"unknown criteria type {ctype!r}")
    if ctype == "always":
        return True
    key = crit.get("metadata")
    if not key:
        raise ValueError("criteria needs a metadata key")
    val = metadata.get(key)
    if val is None:
        return False
    values = crit.get("values") or []
    if not values:
        raise ValueError(f"criteria on {key!r} needs values")
    for v in values:
        if ctype == "exact" and val == v:
            return True
        if ctype == "contains" and v in val:
            return True
        if ctype == "prefix" and val.startswith(v):
            return True
        if ctype == "suffix" and val.endswith(v):
            return True
    return False


def match_rules(
    ruleset: list[dict], metadata: dict
) -> tuple[list[int], set[int]]:
    """(ordered pinned ids, excluded id set) for the given metadata."""
    pinned: list[int] = []
    seen: set[int] = set()
    excluded: set[int] = set()
    for rule in ruleset:
        rtype = rule.get("type")
        if rtype not in _RULE_TYPES:
            raise ValueError(f"unknown rule type {rtype!r}")
        crits = rule.get("criteria") or []
        if not crits:
            raise ValueError("a rule needs at least one criterion")
        if not all(_criterion_matches(c, metadata) for c in crits):
            continue
        ids = [int(i) for i in rule.get("ids") or []]
        if rtype == "pinned":
            for i in ids:
                if i not in seen:
                    seen.add(i)
                    pinned.append(i)
        else:
            excluded.update(ids)
    # an id both pinned and excluded: the pin wins (first-applied rule
    # semantics would be ambiguous; ES resolves pin-over-exclude)
    excluded -= set(pinned)
    return pinned, excluded


def search_with_rules(
    index,
    query: "str | list[str]",
    ruleset: list[dict],
    k: int | None = 10,
    mode: str = "or",
    corpus: "DataFrame | None" = None,
    metadata: "dict | None" = None,
) -> DataFrame:
    """ES rule retriever: apply the matched rules' pins and exclusions
    around the organic query. Returns (doc_id, rank) like pinned().

    Plan: rule matching is O(rules) planning work; pins ride the pinned()
    machinery (tiny literal frame + anti-join on a broadcast list); the
    exclusions broadcast anti-join the organic results BEFORE the rank
    window, with the organic k widened by |excluded| so a full page
    survives the drop."""
    if metadata is None:
        q_text = query if isinstance(query, str) else " ".join(query)
        metadata = {"user_query": q_text}
    pinned, excluded = match_rules(ruleset, metadata)
    if not excluded:
        return index.pinned(pinned, query, k=k, mode=mode, corpus=corpus)
    from pyspark.sql import Window, functions as F

    spark = index.spark
    n_org = None if k is None else k + len(pinned) + len(excluded)
    org = index.search(query, k=n_org, mode=mode)
    drop = spark.createDataFrame(
        [(int(i),) for i in sorted(excluded | set(pinned))], "doc_id long"
    )
    org = org.join(F.broadcast(drop), "doc_id", "left_anti")
    pin_df = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(pinned)] or [],
        "doc_id long, rank long",
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    org_ranked = org.select(
        "doc_id", (F.row_number().over(w) + F.lit(len(pinned))).alias("rank")
    )
    out = pin_df.unionByName(org_ranked).orderBy(F.col("rank").asc())
    return out.limit(k) if k is not None else out
