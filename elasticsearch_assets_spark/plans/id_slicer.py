"""Keyspace-prefix partition planner (Half A, SURVEY.md §3.2).

Re-expresses the reference's id slicer
(/root/reference/asset/id_reader/id_slicer.js:22-258): it walks the key
alphabet depth-first, counting ``type#prefix*`` wildcards and descending one
character deeper whenever a prefix holds more than `size` docs
(id_slicer.js:83-86), pruning empty prefixes (id_slicer.js:98-99), emitting
prefixes in alphabet order (test/id_slicer-spec.js:215-253).

Spark re-expression: one ``groupBy(substring(key,1,d)).count()`` histogram
per depth level — all oversized prefixes of a level deepen together in a
single aggregate job instead of one count query per prefix. Emitted plan is
identical: alphabet-ordered prefixes, each ≤ size (or at max_depth), empty
prefixes absent.

The same adaptive-prefix idea applied to terms is the engine's head-term
skew handler (SURVEY.md §3.2 note).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

# alphabets from /root/reference/asset/id_reader/id_slicer.js:9-19
ALPHABETS = {
    "base64url": (
        [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + [chr(c) for c in range(ord("A"), ord("Z") + 1)]
        + [str(d) for d in range(10)]
        + ["-", "_"]
    ),
    "base64": (
        [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + [chr(c) for c in range(ord("A"), ord("Z") + 1)]
        + [str(d) for d in range(10)]
        + ["+", "/"]
    ),
    "hexadecimal": [str(d) for d in range(10)] + list("abcdef"),
    "HEXADECIMAL": [str(d) for d in range(10)] + list("ABCDEF"),
}


@dataclass(frozen=True)
class KeySlice:
    prefix: str
    count: int


def key_predicate(key_col: str | Column, sl: KeySlice) -> Column:
    """P3: the reference's `_uid: type#prefix*` wildcard becomes startswith —
    parquet/iceberg min-max + dictionary pushdown applies."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return c.startswith(sl.prefix)


def plan_key_slices(
    df: DataFrame,
    key_col: str,
    size: int = 10000,
    *,
    key_type: str = "base64url",
    key_range: list[str] | None = None,
    starting_depth: int = 1,
    max_depth: int = 8,
    after_key: str | None = None,
) -> list[KeySlice]:
    """Plan alphabet-ordered key-prefix slices each holding ≤ `size` docs.

    `size` default mirrors /root/reference/asset/id_reader/index.js:36.
    `key_range` restricts the first character like the reference's key_range
    config; `after_key` resumes after the last completed prefix (R3,
    id_slicer.js:171-213).
    """
    alphabet = ALPHABETS[key_type]
    if key_range:
        bad = [k for k in key_range if k[0] not in alphabet]
        if bad:
            raise ValueError(f"key_range {bad} outside {key_type} alphabet")
    order = {ch: i for i, ch in enumerate(alphabet)}

    def alpha_key(prefix: str) -> tuple:
        return tuple(order.get(ch, len(order)) for ch in prefix)

    scoped = df
    if key_range:
        pred = None
        for kr in key_range:
            p = F.col(key_col).startswith(kr)
            pred = p if pred is None else (pred | p)
        scoped = df.where(pred)

    emitted: list[KeySlice] = []
    depth = starting_depth
    pending: list[str] | None = None  # None = first level, no restriction
    while depth <= max_depth:
        hist_df = scoped
        if pending is not None:
            parent = F.substring(F.col(key_col), 1, depth - 1)
            hist_df = scoped.where(parent.isin(pending))
        rows = (
            hist_df.groupBy(F.substring(F.col(key_col), 1, depth).alias("p"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
        oversized: list[str] = []
        for r in rows:
            p, c = r["p"], int(r["c"])
            if c > size and depth < max_depth:
                oversized.append(p)
            else:
                emitted.append(KeySlice(prefix=p, count=c))
        if not oversized:
            break
        pending = oversized
        depth += 1

    emitted.sort(key=lambda s: alpha_key(s.prefix))
    if after_key is not None:
        emitted = [s for s in emitted if alpha_key(s.prefix) > alpha_key(after_key)]
    return emitted
