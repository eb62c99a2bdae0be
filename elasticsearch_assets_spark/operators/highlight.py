"""Result highlighting: fixed-window snippets around the first query-term
occurrence (the ES `highlight` API's fragment shape, simplified to a
deterministic, SQL-oracle-exact contract).

Semantics: for each matched doc, find the first case-insensitive substring
occurrence of ANY query term in the text; the snippet is the `width`-char
window starting `before` chars earlier (clamped to the string start). Docs
where no term occurs as a substring get a null snippet (can happen only
when `matches` came from something other than a term query over the same
text). Substring semantics, not token semantics — a term may highlight
inside a longer word; ES's analyzer-aware highlighter is a superset, but
this form is exact across engines and costs one JVM projection, zero
shuffle beyond the top-k join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_ABSENT = 1 << 30  # sentinel "not found" position


def _first_pos(text_lower: Column, terms: list[str]) -> Column:
    """1-based position of the earliest occurrence of any term; _ABSENT if
    none occur."""
    locs = [
        F.when(F.locate(t.lower(), text_lower) > 0, F.locate(t.lower(), text_lower))
        .otherwise(F.lit(_ABSENT))
        for t in terms
    ]
    out = locs[0]
    for c in locs[1:]:
        out = F.least(out, c)
    return out


def highlight_first(
    matches: DataFrame,
    corpus: DataFrame,
    terms: list[str],
    before: int = 30,
    width: int = 80,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, snippet) for every row of `matches` (typically a top-k
    result) — the matched docs are broadcast-joined to the corpus scan
    (same plan as engine.materialize), then the snippet is one column
    expression."""
    joined = corpus.select(F.col(id_col), F.col(text_col)).join(
        F.broadcast(matches.select(F.col(id_col)).distinct()), id_col
    )
    pos = _first_pos(F.lower(F.col(text_col)), sorted(set(terms)))
    start = F.greatest(F.lit(1), pos - F.lit(before))
    return joined.select(
        F.col(id_col),
        F.when(pos < _ABSENT, pos).cast("long").alias("pos"),
        F.when(
            pos < _ABSENT, F.substring(F.col(text_col), start, width)
        ).alias("snippet"),
    )


def highlight_sql(
    terms: list[str],
    before: int = 30,
    width: int = 80,
    *,
    match_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin: strpos over lower(text), same clamping and window."""
    tsorted = sorted(set(terms))
    locs = ", ".join(
        f"CASE WHEN strpos(lower({text_col}), '{t.lower()}') > 0 "
        f"THEN strpos(lower({text_col}), '{t.lower()}') ELSE {_ABSENT} END"
        for t in tsorted
    )
    return f"""
SELECT d.{id_col},
       (CASE WHEN p < {_ABSENT} THEN p END)::BIGINT AS pos,
       CASE WHEN p < {_ABSENT}
            THEN substring({text_col}, greatest(1, p - {before}), {width})
       END AS snippet
FROM (SELECT {id_col}, {text_col}, least({locs}) AS p
      FROM {table}) d
JOIN ({match_sql}) m USING ({id_col})
"""


def highlight_fragments(
    matches: DataFrame,
    corpus: DataFrame,
    terms: list[str],
    n_fragments: int = 3,
    before: int = 10,
    width: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `highlight` with number_of_fragments > 1: one fragment per
    MATCHED TERM (its first occurrence), ordered by position, capped at
    `n_fragments` — the deterministic multi-fragment contract (ES's
    passage scorer picks top-scored passages; first-occurrence-per-term
    is the exact cross-engine form). Returns (id, frag, pos, snippet)
    with frag the 1-based fragment index; docs where no term occurs
    produce no rows.

    Plan: same broadcast top-k join as highlight_first, then the
    fragment set is an array expression (one locate per query term —
    bounded by query size, never text length), sorted/sliced/exploded
    JVM-side. Zero extra shuffle."""
    if n_fragments < 1:
        raise ValueError("n_fragments must be >= 1")
    joined = corpus.select(F.col(id_col), F.col(text_col)).join(
        F.broadcast(matches.select(F.col(id_col)).distinct()), id_col
    )
    tsorted = sorted(set(terms))
    locs = F.array(
        *[F.locate(t.lower(), F.lower(F.col(text_col))) for t in tsorted]
    )
    frags = F.slice(
        F.sort_array(F.filter(locs, lambda p: p > 0)), 1, n_fragments
    )
    exploded = joined.select(
        F.col(id_col), F.col(text_col), F.posexplode(frags)
    ).withColumnRenamed("pos", "fidx").withColumnRenamed("col", "p")
    start = F.greatest(F.lit(1), F.col("p") - F.lit(before))
    return exploded.select(
        F.col(id_col),
        (F.col("fidx") + 1).cast("int").alias("frag"),
        F.col("p").cast("long").alias("pos"),
        F.substring(F.col(text_col), start, width).alias("snippet"),
    )


def highlight_fragments_sql(
    terms: list[str],
    n_fragments: int = 3,
    before: int = 10,
    width: int = 40,
    *,
    match_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin: list of per-term strpos, filtered/sorted/sliced,
    unnested WITH ORDINALITY via generate_subscripts-free unnest."""
    tsorted = sorted(set(terms))
    locs = ", ".join(
        f"strpos(lower({text_col}), '{t.lower()}')" for t in tsorted
    )
    return f"""
WITH j AS (
  SELECT d.{id_col}, d.{text_col},
         list_sort(list_filter([{locs}], p -> p > 0))[1:{n_fragments}] AS ps
  FROM {table} d JOIN ({match_sql}) m USING ({id_col})
),
e AS (
  SELECT {id_col}, {text_col},
         unnest(ps) AS p,
         unnest(range(1, len(ps) + 1)) AS frag
  FROM j
)
SELECT {id_col}, frag::INT AS frag, p::BIGINT AS pos,
       substring({text_col}, greatest(1, p - {before}), {width}) AS snippet
FROM e
"""
