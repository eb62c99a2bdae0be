"""Document-relation queries: has_child / has_parent (ES join field) and
the nested query's same-object co-occurrence semantics.

Elasticsearch models parent/child with a `join` field inside one index and
nested objects as hidden sub-documents; the relational re-expression is a
pair of tables (parent key on both sides) and an array column. The plans
are the classic shapes Catalyst already optimizes:

  has_child   parent <- semi/count-join of matching children (ONE hash agg
              on the parent key, partial map-side; min_children is a HAVING)
  has_parent  child <- semi join of matching parents (broadcast when the
              matching-parent side is small — AQE decides)
  nested      F.exists over the object array — terms must co-occur in the
              SAME nested object, which a flattened match would get wrong
              (the whole reason ES nested exists); pure JVM lambda, no
              shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_pred: Column,
    min_children: int = 1,
) -> DataFrame:
    """ES has_child query (+min_children): parents with at least
    `min_children` children matching the predicate. Returns
    (parent_key, n_matching), parent_key ASC. One filtered hash agg on
    the child side, then a semi-ish inner join to the parent keys."""
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    counts = (
        children.where(child_pred)
        .groupBy(F.col(child_key).alias(parent_key))
        .agg(F.count("*").alias("n_matching"))
        .where(F.col("n_matching") >= min_children)
    )
    return (
        parents.select(parent_key)
        .join(counts, parent_key)
        .orderBy(F.col(parent_key).asc())
    )


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    parent_pred: Column,
    child_cols: list[str] | None = None,
) -> DataFrame:
    """ES has_parent query: children whose parent matches the predicate.
    Left-semi join against the matching-parent keys (broadcast-able)."""
    matching = parents.where(parent_pred).select(
        F.col(parent_key).alias(child_key)
    )
    out = children.join(matching, child_key, "left_semi")
    if child_cols is not None:
        out = out.select(*child_cols)
    return out


def nested_chunks(text_col: str, n: int) -> Column:
    """Split a text into an array of disjoint n-token 'nested objects'
    (the corpus has no natural object arrays; fixed chunks stand in —
    the co-occurrence semantics are what's under test)."""
    from elasticsearch_assets_spark.operators.texthash import tokens_expr

    toks = tokens_expr(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(n)),
        lambda i: F.slice(toks, i, n),
    )


def passage_corpus(
    df,
    *,
    n: int = 20,
    slot_base: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Derive a CHILD corpus of disjoint n-token passages, one row per
    passage, indexable as ordinary documents: child id = parent *
    slot_base + slot (recover the parent with an integer divide — the
    Lucene nested-document block encoding, made explicit). Feed the
    result to build_index and query it like any index; `nested_topk`
    rolls child scores back up to parents. `slot_base` must exceed the
    max passages per document (ceil(max_tokens / n)) — validated by the
    caller's data contract, not scanned here (one pass at 10^12 docs is
    not free). Empty documents yield one empty passage (indexes nothing).
    """
    from elasticsearch_assets_spark.operators.texthash import tokens_expr

    if n < 1 or slot_base < 2:
        raise ValueError("n >= 1 and slot_base >= 2 required")
    toks = tokens_expr(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks), F.lit(1)) - 1, F.lit(n)
    )
    passages = F.transform(
        starts,
        lambda s: F.struct(
            (s / n).cast("long").alias("slot"),
            F.concat_ws(" ", F.slice(toks, s + 1, n)).alias("text"),
        ),
    )
    return df.select(
        F.col(id_col).cast("long").alias("_parent"),
        F.explode(passages).alias("_p"),
    ).select(
        (F.col("_parent") * slot_base + F.col("_p.slot")).alias(id_col),
        F.col("_p.text").alias(text_col),
    )


def nested_co_match(text_col: str, terms: list[str], n: int = 10) -> Column:
    """ES nested-query semantics: TRUE iff some single n-token nested
    object contains EVERY term — a flattened (whole-document) AND match
    is wrong exactly when the terms appear only in different objects.
    Pure JVM exists/forall lambdas over the chunk array, zero shuffle."""
    if not terms:
        raise ValueError("nested_co_match needs at least one term")
    chunks = nested_chunks(text_col, n)
    return F.exists(chunks, lambda c: _all_in(c, terms))


def _all_in(chunk: Column, terms: list[str]) -> Column:
    cond = F.array_contains(chunk, terms[0])
    for t in terms[1:]:
        cond = cond & F.array_contains(chunk, t)
    return cond


def terms_lookup(
    corpus: DataFrame,
    field: str,
    lookup: DataFrame,
    lookup_pred: Column,
    path,
) -> DataFrame:
    """ES terms-lookup query: the terms list is fetched from ONE stored
    document at query time (GET lookup-index/_doc/id → `path`), then the
    query behaves like a literal terms filter over `corpus[field]`.

    The lookup fetch is planning-level and bounded — exactly one document
    (ES's contract; `lookup_pred` should select by unique id). The fetched
    values become a literal IN predicate pushed into the corpus scan: at
    10^12 docs nothing shuffles and the filter prunes at the parquet
    reader. `path` (a column name or Column expr) may evaluate to a scalar
    or an array — ES's path always yields an array; values de-duplicate.

    Reference surface: the reader facade passes terms-lookup bodies to ES
    verbatim (/root/reference/asset/elasticsearch_reader/index.js builds
    the request; semantics from the ES terms-lookup docs)."""
    col = F.expr(path) if isinstance(path, str) else path
    rows = lookup.where(lookup_pred).select(col.alias("v")).limit(1).collect()
    if not rows or rows[0]["v"] is None:
        return corpus.where(F.lit(False))
    v = rows[0]["v"]
    vals = sorted({x for x in v if x is not None}) if isinstance(v, (list, tuple)) else [v]
    if not vals:
        return corpus.where(F.lit(False))
    return corpus.where(F.col(field).isin(vals))


def parent_id(
    children: DataFrame, join_field: str, parent: "int | str"
) -> DataFrame:
    """ES parent_id query: the child documents of ONE parent (filter
    context). A single sargable equality on the join field — Catalyst
    pushes it into the child scan, and on a corpus bucketed/partitioned
    by the join field (the ES routing invariant: children live on the
    parent's shard) the read prunes to one partition."""
    return children.where(F.col(join_field) == F.lit(parent))
