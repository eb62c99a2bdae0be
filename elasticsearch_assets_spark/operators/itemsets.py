"""Frequent item-set mining — ES frequent_item_sets aggregation at size 2,
re-expressed as deterministic Apriori (ES samples and approximates; a
distributed engine wants an exact, reproducible answer with the same
pruning guarantee).

Scale shape: the level-1 pass is one hash agg on the exploded items; the
level-1 PRUNE (items below min_support can never appear in a frequent
pair — the Apriori property) bounds the per-doc arrays BEFORE pair
expansion, so the quadratic step runs over frequent items only; pair
expansion itself is a pure JVM nested transform over the sorted per-doc
array (i<j — each unordered pair materializes exactly once), and support
counting is ONE hash agg on the pair key. No driver materialization at
any step; the same df-guard idea as dedup.py's head-shingle guard.

Reference surface: ES frequent_item_sets agg (semantics from the ES docs;
the reference's facade passes agg bodies through verbatim,
/root/reference/asset/elasticsearch_reader/index.js).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def frequent_pairs(
    corpus: DataFrame,
    id_col: str,
    items: Column | str,
    min_support: int,
) -> DataFrame:
    """Frequent co-occurring item pairs: unordered (item1 < item2) pairs
    present in at least `min_support` documents. `items` is a column (or
    expression) yielding the document's item array; duplicates within a
    document count once (ES's per-document set semantics).

    Returns (item1, item2, support), support DESC then item1/item2 ASC."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    items = F.expr(items) if isinstance(items, str) else items
    base = corpus.select(
        F.col(id_col).alias("_id"), F.array_distinct(items).alias("items")
    )
    ex = base.select("_id", F.explode("items").alias("item"))
    freq = (
        ex.groupBy("item")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )
    kept = ex.join(freq.select("item"), "item", "left_semi")
    docs = kept.groupBy("_id").agg(
        F.array_sort(F.collect_set("item")).alias("items")
    )
    pairs = docs.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) -> "
                "transform(slice(items, i + 2, size(items)), "
                "y -> struct(x AS item1, y AS item2))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.item1", "p.item2")
        .groupBy("item1", "item2")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
        .orderBy(
            F.col("support").desc(),
            F.col("item1").asc(),
            F.col("item2").asc(),
        )
    )
