"""Frequent item-set mining — ES frequent_item_sets aggregation
(pairs at size 2; multi-level at any size), re-expressed as
deterministic Apriori (ES samples and approximates; a distributed engine
wants an exact, reproducible answer with the same pruning guarantee).
frequent_pairs keeps the zero-extra-shuffle nested-transform shape
(right for the single-level case); frequent_itemsets uses prefix-pruned
incremental joins (see its docstring).

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


def frequent_itemsets(
    corpus: DataFrame,
    id_col: str,
    items: Column | str,
    min_support_ratio: float,
    max_size: int = 3,
) -> DataFrame:
    """ES frequent_item_sets aggregation, multi-level: all item sets of
    size 2..max_size present in at least ceil(min_support_ratio * n_docs)
    documents (ES's `minimum_support` is this same fraction, default 0.1;
    its `size` is `max_size`). Exact Apriori where ES samples.

    Plan (incremental join, exact Apriori): per-doc item rows are pruned
    to frequent items once (level 1), then level k+1 combos extend level
    k's combos by one same-doc item with a larger sort key — and ONLY
    combos whose own k-set is frequent extend (the sorted prefix is a
    k-subset, so this prune is exact by the Apriori property, and it is
    what bounds the combo stream: infrequent branches die immediately).
    Every join is keyed by doc id (co-partitioned, exchange reused);
    support counting is one partial-aggregated hash agg per level. This
    replaced a nested-array-lambda expansion measured 3x slower (per-
    element slice allocation is quadratic per doc; joins stream).

    Driver actions: the doc count and a per-level emptiness probe —
    planning-level (the level frames are persisted, nothing computes
    twice).

    Returns (itemset '|'-joined, size, support), ordered by size, then
    support DESC, then itemset."""
    import math

    if max_size < 2:
        raise ValueError("max_size must be >= 2")
    if not (0.0 < min_support_ratio <= 1.0):
        raise ValueError("min_support_ratio must be in (0, 1]")
    n_docs = corpus.count()
    ms = max(1, math.ceil(min_support_ratio * n_docs))
    items = F.expr(items) if isinstance(items, str) else items
    base = corpus.select(
        F.col(id_col).alias("_id"), F.array_distinct(items).alias("items")
    )
    ex = base.select("_id", F.explode("items").alias("item"))
    freq1 = (
        ex.groupBy("item")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= ms)
    )
    kept = ex.join(freq1.select("item"), "item", "left_semi").persist()
    pinned: list[DataFrame] = [kept]
    levels: list[DataFrame] = []
    cur = kept.select("_id", F.col("item").alias("i1"))
    for k in range(2, max_size + 1):
        cols = [f"i{j}" for j in range(1, k + 1)]
        nxt = cur.join(
            kept.select("_id", F.col("item").alias(f"i{k}")), "_id"
        ).where(F.col(f"i{k - 1}") < F.col(f"i{k}"))
        sets_k = (
            nxt.groupBy(*cols)
            .agg(F.count("*").alias("support"))
            .where(F.col("support") >= ms)
            .persist()
        )
        pinned.append(sets_k)
        out_k = sets_k.select(
            F.concat_ws("|", *cols).alias("itemset"),
            F.lit(k).alias("size"),
            "support",
        )
        if sets_k.count() == 0:  # Apriori: no frequent k-sets => no k+1
            break
        levels.append(out_k)
        if k < max_size:
            # extend only combos whose own k-set is frequent (exact:
            # the sorted prefix is a k-subset of any extension)
            cur = nxt.join(
                sets_k.select(*cols), cols, "left_semi"
            ).persist()
            pinned.append(cur)
    if not levels:
        for d in pinned:
            d.unpersist()
        return ex.sparkSession.createDataFrame(
            [], "itemset string, size int, support long"
        )
    out = levels[0]
    for d in levels[1:]:
        out = out.unionByName(d)
    out = out.orderBy(
        F.col("size").asc(), F.col("support").desc(), F.col("itemset").asc()
    ).localCheckpoint()
    for d in pinned:
        d.unpersist()
    return out
