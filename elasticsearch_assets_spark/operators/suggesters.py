"""Context-aware completion suggestions (ES completion field `contexts`).

Reference behavior: ES completion fields may declare category contexts;
query-time `contexts` restrict the FST traversal to entries tagged with
the requested categories and multiply each suggestion's weight by the
matching context's `boost` (ES context suggester docs). The reference
repo's users rely on ES suggesters for type-ahead over indexed corpora.

Spark-first shape: the (context, term, df) relation IS the context-tagged
FST here — derived from the corpus in one pass (tokenize → per-doc
distinct → hash agg on (context, term)), or materialized once at index
time in production. The prefix restriction lands BEFORE the aggregation,
so the shuffle carries only prefix-matching terms; popularity (df) plays
ES's suggestion weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from elasticsearch_assets_spark.operators.texthash import tokens_expr


def completion_contexts(
    corpus: DataFrame,
    prefix: str,
    contexts: "list[str]",
    boosts: "dict[str, float] | None" = None,
    *,
    text_col: str = "text",
    ctx_col: str = "lang",
    id_col: str = "doc_id",
    size: int | None = 5,
) -> DataFrame:
    """Completions of `prefix` restricted to documents whose `ctx_col`
    is in `contexts`, scored df x boost(context) (ES: weight x boost),
    ordered (score DESC, suggestion ASC, context ASC).

    Returns (suggestion, context, df, score). A term suggests once PER
    matching context (the ES contract: a context-tagged entry exists per
    category value); df counts distinct documents within that context.

    Plan: scan -> context filter (pushed to the scan) -> tokenize +
    per-doc distinct (JVM expressions) -> explode -> prefix filter ->
    one hash agg on (context, term) -> TakeOrderedAndProject. The only
    shuffle is the final agg, keyed by prefix-matching vocabulary —
    tiny at any corpus scale."""
    if not prefix:
        raise ValueError("completion needs a non-empty prefix")
    if not contexts:
        raise ValueError("pass at least one context value")
    boosts = boosts or {}
    unknown = set(boosts) - set(contexts)
    if unknown:
        raise ValueError(f"boosts for unrequested contexts: {sorted(unknown)}")
    boost_col = F.lit(1.0)
    for c, w in sorted(boosts.items()):
        boost_col = F.when(F.col("context") == c, float(w)).otherwise(boost_col)
    out = (
        corpus.where(F.col(ctx_col).isin(list(contexts)))
        .select(
            F.col(id_col),
            F.col(ctx_col).alias("context"),
            F.explode(F.array_distinct(tokens_expr(F.col(text_col)))).alias(
                "suggestion"
            ),
        )
        .where(F.col("suggestion").startswith(prefix))
        .groupBy("context", "suggestion")
        .agg(F.count("*").alias("df"))
        .withColumn("score", F.col("df").cast("double") * boost_col)
        .select("suggestion", "context", "df", "score")
        .orderBy(
            F.col("score").desc(),
            F.col("suggestion").asc(),
            F.col("context").asc(),
        )
    )
    return out.limit(size) if size is not None else out
