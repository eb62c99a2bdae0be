"""Search-result aggregations (ES aggs re-expressed as DataFrame plans).

The reference delegates aggregations to Elasticsearch's agg framework; here
each agg is a declarative Spark plan over (query match set × corpus), so
Catalyst gets the whole picture: the semi join broadcasts when the match
set is small (AQE decides), the counts are partial-aggregated map-side, and
nothing ever funnels through the driver.

  facet_counts     ES `terms` agg      — doc_count per bucket value
  facet_histogram  ES `histogram` agg  — doc_count per fixed-width bucket
  facet_top_hits   ES `top_hits` agg   — best-scored docs per bucket

Determinism contract (shared with the DuckDB oracles): counts order by
(doc_count DESC, bucket ASC); histograms by bucket ASC; top_hits by
(bucket ASC, score DESC, doc_id ASC) with ties broken before the cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def facet_counts(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    n: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES terms aggregation: bucket doc counts over the match set.

    `matches` is any DataFrame with an id column (e.g. `search(k=None)`);
    the semi join keeps corpus rows in the match set, then a partial-agg
    count per bucket — one shuffle of (bucket, partial_count) pairs."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    out = (
        joined.groupBy(F.col(col).alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("bucket").asc())
    )
    return out.limit(n) if n is not None else out


def facet_histogram(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    interval: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES histogram aggregation: doc counts per fixed-width numeric bucket
    (bucket key = floor(value / interval) * interval, the ES formula).
    Empty buckets are absent (ES min_doc_count=1 shape)."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    bucket = (F.floor(F.col(col) / F.lit(interval)) * F.lit(interval)).cast(
        "double"
    )
    return (
        joined.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("bucket").asc())
    )


def significant_terms(
    matches: DataFrame,
    corpus: DataFrame,
    n: int | None = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_count: int = 3,
) -> DataFrame:
    """ES significant_terms aggregation: terms over-represented in the
    match set vs the background corpus.

    Foreground df comes from tokenizing the matched docs (semi join +
    explode — one shuffle of the matched docs' distinct terms); background
    df from the full corpus the same way. Score is the foreground/
    background rate ratio (ES's `percentage` significance heuristic):
        score = (fg_df / fg_total) / (bg_df / bg_total)
    ordered (score DESC, term ASC), `min_doc_count` pruning the noise
    floor like ES. Deterministic, exact SQL oracle."""
    from elasticsearch_assets_spark.operators.texthash import tokens_expr

    ids = matches.select(F.col(id_col)).distinct()
    fg_docs = corpus.join(ids, id_col, "left_semi")
    fg_total = fg_docs.count()
    bg_total = corpus.count()
    if fg_total == 0:
        return fg_docs.select(
            F.lit("").alias("term"),
            F.lit(0).cast("long").alias("fg_df"),
            F.lit(0).cast("long").alias("bg_df"),
            F.lit(0.0).alias("score"),
        ).limit(0)

    def doc_terms(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens_expr(text_col))).alias("term"),
        )

    fg = doc_terms(fg_docs).groupBy("term").agg(F.count("*").alias("fg_df"))
    bg = doc_terms(corpus).groupBy("term").agg(F.count("*").alias("bg_df"))
    out = (
        fg.where(F.col("fg_df") >= min_doc_count)
        .join(bg, "term")
        .select(
            "term",
            "fg_df",
            "bg_df",
            (
                (F.col("fg_df") / F.lit(float(fg_total)))
                / (F.col("bg_df") / F.lit(float(bg_total)))
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("term").asc())
    )
    return out.limit(n) if n is not None else out


def facet_top_hits(
    scored: DataFrame,
    corpus: DataFrame,
    col: str,
    per_bucket: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES top_hits aggregation: the best `per_bucket` docs per bucket value
    by (score DESC, doc_id ASC) — the grouped-top-k window plan (rank over
    a bucket-partitioned window; Spark pushes the rank filter into the
    window sort as a group-limit, no full materialization per bucket)."""
    joined = corpus.select(F.col(id_col), F.col(col).alias("bucket")).join(
        scored.select(F.col(id_col), "score"), id_col
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_bucket)
        .select("bucket", F.col(id_col), "score", "rank")
        .orderBy(F.col("bucket").asc(), F.col("rank").asc())
    )
