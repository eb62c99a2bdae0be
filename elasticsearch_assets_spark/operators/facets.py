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
