"""Sequence packing for LM training-data pipelines.

GPT-style packing: the corpus is concatenated in a deterministic document
order and split into fixed context windows of W tokens; every document is
assigned the window its first token lands in plus its offset inside that
window. Downstream shard writers group by `bin` to emit ready-to-train
sequences.

Scale contract — the global running token offset is a DISTRIBUTED PREFIX
SUM, never a single-partition window: documents bucket by a fixed-width id
range, per-bucket subtotals (one tiny hash agg, O(buckets) rows) fold into
cumulative bucket offsets driver-side (planning-level, like every slicer
plan in this repo), broadcast back, and the within-bucket running sum is a
window keyed by bucket — so the only big shuffle is bucket-keyed and every
partition's window state is bounded by the bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from elasticsearch_assets_spark.operators.texthash import tokens_expr


def pack_documents(
    df: DataFrame,
    window: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 100_000,
) -> DataFrame:
    """Assign every document its packed position under context width
    `window`: returns (id, n_tokens, global_offset, bin, bin_offset) with
    global_offset = tokens before this doc in id order, bin =
    global_offset div window, bin_offset = global_offset % window.
    Deterministic (pure function of the corpus + id order), so retries
    and incremental re-packs agree."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    toks = df.select(
        F.col(id_col),
        (F.col(id_col) / bucket_width).cast("long").alias("__b"),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
    )
    # distributed prefix sum, stage 1: per-bucket subtotals (tiny)
    subtotals = (
        toks.groupBy("__b").agg(F.sum("n_tokens").alias("t")).orderBy("__b")
    )
    rows = subtotals.collect()  # planning-level: one row per id bucket
    offsets, acc = {}, 0
    for r in rows:
        offsets[r["__b"]] = acc
        acc += int(r["t"])
    spark = df.sparkSession
    off = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "__b long, __off long"
    )
    # stage 2: within-bucket running sum (exclusive), shuffled by bucket
    w = (
        Window.partitionBy("__b")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        toks.join(F.broadcast(off), "__b")
        .withColumn(
            "global_offset",
            F.col("__off") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
    )
    return packed.select(
        F.col(id_col),
        "n_tokens",
        "global_offset",
        F.expr(f"global_offset div {int(window)}").alias("bin"),
        (F.col("global_offset") % window).alias("bin_offset"),
    )


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-balanced shard assignment for corpus export (the writer-side
    dual of pack_documents): documents sorted by token count descending
    take shards round-robin in boustrophedon (snake) order — the
    parallel-friendly approximation of LPT scheduling (largest first,
    alternating direction evens out the tail), deterministic under
    retries. Returns (id, n_tokens, shard).

    Plan: one global rank window over (n_tokens DESC, id ASC) — at
    10^12 docs replace with the distributed range-rank (two-pass
    histogram) the packing op uses for offsets; the snake assignment
    itself is a pure expression over the rank."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    toks = df.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(F.col("n_tokens").desc(), F.col(id_col).asc())
    ranked = toks.withColumn("_r", (F.row_number().over(w) - 1).cast("long"))
    pos = F.col("_r") % n_shards
    rounds = F.expr(f"_r div {n_shards}")  # integer div: ranks exceed 2^53
    shard = F.when(rounds % 2 == 0, pos).otherwise(
        F.lit(n_shards - 1) - pos
    )
    return ranked.select(
        id_col, "n_tokens", shard.cast("int").alias("shard")
    )
