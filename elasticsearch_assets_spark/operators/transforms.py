"""ES transform API + rollover planning, re-expressed as Spark plans.

* ``transform_latest``  — the ES "latest" transform (one doc per unique key,
  newest by the sort field). One window rank, no self-join.
* ``transform_pivot``   — the ES "pivot" transform (group_by + aggregations).
  One hash aggregate with map-side partials.
* ``plan_rollover``     — the ES ``_rollover`` / ILM hot-phase decision
  (max_docs / max_age conditions) evaluated over an ordered batch stream,
  assigning every batch its write index ``<alias>-NNNNNN``.

Reference behavior: ES transforms continuously materialize these two shapes
(latest / pivot) into a destination index; the reference repo's bulk sender
targets rollover-managed time-series indexes (see
/root/reference/asset/elasticsearch_bulk/index.js indexing routing and
SURVEY.md §2.6 C4 time-series naming). Rollover here is a *planner* in the
date-slicer tradition (plans/date_slicer.py): the condition fold is
inherently sequential state over O(days) rows, so it runs on the aggregated
batch table driver-side (planning-level, like every slicer), never per doc.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, Window, functions as F

_PIVOT_FUNCS = {
    "value_count": lambda c: F.count(c),
    "cardinality": lambda c: F.countDistinct(c),
    "avg": lambda c: F.avg(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def transform_latest(
    df: DataFrame,
    unique_key: list[str] | str,
    sort_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """ES latest transform: the newest document per unique_key.

    ES breaks sort ties by ingest order; a distributed engine has no such
    order, so `tiebreak` names a column whose DESC order decides ties
    deterministically (required when sort_col can tie). Plan: one window
    row_number over the key partition — the shuffle is keyed by unique_key
    exactly once and AQE handles skewed keys; no join, no collect.
    """
    keys = [unique_key] if isinstance(unique_key, str) else list(unique_key)
    order = [F.col(sort_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def transform_pivot(
    df: DataFrame,
    group_by: list[str] | str,
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """ES pivot transform: ``aggs`` maps output column -> (func, source col)
    with func in value_count/cardinality/avg/sum/min/max. One hash
    aggregate (partial map-side combine; no second shuffle)."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    if not aggs:
        raise ValueError("pivot needs at least one aggregation")
    cols = []
    for out, (func, src) in aggs.items():
        if func not in _PIVOT_FUNCS:
            raise ValueError(f"unsupported pivot agg {func!r}")
        cols.append(_PIVOT_FUNCS[func](F.col(src)).alias(out))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*cols)


def rollover_name(alias: str, generation: int) -> str:
    """ES rollover naming: ``<alias>-NNNNNN`` (zero-padded generation)."""
    return f"{alias}-{generation:06d}"


def fold_rollover(
    batches: list[tuple[date, int]],
    max_docs: int | None = None,
    max_age_days: int | None = None,
) -> list[int]:
    """The sequential rollover condition fold: batch i writes into the
    CURRENT generation; after the write, if the generation's cumulative
    docs >= max_docs or its age (batch day - generation start day) >=
    max_age_days, the NEXT batch opens generation+1 — exactly ES's
    check-after-write `_rollover` contract (conditions are evaluated
    against the index that was just written)."""
    if max_docs is None and max_age_days is None:
        raise ValueError("rollover needs max_docs and/or max_age_days")
    gens: list[int] = []
    gen, gdocs, gstart = 1, 0, None
    for day, n in batches:
        if gstart is None:
            gstart = day
        gens.append(gen)
        gdocs += n
        rolled = (max_docs is not None and gdocs >= max_docs) or (
            max_age_days is not None and (day - gstart).days >= max_age_days
        )
        if rolled:
            gen, gdocs, gstart = gen + 1, 0, None
    return gens


def plan_rollover(
    df: DataFrame,
    ts_col: str,
    alias: str,
    max_docs: int | None = None,
    max_age_days: int | None = None,
) -> DataFrame:
    """Assign every daily batch of `df` its rollover write index.

    Aggregates to per-day counts (ONE scan + hash agg), folds the
    rollover conditions over the O(days) batch list driver-side
    (planning-level, like the date slicer's interval expansion — at
    10^12 docs this is still just one row per day), and returns
    (day, n_docs, generation, index_name)."""
    daily = (
        df.groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("day")
    )
    rows = daily.collect()  # planning-level: one row per day
    batches = [(r["day"], int(r["n_docs"])) for r in rows]
    gens = fold_rollover(batches, max_docs=max_docs, max_age_days=max_age_days)
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (d, n, g, rollover_name(alias, g))
            for (d, n), g in zip(batches, gens)
        ],
        "day date, n_docs bigint, generation int, index_name string",
    )
    return out.orderBy("day")


def plan_retention(
    rollover: DataFrame, delete_after_days: int
) -> DataFrame:
    """ILM delete phase over a rollover plan (plan_rollover's output):
    an index whose LAST written day is more than `delete_after_days`
    before the newest day in the plan gets action 'delete', else 'keep' —
    the age clock starts at rollover, exactly ILM's phase timing.
    One hash agg over O(days) rows + a scalar max broadcast."""
    if delete_after_days < 0:
        raise ValueError("delete_after_days must be >= 0")
    per_idx = rollover.groupBy("index_name").agg(
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.sum("n_docs").alias("n_docs"),
    )
    newest = rollover.agg(F.max("day").alias("_newest"))
    out = per_idx.crossJoin(F.broadcast(newest)).select(
        "index_name", "first_day", "last_day", "n_docs",
        F.when(
            F.datediff(F.col("_newest"), F.col("last_day"))
            > delete_after_days,
            F.lit("delete"),
        ).otherwise(F.lit("keep")).alias("action"),
    )
    return out.orderBy("index_name")


def downsample(
    df: DataFrame,
    ts_col: str,
    interval: str,
    series_keys: list[str],
    metrics: list[str],
) -> DataFrame:
    """ES _downsample (TSDB rollups): replace raw samples with one
    document per (time bucket, series) carrying min/max/sum/value_count
    per metric — the fixed ES downsample shape. `interval` is a
    date_trunc unit (hour/day/week/...). ONE hash agg with map-side
    partials; at 10^12 samples this is the same shuffle as any rollup,
    keyed by (bucket, series) so series skew spreads across buckets."""
    if not metrics:
        raise ValueError("downsample needs at least one metric")
    bucket = F.date_trunc(interval, F.col(ts_col)).alias("_tbucket")
    aggs = []
    for m in metrics:
        aggs += [
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
            F.sum(m).alias(f"{m}_sum"),
            F.count(F.col(m)).alias(f"{m}_value_count"),
        ]
    return (
        df.groupBy(bucket, *[F.col(k) for k in series_keys])
        .agg(*aggs)
        .withColumnRenamed("_tbucket", "tbucket")
    )
