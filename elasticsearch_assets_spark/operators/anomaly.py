"""Seasonal robust anomaly scoring (the ES ML anomaly-detection shape:
single-metric job with a periodic baseline), set-oriented.

Reference behavior: ES anomaly detection buckets a metric, models a
per-season baseline, and scores each observation by its deviation from
that baseline (record_score). This re-expression uses the classic robust
pair — per-season median and MAD (median absolute deviation) — so one
boilerplate-heavy hour can't drag the baseline the way a mean/stddev pair
would.

Plan shape: two grouped exact-percentile passes over the season key (a
LOW-cardinality key — hour-of-day/day-of-week gives <= 168 groups), each
a partial-agg shuffle on the tiny key, then two broadcast joins back onto
the fact stream. At 100 TB the exact percentile's per-group value
collection is the bottleneck — swap `exact=False` to use
approx_percentile (t-digest, mergeable map-side), which is also what ES
itself does; the contract row pins the exact path against the DuckDB
quantile_cont twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    value_col: str,
    season: Column,
    *,
    threshold: float = 3.5,
    exact: bool = True,
) -> DataFrame:
    """Score rows by |x - median_season| / MAD_season and keep rows at or
    above `threshold` (the 3.5 default is Iglewicz-Hoaglin's modified
    z-score cut; the 0.6745 consistency constant is folded into it so the
    score matches the plain ratio both engines compute). Seasons whose
    MAD is 0 (constant metric) produce no outliers — a flat series has no
    robust scale to deviate from. Returns the input columns plus
    (season, med, mad, score)."""
    if threshold <= 0:
        raise ValueError("threshold must be > 0")
    pct = "percentile" if exact else "approx_percentile"
    keyed = df.withColumn("season", season)
    med = keyed.groupBy("season").agg(
        F.expr(f"{pct}({value_col}, 0.5)").alias("med")
    )
    dev = keyed.join(F.broadcast(med), "season").withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy("season").agg(
        F.expr(f"{pct}(absdev, 0.5)").alias("mad")
    )
    scored = dev.join(F.broadcast(mad), "season").where(
        F.col("mad") > 0
    ).withColumn("score", F.col("absdev") / F.col("mad"))
    return scored.where(F.col("score") >= threshold).drop("absdev")
