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

import math

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


def facet_counts_with_other(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    n: int,
    id_col: str = "doc_id",
    other_key: str = "_other_",
) -> DataFrame:
    """ES terms aggregation response ENVELOPE: the top-n buckets plus
    `sum_other_doc_count` — the mass the page missed, reported as a
    trailing `_other_` row (the same convention as
    facet_filters(other_bucket=)); emitted even when zero, like ES.
    `doc_count_error_upper_bound` is 0 by construction: this engine
    aggregates exactly (one partial-agg shuffle over all buckets), not
    per-shard top-shard_size like ES — the documented exactness upgrade.

    The rank/other split is one window + one agg over BUCKET CARDINALITY
    rows only."""
    if n < 1:
        raise ValueError("need n >= 1")
    base = facet_counts(matches, corpus, col, None, id_col)
    ranked = base.withColumn(
        "_r",
        F.expr("row_number() OVER (ORDER BY doc_count DESC, bucket ASC)"),
    )
    top = ranked.where(F.col("_r") <= n).select("bucket", "doc_count", "_r")
    other = (
        ranked.where(F.col("_r") > n)
        .agg(F.coalesce(F.sum("doc_count"), F.lit(0)).alias("doc_count"))
        .select(
            F.lit(other_key).alias("bucket"),
            F.col("doc_count").cast("long"),
            F.lit(n + 1).alias("_r"),
        )
    )
    return top.unionByName(other).orderBy("_r").drop("_r")


def facet_histogram(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    interval: float,
    id_col: str = "doc_id",
    min_doc_count: int = 1,
) -> DataFrame:
    """ES histogram aggregation: doc counts per fixed-width numeric bucket
    (bucket key = floor(value / interval) * interval, the ES formula).
    `min_doc_count=1` (this engine's historical shape) omits empty
    buckets; `min_doc_count=0` is the ES DEFAULT — every bucket between
    the min and max observed keys appears, zero-count ones included.

    The fill never touches the driver: the [min, max] bucket-INDEX span
    comes from one 1-row agg, `sequence()` explodes it into the bucket
    frame (bucket cardinality = span/interval — same magnitude as the
    response itself), and the counts LEFT-join on. Values >1 filter
    after the count (same pass)."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    bidx = F.floor(F.col(col) / F.lit(interval))
    counts = (
        joined.groupBy(bidx.alias("bidx"))
        .agg(F.count("*").alias("doc_count"))
    )
    if min_doc_count <= 0:
        span = counts.agg(
            F.min("bidx").alias("lo"), F.max("bidx").alias("hi")
        )
        all_b = span.where(F.col("lo").isNotNull()).select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bidx")
        )
        counts = all_b.join(counts, "bidx", "left").select(
            "bidx",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        )
    elif min_doc_count > 1:
        counts = counts.where(F.col("doc_count") >= int(min_doc_count))
    return (
        counts.select(
            (F.col("bidx") * F.lit(interval)).cast("double").alias("bucket"),
            "doc_count",
        )
        .orderBy(F.col("bucket").asc())
    )


def significant_terms(
    matches: DataFrame,
    corpus: DataFrame,
    n: int | None = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_count: int = 3,
    heuristic: str = "percentage",
    background: "DataFrame | None" = None,
) -> DataFrame:
    """ES significant_terms aggregation: terms over-represented in the
    match set vs the background corpus.

    Foreground df comes from tokenizing the matched docs (semi join +
    explode — one shuffle of the matched docs' distinct terms); background
    df from the full corpus the same way. Score is the foreground/
    background rate ratio (ES's `percentage` significance heuristic):
        score = (fg_df / fg_total) / (bg_df / bg_total)
    ordered (score DESC, term ASC), `min_doc_count` pruning the noise
    floor like ES. Deterministic, exact SQL oracle.

    `background` is ES's background_filter: any frame with the id column;
    the background statistics are computed over corpus ∩ background
    instead of the whole corpus (compare against a peer group, not the
    world — the ES docs' motivating example)."""
    from elasticsearch_assets_spark.operators.texthash import tokens_expr

    ids = matches.select(F.col(id_col)).distinct()
    fg_docs = corpus.join(ids, id_col, "left_semi")
    fg_total = fg_docs.count()
    if background is not None:
        corpus = corpus.join(
            background.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
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
    score = significance_score(
        heuristic, F.col("fg_df"), F.col("bg_df"), fg_total, bg_total
    )
    out = (
        fg.where(F.col("fg_df") >= min_doc_count)
        .join(bg, "term")
        .select("term", "fg_df", "bg_df", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("term").asc())
    )
    return out.limit(n) if n is not None else out


def significance_score(
    heuristic: str, fg_df, bg_df, fg_total: float, bg_total: float
):
    """ES significance heuristics as pure column math over the
    (fg_df, bg_df, fg_total, bg_total) 2×2 table — background IS a
    superset of the foreground (the ES default):

      percentage  fgp / bgp                       (rate ratio)
      jlh         (fgp − bgp) · (fgp / bgp)       (absolute × relative)
      chi_square  superset-adjusted 2×2 χ² (Manning et al.), signed 0
                  when the term is UNDER-represented (ES's
                  include_negatives=false shape)
      mutual_information  2×2 MI in bits (Manning et al. §13.5.1),
                  0·log0 cells contribute 0; 0 when under-represented
                  (the same include_negatives=false shape as chi_square)
      gnd         normalized Google distance (Cilibrasi & Vitányi 2007)
                  over (term df, fg size, co-occurrence) counts, returned
                  as exp(-2·gnd) so larger = more associated (a monotone
                  inversion; raw distance 0 maps to 1). Degenerate
                  denominator (a term in EVERY background doc) scores 1.
    """
    fgp = fg_df / F.lit(float(fg_total))
    bgp = bg_df / F.lit(float(bg_total))
    if heuristic == "percentage":
        return fgp / bgp
    if heuristic == "jlh":
        return (fgp - bgp) * (fgp / bgp)
    if heuristic == "chi_square":
        # background superset: the out-of-foreground cell counts exclude
        # the foreground's contribution
        n11 = fg_df.cast("double")
        n01 = (bg_df - fg_df).cast("double")
        n10 = F.lit(float(fg_total)) - n11
        n00 = F.lit(float(bg_total - fg_total)) - n01
        n = F.lit(float(bg_total))
        chi2 = (
            n * F.pow(n11 * n00 - n10 * n01, F.lit(2.0))
            / ((n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00))
        )
        return F.when(fgp > bgp, chi2).otherwise(F.lit(0.0))
    if heuristic == "mutual_information":
        n = F.lit(float(bg_total))
        n_t1 = fg_df.cast("double")                      # term & fg
        n_t0 = (bg_df - fg_df).cast("double")            # term & not-fg
        n_o1 = F.lit(float(fg_total)) - n_t1             # no-term & fg
        n_o0 = F.lit(float(bg_total - fg_total)) - n_t0  # no-term & not-fg
        nt, no = n_t1 + n_t0, n_o1 + n_o0
        n1, n0 = n_t1 + n_o1, n_t0 + n_o0
        cell = lambda c, r, k: F.when(  # noqa: E731
            c > 0, (c / n) * F.log2(c * n / (r * k))
        ).otherwise(F.lit(0.0))
        mi = (
            cell(n_t1, nt, n1) + cell(n_t0, nt, n0)
            + cell(n_o1, no, n1) + cell(n_o0, no, n0)
        )
        return F.when(fgp > bgp, mi).otherwise(F.lit(0.0))
    if heuristic == "gnd":
        fx = bg_df.cast("double")            # term df in the background
        fy = F.lit(float(fg_total))          # foreground size
        fxy = fg_df.cast("double")           # co-occurrence
        n = F.lit(float(bg_total))
        num = F.greatest(F.log(fx), F.log(fy)) - F.log(fxy)
        den = F.log(n) - F.least(F.log(fx), F.log(fy))
        return F.when(den > 0, F.exp(-2.0 * num / den)).otherwise(F.lit(1.0))
    raise ValueError(f"unknown significance heuristic {heuristic!r}")


def facet_date_histogram(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    interval: str = "month",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES date_histogram aggregation with a CALENDAR interval (month /
    week / day / hour — buckets snap to calendar boundaries, unlike the
    fixed-width numeric histogram). Bucket key = date_trunc(interval, ts),
    the same truncation DuckDB applies — exact oracle. Empty buckets are
    absent (min_doc_count=1 shape)."""
    if interval not in ("year", "quarter", "month", "week", "day", "hour", "minute"):
        raise ValueError(f"unsupported calendar interval {interval!r}")
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    return (
        joined.groupBy(
            F.date_trunc(interval, F.col(date_col)).alias("bucket")
        )
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("bucket").asc())
    )


def facet_range(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    edges: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """ES range aggregation: half-open buckets [lo, hi) from the sorted
    edge list, with open ends (*-e0, e0-e1, ..., en-*). Buckets are keyed
    by numeric (bucket_lo, bucket_hi) — null = unbounded — instead of
    ES's formatted label strings, so the SQL oracle never depends on
    float formatting. Empty buckets are kept (the ES range-agg contract:
    every requested range appears)."""
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("edges must be strictly increasing")
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    # bucket index = #edges <= v, computed in ONE column expression pass
    # (never a theta-join against the corpus); the tiny static ranges
    # table joins onto the ≤len(edges)+1 aggregated counts afterwards to
    # restore empty buckets (the ES contract: every requested range
    # appears)
    v = F.col(col).cast("double")
    idx = sum(
        (F.when(v >= F.lit(float(e)), 1).otherwise(0) for e in edges),
        F.lit(0),
    )
    counts = joined.groupBy(idx.alias("bidx")).agg(
        F.count("*").alias("doc_count")
    )
    bounds = [(0, None, edges[0])] + [
        (i + 1, edges[i], edges[i + 1]) for i in range(len(edges) - 1)
    ] + [(len(edges), edges[-1], None)]
    ranges = corpus.sparkSession.createDataFrame(
        bounds, "bidx int, bucket_lo double, bucket_hi double"
    )
    return (
        ranges.join(counts, "bidx", "left")
        .select(
            "bucket_lo",
            "bucket_hi",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        )
        .orderBy(F.col("bucket_lo").asc_nulls_first())
    )


def facet_stats(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES stats aggregation (count / min / max / sum / avg) over the match
    set — one partial-aggregated pass, zero extra shuffle beyond the semi
    join."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    v = F.col(col).cast("double")
    return joined.agg(
        F.count(v).alias("count"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.sum(v).alias("sum"),
        F.avg(v).alias("avg"),
    )


def facet_percentiles(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    percents: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """ES percentiles aggregation, EXACT variant: linear interpolation at
    rank p*(n-1) — Spark's `percentile` and DuckDB's `quantile_cont` share
    that definition, so the oracle is exact. (ES's t-digest is approximate
    and seed-dependent; at 100 TB swap in percentile_approx and drop the
    oracle to rows-only — the plan shape is identical.) One row per
    requested percent, (percent, value)."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    v = F.col(col).cast("double")
    aggs = [
        F.percentile(v, F.lit(p / 100.0)).alias(f"p{i}")
        for i, p in enumerate(percents)
    ]
    row = joined.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(float(p)).alias("percent"), F.col(f"p{i}").alias("value")
        )
        for i, p in enumerate(percents)
    ])
    return (
        row.select(F.explode(pairs).alias("x"))
        .select("x.percent", "x.value")
        .orderBy("percent")
    )


def facet_cardinality(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES cardinality aggregation, EXACT variant: distinct-count over the
    match set (partial-aggregated distinct — two-phase hash agg, no
    driver work). ES uses HyperLogLog++; at 100 TB swap in
    approx_count_distinct (same plan, bounded memory) and drop the oracle
    to rows-only — documented deviation for oracle exactness."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    return joined.agg(F.count_distinct(F.col(col)).alias("value"))


def collapse_topk(
    scored: DataFrame,
    corpus: DataFrame,
    col: str,
    k: int | None = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES field collapsing (`collapse` on a search request): at most ONE
    result per distinct `col` value — the best-scored doc (score DESC,
    doc_id ASC) represents its group — then the usual global (score DESC,
    doc_id ASC) top-k over the representatives.

    Plan: join scores to the collapse key, bucket-partitioned row_number
    window keeps the group winner (Spark rewrites the rank<=1 filter into
    a group-limit inside the window sort — no full per-group
    materialization), then TakeOrderedAndProject for the global cut."""
    joined = corpus.select(F.col(id_col), F.col(col).alias("ckey")).join(
        scored.select(F.col(id_col), "score"), id_col
    )
    w = Window.partitionBy("ckey").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    out = (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col(id_col), "score", "ckey")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )
    return out.limit(k) if k is not None else out


def facet_terms_metrics(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    metric_col: str,
    n: int | None = None,
    id_col: str = "doc_id",
    order_by: str = "count",
    ascending: bool = False,
    missing: "str | None" = None,
) -> DataFrame:
    """ES terms aggregation WITH metric sub-aggregations (the nested
    `aggs: {avg: ..., sum: ...}` shape): doc count + sum/avg of
    `metric_col` per bucket, in ONE grouped pass (the sub-metrics are
    extra partial aggregates on the same shuffle — nested aggs cost no
    extra pass, exactly how ES computes them per bucket).

    `order_by` is ES's terms-agg `order`: "count" (_count, the default)
    or a sub-agg name ("sum" / "avg"); `ascending` flips it. The bucket
    tie-break stays ASC either way (the ES _key secondary).

    `missing` is ES's terms-agg missing parameter: docs with a null
    bucket value count under that literal instead of being dropped —
    a coalesce before the grouping, same single pass."""
    keys = {"count": "doc_count", "sum": "sum", "avg": "avg"}
    if order_by not in keys:
        raise ValueError(
            f"order_by must be one of {sorted(keys)}, got {order_by!r}"
        )
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    v = F.col(metric_col).cast("double")
    key = F.col(keys[order_by])
    if missing is not None:
        bucket = F.coalesce(F.col(col), F.lit(missing))
    else:
        # ES drops docs missing the field unless `missing` is set
        joined = joined.where(F.col(col).isNotNull())
        bucket = F.col(col)
    out = (
        joined.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(v).alias("sum"),
            F.avg(v).alias("avg"),
        )
        .orderBy(
            key.asc() if ascending else key.desc(), F.col("bucket").asc()
        )
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


def facet_composite(
    corpus: DataFrame,
    keys: list[str],
    size: int | None = None,
    after: tuple | None = None,
    matches: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES composite aggregation: doc counts over the cross-product of
    `keys` source values, ordered by the key tuple ASC, paginated with an
    `after` key (exclusive keyset, ES's after_key contract).

    This is the ES agg built for UNBOUNDED bucket spaces — at 100 TB a
    terms agg with millions of buckets can't return in one response, so
    composite pages through them deterministically. The Spark plan keeps
    that property: the keyset predicate `(k1,..,kn) > after` is a plain
    column conjunction evaluated BEFORE the grouped shuffle (rows of
    already-seen pages never shuffle), the count is partial-aggregated,
    and the page cut is TakeOrderedAndProject — no driver-side bucket
    materialization at any page.
    """
    if not keys:
        raise ValueError("composite needs at least one source key")
    src = corpus
    if matches is not None:
        src = corpus.join(
            matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
    if after is not None:
        if len(after) != len(keys):
            raise ValueError("after key arity != source arity")
        # lexicographic tuple > : OR over prefixes, pure column exprs
        cond = F.lit(False)
        for i in range(len(keys)):
            eq = F.lit(True)
            for j in range(i):
                eq = eq & (F.col(keys[j]) == F.lit(after[j]))
            cond = cond | (eq & (F.col(keys[i]) > F.lit(after[i])))
        src = src.where(cond)
    out = (
        src.groupBy(*[F.col(k) for k in keys])
        .agg(F.count("*").alias("doc_count"))
        .orderBy(*[F.col(k).asc() for k in keys])
    )
    return out.limit(size) if size is not None else out


def facet_filters(
    corpus: DataFrame,
    filters: dict,
    matches: DataFrame | None = None,
    id_col: str = "doc_id",
    other_bucket: bool = False,
    other_bucket_key: str = "_other_",
) -> DataFrame:
    """ES filters aggregation: one named bucket per predicate, all counted
    in a SINGLE aggregated pass (each filter is a conditional partial
    count on the same scan — N filters never cost N scans), then unpivoted
    to (bucket, doc_count) rows ordered by bucket ASC. A document can land
    in several buckets, exactly the ES contract.

    `other_bucket` adds ES's catch-all: docs matching NONE of the named
    filters count under `other_bucket_key` — one more conditional partial
    on the same pass (null predicate results count as non-matching,
    the ES filter-context behavior)."""
    if not filters:
        raise ValueError("filters agg needs at least one named filter")
    if other_bucket and other_bucket_key in filters:
        raise ValueError(
            f"other_bucket_key {other_bucket_key!r} collides with a filter"
        )
    src = corpus
    if matches is not None:
        src = corpus.join(
            matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
    aggs = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias(name)
        for name, cond in filters.items()
    ]
    names = list(filters.keys())
    if other_bucket:
        none_match = None
        for cond in filters.values():
            miss = ~F.coalesce(cond, F.lit(False))
            none_match = miss if none_match is None else (none_match & miss)
        aggs.append(
            F.sum(F.when(none_match, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(other_bucket_key)
        )
        names.append(other_bucket_key)
    one = src.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return (
        one.selectExpr(
            f"stack({len(names)}, {stack}) as (bucket, doc_count)"
        ).orderBy(F.col("bucket").asc())
    )


def facet_terms_nested(
    matches: DataFrame,
    corpus: DataFrame,
    outer: str,
    inner: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES nested bucket aggs (`terms` inside `terms`): doc counts per
    (outer, inner) pair plus the parent bucket's total, flattened to rows.
    ONE grouped shuffle computes the leaf counts; the parent totals are a
    window sum over the leaves (bucket-count cardinality, not doc
    cardinality) — ES's nested shape without a second pass over the data.
    Ordered (outer_count DESC, outer ASC, doc_count DESC, inner ASC) — the
    ES ordering: parent buckets by size, children by size within each."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    leaves = joined.groupBy(
        F.col(outer).alias("bucket"), F.col(inner).alias("sub_bucket")
    ).agg(F.count("*").alias("doc_count"))
    w = Window.partitionBy("bucket")
    return (
        leaves.withColumn("outer_count", F.sum("doc_count").over(w))
        .select("bucket", "outer_count", "sub_bucket", "doc_count")
        .orderBy(
            F.col("outer_count").desc(),
            F.col("bucket").asc(),
            F.col("doc_count").desc(),
            F.col("sub_bucket").asc(),
        )
    )


def facet_pipeline(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    interval: str = "day",
    moving_window: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES pipeline aggregations over a date_histogram: cumulative_sum,
    derivative, and moving_fn(avg) of the bucket doc counts, in one plan.

    Pipeline aggs operate on the BUCKET SERIES, not the documents: the
    expensive part (the histogram) is the usual partial-aggregated
    grouped pass over the match set; the window functions then run over
    bucket cardinality only (for a 'day' histogram that's ~365 rows/year
    even at 100 TB), so the single unpartitioned window sort is over a
    provably tiny input — the one place a global window is safe by
    construction. Derivative of the first bucket is null (ES contract);
    moving_fn averages the trailing `moving_window` buckets including
    the current one."""
    hist = facet_date_histogram(matches, corpus, date_col, interval, id_col)
    w = Window.orderBy(F.col("bucket").asc())
    wm = w.rowsBetween(-(moving_window - 1), 0)
    return (
        hist.withColumn("cum_count", F.sum("doc_count").over(w))
        .withColumn(
            "derivative",
            (F.col("doc_count") - F.lag("doc_count", 1).over(w)).cast("long"),
        )
        .withColumn("moving_avg", F.avg("doc_count").over(wm))
        .orderBy(F.col("bucket").asc())
    )

def facet_extended_stats(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    sigma: float = 2.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES extended_stats aggregation: the `stats` fields plus
    sum_of_squares, POPULATION variance / std_deviation (the ES default),
    and the sigma-scaled std-deviation bounds (avg ± sigma·std). Still one
    partial-aggregated pass — the extra moments are more partial aggregates
    on the same shuffle."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    v = F.col(col).cast("double")
    row = joined.agg(
        F.count(v).alias("count"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.sum(v).alias("sum"),
        F.avg(v).alias("avg"),
        F.sum(v * v).alias("sum_of_squares"),
        F.var_pop(v).alias("variance"),
        F.stddev_pop(v).alias("std_deviation"),
    )
    return row.select(
        "*",
        (F.col("avg") + F.lit(float(sigma)) * F.col("std_deviation")).alias(
            "std_upper"
        ),
        (F.col("avg") - F.lit(float(sigma)) * F.col("std_deviation")).alias(
            "std_lower"
        ),
    )


def facet_percentile_ranks(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    values: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """ES percentile_ranks aggregation, EXACT cumulative-frequency variant:
    rank(v) = 100 · |{x ≤ v}| / n. (ES interpolates from a t-digest — an
    approximation of exactly this quantity; the exact form is deterministic
    and engine-portable, so the oracle matches bit-for-bit. At 100 TB the
    plan is unchanged: the ranks are `sum(when(x<=v,1))` partial aggregates
    on one pass, no sort.) One row per requested value, (value, percent),
    value ASC."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    x = F.col(col).cast("double")
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.when(x <= F.lit(float(v)), 1).otherwise(0)).alias(f"c{i}")
        for i, v in enumerate(values)
    ]
    row = joined.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(float(v)).alias("value"),
            (F.col(f"c{i}") * 100.0 / F.col("n")).alias("percent"),
        )
        for i, v in enumerate(values)
    ])
    return (
        row.select(F.explode(pairs).alias("x"))
        .select("x.value", "x.percent")
        .orderBy("value")
    )


def facet_weighted_avg(
    matches: DataFrame,
    corpus: DataFrame,
    value_col: str,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES weighted_avg aggregation: sum(value·weight) / sum(weight) over
    the match set — one partial-aggregated pass."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    return joined.agg((F.sum(v * w) / F.sum(w)).alias("value"))


def facet_rare_terms(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    max_doc_count: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES rare_terms aggregation: the long tail — buckets whose doc count
    is ≤ max_doc_count, ordered (doc_count ASC, bucket ASC) (ES's
    rare-first order). Same grouped pass as the terms agg with the
    post-aggregation count filter; ES's CuckooFilter-based pruning is an
    approximation of exactly this — the exact form keeps the oracle, and
    the count filter runs AFTER the partial agg so only (bucket, count)
    pairs ever shuffle."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    return (
        joined.groupBy(F.col(col).alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .where(F.col("doc_count") <= max_doc_count)
        .orderBy(F.col("doc_count").asc(), F.col("bucket").asc())
    )


def facet_adjacency_matrix(
    matches: DataFrame,
    corpus: DataFrame,
    filters: dict,
    sep: str = "&",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES adjacency_matrix aggregation: named filter predicates; one bucket
    per filter (docs matching it) and one per filter PAIR "a&b" (docs
    matching both), empty buckets absent (the ES contract). Buckets order
    key ASC (deterministic; ES renders a keyed map).

    Plan: per doc, ONE array-of-keys column expression (singles + pair
    conjunctions), array_compact + explode + counted group — a single pass
    and one (key, partial_count) shuffle regardless of the number of
    filters; never one scan per filter."""
    items = sorted(filters.items())
    keys = [F.when(cond, F.lit(name)) for name, cond in items]
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            ni, ci = items[i]
            nj, cj = items[j]
            keys.append(F.when(ci & cj, F.lit(f"{ni}{sep}{nj}")))
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    return (
        joined.select(
            F.explode(F.array_compact(F.array(*keys))).alias("key")
        )
        .groupBy("key")
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("key").asc())
    )


_GEOTILE_MAX_LAT = 85.05112878  # Web-Mercator latitude bound (slippy tiles)


def facet_geotile_grid(
    matches: DataFrame,
    corpus: DataFrame,
    lat_col: str,
    lon_col: str,
    zoom: int = 5,
    n: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES geotile_grid aggregation: doc counts per Web-Mercator map tile
    "z/x/y" at the requested zoom (the slippy-tile formula ES uses:
    x = ⌊(lon+180)/360·2^z⌋, y from the Mercator projection of the
    clamped latitude). Pure JVM column math — one grouped pass, one
    (tile, partial_count) shuffle. Order (doc_count DESC, key ASC) with
    ES's size cut."""
    if not 0 <= zoom <= 29:
        raise ValueError(f"zoom {zoom} outside [0, 29]")
    z2 = float(2 ** zoom)
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    lat = F.greatest(
        F.lit(-_GEOTILE_MAX_LAT),
        F.least(F.lit(_GEOTILE_MAX_LAT), F.col(lat_col).cast("double")),
    )
    lon = F.col(lon_col).cast("double")
    latr = F.radians(lat)
    x = F.floor((lon + 180.0) / 360.0 * F.lit(z2))
    y = F.floor(
        (1.0 - F.log(F.tan(latr) + 1.0 / F.cos(latr)) / F.lit(math.pi))
        / 2.0
        * F.lit(z2)
    )
    maxi = F.lit(int(z2) - 1)
    x = F.least(F.greatest(x, F.lit(0)), maxi).cast("long")
    y = F.least(F.greatest(y, F.lit(0)), maxi).cast("long")
    key = F.concat_ws("/", F.lit(str(zoom)), x, y)
    out = (
        joined.groupBy(key.alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
    )
    return out.limit(n) if n is not None else out


_AUTO_DH_LADDER = ("minute", "hour", "day", "week", "month", "quarter", "year")


def facet_auto_date_histogram(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    target_buckets: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES auto_date_histogram: pick the smallest calendar interval from the
    minute→year ladder yielding at most `target_buckets` NON-EMPTY buckets,
    then the usual date_histogram at that interval. Output carries the
    chosen interval per row (the ES response's `interval` field).

    Plan: ONE planning-level pass computes every ladder rung's distinct
    bucket count as parallel partial aggregates (a single 7-column agg row
    collected to the driver — planning data, like the slicer histograms);
    the chosen rung then runs as the normal grouped histogram. Two passes
    total, both distributed."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    counts = joined.agg(*[
        F.count_distinct(F.date_trunc(iv, F.col(date_col))).alias(iv)
        for iv in _AUTO_DH_LADDER
    ]).collect()[0]
    interval = next(
        (iv for iv in _AUTO_DH_LADDER if counts[iv] <= target_buckets),
        "year",
    )
    return (
        joined.groupBy(
            F.date_trunc(interval, F.col(date_col)).alias("bucket")
        )
        .agg(F.count("*").alias("doc_count"))
        .select(F.lit(interval).alias("interval"), "bucket", "doc_count")
        .orderBy(F.col("bucket").asc())
    )

def facet_matrix_stats(
    matches: DataFrame,
    corpus: DataFrame,
    col_x: str,
    col_y: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES matrix_stats aggregation (two-field form): count, means,
    POPULATION variances, covariance, and correlation between two numeric
    fields over the match set — one partial-aggregated pass (the moments
    are parallel partials on the same shuffle). ES streams sample moments;
    the population form is deterministic and engine-portable (documented
    deviation; correlation is scale-free so pop vs sample only shifts the
    variance rows by n/(n−1))."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    x = F.col(col_x).cast("double")
    y = F.col(col_y).cast("double")
    row = joined.agg(
        F.count("*").alias("count"),
        F.avg(x).alias("mean_x"),
        F.avg(y).alias("mean_y"),
        F.var_pop(x).alias("var_x"),
        F.var_pop(y).alias("var_y"),
        F.covar_pop(x, y).alias("covariance"),
    )
    return row.select(
        "*",
        (
            F.col("covariance")
            / F.sqrt(F.col("var_x") * F.col("var_y"))
        ).alias("correlation"),
    )


def facet_mad(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES median_absolute_deviation aggregation, EXACT variant:
    median(|x − median(x)|) with exact interpolated medians (ES uses
    t-digest approximations of the same definition). Two grouped passes,
    both distributed — the one-row median frame cross-joins back (a
    broadcast of one row), never a driver collect."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    v = F.col(col).cast("double")
    med = joined.agg(F.percentile(v, F.lit(0.5)).alias("med"))
    return (
        joined.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("value")
        )
    )


def facet_multi_terms(
    matches: DataFrame,
    corpus: DataFrame,
    cols: list,
    n: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES multi_terms aggregation: buckets keyed by a COMPOSITE of several
    fields, doc_count per key tuple, ordered (doc_count DESC, keys ASC) —
    one grouped pass, identical plan shape to the terms agg."""
    if not cols:
        raise ValueError("multi_terms needs at least one key column")
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    keys = [F.col(c).alias(f"key_{c}") for c in cols]
    out = (
        joined.groupBy(*keys)
        .agg(F.count("*").alias("doc_count"))
        .orderBy(
            F.col("doc_count").desc(),
            *[F.col(f"key_{c}").asc() for c in cols],
        )
    )
    return out.limit(n) if n is not None else out


def facet_top_metrics(
    matches: DataFrame,
    corpus: DataFrame,
    bucket_col: str,
    sort_col: str,
    metric_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES top_metrics aggregation under a terms agg: per bucket, the
    `metric_col` value of the row with the LARGEST `sort_col` (ties broken
    id ASC — deterministic). Same grouped-top-1 window shape as field
    collapsing (Spark rewrites rank<=1 into a group-limit)."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    w = Window.partitionBy(bucket_col).orderBy(
        F.col(sort_col).desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col(bucket_col).alias("bucket"),
            F.col(sort_col).alias("sort_val"),
            F.col(metric_col).alias("metric_val"),
        )
        .orderBy(F.col("bucket").asc())
    )


def facet_geo_distance(
    matches: DataFrame,
    corpus: DataFrame,
    lat_col: str,
    lon_col: str,
    origin: str,
    edges_km: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES geo_distance aggregation: ring buckets [lo, hi) of haversine
    distance (km) from `origin` ("lat,lon"), open-ended like the range agg,
    empty buckets kept. The distance is the same pure-JVM haversine the
    geo operators use (operators/geo.py); bucketing is the range agg's
    single column-expression pass."""
    from elasticsearch_assets_spark.operators.geo import (
        haversine_m,
        parse_geo_point,
    )

    if sorted(edges_km) != list(edges_km) or len(set(edges_km)) != len(edges_km):
        raise ValueError("edges must be strictly increasing")
    plat, plon = parse_geo_point(origin)
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    km = haversine_m(
        F.col(lat_col).cast("double"), F.col(lon_col).cast("double"),
        plat, plon,
    ) / 1000.0
    idx = sum(
        (F.when(km >= F.lit(float(e)), 1).otherwise(0) for e in edges_km),
        F.lit(0),
    )
    counts = joined.groupBy(idx.alias("bidx")).agg(
        F.count("*").alias("doc_count")
    )
    bounds = [(0, None, edges_km[0])] + [
        (i + 1, edges_km[i], edges_km[i + 1])
        for i in range(len(edges_km) - 1)
    ] + [(len(edges_km), edges_km[-1], None)]
    ranges = corpus.sparkSession.createDataFrame(
        bounds, "bidx int, bucket_lo double, bucket_hi double"
    )
    return (
        ranges.join(counts, "bidx", "left")
        .select(
            "bucket_lo",
            "bucket_hi",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        )
        .orderBy(F.col("bucket_lo").asc_nulls_first())
    )


def facet_geo_centroid(
    matches: DataFrame,
    corpus: DataFrame,
    lat_col: str,
    lon_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES geo_centroid aggregation: the arithmetic mean of the match set's
    lat/lon (ES's definition) plus the count — one pass."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    return joined.agg(
        F.avg(F.col(lat_col).cast("double")).alias("lat"),
        F.avg(F.col(lon_col).cast("double")).alias("lon"),
        F.count("*").alias("count"),
    )


def facet_sampler(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    shard_size: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES sampler aggregation, DETERMINISTIC variant: restrict the
    sub-aggregation to a fixed-size pseudo-random sample of the match set
    — the md5(id)-smallest `shard_size` docs (a seedable, engine-portable
    stand-in for ES's per-shard first-N, which is arrival-order dependent
    and unreproducible). Sub-agg here: terms counts over `col`.

    Plan: the sample cut is ONE TakeOrderedAndProject on the hash (top-N
    per partition, no global sort), then the usual grouped count."""
    ids = matches.select(F.col(id_col)).distinct()
    sample = (
        ids.orderBy(F.md5(F.col(id_col).cast("string")).asc())
        .limit(shard_size)
    )
    joined = corpus.join(sample, id_col, "left_semi")
    return (
        joined.groupBy(F.col(col).alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("bucket").asc())
    )


def facet_random_sampler(
    df: DataFrame,
    probability: float,
    group_col: str,
    value_col: str,
    *,
    id_col: str = "doc_id",
    seed: str = "rs",
) -> DataFrame:
    """ES random_sampler aggregation (8.2): run sub-aggregations over an
    i.i.d. `probability` sample of the docs, with monotonic metrics
    (doc_count, sum) scaled by 1/probability to approximate the full
    population; averages report unscaled. ES samples per-doc with a
    `seed` for reproducibility — here the sample cut is the engine's
    deterministic md5-hex-prefix filter salted by `seed`
    (operators/sampling.py), so the sample is identical across engines,
    runs, and retries, not merely across one seed's shard layout.

    Plan: the cut is a pure JVM filter on the scan (zero shuffle, no
    rand()), then ONE partial-aggregated hash agg — at 10^12 docs this is
    the cheapest way to bound any expensive sub-aggregation, which is
    exactly what ES built it for."""
    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )

    if not (0.0 < probability <= 1.0):
        raise ValueError("probability must be in (0, 1]")
    h = F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
        1, 8,
    )
    sampled = df.where(h < F.lit(rate_threshold_hex(probability)))
    p = F.lit(float(probability))  # scale by DIVISION so an oracle
    # dividing by the same literal is bit-identical (1/p then multiply
    # rounds differently for non-dyadic p)
    return (
        sampled.groupBy(F.col(group_col).alias("bucket"))
        .agg(
            (F.count("*").cast("double") / p).alias("doc_count"),
            (F.sum(F.col(value_col)).cast("double") / p).alias(
                f"sum_{value_col}"
            ),
            F.avg(value_col).alias(f"avg_{value_col}"),
        )
        .orderBy(F.col("bucket").asc())
    )


def facet_bucket_script(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    metric_col: str,
    interval: str = "day",
    min_count: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES bucket_script + bucket_selector pipeline aggs over a
    date_histogram: per calendar bucket, doc_count and sum(metric), a
    script-computed ratio (bucket_script: total/doc_count), and buckets
    failing `doc_count > min_count` dropped (bucket_selector). Pipeline
    work is pure column math over the bucket series — no second pass over
    the documents."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    return (
        joined.groupBy(
            F.date_trunc(interval, F.col(date_col)).alias("bucket")
        )
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.col(metric_col).cast("double")).alias("total"),
        )
        .withColumn("ratio", F.col("total") / F.col("doc_count"))
        .where(F.col("doc_count") > min_count)
        .orderBy(F.col("bucket").asc())
    )


def facet_normalize(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    metric_col: str,
    interval: str = "day",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES normalize pipeline aggregation — the full method set over one
    date_histogram's per-bucket metric m = avg(metric_col):

      rescale_0_1     (m - min) / (max - min)
      rescale_0_100   100 * rescale_0_1
      percent_of_sum  m / sum
      mean            (m - avg) / (max - min)
      zscore          (m - avg) / stddev_pop
      softmax         e^m / sum(e^m)

    (percent_of_sum is also pinned standalone next to serial_diff; this
    row closes the method set.) Plan: ONE hash agg to buckets, then one
    unpartitioned window pass over BUCKET CARDINALITY only — pipeline
    aggs never re-touch the document rows, the property that makes them
    free at 10^12 docs."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    h = joined.groupBy(
        F.date_trunc(interval, F.col(date_col)).alias("bucket")
    ).agg(
        F.count("*").alias("doc_count"),
        F.avg(F.col(metric_col).cast("double")).alias("m"),
    )
    w = Window.partitionBy()  # bucket-cardinality rows only
    mn, mx = F.min("m").over(w), F.max("m").over(w)
    av, sd = F.avg("m").over(w), F.stddev_pop("m").over(w)
    tot, etot = F.sum("m").over(w), F.sum(F.exp("m")).over(w)
    rng = mx - mn
    return (
        h.withColumn("rescale_0_1", (F.col("m") - mn) / rng)
        .withColumn("rescale_0_100", F.lit(100.0) * (F.col("m") - mn) / rng)
        .withColumn("percent_of_sum", F.col("m") / tot)
        .withColumn("mean_norm", (F.col("m") - av) / rng)
        .withColumn("zscore", (F.col("m") - av) / sd)
        .withColumn("softmax", F.exp("m") / etot)
        .orderBy(F.col("bucket").asc())
    )


def _match_join(
    matches: DataFrame, corpus: DataFrame, id_col: str
) -> DataFrame:
    return corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )


def facet_missing(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES missing aggregation: docs in the match set whose field is null
    — one conditional partial count, no extra shuffle beyond the semi
    join."""
    return _match_join(matches, corpus, id_col).agg(
        F.count_if(F.col(col).isNull()).alias("doc_count")
    )


def facet_value_count(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES value_count aggregation: non-null field values in the match
    set (the dual of `missing`)."""
    return _match_join(matches, corpus, id_col).agg(
        F.count(F.col(col)).alias("value")
    )


def facet_global_counts(
    corpus: DataFrame, col: str, n: int | None = None
) -> DataFrame:
    """ES global aggregation wrapping a terms agg: bucket counts over the
    WHOLE corpus, ignoring the surrounding query's match set — the
    background-comparison agg. Same partial-agg plan as facet_counts,
    minus the semi join."""
    out = (
        corpus.groupBy(F.col(col).alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("bucket").asc())
    )
    return out.limit(n) if n is not None else out


def facet_boxplot(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES boxplot aggregation, EXACT variant: min / q1 / q2 / q3 / max
    with linear-interpolation quartiles (Spark `percentile` ==
    DuckDB `quantile_cont`; ES's t-digest is the approximate production
    form — swap percentile_approx at 100 TB, same plan shape). One
    partial-agg pass."""
    v = F.col(col).cast("double")
    return _match_join(matches, corpus, id_col).agg(
        F.min(v).alias("min"),
        F.percentile(v, F.lit(0.25)).alias("q1"),
        F.percentile(v, F.lit(0.5)).alias("q2"),
        F.percentile(v, F.lit(0.75)).alias("q3"),
        F.max(v).alias("max"),
    )


def facet_string_stats(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES string_stats aggregation: count, min/max/avg length, and the
    Shannon entropy (base 2) of the CHARACTER distribution across all
    values of the field in the match set.

    Plan: lengths are one partial-agg pass. Entropy needs the character
    histogram: explode the char array and count per char — the shuffle
    carries (char, partial_count) pairs only, bounded by the alphabet,
    then the entropy reduces the ≤|alphabet| histogram rows. Two small
    aggs, one cross join of two 1-row frames."""
    joined = _match_join(matches, corpus, id_col)
    v = F.col(col)
    lens = joined.agg(
        F.count(v).alias("count"),
        F.min(F.length(v)).alias("min_length"),
        F.max(F.length(v)).alias("max_length"),
        F.avg(F.length(v)).alias("avg_length"),
    )
    chars = (
        joined.select(F.explode(F.split(v, "")).alias("ch"))
        .where(F.length("ch") > 0)
        .groupBy("ch")
        .agg(F.count("*").alias("n"))
    )
    # -Σ (n/N)·log2(n/N) = log2(N) − Σ n·log2(n) / N — one aggregate,
    # no window pass over the histogram
    ent = chars.agg(
        (
            F.log2(F.sum("n"))
            - F.sum(F.col("n") * F.log2(F.col("n"))) / F.sum("n")
        ).alias("entropy")
    )
    return lens.crossJoin(ent)


def facet_t_test(
    corpus: DataFrame,
    metric_col: str,
    cond_a,
    cond_b,
) -> DataFrame:
    """ES t_test aggregation (heteroscedastic / Welch's, the ES default):
    t = (mean_a − mean_b) / sqrt(var_a/n_a + var_b/n_b) between two
    filter populations, with SAMPLE variances. One conditional
    partial-agg pass over the corpus — both populations' moments
    accumulate in the same scan (a doc may satisfy both filters, like
    ES's filter pair)."""
    v = F.col(metric_col).cast("double")
    row = corpus.agg(
        F.avg(F.when(cond_a, v)).alias("ma"),
        F.var_samp(F.when(cond_a, v)).alias("va"),
        F.count(F.when(cond_a, v)).alias("na"),
        F.avg(F.when(cond_b, v)).alias("mb"),
        F.var_samp(F.when(cond_b, v)).alias("vb"),
        F.count(F.when(cond_b, v)).alias("nb"),
    )
    t = (F.col("ma") - F.col("mb")) / F.sqrt(
        F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    )
    return row.select(
        "ma", "mb", "na", "nb", t.alias("t_value")
    )


def facet_rate(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    metric_col: str | None = None,
    bucket_unit: str = "month",
    rate_unit: str = "day",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES rate aggregation under a date_histogram: per calendar bucket,
    sum(metric) (or doc count when metric_col is None) rescaled to
    `rate_unit` — e.g. month buckets reported as a per-day rate divide
    by the ACTUAL day count of that month (ES's calendar-aware scaling).
    Supported pairs: month→day, week→day, day→hour. Pure JVM date math
    on the bucket series."""
    joined = _match_join(matches, corpus, id_col)
    val = (
        F.count("*").cast("double")
        if metric_col is None
        else F.sum(F.col(metric_col).cast("double"))
    )
    b = F.date_trunc(bucket_unit, F.col(date_col))
    agg = joined.groupBy(b.alias("bucket")).agg(val.alias("total"))
    if (bucket_unit, rate_unit) == ("month", "day"):
        divisor = F.dayofmonth(F.last_day(F.col("bucket"))).cast("double")
    elif (bucket_unit, rate_unit) == ("week", "day"):
        divisor = F.lit(7.0)
    elif (bucket_unit, rate_unit) == ("day", "hour"):
        divisor = F.lit(24.0)
    else:
        raise ValueError(
            f"unsupported rate pair {bucket_unit!r} -> {rate_unit!r}"
        )
    return (
        agg.select(
            "bucket",
            "total",
            (F.col("total") / divisor).alias("rate"),
        )
        .orderBy(F.col("bucket").asc())
    )


def facet_geo_bounds(
    matches: DataFrame,
    corpus: DataFrame,
    lat_col,
    lon_col,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES geo_bounds aggregation: the bounding box of the match set's
    points — top_left = (max lat, min lon), bottom_right = (min lat,
    max lon). One partial-agg pass. (ES also handles wrap-around
    longitude; this engine reports the non-wrapping box, the form its
    geo operators consume — documented deviation.)"""
    joined = _match_join(matches, corpus, id_col)
    la = F.col(lat_col).cast("double") if isinstance(lat_col, str) else lat_col
    lo = F.col(lon_col).cast("double") if isinstance(lon_col, str) else lon_col
    return joined.agg(
        F.max(la).alias("top_left_lat"),
        F.min(lo).alias("top_left_lon"),
        F.min(la).alias("bottom_right_lat"),
        F.max(lo).alias("bottom_right_lon"),
    )


def facet_date_range(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    edges: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """ES date_range aggregation: half-open timestamp buckets [lo, hi)
    from the sorted ISO edge list, open at both ends, empty buckets kept
    — the range agg's plan (one bucket-index column pass + a tiny static
    ranges join) on the time axis. Buckets are keyed by (bucket_lo,
    bucket_hi) timestamps, null = unbounded."""
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("edges must be strictly increasing")
    joined = _match_join(matches, corpus, id_col)
    v = F.col(date_col).cast("timestamp")
    idx = sum(
        (
            F.when(v >= F.lit(e).cast("timestamp"), 1).otherwise(0)
            for e in edges
        ),
        F.lit(0),
    )
    counts = joined.groupBy(idx.alias("bidx")).agg(
        F.count("*").alias("doc_count")
    )
    bounds = [(0, None, edges[0])] + [
        (i + 1, edges[i], edges[i + 1]) for i in range(len(edges) - 1)
    ] + [(len(edges), edges[-1], None)]
    ranges = corpus.sparkSession.createDataFrame(
        bounds, "bidx int, lo string, hi string"
    ).select(
        "bidx",
        F.col("lo").cast("timestamp").alias("bucket_lo"),
        F.col("hi").cast("timestamp").alias("bucket_hi"),
    )
    return (
        ranges.join(counts, "bidx", "left")
        .select(
            "bucket_lo",
            "bucket_hi",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        )
        .orderBy(F.col("bucket_lo").asc_nulls_first())
    )


def ipv4_to_long(col) -> "F.Column":
    """Dotted-quad IPv4 string -> numeric (pure JVM split + casts) — the
    comparison form ES's ip fields use under ip_range."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    return (
        F.element_at(parts, 1).cast("long") * F.lit(16777216)
        + F.element_at(parts, 2).cast("long") * F.lit(65536)
        + F.element_at(parts, 3).cast("long") * F.lit(256)
        + F.element_at(parts, 4).cast("long")
    )


def facet_ip_range(
    matches: DataFrame,
    corpus: DataFrame,
    ip_col: str,
    edges: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ip_range aggregation: half-open buckets [lo, hi) over dotted-
    quad IPv4 edges, open ends, empty buckets kept. The ip parses to a
    numeric in one JVM expression (ipv4_to_long); then it is exactly the
    range agg's bucket-index plan. Buckets keyed by the edge STRINGS
    (bucket_lo/bucket_hi, null = unbounded) so no formatting round-trip."""
    def key(ip: str) -> int:
        a, b, c, d = (int(x) for x in ip.split("."))
        return ((a * 256 + b) * 256 + c) * 256 + d

    nums = [key(e) for e in edges]
    if sorted(nums) != nums or len(set(nums)) != len(nums):
        raise ValueError("edges must be strictly increasing")
    joined = _match_join(matches, corpus, id_col)
    v = ipv4_to_long(ip_col)
    idx = sum(
        (F.when(v >= F.lit(n), 1).otherwise(0) for n in nums), F.lit(0)
    )
    counts = joined.groupBy(idx.alias("bidx")).agg(
        F.count("*").alias("doc_count")
    )
    bounds = [(0, None, edges[0])] + [
        (i + 1, edges[i], edges[i + 1]) for i in range(len(edges) - 1)
    ] + [(len(edges), edges[-1], None)]
    ranges = corpus.sparkSession.createDataFrame(
        bounds, "bidx int, bucket_lo string, bucket_hi string"
    )
    return (
        ranges.join(counts, "bidx", "left")
        .select(
            "bucket_lo",
            "bucket_hi",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        )
        .orderBy(F.col("bucket_lo").asc_nulls_first())
    )


_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql(lat_sql: str, lon_sql: str, precision: int) -> str:
    """ONE engine-portable SQL expression computing the geohash cell of
    (lat, lon) at `precision` chars — floor/%/substr/concat only, so the
    IDENTICAL string runs as a Spark JVM column (via F.expr) and as the
    DuckDB oracle: bit-parity by construction instead of by reimplementation.

    Geohash = base32 of the bit-interleaved (lon, lat) cell indices, lon
    first; total bits 5·precision, lon gets the ceiling half."""
    if not 1 <= precision <= 8:
        raise ValueError("precision must be in [1, 8]")
    nbits = 5 * precision
    lonbits = (nbits + 1) // 2
    latbits = nbits // 2
    lon_cell = (
        f"LEAST(CAST(floor((({lon_sql}) + 180.0) / 360.0 * {1 << lonbits}) "
        f"AS BIGINT), {(1 << lonbits) - 1})"
    )
    lat_cell = (
        f"LEAST(CAST(floor((({lat_sql}) + 90.0) / 180.0 * {1 << latbits}) "
        f"AS BIGINT), {(1 << latbits) - 1})"
    )

    def bit(cell: str, b: int) -> str:  # bit b (0 = LSB) of the cell
        return f"(CAST(floor({cell} / {1 << b}) AS BIGINT) % 2)"

    chars = []
    for g in range(precision):
        terms = []
        for k in range(5):  # bit position j (0 = MSB of the interleave)
            j = 5 * g + k
            src, b = (
                (lon_cell, lonbits - 1 - j // 2)
                if j % 2 == 0
                else (lat_cell, latbits - 1 - (j - 1) // 2)
            )
            terms.append(f"{bit(src, b)} * {1 << (4 - k)}")
        idx = " + ".join(terms)
        chars.append(f"substr('{_GEOHASH_B32}', CAST({idx} AS INT) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def facet_geohash_grid(
    matches: DataFrame,
    corpus: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 4,
    n: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES geohash_grid aggregation: doc counts per geohash cell. The cell
    key is pure JVM column math (geohash_sql via F.expr — floor/%/substr
    only), then one grouped partial-agg pass; counts order
    (doc_count DESC, bucket ASC) like the terms agg."""
    joined = _match_join(matches, corpus, id_col)
    cell = F.expr(geohash_sql(lat_col, lon_col, precision))
    out = (
        joined.groupBy(cell.alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("bucket").asc())
    )
    return out.limit(n) if n is not None else out


def facet_diversified_sampler(
    matches: DataFrame,
    corpus: DataFrame,
    div_col: str,
    col: str,
    shard_size: int = 100,
    max_docs_per_value: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES diversified_sampler aggregation, DETERMINISTIC variant: like
    the sampler, but at most `max_docs_per_value` docs per `div_col`
    value survive (de-biasing the sample), chosen md5(id)-smallest within
    each value; then the md5-smallest `shard_size` of the survivors feed
    the sub-agg (terms counts over `col`).

    Plan: one bucket-partitioned row_number window (group-limit rewrite —
    no full per-group sort materialization), one TakeOrderedAndProject
    for the global cut, then the grouped count."""
    joined = _match_join(matches, corpus, id_col).select(
        F.col(id_col),
        F.col(div_col).alias("_div"),
        F.col(col).alias("_sub"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    )
    w = Window.partitionBy("_div").orderBy(F.col("_h").asc())
    sample = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_docs_per_value)
        .orderBy(F.col("_h").asc())
        .limit(shard_size)
    )
    return (
        sample.groupBy(F.col("_sub").alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("bucket").asc())
    )


def facet_serial_diff(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    metric_col: str,
    interval: str = "day",
    lag: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES serial_diff + normalize (percent_of_sum) pipeline aggs over a
    date_histogram of sum(metric): per bucket, value, value − value[−lag]
    (null for the first `lag` buckets, the ES shape), and value as a
    percentage of the series total. Window math over the BUCKET series
    only — the document pass happens once."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    joined = _match_join(matches, corpus, id_col)
    h = joined.groupBy(
        F.date_trunc(interval, F.col(date_col)).alias("bucket")
    ).agg(F.sum(F.col(metric_col).cast("double")).alias("value"))
    w = Window.orderBy(F.col("bucket").asc())
    return (
        h.select(
            "bucket",
            "value",
            (F.col("value") - F.lag("value", lag).over(w)).alias("diff"),
            (
                F.col("value") * 100.0
                / F.sum("value").over(
                    w.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
            ).alias("pct_of_sum"),
        )
        .orderBy(F.col("bucket").asc())
    )


def facet_cumulative_cardinality(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    key_col: str,
    interval: str = "day",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES cumulative_cardinality pipeline agg: per calendar bucket, the
    running count of DISTINCT keys seen so far (e.g. total unique users
    to date). Exact re-expression: a key contributes at its FIRST bucket,
    so one grouped min() pass per key, a count per first-bucket, and a
    cumulative window over the bucket series — never a distinct-union
    across buckets. Buckets with no activity keep the running total."""
    joined = _match_join(matches, corpus, id_col)
    b = F.date_trunc(interval, F.col(date_col))
    buckets = joined.groupBy(b.alias("bucket")).agg(
        F.count("*").alias("_n")
    ).select("bucket")
    firsts = (
        joined.groupBy(F.col(key_col).alias("_k"))
        .agg(F.min(b).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("new_keys"))
    )
    w = Window.orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        buckets.join(firsts, "bucket", "left")
        .select(
            "bucket", F.coalesce(F.col("new_keys"), F.lit(0)).alias("new_keys")
        )
        .withColumn("cumulative_cardinality", F.sum("new_keys").over(w))
        .orderBy(F.col("bucket").asc())
    )


def facet_bucket_sort(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    metric_col: str,
    size: int = 10,
    from_: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES bucket_sort pipeline agg: terms buckets with sum(metric),
    re-sorted by the metric (DESC, bucket ASC ties) and truncated with
    from/size — pagination over the BUCKET series (a window rank over
    aggregated buckets, never a second document pass)."""
    joined = _match_join(matches, corpus, id_col)
    h = joined.groupBy(F.col(col).alias("bucket")).agg(
        F.count("*").alias("doc_count"),
        F.sum(F.col(metric_col).cast("double")).alias("total"),
    )
    w = Window.orderBy(F.col("total").desc(), F.col("bucket").asc())
    return (
        h.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") > from_) & (F.col("_rn") <= from_ + size))
        .select("bucket", "doc_count", "total")
        .orderBy(F.col("total").desc(), F.col("bucket").asc())
    )


def facet_significant_text(
    matches: DataFrame,
    corpus: DataFrame,
    n: int | None = 10,
    sample_size: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_count: int = 3,
) -> DataFrame:
    """ES significant_text aggregation: significant_terms re-analyzed
    from the text of a SAMPLED foreground (ES recommends it under a
    sampler agg because re-analysis is costly; the deterministic
    md5-smallest sample makes that composition reproducible). Background
    stays the full corpus. Same percentage-score heuristic and ordering
    as significant_terms."""
    ids = matches.select(F.col(id_col)).distinct()
    sample = (
        ids.orderBy(F.md5(F.col(id_col).cast("string")).asc())
        .limit(sample_size)
    )
    return significant_terms(
        sample, corpus, n=n, text_col=text_col, id_col=id_col,
        min_doc_count=min_doc_count,
    )


def facet_variable_width_histogram(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    buckets: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES variable_width_histogram, DETERMINISTIC variant: ES's one-pass
    clustering is arrival-order dependent and unreproducible, so this
    engine defines the bucketing as equal-frequency clusters split at the
    exact interpolated i/k quantiles (documented deviation — same output
    shape: per-cluster min/max/avg/doc_count). Edge rule: value v lands
    in bucket #{edges <= v}.

    Plan: one tiny quantile agg (k−1 edge values to the driver —
    planning-level), then one bucket-index column pass + grouped
    moments."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    joined = _match_join(matches, corpus, id_col)
    v = F.col(col).cast("double")
    qs = [i / buckets for i in range(1, buckets)]
    edges = (
        list(
            joined.agg(
                F.percentile(v, F.array(*[F.lit(q) for q in qs])).alias("e")
            ).collect()[0]["e"]
        )
        if qs
        else []
    )
    idx = sum(
        (F.when(v >= F.lit(float(e)), 1).otherwise(0) for e in edges),
        F.lit(0),
    )
    return (
        joined.groupBy(idx.alias("bucket"))
        .agg(
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.avg(v).alias("avg"),
            F.count("*").alias("doc_count"),
        )
        .orderBy(F.col("bucket").asc())
    )


def facet_moving_percentiles(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    metric_col: str,
    interval: str = "day",
    window: int = 7,
    percent: float = 50.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES moving_percentiles pipeline agg, EXACT variant: per calendar
    bucket of sum(metric), the interpolated percentile over the trailing
    `window` buckets (current + window−1 preceding; partial at the
    series head, the moving_fn shape). ES computes it over t-digests —
    the exact interpolation here matches DuckDB's quantile_cont for the
    oracle; at 100 TB the same plan runs with percentile_approx.

    Window math over the BUCKET series only (one document pass, then a
    frame-bounded window aggregate)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    joined = _match_join(matches, corpus, id_col)
    h = joined.groupBy(
        F.date_trunc(interval, F.col(date_col)).alias("bucket")
    ).agg(F.sum(F.col(metric_col).cast("double")).alias("value"))
    w = (
        Window.orderBy(F.col("bucket").asc())
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    return (
        h.select(
            "bucket",
            "value",
            F.percentile(F.col("value"), F.lit(percent / 100.0))
            .over(w)
            .alias("moving_pct"),
        )
        .orderBy(F.col("bucket").asc())
    )


def facet_scripted_metric(
    matches: DataFrame,
    corpus: DataFrame,
    map_expr: str,
    combine: str = "sum",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES scripted_metric aggregation, re-expressed with the engine's
    script contract (same as script_score / update_by_query): `map_expr`
    is a SQL expression evaluated per matching document (the map_script),
    `combine` one of sum/avg/min/max/count (the combine+reduce scripts —
    Spark's partial aggregation IS the per-shard combine + coordinator
    reduce). Compiles via F.expr into whole-stage codegen — never a
    Python UDF; one partial-agg pass."""
    aggs = {
        "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
        "count": F.count,
    }
    if combine not in aggs:
        raise ValueError(f"unknown combine {combine!r}")
    joined = _match_join(matches, corpus, id_col)
    return joined.agg(
        aggs[combine](F.expr(map_expr).cast("double")).alias("value")
    )


def facet_sibling_stats(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    interval: str = "day",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES sibling pipeline aggregations — avg_bucket / sum_bucket /
    min_bucket / max_bucket / stats_bucket — over a date_histogram's
    doc counts, collapsed to ONE row (stats_bucket's shape; the four
    single-value siblings are its fields). The histogram is the usual
    partial-aggregated grouped pass over the match set; the sibling
    reduction is a second agg over BUCKET cardinality only (~365 rows a
    year even at 100 TB), so it adds no data-scale work."""
    hist = facet_date_histogram(matches, corpus, date_col, interval, id_col)
    return hist.agg(
        F.count("*").alias("n_buckets"),
        F.avg("doc_count").alias("avg_bucket"),
        F.sum("doc_count").alias("sum_bucket"),
        F.min("doc_count").alias("min_bucket"),
        F.max("doc_count").alias("max_bucket"),
    )


def ip_prefix_key_sql(subnet_sql: str, prefix_len: int) -> str:
    """Dotted-quad/len display key for an IPv4 subnet number — ONE
    portable SQL text evaluated verbatim by Spark (F.expr) and DuckDB,
    so the oracle matches bit-for-bit by construction (the geohash_sql
    pattern)."""
    return (
        f"concat(cast(floor(({subnet_sql}) / 16777216) % 256 as int), '.', "
        f"cast(floor(({subnet_sql}) / 65536) % 256 as int), '.', "
        f"cast(floor(({subnet_sql}) / 256) % 256 as int), '.', "
        f"cast(({subnet_sql}) % 256 as int), '/{prefix_len}')"
    )


def facet_ip_prefix(
    matches: DataFrame,
    corpus: DataFrame,
    ip_col: str,
    prefix_len: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ip_prefix aggregation (IPv4): buckets keyed by the
    `prefix_len`-bit network prefix. ipv4_to_long → one integer floor
    division gives the subnet number; the agg is ONE hash agg on the
    derived prefix (map-side partials; subnets partition the address
    space, so no inherent skew). Returns (subnet, subnet_num, doc_count),
    subnet_num ASC."""
    if not (0 < prefix_len <= 32):
        raise ValueError("prefix_len must be in 1..32")
    block = 2 ** (32 - prefix_len)
    joined = _match_join(matches, corpus, id_col)
    ipn = ipv4_to_long(F.col(ip_col))
    return (
        joined.withColumn(
            "subnet_num", (F.floor(ipn / block) * block).cast("long")
        )
        .groupBy("subnet_num")
        .agg(F.count("*").alias("doc_count"))
        .withColumn(
            "subnet", F.expr(ip_prefix_key_sql("subnet_num", prefix_len))
        )
        .select("subnet", "subnet_num", "doc_count")
        .orderBy(F.col("subnet_num").asc())
    )


def facet_children(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    group_col: str,
    value_col: str,
    parent_pred: "F.Column | None" = None,
) -> DataFrame:
    """ES children aggregation: parent buckets (terms on `group_col`)
    whose metrics aggregate over their CHILD documents — the join-field
    hop from parent to child. Plan: one equi-join parent→children on the
    parent key (AQE broadcasts the smaller side) + ONE hash agg on the
    bucket key; both partial-aggregated. Returns
    (group_col, child_count, sum_value), group ASC."""
    p = parents.where(parent_pred) if parent_pred is not None else parents
    j = p.select(F.col(parent_key), F.col(group_col)).join(
        children.select(
            F.col(child_key).alias(parent_key), F.col(value_col)
        ),
        parent_key,
    )
    return (
        j.groupBy(group_col)
        .agg(
            F.count("*").alias("child_count"),
            F.sum(value_col).alias("sum_value"),
        )
        .orderBy(F.col(group_col).asc())
    )


def facet_reverse_nested(
    nested: DataFrame, group_col: str, parent_key: str
) -> DataFrame:
    """ES reverse_nested: buckets over NESTED documents (terms on
    `group_col`) each also reporting the reverse_nested parent_count —
    how many distinct PARENT documents own those nested docs. One hash
    agg with an exact count-distinct (Spark expands it to two partial
    aggs; approx_count_distinct is the documented 100 TB swap-in, same
    as facet_cardinality)."""
    return (
        nested.groupBy(group_col)
        .agg(
            F.count("*").alias("doc_count"),
            F.countDistinct(parent_key).alias("parent_count"),
        )
        .orderBy(F.col(group_col).asc())
    )


def facet_categorize_text(
    matches: DataFrame,
    corpus: DataFrame,
    text_col: str,
    max_tokens: int = 4,
    min_doc_count: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES categorize_text aggregation, deterministic re-expression
    (documented deviation, same spirit as variable_width_histogram: ES
    runs a drain-style ML categorizer; a distributed engine needs a
    reproducible one). Tokens bearing any digit collapse to '<num>' and
    each message is keyed by its first `max_tokens` normalized tokens —
    the classic log-template signature. Pure JVM array lambdas + ONE
    hash agg on the category key. Returns (category, doc_count),
    doc_count DESC, category ASC."""
    joined = _match_join(matches, corpus, id_col)
    toks = F.split(F.col(text_col), " ")
    norm = F.transform(
        toks, lambda x: F.when(x.rlike("[0-9]"), F.lit("<num>")).otherwise(x)
    )
    cat = F.concat_ws(" ", F.slice(norm, 1, max_tokens))
    return (
        joined.groupBy(cat.alias("category"))
        .agg(F.count("*").alias("doc_count"))
        .where(F.col("doc_count") >= min_doc_count)
        .orderBy(F.col("doc_count").desc(), F.col("category").asc())
    )


def facet_change_point(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    value_col: str,
    interval: str = "day",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES change_point aggregation (deterministic re-expression of its
    step-change detector): over the per-bucket series of `value_col`,
    find the split maximizing |mean(before) − mean(after)| (pooled
    means). Returns ONE row (bucket = first bucket of the AFTER side,
    left_mean, right_mean, delta); ties break to the earliest bucket.

    The corpus-scale work is the bucket aggregation (partial-agged); the
    candidate scan is prefix-sum window math over BUCKET cardinality only
    (the facet_pipeline safety argument), and the totals side is a
    one-row cross join, not a driver collect."""
    hist = (
        _match_join(matches, corpus, id_col)
        .groupBy(F.date_trunc(interval, F.col(date_col)).alias("bucket"))
        .agg(F.sum(value_col).alias("v"), F.count("*").alias("c"))
    )
    w = (
        Window.orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = hist.agg(F.sum("v").alias("tv"), F.sum("c").alias("tc"))
    return (
        hist.withColumn("lv", F.sum("v").over(w))
        .withColumn("lc", F.sum("c").over(w))
        .where(F.col("lc").isNotNull())
        .crossJoin(totals)
        .withColumn("left_mean", F.col("lv") / F.col("lc"))
        .withColumn(
            "right_mean",
            (F.col("tv") - F.col("lv")) / (F.col("tc") - F.col("lc")),
        )
        .withColumn("delta", F.abs(F.col("right_mean") - F.col("left_mean")))
        .orderBy(F.col("delta").desc(), F.col("bucket").asc())
        .limit(1)
        .select("bucket", "left_mean", "right_mean", "delta")
    )


def facet_geo_line(
    df: DataFrame,
    group_col: str,
    lat_col: str,
    lon_col: str,
    sort_col: str,
    max_points: int = 10,
) -> DataFrame:
    """ES geo_line aggregation: per group, the track of (lon lat) points
    ordered by `sort_col`, truncated to `max_points` by that order (the
    ES size contract), rendered as WKT LINESTRING. Plan: the cap is a
    per-group window rank BEFORE the collect — the agg never
    materializes an unbounded track — then ONE hash agg collecting the
    bounded structs; array_sort on (sort, rank, lon, lat) fixes a
    deterministic point order. All JVM expressions."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(sort_col).asc(), F.col(lon_col).asc(), F.col(lat_col).asc()
    )
    pts = df.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= max_points
    )
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(sort_col).alias("s"),
                F.col("rn").alias("rn"),
                F.col(lon_col).alias("x"),
                F.col(lat_col).alias("y"),
            )
        )
    )
    line = F.concat(
        F.lit("LINESTRING ("),
        F.concat_ws(
            ", ",
            F.transform(
                arr,
                lambda p: F.concat_ws(
                    " ", p["x"].cast("string"), p["y"].cast("string")
                ),
            ),
        ),
        F.lit(")"),
    )
    return (
        pts.groupBy(group_col)
        .agg(line.alias("line"), F.count("*").alias("n_points"))
        .orderBy(F.col(group_col).asc())
    )


def collapse_inner_hits(
    scored: DataFrame,
    corpus: DataFrame,
    col: str,
    k: int | None = 10,
    inner_size: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES field collapsing WITH inner_hits: the global top-k collapsed
    groups (as collapse_topk), each expanded to its best `inner_size`
    members — (ckey, doc_id, score, rank), ordered by the group winner's
    (score DESC, doc_id ASC) then rank.

    Plan: ONE bucket-partitioned window pass ranks members inside every
    group (Spark's group-limit rewrite keeps it bounded — rank <=
    inner_size filters inside the window sort, no per-group
    materialization); the winners (rank 1) take the global
    TakeOrderedAndProject cut, and the inner hits attach by a broadcast
    semi join on the ≤ k winning keys — the corpus-scale side is ranked
    exactly once."""
    joined = corpus.select(F.col(id_col), F.col(col).alias("ckey")).join(
        scored.select(F.col(id_col), "score"), id_col
    )
    w = Window.partitionBy("ckey").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    ranked = joined.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= inner_size
    )
    winners = ranked.where(F.col("rank") == 1).select(
        "ckey",
        F.col("score").alias("_gscore"),
        F.col(id_col).alias("_gdoc"),
    )
    if k is not None:
        # ≤ k winners — broadcast the tiny side; with k=None the winner
        # set is one row PER GROUP (unbounded at scale), so leave the
        # join strategy to AQE rather than forcing a broadcast
        winners = F.broadcast(
            winners.orderBy(
                F.col("_gscore").desc(), F.col("_gdoc").asc()
            ).limit(k)
        )
    return (
        ranked.join(winners, "ckey")
        .orderBy(
            F.col("_gscore").desc(),
            F.col("_gdoc").asc(),
            F.col("rank").asc(),
        )
        .select("ckey", id_col, "score", "rank")
    )


def facet_percentiles_bucket(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    percents: list[float],
    interval: str = "day",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES percentiles_bucket sibling pipeline agg: exact interpolated
    percentiles of a date_histogram's doc counts — like
    facet_sibling_stats, the reduction runs over BUCKET cardinality only
    (tiny by construction); the interpolation is facet_percentiles'
    (Spark `percentile` == DuckDB `quantile_cont`). One row per requested
    percent, (percent, value), percent ASC."""
    hist = facet_date_histogram(matches, corpus, date_col, interval, id_col)
    v = F.col("doc_count").cast("double")
    aggs = [
        F.percentile(v, F.lit(p / 100.0)).alias(f"p{i}")
        for i, p in enumerate(percents)
    ]
    row = hist.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(float(p)).alias("percent"), F.col(f"p{i}").alias("value")
        )
        for i, p in enumerate(percents)
    ])
    return (
        row.select(F.explode(pairs).alias("x"))
        .select("x.percent", "x.value")
        .orderBy("percent")
    )


def bucket_correlation(
    matches: DataFrame,
    corpus: DataFrame,
    value_col: str,
    interval: float,
    indicator: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """ES bucket_correlation pipeline agg (count_correlation function):
    Pearson correlation between a histogram's per-bucket doc counts and a
    caller-supplied indicator array of the SAME length — the ES contract
    (indicator[i] pairs with bucket i; fewer/more buckets than indicator
    entries is an error there, here absent buckets count 0).

    Plan: one semi-join-restricted histogram (hash agg on the bucket key)
    densified against the indicator's index range (tiny literal range,
    no shuffle), then Spark's corr aggregate over BUCKET cardinality."""
    if len(indicator) < 2:
        raise ValueError("indicator needs >= 2 entries")
    spark = matches.sparkSession
    hist = (
        corpus.join(matches.select(id_col), id_col, "left_semi")
        .select(F.floor(F.col(value_col) / F.lit(float(interval))).alias("b"))
        .where((F.col("b") >= 0) & (F.col("b") < len(indicator)))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ind = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(indicator)], "b bigint, ind double"
    )
    dense = ind.join(hist, "b", "left").select(
        "b", F.coalesce(F.col("cnt"), F.lit(0)).cast("double").alias("cnt"),
        "ind",
    )
    return dense.agg(F.corr("cnt", "ind").alias("correlation"))


def facet_parent(
    children: DataFrame,
    parents: DataFrame,
    group_col: str,
    child_key: str,
    parent_key: str,
    value_col: str,
) -> DataFrame:
    """ES parent aggregation (the children agg's inverse hop): buckets on
    a CHILD field, metrics over the DISTINCT parent documents of each
    bucket's children — a parent reached through several children counts
    once (the ES join-field contract, same dedup rule as reverse_nested).

    Plan: equi-join child→parent on the key, ONE distinct-reduce on
    (bucket, parent) — the exact-dedup shuffle — then ONE hash agg on the
    bucket. Returns (group_col, parent_count, sum_value), group ASC."""
    j = children.select(F.col(group_col), F.col(child_key).alias("__pk")).join(
        parents.select(
            F.col(parent_key).alias("__pk"), F.col(value_col).alias("__v")
        ),
        "__pk",
    )
    uniq = j.select(group_col, "__pk", "__v").distinct()
    return (
        uniq.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("parent_count"),
            F.sum("__v").alias("sum_value"),
        )
        .orderBy(F.col(group_col).asc())
    )


def bucket_count_ks_test(
    matches: DataFrame,
    corpus: DataFrame,
    value_col: str,
    interval: float,
    n_buckets: int,
    fractions: list[float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES bucket_count_ks_test pipeline agg: the Kolmogorov–Smirnov
    statistic between a histogram's bucket-count distribution and an
    expected `fractions` distribution (uniform when omitted — the ES
    default), for the three alternatives (less / greater / two_sided =
    signed min / signed max / max abs ECDF difference).

    Plan: one semi-joined hash agg to bucket counts, densified over the
    literal bucket range, then window prefix-sums over BUCKET cardinality
    (tiny by construction) — no second pass over the corpus."""
    if fractions is None:
        fractions = [1.0 / n_buckets] * n_buckets
    if len(fractions) != n_buckets:
        raise ValueError("fractions must have one entry per bucket")
    tot_f = float(sum(fractions))
    if tot_f <= 0:
        raise ValueError("fractions must sum to a positive mass")
    spark = matches.sparkSession
    hist = (
        corpus.join(matches.select(id_col), id_col, "left_semi")
        .select(F.floor(F.col(value_col) / F.lit(float(interval))).alias("b"))
        .where((F.col("b") >= 0) & (F.col("b") < n_buckets))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    exp = spark.createDataFrame(
        [(i, float(f) / tot_f) for i, f in enumerate(fractions)],
        "b bigint, frac double",
    )
    dense = exp.join(hist, "b", "left").select(
        "b", F.coalesce(F.col("cnt"), F.lit(0.0)).alias("cnt"), "frac"
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()
    ecdf = (F.sum("cnt").over(w) / F.sum("cnt").over(total)).alias("ecdf")
    ccdf = F.sum("frac").over(w).alias("ccdf")
    diffs = dense.select(ecdf, ccdf).select(
        (F.col("ecdf") - F.col("ccdf")).alias("d")
    )
    return diffs.agg(
        (-F.min("d")).alias("less"),
        F.max("d").alias("greater"),
        F.max(F.abs(F.col("d"))).alias("two_sided"),
    )


def facet_terms_partition(
    matches: DataFrame,
    corpus: DataFrame,
    text_col: str,
    partition: int,
    num_partitions: int,
    n: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES terms agg with `include: {partition, num_partitions}` — the
    paginate-a-huge-keyspace contract: worker p of P aggregates only the
    terms hashing to its partition, so P coordinated requests cover every
    term exactly once with bounded per-response size. ES hashes with
    murmur; the engine contract is the cross-engine 60-bit md5
    (operators/texthash.py), deterministic across runs and engines.

    Plan: the partition predicate filters AFTER tokenization but BEFORE
    the count shuffle — only 1/P of the (doc, term) pairs move."""
    from elasticsearch_assets_spark.operators.texthash import (
        hash60_expr,
        tokens_expr,
    )

    if not (0 <= partition < num_partitions):
        raise ValueError("partition must be in [0, num_partitions)")
    toks = (
        corpus.join(matches.select(id_col), id_col, "left_semi")
        .select(F.explode(F.array_distinct(tokens_expr(text_col))).alias("term"))
        .where((hash60_expr(F.col("term")) % num_partitions) == partition)
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("term").asc())
        .limit(n)
    )


def facet_histogram_bounds(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    interval: float,
    *,
    offset: float = 0.0,
    extended_lo: float,
    extended_hi: float,
    hard_lo: float | None = None,
    hard_hi: float | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES histogram with `offset`, `extended_bounds`, `hard_bounds`, and
    min_doc_count=0: bucket key = floor((value - offset) / interval) *
    interval + offset, and EVERY bucket between the extended bounds
    appears (zero-count rows included) — the Kibana-chart contract
    facet_histogram's min_doc_count=1 shape can't give.

    `hard_bounds` (ES 7.10) CLIPS the bucket space: buckets whose key
    falls outside [hard_lo, hard_hi] are not returned, and values outside
    never create buckets — ES's guard against a runaway bucket explosion
    from one outlier value; the predicate lands BEFORE the count shuffle,
    so the guard also caps the shuffle. extended_bounds can only widen
    INSIDE the hard bounds (the ES contract).

    Plan: the counted histogram is the usual semi-join + hash agg; the
    dense bucket spine is a literal sequence (O(buckets) rows, broadcast)
    LEFT-joined to it — no second corpus pass."""
    if interval <= 0:
        raise ValueError("interval must be positive")
    if extended_hi < extended_lo:
        raise ValueError("extended bounds must be ordered")
    if (hard_lo is None) != (hard_hi is None):
        raise ValueError("hard_bounds needs both lo and hi")
    spark = matches.sparkSession
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    key = (
        F.floor((F.col(col) - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
        + F.lit(offset)
    ).cast("double")
    import math

    if hard_lo is not None:
        if hard_hi < hard_lo:
            raise ValueError("hard bounds must be ordered")
        # bucket-key clip, evaluated before the count shuffle
        hk_lo = math.floor((hard_lo - offset) / interval) * interval + offset
        hk_hi = math.floor((hard_hi - offset) / interval) * interval + offset
        joined = joined.where(
            (key >= F.lit(hk_lo)) & (key <= F.lit(hk_hi))
        )
        extended_lo = max(extended_lo, hard_lo)
        extended_hi = min(extended_hi, hard_hi)
    hist = joined.groupBy(key.alias("bucket")).agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    lo_k = math.floor((extended_lo - offset) / interval)
    hi_k = math.floor((extended_hi - offset) / interval)
    spine = spark.createDataFrame(
        [(float(k * interval + offset),) for k in range(lo_k, hi_k + 1)],
        "bucket double",
    )
    return (
        spine.join(hist, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("doc_count"), F.lit(0)).cast("long").alias(
                "doc_count"
            ),
        )
        .orderBy(F.col("bucket").asc())
    )


def moving_fn(
    series: DataFrame,
    fn: str = "linearWeightedAvg",
    window: int = 3,
    alpha: float = 0.5,
    beta: float = 0.5,
    gamma: float = 0.5,
    period: int = 3,
    value_col: str = "doc_count",
    order_col: str = "bucket",
) -> DataFrame:
    """ES moving_fn pipeline agg (the MovingFunctions builtins beyond the
    plain avg facet_pipeline carries): linearWeightedAvg and ewma over a
    trailing window of the bucket series, current bucket included.

      linearWeightedAvg = sum(v_i * i) / sum(i),  i = 1..n oldest-first
      ewma              = fold: first value, then a*v + (1-a)*acc

    holt (double exponential smoothing, linear trend) folds the window
    oldest-first with level/trend state and returns the one-step forecast
    s_n + b_n; initialization is s_1 = v_1, b_1 = 0 (documented contract —
    with beta=0 holt therefore reduces exactly to ewma):

      s_i = a*v_i + (1-a)*(s_{i-1} + b_{i-1})
      b_i = beta*(s_i - s_{i-1}) + (1-beta)*b_{i-1}

    `series` is any (order_col, value_col) bucket frame (ES buckets_path
    semantics — pipeline aggs see the bucket series, not the documents).
    The window list is collected per row over a rows-frame and folded
    with F.aggregate — sequential float64, so an oracle folding the same
    order is bit-identical (alpha = 0.5 keeps every product exactly
    representable, which the contract row exploits; DuckDB's list_reduce
    carries the same struct state). Bucket cardinality bounds the window
    input, so the single global sort is safe by the same argument as
    facet_pipeline."""
    _SIMPLE_FNS = {
        "min": F.min,
        "max": F.max,
        "sum": F.sum,
        "unweightedAvg": F.avg,
        "stdDev": F.stddev_pop,
    }
    if fn not in (
        "linearWeightedAvg", "ewma", "holt", "holtWinters", *_SIMPLE_FNS
    ):
        raise ValueError(f"unsupported moving_fn {fn!r}")
    if window < 1:
        raise ValueError("window must be >= 1")
    w = Window.orderBy(F.col(order_col).asc()).rowsBetween(-(window - 1), 0)
    v = F.col(value_col).cast("double")
    if fn in _SIMPLE_FNS:
        # order-free builtins compile to the window aggregate directly —
        # no frame materialization, one WindowExec pass
        return (
            series.withColumn(fn, _SIMPLE_FNS[fn](v).over(w))
            .orderBy(F.col(order_col).asc())
        )
    frame = F.collect_list(v).over(w)
    if fn == "linearWeightedAvg":
        n = F.size(F.col("_frame")).cast("double")
        num = F.aggregate(
            F.zip_with(
                F.col("_frame"),
                F.sequence(F.lit(1), F.size(F.col("_frame"))),
                lambda x, i: x * i.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out_col = num / (n * (n + 1.0) / 2.0)
    elif fn == "holt":
        a, bt = float(alpha), float(beta)
        init = F.struct(
            F.element_at(F.col("_frame"), 1).alias("s"),
            F.lit(0.0).alias("b"),
        )
        rest = F.slice(
            F.col("_frame"),
            F.lit(2),
            F.greatest(F.size(F.col("_frame")) - 1, F.lit(0)),
        )
        # trend folds in the algebraically-reduced one-multiply form
        # b' = a*bt*(x - s) + (1 - a*bt)*b  (== bt*(s' - s) + (1-bt)*b in
        # exact arithmetic) — both engines share this op order exactly,
        # and it sidesteps a DuckDB 1.0 list_reduce miscompute when a
        # struct lambda field repeats the other field's subexpression
        ab = a * bt
        folded = F.aggregate(
            rest,
            init,
            lambda acc, x: F.struct(
                (a * x + (1.0 - a) * (acc["s"] + acc["b"])).alias("s"),
                (ab * (x - acc["s"]) + (1.0 - ab) * acc["b"]).alias("b"),
            ),
        )
        out_col = folded["s"] + folded["b"]
    elif fn == "holtWinters":
        # ADDITIVE Holt-Winters (ES type="add"), zero-initialized seasonal
        # indices (documented deviation from ES's padded multiplicative
        # default — zero init makes multiplicative degenerate anyway).
        # State is a flat array<double> [i, s, b, c_0..c_{p-1}] so the
        # DuckDB twin can replay the identical fold with list state; every
        # recurrence references PRE-step state only (the reduced trend
        # form from holt; c expands s_new inline), so both engines share
        # the op order exactly:
        #   s' = a*(v - c_j) + (1-a)*(s + b)
        #   b' = a*bt*(v - c_j - s) + (1 - a*bt)*b
        #   c_j' = g*(v - (a*(v - c_j) + (1-a)*(s + b))) + (1-g)*c_j
        # forecast (returned) = s + b + c_{n mod p}
        a, bt, g, p = float(alpha), float(beta), float(gamma), int(period)
        if p < 1:
            raise ValueError("period must be >= 1")
        ab = a * bt
        init = F.concat(
            F.array(F.lit(1.0), F.element_at(F.col("_frame"), 1), F.lit(0.0)),
            F.array_repeat(F.lit(0.0), p),
        )
        rest = F.slice(
            F.col("_frame"), F.lit(2),
            F.greatest(F.size(F.col("_frame")) - 1, F.lit(0)),
        )

        def _hw_merge(acc, x):
            i = F.element_at(acc, 1)
            s, b = F.element_at(acc, 2), F.element_at(acc, 3)
            j = (i.cast("long") % p).cast("int")  # 0-based seasonal slot
            c = F.element_at(acc, j + F.lit(4))
            s_new = a * (x - c) + (1.0 - a) * (s + b)
            b_new = ab * (x - c - s) + (1.0 - ab) * b
            c_new = g * (x - (a * (x - c) + (1.0 - a) * (s + b))) + (1.0 - g) * c
            seas = F.transform(
                F.slice(acc, 4, p),
                lambda cv, k: F.when(k == j, c_new).otherwise(cv),
            )
            return F.concat(F.array(i + 1.0, s_new, b_new), seas)

        folded = F.aggregate(rest, init, _hw_merge)
        n_mod = (F.element_at(folded, 1).cast("long") % p).cast("int")
        out_col = (
            F.element_at(folded, 2) + F.element_at(folded, 3)
            + F.element_at(folded, n_mod + F.lit(4))
        )
    else:
        a = float(alpha)
        out_col = F.aggregate(
            F.col("_frame"),
            F.lit(None).cast("double"),
            lambda acc, x: F.coalesce(a * x + (1.0 - a) * acc, x),
        )
    return (
        series.withColumn("_frame", frame)
        .withColumn(fn, out_col)
        .drop("_frame")
        .orderBy(F.col(order_col).asc())
    )


def counter_rate(
    df: DataFrame,
    ts_col: str,
    counter_col: str,
    series_cols: "list[str]",
    bucket_seconds: int = 3600,
    order_tiebreak: "str | None" = None,
) -> DataFrame:
    """ES TSDB `rate` over a counter metric (8.7 time-series aggs), the
    Prometheus counter contract: per time series and time bucket, the
    counter's increase per second with RESETS compensated — a drop in
    the counter means it restarted, so the post-reset value IS the
    increase across that step.

      delta_i    = v_i - v_{i-1} within (series, bucket), ts order
      increase   = sum( delta_i if delta_i >= 0 else v_i ), first
                   sample of the bucket contributes 0
      rate       = increase / bucket_seconds

    One window pass partitioned by (series, bucket) + one hash agg on
    the same key — the shuffle is keyed by series x bucket, so a
    million-series corpus spreads evenly; no global sort anywhere.
    The bucket is the tz-free epoch floor (timestampdiff/timestampadd
    against a literal origin — the session zone cancels, CLAUDE.md)."""
    if not series_cols:
        raise ValueError("counter_rate needs at least one series column")
    origin = "TIMESTAMP '1970-01-01 00:00:00'"
    bucket = (
        f"timestampadd(SECOND, CAST(floor(timestampdiff(SECOND, {origin}, "
        f"{ts_col}) / {int(bucket_seconds)}) * {int(bucket_seconds)} AS "
        f"BIGINT), {origin})"
    )
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    staged = df.withColumn("_bucket", F.expr(bucket))
    w = Window.partitionBy(*series_cols, "_bucket").orderBy(*order)
    v = F.col(counter_col).cast("double")
    delta = v - F.lag(v, 1).over(w)
    contrib = (
        F.when(delta.isNull(), F.lit(0.0))
        .when(delta >= 0, delta)
        .otherwise(v)  # reset: the restarted counter's value
    )
    return (
        staged.withColumn("_contrib", contrib)
        .groupBy(*series_cols, F.col("_bucket").alias("bucket"))
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("_contrib").alias("increase"),
            (F.sum("_contrib") / float(bucket_seconds)).alias("rate"),
        )
        .orderBy(*series_cols, "bucket")
    )


def facet_terms_sharded(
    corpus: DataFrame,
    col: str,
    n: int,
    *,
    n_shards: int = 4,
    shard_size: int | None = None,
    matches: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES's ACTUAL distributed terms aggregation with its accuracy
    contract: each shard contributes only its top `shard_size` buckets,
    the coordinator merges those partial lists, and every returned bucket
    carries `doc_count_error_upper_bound` — the sum, over shards that did
    NOT report the bucket, of that shard's smallest returned count (the
    bucket could hide just below each missing shard's cut; a shard that
    returned ALL its buckets hides nothing and contributes 0). This is the
    agg the reference's users actually run against ES (terms agg docs,
    `shard_size` / `doc_count_error_upper_bound`); `facet_counts` is this
    engine's exact upgrade.

    Scale rationale: the exact variant shuffles every (bucket, partial
    count) pair — fine for bounded vocabularies, unbounded for high-
    cardinality buckets at 10^12 docs. Here the per-shard window cuts each
    shard's contribution to `shard_size` rows BEFORE the merge, so the
    coordinator-side work is O(n_shards × shard_size) regardless of bucket
    cardinality, and the error bound tells the caller exactly what that
    truncation may have cost — the ES trade, reproduced bit-for-bit
    (DuckDB oracle `facet_terms_sharded`).

    Shard identity = hash60(id string) % n_shards, the routing hash
    (query/routing.py), shared verbatim with the oracle. Default
    shard_size = n * 1.5 + 10, the ES default."""
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    if shard_size is None:
        shard_size = int(n * 1.5 + 10)
    base = corpus
    if matches is not None:
        base = corpus.join(
            matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
    per = (
        base.select(
            (hash60_expr(F.col(id_col).cast("string")) % n_shards).alias(
                "shard"
            ),
            F.col(col).alias("bucket"),
        )
        .groupBy("shard", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("cnt").desc(), F.col("bucket").asc()
    )
    top = per.withColumn("_r", F.row_number().over(w)).where(
        F.col("_r") <= shard_size
    )
    floors = (
        top.groupBy("shard")
        .agg(F.min("cnt").alias("flr"), F.count("*").alias("rows"))
        .select(
            "shard",
            F.when(F.col("rows") == shard_size, F.col("flr"))
            .otherwise(F.lit(0))
            .alias("flr"),
        )
    )
    total = floors.agg(F.coalesce(F.sum("flr"), F.lit(0)).alias("tot"))
    merged = (
        top.join(floors, "shard")
        .groupBy("bucket")
        .agg(
            F.sum("cnt").alias("doc_count"),
            F.sum("flr").alias("rep"),
        )
    )
    return (
        merged.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.col("doc_count").cast("long").alias("doc_count"),
            (F.col("tot") - F.col("rep"))
            .cast("long")
            .alias("doc_count_error_upper_bound"),
        )
        .orderBy(F.col("doc_count").desc(), F.col("bucket").asc())
        .limit(n)
    )


def facet_extended_stats_bucket(
    matches: DataFrame,
    corpus: DataFrame,
    date_col: str,
    interval: str = "day",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES extended_stats_bucket sibling pipeline agg: facet_sibling_stats
    plus sum_of_squares, population variance, std_deviation, and the
    ±2σ bounds ES reports. The bucket counts are integers, so n / sum /
    sum_of_squares are EXACT integer aggregates; the float math is a
    single projection over the one-row reduction (the int-sum-then-divide
    doctrine — both engines see identical inputs to identical float
    expressions). Reduction cost: bucket cardinality only."""
    hist = facet_date_histogram(matches, corpus, date_col, interval, id_col)
    base = hist.agg(
        F.count("*").alias("n_buckets"),
        F.sum("doc_count").alias("sum_bucket"),
        F.min("doc_count").alias("min_bucket"),
        F.max("doc_count").alias("max_bucket"),
        F.sum(F.col("doc_count") * F.col("doc_count")).alias("sum_of_squares"),
    )
    n = F.col("n_buckets").cast("double")
    s = F.col("sum_bucket").cast("double")
    ss = F.col("sum_of_squares").cast("double")
    avg = s / n
    variance = ss / n - (s / n) * (s / n)
    std = F.sqrt(variance)
    return base.select(
        "n_buckets", "sum_bucket", "min_bucket", "max_bucket",
        "sum_of_squares",
        avg.alias("avg_bucket"),
        variance.alias("variance"),
        std.alias("std_deviation"),
        (avg + F.lit(2.0) * std).alias("std_upper"),
        (avg - F.lit(2.0) * std).alias("std_lower"),
    )


def facet_counts_regex(
    matches: DataFrame,
    corpus: DataFrame,
    col: str,
    n: int | None = None,
    *,
    include_re: str | None = None,
    exclude_re: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES terms agg `include` / `exclude` regex knobs: bucket values are
    whole-string matched (Lucene RegExp anchoring) against `include_re`
    and then `exclude_re` BEFORE the count shuffle — the filter prunes the
    agg's key space, it never post-filters the page (ES semantics: the
    regexes define the candidate bucket universe). Patterns stay inside
    the Java-regex ∩ RE2 dialect so the DuckDB twin matches verbatim."""
    joined = corpus.join(
        matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
    )
    v = F.col(col)
    if include_re is not None:
        joined = joined.where(v.rlike(f"^(?:{include_re})$"))
    if exclude_re is not None:
        joined = joined.where(~v.rlike(f"^(?:{exclude_re})$"))
    out = (
        joined.groupBy(v.alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("bucket").asc())
    )
    return out.limit(n) if n is not None else out


def facet_tree(
    matches: "DataFrame | None",
    corpus: DataFrame,
    levels: "list[dict]",
    id_col: str = "doc_id",
) -> "dict[int, DataFrame]":
    """Arbitrary LINEAR bucket-agg chain with per-level metric children in
    ONE shuffle (round-5: the generalized `aggs` tree executor behind
    query/dsl.aggs_dsl). The chain compiles to a ROLLUP aggregation —
    grouping sets (k0), (k0,k1), ..., (k0..kn-1) — so every level's
    buckets AND every level's metrics come out of a single Expand +
    hash-aggregate pass over the match set, the execution shape ES uses
    for nested aggs (sub-aggs are extra collectors on the same pass,
    never a second scan). At 100 TB the scan dominates: n levels cost one
    scan and one shuffle of (n+1)-way expanded key rows, versus n scans
    for the naive per-level plan.

    ``levels``: one dict per bucket level, outermost first —
      name      output column name for the level's key
      key       non-null Column keying the bucket (terms value, histogram
                floor, date_trunc, range index, ...)
      explode   instead of `key`: an ARRAY Column exploded into the key
                (the `filters` agg — a doc lands in every matching
                bucket, the ES overlapping-buckets contract)
      drop_null drop rows whose key is null before grouping (default
                True — the ES missing-field behavior for every bucket
                agg; pre-coalesce the key for `missing` semantics)
      metrics   [(out_name, agg Column)] computed grouped by the key
                prefix up to THIS level (extra partials on the shared
                rollup, zero extra passes)
      size      ES terms `size`: keep the top-N buckets PER PARENT
                bucket (row_number window over the parent prefix — the
                QUALIFY shape; descendant levels of eliminated buckets
                drop via a broadcast semi join on the survivor prefix,
                which is bucket-cardinality sized by construction)
      order     (by, ascending) for the size cut: "_count" (default),
                "_key", or one of this level's metric out_names

    Returns {level_index: frame}: frame i has the level-0..i key columns
    (named per level), `doc_count`, and level i's metric columns. The
    window in a level-0 size cut is global but runs over bucket
    cardinality, not doc cardinality — the facet_pipeline safety
    argument.

    Documented deviation (the rollup contract): drop_null applies to the
    SHARED input, so ancestor buckets count only docs carrying every
    descendant bucket key — ES keeps a doc whose child field is null in
    the PARENT's doc_count while dropping it from child buckets. Set the
    child terms' `missing` (coalesce before grouping, the ES-recommended
    spelling) to retain those docs everywhere. Similarly, levels above an
    `explode` (filters) level see exploded rows — the DSL compiler
    refuses metric/size/min_doc_count consumers there."""
    joined = corpus
    if matches is not None:
        joined = corpus.join(
            matches.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
    n = len(levels)
    if n == 0:
        raise ValueError("facet_tree needs at least one bucket level")
    kcols = [f"_k{i}" for i in range(n)]
    cur = joined
    for i, lv in enumerate(levels):
        if lv.get("explode") is not None:
            cur = cur.withColumn(kcols[i], F.explode(lv["explode"]))
        else:
            cur = cur.withColumn(kcols[i], lv["key"])
        if lv.get("drop_null", True):
            cur = cur.where(F.col(kcols[i]).isNotNull())
        if lv.get("include_re") is not None:
            cur = cur.where(
                F.col(kcols[i]).rlike(f"^(?:{lv['include_re']})$")
            )
        if lv.get("exclude_re") is not None:
            cur = cur.where(
                ~F.col(kcols[i]).rlike(f"^(?:{lv['exclude_re']})$")
            )
    aggs: list = [F.grouping_id().alias("_gid"), F.count(F.lit(1)).alias("_cnt")]
    placed: list[tuple[int, str, str]] = []  # (level, out_name, alias)
    for i, lv in enumerate(levels):
        for out_name, expr in lv.get("metrics", []):
            alias = f"_m{len(placed)}"
            aggs.append(expr.alias(alias))
            placed.append((i, out_name, alias))
    rolled = cur.rollup(*[F.col(c) for c in kcols]).agg(*aggs)

    out: dict[int, DataFrame] = {}
    survivors: "DataFrame | None" = None
    surv_keys: list[str] = []
    for i, lv in enumerate(levels):
        gid = (1 << (n - 1 - i)) - 1
        names = [levels[j]["name"] for j in range(i + 1)]
        sel = [F.col(kcols[j]).alias(names[j]) for j in range(i + 1)]
        sel.append(F.col("_cnt").alias("doc_count"))
        for li, out_name, alias in placed:
            if li == i:
                sel.append(F.col(alias).alias(out_name))
        f = rolled.where(F.col("_gid") == gid).select(*sel)
        if survivors is not None:
            f = f.join(F.broadcast(survivors), surv_keys, "left_semi")
        if lv.get("min_doc_count") is not None and int(lv["min_doc_count"]) > 1:
            # ES min_doc_count: buckets below the floor drop BEFORE the
            # size cut, and their descendants prune with them
            f = f.where(F.col("doc_count") >= int(lv["min_doc_count"]))
            survivors = f.select(*names)
            surv_keys = names
        if lv.get("size") is not None:
            by, asc = lv.get("order") or ("_count", False)
            if by == "_count":
                oc = F.col("doc_count")
            elif by == "_key":
                oc = F.col(lv["name"])
            else:
                if by not in {o for li2, o, _ in placed if li2 == i}:
                    raise ValueError(
                        f"order target {by!r} is not a metric of level "
                        f"{lv['name']!r}"
                    )
                oc = F.col(by)
            w = Window.partitionBy(*names[:-1]).orderBy(
                oc.asc() if asc else oc.desc(), F.col(lv["name"]).asc()
            )
            f = (
                f.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= int(lv["size"]))
                .drop("_rn")
            )
            survivors = f.select(*names)
            surv_keys = names
        out[i] = f.orderBy(*[F.col(c).asc() for c in names])
    return out
