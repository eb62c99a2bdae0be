"""Deterministic stratified (mixture) sampling for training-corpus
assembly: keep each row with a per-stratum probability, decided by a salted
hash of the row id — the reproducible mixture-weighting step when blending
heterogeneous sources (rates per language / source / quality band) into a
training set.

Why hash-cut instead of rand(): exactly reproducible across engines, runs,
and retries (idempotent under re-execution — the property every resumable
pipeline needs), and it is a pure JVM filter on the scan — zero shuffle,
composes with any downstream op at 10^12 rows.

The rate comparison is done on the md5 hex prefix AS A STRING against a
precomputed per-stratum threshold (floor(rate·16^8) in 8-digit hex):
string-compare of fixed-width lowercase hex == numeric compare, and both
Spark and DuckDB produce identical lowercase md5 hex — so the oracle
matches bit-for-bit with no hex→int conversion (which the engines spell
differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rate_threshold_hex(rate: float) -> str:
    """8-hex-digit cut for `rate` in [0, 1]; 'g' (> every hex digit) for
    rate >= 1 so the filter keeps everything."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16**8), "08x")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff md5(salt|id)[0:8] < its stratum's threshold.
    Strata missing from `rates` fall back to `default_rate`. Returns the
    input rows that survive, unchanged."""
    thr = {k: rate_threshold_hex(v) for k, v in rates.items()}
    tmap = F.create_map(*[F.lit(x) for kv in thr.items() for x in kv])
    h = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        1, 8,
    )
    cut = F.coalesce(
        F.element_at(tmap, F.col(strata_col)),
        F.lit(rate_threshold_hex(default_rate)),
    )
    return df.where(h < cut)


def sample_filter_sql(
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 0.0,
) -> str:
    """The SAME filter as DuckDB SQL (for oracles): identical md5 input
    string, identical thresholds."""
    cases = " ".join(
        f"WHEN '{k}' THEN '{rate_threshold_hex(v)}'"
        for k, v in sorted(rates.items())
    )
    return (
        f"substr(md5(concat('{salt}', '|', {id_col}::VARCHAR)), 1, 8) < "
        f"(CASE {strata_col} {cases} ELSE '{rate_threshold_hex(default_rate)}' END)"
    )


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    tokens_col: str,
    tau: float,
    token_budget: int,
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual/domain
    rebalancing rule of modern LM data recipes): stratum s gets sampling
    weight n_s^tau / Σ n^tau — tau=1 is natural proportions, tau→0 is
    uniform — and a per-stratum rate = weight · budget / n_s that feeds
    stratified_sample (rate <= 1) or upsample (rate > 1).

    Runs over the corpus-accounting table (O(strata) rows): one window
    normalization, planning-scale."""
    from pyspark.sql import Window

    if tau < 0:
        raise ValueError("tau must be >= 0")
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    n = F.col(tokens_col).cast("double")
    w = Window.partitionBy()
    weight = F.pow(n, F.lit(float(tau))) / F.sum(
        F.pow(n, F.lit(float(tau)))
    ).over(w)
    target = weight * F.lit(float(token_budget))
    return df.select(
        F.col(strata_col),
        F.col(tokens_col),
        weight.alias("weight"),
        target.alias("target_tokens"),
        (target / n).alias("rate"),
    )


def token_budget_plan(
    df: DataFrame,
    weights: "dict[str, float]",
    token_budget: int,
    *,
    max_epochs: float = 5.0,
    strata_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """The data-recipe sizing step (Llama/GPT-style): given the corpus
    accounting table, EXPLICIT target mixture weights, a total token
    budget, and a repetition cap, compute per-source sampling rates:

      target_s  = budget * w_s / sum(w)
      rate_s    = min(target_s / avail_s, max_epochs)   (epoch cap —
                  repeating a small source past a few epochs stops
                  helping; Muennighoff et al. 2023)
      achieved  = rate_s * avail_s,  deficit = target_s - achieved

    Single-pass by design: a deficit is REPORTED, not silently
    redistributed — re-run with adjusted weights to rebalance (silent
    redistribution changes the recipe the caller asked for). Rates feed
    stratified_sample (rate <= 1) / upsample (rate > 1). O(strata) rows,
    planning-scale; unknown sources in `weights` raise."""
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    if not weights:
        raise ValueError("weights must be non-empty")
    known = {r[0] for r in df.select(strata_col).distinct().collect()}
    unknown = sorted(set(weights) - known)
    if unknown:
        raise ValueError(f"weights name unknown strata: {unknown}")
    wsum = float(sum(weights.values()))
    mapping = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    w = mapping[F.col(strata_col)].cast("double") / wsum
    avail = F.col(tokens_col).cast("double")
    target = w * float(token_budget)
    rate = F.least(target / avail, F.lit(float(max_epochs)))
    achieved = rate * avail
    return (
        df.where(F.col(strata_col).isin(list(weights)))
        .select(
            F.col(strata_col),
            F.col(tokens_col),
            w.alias("weight"),
            target.alias("target_tokens"),
            rate.alias("rate"),
            achieved.alias("achieved_tokens"),
            (target - achieved).alias("deficit_tokens"),
        )
    )


def upsample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    salt: str = "up",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic fractional REPLICATION (rates may exceed 1 — the
    upsampling half of mixture application; stratified_sample is the
    downsampling half): a row in stratum s with rate r emits floor(r)
    copies plus one more iff md5(salt|id)[0:8] < the hex threshold of
    frac(r) — so expected copies = r exactly, per-row decisions are a
    pure function of (salt, id), and retries/repartitions replay
    identically. Output adds a `copy` index column (0-based); rows whose
    count lands on 0 disappear (r < 1 behaves like sampling).

    Plan: one JVM expression computes the per-row count, one posexplode
    materializes the copies — no shuffle, no Python. Hex thresholds are
    PRECOMPUTED strings per stratum (CLAUDE.md: never convert hex in
    SQL), so the DuckDB twin is verbatim."""
    import math

    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"negative rate for stratum {s!r}")
    if default_rate < 0:
        raise ValueError("negative default_rate")

    def parts(r: float) -> tuple[int, str]:
        base = int(math.floor(r))
        return base, rate_threshold_hex(r - base)

    base_map, thr_map = {}, {}
    for s, r in rates.items():
        base_map[s], thr_map[s] = parts(r)
    dbase, dthr = parts(default_rate)
    bmap = F.create_map(*[F.lit(x) for kv in base_map.items() for x in kv])
    tmap = F.create_map(*[F.lit(x) for kv in thr_map.items() for x in kv])
    h = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        1, 8,
    )
    base = F.coalesce(
        F.element_at(bmap, F.col(strata_col)), F.lit(dbase)
    ).cast("int")
    thr = F.coalesce(F.element_at(tmap, F.col(strata_col)), F.lit(dthr))
    n_copies = base + F.when(h < thr, 1).otherwise(0)
    out = df.withColumn("_n", n_copies).where(F.col("_n") >= 1)
    return out.select(
        "*", F.posexplode(F.sequence(F.lit(1), F.col("_n"))).alias("copy", "_x")
    ).drop("_n", "_x")


def cluster_split(
    clusters: DataFrame,
    holdout_rate: float,
    *,
    salt: str = "split",
    id_col: str = "doc_id",
    rep_col: str = "rep",
) -> DataFrame:
    """Leakage-free train/holdout split: the deterministic md5 cut keys
    on the near-dup CLUSTER REPRESENTATIVE, never the document — every
    member of a duplicate cluster lands in the SAME split, closing the
    train/eval contamination channel a per-document split leaves open
    (a holdout doc's near-copy sitting in train). `clusters` is
    dedup_clusters' (id, rep) output (singletons carry rep = own id).
    Adds `split` in {'train','holdout'}; pure expression, zero shuffle,
    replayable under retries like every md5 cut in this module."""
    if not (0.0 <= holdout_rate <= 1.0):
        raise ValueError("holdout_rate must be in [0, 1]")
    thr = rate_threshold_hex(holdout_rate)
    h = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(rep_col).cast("string"))),
        1, 8,
    )
    return clusters.select(
        F.col(id_col), F.col(rep_col),
        F.when(h < thr, F.lit("holdout")).otherwise(F.lit("train")).alias(
            "split"
        ),
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    ascending: bool = True,
    salt: str = "cur",
) -> DataFrame:
    """Deterministic training-order assignment: docs land in one of
    `n_shards` output shards by salted md5 (reproducible across engines,
    runs, and retries — the same contract as stratified_sample), and
    within a shard are ordered easy-to-hard by `score_col` (curriculum
    learning, Bengio et al. 2009; ties break by id). Returns
    (id, shard, position) with position 1..len(shard).

    Plan: the shard key is a pure JVM expression on the scan; the
    ordering is ONE window partitioned by shard — at 10^12 docs each
    shard sorts independently (shard count = writer parallelism), there
    is no global sort anywhere."""
    if n_shards < 1:
        raise ValueError("need n_shards >= 1")
    h = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    # first 8 hex digits mod shards, via substring arithmetic kept in
    # hex-string space per digit (hex->int conversion is not portable;
    # per-digit position math is): use conv on Spark ONLY — instead key
    # the shard by comparing against n_shards equal hex cut points so
    # both engines share the text
    cuts = [format(int(i * 16**8 / n_shards), "08x") for i in range(1, n_shards)]
    shard = F.lit(0)
    for i, c in enumerate(cuts, start=1):
        shard = F.when(F.substring(h, 1, 8) >= c, F.lit(i)).otherwise(shard)
    w = (
        "row_number() OVER (PARTITION BY shard ORDER BY "
        f"{score_col} {'ASC' if ascending else 'DESC'}, {id_col} ASC)"
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("position", F.expr(w))
        .select(id_col, "shard", "position")
    )


_HASH60_SPAN = float(1 << 60)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "esw1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row draws a reproducible uniform u ∈ (0, 1]
    from the 60-bit md5 hash of (seed, id) and keys as ln(u) / w — the
    top-n keys are exactly a weight-proportional sample without
    replacement (the monotone transform of u^(1/w) that avoids pow). The
    quality-weighted curation pick next to stratified_sample's rate cut:
    "take the best-weighted 1M docs, diversity preserved by randomness,
    replayable under retries".

    Plan: one JVM hash + log expression, global TakeOrderedAndProject —
    zero shuffle, no window, idempotent. Rows with NULL or non-positive
    weights are dropped before keying (a zero-weight row must never be
    drawn — the A-ES contract), documented here rather than raised
    because weights are typically model scores with a clipped-at-zero
    tail.

    Returns the sampled rows (all input columns), deterministic order
    (key DESC, id ASC)."""
    if n <= 0:
        raise ValueError("n must be positive")
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("double")
            + F.lit(1.0)
        )
        / F.lit(_HASH60_SPAN)
    )
    w = F.col(weight_col).cast("double")
    keyed = df.where(w.isNotNull() & (w > 0)).withColumn(
        "_aes_key", F.ln(u) / w
    )
    out = (
        keyed.orderBy(F.col("_aes_key").desc(), F.col(id_col).asc())
        .limit(int(n))
        .drop("_aes_key")
    )
    return out


def cap_per_host(
    df: DataFrame,
    host_col: str,
    cap: int,
    *,
    priority_col: str | None = None,
    id_col: str = "doc_id",
    seed: str = "hostcap1",
) -> DataFrame:
    """Per-host document cap (the RefinedWeb / C4 crawl-curation rule:
    no single domain may dominate the training mix). Keeps at most `cap`
    rows per host — the best `cap` by `priority_col` DESC when given
    (quality-aware trimming), otherwise an unbiased deterministic draw
    (each row keyed by the 60-bit md5 of (seed, id), smallest keys kept,
    so the survivor set is replayable under retries and independent of
    partitioning). Ties break on id ASC; NULL hosts are kept as their own
    group (a missing host is still a host for capping purposes — dropping
    them silently would delete docs).

    Plan: ONE shuffle keyed by host (the row_number window); no joins, no
    driver state. Skew note: a pathological mega-host concentrates its
    rows in one partition for the window pass — acceptable because crawl
    politeness bounds per-host page counts long before 10^12 totals, and
    the window writes only `cap` survivors; for a truly degenerate host,
    pre-filter with a count-based gate (facet_counts on host) first.

    Returns the surviving rows, original columns, deterministic."""
    from pyspark.sql import Window

    if cap <= 0:
        raise ValueError("cap must be positive")
    if priority_col is not None:
        order = [F.col(priority_col).desc(), F.col(id_col).asc()]
    else:
        draw = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        order = [draw.asc(), F.col(id_col).asc()]
    w = Window.partitionBy(F.col(host_col)).orderBy(*order)
    return (
        df.withColumn("_hc_rank", F.row_number().over(w))
        .where(F.col("_hc_rank") <= cap)
        .drop("_hc_rank")
    )
