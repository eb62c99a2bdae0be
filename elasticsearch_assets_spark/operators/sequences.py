"""EQL sequence detection (Elastic Event Query Language) on event tables.

``sequence by <key> with maxspan=<t> [step1] [step2] ...`` — ordered event
chains per key where every step matches the EARLIEST qualifying event after
the previous step and the whole chain spans at most ``maxspan``. Greedy
earliest-completion is exact for existence from a given start event: taking
the earliest next match at every step minimizes the chain's final
timestamp, so if any chain from that start satisfies maxspan, the greedy
one does.

Plan shape (scale contract): ONE window pass over the events computes, for
every row, the earliest following match of each non-initial step
(min-over-following-frame of a conditional key — Spark evaluates this with
a single sort per key partition, no self-join); chains of length 2 decode
directly from the key, longer chains join once per extra step on the
UNIQUE encoded key. The event key encodes (epoch_ms, event_id) into one
BIGINT so "earliest" is a plain min and both engines (Spark / DuckDB
oracle) order identically; ms collisions break ties by event id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# key = epoch_ms * 1e6 + event_id: epoch_ms(2100) ~ 4.1e12, * 1e6 = 4.1e18
# < int64 max (9.2e18); event ids must stay below 1e6 per ms-tick.
KEY_SCALE = 1_000_000


def event_key_expr(ts_col: str, id_col: str) -> Column:
    # timestampdiff over TIMESTAMP_NTZ is timezone-free wall-clock millis
    # (unix_millis rejects NTZ, and a cast through TIMESTAMP would shift
    # by the session zone — not portable to the naive-timestamp oracle)
    ms = F.expr(
        "timestampdiff(MILLISECOND, "
        f"CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), CAST({ts_col} AS TIMESTAMP_NTZ))"
    )
    return ms * F.lit(KEY_SCALE).cast("long") + F.col(id_col).cast("long")


def event_key_sql(ts_col: str, id_col: str) -> str:
    """DuckDB twin (value-identical BIGINT key over naive timestamps)."""
    return (
        f"(date_diff('millisecond', TIMESTAMP '1970-01-01 00:00:00', {ts_col})"
        f" * {KEY_SCALE} + {id_col})"
    )


def eql_sequence(
    df: DataFrame,
    by: str | list[str],
    steps: list[str],
    maxspan_seconds: float,
    ts_col: str = "ts",
    id_col: str = "event_id",
    until: "str | None" = None,
    head: "int | None" = None,
    tail: "int | None" = None,
) -> DataFrame:
    """Match ``sequence by `by` with maxspan [steps...] [until [u]]``.

    `head` / `tail` (the EQL ``| head N`` / ``| tail N`` result pipes):
    keep only the N chains whose FIRST event is earliest (head) or
    latest (tail), ties broken by the encoded (ts, id) key —
    deterministic, the EQL result-pipe contract. Each compiles to one
    TakeOrderedAndProject over the chain rows — no extra shuffle.
    Mutually exclusive, like piping in EQL.

    `steps` are Spark SQL boolean expressions (the engine's one script
    dialect), length >= 2. Returns one row per completed chain:
    the `by` columns, ``id_0..id_{n-1}`` (the chain's event ids) and
    ``span_ms`` (last - first event time).

    `until` (EQL's expiration clause): a chain is discarded when an
    until-event occurs in the same `by` partition strictly between the
    chain's first and last events — the sequence "expires" before it
    completes (ES EQL docs). One extra column in the SAME window pass
    (the earliest until-event key after each row), one extra filter —
    no additional shuffle."""
    if len(steps) < 2:
        raise ValueError("an EQL sequence needs >= 2 steps")
    if maxspan_seconds <= 0:
        raise ValueError("maxspan must be positive")
    keys = [by] if isinstance(by, str) else list(by)
    n = len(steps)
    base = df.withColumn("_k", event_key_expr(ts_col, id_col))
    w = (
        Window.partitionBy(*[F.col(c) for c in keys])
        .orderBy(F.col("_k").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    for i in range(1, n):
        base = base.withColumn(
            f"_n{i}", F.min(F.when(F.expr(steps[i]), F.col("_k"))).over(w)
        )
    if until is not None:
        base = base.withColumn(
            "_nu", F.min(F.when(F.expr(until), F.col("_k"))).over(w)
        )
    first_cols = [
        *keys, F.col("_k").alias("k_0"), F.col("_n1").alias("k_1"),
    ]
    if until is not None:
        first_cols.append(F.col("_nu").alias("k_u"))
    seq = base.where(F.expr(steps[0])).select(*first_cols)
    for i in range(2, n):
        hop = base.select(
            F.col("_k").alias(f"k_{i - 1}"), F.col(f"_n{i}").alias(f"k_{i}")
        )
        seq = seq.join(hop, f"k_{i - 1}")  # unique-key equi-join per hop
    last = F.col(f"k_{n - 1}")
    # integer div, NOT `/`: the keys are ~4e18 and float division would
    # round in the double mantissa before the cast
    span_ms = F.expr(f"(k_{n - 1} div {KEY_SCALE}) - (k_0 div {KEY_SCALE})")
    out_cols = [F.col(c) for c in keys]
    out_cols += [
        (F.col(f"k_{i}") % KEY_SCALE).cast("long").alias(f"id_{i}")
        for i in range(n)
    ]
    out_cols.append(span_ms.alias("span_ms"))
    out = seq.where(last.isNotNull()).where(
        span_ms <= int(maxspan_seconds * 1000)
    )
    if until is not None:
        # expire: an until-event strictly between first and last event
        # kills the chain (k_u is the EARLIEST until after k_0, so
        # k_u >= last means none fell inside)
        out = out.where(F.col("k_u").isNull() | (F.col("k_u") >= last))
    if head is not None and tail is not None:
        raise ValueError("head and tail are mutually exclusive pipes")
    if head is not None:
        out = out.orderBy(F.col("k_0").asc()).limit(int(head))
    if tail is not None:
        out = out.orderBy(F.col("k_0").desc()).limit(int(tail))
    return out.select(*out_cols)


def eql_sample(
    df: DataFrame,
    by: "str | list[str]",
    steps: "list[str]",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """EQL ``sample by <key> [q1] [q2] ...`` — UNORDERED correlation: one
    sample per key that has at least one event matching EVERY query,
    regardless of order or time span (ES EQL sample, 8.6). Where ES picks
    an arbitrary matching event per query, this engine picks the EARLIEST
    (by the encoded (ts, id) key) — deterministic and reproducible, the
    documented deviation.

    Plan: ONE hash aggregation per key computing a conditional-min key
    per query (map-side partials — no window, no ordering pass, no join;
    cheaper than sequence because order doesn't matter), then a null
    filter. Returns the `by` columns + id_0..id_{n-1}."""
    if len(steps) < 2:
        raise ValueError("an EQL sample needs >= 2 queries")
    keys = [by] if isinstance(by, str) else list(by)
    base = df.withColumn("_k", event_key_expr(ts_col, id_col))
    aggs = [
        F.min(F.when(F.expr(s), F.col("_k"))).alias(f"k_{i}")
        for i, s in enumerate(steps)
    ]
    g = base.groupBy(*[F.col(c) for c in keys]).agg(*aggs)
    cond = F.lit(True)
    for i in range(len(steps)):
        cond = cond & F.col(f"k_{i}").isNotNull()
    out_cols = [F.col(c) for c in keys] + [
        (F.col(f"k_{i}") % KEY_SCALE).cast("long").alias(f"id_{i}")
        for i in range(len(steps))
    ]
    return g.where(cond).select(*out_cols)
