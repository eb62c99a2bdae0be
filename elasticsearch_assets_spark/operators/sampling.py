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
