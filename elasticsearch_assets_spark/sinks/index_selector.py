"""Index-selector semantics (SURVEY.md §2.1 S8, §2.6 C4) as Spark columns.

The reference maps every document to a bulk action + a target index whose
name may be time-series formatted from a date field
(/root/reference/asset/elasticsearch_index_selector/index.js:6-48). Here the
"index name" becomes a partition value and the whole per-row loop becomes
column expressions — no Python in the data path, fully codegen'd.

Pinned golden values (reference test
/root/reference/test/index_selector-spec.js:82-106): weekly index = floor
weeks since the Unix epoch, e.g. 2019-07-02 -> 2582, 2019-07-04 -> 2583,
2019-07-11 -> 2584.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ms per week, exactly as the reference divides Date.parse() output
# (/root/reference/asset/elasticsearch_index_selector/index.js:7-10)
_WEEK_MS = 604_800_000

_DATE_FORMATS = {
    "daily": "yyyy.MM.dd",
    "monthly": "yyyy.MM",
    "yearly": "yyyy",
}

ACTIONS = ("index", "create", "update", "upsert", "delete")


def timeseries_index_expr(
    ts_col: str | Column, timeseries: str, index_prefix: str
) -> Column:
    """Target index name for one record, as a Column.

    daily/monthly/yearly truncate the ISO date to 10/7/4 chars with '-'->'.'
    (reference index.js:26-36); weekly is the integer epoch-week
    (index.js:7-10). A trailing '-' on the prefix is normalized, matching
    index.js:38-44.
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    if timeseries == "weekly":
        # floor(epoch_ms / 604800000); unix_millis keeps ms precision
        suffix = F.floor(F.unix_millis(ts) / F.lit(_WEEK_MS)).cast("string")
    elif timeseries in _DATE_FORMATS:
        # reference formats via Date.toISOString() (UTC) then slices
        suffix = F.date_format(
            F.to_utc_timestamp(ts, "UTC"), _DATE_FORMATS[timeseries]
        )
    else:
        raise ValueError(f"unknown timeseries granularity: {timeseries!r}")
    prefix = index_prefix if index_prefix.endswith("-") else index_prefix + "-"
    return F.concat(F.lit(prefix), suffix)


def with_target_index(
    df: DataFrame,
    *,
    index: str | None = None,
    timeseries: str | None = None,
    index_prefix: str | None = None,
    date_field: str = "ts",
    out_col: str = "_index",
) -> DataFrame:
    """Add the `_index` routing column (static name or time-series)."""
    if timeseries:
        if not index_prefix:
            raise ValueError("timeseries requires index_prefix")
        return df.withColumn(
            out_col, timeseries_index_expr(date_field, timeseries, index_prefix)
        )
    if index is None:
        raise ValueError("either index or timeseries must be given")
    return df.withColumn(out_col, F.lit(index))


def assign_actions(
    df: DataFrame,
    *,
    action: str = "index",
    id_field: str | None = None,
    key_col: str | None = None,
    out_action: str = "_action",
    out_id: str = "_id",
) -> DataFrame:
    """Add `_action` + `_id` columns.

    Mirrors the reference's id selection precedence: preserve_id (metadata
    `_key` — ours is an explicit `key_col`) > `id_field` > engine-assigned
    (/root/reference/asset/elasticsearch_index_selector/index.js:72-87).
    When neither is given the id is a deterministic content hash rather than
    an ES auto-id (determinism contract, SURVEY.md §2.6 C7).
    """
    if action not in ACTIONS:
        raise ValueError(f"unknown action {action!r}; expected one of {ACTIONS}")
    src = key_col or id_field
    if src is not None:
        id_expr = F.col(src).cast("string")
    else:
        id_expr = F.sha1(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    return df.withColumn(out_action, F.lit(action)).withColumn(out_id, id_expr)


def template_match_sql(
    templates: "list[tuple[str, int, str]]", name_col: str
) -> str:
    """ES composable index templates as ONE shared CASE-expression text
    (valid Spark SQL and DuckDB — bit parity by construction, the
    geohash_sql trick): `templates` is (index_pattern, priority,
    template_name); the highest-priority matching pattern wins, `*`
    wildcards become LIKE `%`. ES forbids equal priorities on
    overlapping patterns; this resolver enforces unique priorities
    outright (the deterministic superset of that rule)."""
    if not templates:
        raise ValueError("need at least one template")
    prios = [p for _, p, _ in templates]
    if len(set(prios)) != len(prios):
        raise ValueError("template priorities must be unique")
    arms = []
    for pattern, _, tname in sorted(templates, key=lambda t: -t[1]):
        if "%" in pattern or "_" in pattern:
            raise ValueError(f"pattern {pattern!r} may only use * wildcards")
        like = pattern.replace("*", "%")
        arms.append(f"WHEN {name_col} LIKE '{like}' THEN '{tname}'")
    return "CASE " + " ".join(arms) + " ELSE NULL END"


def resolve_templates(
    df, name_col: str, templates: "list[tuple[str, int, str]]"
):
    """Distributed template resolution: adds a `template` column naming
    the winning index template per row (NULL when nothing matches — ES
    then applies no template). Pure codegen'd CASE, zero shuffle."""
    from pyspark.sql import functions as FF

    return df.withColumn(
        "template", FF.expr(template_match_sql(templates, name_col))
    )
