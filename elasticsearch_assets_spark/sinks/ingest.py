"""ES ingest pipelines: processor chains compiled to ONE Catalyst plan.

Reference behavior: ES `PUT _ingest/pipeline/<id>` declares a processor
list (set, rename, remove, convert, gsub, lowercase/uppercase, trim,
split, join, script, date, grok, dissect, fingerprint, drop, ...); docs
indexed with `?pipeline=` flow through it, `_ingest/pipeline/_simulate`
dry-runs sample docs. The reference repo's users front their bulk loads
with exactly these pipelines.

Spark-first shape: every processor compiles to column expressions on the
incoming DataFrame — the whole pipeline is ONE projection chain Catalyst
fuses into a single stage (plus one filter stage per `drop`). No
per-document loop exists anywhere; `simulate_pipeline` just runs the same
compiled plan on a literal DataFrame.

Failure semantics (ES's on_failure, set-oriented): processors that can
fail per-row (convert, date) use try_* forms and record the first
failure in an `_ingest_error` column; `on_failure="keep"` (default)
passes tagged rows through (route them to a dead-letter sink),
`"drop"` filters them, `"fail"` raises at action time if any row failed.
Structurally invalid pipelines (unknown processor, missing required
field without ignore_missing) fail at COMPILE time, loudly.

Per-processor `if` conditions ride the engine's one script dialect
(Spark SQL via F.expr) — a gated transform is `CASE WHEN` column math,
a gated `drop` is a filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ERROR_COL = "_ingest_error"


def _req(cfg: dict, key: str, proc: str):
    if key not in cfg:
        raise ValueError(f"{proc} processor requires {key!r}")
    return cfg[key]


def _gate(df: DataFrame, cfg: dict, col: str, new: Column) -> DataFrame:
    cond = cfg.get("if")
    if cond is not None:
        old = F.col(col) if col in df.columns else F.lit(None)
        new = F.when(F.expr(cond), new).otherwise(old)
    return df.withColumn(col, new)


def _have(df: DataFrame, cfg: dict, field: str, proc: str) -> bool:
    if field in df.columns:
        return True
    if cfg.get("ignore_missing"):
        return False
    raise ValueError(f"{proc} processor: field {field!r} does not exist")


def _tag_error(df: DataFrame, bad: Column, msg: str) -> DataFrame:
    prev = (
        F.col(ERROR_COL) if ERROR_COL in df.columns
        else F.lit(None).cast("string")
    )
    return df.withColumn(
        ERROR_COL, F.coalesce(prev, F.when(bad, F.lit(msg)))
    )


_CONVERT_TYPES = {
    "integer": "int", "long": "bigint", "float": "float",
    "double": "double", "string": "string", "boolean": "boolean",
}


def run_pipeline(
    df: DataFrame,
    processors: "list[dict]",
    on_failure: str = "keep",
) -> DataFrame:
    """Apply an ES-shaped processor list. Each element is
    {"<type>": {config}} exactly like the ES pipeline JSON."""
    if on_failure not in ("keep", "drop", "fail"):
        raise ValueError("on_failure must be keep | drop | fail")
    for p in processors:
        if len(p) != 1:
            raise ValueError(f"one processor type per entry: {p!r}")
        (ptype, cfg), = p.items()
        df = _apply(df, ptype, cfg or {})
    if ERROR_COL not in df.columns:
        df = df.withColumn(ERROR_COL, F.lit(None).cast("string"))
    if on_failure == "drop":
        df = df.where(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
    elif on_failure == "fail":
        bad = df.where(F.col(ERROR_COL).isNotNull()).select(ERROR_COL).head()
        if bad is not None:
            raise ValueError(f"ingest pipeline failed: {bad[ERROR_COL]}")
        df = df.drop(ERROR_COL)
    return df


def _apply(df: DataFrame, ptype: str, cfg: dict) -> DataFrame:
    if ptype == "set":
        field = _req(cfg, "field", "set")
        if "copy_from" in cfg:
            val = F.col(cfg["copy_from"])
        else:
            val = F.lit(_req(cfg, "value", "set"))
        if field in df.columns and not cfg.get("override", True):
            val = F.coalesce(F.col(field), val)
        return _gate(df, cfg, field, val)
    if ptype == "rename":
        field = _req(cfg, "field", "rename")
        target = _req(cfg, "target_field", "rename")
        if not _have(df, cfg, field, "rename"):
            return df
        if target in df.columns:
            raise ValueError(f"rename target {target!r} already exists")
        return df.withColumnRenamed(field, target)
    if ptype == "remove":
        fields = _req(cfg, "field", "remove")
        fields = [fields] if isinstance(fields, str) else list(fields)
        for x in fields:
            _have(df, cfg, x, "remove")
        return df.drop(*[x for x in fields if x in df.columns])
    if ptype == "convert":
        field = _req(cfg, "field", "convert")
        typ = _req(cfg, "type", "convert")
        if typ not in _CONVERT_TYPES:
            raise ValueError(f"convert: unknown type {typ!r}")
        if not _have(df, cfg, field, "convert"):
            return df
        target = cfg.get("target_field", field)
        src = F.col(field)
        casted = src.cast(_CONVERT_TYPES[typ]) if typ == "string" else (
            src.cast("string").try_cast(_CONVERT_TYPES[typ])
        )
        df = _tag_error(
            df,
            src.isNotNull() & casted.isNull(),
            f"convert: cannot cast {field} to {typ}",
        )
        return _gate(df, cfg, target, casted)
    if ptype in ("lowercase", "uppercase", "trim"):
        field = _req(cfg, "field", ptype)
        if not _have(df, cfg, field, ptype):
            return df
        fn = {"lowercase": F.lower, "uppercase": F.upper, "trim": F.trim}[ptype]
        return _gate(df, cfg, cfg.get("target_field", field), fn(F.col(field)))
    if ptype == "gsub":
        field = _req(cfg, "field", "gsub")
        if not _have(df, cfg, field, "gsub"):
            return df
        # pattern must stay in the Java-regex ∩ RE2 dialect (the repo's
        # portable-regex rule); replacement backrefs are NOT portable and
        # are rejected so oracles can share the text
        repl = _req(cfg, "replacement", "gsub")
        if "$" in repl or "\\" in repl:
            raise ValueError(
                "gsub replacement backrefs are not in the portable dialect"
            )
        return _gate(
            df, cfg, cfg.get("target_field", field),
            F.regexp_replace(F.col(field), _req(cfg, "pattern", "gsub"), repl),
        )
    if ptype == "split":
        field = _req(cfg, "field", "split")
        if not _have(df, cfg, field, "split"):
            return df
        from elasticsearch_assets_spark.query.esql import _re_escape

        sep = _re_escape(_req(cfg, "separator", "split"))
        return _gate(
            df, cfg, cfg.get("target_field", field),
            F.split(F.col(field), sep),
        )
    if ptype == "join":
        field = _req(cfg, "field", "join")
        if not _have(df, cfg, field, "join"):
            return df
        return _gate(
            df, cfg, cfg.get("target_field", field),
            F.array_join(F.col(field), _req(cfg, "separator", "join")),
        )
    if ptype == "script":
        # the engine's ONE script dialect (Spark SQL), like script_score /
        # update_by_query — ES painless is out of scope by design
        return _gate(
            df, cfg, _req(cfg, "target_field", "script"),
            F.expr(_req(cfg, "source", "script")),
        )
    if ptype == "date":
        field = _req(cfg, "field", "date")
        if not _have(df, cfg, field, "date"):
            return df
        formats = _req(cfg, "formats", "date")
        parsed = F.coalesce(
            *[F.try_to_timestamp(F.col(field), F.lit(f)) for f in formats]
        )
        df = _tag_error(
            df,
            F.col(field).isNotNull() & parsed.isNull(),
            f"date: cannot parse {field}",
        )
        return _gate(df, cfg, cfg.get("target_field", "@timestamp"), parsed)
    if ptype in ("grok", "dissect"):
        from elasticsearch_assets_spark.query.esql import (
            dissect_compile, grok_compile,
        )

        field = _req(cfg, "field", ptype)
        if not _have(df, cfg, field, ptype):
            return df
        pattern = _req(cfg, "pattern", ptype)
        if ptype == "grok":
            regex, typed = grok_compile(pattern)
        else:
            regex, names = dissect_compile(pattern)
            typed = [(n, "string") for n in names]
        for i, (fname, ftype) in enumerate(typed):
            ext = F.regexp_extract(F.col(field), regex, i + 1)
            col = F.when(ext != "", ext)
            if ftype != "string":
                col = col.cast(ftype)
            df = df.withColumn(fname, col)
        return df
    if ptype == "fingerprint":
        fields = _req(cfg, "fields", "fingerprint")
        for x in fields:
            _have(df, {}, x, "fingerprint")
        return _gate(
            df, cfg, cfg.get("target_field", "fingerprint"),
            F.md5(F.concat_ws("|", *[F.col(x).cast("string") for x in fields])),
        )
    if ptype == "drop":
        cond = _req(cfg, "if", "drop")
        return df.where(~F.coalesce(F.expr(cond), F.lit(False)))
    raise ValueError(f"unknown ingest processor {ptype!r}")


def simulate_pipeline(
    spark, docs: "list[dict]", processors: "list[dict]",
    on_failure: str = "keep",
) -> "list[dict]":
    """ES `_ingest/pipeline/_simulate`: run sample docs through the SAME
    compiled plan and return the transformed docs as dicts."""
    df = spark.createDataFrame(docs)
    out = run_pipeline(df, processors, on_failure=on_failure)
    return [r.asDict(recursive=True) for r in out.collect()]
