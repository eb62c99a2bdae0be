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
    registry: "dict[str, list] | None" = None,
) -> DataFrame:
    """Apply an ES-shaped processor list. Each element is
    {"<type>": {config}} exactly like the ES pipeline JSON.

    `registry` maps pipeline names for the `pipeline` processor (ES
    pipeline composition: a shared enrichment pipeline invoked by name).
    Composition inlines the named pipeline's processors into the SAME
    projection chain — still one Catalyst plan, no per-doc dispatch;
    cycles raise at compile time (ES raises at runtime on recursion)."""
    if on_failure not in ("keep", "drop", "fail"):
        raise ValueError("on_failure must be keep | drop | fail")
    df = _run_processors(df, processors, registry or {}, frozenset())
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


def _run_processors(
    df: DataFrame,
    processors: "list[dict]",
    registry: "dict[str, list]",
    stack: frozenset,
) -> DataFrame:
    for p in processors:
        if len(p) != 1:
            raise ValueError(f"one processor type per entry: {p!r}")
        (ptype, cfg), = p.items()
        cfg = cfg or {}
        if ptype == "pipeline":
            name = cfg.get("name")
            if name not in registry:
                raise ValueError(f"pipeline processor: unknown name {name!r}")
            if name in stack:
                raise ValueError(
                    f"pipeline processor: cycle through {name!r}"
                )
            df = _run_processors(
                df, registry[name], registry, stack | {name}
            )
            continue
        df = _apply(df, ptype, cfg)
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
    if ptype == "foreach":
        # ES foreach: apply one processor per element of an array field,
        # writing back in place. Compiles to a transform() lambda — the
        # element is addressed as `_value` (ES's `_ingest._value`), so
        # the inner `script` source references `_value` directly. Inner
        # processors: uppercase / lowercase / trim / script.
        field = _req(cfg, "field", "foreach")
        inner = _req(cfg, "processor", "foreach")
        if len(inner) != 1:
            raise ValueError("foreach takes exactly one inner processor")
        (itype, icfg), = inner.items()
        simple = {"uppercase": "upper", "lowercase": "lower", "trim": "trim"}
        if itype in simple:
            body = f"{simple[itype]}(_value)"
        elif itype == "script":
            body = f"({_req(icfg or {}, 'source', 'foreach.script')})"
        else:
            raise ValueError(
                f"foreach inner processor {itype!r} not supported "
                "(uppercase | lowercase | trim | script)"
            )
        return df.withColumn(
            field, F.expr(f"transform({field}, _value -> {body})")
        )
    if ptype == "inference":
        # ES inference processor. Real served models are the declared
        # boundary (the RERANK / COMPLETION pattern); model_id
        # 'hash-classifier' runs the engine's deterministic fastText-
        # shaped stand-in (textstats.hash_classifier_score's expression,
        # inlined per row — zero shuffle), emitting
        # <target>_score (sigmoid) and <target>_class (threshold cut).
        # The plan is identical for a learned weight table.
        from elasticsearch_assets_spark.operators.texthash import (
            hash60_expr, tokens_expr,
        )
        from elasticsearch_assets_spark.operators.textstats import (
            _HC_HALF, _HC_MOD,
        )

        model = _req(cfg, "model_id", "inference")
        if model != "hash-classifier":
            raise ValueError(
                f"inference model_id {model!r}: only the deterministic "
                "'hash-classifier' stand-in is available (served models "
                "are a declared boundary)"
            )
        field = _req(cfg, "field", "inference")
        target = cfg.get("target_field", "ml")
        n_buckets = int(cfg.get("n_buckets", 4096))
        thr = float(cfg.get("threshold", 0.5))
        toks = tokens_expr(field)
        w = lambda t: (  # noqa: E731
            ((hash60_expr(t) % n_buckets) % _HC_MOD - F.lit(_HC_HALF))
            / F.lit(float(_HC_HALF))
        )
        s = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + w(t))
        x = F.when(F.size(toks) > 0, s / F.size(toks)).otherwise(F.lit(0.0))
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-x))
        df = _gate(df, cfg, f"{target}_score", score)
        return df.withColumn(
            f"{target}_class",
            F.when(F.col(f"{target}_score") >= thr, F.lit("hq"))
            .otherwise(F.lit("lq")),
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
            for i, (fname, ftype) in enumerate(typed):
                ext = F.regexp_extract(F.col(field), regex, i + 1)
                col = F.when(ext != "", ext)
                if ftype != "string":
                    col = col.cast(ftype)
                df = df.withColumn(fname, col)
            return df
        from elasticsearch_assets_spark.query.esql import dissect_extract

        regex, names = dissect_compile(pattern)
        return dissect_extract(
            df, field, regex, names, cfg.get("append_separator", "")
        )
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
    if ptype == "json":
        # ES json processor infers the object shape; Spark requires the
        # schema up front (schema-on-read inference is a second full pass
        # at 100 TB) — `schema` is REQUIRED, e.g. "k INT, tag STRING"
        field = _req(cfg, "field", "json")
        schema = _req(cfg, "schema", "json")
        if not _have(df, cfg, field, "json"):
            return df
        # PERMISSIVE from_json returns a null-FIELDED struct on malformed
        # input, never NULL — route the raw text into a corrupt-record
        # field so "cannot parse" is detectable without a second pass
        full = F.from_json(
            F.col(field), f"{schema}, _corrupt_record STRING",
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        )
        bad = full.getField("_corrupt_record").isNotNull()
        df = _tag_error(df, bad, f"json: cannot parse {field}")
        parsed = F.when(~bad, full.dropFields("_corrupt_record"))
        return _gate(df, cfg, cfg.get("target_field", field), parsed)
    if ptype == "kv":
        # ES kv: split "a=1 b=2" pairs into fields. One str_to_map JVM
        # expression; include_keys materializes <prefix><key> columns
        # (ES's target_field-as-object, flattened — the engine's column
        # model), exclude_keys drops map entries.
        field = _req(cfg, "field", "kv")
        if not _have(df, cfg, field, "kv"):
            return df
        fs = _req(cfg, "field_split", "kv")
        vs = _req(cfg, "value_split", "kv")
        from elasticsearch_assets_spark.query.esql import _re_escape

        m = F.expr(
            f"str_to_map({field}, '{_re_escape(fs)}', '{_re_escape(vs)}')"
        )
        if cfg.get("exclude_keys"):
            m = F.map_filter(m, lambda k, v: ~k.isin(*cfg["exclude_keys"]))
        prefix = cfg.get("prefix", "")
        if "include_keys" in cfg:
            for k in cfg["include_keys"]:
                df = df.withColumn(prefix + k, m.getItem(k))
            return df
        return _gate(df, cfg, cfg.get("target_field", field), m)
    if ptype == "uri_parts":
        # ES uri_parts -> url.* fields. parse_url is the JVM kernel
        # (whole-stage codegen); extension comes off the path.
        field = _req(cfg, "field", "uri_parts")
        if not _have(df, cfg, field, "uri_parts"):
            return df
        u = F.col(field).cast("string")
        prefix = cfg.get("target_field", "url") + "_"
        parts = {
            "scheme": F.parse_url(u, F.lit("PROTOCOL")),
            "domain": F.parse_url(u, F.lit("HOST")),
            "path": F.parse_url(u, F.lit("PATH")),
            "query": F.parse_url(u, F.lit("QUERY")),
            "fragment": F.parse_url(u, F.lit("REF")),
            "user_info": F.parse_url(u, F.lit("USERINFO")),
            # F.get, not getItem: no-port authorities split to one
            # element and strict mode makes [1] an error, not NULL
            "port": F.get(
                F.split(F.parse_url(u, F.lit("AUTHORITY")), ":"), F.lit(1)
            ).try_cast("int"),
            "extension": F.nullif(
                F.regexp_extract(
                    F.parse_url(u, F.lit("PATH")), r"\.([^./]+)$", 1
                ),
                F.lit(""),
            ),
        }
        for name, col in parts.items():
            df = df.withColumn(prefix + name, col)
        return df
    if ptype == "registered_domain":
        # ES registered_domain uses the public suffix list; the embedded
        # default is a small deterministic PSL subset (override with
        # cfg["suffixes"], longest-match-first like the PSL algorithm)
        field = _req(cfg, "field", "registered_domain")
        if not _have(df, cfg, field, "registered_domain"):
            return df
        suffixes = cfg.get("suffixes", _PSL_SUBSET)
        host = F.col(field)
        prefix = cfg.get("target_field", "url") + "_"
        tld = F.lit(None).cast("string")
        for s in sorted(suffixes, key=len):  # longest checked LAST wins
            tld = F.when(
                host.endswith("." + s) | (host == s), F.lit(s)
            ).otherwise(tld)
        # registered domain = last label before the suffix + the suffix
        stem = F.expr(
            f"substring({field}, 1, length({field}) - length(_rd_tld) - 1)"
        )
        df = df.withColumn("_rd_tld", tld)
        reg = F.when(
            tld.isNotNull() & (F.col("_rd_tld") != host) & (stem != ""),
            F.concat(F.element_at(F.split(stem, r"\."), -1),
                     F.lit("."), F.col("_rd_tld")),
        )
        sub = F.when(
            reg.isNotNull()
            & (F.length(host) > F.length(reg)),
            F.expr(
                f"substring({field}, 1,"
                f" length({field}) - length(_rd_reg) - 1)"
            ),
        )
        df = df.withColumn("_rd_reg", reg)
        df = (
            df.withColumn(prefix + "top_level_domain", F.col("_rd_tld"))
            .withColumn(prefix + "registered_domain", F.col("_rd_reg"))
            .withColumn(prefix + "subdomain", sub)
            .drop("_rd_tld", "_rd_reg")
        )
        return df
    if ptype == "network_direction":
        # direction from source/destination membership in the internal
        # CIDR set — reuses the ES|QL CIDR compiler so the blocks fold
        # to integer ranges (one pushed-down predicate per side)
        from elasticsearch_assets_spark.query.esql import _h_cidr_match

        src = _req(cfg, "source_ip", "network_direction")
        dst = _req(cfg, "destination_ip", "network_direction")
        nets = _req(cfg, "internal_networks", "network_direction")
        blocks = [f"'{b}'" for b in nets]
        s_in = F.expr(_h_cidr_match([src] + blocks))
        d_in = F.expr(_h_cidr_match([dst] + blocks))
        direction = (
            F.when(s_in & d_in, F.lit("internal"))
            .when(s_in, F.lit("outbound"))
            .when(d_in, F.lit("inbound"))
            .otherwise(F.lit("external"))
        )
        return _gate(df, cfg, cfg.get("target_field", "network_direction"),
                     direction)
    if ptype == "date_index_name":
        # resolved index name: prefix + date_format(trunc(rounding, ts))
        field = _req(cfg, "field", "date_index_name")
        if not _have(df, cfg, field, "date_index_name"):
            return df
        rounding = _req(cfg, "date_rounding", "date_index_name")
        trunc_unit = {
            "y": "year", "M": "month", "w": "week", "d": "day",
            "h": "hour", "m": "minute", "s": "second",
        }.get(rounding)
        if trunc_unit is None:
            raise ValueError(
                f"date_index_name: date_rounding must be y/M/w/d/h/m/s,"
                f" got {rounding!r}"
            )
        fmt = cfg.get("index_name_format", "yyyy-MM-dd")
        name = F.concat(
            F.lit(cfg.get("index_name_prefix", "")),
            F.date_format(F.date_trunc(trunc_unit, F.col(field)), fmt),
        )
        return _gate(df, cfg, cfg.get("target_field", "_index"), name)
    if ptype == "bytes":
        # "1.5kb" -> 1536 (b/kb/mb/gb/tb/pb, case-insensitive, ES floors
        # the final value to a long)
        field = _req(cfg, "field", "bytes")
        if not _have(df, cfg, field, "bytes"):
            return df
        s = F.lower(F.trim(F.col(field)))
        num = F.regexp_extract(s, r"^([0-9.]+)\s*(b|kb|mb|gb|tb|pb)$", 1)
        unit = F.regexp_extract(s, r"^([0-9.]+)\s*(b|kb|mb|gb|tb|pb)$", 2)
        mult = (
            F.when(unit == "b", F.lit(1))
            .when(unit == "kb", F.lit(1024))
            .when(unit == "mb", F.lit(1024 ** 2))
            .when(unit == "gb", F.lit(1024 ** 3))
            .when(unit == "tb", F.lit(1024 ** 4))
            .when(unit == "pb", F.lit(1024 ** 5))
        )
        val = F.floor(num.try_cast("double") * mult).cast("bigint")
        df = _tag_error(
            df, F.col(field).isNotNull() & val.isNull(),
            f"bytes: cannot parse {field}",
        )
        return _gate(df, cfg, cfg.get("target_field", field), val)
    if ptype == "html_strip":
        # Lucene HTMLStripCharFilter approximation: drop tags, decode the
        # common entities (the full entity table is out of scope)
        field = _req(cfg, "field", "html_strip")
        if not _have(df, cfg, field, "html_strip"):
            return df
        col = F.regexp_replace(F.col(field), r"<[^>]*>", "")
        for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
            col = F.replace(col, F.lit(ent), F.lit(ch))
        return _gate(df, cfg, cfg.get("target_field", field), col)
    if ptype == "csv":
        # ES csv processor: one delimited line -> target_fields. The
        # no-quote fast path is a split projection; quoted input needs
        # the file-level reader (sources/files.py), declared out of scope
        field = _req(cfg, "field", "csv")
        if not _have(df, cfg, field, "csv"):
            return df
        targets = _req(cfg, "target_fields", "csv")
        if cfg.get("quote") not in (None, ""):
            raise ValueError(
                "csv processor: quoted values need the file reader"
                " (sources/files.py); quote must be empty"
            )
        from elasticsearch_assets_spark.query.esql import _re_escape

        sep = _re_escape(cfg.get("separator", ","))
        parts = F.split(F.col(field), sep)
        arity_ok = F.size(parts) >= len(targets)
        df = _tag_error(
            df, F.col(field).isNotNull() & ~arity_ok,
            f"csv: fewer than {len(targets)} fields in {field}",
        )
        trim = cfg.get("trim", False)
        for i, t in enumerate(targets):
            v = F.get(parts, F.lit(i))  # NULL (not error) on short lines
            df = df.withColumn(t, F.trim(v) if trim else v)
        return df
    if ptype == "append":
        # ES append: target becomes an array; scalars promote, existing
        # arrays extend; allow_duplicates=False dedups (order-stable)
        field = _req(cfg, "field", "append")
        values = _req(cfg, "value", "append")
        values = values if isinstance(values, list) else [values]
        lits = F.array(*[F.lit(v) for v in values])
        if field in df.columns:
            base = df.schema[field].dataType.typeName()
            cur = (
                F.col(field) if base == "array"
                else F.array(F.col(field))
            )
            new = F.concat(cur, lits)
        else:
            new = lits
        if not cfg.get("allow_duplicates", True):
            new = F.array_distinct(new)
        return _gate(df, cfg, field, new)
    if ptype == "user_agent":
        # minimal deterministic UA parser: browser family + version, OS,
        # device class — regexp CASE chains over the major families (the
        # full uap-core regex db is out of scope; same declared-subset
        # contract as the PSL above)
        field = _req(cfg, "field", "user_agent")
        if not _have(df, cfg, field, "user_agent"):
            return df
        ua = F.col(field)
        prefix = cfg.get("target_field", "user_agent") + "_"
        def named(pattern: str, name: str):
            return F.when(ua.rlike(pattern), F.lit(name))
        browser = F.coalesce(
            named(r"Edg/", "Edge"),
            named(r"OPR/", "Opera"),
            named(r"Chrome/", "Chrome"),
            named(r"Firefox/", "Firefox"),
            named(r"Safari/", "Safari"),
            F.lit("Other"),
        )
        version = (
            F.when(browser == "Edge",
                   F.regexp_extract(ua, r"Edg/([0-9.]+)", 1))
            .when(browser == "Opera",
                  F.regexp_extract(ua, r"OPR/([0-9.]+)", 1))
            .when(browser == "Chrome",
                  F.regexp_extract(ua, r"Chrome/([0-9.]+)", 1))
            .when(browser == "Firefox",
                  F.regexp_extract(ua, r"Firefox/([0-9.]+)", 1))
            .when(browser == "Safari",
                  F.regexp_extract(ua, r"Version/([0-9.]+)", 1))
        )
        os_name = F.coalesce(
            named(r"Windows NT", "Windows"),
            named(r"Android", "Android"),
            named(r"(iPhone|iPad) OS|iOS", "iOS"),
            named(r"Mac OS X", "macOS"),
            named(r"Linux", "Linux"),
            F.lit("Other"),
        )
        device = F.coalesce(
            named(r"iPad|Tablet", "Tablet"),
            named(r"Mobile|iPhone|Android", "Mobile"),
            F.lit("Desktop"),
        )
        return (
            df.withColumn(prefix + "name", browser)
            .withColumn(prefix + "version", F.nullif(version, F.lit("")))
            .withColumn(prefix + "os", os_name)
            .withColumn(prefix + "device", device)
        )
    raise ValueError(f"unknown ingest processor {ptype!r}")


# deterministic public-suffix subset for registered_domain (the real PSL
# is ~9k rules; the embedded default keeps behavior reproducible offline,
# override with cfg["suffixes"])
_PSL_SUBSET = [
    "com", "org", "net", "io", "edu", "gov", "dev",
    "co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br",
]


def simulate_pipeline(
    spark, docs: "list[dict]", processors: "list[dict]",
    on_failure: str = "keep",
    registry: "dict[str, list] | None" = None,
) -> "list[dict]":
    """ES `_ingest/pipeline/_simulate`: run sample docs through the SAME
    compiled plan and return the transformed docs as dicts."""
    df = spark.createDataFrame(docs)
    out = run_pipeline(df, processors, on_failure=on_failure, registry=registry)
    return [r.asDict(recursive=True) for r in out.collect()]
