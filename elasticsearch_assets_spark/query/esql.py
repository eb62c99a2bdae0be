"""ES|QL (Elasticsearch's piped query language, ES 8.11+) compiled to
DataFrame plans.

Supported subset — the analytics core of the language:

    FROM <index>[, <index> | pattern*]   (multi-index unionByName, null fill)
  | WHERE <expr>                          (incl. MATCH(col, 'terms'))
  | EVAL <name> = <expr> [, <name> = <expr> ...]
  | STATS <name> = <agg>(<expr>) [, ...] [BY <col> [, ...]]
  | SORT <col> [ASC|DESC] [, ...]
  | LIMIT <n>
  | KEEP <col> [, ...]
  | DROP <col> [, ...]
  | RENAME <old> AS <new> [, ...]
  | GROK <col> "<pattern>"      (subset pattern dictionary, typed fields)
  | DISSECT <col> "<pattern>"   (anchored literal-layout extraction)
  | MV_EXPAND <col>             (multivalue -> rows, explode_outer)
  | LOOKUP JOIN <index> ON <f>  (broadcast left join, ES lookup indexes)
  | INLINESTATS <n> = <agg>(<e>) [BY <col> ...]   (window agg, rows kept)
  | FORK (pipe) (pipe) ...      (branch pipes unioned, _fork discriminator)
  | FUSE [rrf] [KEY BY c] [RANK_CONSTANT n]   (RRF-merge FORK branches)
  | RERANK "query" ON <col>     (deterministic stand-in scorer -> _score)
  | COMPLETION <t> = <expr> WITH <id>  (deterministic stand-in completion)
  | CHANGE_POINT <val> [ON <key>]  (step detector, type/pvalue columns)

STATS/INLINESTATS grouping keys may be named expressions
(`BY day = BUCKET(ts, 1 day)`), and the `BUCKET(field, span)` grouping
function (ES|QL 8.13) compiles to date_trunc / epoch-floor / numeric
floor column math — see `_rewrite_bucket`.

ROW <name> = <expr> [, ...] may replace FROM as the literal source.

TS <index> (ES 9.x time-series querying) may also replace FROM: the first
STATS then computes per-series over-time inner aggregations (RATE,
AVG/MIN/MAX/SUM/COUNT/FIRST/LAST_OVER_TIME) before the outer aggregate —
two hash aggregations, series identity from the `time_series` metadata
argument (ES's mapping-level time_series_dimension declaration).

Expression dialect: expressions compile through `F.expr`, i.e. Spark SQL —
the engine's ONE script dialect (the same contract as script_score /
script queries / update_by_query), with ES|QL's `==` accepted as sugar
for `=`. Every command is declarative, so Catalyst sees the whole pipe as
one plan: WHERE pushes into the scan, STATS is a partial-aggregated hash
agg, SORT+LIMIT collapses to TakeOrderedAndProject, GROK/DISSECT are one
JVM regexp_extract per field. Unsupported commands (SHOW, and METRICS —
TS's pre-9.0 preview name) raise with guidance.

Reference behavior: the ES|QL docs' command semantics; the reference repo
predates ES|QL but its users' Kibana-side aggregations are exactly the
FROM|WHERE|STATS shape, which is why the subset starts there.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_SUPPORTED = (
    "FROM", "ROW", "TS", "WHERE", "EVAL", "STATS", "SORT", "LIMIT", "KEEP",
    "DROP", "RENAME", "GROK", "DISSECT", "MV_EXPAND", "LOOKUP JOIN",
    "ENRICH", "SAMPLE", "INLINESTATS", "FORK", "CHANGE_POINT", "FUSE",
    "RERANK", "COMPLETION",
)
_KNOWN_UNSUPPORTED = (
    "SHOW", "METRICS",
)

_RE_SPECIAL = set(".^$*+?()[]{}|\\")


def _re_escape(s: str) -> str:
    """Portable regex escape: backslash ONLY the metacharacters both
    Java regex and RE2 define. `re.escape` escapes every non-word char,
    and RE2 rejects unknown escapes like '\\ ' — this stays in the
    common dialect so the same regex text runs in Spark and DuckDB."""
    return "".join("\\" + c if c in _RE_SPECIAL else c for c in s)


# grok pattern subset (inner groups non-capturing so field group indexes
# stay 1:1 with %{...} order); all portable Java-regex == RE2 syntax
_GROK_PATTERNS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
}
_GROK_TYPES = {"keyword": "string", "int": "int", "long": "long", "float": "float", "double": "double"}


def grok_compile(pattern: str) -> "tuple[str, list[tuple[str, str]]]":
    """Compile a grok pattern to (regex, [(field, type), ...]) — field i
    is capture group i+1. `%{PAT}` without a field name matches without
    extracting. Same regex text drives Spark and the DuckDB oracle."""
    out_re: list[str] = []
    fields: list[tuple[str, str]] = []
    pos = 0
    for m in re.finditer(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}", pattern):
        out_re.append(_re_escape(pattern[pos:m.start()]))
        pname, fname, ftype = m.groups()
        if pname not in _GROK_PATTERNS:
            raise ValueError(
                f"unknown grok pattern %{{{pname}}} "
                f"(supported: {', '.join(sorted(_GROK_PATTERNS))})"
            )
        if fname:
            if (ftype or "keyword") not in _GROK_TYPES:
                raise ValueError(f"unknown grok type {ftype!r}")
            out_re.append("(" + _GROK_PATTERNS[pname] + ")")
            fields.append((fname, _GROK_TYPES[ftype or "keyword"]))
        else:
            out_re.append("(?:" + _GROK_PATTERNS[pname] + ")")
        pos = m.end()
    out_re.append(_re_escape(pattern[pos:]))
    if not fields:
        raise ValueError("grok pattern extracts no fields")
    return "".join(out_re), fields


def dissect_compile(pattern: str) -> "tuple[str, list[str]]":
    """Compile a dissect pattern (literal separators + %{field} holes) to
    an ANCHORED regex — dissect is exact-layout matching, unlike grok's
    search semantics. Non-final holes match lazily up to their literal.

    Modifiers (the ES dissect processor's): `%{}` / `%{?name}` are skips
    (matched, not extracted); `%{name->}` right-pads — the delimiter
    following the hole may repeat (`1  two` under `%{a->} %{b}`);
    `%{+name}` appends — repeated names in the returned field list mark
    captures the caller concatenates in order (dissect_extract applies
    the append separator). The reference-key (`%{*k}`/`%{&k}`) modifiers
    raise with guidance (dynamic key names need pivoting, a different
    output shape); the ordered-append form `%{+k/2}` raises too."""
    parts = re.split(r"%\{([^}]*)\}", pattern)
    # parts = [lit0, name1, lit1, name2, lit2, ...]
    holes = list(range(1, len(parts), 2))
    fields: list[str] = []
    out: list[str] = ["^", _re_escape(parts[0])]
    for j, i in enumerate(holes):
        raw = parts[i]
        if raw.startswith(("*", "&")):
            raise ValueError(
                f"dissect modifier {raw[0]!r} (%{{{raw}}}) is not "
                "supported: reference keys need dynamic column names — "
                "restructure with plain holes + EVAL"
            )
        if raw.startswith("+"):
            raw = raw[1:]
            if "/" in raw:
                raise ValueError(
                    "dissect ordered append (%{+k/n}) is not supported: "
                    "captures append in pattern order"
                )
        pad = raw.endswith("->")
        if pad:
            raw = raw[:-2]
        name = "" if raw.startswith("?") else raw
        if name and not re.match(r"^\w+$", name):
            raise ValueError(f"bad dissect field name {raw!r}")
        body = ".*" if j == len(holes) - 1 else ".*?"
        out.append(f"({body})" if name else f"(?:{body})")
        if name:
            fields.append(name)
        sep = parts[i + 1]
        if pad:
            if not sep:
                raise ValueError(
                    "%{name->} needs a following delimiter to absorb"
                )
            # the hole's delimiter may repeat: split the separator into
            # its first literal char-run (the padding unit) + the rest
            out.append(f"(?:{_re_escape(sep[0])})*")
        out.append(_re_escape(sep))
    out.append("$")
    if not fields:
        raise ValueError("dissect pattern extracts no fields")
    return "".join(out), fields


def dissect_extract(
    df: DataFrame, src: str, regex: str, names: "list[str]", sep: str = ""
) -> DataFrame:
    """Materialize dissect captures as columns. Repeated names (the
    `%{+key}` append modifier) concatenate their captures in pattern
    order joined by `sep` (ES's append_separator, default empty); a
    non-matching row yields null for every field (ES sets unmatched
    fields to null)."""
    groups: "dict[str, list[int]]" = {}
    for i, n in enumerate(names):
        groups.setdefault(n, []).append(i + 1)
    for fname, idxs in groups.items():
        if len(idxs) == 1:
            ext = F.regexp_extract(F.col(src), regex, idxs[0])
            col = F.when(ext != "", ext)
        else:
            parts = [F.regexp_extract(F.col(src), regex, j) for j in idxs]
            joined = parts[0]
            for p in parts[1:]:
                joined = F.concat(joined, F.lit(sep), p)
            # appended fields gate on the WHOLE pattern matching — a
            # legitimately-empty capture still joins (ES append contract)
            col = F.when(F.col(src).rlike(regex), joined)
        df = df.withColumn(fname, col)
    return df


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"'):
        return s[1:-1]
    raise ValueError(f"pattern must be quoted: {s!r}")


def _split_pipes(q: str) -> list[str]:
    """Split on top-level `|` (quotes AND parens respected — FORK nests
    whole pipes inside parenthesized branches)."""
    parts, buf, depth, in_str = [], [], 0, None
    for ch in q:
        if in_str:
            if ch == in_str:
                in_str = None
            buf.append(ch)
        elif ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "|" and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _split_parens(s: str) -> list[str]:
    """Split `(branch) (branch) ...` into top-level paren groups (quotes
    and nested parens respected) — the FORK branch syntax."""
    out, buf, depth, in_str = [], [], 0, None
    for ch in s:
        if in_str:
            if ch == in_str:
                in_str = None
            buf.append(ch)
        elif ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            if depth > 1:
                buf.append(ch)
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced parens in FORK: {s!r}")
            if depth == 0:
                out.append("".join(buf).strip())
                buf = []
            else:
                buf.append(ch)
        elif depth == 0:
            if ch.strip():
                raise ValueError(f"FORK branches must be parenthesized: {s!r}")
        else:
            buf.append(ch)
    if depth != 0:
        raise ValueError(f"unbalanced parens in FORK: {s!r}")
    return [b for b in out if b]


def _split_commas(s: str) -> list[str]:
    """Split on top-level commas (respects parens and quotes)."""
    out, buf, depth, in_str = [], [], 0, None
    for ch in s:
        if in_str:
            if ch == in_str:
                in_str = None
            buf.append(ch)
        elif ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        out.append("".join(buf).strip())
    return out


_TOKEN_RE_SQL = r"[\\p{L}\\p{N}]+"  # tokenizer contract, SQL-literal escaped


def _rewrite_match(text: str) -> str:
    """ES|QL 8.17 full-text functions in WHERE: `MATCH(col, 'q terms')`
    compiles to an AND over the analyzed terms of
    array_contains(tokens(col), term) — filter context, exact w.r.t. the
    engine tokenizer (analysis contract), no index required. For RANKED
    full-text, route through InvertedIndex.search_* — ES|QL METADATA
    _score is deliberately out of scope (documented)."""

    def sub(m: "re.Match[str]") -> str:
        col, q = m.group(1), m.group(2)
        terms = sorted({t for t in re.findall(r"[a-z0-9]+", q.lower())})
        if not terms:
            raise ValueError("MATCH needs at least one analyzable term")
        toks = f"regexp_extract_all(lower({col}), '{_TOKEN_RE_SQL}', 0)"
        conds = " AND ".join(
            f"array_contains({toks}, '{t}')" for t in terms
        )
        return f"({conds})"

    return re.sub(r"\bMATCH\(\s*(\w+)\s*,\s*'([^']*)'\s*\)", sub, text, flags=re.I)


# ES|QL time-span literals (BUCKET's second argument). Calendar units
# with N == 1 truncate (date_trunc); fixed-width units floor the
# seconds-since-epoch. The epoch math is written as a
# timestampdiff/timestampadd pair against one literal origin so the
# session timezone CANCELS on both engines (CLAUDE.md's tz-free key).
_FIXED_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}
_CALENDAR_UNITS = {
    "minute", "minutes", "hour", "hours", "day", "days", "week", "weeks",
    "month", "months", "year", "years",
}


def _bucket_sql(col: str, spec: str) -> str:
    """Compile ES|QL `BUCKET(col, span)` to Spark SQL text.

    Time spans: `BUCKET(ts, 1 hour)` -> date_trunc; `BUCKET(ts, 6 hours)`
    -> epoch-floor (tz-free timestampdiff/timestampadd form). Numeric
    spans: `BUCKET(v, 50)` -> floor(v/50)*50 as DOUBLE (both engines
    parse bare decimals as DECIMAL — the cast keeps them comparable).
    The 4-arg auto form picks an interval from a target bucket COUNT
    over [from, to) via the nice-interval ladder (_bucket_auto_sql)."""
    spec = spec.strip()
    tm = re.match(r"^(\d+)\s+([A-Za-z]+)$", spec)
    if tm:
        n, unit = int(tm.group(1)), tm.group(2).lower()
        if n == 1 and unit in _CALENDAR_UNITS:
            return f"date_trunc('{unit.rstrip('s')}', {col})"
        if unit in _FIXED_SECONDS:
            s = n * _FIXED_SECONDS[unit]
            origin = "TIMESTAMP '1970-01-01 00:00:00'"
            return (
                f"timestampadd(SECOND, CAST(floor(timestampdiff(SECOND, "
                f"{origin}, {col}) / {s}) * {s} AS BIGINT), {origin})"
            )
        raise ValueError(
            f"BUCKET span {spec!r}: multi-unit calendar spans (e.g. "
            "'3 months') are not fixed-width; use a fixed unit or 1 <unit>"
        )
    if re.match(r"^[0-9.]+$", spec):
        return (
            f"floor(CAST({col} AS DOUBLE) / CAST({spec} AS DOUBLE)) "
            f"* CAST({spec} AS DOUBLE)"
        )
    raise ValueError(
        f"BUCKET needs `(field, N unit)` or `(field, span)`: got {spec!r}"
    )


# ES's "nice interval" ladder for the BUCKET auto form: pick the smallest
# rung yielding <= target buckets over [from, to). Rungs must be shapes
# _bucket_sql can emit — fixed multiples of seconds..days, or a 1-unit
# calendar trunc; months/quarters ride as fixed 30/90-day widths
# (documented deviation: ES picks calendar months there; the fixed form
# keeps the emitted SQL portable and the compile deterministic).
_AUTO_LADDER: "list[tuple[float, str]]" = [
    (1, "1 second"), (5, "5 seconds"), (10, "10 seconds"),
    (30, "30 seconds"), (60, "1 minute"), (300, "5 minutes"),
    (600, "10 minutes"), (1800, "30 minutes"), (3600, "1 hour"),
    (3 * 3600, "3 hours"), (12 * 3600, "12 hours"), (86400, "1 day"),
    (7 * 86400, "7 days"), (30 * 86400, "30 days"), (90 * 86400, "90 days"),
]


def _parse_bound(lit: str) -> "tuple[str, float]":
    """A BUCKET auto-form bound: a quoted ISO date/datetime (-> epoch
    seconds) or a bare number."""
    lit = lit.strip()
    if lit and lit[0] in "\"'":
        import datetime as _dt

        s = _unquote(lit).replace("Z", "+00:00")
        if "T" not in s and " " not in s:
            s += "T00:00:00+00:00"
        ts = _dt.datetime.fromisoformat(s)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return "date", ts.timestamp()
    return "num", float(lit)


def _bucket_auto_sql(col: str, target: str, lo: str, hi: str) -> str:
    """The 4-arg auto form `BUCKET(field, buckets, from, to)`: choose a
    "nice" span from literal bounds AT COMPILE TIME (the bounds are
    literals in ES|QL too), then emit the plain 2-arg compile. Dates walk
    the second→90-day ladder and fall back to calendar years above it;
    numbers round (to-from)/buckets up to the nearest {1,2,5}x10^k tick."""
    n = int(target.strip())
    if n <= 0:
        raise ValueError("BUCKET auto form needs a positive bucket count")
    (kind_lo, lo_v), (kind_hi, hi_v) = _parse_bound(lo), _parse_bound(hi)
    if kind_lo != kind_hi:
        raise ValueError("BUCKET auto-form bounds must both be dates or numbers")
    span = (hi_v - lo_v) / n
    if span <= 0:
        raise ValueError("BUCKET auto form needs from < to")
    if kind_lo == "date":
        for width, spec in _AUTO_LADDER:
            if width >= span:
                return _bucket_sql(col, spec)
        return _bucket_sql(col, "1 year")
    import math as _math

    k = _math.floor(_math.log10(span))
    for mult in (1.0, 2.0, 5.0, 10.0):
        nice = mult * 10.0 ** k
        if nice >= span:
            return _bucket_sql(col, repr(nice) if nice % 1 else str(int(nice)))
    raise AssertionError("unreachable: 10x10^k >= span by construction")


def _rewrite_bucket(text: str) -> str:
    def sub(m: "re.Match[str]") -> str:
        args = _split_commas(m.group(1))
        if len(args) == 4:
            return _bucket_auto_sql(*args)
        if len(args) != 2:
            raise ValueError(
                "BUCKET takes (field, span) or (field, buckets, from, to)"
            )
        return _bucket_sql(args[0], args[1])

    return re.sub(r"\bBUCKET\(([^()]*)\)", sub, text, flags=re.I)


# ---------------------------------------------------------------------------
# ES|QL scalar functions -> Spark SQL (the names that differ; names Spark
# already defines — LENGTH, SUBSTRING, CONCAT, COALESCE, ABS, ROUND, POW,
# GREATEST, TRIM, ... — pass through _expr untouched)
# ---------------------------------------------------------------------------

def _h_rename(fn: str, arity: int):
    def h(a: "list[str]") -> str:
        if len(a) != arity:
            raise ValueError(f"{fn} takes {arity} argument(s), got {len(a)}")
        return f"{fn}({', '.join(a)})"
    return h


def _h_cast(sql_type: str):
    def h(a: "list[str]") -> str:
        if len(a) != 1:
            raise ValueError(f"TO_* conversions take 1 argument, got {len(a)}")
        return f"CAST({a[0]} AS {sql_type})"
    return h


def _h_case(a: "list[str]") -> str:
    # ES|QL CASE(c1, v1, c2, v2, ..., [default]) -> CASE WHEN ... END
    if len(a) < 2:
        raise ValueError("CASE needs at least (condition, value)")
    pairs, default = (a, None) if len(a) % 2 == 0 else (a[:-1], a[-1])
    whens = " ".join(
        f"WHEN {pairs[i]} THEN {pairs[i + 1]}" for i in range(0, len(pairs), 2)
    )
    return f"(CASE {whens}{f' ELSE {default}' if default else ''} END)"


_DATE_DIFF_UNITS = {
    "second", "seconds", "minute", "minutes", "hour", "hours",
    "day", "days", "week", "weeks", "month", "months",
    "quarter", "quarters", "year", "years",
}


def _h_date_diff(a: "list[str]") -> str:
    # ES|QL DATE_DIFF("unit", start, end) -> timestampdiff(UNIT, start, end)
    if len(a) != 3:
        raise ValueError("DATE_DIFF takes (unit, start, end)")
    um = re.match(r"^['\"](\w+)['\"]$", a[0].strip())
    if not um or um.group(1).lower() not in _DATE_DIFF_UNITS:
        raise ValueError(
            f"DATE_DIFF unit must be a literal from {sorted(_DATE_DIFF_UNITS)}"
        )
    return f"timestampdiff({um.group(1).rstrip('sS').upper()}, {a[1]}, {a[2]})"


def _ipv4_sql(e: str) -> str:
    """Dotted-quad -> BIGINT, pure SQL text (the ipv4_to_long column
    expression from operators/facets.py as shareable SQL)."""
    p = f"split({e}, '\\\\.')"
    return (
        f"(CAST({p}[0] AS BIGINT) * 16777216 + CAST({p}[1] AS BIGINT) * 65536"
        f" + CAST({p}[2] AS BIGINT) * 256 + CAST({p}[3] AS BIGINT))"
    )


def _h_cidr_match(a: "list[str]") -> str:
    # CIDR_MATCH(ip, "a.b.c.d/n", ...) — blocks must be literals, so the
    # [lo, hi] bounds fold at compile time (the predicate stays a pure
    # integer range AND/OR — Catalyst can push it)
    if len(a) < 2:
        raise ValueError("CIDR_MATCH takes (ip, block, ...)")
    ip = _ipv4_sql(a[0])
    tests = []
    for blk in a[1:]:
        bm = re.match(
            r"^['\"](\d+)\.(\d+)\.(\d+)\.(\d+)/(\d+)['\"]$", blk.strip()
        )
        if not bm:
            raise ValueError(f"CIDR_MATCH block must be a literal: {blk!r}")
        o = [int(x) for x in bm.groups()[:4]]
        bits = int(bm.group(5))
        if bits > 32 or any(x > 255 for x in o):
            raise ValueError(f"bad CIDR block {blk!r}")
        base = (o[0] << 24) + (o[1] << 16) + (o[2] << 8) + o[3]
        mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
        lo = base & mask
        hi = lo + (1 << (32 - bits)) - 1
        tests.append(f"{ip} BETWEEN {lo} AND {hi}")
    return "(" + " OR ".join(tests) + ")"


def _mv_order(arg: str) -> bool:
    om = re.match(r"^['\"](asc|desc)['\"]$", arg.strip(), re.I)
    if not om:
        raise ValueError('MV_SORT order must be "ASC" or "DESC"')
    return om.group(1).lower() == "asc"


def _h_mv_sum(a: "list[str]") -> str:
    if len(a) != 1:
        raise ValueError("MV_SUM takes 1 argument")
    return f"aggregate({a[0]}, 0D, (a, v) -> a + CAST(v AS DOUBLE))"


_FUNC_HANDLERS: "dict[str, object]" = {
    "TO_UPPER": _h_rename("upper", 1),
    "TO_LOWER": _h_rename("lower", 1),
    "TO_STRING": _h_cast("STRING"),
    "TO_INTEGER": _h_cast("INT"),
    "TO_LONG": _h_cast("BIGINT"),
    "TO_DOUBLE": _h_cast("DOUBLE"),
    "TO_BOOLEAN": _h_cast("BOOLEAN"),
    "MV_COUNT": _h_rename("size", 1),
    "MV_MIN": _h_rename("array_min", 1),
    "MV_MAX": _h_rename("array_max", 1),
    "MV_DEDUPE": _h_rename("array_distinct", 1),
    # MV_SORT(field[, "ASC"|"DESC"]) — order literal folds at compile
    "MV_SORT": lambda a: (
        f"sort_array({a[0]})" if len(a) == 1
        else f"sort_array({a[0]}, "
             f"{'true' if _mv_order(a[1]) else 'false'})"
    ),
    "MV_SUM": _h_mv_sum,
    # MV_CONCAT(string_multivalue, delim) -> one joined string
    "MV_CONCAT": _h_rename("array_join", 2),
    "MV_AVG": lambda a: f"({_h_mv_sum(a)} / size({a[0]}))",
    "MV_FIRST": lambda a: f"get({a[0]}, 0)",
    "MV_LAST": lambda a: f"get({a[0]}, size({a[0]}) - 1)",
    "CASE": _h_case,
    "STARTS_WITH": _h_rename("startswith", 2),
    "ENDS_WITH": _h_rename("endswith", 2),
    "DATE_EXTRACT": lambda a: f"date_part({a[0]}, {a[1]})",
    "DATE_DIFF": _h_date_diff,
    # ES|QL's arg order is (format, date); Spark's is (date, format)
    "DATE_FORMAT": lambda a: f"date_format({a[1]}, {a[0]})",
    # ES|QL LOCATE(string, substring[, start]); Spark locate(substr, str...)
    "LOCATE": lambda a: f"locate({a[1]}, {a[0]}"
    + (f", {a[2]}" if len(a) == 3 else "") + ")",
    "CIDR_MATCH": _h_cidr_match,
    # ES|QL REPLACE is regex-based with Spark's argument order already
    "REPLACE": _h_rename("regexp_replace", 3),
    # ES|QL DATE_PARSE(format, string); Spark to_timestamp(string, format)
    "DATE_PARSE": lambda a: f"to_timestamp({a[1]}, {a[0]})",
    "TAU": lambda a: "(2 * pi())",
    # ES|QL aggregate spellings (usable in STATS bodies)
    "COUNT_DISTINCT": lambda a: f"count(DISTINCT {a[0]})",
    "MEDIAN": lambda a: f"percentile({a[0]}, 0.5)",
    # WEIGHTED_AVG(value, weight) — float64-promoted like the MV_* family
    "WEIGHTED_AVG": lambda a: (
        f"(sum(CAST({a[0]} AS DOUBLE) * CAST({a[1]} AS DOUBLE))"
        f" / sum(CAST({a[1]} AS DOUBLE)))"
    ),
}


def _h_top(a: "list[str]") -> str:
    # ES|QL TOP(field, limit, order): the top-N values as a multivalue —
    # collect + sort + slice (order literal folds at compile time)
    if len(a) != 3:
        raise ValueError('TOP takes (field, limit, "asc"|"desc")')
    om = re.match(r"^['\"](asc|desc)['\"]$", a[2].strip(), re.I)
    if not om or not re.match(r"^\d+$", a[1].strip()):
        raise ValueError('TOP takes (field, limit, "asc"|"desc")')
    asc = om.group(1).lower() == "asc"
    return (
        f"slice(sort_array(collect_list({a[0]}), "
        f"{'true' if asc else 'false'}), 1, {int(a[1])})"
    )


_FUNC_HANDLERS["TOP"] = _h_top


def _h_split(a: "list[str]") -> str:
    # ES|QL SPLIT's delimiter is a LITERAL string; Spark's split takes a
    # regex — escape the literal so both agree. Non-literal delimiters
    # would need runtime escaping; raise (keeps the portable contract).
    if len(a) != 2:
        raise ValueError("SPLIT takes (string, delimiter)")
    dm = re.match(r"^['\"](.*)['\"]$", a[1].strip(), re.S)
    if not dm:
        raise ValueError("SPLIT delimiter must be a string literal")
    # regex-escape the literal, then double the backslashes for the SQL
    # string literal (Spark parses '\.' as '.', losing the escape)
    esc = _re_escape(dm.group(1)).replace("\\", "\\\\")
    return f"split({a[0]}, '{esc}')"


def _h_date_trunc(a: "list[str]") -> str:
    # ES|QL DATE_TRUNC(1 day, ts) / DATE_TRUNC(6 hours, ts): exactly the
    # BUCKET span grammar — reuse its calendar/fixed-width compiler
    if len(a) != 2:
        raise ValueError("DATE_TRUNC takes (interval, date)")
    return _bucket_sql(a[1], a[0])


def _h_mv_median(a: "list[str]") -> str:
    # sorted middle; even counts average the two middle values. Result is
    # DOUBLE (documented deviation, same promotion as MV_AVG/MV_SUM)
    if len(a) != 1:
        raise ValueError("MV_MEDIAN takes 1 argument")
    s = f"sort_array({a[0]})"
    n = f"size({a[0]})"
    lo = f"get({s}, CAST(({n} - 1) / 2 AS INT))"
    hi = f"get({s}, CAST({n} / 2 AS INT))"
    return f"((CAST({lo} AS DOUBLE) + CAST({hi} AS DOUBLE)) / 2)"


def _h_mv_mad(a: "list[str]") -> str:
    # ES|QL MV_MEDIAN_ABSOLUTE_DEVIATION: median(|x - median(x)|) — the
    # sorted-middle helper applied twice (inner median folds into the
    # deviation transform). DOUBLE promotion like the MV math family.
    if len(a) != 1:
        raise ValueError("MV_MEDIAN_ABSOLUTE_DEVIATION takes 1 argument")
    med = _h_mv_median(a)
    dev = f"transform({a[0]}, v -> abs(CAST(v AS DOUBLE) - {med}))"
    return _h_mv_median([dev])


_FUNC_HANDLERS["SPLIT"] = _h_split
_FUNC_HANDLERS["DATE_TRUNC"] = _h_date_trunc
_FUNC_HANDLERS["MV_MEDIAN"] = _h_mv_median
_FUNC_HANDLERS["MV_MEDIAN_ABSOLUTE_DEVIATION"] = _h_mv_mad


def _h_hash(a: "list[str]") -> str:
    # ES|QL HASH("algorithm", input) — literal algorithm, hex output
    if len(a) != 2:
        raise ValueError('HASH takes ("algorithm", input)')
    hm = re.match(r"^['\"](\w+)['\"]$", a[0].strip())
    algs = {"md5": "md5({x})", "sha256": "sha2({x}, 256)",
            "sha1": "sha1({x})", "sha512": "sha2({x}, 512)"}
    if not hm or hm.group(1).lower() not in algs:
        raise ValueError(f"HASH algorithm must be a literal in {sorted(algs)}")
    return algs[hm.group(1).lower()].format(x=a[1])


def _h_mv_slice(a: "list[str]") -> str:
    # ES|QL MV_SLICE(field, start[, end]): 0-based, end INCLUSIVE,
    # negatives count from the end (-1 = last). Spark slice() is 1-based
    # (start, length) — translate with size()-relative CASEs so column
    # (non-literal) bounds work too; literal bounds constant-fold.
    if len(a) not in (2, 3):
        raise ValueError("MV_SLICE takes (field, start[, end])")
    arr, s, e = a[0], a[1], (a[2] if len(a) == 3 else a[1])
    def pos(i: str) -> str:
        return (f"(CASE WHEN ({i}) < 0 THEN size({arr}) + ({i})"
                f" ELSE ({i}) END)")
    return f"slice({arr}, {pos(s)} + 1, {pos(e)} - {pos(s)} + 1)"


def _h_mv_zip(a: "list[str]") -> str:
    # ES|QL MV_ZIP(a, b[, delim]) — pairwise string join, delim default ","
    if len(a) not in (2, 3):
        raise ValueError("MV_ZIP takes (a, b[, delimiter])")
    d = a[2] if len(a) == 3 else "','"
    return f"zip_with({a[0]}, {a[1]}, (x, y) -> concat(x, {d}, y))"


def _h_mv_percentile(a: "list[str]") -> str:
    # ES|QL MV_PERCENTILE(field, p): linear interpolation over the sorted
    # values at rank p/100*(n-1) — the same formula ES and numpy use.
    # DOUBLE promotion (same documented deviation as MV_AVG/MV_MEDIAN).
    if len(a) != 2:
        raise ValueError("MV_PERCENTILE takes (field, percentile)")
    s, n = f"sort_array({a[0]})", f"size({a[0]})"
    r = f"(CAST(({a[1]}) AS DOUBLE) / 100.0 * ({n} - 1))"
    lo = f"CAST(get({s}, CAST(floor({r}) AS INT)) AS DOUBLE)"
    hi = f"CAST(get({s}, CAST(ceil({r}) AS INT)) AS DOUBLE)"
    return f"({lo} + ({r} - floor({r})) * ({hi} - {lo}))"


def _h_mv_pseries(a: "list[str]") -> str:
    # MV_PSERIES_WEIGHTED_SUM(field, p): sum(v_i / i^p), i 1-based in
    # multivalue order — one indexed transform + fold, JVM-side
    if len(a) != 2:
        raise ValueError("MV_PSERIES_WEIGHTED_SUM takes (field, p)")
    return (
        f"aggregate(transform({a[0]},"
        f" (x, i) -> CAST(x AS DOUBLE) / pow(i + 1, CAST({a[1]} AS DOUBLE))),"
        f" 0D, (acc, v) -> acc + v)"
    )


def _h_ip_prefix(a: "list[str]") -> str:
    # IP_PREFIX(ip, v4_bits, v6_bits) — IPv4 only here (the corpus
    # derivation is v4); bits must be a literal so the mask folds
    if len(a) != 3:
        raise ValueError("IP_PREFIX takes (ip, prefixLengthV4, prefixLengthV6)")
    if not re.match(r"^\d+$", a[1].strip()):
        raise ValueError("IP_PREFIX v4 prefix length must be a literal")
    bits = int(a[1])
    if bits > 32:
        raise ValueError("IP_PREFIX v4 prefix length must be <= 32")
    mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
    m = f"({_ipv4_sql(a[0])} & {mask})"
    return (
        f"concat(CAST({m} DIV 16777216 AS STRING), '.',"
        f" CAST({m} DIV 65536 % 256 AS STRING), '.',"
        f" CAST({m} DIV 256 % 256 AS STRING), '.',"
        f" CAST({m} % 256 AS STRING))"
    )


# --- ES|QL spatial layer over WKT geo_point strings -----------------------
# geo_point columns are WKT 'POINT (lon lat)' strings (the ES|QL text
# encoding); parsing is substring/split arithmetic, no regex (portable,
# no escaping divergence). Aggregates return WKT/BBOX strings; the
# double->string->double round-trip is exact (shortest-repr), so chained
# ST_X(ST_CENTROID_AGG(...)) stays bit-stable.

def st_distance_sql(x1: str, y1: str, x2: str, y2: str) -> str:
    """Haversine meters between (lon, lat) pairs as ONE engine-portable
    SQL text (radians/sin/cos/asin/sqrt/pow only) — the same string runs
    as the Spark column and the DuckDB oracle (bit parity by
    construction, like operators/facets.geohash_sql). Mirrors
    operators/geo.haversine_m (EARTH_RADIUS_M)."""
    from elasticsearch_assets_spark.operators.geo import EARTH_RADIUS_M

    a = (
        f"(pow(sin((radians({y2}) - radians({y1})) / 2), 2)"
        f" + cos(radians({y1})) * cos(radians({y2}))"
        f" * pow(sin((radians({x2}) - radians({x1})) / 2), 2))"
    )
    return f"({2.0 * EARTH_RADIUS_M} * asin(sqrt({a})))"


def _wkt_coord(p: str, idx: int) -> str:
    # 'POINT (lon lat)' -> coordinate idx (1 = lon, 2 = lat)
    body = f"substring({p}, 8, length({p}) - 8)"
    return f"CAST(element_at(split({body}, ' '), {idx}) AS DOUBLE)"


def _bbox_coord(e: str, idx: int) -> str:
    # 'BBOX (minx, maxx, maxy, miny)' -> field idx
    body = f"substring({e}, 7, length({e}) - 7)"
    return f"CAST(element_at(split({body}, ', '), {idx}) AS DOUBLE)"


def _h_st_distance(a: "list[str]") -> str:
    if len(a) != 2:
        raise ValueError("ST_DISTANCE takes (geo_point, geo_point)")
    return st_distance_sql(
        _wkt_coord(a[0], 1), _wkt_coord(a[0], 2),
        _wkt_coord(a[1], 1), _wkt_coord(a[1], 2),
    )


def _h_st_centroid(a: "list[str]") -> str:
    if len(a) != 1:
        raise ValueError("ST_CENTROID_AGG takes 1 argument")
    x, y = _wkt_coord(a[0], 1), _wkt_coord(a[0], 2)
    return (
        f"concat('POINT (', CAST(avg({x}) AS STRING), ' ',"
        f" CAST(avg({y}) AS STRING), ')')"
    )


def _h_st_extent(a: "list[str]") -> str:
    if len(a) != 1:
        raise ValueError("ST_EXTENT_AGG takes 1 argument")
    x, y = _wkt_coord(a[0], 1), _wkt_coord(a[0], 2)
    return (
        f"concat('BBOX (', CAST(min({x}) AS STRING), ', ',"
        f" CAST(max({x}) AS STRING), ', ', CAST(max({y}) AS STRING), ', ',"
        f" CAST(min({y}) AS STRING), ')')"
    )


def _h_st_geohash(a: "list[str]") -> str:
    # ST_GEOHASH(point, precision): precision literal so the bit plan folds
    from elasticsearch_assets_spark.operators.facets import geohash_sql

    if len(a) != 2 or not re.match(r"^\d+$", a[1].strip()):
        raise ValueError("ST_GEOHASH takes (geo_point, literal precision)")
    return geohash_sql(_wkt_coord(a[0], 2), _wkt_coord(a[0], 1), int(a[1]))


_FUNC_HANDLERS["TO_GEOPOINT"] = lambda a: f"({a[0]})"
_FUNC_HANDLERS["TO_GEOSHAPE"] = lambda a: f"({a[0]})"
_FUNC_HANDLERS["ST_X"] = lambda a: _wkt_coord(a[0], 1)
_FUNC_HANDLERS["ST_Y"] = lambda a: _wkt_coord(a[0], 2)
_FUNC_HANDLERS["ST_XMIN"] = lambda a: _bbox_coord(a[0], 1)
_FUNC_HANDLERS["ST_XMAX"] = lambda a: _bbox_coord(a[0], 2)
_FUNC_HANDLERS["ST_YMAX"] = lambda a: _bbox_coord(a[0], 3)
_FUNC_HANDLERS["ST_YMIN"] = lambda a: _bbox_coord(a[0], 4)
def _env_coords(e: str) -> "tuple[str, str, str, str]":
    """(xmin, xmax, ymin, ymax) envelope of a WKT expr that is either a
    POINT (degenerate box) or a BBOX literal — branch folds when the
    WKT prefix is a literal."""
    isp = f"startswith(upper({e}), 'POINT')"
    px, py = _wkt_coord(e, 1), _wkt_coord(e, 2)
    bxmin, bxmax = _bbox_coord(e, 1), _bbox_coord(e, 2)
    bymax, bymin = _bbox_coord(e, 3), _bbox_coord(e, 4)

    def pick(p: str, b: str) -> str:
        return f"(CASE WHEN {isp} THEN {p} ELSE {b} END)"

    return pick(px, bxmin), pick(px, bxmax), pick(py, bymin), pick(py, bymax)


def _h_st_relation(rel: str):
    # ES|QL spatial relations over POINT/BBOX geometries: closed-interval
    # algebra per axis (the geo_shape envelope contract; anti-meridian
    # out of scope like the rest of the engine's geo predicates)
    def h(a: "list[str]") -> str:
        if len(a) != 2:
            raise ValueError(f"ST_{rel.upper()} takes (geomA, geomB)")
        ax0, ax1, ay0, ay1 = _env_coords(a[0])
        bx0, bx1, by0, by1 = _env_coords(a[1])
        inter = (
            f"(NOT ({ax1} < {bx0} OR {ax0} > {bx1} "
            f"OR {ay1} < {by0} OR {ay0} > {by1}))"
        )
        if rel == "intersects":
            return inter
        if rel == "disjoint":
            return f"(NOT {inter})"
        if rel == "contains":
            return (
                f"({ax0} <= {bx0} AND {ax1} >= {bx1} "
                f"AND {ay0} <= {by0} AND {ay1} >= {by1})"
            )
        # within: a inside b
        return (
            f"({ax0} >= {bx0} AND {ax1} <= {bx1} "
            f"AND {ay0} >= {by0} AND {ay1} <= {by1})"
        )

    return h


_FUNC_HANDLERS["ST_INTERSECTS"] = _h_st_relation("intersects")
_FUNC_HANDLERS["ST_DISJOINT"] = _h_st_relation("disjoint")
_FUNC_HANDLERS["ST_CONTAINS"] = _h_st_relation("contains")
_FUNC_HANDLERS["ST_WITHIN"] = _h_st_relation("within")
_FUNC_HANDLERS["ST_DISTANCE"] = _h_st_distance
_FUNC_HANDLERS["ST_CENTROID_AGG"] = _h_st_centroid
_FUNC_HANDLERS["ST_EXTENT_AGG"] = _h_st_extent
_FUNC_HANDLERS["ST_GEOHASH"] = _h_st_geohash

# names whose Spark spelling differs (the same-spelling ES|QL functions —
# REVERSE, REPEAT, BIT_LENGTH, CBRT, EXP, SIGNUM, ATAN2, SINH/COSH/TANH,
# HYPOT, LOG, LOG10, POW, PI, E, SPACE, MD5 — pass through untouched)
_FUNC_HANDLERS["BYTE_LENGTH"] = _h_rename("octet_length", 1)
_FUNC_HANDLERS["TO_BASE64"] = _h_rename("base64", 1)
_FUNC_HANDLERS["FROM_BASE64"] = lambda a: f"CAST(unbase64({a[0]}) AS STRING)"
_FUNC_HANDLERS["SHA256"] = lambda a: f"sha2({a[0]}, 256)"
_FUNC_HANDLERS["SHA1"] = _h_rename("sha1", 1)
_FUNC_HANDLERS["HASH"] = _h_hash
_FUNC_HANDLERS["MV_SLICE"] = _h_mv_slice
_FUNC_HANDLERS["MV_APPEND"] = _h_rename("concat", 2)
_FUNC_HANDLERS["MV_ZIP"] = _h_mv_zip
_FUNC_HANDLERS["MV_PERCENTILE"] = _h_mv_percentile
_FUNC_HANDLERS["MV_PSERIES_WEIGHTED_SUM"] = _h_mv_pseries
_FUNC_HANDLERS["IP_PREFIX"] = _h_ip_prefix


def _h_round_to(a: "list[str]") -> str:
    # ES|QL ROUND_TO(field, p1, p2, ...): round DOWN to the nearest of the
    # fixed points; values below every point clamp to the smallest point.
    # Points are literals in every documented use, so both the array and
    # the fallback min fold at compile time. Everything is promoted to
    # DOUBLE (the literals would otherwise parse as DECIMAL — CLAUDE.md's
    # cross-engine float gotcha).
    if len(a) < 2:
        raise ValueError("ROUND_TO takes (field, point, [point, ...])")
    pts = ", ".join(f"CAST({p} AS DOUBLE)" for p in a[1:])
    x = f"CAST({a[0]} AS DOUBLE)"
    return (
        f"coalesce(array_max(filter(array({pts}), v -> v <= {x})), "
        f"array_min(array({pts})))"
    )


# math/trig conversions (Spark spells these degrees/radians)
_FUNC_HANDLERS["TO_DEGREES"] = _h_rename("degrees", 1)
_FUNC_HANDLERS["TO_RADIANS"] = _h_rename("radians", 1)
# COPY_SIGN(magnitude, sign): Java Math.copySign minus the -0.0/NaN edge
# (documented deviation; test domain is finite non-zero)
_FUNC_HANDLERS["COPY_SIGN"] = lambda a: (
    f"(CASE WHEN CAST({a[1]} AS DOUBLE) < 0 THEN -abs({a[0]}) "
    f"ELSE abs({a[0]}) END)"
)
# SCALB(d, n) = d * 2^n (exact for the in-range integer n's ES|QL allows)
_FUNC_HANDLERS["SCALB"] = lambda a: (
    f"(CAST({a[0]} AS DOUBLE) * power(CAST(2.0 AS DOUBLE), {a[1]}))"
)
_FUNC_HANDLERS["ROUND_TO"] = _h_round_to
# aggregate spellings (STATS bodies): PERCENTILE is 0-100 scaled; Spark's
# percentile() is exact linear interpolation == DuckDB quantile_cont
# (documented deviation from ES's t-digest approximation). STD_DEV is the
# population form (ES std_deviation). VALUES returns the distinct set
# sorted for determinism (ES documents the order as unspecified).
_FUNC_HANDLERS["PERCENTILE"] = lambda a: (
    f"percentile({a[0]}, CAST({a[1]} AS DOUBLE) / 100.0)"
)
_FUNC_HANDLERS["STD_DEV"] = _h_rename("stddev_pop", 1)
_FUNC_HANDLERS["VALUES"] = lambda a: f"sort_array(collect_set({a[0]}))"

# type-conversion battery: TO_IP validates dotted-quad IPv4 (ES returns
# null + warning on a malformed ip; the null carries here, warnings are
# out of scope). TO_VERSION produces the SORTABLE canonical key of the
# semver-ish grammar ES's version field orders by — numeric fields
# zero-padded, prerelease (-suffix) ordered BEFORE release ('~' > '-' in
# ASCII); ES renders the original string while sorting by the key, so
# rows that KEEP the original and SORT by TO_VERSION observe ES order
# (documented deviation: the value itself is the key). TO_DATETIME takes
# epoch milliseconds (the ES long->datetime conversion); ISO strings go
# through DATE_PARSE. The epoch math is the tz-free timestampadd form.
_IPV4_OCTET = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_FUNC_HANDLERS["TO_IP"] = lambda a: (
    f"(CASE WHEN {a[0]} RLIKE '^{_IPV4_OCTET}(\\\\.{_IPV4_OCTET}){{3}}$' "
    f"THEN {a[0]} ELSE NULL END)"
)


def _h_to_version(a: "list[str]") -> str:
    if len(a) != 1:
        raise ValueError("TO_VERSION takes 1 argument")
    v = f"({a[0]})"

    def num(pat: str) -> str:
        return (
            f"lpad(coalesce(nullif(regexp_extract({v}, '{pat}', 1), ''), "
            f"'0'), 10, '0')"
        )

    maj = num("^([0-9]+)")
    mnr = num("^[0-9]+\\\\.([0-9]+)")
    pat = num("^[0-9]+\\\\.[0-9]+\\\\.([0-9]+)")
    pre = (
        f"CASE WHEN {v} RLIKE '-' THEN "
        f"concat('-', regexp_extract({v}, '-(.*)$', 1)) ELSE '~' END"
    )
    return f"concat({maj}, '.', {mnr}, '.', {pat}, {pre})"


_FUNC_HANDLERS["TO_VERSION"] = _h_to_version
_FUNC_HANDLERS["TO_DATETIME"] = lambda a: (
    f"timestampadd(MILLISECOND, CAST({a[0]} AS BIGINT), "
    f"TIMESTAMP '1970-01-01 00:00:00')"
)
_FUNC_RE = re.compile(r"(?<![\w.])(" + "|".join(_FUNC_HANDLERS) + r")\s*\(")


def _rewrite_funcs(text: str) -> str:
    """Rewrite ES|QL function spellings to Spark SQL, innermost-included
    (arguments are rewritten recursively; balanced parens and quoted
    strings respected). The ES|QL spellings are recognized UPPERCASE only
    — lowercase names pass through as Spark SQL, so `date_format(ts, f)`
    keeps Spark's argument order while `DATE_FORMAT(f, ts)` gets ES|QL's
    (documented deviation: ES|QL itself is case-insensitive).
    MV_SUM/MV_AVG promote to DOUBLE (documented deviation from ES's
    type-preserving multivalue math)."""
    m = _FUNC_RE.search(text)
    if not m:
        return text
    depth, j, in_str = 1, m.end(), None
    while j < len(text):
        ch = text[j]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:
        raise ValueError(f"unbalanced parens in {m.group(1)}(...)")
    args = [_rewrite_funcs(x) for x in _split_commas(text[m.end():j])]
    repl = _FUNC_HANDLERS[m.group(1).upper()](args)
    return text[: m.start()] + repl + _rewrite_funcs(text[j + 1:])


def _rewrite_like(text: str) -> str:
    """ES|QL LIKE uses * / ? wildcards on DOUBLE-quoted patterns
    (`source LIKE "src1*"`); SQL's % / _ spelling with single quotes
    passes through untouched (the same uppercase-vs-lowercase style of
    coexistence as the function layer). Compiles to an anchored RLIKE in
    the portable regex dialect."""

    def sub(m: "re.Match[str]") -> str:
        pat = m.group(2)
        body = "".join(
            ".*" if c == "*" else "." if c == "?" else _re_escape(c)
            for c in pat
        ).replace("\\", "\\\\")
        return f"{m.group(1) or ''}RLIKE '^{body}$'"

    def sub_r(m: "re.Match[str]") -> str:
        # ES|QL RLIKE is FULL-STRING (Lucene RegExp, implicitly
        # anchored); Spark's RLIKE is substring search — anchor it.
        # Double the backslashes for the SQL string literal.
        pat = m.group(2).replace("\\", "\\\\")
        return f"{m.group(1) or ''}RLIKE '^(?:{pat})$'"

    text = re.sub(r"\b(NOT\s+)?RLIKE\s+\"([^\"]*)\"", sub_r, text, flags=re.I)
    return re.sub(r"\b(NOT\s+)?LIKE\s+\"([^\"]*)\"", sub, text, flags=re.I)


_KNN_RE = re.compile(
    r"^\s*KNN\s*\(\s*([A-Za-z_]\w*)\s*,\s*\[([^\]]*)\]\s*,\s*(\d+)\s*\)\s*$",
    re.I | re.S,
)


def _knn_where(df: DataFrame, body: str):
    """ES|QL KNN function in WHERE (ES 9.1): `KNN(col, [v...], k)`
    restricts the pipe to the k rows nearest the literal query vector by
    cosine and emits the similarity as `_score` (the RERANK convention —
    METADATA _score stays the ranked engine's surface). Like the other
    full-text WHERE functions it must be the entire condition; compose
    with predicates as chained `| WHERE` steps (filter-during-search:
    a preceding WHERE restricts the candidate set BEFORE the top-k cut,
    exactly ES's knn filter semantics — tested).

    Deterministic: ties break on the frame's scalar columns left to
    right. Exact top-k here (one scan + TakeOrderedAndProject); at 10^12
    rows swap in the ANN variants (operators/similarity.py — LSH/IVF/BBQ
    prune the scan, the pipe shape is unchanged)."""
    m = _KNN_RE.match(body)
    if m is None:
        if re.search(r"(?<![\w.])KNN\s*\(", body, re.I):
            raise ValueError(
                "KNN must be the entire WHERE condition; compose with "
                "other predicates as chained `| WHERE` steps"
            )
        return None
    import math

    from elasticsearch_assets_spark.operators.similarity import (
        dot_expr, norm_expr,
    )

    col = m.group(1)
    vals = [float(x) for x in m.group(2).split(",")]
    k = int(m.group(3))
    q = F.array(*[F.lit(v) for v in vals])
    qn = math.sqrt(sum(v * v for v in vals))
    scored = df.withColumn(
        "_score", dot_expr(F.col(col), q) / (norm_expr(F.col(col)) * F.lit(qn))
    )
    simple = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() not in ("array", "map", "struct", "binary")
    ]
    return scored.orderBy(
        F.col("_score").desc(), *[F.col(c).asc() for c in simple]
    ).limit(k)


_FULLTEXT_RE = re.compile(
    r"^\s*(QSTR|KQL|MATCH_PHRASE)\s*\((.*)\)\s*$", re.I | re.S
)


def _fulltext_filter(body: str):
    """ES|QL full-text functions in WHERE (8.17+): QSTR (Lucene query
    string), KQL, MATCH_PHRASE. ES restricts these to WHERE clauses; this
    engine supports the single top-level call per WHERE — compose
    conjunctions as chained `| WHERE` steps (each is one Catalyst Filter;
    the plan is identical to an AND). Returns a Column, or None when the
    body contains no full-text call (the SQL-text path handles it).

    QSTR/KQL analyzed-field semantics follow the engine tokenizer
    contract over the default `text` column, exactly like the standalone
    query-string compiler (query/lucene.py). MATCH_PHRASE(col, phrase)
    compiles to the adjacency-regex plan of the filter-context phrase
    (positional-index-assisted RANKED phrase goes through
    InvertedIndex.search_phrase — same division as MATCH vs METADATA
    _score, documented)."""
    m = _FULLTEXT_RE.match(body)
    if m is None:
        if re.search(r"(?<![\w.])(QSTR|KQL|MATCH_PHRASE)\s*\(", body, re.I):
            raise ValueError(
                "full-text functions (QSTR/KQL/MATCH_PHRASE) must be the "
                "entire WHERE condition; compose with other predicates as "
                "chained `| WHERE` steps"
            )
        return None
    from elasticsearch_assets_spark.query.lucene import (
        Phrase, compile_filter, parse_kql, parse_lucene,
    )

    fn = m.group(1).upper()
    args = _split_commas(m.group(2))

    def lit(s: str) -> str:
        sm = re.match(r"^\s*(['\"])(.*)\1\s*$", s, re.S)
        if not sm:
            raise ValueError(f"{fn} needs a string literal, got {s!r}")
        return sm.group(2)

    if fn == "MATCH_PHRASE":
        if len(args) != 2:
            raise ValueError("MATCH_PHRASE takes (field, phrase)")
        col = args[0].strip()
        return compile_filter(
            Phrase(field=col, value=lit(args[1])),
            text_col=col, analyzed_fields={col},
        )
    if len(args) != 1:
        raise ValueError(f"{fn} takes one query-string argument")
    q = lit(args[0])
    ast = parse_kql(q) if fn == "KQL" else parse_lucene(q)
    return compile_filter(ast)


# ---------------------------------------------------------------------------
# TS — ES|QL time-series querying (ES 9.x, tech preview)
# ---------------------------------------------------------------------------

_OT_SIMPLE = {
    "AVG_OVER_TIME": "avg", "MIN_OVER_TIME": "min", "MAX_OVER_TIME": "max",
    "SUM_OVER_TIME": "sum", "COUNT_OVER_TIME": "count",
}
_OT_ALL = set(_OT_SIMPLE) | {"FIRST_OVER_TIME", "LAST_OVER_TIME", "RATE"}


def _ts_stats(df: DataFrame, body: str, meta: dict) -> DataFrame:
    """STATS under the TS source command (ES|QL time-series querying,
    ES 9.x): every aggregate must be `outer(inner(metric))` where the
    inner function is an over-time aggregation — RATE, AVG/MIN/MAX/SUM/
    COUNT/FIRST/LAST_OVER_TIME. The inner function is computed per time
    series per group (series identity = the index's dimension fields, the
    mapping-level `time_series_dimension` declaration ES keeps out-of-band
    of the query — here the `time_series` metadata passed to `esql()`);
    the outer aggregate then combines across series within the BY keys.

    Plan shape: TWO hash aggregations — stage 1 keyed by (dimensions x BY
    keys), stage 2 by the BY keys — both partial-aggregated; RATE adds one
    window pass keyed the same as stage 1 (lag per series per bucket, ts
    order) implementing the engine's ONE counter contract
    (reset-compensated increase / bucket seconds — identical math to
    operators/facets.py counter_rate, tested bit-equal). At 10^12 samples
    both shuffles are keyed by series x bucket, so million-series corpora
    spread evenly; nothing global.

    FIRST/LAST_OVER_TIME order by (ts, tiebreak) via min_by/max_by over a
    struct key — deterministic under timestamp ties when the metadata
    declares a tiebreak column."""
    from pyspark.sql.window import Window

    dims = list(meta["dimensions"])
    ts_col = meta.get("ts", "@timestamp")
    tiebreak = meta.get("tiebreak")
    m = re.search(r"\bBY\b", body, re.I)
    if not m:
        raise ValueError("TS STATS needs `BY` with a time BUCKET key")
    by_raw = [c.strip() for c in _split_commas(body[m.end():])]
    body = body[: m.start()].strip()

    aliases: list[str] = []
    rate_seconds: "int | None" = None
    staged = df
    for c in by_raw:
        nm = re.match(r"^([A-Za-z_]\w*)\s*=\s*(.+)$", c, re.S)
        alias, text = (nm.group(1), nm.group(2)) if nm else (c, None)
        if text is not None:
            bm = re.match(
                r"^BUCKET\(\s*[\w@.]+\s*,\s*(.+?)\s*\)$", text.strip(), re.I
            )
            if bm:
                tm = re.match(r"^(\d+)\s+([A-Za-z]+)$", bm.group(1))
                if tm and tm.group(2).lower() in _FIXED_SECONDS:
                    rate_seconds = (
                        int(tm.group(1)) * _FIXED_SECONDS[tm.group(2).lower()]
                    )
            staged = staged.withColumn(alias, _expr(text))
        elif alias not in staged.columns:
            raise ValueError(f"TS STATS BY column {alias!r} does not exist")
        aliases.append(alias)

    inner_aggs: list = []
    outer_aggs: list = []
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    for i, assign in enumerate(_split_commas(body)):
        am = re.match(
            r"^\s*([A-Za-z_]\w*)\s*=\s*(\w+)\s*\(\s*(\w+)\s*\(\s*([\w@.]+)"
            r"\s*\)\s*(?:,\s*(.+?))?\s*\)\s*$",
            assign, re.S,
        )
        if not am:
            raise ValueError(
                "TS STATS aggregates must be `name = outer(inner(metric))` "
                f"with inner one of {sorted(_OT_ALL)}: {assign!r}"
            )
        name, outer, inner, arg, extra = am.groups()
        iu = inner.upper()
        if iu not in _OT_ALL:
            raise ValueError(
                f"TS STATS inner function {inner!r} is not an over-time "
                f"aggregation (supported: {sorted(_OT_ALL)})"
            )
        col = f"__ot{i}"
        if iu == "RATE":
            if rate_seconds is None:
                raise ValueError(
                    "RATE needs a fixed-width time BUCKET in BY (its "
                    "per-second divisor) — e.g. BY h = BUCKET(ts, 1 hour)"
                )
            w = Window.partitionBy(
                *[F.col(d) for d in dims], *[F.col(a) for a in aliases]
            ).orderBy(*order)
            v = F.col(arg).cast("double")
            delta = v - F.lag(v, 1).over(w)
            contrib = (
                F.when(delta.isNull(), F.lit(0.0))
                .when(delta >= 0, delta)
                .otherwise(v)  # reset: the restarted counter's value
            )
            cc = f"__contrib{i}"
            staged = staged.withColumn(cc, contrib)
            inner_aggs.append((F.sum(cc) / float(rate_seconds)).alias(col))
        elif iu in ("FIRST_OVER_TIME", "LAST_OVER_TIME"):
            fn = "min_by" if iu.startswith("FIRST") else "max_by"
            key = f"struct({ts_col}, {tiebreak})" if tiebreak else ts_col
            inner_aggs.append(F.expr(f"{fn}({arg}, {key})").alias(col))
        else:
            inner_aggs.append(F.expr(f"{_OT_SIMPLE[iu]}({arg})").alias(col))
        outer_aggs.append(
            _expr(f"{outer}({col}{', ' + extra if extra else ''})").alias(name)
        )
    if not inner_aggs:
        raise ValueError("TS STATS needs at least one aggregation")
    g1 = staged.groupBy(
        *[F.col(d) for d in dims], *[F.col(a) for a in aliases]
    ).agg(*inner_aggs)
    return g1.groupBy(*[F.col(a) for a in aliases]).agg(*outer_aggs)


# ES|QL date-span arithmetic: `ts - 5 days` / `NOW() + 1 hour` — the span
# literal after a +/- becomes an INTERVAL (same spelling in Spark SQL and
# DuckDB). Anchored on the operator so BUCKET(ts, 1 hour) spans are
# untouched.
_SPAN_RE = re.compile(
    r"([+\-])\s*(\d+)\s+(second|minute|hour|day|week|month|year)s?\b", re.I
)


def _rewrite_spans(text: str) -> str:
    return _SPAN_RE.sub(
        lambda m: f"{m.group(1)} INTERVAL {m.group(2)} {m.group(3).upper()}",
        text,
    )


def _expr(text: str) -> F.Column:
    # ES|QL `==` is SQL `=`; `!=` passes through unchanged
    return F.expr(
        re.sub(
            r"(?<![!<>=])==", "=",
            _rewrite_match(
                _rewrite_bucket(
                    _rewrite_like(_rewrite_spans(_rewrite_funcs(text)))
                )
            ),
        )
    )


def esql(
    query: str,
    tables: "dict[str, DataFrame] | None" = None,
    spark: SparkSession | None = None,
    sf_dir: str | None = None,
    time_series: "dict[str, dict] | None" = None,
    now: "object | None" = None,
) -> DataFrame:
    """Run an ES|QL pipe. `tables` maps index names to DataFrames; or pass
    (spark, sf_dir) to resolve FROM against the standard test tables.

    `time_series` supplies the mapping-level metadata the TS source
    command needs (ES keeps it in the TSDS index mapping, out-of-band of
    the query): ``{index: {"dimensions": [cols], "ts": ts_col,
    "tiebreak": col?}}``.

    `now` pins NOW() to a datetime — REQUIRED when the query uses NOW()
    (an implicit wall clock would make plans non-reproducible across
    retries/resumes, the same determinism contract as everywhere else in
    the engine); date-span arithmetic (`NOW() - 5 days`, `ts + 1 hour`)
    compiles to INTERVAL literals."""
    if re.search(r"\bNOW\s*\(\s*\)", query, re.I):
        if now is None:
            raise ValueError(
                "NOW() needs an explicit pin: pass now=<datetime> "
                "(implicit wall clock would be non-reproducible)"
            )
        query = re.sub(
            r"\bNOW\s*\(\s*\)",
            f"TIMESTAMP '{now:%Y-%m-%d %H:%M:%S}'",
            query,
            flags=re.I,
        )
    def resolve(name: str) -> DataFrame:
        if tables is not None:
            if name not in tables:
                raise ValueError(f"unknown index {name!r}")
            return tables[name]
        if spark is None or sf_dir is None:
            raise ValueError("pass `tables` or (spark, sf_dir)")
        from elasticsearch_assets_spark.sources.tables import load_sf_table

        return load_sf_table(spark, sf_dir, name)

    def resolve_from(spec: str) -> DataFrame:
        """FROM accepts ES's comma lists and * patterns (`FROM a,logs-*`):
        every matching index unions by name, columns missing on a side
        fill with null (the ES cross-index mapping behavior). A trailing
        `METADATA _index` exposes the source index name as the `_index`
        column (the only metadata field with meaning here — _id/_score
        belong to the ranked engine, documented)."""
        import fnmatch

        with_index = False
        mm = re.search(r"\bMETADATA\s+(.+)$", spec, re.I)
        if mm:
            meta_fields = [f.strip() for f in mm.group(1).split(",")]
            bad = [f for f in meta_fields if f != "_index"]
            if bad:
                raise ValueError(
                    f"METADATA fields {bad} not supported (_index only; "
                    "_score/_id are the ranked engine's surface)"
                )
            with_index = True
            spec = spec[: mm.start()].strip()

        names: list[str] = []
        for part in (p.strip() for p in spec.split(",")):
            if "*" in part:
                if tables is None:
                    raise ValueError(
                        "FROM patterns need a `tables` dict to match against"
                    )
                hits = sorted(
                    n for n in tables if fnmatch.fnmatchcase(n, part)
                )
                if not hits:
                    raise ValueError(f"FROM pattern {part!r} matches nothing")
                names.extend(n for n in hits if n not in names)
            elif part and part not in names:
                names.append(part)
        if not names:
            raise ValueError("FROM needs an index name")

        def tagged(n: str) -> DataFrame:
            d = resolve(n)
            return d.withColumn("_index", F.lit(n)) if with_index else d

        out = tagged(names[0])
        for n in names[1:]:
            out = out.unionByName(tagged(n), allowMissingColumns=True)
        return out

    cmds = _split_pipes(query)
    if not cmds:
        raise ValueError("empty ES|QL query")
    # set by the TS source command; consumed by the first STATS
    ts_state: "dict[str, dict | None]" = {"meta": None}
    head = cmds[0].split(None, 1)
    if head[0].upper() == "ROW":
        # ROW a = 1, b = "x": a literal one-row source
        s = spark
        if s is None and tables:
            s = next(iter(tables.values())).sparkSession
        if s is None:
            raise ValueError("ROW needs a SparkSession (pass spark or tables)")
        df = s.range(1).select()
        if len(head) != 2:
            raise ValueError("ROW needs at least one `name = expr`")
        for assign in _split_commas(head[1]):
            m = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", assign, re.S)
            if not m:
                raise ValueError(f"ROW needs `name = expr`: {assign!r}")
            df = df.withColumn(m.group(1), _expr(m.group(2)))
    elif head[0].upper() == "FROM":
        if len(head) != 2 or not head[1].strip():
            raise ValueError("FROM needs an index name")
        df = resolve_from(head[1].strip())
    elif head[0].upper() == "TS":
        # ES|QL TS (9.x time-series querying): like FROM, but the first
        # STATS computes per-series inner over-time aggregations before
        # the outer aggregate (see _ts_stats)
        if len(head) != 2 or not head[1].strip():
            raise ValueError("TS needs an index name")
        name = head[1].strip()
        meta = (time_series or {}).get(name)
        if meta is None or "dimensions" not in meta:
            raise ValueError(
                f"TS {name!r} needs time-series metadata: pass "
                "time_series={index: {'dimensions': [...], 'ts': col}} "
                "(ES keeps this in the TSDS index mapping)"
            )
        df = resolve(name)
        ts_state["meta"] = meta
    else:
        raise ValueError("an ES|QL query must start with FROM, ROW or TS")

    def _step(df: DataFrame, cmd: str) -> DataFrame:
        kw = cmd.split(None, 1)[0].upper()
        body = cmd[len(kw):].strip()
        if kw == "FORK":
            # ES|QL FORK (8.19): run each parenthesized branch pipe over
            # the CURRENT frame and union the results by name (null fill),
            # discriminated by _fork = "fork<i>" in branch order. Catalyst
            # sees one Union plan; the shared prefix's scan is planned
            # once per branch but pruned/pushed identically.
            branches = _split_parens(body)
            if len(branches) < 2:
                raise ValueError("FORK needs at least two (branch) pipes")
            if len(branches) > 8:
                raise ValueError("FORK allows at most 8 branches (ES limit)")
            outs = []
            for i, br in enumerate(branches, start=1):
                b = df
                for sub in _split_pipes(br):
                    b = _step(b, sub)
                outs.append(b.withColumn("_fork", F.lit(f"fork{i}")))
            out = outs[0]
            for b in outs[1:]:
                out = out.unionByName(b, allowMissingColumns=True)
            return out
        if kw == "FUSE":
            # ES|QL FUSE (9.1, tech preview): merge FORK branches that
            # found the same document into one row with an RRF score —
            # `FUSE [rrf] [KEY BY col[, ...]] [RANK_CONSTANT n]`.
            # Per-branch rank = dense order of the branch's _score
            # (ties broken by key, deterministic); fused
            # _score = sum over branches of 1 / (rank_constant + rank);
            # the surviving row's other columns come from the
            # best-ranked branch (lowest rank, then branch order). All
            # window math over two exchanges (_fork then key) — no
            # self-join, no driver materialization.
            fm = re.match(
                r"^(?:(\w+)\s*)?(?:KEY\s+BY\s+([\w,\s]+?)\s*)?"
                r"(?:RANK_CONSTANT\s+(\d+)\s*)?$",
                body, re.I,
            )
            if not fm:
                raise ValueError(
                    "FUSE syntax: FUSE [rrf] [KEY BY col[, ...]] "
                    "[RANK_CONSTANT n]"
                )
            method = (fm.group(1) or "rrf").lower()
            if method not in ("rrf", "linear"):
                raise ValueError(
                    f"FUSE method {method!r} not supported (rrf | linear)"
                )
            keys = (
                [c.strip() for c in fm.group(2).split(",")]
                if fm.group(2) else ["_id"]
            )
            rc = int(fm.group(3) or 60)
            for need in ("_fork", "_score", *keys):
                if need not in df.columns:
                    raise ValueError(
                        f"FUSE needs column {need!r} (branches must EVAL "
                        "_score and the key before FORK unions them)"
                    )
            ks = ", ".join(keys)
            df = df.withColumn(
                "_rank",
                F.expr(
                    "row_number() OVER (PARTITION BY _fork "
                    f"ORDER BY _score DESC, {ks})"
                ),
            )
            if method == "linear":
                # linear fusion (the 8.16 linear retriever's math, window
                # form): per-branch minmax normalization — degenerate
                # branch (max == min) normalizes to 1.0, ES's edge rule —
                # then an unweighted sum over the key. Same two exchanges
                # as rrf; RANK_CONSTANT is meaningless here (rejected).
                if fm.group(3):
                    raise ValueError(
                        "RANK_CONSTANT applies to FUSE rrf, not linear"
                    )
                df = df.withColumn(
                    "_lo", F.expr("min(_score) OVER (PARTITION BY _fork)")
                ).withColumn(
                    "_hi", F.expr("max(_score) OVER (PARTITION BY _fork)")
                ).withColumn(
                    "_norm",
                    F.expr(
                        "CASE WHEN _hi = _lo THEN CAST(1 AS DOUBLE) "
                        "ELSE (_score - _lo) / (_hi - _lo) END"
                    ),
                )
                df = df.withColumn(
                    "_fused",
                    F.expr(f"sum(_norm) OVER (PARTITION BY {ks})"),
                ).withColumn(
                    "_keep",
                    F.expr(
                        f"row_number() OVER (PARTITION BY {ks} "
                        "ORDER BY _rank, _fork)"
                    ),
                )
                return (
                    df.where("_keep = 1")
                    .drop(
                        "_score", "_fork", "_rank", "_keep",
                        "_lo", "_hi", "_norm",
                    )
                    .withColumnRenamed("_fused", "_score")
                )
            df = df.withColumn(
                "_fused",
                F.expr(
                    # CAST: bare 1.0 parses as DECIMAL in Spark AND DuckDB
                    f"sum(CAST(1 AS DOUBLE) / ({rc} + _rank)) "
                    f"OVER (PARTITION BY {ks})"
                ),
            ).withColumn(
                "_keep",
                F.expr(
                    f"row_number() OVER (PARTITION BY {ks} "
                    "ORDER BY _rank, _fork)"
                ),
            )
            return (
                df.where("_keep = 1")
                .drop("_score", "_fork", "_rank", "_keep")
                .withColumnRenamed("_fused", "_score")
            )
        if kw == "RERANK":
            # ES|QL RERANK (9.x, tech preview): `RERANK "query" ON <col>`
            # re-scores the current frame's rows against the query text.
            # ES calls an inference endpoint; models are out of scope here
            # by the engine's declared boundary, so the scorer is the
            # DETERMINISTIC stand-in (same pattern as search_sparse's
            # tf-idf weights): _score = |query_terms ∩ doc_terms| / |query_terms|
            # + tf_sum / (100 * |query_terms|) — overlap-dominant with a
            # tf tiebreak, analyzed by the ONE tokenizer contract. The
            # PLAN is identical whichever scorer fills the column: one
            # projection, no shuffle. Documented deviation.
            rm = re.match(r"^(['\"])(.+?)\1\s+ON\s+(\w+)\s*$", body, re.S)
            if not rm:
                raise ValueError('RERANK needs `"query text" ON <column>`')
            qtext, col = rm.group(2), rm.group(3)
            if col not in df.columns:
                raise ValueError(f"RERANK column {col!r} does not exist")
            terms = sorted({t for t in re.findall(r"[a-z0-9]+", qtext.lower())})
            if not terms:
                raise ValueError("RERANK needs at least one analyzable term")
            toks = f"regexp_extract_all(lower({col}), '{_TOKEN_RE_SQL}', 0)"
            tlist = "array(" + ", ".join(f"'{t}'" for t in terms) + ")"
            n = len(terms)
            overlap = (
                f"size(array_intersect(array_distinct({toks}), {tlist}))"
            )
            tf_sum = (
                f"size(filter({toks}, x -> array_contains({tlist}, x)))"
            )
            return df.withColumn(
                "_score",
                F.expr(
                    f"CAST({overlap} AS DOUBLE) / {n}"
                    f" + CAST({tf_sum} AS DOUBLE) / {100 * n}"
                ),
            )
        if kw == "COMPLETION":
            # ES|QL COMPLETION (9.x, tech preview):
            #   `COMPLETION <target> = <prompt_expr> WITH <inference_id>`
            # ES calls an LLM inference endpoint; models are out of scope
            # by the engine's declared boundary (same as RERANK), so the
            # completion is the DETERMINISTIC stand-in: the inference id
            # tag + the prompt's first 8 analyzed tokens. The PLAN is the
            # real thing either way — one projection, no shuffle, prompt
            # built from row columns by any scalar expression.
            cm = re.match(
                r"^(\w+)\s*=\s*(.+?)\s+WITH\s+(\w+)\s*$", body, re.S
            )
            if not cm:
                raise ValueError(
                    "COMPLETION needs `<target> = <prompt_expr> WITH "
                    "<inference_id>`"
                )
            target, prompt_src, inference_id = cm.groups()
            prompt = _rewrite_funcs(prompt_src)
            toks = (
                f"regexp_extract_all(lower({prompt}), '{_TOKEN_RE_SQL}', 0)"
            )
            return df.withColumn(
                target,
                F.expr(
                    f"concat('[{inference_id}] ', "
                    f"array_join(slice({toks}, 1, 8), ' '))"
                ),
            )
        if kw == "CHANGE_POINT":
            # ES|QL CHANGE_POINT (8.18): `CHANGE_POINT <value> [ON <key>]`
            # appends `type`/`pvalue` columns, non-null only on the
            # detected row. Deterministic re-expression of the step
            # detector (facets.facet_change_point's pooled-mean argmax as
            # window math over the pipe frame — O(rows) window state, no
            # extra shuffle beyond the global sort). Documented deviation:
            # `pvalue` carries the mean-shift delta (the detector's
            # strength statistic), not an ML-estimated p-value.
            cm = re.match(r"^(\w+)(?:\s+ON\s+(\w+))?\s*$", body, re.I)
            if not cm:
                raise ValueError("CHANGE_POINT needs `<value> [ON <key>]`")
            val, key = cm.group(1), cm.group(2) or "@timestamp"
            for c in (val, key):
                if c not in df.columns:
                    raise ValueError(f"CHANGE_POINT column {c!r} does not exist")
            pre = (
                f"OVER (ORDER BY {key} ASC ROWS BETWEEN UNBOUNDED "
                "PRECEDING AND 1 PRECEDING)"
            )
            delta = (
                f"abs((sum({val}) OVER () - sum({val}) {pre})"
                f" / (count({val}) OVER () - count({val}) {pre})"
                f" - sum({val}) {pre} / count({val}) {pre})"
            )
            df = df.withColumn("_cp_delta", F.expr(delta)).withColumn(
                "_cp_rn",
                F.expr(
                    "row_number() OVER "
                    f"(ORDER BY _cp_delta DESC NULLS LAST, {key} ASC)"
                ),
            )
            # classify the detected row: when its POINT deviation (value
            # minus the neighbor midpoint) exceeds the mean-shift delta,
            # the excursion is a single sample — ES's spike/dip types —
            # else a level shift (step_change). Same global-sort window;
            # boundary rows (no neighbor) classify step_change.
            point_dev = (
                f"({val} - (lag({val}) OVER (ORDER BY {key} ASC) "
                f"+ lead({val}) OVER (ORDER BY {key} ASC)) / 2.0)"
            )
            df = df.withColumn("_cp_pd", F.expr(point_dev))
            typ = F.when(
                F.abs(F.col("_cp_pd")) > F.col("_cp_delta"),
                F.when(F.col("_cp_pd") > 0, F.lit("spike")).otherwise(
                    F.lit("dip")
                ),
            ).otherwise(F.lit("step_change"))
            flag = (F.col("_cp_rn") == 1) & F.col("_cp_delta").isNotNull()
            return (
                df.withColumn("type", F.when(flag, typ))
                .withColumn("pvalue", F.when(flag, F.col("_cp_delta")))
                .drop("_cp_delta", "_cp_rn", "_cp_pd")
            )
        if kw == "ENRICH":
            # ENRICH <policy> ON <match_field> WITH f1 [, f2 ...]
            em = re.match(
                r"^(\w+)\s+ON\s+(\w+)\s+WITH\s+(.+)$", body, re.I | re.S
            )
            if not em:
                raise ValueError(
                    "ENRICH needs `<policy> ON <field> WITH <fields>`"
                )
            policy = resolve(em.group(1))
            field = em.group(2)
            fields = [c.strip() for c in _split_commas(em.group(3))]
            if field not in df.columns:
                raise ValueError(
                    f"ENRICH match field {field!r} must exist on both sides"
                )
            if "shape" in policy.columns and field not in policy.columns:
                # GEO_MATCH-type enrich policy: the match field is a
                # POINT WKT, each policy row a BBOX shape. The policy is
                # planning-level tiny (ES materializes it into a
                # single-shard system index) — collect it and compile a
                # first-match-wins CASE chain of the closed-interval
                # relation per enrich field: pure JVM expressions, no
                # join at all. Deviation, documented: ES emits ALL
                # matching shapes as a multivalue; first policy-row
                # order wins here. Polygon shapes stay on the
                # geo.polygon_predicate surface (literal rings).
                missing = [c for c in fields if c not in policy.columns]
                if missing:
                    raise ValueError(
                        f"ENRICH WITH fields {missing} not in policy"
                    )
                rows = policy.select("shape", *fields).collect()
                for out_f in fields:
                    expr = F.lit(None)
                    for r in reversed(rows):
                        if not str(r["shape"]).upper().startswith("BBOX"):
                            raise ValueError(
                                "geo_match enrich supports BBOX shapes; "
                                "polygons go through geo.polygon_predicate"
                            )
                        cond = F.expr(
                            _rewrite_funcs(
                                f"ST_INTERSECTS({field}, '{r['shape']}')"
                            )
                        )
                        expr = F.when(cond, F.lit(r[out_f])).otherwise(expr)
                    df = df.withColumn(out_f, expr)
                return df
            lo, hi = f"{field}_lo", f"{field}_hi"
            if (
                field not in policy.columns
                and lo in policy.columns and hi in policy.columns
            ):
                # RANGE-type enrich policy (ES match on a range field):
                # the policy row matches when value in [lo, hi) — the
                # half-open convention of the numeric range mappings.
                # Same broadcast-left shape, non-equi condition; policy
                # ranges are expected DISJOINT (ES emits a multivalue on
                # overlap — this engine would emit one row per match,
                # the documented deviation).
                missing = [c for c in fields if c not in policy.columns]
                if missing:
                    raise ValueError(
                        f"ENRICH WITH fields {missing} not in policy"
                    )
                pol = F.broadcast(policy.select(lo, hi, *fields))
                cond = (df[field] >= pol[lo]) & (df[field] < pol[hi])
                df = df.join(pol, cond, "left").drop(lo, hi)
                return df
            if field not in policy.columns:
                raise ValueError(
                    f"ENRICH match field {field!r} must exist on both sides"
                )
            missing = [c for c in fields if c not in policy.columns]
            if missing:
                raise ValueError(f"ENRICH WITH fields {missing} not in policy")
            # an enrich policy is a small keyed lookup: broadcast left join
            # projecting ONLY the requested enrich fields (the ES policy's
            # enrich_fields list)
            df = df.join(
                F.broadcast(policy.select(field, *fields)), field, "left"
            )
            return df
        if kw == "SAMPLE":
            # SAMPLE <p> BY <col> — DETERMINISTIC variant of ES|QL's
            # random SAMPLE (documented deviation): row kept iff
            # md5('esql|'||col) hex prefix < the precomputed threshold, so
            # retries/pages replay identically (operators/sampling.py)
            sm = re.match(r"^([0-9.]+)\s+BY\s+(\w+)\s*$", body, re.I)
            if not sm:
                raise ValueError("SAMPLE needs `<probability> BY <column>`")
            p = float(sm.group(1))
            if not (0.0 <= p <= 1.0):
                raise ValueError("SAMPLE probability must be in [0, 1]")
            from elasticsearch_assets_spark.operators.sampling import (
                rate_threshold_hex,
            )

            key = sm.group(2)
            h = F.substring(
                F.md5(F.concat_ws("|", F.lit("esql"), F.col(key).cast("string"))),
                1, 8,
            )
            df = df.where(h < rate_threshold_hex(p))
            return df
        if kw == "LOOKUP":
            lm = re.match(r"^JOIN\s+(\w+)\s+ON\s+(\w+)\s*$", body, re.I)
            if not lm:
                raise ValueError("LOOKUP needs `JOIN <index> ON <field>`")
            lookup = resolve(lm.group(1))
            field = lm.group(2)
            if field not in df.columns or field not in lookup.columns:
                raise ValueError(
                    f"LOOKUP JOIN field {field!r} must exist on both sides"
                )
            # ES lookup indexes are single-shard small tables: broadcast,
            # left-outer (unmatched rows keep nulls, the ES contract)
            df = df.join(F.broadcast(lookup), field, "left")
            return df
        if kw == "MV_EXPAND":
            col = body.strip()
            if not col or len(col.split()) != 1:
                raise ValueError("MV_EXPAND needs exactly one column")
            if col not in df.columns:
                raise ValueError(f"MV_EXPAND column {col!r} does not exist")
            # null/empty arrays keep their row with a null (explode_outer,
            # the ES multivalue-expansion contract); column order preserved
            df = df.select(
                *[
                    F.explode_outer(F.col(c)).alias(c) if c == col else F.col(c)
                    for c in df.columns
                ]
            )
            return df
        if kw == "INLINESTATS":
            # ES|QL INLINESTATS (8.16): STATS results joined back onto the
            # input rows. Compiled as window aggregates over the BY keys
            # (empty BY = one global window) — ONE pass, no self-join, and
            # Catalyst keeps it a single Window node over a hash-partition
            # exchange on the keys.
            by = []
            m = re.search(r"\bBY\b", body, re.I)
            if m:
                by = [c.strip() for c in _split_commas(body[m.end():])]
                body = body[: m.start()].strip()
            for c in by:
                if not re.match(r"^[A-Za-z_]\w*$", c):
                    raise ValueError(
                        "INLINESTATS BY takes plain columns (EVAL a named "
                        f"expression first): {c!r}"
                    )
            part = f" PARTITION BY {', '.join(by)}" if by else ""
            for assign in _split_commas(body):
                am = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", assign, re.S)
                if not am:
                    raise ValueError(
                        f"INLINESTATS needs `name = agg(...)`: {assign!r}"
                    )
                df = df.withColumn(
                    am.group(1), _expr(f"{am.group(2)} OVER ({part.strip()})")
                )
            return df
        if kw == "WHERE":
            knn = _knn_where(df, body)
            if knn is not None:
                df = knn
            else:
                ft = _fulltext_filter(body)
                if ft is not None:
                    df = df.where(ft)
                else:
                    df = df.where(_expr(body))
        elif kw == "EVAL":
            for assign in _split_commas(body):
                m = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", assign, re.S)
                if not m:
                    raise ValueError(f"EVAL needs `name = expr`: {assign!r}")
                df = df.withColumn(m.group(1), _expr(m.group(2)))
        elif kw == "STATS":
            if ts_state["meta"] is not None:
                meta, ts_state["meta"] = ts_state["meta"], None
                return _ts_stats(df, body, meta)
            by: list[str] = []
            m = re.search(r"\bBY\b", body, re.I)
            if m:
                by = [c.strip() for c in _split_commas(body[m.end():])]
                body = body[: m.start()].strip()
            aggs = []
            for assign in _split_commas(body):
                am = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", assign, re.S)
                if not am:
                    raise ValueError(f"STATS needs `name = agg(...)`: {assign!r}")
                agg_body = am.group(2)
                # ES|QL 8.16 per-agg filters: `agg(...) WHERE cond` maps to
                # SQL's aggregate FILTER clause (still one hash agg)
                wm = re.search(r"\bWHERE\b", agg_body, re.I)
                if wm:
                    cond = re.sub(
                        r"(?<![!<>=])==", "=", agg_body[wm.end():].strip()
                    )
                    agg_body = (
                        f"{agg_body[: wm.start()].strip()} "
                        f"FILTER (WHERE {cond})"
                    )
                aggs.append(_expr(agg_body).alias(am.group(1)))
            if not aggs:
                raise ValueError("STATS needs at least one aggregation")
            by_cols = []
            for c in by:
                nm = re.match(r"^([A-Za-z_]\w*)\s*=\s*(.+)$", c, re.S)
                if nm:
                    # ES|QL named grouping keys: BY day = BUCKET(ts, 1 day)
                    by_cols.append(_expr(nm.group(2)).alias(nm.group(1)))
                    continue
                cm = re.match(r"^CATEGORIZE\(\s*(\w+)\s*\)$", c, re.I)
                if cm:
                    # ES|QL 8.18 STATS BY CATEGORIZE(field): the engine's
                    # deterministic log-template signature (digit tokens
                    # collapse to <num>, keyed by the first 4 normalized
                    # tokens — facets.facet_categorize_text, documented
                    # deviation from ES's drain-style ML categorizer)
                    src = cm.group(1)
                    by_cols.append(
                        F.expr(
                            f"concat_ws(' ', slice(transform(split({src}, ' '), "
                            "x -> CASE WHEN x RLIKE '[0-9]' THEN '<num>' "
                            "ELSE x END), 1, 4))"
                        ).alias("category")
                    )
                else:
                    by_cols.append(F.col(c))
            df = df.groupBy(*by_cols).agg(*aggs) if by else df.agg(*aggs)
        elif kw == "SORT":
            order = []
            for spec in _split_commas(body):
                sm = re.match(
                    r"^(\w+)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$",
                    spec.strip(), re.I,
                )
                if not sm:
                    raise ValueError(f"bad SORT direction: {spec!r}")
                col = F.col(sm.group(1))
                desc = (sm.group(2) or "ASC").upper() == "DESC"
                nulls = (sm.group(3) or "").upper()
                if desc:
                    c = col.desc_nulls_first() if nulls == "FIRST" else (
                        col.desc_nulls_last() if nulls == "LAST" else col.desc()
                    )
                else:
                    c = col.asc_nulls_first() if nulls == "FIRST" else (
                        col.asc_nulls_last() if nulls == "LAST" else col.asc()
                    )
                order.append(c)
            df = df.orderBy(*order)
        elif kw == "LIMIT":
            if not body.isdigit():
                raise ValueError(f"LIMIT needs an integer: {body!r}")
            df = df.limit(int(body))
        elif kw == "KEEP":
            # ES|QL KEEP supports * wildcards; order follows the pattern
            # list, first match wins (dedup)
            import fnmatch

            cols: list[str] = []
            for pat in (c.strip() for c in _split_commas(body)):
                if "*" in pat:
                    hits = [c for c in df.columns if fnmatch.fnmatchcase(c, pat)]
                    if not hits:
                        raise ValueError(f"KEEP pattern {pat!r} matches nothing")
                    cols.extend(h for h in hits if h not in cols)
                elif pat not in cols:
                    cols.append(pat)
            df = df.select(*cols)
        elif kw == "DROP":
            # DROP supports * wildcards like KEEP (ES|QL contract)
            import fnmatch

            drop: list[str] = []
            for pat in (c.strip() for c in _split_commas(body)):
                if "*" in pat:
                    hits = [
                        c for c in df.columns if fnmatch.fnmatchcase(c, pat)
                    ]
                    if not hits:
                        raise ValueError(
                            f"DROP pattern {pat!r} matches nothing"
                        )
                    drop.extend(h for h in hits if h not in drop)
                elif pat not in drop:
                    drop.append(pat)
            df = df.drop(*drop)
        elif kw == "RENAME":
            for spec in _split_commas(body):
                rm = re.match(r"^\s*(\w+)\s+AS\s+(\w+)\s*$", spec, re.I)
                if not rm:
                    raise ValueError(f"RENAME needs `old AS new`: {spec!r}")
                df = df.withColumnRenamed(rm.group(1), rm.group(2))
        elif kw in ("GROK", "DISSECT"):
            gm = re.match(r"^\s*(\w+)\s+(.+)$", body, re.S)
            if not gm:
                raise ValueError(f"{kw} needs `<column> \"<pattern>\"`")
            src, rest = gm.group(1), gm.group(2)
            if kw == "DISSECT":
                sep = ""
                am = re.search(
                    r"\s+APPEND_SEPARATOR\s*=\s*(['\"])(.*?)\1\s*$",
                    rest, re.I | re.S,
                )
                if am:
                    sep, rest = am.group(2), rest[: am.start()]
                regex, names = dissect_compile(_unquote(rest))
                return dissect_extract(df, src, regex, names, sep)
            regex, typed = grok_compile(_unquote(rest))
            for i, (fname, ftype) in enumerate(typed):
                ext = F.regexp_extract(F.col(src), regex, i + 1)
                # ES sets unmatched fields to null (regexp_extract gives '')
                col = F.when(ext != "", ext)
                if ftype != "string":
                    col = col.cast(ftype)
                df = df.withColumn(fname, col)
        elif kw in _KNOWN_UNSUPPORTED:
            raise ValueError(
                f"ES|QL command {kw} is not supported by this engine "
                f"(supported: {', '.join(_SUPPORTED)})"
            )
        else:
            raise ValueError(f"unknown ES|QL command {kw!r}")
        return df

    for cmd in cmds[1:]:
        df = _step(df, cmd)
    return df
