"""ES|QL (Elasticsearch's piped query language, ES 8.11+) compiled to
DataFrame plans.

Supported subset — the analytics core of the language:

    FROM <index>
  | WHERE <expr>
  | EVAL <name> = <expr> [, <name> = <expr> ...]
  | STATS <name> = <agg>(<expr>) [, ...] [BY <col> [, ...]]
  | SORT <col> [ASC|DESC] [, ...]
  | LIMIT <n>
  | KEEP <col> [, ...]
  | DROP <col> [, ...]
  | RENAME <old> AS <new> [, ...]

Expression dialect: expressions compile through `F.expr`, i.e. Spark SQL —
the engine's ONE script dialect (the same contract as script_score /
script queries / update_by_query), with ES|QL's `==` accepted as sugar
for `=`. Every command is declarative, so Catalyst sees the whole pipe as
one plan: WHERE pushes into the scan, STATS is a partial-aggregated hash
agg, SORT+LIMIT collapses to TakeOrderedAndProject. Unsupported commands
(DISSECT, GROK, ENRICH, MV_EXPAND, ...) raise with guidance.

Reference behavior: the ES|QL docs' command semantics; the reference repo
predates ES|QL but its users' Kibana-side aggregations are exactly the
FROM|WHERE|STATS shape, which is why the subset starts there.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_SUPPORTED = (
    "FROM", "WHERE", "EVAL", "STATS", "SORT", "LIMIT", "KEEP", "DROP",
    "RENAME",
)
_KNOWN_UNSUPPORTED = (
    "DISSECT", "GROK", "ENRICH", "MV_EXPAND", "LOOKUP", "ROW", "SHOW",
)


def _split_pipes(q: str) -> list[str]:
    """Split on top-level `|` (quotes respected; ES|QL has no nested
    pipes)."""
    parts, buf, in_str = [], [], None
    for ch in q:
        if in_str:
            if ch == in_str:
                in_str = None
            buf.append(ch)
        elif ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
        elif ch == "|":
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


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


def _expr(text: str) -> F.Column:
    # ES|QL `==` is SQL `=`; `!=` passes through unchanged
    return F.expr(re.sub(r"(?<![!<>=])==", "=", text))


def esql(
    query: str,
    tables: "dict[str, DataFrame] | None" = None,
    spark: SparkSession | None = None,
    sf_dir: str | None = None,
) -> DataFrame:
    """Run an ES|QL pipe. `tables` maps index names to DataFrames; or pass
    (spark, sf_dir) to resolve FROM against the standard test tables."""
    cmds = _split_pipes(query)
    if not cmds:
        raise ValueError("empty ES|QL query")
    head = cmds[0].split(None, 1)
    if head[0].upper() != "FROM":
        raise ValueError("an ES|QL query must start with FROM")
    if len(head) != 2 or not head[1].strip():
        raise ValueError("FROM needs an index name")
    name = head[1].strip()
    if tables is not None:
        if name not in tables:
            raise ValueError(f"unknown index {name!r}")
        df = tables[name]
    else:
        if spark is None or sf_dir is None:
            raise ValueError("pass `tables` or (spark, sf_dir)")
        from elasticsearch_assets_spark.sources.tables import load_sf_table

        df = load_sf_table(spark, sf_dir, name)

    for cmd in cmds[1:]:
        kw = cmd.split(None, 1)[0].upper()
        body = cmd[len(kw):].strip()
        if kw == "WHERE":
            df = df.where(_expr(body))
        elif kw == "EVAL":
            for assign in _split_commas(body):
                m = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", assign, re.S)
                if not m:
                    raise ValueError(f"EVAL needs `name = expr`: {assign!r}")
                df = df.withColumn(m.group(1), _expr(m.group(2)))
        elif kw == "STATS":
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
                aggs.append(_expr(am.group(2)).alias(am.group(1)))
            if not aggs:
                raise ValueError("STATS needs at least one aggregation")
            df = df.groupBy(*[F.col(c) for c in by]).agg(*aggs) if by else df.agg(*aggs)
        elif kw == "SORT":
            order = []
            for spec in _split_commas(body):
                toks = spec.split()
                col = F.col(toks[0])
                desc = len(toks) > 1 and toks[1].upper() == "DESC"
                if len(toks) > 1 and toks[1].upper() not in ("ASC", "DESC"):
                    raise ValueError(f"bad SORT direction: {spec!r}")
                order.append(col.desc() if desc else col.asc())
            df = df.orderBy(*order)
        elif kw == "LIMIT":
            if not body.isdigit():
                raise ValueError(f"LIMIT needs an integer: {body!r}")
            df = df.limit(int(body))
        elif kw == "KEEP":
            df = df.select(*[c.strip() for c in _split_commas(body)])
        elif kw == "DROP":
            df = df.drop(*[c.strip() for c in _split_commas(body)])
        elif kw == "RENAME":
            for spec in _split_commas(body):
                rm = re.match(r"^\s*(\w+)\s+AS\s+(\w+)\s*$", spec, re.I)
                if not rm:
                    raise ValueError(f"RENAME needs `old AS new`: {spec!r}")
                df = df.withColumnRenamed(rm.group(1), rm.group(2))
        elif kw in _KNOWN_UNSUPPORTED:
            raise ValueError(
                f"ES|QL command {kw} is not supported by this engine "
                f"(supported: {', '.join(_SUPPORTED)})"
            )
        else:
            raise ValueError(f"unknown ES|QL command {kw!r}")
    return df
