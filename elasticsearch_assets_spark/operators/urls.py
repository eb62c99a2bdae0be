"""URL canonicalization + URL-level dedup (training-data pipeline).

Common-Crawl-style pipelines dedup by canonical URL before any content
hashing (the cheapest dedup pass: one key shuffle, no text touched).
The canonicalization is ONE engine-portable SQL expression — the same
string runs as a Spark JVM column (F.expr) and as the DuckDB oracle —
built from LIKE/substr/lower/regexp_extract only (no regexp replacement
backrefs, whose syntax differs between Java and RE2).

Canonical form (documented, deterministic):
  1. trim surrounding whitespace
  2. drop the #fragment
  3. lowercase the scheme://host[:port] prefix (path/query untouched)
  4. drop default ports (http :80, https :443)
  5. drop ONE trailing slash when a path exists and there is no query

Non-URL strings pass through steps 1-2 unchanged (no scheme prefix ->
nothing to lowercase), which keeps the op total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_PREFIX_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*"


def canonical_url_sql(col: str) -> str:
    """Portable SQL computing the canonical URL of `col`."""
    u = (
        f"CASE WHEN instr(trim({col}), '#') > 0 "
        f"THEN substr(trim({col}), 1, instr(trim({col}), '#') - 1) "
        f"ELSE trim({col}) END"
    )
    p = f"lower(regexp_extract({u}, '{_PREFIX_RE}', 0))"
    rest = f"substr({u}, length({p}) + 1)"
    p2 = (
        f"CASE WHEN {p} LIKE 'http://%:80' "
        f"THEN substr({p}, 1, length({p}) - 3) "
        f"WHEN {p} LIKE 'https://%:443' "
        f"THEN substr({p}, 1, length({p}) - 4) "
        f"ELSE {p} END"
    )
    rest2 = (
        f"CASE WHEN length({rest}) > 1 AND {rest} LIKE '%/' "
        f"AND instr({rest}, '?') = 0 "
        f"THEN substr({rest}, 1, length({rest}) - 1) "
        f"ELSE {rest} END"
    )
    return f"concat({p2}, {rest2})"


def url_host_sql(col: str) -> str:
    """Portable SQL extracting the lowercased host (no port) of `col`."""
    return f"lower(regexp_extract(trim({col}), '://([^/:?#]+)', 1))"


def canonical_url(col: str) -> Column:
    return F.expr(canonical_url_sql(col))


def url_host(col: str) -> Column:
    return F.expr(url_host_sql(col))


def canonicalize_urls(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Append canonical_url + host columns — a map-only zero-shuffle
    pass (whole-stage codegen)."""
    return df.withColumn(
        "canonical_url", canonical_url(url_col)
    ).withColumn("host", url_host(url_col))


def dedup_by_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup: one row per canonical URL, keeping the
    smallest id (deterministic keep-first). ONE hash agg keyed by the
    canonical url — the shuffle carries (url, partial min/count) pairs,
    never the documents."""
    c = canonical_url(url_col)
    return (
        df.groupBy(c.alias("canonical_url"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy(F.col("canonical_url").asc())
    )


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """Crawl-snapshot drift report: per canonical URL, compare the two
    snapshots' content fingerprints — `unchanged` / `changed` (recrawl
    candidates) / `added` / `removed`. The incremental-crawl bookkeeping
    every recurring web pipeline runs before deciding what to refetch.

    Inputs carry one row per URL (canonicalize + dedup first —
    dedup_by_url); plan: ONE full-outer equi-join on the canonical URL
    (AQE-balanced; URLs are high-cardinality, skew-free keys), status is
    a pure projection."""
    o = old.select(
        canonical_url(url_col).alias("curl"), F.col(fp_col).alias("old_fp")
    )
    n = new.select(
        canonical_url(url_col).alias("curl"), F.col(fp_col).alias("new_fp")
    )
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "curl", "full_outer").select(
        "curl", "old_fp", "new_fp", status.alias("status")
    )


def url_quality_sql(
    col: str,
    blocked_domains: "list[str]",
    bad_exts: "tuple[str, ...]" = ("xml", "rss", "css", "js", "png", "jpg"),
    max_depth: int = 6,
    max_query: int = 64,
) -> "dict[str, str]":
    """RefinedWeb-style URL pre-filters as portable SQL texts (one string
    evaluated verbatim by Spark and DuckDB — the shared-SQL-text
    pattern): blocked_domain (host == d or endswith .d), bad_ext
    (path extension blocklist), deep_path (more than `max_depth` path
    segments — the crawler-trap signal), long_query (querystring longer
    than `max_query`), and keep = NOT any. Returns {flag: sql_text}.

    These run BEFORE fetching/parsing content — at crawl scale the URL
    filter is the cheapest quality gate in the pipeline (string math
    only, zero shuffle, whole-stage codegen)."""
    if not blocked_domains:
        raise ValueError("url_quality_sql needs at least one blocked domain")
    host = url_host_sql(col)
    pfx = f"regexp_extract(trim({col}), '{_PREFIX_RE}', 0)"
    after = f"substr(trim({col}), length({pfx}) + 1)"
    path = (
        f"(CASE WHEN instr({after}, '?') > 0 "
        f"THEN substr({after}, 1, instr({after}, '?') - 1) "
        f"ELSE {after} END)"
    )
    query = (
        f"(CASE WHEN instr({after}, '?') > 0 "
        f"THEN substr({after}, instr({after}, '?') + 1) ELSE '' END)"
    )
    blocked = " OR ".join(
        f"{host} = '{d}' OR {host} LIKE '%.{d}'"
        for d in sorted(blocked_domains)
    )
    bad = " OR ".join(f"lower({path}) LIKE '%.{e}'" for e in bad_exts)
    flags = {
        "blocked_domain": f"({blocked})",
        "bad_ext": f"({bad})",
        "deep_path": (
            f"(length({path}) - length(replace({path}, '/', '')) "
            f"> {int(max_depth)})"
        ),
        "long_query": f"(length({query}) > {int(max_query)})",
    }
    flags["keep"] = (
        "(NOT (" + " OR ".join(flags[f] for f in
                               ("blocked_domain", "bad_ext", "deep_path",
                                "long_query")) + "))"
    )
    return flags


def url_quality_flags(
    df: DataFrame,
    url_col: str,
    blocked_domains: "list[str]",
    **kwargs,
) -> DataFrame:
    """Column form of url_quality_sql: input plus the five flag columns."""
    for name, sql in url_quality_sql(url_col, blocked_domains, **kwargs).items():
        df = df.withColumn(name, F.expr(sql))
    return df
