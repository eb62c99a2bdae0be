"""ES SQL (`POST _sql`): SQL over indexes, with full-text extensions.

Reference behavior: ES ships a SQL interface whose dialect is ANSI-ish
SQL plus full-text predicates — MATCH(field, 'query') and SCORE() — over
index data (the ES SQL docs). Kibana/ODBC users live on it.

Spark-first shape: the engine's tables ARE DataFrames, so _sql is a thin
facade — register the frames as temp views, rewrite the ES-specific
spellings (MATCH compiles through the same tokenizer-contract rewrite
ES|QL's WHERE uses), and hand the query to Catalyst. SCORE() requires a
ranking context and is deliberately routed to the index engine instead
(use InvertedIndex.search / search_querystring — documented boundary:
ES SQL's SCORE() is only defined WHERE a full-text predicate filters,
and the engine's ranked surface already covers that shape).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from elasticsearch_assets_spark.query.esql import _rewrite_match


def es_sql(
    query: str,
    tables: "dict[str, DataFrame]",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Run an ES-SQL query over `tables` (index name -> DataFrame).

    MATCH(col, 'terms') compiles to the analyzed filter-context
    predicate (AND over tokenizer-contract terms). SCORE() raises with
    guidance. Views are registered under the given names for THIS query
    and dropped afterward — no session-global namespace pollution."""
    if not tables:
        raise ValueError("es_sql needs at least one table")
    if re.search(r"\bSCORE\s*\(\s*\)", query, re.I):
        raise ValueError(
            "SCORE() needs the ranked engine — use InvertedIndex.search / "
            "search_querystring (ES SQL defines SCORE() only under a "
            "full-text predicate, which is exactly the indexed surface)"
        )
    s = spark or next(iter(tables.values())).sparkSession
    rewritten = _rewrite_match(query)
    names = []
    try:
        for name, df in tables.items():
            if not re.match(r"^[A-Za-z_]\w*$", name):
                raise ValueError(f"bad table name {name!r}")
            df.createOrReplaceTempView(name)
            names.append(name)
        out = s.sql(rewritten)
        # materialize the PLAN before dropping the views (Catalyst
        # resolves eagerly at sql(); execution later is view-independent)
        return out
    finally:
        for name in names:
            s.catalog.dropTempView(name)
