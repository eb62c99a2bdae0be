"""Percolate queries: match documents against a table of STORED queries.

Elasticsearch's percolator (`percolate` query over a `percolator`-mapped
index) inverts search — queries are indexed, documents are the probe. The
reference reaches this through ES; here the stored queries are a (tiny)
DataFrame and percolation is one declarative plan:

    corpus --tokenize+explode--> (doc_id, term)      [one pass, no UDF]
      JOIN broadcast(queries exploded to (query_id, term, msm))
      GROUP BY (doc_id, query_id)  HAVING n_matched >= msm

Query semantics: each stored query is a term set plus a
minimum_should_match m (m = |terms| is the AND query, m = 1 the OR query —
the same msm algebra as the search engine's kernels). Terms are analyzed
with the engine's tokenizer contract (analysis/tokenizer.py), so a stored
query matches exactly the docs `search(terms, min_should_match=m)` would.

Scale shape: the query table broadcasts (percolator sets are KBs–MBs);
the corpus is tokenized ONCE regardless of query count; the only shuffle
carries matched (doc, query) pairs with their partial counts — map-side
combined, never the raw token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from elasticsearch_assets_spark.operators.texthash import tokens_expr


def make_queries(spark, specs: list[tuple[int, list[str], int]]) -> DataFrame:
    """Build a stored-query table from (query_id, terms, msm) triples.
    msm <= 0 means 'all terms' (the AND query)."""
    rows = [
        (int(qid), sorted(set(terms)), int(msm) if msm > 0 else len(set(terms)))
        for qid, terms, msm in specs
    ]
    return spark.createDataFrame(
        rows, "query_id long, terms array<string>, msm long"
    )


def percolate(
    queries: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, query_id) pairs where the doc satisfies the stored query
    — ordered (doc_id ASC, query_id ASC). `queries` has columns
    (query_id, terms array<string>, msm long); see `make_queries`."""
    qx = queries.select(
        "query_id", "msm", F.explode("terms").alias("term")
    )
    doc_terms = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("term"),
    )
    matched = doc_terms.join(F.broadcast(qx), "term").groupBy(
        "doc_id", "query_id"
    ).agg(
        F.count("*").alias("n_matched"), F.first("msm").alias("_msm")
    )
    return (
        matched.where(F.col("n_matched") >= F.col("_msm"))
        .select("doc_id", "query_id")
        .orderBy(F.col("doc_id").asc(), F.col("query_id").asc())
    )


def make_filtered_queries(
    spark, specs: "list[tuple[int, list[str], int, str | None]]"
) -> DataFrame:
    """Stored queries with an optional per-query FILTER condition:
    (query_id, terms, msm, cond) — `cond` is a Spark SQL boolean over the
    document row (the engine's one script dialect; None = no filter).
    This is the ES percolator's real shape: stored queries are full query
    bodies (bool: match terms + range/term filters), not bare term sets."""
    rows = [
        (
            int(qid),
            sorted(set(terms)),
            int(msm) if msm > 0 else len(set(terms)),
            cond,
        )
        for qid, terms, msm, cond in specs
    ]
    if any(not r[1] for r in rows):
        raise ValueError(
            "every stored query needs at least one term (a pure-filter "
            "percolator query would be a full-corpus scan per query — "
            "express it as a WHERE on the corpus instead)"
        )
    return spark.createDataFrame(
        rows, "query_id long, terms array<string>, msm long, cond string"
    )


def percolate_filtered(
    queries: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """percolate() plus per-query document filters: a doc matches a
    stored query iff the term/msm clause holds AND the query's `cond`
    (when present) evaluates true on the doc row.

    Plan: the term/msm stage is percolate()'s broadcast-join shape and
    PRUNES candidates first (term selectivity bounds the pair stream);
    the surviving (doc, query) pairs join back to the corpus row once,
    and ALL queries' conditions compile into ONE CASE chain on query_id
    (planning-level collect of the tiny query table) — per-query filters
    never scan the corpus independently."""
    base = percolate(queries, corpus, text_col, id_col)
    conds = [
        (r["query_id"], r["cond"])
        for r in queries.select("query_id", "cond").collect()
        if r["cond"]
    ]
    if not conds:
        return base
    keep = F.lit(None).cast("boolean")
    for qid, cond in reversed(conds):
        keep = F.when(F.col("query_id") == qid, F.expr(cond)).otherwise(keep)
    keep = F.coalesce(keep, F.lit(True))  # queries without cond
    joined = base.join(
        corpus.withColumnRenamed(id_col, "doc_id"), "doc_id"
    )
    return (
        joined.where(keep)
        .select("doc_id", "query_id")
        .orderBy(F.col("doc_id").asc(), F.col("query_id").asc())
    )
