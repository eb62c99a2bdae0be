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
