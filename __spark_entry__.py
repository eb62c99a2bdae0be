"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the inverted index over the sf0.001
``documents`` corpus and answer a conjunctive BM25 top-k query.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each runnable at any sf_dir and checked against DuckDB.

Floating-point protocol for oracle comparison: every float column is rounded
to 4 decimals on BOTH sides, and any top-k cut is taken on the exact score
with (score DESC, doc_id ASC) tie-break in both engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.index.stats import B, K1
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.sources.tables import load_sf_table

# ---------------------------------------------------------------------------
# index cache: build once per (sf_dir) per process
# ---------------------------------------------------------------------------
_INDEX_CACHE: dict[str, InvertedIndex] = {}


def _docs_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        idx_dir = os.path.join(
            "/tmp", "esa_indexes", key.strip("/").replace("/", "_") + "_documents"
        )
        if not os.path.exists(os.path.join(idx_dir, "meta.json")):
            docs = load_sf_table(spark, sf_dir, "documents")
            build_index(
                spark, docs, idx_dir, id_col="doc_id", text_col="text",
                num_segments=8, num_chunks=1,
            )
        _INDEX_CACHE[key] = InvertedIndex(spark, idx_dir)
    return _INDEX_CACHE[key]


# ---------------------------------------------------------------------------
# BM25 oracle SQL template (DuckDB) — same formula as query/bm25.py
# ---------------------------------------------------------------------------


def _bm25_sql(terms: list[str], mode: str, k: int | None) -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    nterms = len(set(terms))
    having = f"HAVING count(*) = {nterms}" if mode == "and" else ""
    limit = (
        f"ORDER BY s DESC, doc_id ASC LIMIT {k}" if k is not None else ""
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({tlist}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS s
  FROM stats, tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id
  {having}
)
SELECT doc_id, round(s, 4) AS score FROM scored {limit}
"""


def _bm25_query(terms: list[str], mode: str, k: int | None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = _docs_index(spark, sf_dir)
        res = idx.search(terms, k=k, mode=mode)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    return run


# ---------------------------------------------------------------------------
# Half A reader-semantics queries (SURVEY.md §2.2, §2.5, §2.7)
# ---------------------------------------------------------------------------


def _date_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: [start inclusive, end exclusive) date-range slice + projection (P1)."""
    ev = load_sf_table(spark, sf_dir, "events")
    return ev.where(
        (F.col("ts") >= F.lit("2024-01-03 00:00:00")) & (F.col("ts") < F.lit("2024-01-05 00:00:00"))
    ).select("event_id", "ts", "event_type")


def _minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: earliest/latest date probe (reference sort+size-1, ours is an agg)."""
    ev = load_sf_table(spark, sf_dir, "events")
    return ev.agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"))


def _slice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: count per candidate interval — the planner's one aggregate."""
    ev = load_sf_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").alias("cnt")
    )


def _id_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/A2: keyspace prefix predicate over a hex key (id_slicer semantics)."""
    docs = load_sf_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    return docs.withColumn("doc_key", key).where(
        F.col("doc_key").startswith("a")
    ).select("doc_id", "doc_key")


def _id_prefix_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: count per key prefix (depth 1) — id-slicer planning aggregate."""
    docs = load_sf_table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("prefix")
    ).agg(F.count("*").alias("cnt"))


def _term_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: count-without-fetch from the stats table (no corpus scan)."""
    idx = _docs_index(spark, sf_dir)
    return spark.createDataFrame([(idx.count_term("spark"),)], "cnt long")


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 conjunctive top-10 over the sf0.001 documents corpus."""
    return _bm25_query(["spark", "join"], "and", 10)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_and_all": _bm25_query(["spark", "join"], "and", None),
        "bm25_and_topk": _bm25_query(["query", "merge", "scan"], "and", 10),
        "bm25_or_all": _bm25_query(["spark", "table"], "or", None),
        "bm25_single_term": _bm25_query(["filter"], "and", None),
        "term_count": _term_count,
        "date_range_scan": _date_range_scan,
        "minmax_dates": _minmax_dates,
        "slice_histogram": _slice_histogram,
        "id_prefix_scan": _id_prefix_scan,
        "id_prefix_histogram": _id_prefix_histogram,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_and_all": _bm25_sql(["spark", "join"], "and", None),
        "bm25_and_topk": _bm25_sql(["query", "merge", "scan"], "and", 10),
        "bm25_or_all": _bm25_sql(["spark", "table"], "or", None),
        "bm25_single_term": _bm25_sql(["filter"], "and", None),
        "term_count": (
            "SELECT count(*)::BIGINT AS cnt FROM documents "
            "WHERE list_contains(string_split(text, ' '), 'spark')"
        ),
        "date_range_scan": (
            "SELECT event_id, ts, event_type FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-05 00:00:00'"
        ),
        "minmax_dates": "SELECT min(ts) AS min_ts, max(ts) AS max_ts FROM events",
        "slice_histogram": (
            "SELECT date_trunc('hour', ts) AS bucket, count(*) AS cnt FROM events GROUP BY 1"
        ),
        "id_prefix_scan": (
            "SELECT doc_id, md5(doc_id::VARCHAR) AS doc_key FROM documents "
            "WHERE md5(doc_id::VARCHAR) LIKE 'a%'"
        ),
        "id_prefix_histogram": (
            "SELECT substr(md5(doc_id::VARCHAR), 1, 1) AS prefix, count(*) AS cnt "
            "FROM documents GROUP BY 1"
        ),
    }
