"""ES Graph explore (`POST <index>/_graph/explore`), one hop.

Reference behavior: the Graph API starts from seed query terms, finds
the most SIGNIFICANT co-occurring terms (vertices — ranked by the same
foreground-vs-background significance the significant_terms agg uses,
the API's default), and reports the connections between seeds and
vertices weighted by their document overlap. Kibana's graph UI is this
API in a loop (one hop per interaction — multi-hop = re-seed with the
returned vertices, which composes naturally here).

Spark-first shape: ONE tokenize pass feeds everything — seed-doc
membership, foreground/background dfs, and the seed↔vertex overlap
counts (a semi-joined self-join bounded by |seeds| x |vertices| pairs).
No driver-side traversal; a hop is two hash aggregations and one
bounded join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from elasticsearch_assets_spark.operators.texthash import tokens_expr


def graph_explore(
    corpus: DataFrame,
    seed_terms: "list[str]",
    *,
    vertices: int = 5,
    min_doc_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One explore hop. Returns connections
    (source seed, target vertex, overlap doc_count, vertex_score),
    ordered (vertex_score DESC, target ASC, source ASC) — the top
    `vertices` significant co-occurring terms and their edges back to
    every seed they share >= 1 document with."""
    if not seed_terms:
        raise ValueError("graph explore needs at least one seed term")
    seeds = sorted(set(seed_terms))
    dt = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("term"),
    )
    seed_docs = (
        dt.where(F.col("term").isin(seeds))
        .select(F.col(id_col))
        .distinct()
    )
    fg_total = seed_docs.count()
    bg_total = corpus.count()
    if fg_total == 0:
        return corpus.sparkSession.createDataFrame(
            [], "source string, target string, doc_count long, "
                "vertex_score double",
        )
    fg = (
        dt.join(seed_docs, id_col, "left_semi")
        .where(~F.col("term").isin(seeds))
        .groupBy("term")
        .agg(F.count("*").alias("fg_df"))
        .where(F.col("fg_df") >= int(min_doc_count))
    )
    bg = dt.groupBy("term").agg(F.count("*").alias("bg_df"))
    top = (
        fg.join(bg, "term")
        .select(
            "term",
            (
                (F.col("fg_df") / F.lit(float(fg_total)))
                / (F.col("bg_df") / F.lit(float(bg_total)))
            ).alias("vertex_score"),
        )
        .orderBy(F.col("vertex_score").desc(), F.col("term").asc())
        .limit(int(vertices))
    )
    # seed <-> vertex edges: overlap doc counts via one self-join of the
    # (doc, term) relation restricted to seeds on one side and the
    # broadcast vertex set on the other — |seeds| x |vertices| pairs max
    sd = dt.where(F.col("term").isin(seeds)).select(
        F.col(id_col), F.col("term").alias("source")
    )
    vd = dt.join(
        F.broadcast(top.select(F.col("term").alias("target"))),
        dt["term"] == F.col("target"),
    ).select(F.col(id_col), "target")
    edges = (
        sd.join(vd, id_col)
        .groupBy("source", "target")
        .agg(F.count("*").alias("doc_count"))
    )
    return (
        edges.join(
            F.broadcast(top.withColumnRenamed("term", "target")), "target"
        )
        .select("source", "target", "doc_count", "vertex_score")
        .orderBy(
            F.col("vertex_score").desc(),
            F.col("target").asc(),
            F.col("source").asc(),
        )
    )
