"""ES _rank_eval: offline ranking-quality metrics — precision@k, recall@k,
MRR, NDCG@k — over (ranked results, graded judgments).

The expensive work is the search that produced `results` (top-k per query,
so ≤ M×k rows); the judgment table is human-sized by construction (ES's
_rank_eval request carries it inline). Everything here is window + hash-agg
math over those two small relations — the per-query windows partition by
query_id, so even a million-query evaluation batch spreads across the
cluster with no global sort.

Reference surface: the reference ships documents INTO Elasticsearch and
trusts its ranking; _rank_eval is ES's own measurement API for that ranking
(metric definitions from the ES search ranking evaluation docs), needed
here because this engine OWNS the ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
) -> DataFrame:
    """`results`: (query_id, doc_id, score) — e.g. InvertedIndex.msearch
    output. `judgments`: (query_id, doc_id, grade int); relevant means
    grade > 0; unjudged result docs count grade 0 (the ES default).

    Returns per-query (query_id, precision_k, recall_k, mrr, ndcg),
    query_id ASC, with the ES metric definitions:

      precision@k = |relevant ∩ top-k| / k       (ES divides by k)
      recall@k    = |relevant ∩ top-k| / |relevant|   (0 when no judgments)
      MRR         = 1 / rank of the first relevant hit (0 if none in top-k)
      NDCG@k      = DCG@k / IDCG@k,  DCG = Σ (2^grade − 1) / log2(rank + 1)

    Ranks are assigned over the full-precision scores with the engine's
    deterministic tie-break (score DESC, doc_id ASC); the ideal ranking
    for IDCG orders (grade DESC, doc_id ASC)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    topk = (
        results.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .join(
            judgments.select("query_id", "doc_id", "grade"),
            ["query_id", "doc_id"],
            "left",
        )
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
    )
    hit = (F.col("grade") > 0).cast("int")
    per = topk.groupBy("query_id").agg(
        (F.sum(hit) / F.lit(float(k))).alias("precision_k"),
        F.sum(hit).cast("double").alias("hits"),
        F.coalesce(
            F.max(F.when(F.col("grade") > 0, 1.0 / F.col("rank"))), F.lit(0.0)
        ).alias("mrr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
            / F.log2(F.col("rank") + 1.0)
        ).alias("dcg"),
    )
    rel = judgments.where(F.col("grade") > 0)
    totals = rel.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    wj = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc()
    )
    ideal = (
        rel.withColumn("irank", F.row_number().over(wj))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )
    return (
        per.join(totals, "query_id", "left")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            "precision_k",
            F.coalesce(F.col("hits") / F.col("n_rel"), F.lit(0.0)).alias(
                "recall_k"
            ),
            "mrr",
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
        )
        .orderBy(F.col("query_id").asc())
    )


def expected_reciprocal_rank(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    max_grade: int = 3,
) -> DataFrame:
    """ES _rank_eval's expected_reciprocal_rank (Chapelle et al. 2009):

        R_r  = (2^grade_r - 1) / 2^max_grade
        ERR  = sum_r (1/r) * R_r * prod_{i<r} (1 - R_i)

    `max_grade` is ES's maximum_relevance. Unjudged docs grade 0
    (R = 0 — they keep the continuation probability intact).

    Determinism note: the cascade is a SEQUENTIAL fold, so it is computed
    as one F.aggregate over the rank-sorted per-query grade array —
    exact float64 multiply/add in rank order, bit-identical to any
    engine folding the same sequence (the DuckDB oracle's recursive CTE
    multiplies in the same order). Per-query arrays are <= k elements;
    the window + collect stays partitioned by query_id."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    topk = (
        results.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .join(
            judgments.select("query_id", "doc_id", "grade"),
            ["query_id", "doc_id"],
            "left",
        )
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
    )
    denom = float(1 << max_grade)
    per = topk.groupBy("query_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rank"), F.col("grade")))
        ).alias("hits")
    )
    state0 = F.struct(
        F.lit(0.0).alias("err"), F.lit(1.0).alias("p")
    )
    def step(acc, x):
        r = (F.pow(F.lit(2.0), x["grade"].cast("double")) - 1.0) / F.lit(denom)
        return F.struct(
            (acc["err"] + acc["p"] * r / x["rank"].cast("double")).alias("err"),
            (acc["p"] * (1.0 - r)).alias("p"),
        )
    return per.select(
        "query_id",
        F.aggregate(F.col("hits"), state0, step)["err"].alias("err"),
    ).orderBy(F.col("query_id").asc())
