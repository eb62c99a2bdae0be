"""Hard-negative mining for retrieval training data.

Dense-retriever training (DPR, Karpukhin et al. 2020; the
sentence-transformers mining recipe) wants, for every training query, the
top-ranked documents under a LEXICAL retriever that are NOT the query's
labeled positives — the "hard" negatives a dual encoder learns most from
(random negatives are trivially separable).

Scale shape: all queries ride ONE fused msearch segment scan (the
batched-query amortization measured in bench q_msearch8_fused vs
_separate — M queries ~ 1 scan); the positive labels are tiny next to the
corpus, so they remove with a broadcast left-anti join; the final k cut
re-ranks the surviving <= |queries| x depth rows with one window. Nothing
downstream of the scan ever touches raw postings.

Reference surface: the reference's facade batches search bodies through
ES _msearch (/root/reference/asset/elasticsearch_reader/index.js); the
mining recipe itself is the published DPR/sentence-transformers pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mine_hard_negatives(
    idx,
    queries: "list[tuple[int, object]]",
    positives: DataFrame,
    k: int = 5,
    depth: int = 20,
    mode: str = "or",
) -> DataFrame:
    """Per training query, the `k` highest-BM25 docs that are not in
    `positives` — candidates come from the query's top `depth` (ES
    mining convention: retrieve deeper than you keep, so anti-joined
    positives don't starve the negative set).

    `queries` is [(query_id, text-or-term-list)]; `positives` a
    DataFrame with (query_id, doc_id). Returns (query_id, doc_id,
    score, rank) with rank 1..k per query, ordered (query_id, rank)."""
    if k < 1 or depth < k:
        raise ValueError("need k >= 1 and depth >= k")
    if not queries:
        raise ValueError("mine_hard_negatives needs at least one query")
    searches = [{"query": q, "mode": mode, "k": depth} for _, q in queries]
    res = idx.msearch(searches)
    # msearch query ids are positional — map back to the caller's ids
    qid_map = F.create_map(
        *[
            F.lit(x)
            for i, (qid, _q) in enumerate(queries)
            for x in (i, qid)
        ]
    )
    res = res.select(
        qid_map[F.col("query_id")].alias("query_id"), "doc_id", "score"
    )
    neg = res.join(
        F.broadcast(positives.select("query_id", "doc_id")),
        ["query_id", "doc_id"],
        "left_anti",
    )
    ranked = neg.withColumn(
        "rank",
        F.expr(
            "row_number() OVER (PARTITION BY query_id "
            "ORDER BY score DESC, doc_id ASC)"
        ),
    )
    return ranked.where(F.col("rank") <= k).orderBy("query_id", "rank")


def ict_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_sentences: int = 2,
) -> DataFrame:
    """Inverse Cloze Task pairs (Lee et al. 2019, ORQA) — the standard
    self-supervised pre-training data for dense retrievers: one sentence
    per document becomes the pseudo-QUERY, the remaining sentences (in
    order) the pseudo-CONTEXT the retriever must find. The picked
    sentence index is a deterministic 60-bit hash of the doc id modulo
    the sentence count (replayable under retries — a sampled pick is
    not), mirroring the mixture/sampling ops' md5-cut convention.

    Plan: pure array expressions over one corpus scan — split/trim/
    filter, one element_at pick, one concat of the rest. ZERO shuffle;
    at 10^12 docs this is a map-only pass, the cheapest possible shape.
    Docs with < `min_sentences` sentences are dropped (no context would
    remain).

    Returns (id, n_sents, pick, query_sent, context)."""
    sep_lit = sep.replace("\\", "\\\\").replace("'", "\\'")
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    sents = F.expr(
        f"filter(transform(split({text_col}, '{sep_lit}'), s -> trim(s)),"
        " s -> s != '')"
    )
    base = df.select(F.col(id_col), sents.alias("_s")).where(
        F.size("_s") >= int(min_sentences)
    )
    pick = F.pmod(
        hash60_expr(F.col(id_col).cast("string")), F.size("_s")
    ).cast("int")
    out = base.withColumn("pick", pick).select(
        id_col,
        F.size("_s").cast("long").alias("n_sents"),
        F.col("pick").cast("long").alias("pick"),
        F.element_at(F.col("_s"), F.col("pick") + 1).alias("query_sent"),
        F.array_join(
            F.concat(
                F.slice(F.col("_s"), 1, F.col("pick")),
                F.expr("slice(_s, pick + 2, size(_s) - pick - 1)"),
            ),
            " ",
        ).alias("context"),
    )
    return out
