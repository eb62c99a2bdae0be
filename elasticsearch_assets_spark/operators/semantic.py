"""Semantic search — ES `semantic_text` / `semantic` query (8.15+)
re-expressed with the declared-model-boundary stand-in embedder.

In ES, a `semantic_text` field runs every document (and every query) through
an inference endpoint and ranks by vector similarity; the interesting part
for a 10^12-doc engine is NOT the model but the plan: embed once per doc at
ingest (a map-only pass), embed the query at planning time, rank by cosine
with an exact or ANN cut. Here the embedder is the deterministic
hashed-unigram stand-in (the RERANK / COMPLETION / inference-processor
pattern: models stay a declared boundary, the plan is model-agnostic):

    d             = md5('sb1' || term)            (ONE hash per token)
    bucket(term)  = int(d[0:15], 16) % dim
    value(term)   = (int(d[15:30], 16) % 2001) - 1000            (integer)
    emb_j(doc)    = sum over tokens with bucket == j of value    (integer)

Dimensions are INTEGER sums — exact under any evaluation order and in both
engines — and the only float arithmetic is the final
`dot / (sqrt(nd) * sqrt(nq))`, so the DuckDB twin is bit-identical by
construction (the quantize_embeddings / int-cent doctrine from CLAUDE.md).
A real deployment swaps the per-doc embedding projection for a
mapInPandas batch-inference pass and keeps everything downstream unchanged.

Scale shape: embedding is a zero-shuffle projection (one md5 pair per
token, `dim` cheap integer folds over a staged struct array); ranking is
one scan + TakeOrderedAndProject. At 10^12 docs, persist the embedded
corpus once and reuse the ANN variants (operators/similarity.py) — the
cut is embedder-agnostic.
"""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import Column, DataFrame, functions as F

from elasticsearch_assets_spark.operators.texthash import (
    tokens_expr,
    tokens_sql,
)

SEM_DIM = 8
_B_SEED = "sb1"
_V_MOD = 2001
_V_HALF = 1000


def _pairs_expr(toks: Column, dim: int) -> Column:
    """(bucket, value) struct per token from ONE md5 per token — the digest
    has 32 hex chars, chars 1-15 drive the bucket and chars 16-30 the
    value (independent 60-bit draws from one hash; measured 2x on the
    sf0.1 bench row vs hashing twice). Staged so the downstream folds
    reuse it (the dsir staging rule: inlined, Catalyst re-runs hashes per
    fold)."""
    def pair(t: Column) -> Column:
        d = F.md5(F.concat(F.lit(_B_SEED), t))
        j = F.conv(F.substring(d, 1, 15), 16, 10).cast("long") % dim
        v = (
            F.conv(F.substring(d, 16, 15), 16, 10).cast("long") % _V_MOD
            - _V_HALF
        )
        return F.struct(j.alias("j"), v.alias("v"))

    return F.transform(toks, pair)


def _emb_fold(pairs: Column, dim: int) -> Column:
    """All `dim` integer dimensions in ONE pass over the (bucket, value)
    pairs — an array accumulator updated per token, so the md5 pair runs
    once per token regardless of dim (the first cut folded per dimension:
    Catalyst inlines the staged transform into every fold, which made the
    cost linear in dim — measured before rewriting)."""
    zero = F.lit(0).cast("long")
    init = F.array_repeat(zero, dim)
    return F.aggregate(
        pairs,
        init,
        lambda acc, x: F.transform(
            acc, lambda a, i: a + F.when(x["j"] == i, x["v"]).otherwise(zero)
        ),
    )


def embed_local(text: str, dim: int = SEM_DIM) -> list[int]:
    """Python twin of the embedder (query planning + oracle constants).
    Token rule mirrors texthash.TOKEN_RE for the ASCII range the contract
    rows exercise."""

    vec = [0] * dim
    for t in re.findall(r"[^\W_]+", text.lower(), re.UNICODE):
        d = hashlib.md5((_B_SEED + t).encode()).hexdigest()
        vec[int(d[:15], 16) % dim] += (int(d[15:30], 16) % _V_MOD) - _V_HALF
    return vec


def _dot_norm_pandas(dim: int, qvec: list[int], id_col: str):
    """mapInPandas batch kernel: (id, tokens) -> (id, dot, nd) as exact
    int64. md5 runs once per UNIQUE token per Arrow batch (a web corpus's
    batch vocabulary is a small fraction of its token stream); the
    per-occurrence work is a vectorized np scatter-add — no per-row
    Python, the batch-inference shape the module docstring promises.
    Integer dims are order-free, so this is bit-identical to the SQL
    fold (tested) and to the DuckDB twin by construction."""
    import numpy as np
    import pandas as pd

    q = np.asarray(qvec, dtype=np.int64)

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            toks = pdf["_toks"]
            # NULL text rows arrive as None: embed to the zero vector,
            # dropped downstream by `_nd > 0` — same as the SQL path
            lens = np.fromiter(
                (0 if t is None else len(t) for t in toks),
                np.int64, count=n,
            )
            if int(lens.sum()) == 0:
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "_dot": np.zeros(n, np.int64),
                        "_nd": np.zeros(n, np.int64),
                    }
                )
                continue
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks
                 if t is not None and len(t)]
            )
            uniq, inv = np.unique(flat.astype("U"), return_inverse=True)
            uj = np.empty(len(uniq), np.int64)
            uv = np.empty(len(uniq), np.int64)
            for i, u in enumerate(uniq):
                d = hashlib.md5((_B_SEED + u).encode()).hexdigest()
                uj[i] = int(d[:15], 16) % dim
                uv[i] = int(d[15:30], 16) % _V_MOD - _V_HALF
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            emb = np.zeros((n, dim), np.int64)
            np.add.at(emb, (rows, uj[inv]), uv[inv])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "_dot": emb @ q,
                    "_nd": (emb * emb).sum(axis=1),
                }
            )

    return fn


def semantic_topk(
    corpus: DataFrame,
    query_text: str,
    k: int = 10,
    *,
    dim: int = SEM_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    engine: str = "pandas",
) -> DataFrame:
    """ES `semantic` query: embed the query at planning time, rank the
    corpus by cosine in the integer-exact stand-in space, return the top k
    (score DESC, id ASC). Docs embedding to the zero vector can't rank
    (no direction — the cosine is undefined) and are dropped, ES's
    missing-inference-result shape.

    `engine="pandas"` (default) embeds via the vectorized mapInPandas
    batch kernel — md5 once per unique token per Arrow batch, np
    scatter-add per occurrence (measured 3-4x on the 200k-page corpus vs
    the pure-SQL fold, which pays md5 + a dim-wide array update per
    occurrence). `engine="sql"` keeps the zero-Python column-expression
    chain; integer dims make the two bit-identical (tested) — the
    contract-row oracle covers both by construction."""
    if engine not in ("pandas", "sql"):
        raise ValueError(
            f"engine must be 'pandas' or 'sql', got {engine!r}"
        )
    qvec = embed_local(query_text, dim)
    nq = sum(v * v for v in qvec)
    if nq == 0:
        return corpus.select(
            F.col(id_col).cast("long").alias(id_col),
            F.lit(0.0).alias("score"),
        ).limit(0)
    staged = corpus.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("_toks")
    )
    if engine == "pandas":
        dn_df = staged.mapInPandas(
            _dot_norm_pandas(dim, qvec, id_col),
            schema=f"{id_col} long, _dot long, _nd long",
        )
        score = F.col("_dot").cast("double") / (
            F.sqrt(F.col("_nd").cast("double")) * F.lit(math.sqrt(float(nq)))
        )
        return (
            dn_df.where(F.col("_nd") > 0)
            .select(F.col(id_col), score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k)
        )
    staged = staged.select(
        F.col(id_col), _pairs_expr(F.col("_toks"), dim).alias("_pv")
    )
    emb = staged.select(
        F.col(id_col), _emb_fold(F.col("_pv"), dim).alias("_emb")
    )
    # dot and squared norm in one pass over the dim array — the emb fold
    # is referenced exactly once, so the whole chain (tokens -> pairs ->
    # dims -> (dot, nd)) evaluates each token's md5 pair a single time
    q_arr = F.array(*[F.lit(int(v)).cast("long") for v in qvec])
    zero = F.lit(0).cast("long")
    dn = F.aggregate(
        F.zip_with(
            F.col("_emb"),
            q_arr,
            lambda e, q: F.struct(
                (e * q).alias("d"), (e * e).alias("n")
            ),
        ),
        F.struct(zero.alias("d"), zero.alias("n")),
        lambda a, x: F.struct(
            (a["d"] + x["d"]).alias("d"), (a["n"] + x["n"]).alias("n")
        ),
    )
    score = F.col("_dot").cast("double") / (
        F.sqrt(F.col("_nd").cast("double")) * F.lit(math.sqrt(float(nq)))
    )
    return (
        emb.select(F.col(id_col), dn.alias("_dn"))
        .select(
            F.col(id_col),
            F.col("_dn")["d"].alias("_dot"),
            F.col("_dn")["n"].alias("_nd"),
        )
        .where(F.col("_nd") > 0)
        .select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def semantic_sql(
    query_text: str,
    k: int = 10,
    *,
    dim: int = SEM_DIM,
    text: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin: same integer dims via unnest + group-by (a different
    plan, the SAME integers), same single float expression at the end."""
    qvec = embed_local(query_text, dim)
    nq = sum(v * v for v in qvec)
    qrows = ", ".join(f"({j}, {v})" for j, v in enumerate(qvec))
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({tokens_sql(text)}) AS term FROM {table}
),
vals AS (
  SELECT {id_col},
         ('0x' || substr(d, 1, 15))::BIGINT % {dim} AS j,
         (('0x' || substr(d, 16, 15))::BIGINT % {_V_MOD}) - {_V_HALF} AS v
  FROM (SELECT {id_col}, md5('{_B_SEED}' || term) AS d FROM toks)
),
emb AS (SELECT {id_col}, j, sum(v) AS e FROM vals GROUP BY 1, 2),
q(j, qe) AS (VALUES {qrows}),
agg AS (
  SELECT {id_col}, sum(e * qe) AS d, sum(e * e) AS nd
  FROM emb JOIN q USING (j) GROUP BY {id_col}
)
SELECT {id_col},
       round(d::DOUBLE / (sqrt(nd::DOUBLE) * sqrt({float(nq)!r})), 4) AS score
FROM agg WHERE nd > 0
ORDER BY d::DOUBLE / (sqrt(nd::DOUBLE) * sqrt({float(nq)!r})) DESC,
         {id_col} ASC
LIMIT {k}
"""
