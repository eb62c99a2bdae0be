"""BM25 scoring math — single definition shared by the engine and the oracle.

Formula (Lucene-style BM25, the ranking the reference gets implicitly from
Elasticsearch at /root/reference/asset/elasticsearch_reader/reader.js:13):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(d,t) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(d,Q)  = Σ_{t∈Q, sorted} idf(t) * tfnorm(d,t)

Determinism contract (SURVEY.md §7.3(1)): float64 everywhere; per-document
accumulation iterates query terms in sorted order, so scores are bit-identical
for any partition/segment count. Tie-break is (score DESC, doc_id ASC).
"""

from __future__ import annotations

import math

import numpy as np

from elasticsearch_assets_spark.analysis.tokenizer import tokenize
from elasticsearch_assets_spark.index.stats import B, K1


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf, dl, avgdl: float, k1: float = K1, b: float = B):
    """Vectorized (numpy or scalar) document-side factor."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_oracle(
    docs: dict[int, str],
    query_terms: list[str],
    k: int = 10,
    mode: str = "and",
    k1: float = K1,
    b: float = B,
) -> list[tuple[int, float]]:
    """Naive, obviously-correct BM25 over an in-memory corpus.

    The rank-parity reference for the distributed engine (SURVEY.md §5(2)).
    """
    terms = sorted(set(query_terms))
    toks = {d: tokenize(t) for d, t in docs.items()}
    n = len(docs)
    dls = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dls.values()) / n if n else 0.0
    tfs = {d: {} for d in docs}
    for d, ts in toks.items():
        for t in ts:
            if t in terms:
                tfs[d][t] = tfs[d].get(t, 0) + 1
    dfs = {t: sum(1 for d in docs if t in tfs[d]) for t in terms}
    out = []
    for d in docs:
        present = [t for t in terms if t in tfs[d]]
        if mode == "and" and len(present) != len(terms):
            continue
        if not present:
            continue
        score = 0.0
        for t in terms:  # sorted order — canonical accumulation
            if t in tfs[d]:
                score += idf(n, dfs[t]) * float(
                    tf_norm(tfs[d][t], dls[d], avgdl, k1, b)
                )
        out.append((d, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]
