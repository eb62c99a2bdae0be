"""Deterministic Common-Crawl-style `pages` corpus (FIXTURES.md §1).

Spark-first analogue of the reference's synthetic source
(/root/reference/asset/elasticsearch_data_generator/index.js:31-96), with the
faker randomness replaced by pure integer-hash derivations so every row is a
function of its id alone (reproducible at any scale, any partitioning):

    (url, warc_ts, html, text, lang) + derived doc_id, doc_key

Text tokens are drawn from a Zipf-weighted vocabulary — head terms land in a
large fraction of documents, which is what the head-term-skew handling
(salting / doc-bucketed segments) and block-max WAND pruning are tested
against (FIXTURES.md §4 `zipf_terms`).

Invariant: ``extract_text(html) == text`` byte-identical for every row.
"""

from __future__ import annotations

import base64
import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# --- vocabulary ---------------------------------------------------------------
# ~40 hand-picked head words (query-able, mirrors the driver `documents` table's
# flavor) + generated tail. Zipf weight 1/(rank+2).
_HEAD_WORDS = [
    "the", "data", "spark", "query", "index", "join", "scan", "filter", "sort",
    "merge", "table", "row", "group", "hash", "batch", "key", "order", "part",
    "value", "fast", "slow", "small", "large", "window", "stream", "shuffle",
    "term", "text", "search", "score", "rank", "count", "page", "web", "crawl",
    "link", "title", "body", "lang", "cache",
]
_VOCAB_SIZE = 2000
VOCAB = _HEAD_WORDS + [f"term{i:04d}" for i in range(_VOCAB_SIZE - len(_HEAD_WORDS))]

_weights = 1.0 / (np.arange(_VOCAB_SIZE, dtype=np.float64) + 2.0)
_CDF = np.cumsum(_weights / _weights.sum())

START_MS = 1438387200000  # 2015-08-01T00:00:00Z
RANGE_MS = 30 * 24 * 3600 * 1000  # 30 days
N_SITES = 97

_MIX = np.uint64(2654435761)  # Knuth multiplicative hash constant


def _hash_u01(i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Deterministic uniform [0,1) from integer (i, j) — pure uint64 math."""
    x = (i.astype(np.uint64) * np.uint64(1000003) + j.astype(np.uint64) * np.uint64(7919)
         + np.uint64(12345))
    x = (x ^ (x >> np.uint64(33))) * _MIX
    x = x ^ (x >> np.uint64(29))
    return (x & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2.0**32


def _doclen(ids: np.ndarray) -> np.ndarray:
    return 20 + (ids * 31) % 181  # 20..200 tokens


def doc_key(url: str) -> str:
    """base64url(sha1(url))[:12] — the reference's base64url keyspace
    (/root/reference/asset/id_reader/id_slicer.js:9-11)."""
    return base64.urlsafe_b64encode(hashlib.sha1(url.encode()).digest())[:12].decode()


def pages_pandas(n: int, ids: np.ndarray | None = None) -> pd.DataFrame:
    """Generate rows for ids (default 0..n-1) as a pandas DataFrame."""
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    ids = ids.astype(np.int64)
    lens = _doclen(ids)
    total = int(lens.sum())
    # flat (i, j) pairs for every token position
    flat_i = np.repeat(ids, lens)
    flat_j = np.concatenate([np.arange(c, dtype=np.int64) for c in lens]) if len(ids) else np.array([], dtype=np.int64)
    tok_idx = np.searchsorted(_CDF, _hash_u01(flat_i, flat_j), side="right")
    vocab = np.asarray(VOCAB, dtype=object)
    words = vocab[np.clip(tok_idx, 0, _VOCAB_SIZE - 1)]
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(words, bounds)]

    urls = [f"https://site{int(i) % N_SITES}.example/{int(i)}" for i in ids]
    ts_ms = START_MS + (ids * RANGE_MS) // max(n, 1)
    langs = np.asarray(["en", "es", "de", "zh", "fr"], dtype=object)[ids % 5]
    htmls = [
        b"<html><head><title>T%d</title></head><body><p>" % int(i)
        + t.encode("utf-8")
        + b"</p></body></html>"
        for i, t in zip(ids, texts)
    ]
    return pd.DataFrame(
        {
            "doc_id": ids,
            "url": urls,
            "warc_ts": pd.to_datetime(ts_ms, unit="ms"),
            "html": htmls,
            "text": texts,
            "lang": langs,
            "doc_key": [doc_key(u) for u in urls],
        }
    )


PAGES_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string, doc_key string"
)


def pages_df(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Distributed generation: spark.range → mapInArrow batch generator.

    Each task generates only its own id range (function-of-id rows), so the
    output is identical for any partition count — the property the
    rank-parity tests at local[1] vs local[8] rely on.
    """
    base = spark.range(0, n, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pages_pandas(n, ids=pdf["id"].to_numpy())

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)
