"""Text analyzer: the single tokenization contract for the whole engine.

The reference delegates analysis to Elasticsearch's standard analyzer
(free-text ``query``/``q=`` strings, /root/reference/asset/elasticsearch_reader/index.js:118-122);
we define our own frozen, versioned contract (SURVEY.md §2.6 C8): NFC-stable
lowercase + maximal runs of Unicode word characters (letters/digits, no
underscore). Every component — the index builder (vectorized pandas path),
the naive Python BM25 oracle, and the query parser — MUST tokenize through
this module so index-time and query-time analysis agree.

Bump TOKENIZER_VERSION on any semantic change; segments record the version
they were built with.
"""

from __future__ import annotations

import re

import pandas as pd

TOKENIZER_VERSION = 1

# [^\W_] == word chars minus underscore, Unicode-aware.
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tokenize(text: str | None) -> list[str]:
    """Plain-Python tokenizer — the oracle/spec implementation."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer over a pandas Series[str] -> Series[list[str]].

    Must produce exactly ``tokenize`` per element (tested); pandas ``.str``
    ops keep this in C where possible.
    """
    return texts.fillna("").str.lower().str.findall(_TOKEN_RE)
