"""Text analyzer: the single tokenization contract for the whole engine.

The reference delegates analysis to Elasticsearch's standard analyzer
(free-text ``query``/``q=`` strings, /root/reference/asset/elasticsearch_reader/index.js:118-122);
we define our own frozen, versioned contract (SURVEY.md §2.6 C8): lowercase
+ maximal runs of Unicode letter/number characters (L* + N*, no underscore).

**One kernel defines truth** (v2): the RE2 engine (pyarrow compute) is the
normative implementation — index build, query analysis, and the naive BM25
oracle all tokenize through it, so index-time and query-time analysis agree
by construction. A pure-Python regex fallback exists for environments
without pyarrow; it can disagree on codepoints newer than the Python
build's Unicode tables (e.g. CJK Extension H) — pyarrow ships with pyspark,
so the fallback never runs in production.

Bump TOKENIZER_VERSION on any semantic change; segments record the version
they were built with.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# v2: normative kernel moved from Python re (Unicode <= interpreter build)
# to RE2 via pyarrow (Unicode 15): L*+N* runs, identical class definition
TOKENIZER_VERSION = 2

_SPLIT_PATTERN = r"[^\p{L}\p{N}]+"

# fallback only — [^\W_] == word chars minus underscore == L*+N* in Python re
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

try:  # pyarrow is a pyspark dependency; present everywhere we run
    import pyarrow as pa
    import pyarrow.compute as pc

    _HAVE_ARROW = True
except ImportError:  # pragma: no cover
    _HAVE_ARROW = False


def tokenize(text: str | None) -> list[str]:
    """Scalar tokenizer — delegates to the same RE2 kernel as the builder."""
    if not text:
        return []
    if _HAVE_ARROW:
        flat, _ = tokenize_flat(pd.Series([text], dtype=object))
        return flat.to_pylist()
    return _TOKEN_RE.findall(text.lower())  # pragma: no cover


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized Series[str] -> Series[list[str]] (== ``tokenize`` per
    element, tested)."""
    if _HAVE_ARROW:
        if len(texts) == 0:
            return pd.Series([], index=texts.index, dtype=object)
        flat, lens = tokenize_flat(texts)
        vals = np.asarray(flat.to_pandas(), dtype=object)
        parts = np.split(vals, np.cumsum(lens)[:-1])
        return pd.Series([list(p) for p in parts], index=texts.index)
    return texts.fillna("").str.lower().str.findall(_TOKEN_RE)  # pragma: no cover


def tokenize_flat(texts: pd.Series):
    """Flat form for the index builder: (tokens, lens) where `tokens` is the
    concatenation of every doc's tokens (pyarrow StringArray; numpy object
    array on the fallback path) and `lens[i]` is doc i's token count."""
    if _HAVE_ARROW:
        arr = pc.utf8_lower(pa.array(texts.fillna(""), type=pa.string()))
        parts = pc.split_pattern_regex(arr, _SPLIT_PATTERN)
        flat = pc.list_flatten(parts)
        mask = pc.not_equal(flat, "")
        keep_idx = pc.filter(pc.list_parent_indices(parts), mask).to_numpy()
        keep_val = pc.filter(flat, mask)
        lens = np.bincount(keep_idx, minlength=len(texts)).astype(np.int64)
        return keep_val, lens
    toks = texts.fillna("").str.lower().str.findall(_TOKEN_RE)  # pragma: no cover
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return np.array([], dtype=object), lens
    return np.concatenate([np.asarray(t, dtype=object) for t in toks]), lens


def encode_tokens(tokens):
    """(codes int64[], uniques object[]) for a flat token stream — arrow
    dictionary_encode (~5x pandas.factorize) when the stream is arrow."""
    if _HAVE_ARROW and isinstance(tokens, (pa.Array, pa.ChunkedArray)):
        de = pc.dictionary_encode(tokens)
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = np.asarray(de.dictionary.to_pandas(), dtype=object)
        return codes, uniques
    codes, uniques = pd.factorize(tokens, sort=False)
    return codes.astype(np.int64), np.asarray(uniques, dtype=object)
