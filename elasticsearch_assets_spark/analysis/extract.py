"""HTML -> text extraction with a byte-identity contract.

BASELINE.json:15 requires byte-identical extracted text per url vs the
fixture truth. The extractor is therefore a frozen pure function
(EXTRACT_VERSION-stamped): the concatenation of all ``<p>...</p>`` element
bodies (joined by a blank line), with the five standard HTML entities
unescaped. The corpus generator (datagen/pages.py) produces html such that
``extract_text(html) == text`` for every row, making the invariant testable
end to end (FIXTURES.md §1).
"""

from __future__ import annotations

import re

import pandas as pd

EXTRACT_VERSION = 1

_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_ENTITIES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),  # last, so "&amp;lt;" -> "&lt;" (single pass, not recursive)
]


def extract_text(html: bytes | None) -> str:
    """Spec implementation: bytes of all <p> bodies, blank-line joined."""
    if not html:
        return ""
    raw = b"\n\n".join(_P_RE.findall(html))
    for ent, ch in _ENTITIES:
        raw = raw.replace(ent, ch)
    return raw.decode("utf-8")


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extractor over Series[bytes] -> Series[str].

    Element-wise equal to ``extract_text`` (tested). The per-batch loop is
    inside an Arrow-transferred pandas UDF batch — no row-at-a-time Spark UDF.
    """
    return html.map(extract_text)


# ---------------------------------------------------------------------------
# html_strip char filter (the ES analyzer char_filter, distinct from the
# byte-identity extractor above: strips EVERY tag, keeps all body text)
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"<[^>]*>")
_ENTITIES_STR = [(e.decode(), c.decode()) for e, c in _ENTITIES]


def html_strip(text: str) -> str:
    """ES `html_strip` char filter contract (documented subset): every
    tag is replaced by one space (so adjacent words never fuse), then the
    five standard entities unescape — `&amp;` last, single pass, same
    ordering rule as extract_text. Runs BEFORE tokenization; the
    tokenizer's non-alnum splitting absorbs the extra spaces."""
    out = _TAG_RE.sub(" ", text)
    for ent, ch in _ENTITIES_STR:
        out = out.replace(ent, ch)
    return out


def html_strip_sql(col: str) -> str:
    """DuckDB twin of html_strip — the same tag regex (shared Java/RE2
    dialect) and the same entity replace ordering, for oracle parity."""
    expr = f"regexp_replace({col}, '<[^>]*>', ' ', 'g')"
    for ent, ch in _ENTITIES_STR:
        ent_sql = ent.replace("'", "''")
        ch_sql = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent_sql}', '{ch_sql}')"
    return expr
