"""Index-assisted phrase matching over positional postings (round 3).

Round 2 compiled Lucene `field:"a b"` phrases to a regex scan of the raw
text (query/lucene.py) — correct, but a bare phrase at 100 TB is a
full-corpus regex pass. With `build_index(positions=True)` the segments
carry per-posting within-doc term positions, and a phrase becomes pure
posting-list work: intersect the constituent terms' doc lists, then verify
adjacency with one vectorized multiset intersection per phrase slot — no
text is ever read. This is the Lucene PhraseQuery plan re-expressed in
numpy kernels (the reference's tested phrase surface,
/root/reference/test/simple_api_reader-spec.js:63-112, delegates it to ES).

Matching semantics: doc matches iff its token sequence (analysis/
tokenizer.py contract) contains the phrase tokens consecutively. Scoring:
BM25 sum of the phrase's DISTINCT terms over matching docs, with global
collection stats — i.e. `search(mode="and")` restricted to phrase-matching
docs. (Elasticsearch's match_phrase scores phrase *frequency*; we keep the
term-sum form so phrase results compose with the engine's rank-identity
invariants and have an exact SQL oracle.)
"""

from __future__ import annotations

import numpy as np

from elasticsearch_assets_spark.query.wand import TermPostings, _sorted_intersect


def phrase_match(
    postings: dict[str, TermPostings], phrase: list[str]
) -> np.ndarray:
    """Sorted doc ids (of one segment) containing the phrase consecutively.

    Fully vectorized: per phrase slot i, the occurrences of phrase[i] in
    candidate docs become keys dense_doc * M + (pos - i); a doc has the
    phrase at anchor position p iff key (doc, p) appears in EVERY slot's
    set, so successive sorted-set intersections finish the job. Keys are
    built in (doc, position) order, hence already sorted and unique —
    `np.intersect1d(assume_unique=True)` does no re-sorting."""
    empty = np.array([], dtype=np.int64)
    distinct = sorted(set(phrase))
    if any(t not in postings for t in distinct):
        return empty
    cand = postings[distinct[0]].doc_ids
    for t in distinct[1:]:
        cand = _sorted_intersect(cand, postings[t].doc_ids)
        if cand.size == 0:
            return empty
    # occurrences of each distinct term restricted to candidate docs
    occ: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    maxpos = 0
    for t in distinct:
        tp = postings[t]
        tfs, _ = tp.full()
        pos = tp.positions()
        hit = np.isin(tp.doc_ids, cand, assume_unique=True)
        keep = np.repeat(hit, tfs)
        docs_o = np.repeat(tp.doc_ids, tfs)[keep]
        pos_o = pos[keep]
        if pos_o.size == 0:
            return empty
        occ[t] = (docs_o, pos_o)
        maxpos = max(maxpos, int(pos_o.max()))
    M = np.int64(maxpos + 2)
    result: np.ndarray | None = None
    for i, t in enumerate(phrase):
        docs_o, pos_o = occ[t]
        shifted = pos_o - i  # anchor position this occurrence supports
        ok = shifted >= 0
        dense = np.searchsorted(cand, docs_o[ok])
        keys = dense * M + shifted[ok]
        result = (
            keys
            if result is None
            else np.intersect1d(result, keys, assume_unique=True)
        )
        if result.size == 0:
            return empty
    return cand[np.unique(result // M)]


def phrase_prefix_match(
    postings: dict[str, TermPostings],
    fixed: list[str],
    last_options: list[str],
) -> np.ndarray:
    """Sorted doc ids (of one segment) containing `fixed` consecutively,
    immediately followed by ANY of `last_options` — the positional kernel
    behind ES match_phrase_prefix (the last token is a prefix, expanded
    against the term dictionary by the caller; see
    InvertedIndex.search_phrase_prefix).

    Same key algebra as `phrase_match` (occurrences -> dense_doc * M +
    anchor keys, intersect per slot); the last slot contributes the UNION
    of its options' occurrence keys instead of a single term's."""
    empty = np.array([], dtype=np.int64)
    distinct_fixed = sorted(set(fixed))
    if any(t not in postings for t in distinct_fixed):
        return empty
    opts = sorted({t for t in last_options if t in postings})
    if not opts:
        return empty
    # candidate docs: contain every fixed term AND at least one option
    opt_union = (
        postings[opts[0]].doc_ids
        if len(opts) == 1
        else np.unique(np.concatenate([postings[t].doc_ids for t in opts]))
    )
    cand = opt_union
    for t in distinct_fixed:
        cand = _sorted_intersect(cand, postings[t].doc_ids)
        if cand.size == 0:
            return empty
    if not fixed:  # bare prefix: any doc containing any option
        return cand

    def occurrences(t: str) -> tuple[np.ndarray, np.ndarray]:
        tp = postings[t]
        tfs, _ = tp.full()
        pos = tp.positions()
        hit = np.isin(tp.doc_ids, cand, assume_unique=True)
        keep = np.repeat(hit, tfs)
        return np.repeat(tp.doc_ids, tfs)[keep], pos[keep]

    occ = {t: occurrences(t) for t in distinct_fixed}
    opt_occ = [occurrences(t) for t in opts]
    maxpos = 0
    for docs_o, pos_o in list(occ.values()) + opt_occ:
        if pos_o.size:
            maxpos = max(maxpos, int(pos_o.max()))
    M = np.int64(maxpos + 2)
    result: np.ndarray | None = None
    for i, t in enumerate(fixed):
        docs_o, pos_o = occ[t]
        if pos_o.size == 0:
            return empty
        shifted = pos_o - i
        ok = shifted >= 0
        dense = np.searchsorted(cand, docs_o[ok])
        keys = dense * M + shifted[ok]
        result = (
            keys
            if result is None
            else np.intersect1d(result, keys, assume_unique=True)
        )
        if result.size == 0:
            return empty
    # last slot: union of the options' keys (unique per option; the union
    # may repeat a key only if two options shared an occurrence — distinct
    # terms can't, so concatenate + unique keeps assume_unique valid)
    i = len(fixed)
    last_keys: list[np.ndarray] = []
    for docs_o, pos_o in opt_occ:
        shifted = pos_o - i
        ok = shifted >= 0
        if not ok.any():
            continue
        dense = np.searchsorted(cand, docs_o[ok])
        last_keys.append(dense * M + shifted[ok])
    if not last_keys:
        return empty
    union_keys = (
        last_keys[0]
        if len(last_keys) == 1
        else np.unique(np.concatenate(last_keys))
    )
    result = np.intersect1d(result, union_keys, assume_unique=True)
    if result.size == 0:
        return empty
    return cand[np.unique(result // M)]


def near_match(
    postings: dict[str, TermPostings],
    t1: str,
    t2: str,
    slop: int,
    ordered: bool = False,
) -> np.ndarray:
    """Sorted doc ids (of one segment) where an occurrence of `t1` lies
    within `slop` positions of an occurrence of `t2` — Lucene's two-term
    SpanNearQuery (ES match_phrase slop / span_near), index-assisted.

    unordered: exists positions p1, p2 with |p1 - p2| <= slop
    ordered:   exists p1 < p2 with p2 - p1 <= slop

    Vectorized: occurrences become keys dense_doc * M + pos (M sized so a
    slop window never crosses a doc block); for every t2 occurrence one
    searchsorted pair asks whether any t1 key falls inside its window."""
    empty = np.array([], dtype=np.int64)
    if t1 == t2:
        raise ValueError("near_match needs two distinct terms")
    if t1 not in postings or t2 not in postings:
        return empty
    cand = _sorted_intersect(postings[t1].doc_ids, postings[t2].doc_ids)
    if cand.size == 0:
        return empty
    occ: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    maxpos = 0
    for t in (t1, t2):
        tp = postings[t]
        tfs, _ = tp.full()
        pos = tp.positions()
        hit = np.isin(tp.doc_ids, cand, assume_unique=True)
        keep = np.repeat(hit, tfs)
        docs_o = np.repeat(tp.doc_ids, tfs)[keep]
        pos_o = pos[keep]
        if pos_o.size == 0:
            return empty
        occ[t] = (docs_o, pos_o)
        maxpos = max(maxpos, int(pos_o.max()))
    M = np.int64(maxpos + slop + 2)  # window stays inside the doc block
    d1, p1 = occ[t1]
    d2, p2 = occ[t2]
    k1 = np.searchsorted(cand, d1) * M + p1  # built sorted (doc, pos asc)
    dense2 = np.searchsorted(cand, d2)
    lo = dense2 * M + np.maximum(p2 - slop, 0)
    hi = dense2 * M + (p2 - 1 if ordered else p2 + slop)
    left = np.searchsorted(k1, lo, side="left")
    right = np.searchsorted(k1, hi, side="right")
    hit2 = right > left
    if not hit2.any():
        return empty
    return cand[np.unique(dense2[hit2])]

def span_first_match(
    postings: dict[str, TermPostings], term: str, end: int
) -> np.ndarray:
    """Sorted doc ids (of one segment) where `term` occurs within the
    first `end` token positions — Lucene's span_first (the span must end
    at position ≤ `end`; a single-term span of width 1 ends at pos+1, so
    the test is pos < end)."""
    empty = np.array([], dtype=np.int64)
    if term not in postings or end <= 0:
        return empty
    tp = postings[term]
    tfs, _ = tp.full()
    pos = tp.positions()
    docs_o = np.repeat(tp.doc_ids, tfs)
    return np.unique(docs_o[pos < end])


def span_not_match(
    postings: dict[str, TermPostings],
    include: str,
    exclude: str,
    pre: int = 0,
    post: int = 0,
) -> np.ndarray:
    """Sorted doc ids (of one segment) with an occurrence of `include`
    that has NO occurrence of `exclude` within `pre` positions before or
    `post` after it — Lucene's span_not with pre/post slop (pre=post=0
    rejects only same-position overlap, impossible for distinct terms
    under this analyzer, so callers pass a window).

    Same key algebra as near_match: exclude occurrences become sorted
    doc-block keys; ONE searchsorted pair per include occurrence asks
    whether its window is empty."""
    empty = np.array([], dtype=np.int64)
    if include == exclude:
        raise ValueError("span_not_match needs two distinct terms")
    if include not in postings:
        return empty
    tp = postings[include]
    tfs, _ = tp.full()
    p1 = tp.positions()
    d1 = np.repeat(tp.doc_ids, tfs)
    if exclude not in postings:
        return np.unique(d1)
    te = postings[exclude]
    tfs2, _ = te.full()
    p2 = te.positions()
    d2 = np.repeat(te.doc_ids, tfs2)
    alldocs = np.union1d(tp.doc_ids, te.doc_ids)
    maxpos = max(int(p1.max()), int(p2.max()))
    M = np.int64(maxpos + pre + post + 2)  # window stays inside the block
    k2 = np.searchsorted(alldocs, d2) * M + p2  # built sorted (doc, pos)
    dense1 = np.searchsorted(alldocs, d1)
    lo = dense1 * M + np.maximum(p1 - pre, 0)
    hi = dense1 * M + (p1 + post)
    left = np.searchsorted(k2, lo, side="left")
    right = np.searchsorted(k2, hi, side="right")
    ok = right == left  # no exclude occurrence inside the window
    return np.unique(d1[ok])
