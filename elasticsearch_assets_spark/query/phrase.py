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


# ---------------------------------------------------------------------------
# span algebra (occurrence-level): term / near spans composed by
# or / containing / within, plus the intervals query's ordered chain.
# A span is (docs, starts, ends) with end EXCLUSIVE (the Lucene span
# contract); all kernels are numpy-vectorized over one segment.
# ---------------------------------------------------------------------------


def term_spans(
    postings: dict[str, TermPostings], term: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Width-1 spans: every occurrence of `term` -> [pos, pos+1)."""
    empty = np.array([], dtype=np.int64)
    if term not in postings:
        return empty, empty, empty
    tp = postings[term]
    tfs, _ = tp.full()
    pos = tp.positions()
    docs = np.repeat(tp.doc_ids, tfs)
    return docs, pos, pos + 1


def near_spans(
    postings: dict[str, TermPostings],
    t1: str,
    t2: str,
    slop: int,
    ordered: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ENUMERATED two-term near spans (the span-producing sibling of
    near_match, which only answers doc membership): every (p1, p2)
    occurrence pair within the slop window becomes the span
    [min(p1,p2), max(p1,p2)+1). Vectorized: one searchsorted window per
    t2 occurrence, pairs materialized by a repeat+cumsum range expansion
    — output size is the true number of matching pairs."""
    empty = np.array([], dtype=np.int64)
    if t1 == t2:
        raise ValueError("near_spans needs two distinct terms")
    if t1 not in postings or t2 not in postings:
        return empty, empty, empty
    cand = _sorted_intersect(postings[t1].doc_ids, postings[t2].doc_ids)
    if cand.size == 0:
        return empty, empty, empty
    occ = {}
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
            return empty, empty, empty
        occ[t] = (docs_o, pos_o)
        maxpos = max(maxpos, int(pos_o.max()))
    M = np.int64(maxpos + slop + 2)
    d1, p1 = occ[t1]
    d2, p2 = occ[t2]
    k1 = np.searchsorted(cand, d1) * M + p1  # sorted (doc, pos)
    dense2 = np.searchsorted(cand, d2)
    lo = dense2 * M + np.maximum(p2 - slop, 0)
    hi = dense2 * M + (p2 - 1 if ordered else p2 + slop)
    left = np.searchsorted(k1, lo, side="left")
    right = np.searchsorted(k1, hi, side="right")
    counts = right - left
    total = int(counts.sum())
    if total == 0:
        return empty, empty, empty
    # expand each [left_i, right_i) into explicit pair indices
    base = np.repeat(left, counts)
    csum = np.cumsum(counts) - counts
    offsets = np.arange(total, dtype=np.int64) - np.repeat(csum, counts)
    p1_sel = k1[base + offsets] % M
    p2_sel = np.repeat(p2, counts)
    docs = cand[np.repeat(dense2, counts)]
    starts = np.minimum(p1_sel, p2_sel)
    ends = np.maximum(p1_sel, p2_sel) + 1
    return docs, starts, ends


def _span_sort(docs, starts, ends):
    order = np.lexsort((ends, starts, docs))
    return docs[order], starts[order], ends[order]


def span_or_spans(
    span_list: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lucene span_or: the union of the sub-spans' occurrences."""
    empty = np.array([], dtype=np.int64)
    keep = [s for s in span_list if s[0].size]
    if not keep:
        return empty, empty, empty
    docs = np.concatenate([s[0] for s in keep])
    starts = np.concatenate([s[1] for s in keep])
    ends = np.concatenate([s[2] for s in keep])
    return _span_sort(docs, starts, ends)


def near_span_pairs(
    a: tuple[np.ndarray, np.ndarray, np.ndarray],
    b: tuple[np.ndarray, np.ndarray, np.ndarray],
    slop: int,
    ordered: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lucene NearSpans over two ENUMERATED span sets (the general
    two-clause span_near — term/any/near sub-clauses all compose here,
    which is what field_masking_span needs): a pair matches when the
    covering window minus the two span widths is <= slop
    (Lucene's SpanNearQuery slop contract — for width-1 clauses this
    degrades to |p1 - p2| - 1 <= slop, the existing near kernels'
    bound); `ordered` additionally requires the b span to start at or
    after the a span's end (NearSpansOrdered's non-overlap-in-order).
    Emits the covering spans [min(start), max(end)).

    Vectorized like near_spans: per b span, one searchsorted window over
    the (doc, start)-sorted a spans using the conservative bound
    slop + max_width_a + width_b, pairs expanded by repeat+cumsum, then
    the exact width mask — output work is proportional to true
    candidate pairs inside windows, never |a| * |b|."""
    empty = np.array([], dtype=np.int64)
    if a[0].size == 0 or b[0].size == 0:
        return empty, empty, empty
    cand = _sorted_intersect(np.unique(a[0]), np.unique(b[0]))
    if cand.size == 0:
        return empty, empty, empty
    ka = np.isin(a[0], cand)
    kb = np.isin(b[0], cand)
    docs_a, s_a, e_a = a[0][ka], a[1][ka], a[2][ka]
    docs_b, s_b, e_b = b[0][kb], b[1][kb], b[2][kb]
    order_a = np.lexsort((s_a, docs_a))
    docs_a, s_a, e_a = docs_a[order_a], s_a[order_a], e_a[order_a]
    w_a = e_a - s_a
    w_b = e_b - s_b
    reach = int(slop) + int(w_a.max()) + w_b  # per-b conservative radius
    maxpos = int(max(e_a.max(), e_b.max()))
    M = np.int64(maxpos + int(reach.max()) + 2)
    dense_a = np.searchsorted(cand, docs_a)
    dense_b = np.searchsorted(cand, docs_b)
    key_a = dense_a * M + s_a
    lo = dense_b * M + np.maximum(s_b - reach, 0)
    hi = dense_b * M + s_b + reach
    left = np.searchsorted(key_a, lo, side="left")
    right = np.searchsorted(key_a, hi, side="right")
    counts = right - left
    total = int(counts.sum())
    if total == 0:
        return empty, empty, empty
    base = np.repeat(left, counts)
    csum = np.cumsum(counts) - counts
    idx_a = base + (np.arange(total, dtype=np.int64) - np.repeat(csum, counts))
    idx_b = np.repeat(np.arange(docs_b.size, dtype=np.int64), counts)
    cover_s = np.minimum(s_a[idx_a], s_b[idx_b])
    cover_e = np.maximum(e_a[idx_a], e_b[idx_b])
    ok = (cover_e - cover_s) - (w_a[idx_a] + w_b[idx_b]) <= slop
    if ordered:
        ok &= s_b[idx_b] >= e_a[idx_a]
    if not ok.any():
        return empty, empty, empty
    return _span_sort(docs_b[idx_b][ok], cover_s[ok], cover_e[ok])


def span_containing_spans(
    big: tuple[np.ndarray, np.ndarray, np.ndarray],
    little: tuple[np.ndarray, np.ndarray, np.ndarray],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lucene span_containing: big spans that fully contain at least one
    little span. `little` must be width-1 (term spans) — the engine's
    supported composition (Lucene's tested surface: a term inside a
    near/phrase window); general little spans would need a range-min
    structure instead of one searchsorted pair.

    Kernel: little occurrences become sorted doc-block keys; a big span
    [s, e) contains one iff a key lies in [doc·M + s, doc·M + e-1]."""
    empty = np.array([], dtype=np.int64)
    bd, bs, be = big
    ld, ls, le = little
    if bd.size == 0 or ld.size == 0:
        return empty, empty, empty
    if not np.array_equal(le, ls + 1):
        raise ValueError("span_containing: little spans must be width 1")
    alldocs = np.union1d(np.unique(bd), np.unique(ld))
    M = np.int64(max(int(be.max()), int(le.max())) + 2)
    lkey = np.sort(np.searchsorted(alldocs, ld) * M + ls)
    dense_b = np.searchsorted(alldocs, bd)
    lo = dense_b * M + bs
    hi = dense_b * M + (be - 1)  # little pos q needs s <= q <= e-1
    left = np.searchsorted(lkey, lo, side="left")
    right = np.searchsorted(lkey, hi, side="right")
    ok = right > left
    return _span_sort(bd[ok], bs[ok], be[ok])


def span_within_spans(
    little: tuple[np.ndarray, np.ndarray, np.ndarray],
    big: tuple[np.ndarray, np.ndarray, np.ndarray],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lucene span_within: little spans enclosed by at least one big
    span. Little must be width-1 (see span_containing_spans).

    Kernel: big spans sorted by (doc, start) with a prefix-max over
    doc-block END keys — for a little position q, some big span has
    start <= q iff its key sorts before q's, and encloses it iff the
    prefix max end reaches q+1. Doc blocks can't leak: an earlier doc's
    end key is always below the current doc's block base."""
    empty = np.array([], dtype=np.int64)
    bd, bs, be = big
    ld, ls, le = little
    if bd.size == 0 or ld.size == 0:
        return empty, empty, empty
    if not np.array_equal(le, ls + 1):
        raise ValueError("span_within: little spans must be width 1")
    alldocs = np.union1d(np.unique(bd), np.unique(ld))
    M = np.int64(max(int(be.max()), int(le.max())) + 2)
    dense_b = np.searchsorted(alldocs, bd)
    bkey = dense_b * M + bs
    order = np.argsort(bkey, kind="stable")
    bkey = bkey[order]
    emax = np.maximum.accumulate((dense_b * M + be)[order])
    dense_l = np.searchsorted(alldocs, ld)
    r = np.searchsorted(bkey, dense_l * M + ls, side="right")
    ok = r > 0
    ok[ok] = emax[r[ok] - 1] >= dense_l[ok] * M + le[ok]
    return _span_sort(ld[ok], ls[ok], le[ok])


def near_any_match(
    postings: dict[str, TermPostings],
    terms: list[str],
    slop: int,
) -> np.ndarray:
    """Sorted doc ids (of one segment) containing ALL `terms` in ANY order
    inside a token window of width <= len(terms) + slop — Lucene's n-term
    SpanNearQuery(inOrder=false) over width-1 clauses (Lucene's slop is
    window width minus the number of clauses). The ordered variant is
    intervals_match (identical width bound, order enforced).

    Kernel: minimal covering window per anchor. Every minimal window
    covering all terms starts at some term occurrence, and the smallest
    window starting at anchor position p ends at max over t of the first
    occurrence of t at position >= p — so one searchsorted per term over
    the doc-blocked key space decides every anchor, fully vectorized
    (O(k · occ · log occ), no per-doc Python loop)."""
    empty = np.array([], dtype=np.int64)
    if len(terms) < 2:
        raise ValueError("near_any_match needs >= 2 terms")
    if len(set(terms)) != len(terms):
        raise ValueError("near_any_match terms must be distinct")
    if any(t not in postings for t in terms):
        return empty
    cand = postings[terms[0]].doc_ids
    for t in terms[1:]:
        cand = _sorted_intersect(cand, postings[t].doc_ids)
        if cand.size == 0:
            return empty
    occ: dict[str, np.ndarray] = {}  # doc-blocked occurrence keys, sorted
    maxpos = 0
    pos_by_t: dict[str, np.ndarray] = {}
    docs_by_t: dict[str, np.ndarray] = {}
    for t in terms:
        tp = postings[t]
        tfs, _ = tp.full()
        pos = tp.positions()
        hit = np.isin(tp.doc_ids, cand, assume_unique=True)
        keep = np.repeat(hit, tfs)
        docs_o = np.repeat(tp.doc_ids, tfs)[keep]
        pos_o = pos[keep]
        if pos_o.size == 0:
            return empty
        docs_by_t[t] = docs_o
        pos_by_t[t] = pos_o
        maxpos = max(maxpos, int(pos_o.max()))
    M = np.int64(maxpos + 2)
    for t in terms:
        occ[t] = np.searchsorted(cand, docs_by_t[t]) * M + pos_by_t[t]
    anchors = np.sort(np.concatenate([occ[t] for t in terms]))
    end = anchors.copy()  # max over terms of next-occurrence key
    alive = np.ones(anchors.shape, dtype=bool)
    for t in terms:
        kt = occ[t]
        idx = np.searchsorted(kt, anchors, side="left")
        ok = idx < kt.size
        nxt = kt[np.minimum(idx, kt.size - 1)]
        ok &= (nxt // M) == (anchors // M)  # same doc
        alive &= ok
        end = np.maximum(end, np.where(ok, nxt, end))
    width = (end % M) - (anchors % M) + 1
    hit = alive & (width <= len(terms) + slop)
    if not hit.any():
        return empty
    return cand[np.unique(anchors[hit] // M)]


def intervals_match(
    postings: dict[str, TermPostings],
    terms: list[str],
    max_gaps: int,
) -> np.ndarray:
    """Sorted doc ids (of one segment) containing the terms IN ORDER
    with at most `max_gaps` non-matching positions inside the window —
    the ES intervals query's ordered `match` rule (match_all_terms).

    Kernel: greedy minimal chain, fully vectorized — anchors are every
    occurrence of terms[0]; for each subsequent term ONE searchsorted
    finds the smallest same-doc occurrence strictly after the current
    chain position. Greedy is exact for existence: the minimal chain end
    from an anchor minimizes the window, so if any ordered tuple from
    that anchor satisfies the gap bound, the greedy one does."""
    empty = np.array([], dtype=np.int64)
    if len(terms) < 2:
        raise ValueError("intervals_match needs >= 2 terms")
    if len(set(terms)) != len(terms):
        raise ValueError("intervals_match terms must be distinct")
    if any(t not in postings for t in terms):
        return empty
    cand = postings[terms[0]].doc_ids
    for t in terms[1:]:
        cand = _sorted_intersect(cand, postings[t].doc_ids)
        if cand.size == 0:
            return empty
    occ = {}
    maxpos = 0
    for t in terms:
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
    d0, p0 = occ[terms[0]]
    dense = np.searchsorted(cand, d0)
    cur = dense * M + p0  # chain positions as doc-block keys
    alive = np.ones(cur.shape, dtype=bool)
    for t in terms[1:]:
        dt, pt = occ[t]
        kt = np.searchsorted(cand, dt) * M + pt  # sorted (doc, pos)
        idx = np.searchsorted(kt, cur, side="right")
        ok = idx < kt.size
        nxt = np.where(ok, kt[np.minimum(idx, kt.size - 1)], 0)
        ok &= (nxt // M) == (cur // M)  # same doc
        alive &= ok
        cur = np.where(alive, nxt, cur)
    if not alive.any():
        return empty
    width = (cur % M) - p0 + 1
    hit = alive & (width - len(terms) <= max_gaps)
    return np.unique(d0[hit])
