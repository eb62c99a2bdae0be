"""Block-max pruned BM25 scoring kernels (SURVEY.md §2.3 F3, M4).

Vectorized block-max-WAND variant suited to numpy (classic WAND's per-doc
pointer chasing is a Python-loop antipattern; this formulation does the same
safe pruning with array passes):

  candidate pass   decode ONLY the docID streams; per posting, an upper
                   bound from its block's (max_tf, min_dl) metadata; per-doc
                   UB = sum of its terms' block bounds.
  seed pass        exact-score the m docs with the highest UB (selective
                   block decode of tf/dl); θ = k-th best exact score.
  prune            docs with UB < θ cannot enter the top-k (score ≤ UB < θ
                   while ≥ k docs already score ≥ θ) — rank-safe.
  final pass       exact-score the survivors, take top-k.

tf/dl streams are decoded only for blocks that contain a surviving
candidate — the block offsets added in codec v2 make those streams
block-addressable. The exact scorer accumulates in float64 over terms in
sorted order, so results are bit-identical to the exhaustive path (tested).
"""

from __future__ import annotations

import numpy as np

from elasticsearch_assets_spark.index.codec import (
    BLOCK_SIZE,
    decode_doc_ids,
    decode_value_blocks,
)

# ≥ this many present terms, the pruned OR kernel scores exhaustively
# (rank-identical); see topk_disjunctive_pruned's docstring
MANY_TERMS_EXHAUSTIVE = 24


def _bm25_part(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


class TermPostings:
    """One term's segment row, decoded lazily: doc ids up front, tf/dl per
    block on demand."""

    def __init__(self, row) -> None:
        self.doc_ids: np.ndarray = decode_doc_ids(row["doc_gaps"])
        self.df = int(self.doc_ids.size)
        self._tfs_enc = row["tfs_enc"]
        self._dls_enc = row["doclens_enc"]
        try:  # positional indexes only (dict rows and pyspark Rows differ)
            self._pos_enc = row["pos_enc"]
        except (KeyError, ValueError):
            self._pos_enc = None
        self._off_tfs = np.asarray(row["block_off_tfs"], dtype=np.int64)
        self._off_dls = np.asarray(row["block_off_dls"], dtype=np.int64)
        self.block_max_tf = np.asarray(row["block_max_tf"], dtype=np.int64)
        self.block_min_dl = np.asarray(row["block_min_dl"], dtype=np.int64)
        self._tfs_full: np.ndarray | None = None
        self._dls_full: np.ndarray | None = None

    # -- full decode (exhaustive path) --------------------------------------
    def full(self) -> tuple[np.ndarray, np.ndarray]:
        if self._tfs_full is None:
            from elasticsearch_assets_spark.index.codec import decode_varint

            self._tfs_full = decode_varint(self._tfs_enc).astype(np.int64)
            self._dls_full = decode_varint(self._dls_enc).astype(np.int64)
        return self._tfs_full, self._dls_full

    def positions(self) -> np.ndarray:
        """Flat within-doc term positions, one increasing run of tf values
        per posting (positional indexes only)."""
        if self._pos_enc is None:
            raise ValueError("segment row has no positional stream")
        from elasticsearch_assets_spark.index.codec import decode_positions

        tfs, _ = self.full()
        return decode_positions(self._pos_enc, tfs)

    # -- selective decode ----------------------------------------------------
    def gather(self, positions: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """tf/dl at the given (sorted) posting positions, decoding only the
        blocks they fall in."""
        if positions.size == 0:
            e = np.array([], dtype=np.int64)
            return e, e
        blocks = np.unique(positions // BLOCK_SIZE)
        tfs, pos_t = decode_value_blocks(self._tfs_enc, self._off_tfs, self.df, blocks)
        dls, _ = decode_value_blocks(self._dls_enc, self._off_dls, self.df, blocks)
        ix = np.searchsorted(pos_t, positions)
        return tfs[ix], dls[ix]

    def posting_bounds(self, idf: float, avgdl: float, k1: float, b: float) -> np.ndarray:
        """Per-POSTING score upper bound from block metadata (expanded)."""
        ub_block = idf * _bm25_part(self.block_max_tf, self.block_min_dl, avgdl, k1, b)
        counts = np.minimum(
            (np.arange(ub_block.size) + 1) * BLOCK_SIZE, self.df
        ) - np.arange(ub_block.size) * BLOCK_SIZE
        return np.repeat(ub_block, counts)


def exact_scores(
    cand: np.ndarray,
    terms: list[str],
    postings: dict[str, TermPostings],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
) -> np.ndarray:
    """Exact BM25 of `cand` docs (sorted), accumulating terms in the given
    (sorted) order — the canonical order shared with the exhaustive path."""
    score = np.zeros(cand.size, dtype=np.float64)
    for t in terms:
        if t not in postings:
            continue
        tp = postings[t]
        hit = np.isin(tp.doc_ids, cand, assume_unique=True)
        positions = np.flatnonzero(hit)
        if positions.size == 0:
            continue
        tf, dl = tp.gather(positions)
        at = np.searchsorted(cand, tp.doc_ids[positions])
        score[at] += idfs[t] * _bm25_part(tf, dl, avgdl, k1, b)
    return score


def _sorted_intersect(small: np.ndarray, big: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED unique id arrays via binary search on the
    larger — O(|small| log |big|), the galloping-intersection shape a
    rare∧head query needs (np.isin would re-sort the head list every call)."""
    if small.size == 0 or big.size == 0:
        return np.array([], dtype=np.int64)
    if small.size > big.size:
        small, big = big, small
    pos = np.searchsorted(big, small)
    pos_c = np.minimum(pos, big.size - 1)
    return small[big[pos_c] == small]


def _exclude(docs: np.ndarray, excluded: np.ndarray | None) -> np.ndarray:
    """Drop tombstoned docs BEFORE ranking (rank-safe for survivors;
    ES/Lucene-identical: stats still count deleted docs until merge)."""
    if excluded is None or excluded.size == 0 or docs.size == 0:
        return docs
    return docs[~np.isin(docs, excluded, assume_unique=False)]


def restrict(
    docs: np.ndarray,
    excluded: np.ndarray | None,
    allowed: np.ndarray | None,
) -> np.ndarray:
    """Candidate restriction before ranking: drop tombstones, and (for
    filtered search — the reference's `range AND (query)` composition)
    keep only docs passing the structured filter. Restriction-before-top-k
    is rank-safe for the surviving docs."""
    docs = _exclude(docs, excluded)
    if allowed is not None and docs.size:
        docs = docs[np.isin(docs, allowed, assume_unique=False)]
    return docs


def topk_disjunctive_pruned(
    terms: list[str],
    postings: dict[str, TermPostings],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    excluded: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Rank-safe pruned top-k OR scoring. Returns (doc_ids, scores) of ≤ k
    docs ordered (score DESC, doc_id ASC).

    Many-term queries (dictionary rewrites: prefix/wildcard/fuzzy/regexp
    expansions) skip the θ-pruning: with dozens of scorers the bound
    accumulation + seed pass cost more than they save (measured 6.4 s vs
    4.0 s exhaustive for a 100-term OR at 200k docs), and weak per-term
    idf spread makes θ select almost nothing — the same reason Lucene
    rewrites MultiTermQueries away from WAND instead of running one
    scorer per expansion. Exhaustive-then-cut is rank-identical by
    construction (both paths share exact_scores' canonical term order)."""
    present = [t for t in terms if t in postings]
    if not present:
        e = np.array([], dtype=np.int64)
        return e, np.array([], dtype=np.float64)
    union = restrict(
        np.unique(np.concatenate([postings[t].doc_ids for t in present])),
        excluded, allowed,
    )
    if union.size == 0:
        e = np.array([], dtype=np.int64)
        return e, np.array([], dtype=np.float64)
    if len(present) >= MANY_TERMS_EXHAUSTIVE:
        scores = exact_scores(union, terms, postings, idfs, avgdl, k1, b)
        order = np.lexsort((union, -scores))[:k]
        return union[order], scores[order]
    ub = np.zeros(union.size, dtype=np.float64)
    for t in present:
        tp = postings[t]
        at = np.searchsorted(union, tp.doc_ids)
        # excluded docs are absent from `union` — mask their postings so
        # their bounds don't land on a neighbor (or out of range)
        valid = (at < union.size) & (union[np.minimum(at, union.size - 1)] == tp.doc_ids)
        bounds = tp.posting_bounds(idfs[t], avgdl, k1, b)
        ub[at[valid]] += bounds[valid]  # positions unique per term

    if union.size <= max(4 * k, 256):
        cand = union  # pruning overhead beats nothing this small
    else:
        m = max(4 * k, 256)
        seed_ix = np.sort(np.argpartition(ub, -m)[-m:])
        seed = union[seed_ix]
        seed_scores = exact_scores(seed, terms, postings, idfs, avgdl, k1, b)
        theta = np.partition(seed_scores, -k)[-k]
        cand = union[ub >= theta]

    scores = exact_scores(cand, terms, postings, idfs, avgdl, k1, b)
    order = np.lexsort((cand, -scores))[:k]
    return cand[order], scores[order]


def topk_min_should_match(
    terms: list[str],
    m: int,
    postings: dict[str, TermPostings],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    k: int | None,
    excluded: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """OR scoring restricted to docs matching >= `m` distinct query terms —
    Lucene BooleanQuery minimum_should_match (ES minimum_should_match on a
    bool/match query). m=1 degenerates to the exhaustive OR and
    m=len(terms) to the AND kernel (both tested bit-identical).

    One counting pass over the docID streams (no tf/dl decode) selects the
    candidates; only they are exact-scored — the same
    restriction-before-top-k shape as `restrict`, rank-safe because the
    match count is a per-doc property (doc-bucketed segments hold each doc
    exactly once, so the per-segment count IS the global count)."""
    e = np.array([], dtype=np.int64)
    present = [t for t in terms if t in postings]
    if len(present) < m or m < 1:
        return e, np.array([], dtype=np.float64)
    union = restrict(
        np.unique(np.concatenate([postings[t].doc_ids for t in present])),
        excluded, allowed,
    )
    if union.size == 0:
        return e, np.array([], dtype=np.float64)
    nmatch = np.zeros(union.size, dtype=np.int64)
    for t in present:
        ids = postings[t].doc_ids
        at = np.searchsorted(union, ids)
        valid = (at < union.size) & (union[np.minimum(at, union.size - 1)] == ids)
        nmatch[at[valid]] += 1  # each doc once per term (postings unique)
    cand = union[nmatch >= m]
    if cand.size == 0:
        return e, np.array([], dtype=np.float64)
    scores = exact_scores(cand, terms, postings, idfs, avgdl, k1, b)
    order = np.lexsort((cand, -scores))
    if k is not None:
        order = order[:k]
    return cand[order], scores[order]


def topk_group_conjunctive(
    groups: list[list[str]],
    postings: dict[str, TermPostings],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    k: int | None,
    excluded: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Boolean-clause AND scoring (Lucene BooleanQuery of rewritten
    MultiTermQueries): a doc matches iff EVERY group contributes ≥ 1
    present term — candidate set = ∩ over groups of (∪ of the group's
    posting lists). Scores sum ALL matched terms across groups (BM25's
    per-term sum), so `groups=[[t] for t in terms]` degenerates to
    `topk_conjunctive` exactly (tested)."""
    e = np.array([], dtype=np.int64)
    unions: list[np.ndarray] = []
    for g in groups:
        arrs = [postings[t].doc_ids for t in g if t in postings]
        if not arrs:
            return e, np.array([], dtype=np.float64)
        u = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
        unions.append(u)
    unions.sort(key=lambda a: a.size)
    cand = restrict(unions[0], excluded, allowed)
    for u in unions[1:]:
        cand = _sorted_intersect(cand, u)
        if cand.size == 0:
            return e, np.array([], dtype=np.float64)
    terms = sorted({t for g in groups for t in g})
    scores = exact_scores(cand, terms, postings, idfs, avgdl, k1, b)
    order = np.lexsort((cand, -scores))
    if k is not None:
        order = order[:k]
    return cand[order], scores[order]


def topk_conjunctive(
    terms: list[str],
    postings: dict[str, TermPostings],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    k: int | None,
    excluded: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """AND scoring: docID-stream intersection first (smallest list outward),
    tf/dl decoded only for blocks holding surviving docs."""
    if any(t not in postings for t in terms):
        e = np.array([], dtype=np.int64)
        return e, np.array([], dtype=np.float64)
    by_size = sorted(terms, key=lambda t: postings[t].df)
    cand = restrict(postings[by_size[0]].doc_ids, excluded, allowed)
    for t in by_size[1:]:
        cand = _sorted_intersect(cand, postings[t].doc_ids)
        if cand.size == 0:
            e = np.array([], dtype=np.int64)
            return e, np.array([], dtype=np.float64)
    scores = exact_scores(cand, terms, postings, idfs, avgdl, k1, b)
    order = np.lexsort((cand, -scores))
    if k is not None:
        order = order[:k]
    return cand[order], scores[order]


def topk_optional_should(
    must_groups: list[list[str]],
    clauses: "list[tuple[list[str], float]]",
    postings: dict[str, TermPostings],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    k: int | None,
    excluded: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
    min_should_match: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """ES `bool` optional-should scoring — must + should in ONE body
    (the composition the reference forwards verbatim to ES;
    /root/reference/asset/elasticsearch_reader supports arbitrary bodies).
    Matching is decided by the must side alone (every group contributes
    ≥ 1 present term); each should clause is a Lucene SHOULD sub-query
    that ADDS `weight × Σ BM25(present clause terms)` to matching docs
    without being required. `min_should_match` (> 0) additionally
    requires ≥ that many should CLAUSES to match — the ES bool knob's
    with-must semantics.

    Candidate selection = the group-conjunctive intersection (must terms
    only — should postings are never unioned into the candidate set, so
    a huge optional term costs one gather over the must survivors, not a
    corpus-wide union). A term in BOTH must and a should clause scores
    twice — Lucene sums per-clause scores, each clause scoring
    independently (oracle-pinned)."""
    e = np.array([], dtype=np.int64)
    ef = np.array([], dtype=np.float64)
    unions: list[np.ndarray] = []
    for g in must_groups:
        arrs = [postings[t].doc_ids for t in g if t in postings]
        if not arrs:
            return e, ef
        u = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
        unions.append(u)
    unions.sort(key=lambda a: a.size)
    cand = restrict(unions[0], excluded, allowed)
    for u in unions[1:]:
        cand = _sorted_intersect(cand, u)
        if cand.size == 0:
            return e, ef
    if cand.size == 0:
        return e, ef
    must_terms = sorted({t for g in must_groups for t in g})
    scores = exact_scores(cand, must_terms, postings, idfs, avgdl, k1, b)
    matched = np.zeros(cand.size, dtype=np.int64)
    for terms, w in clauses:
        present = sorted({t for t in terms if t in postings})
        if not present:
            continue
        scores = scores + w * exact_scores(
            cand, present, postings, idfs, avgdl, k1, b
        )
        arrs = [postings[t].doc_ids for t in present]
        u = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
        matched += np.isin(cand, u, assume_unique=True)
    if min_should_match > 0:
        keep = matched >= min_should_match
        cand, scores = cand[keep], scores[keep]
    order = np.lexsort((cand, -scores))
    if k is not None:
        order = order[:k]
    return cand[order], scores[order]
