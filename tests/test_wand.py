"""Block-max pruning (WAND) correctness: pruned paths must be bit-identical
to exhaustive scoring, selective block decode must equal full decode."""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_assets_spark.index.codec import (
    BLOCK_SIZE,
    decode_value_blocks,
    decode_varint,
    encode_postings,
)
from elasticsearch_assets_spark.query.bm25 import idf
from elasticsearch_assets_spark.query.wand import (
    TermPostings,
    exact_scores,
    topk_conjunctive,
    topk_disjunctive_pruned,
)

AVGDL, K1, B = 55.0, 1.2, 0.75


def _random_term(rng: np.random.Generator, n_docs: int, df: int) -> dict:
    docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 12, size=df).astype(np.int64)
    dls = rng.integers(5, 200, size=df).astype(np.int64)
    return encode_postings(docs, tfs, dls)


def _postings(rng, n_docs, dfs):
    rows = {}
    for i, df in enumerate(dfs):
        rows[f"t{i}"] = TermPostings(_random_term(rng, n_docs, df))
    return rows


def test_decode_value_blocks_matches_full():
    rng = np.random.default_rng(0)
    row = _random_term(rng, 100_000, 1000)
    full_tf = decode_varint(row["tfs_enc"]).astype(np.int64)
    offs = np.asarray(row["block_off_tfs"], dtype=np.int64)
    for sel in ([0], [7], [0, 3, 7], list(range(8))):
        sel_a = np.asarray(sel, dtype=np.int64)
        vals, pos = decode_value_blocks(row["tfs_enc"], offs, 1000, sel_a)
        want_pos = np.concatenate(
            [np.arange(b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, 1000)) for b in sel]
        )
        assert np.array_equal(pos, want_pos)
        assert np.array_equal(vals, full_tf[want_pos])


def test_gather_equals_full_decode():
    rng = np.random.default_rng(1)
    row = _random_term(rng, 50_000, 777)
    tp = TermPostings(row)
    full_tf, full_dl = tp.full()
    positions = np.sort(rng.choice(777, size=60, replace=False))
    tf, dl = tp.gather(positions)
    assert np.array_equal(tf, full_tf[positions])
    assert np.array_equal(dl, full_dl[positions])


@pytest.mark.parametrize("seed", range(8))
def test_pruned_or_identical_to_exhaustive(seed):
    rng = np.random.default_rng(seed)
    n_docs = 30_000
    dfs = [int(x) for x in rng.integers(50, 5000, size=rng.integers(2, 5))]
    postings = _postings(rng, n_docs, dfs)
    terms = sorted(postings)
    n_total = n_docs
    idfs = {t: idf(n_total, postings[t].df) for t in terms}
    k = int(rng.integers(1, 50))

    got_d, got_s = topk_disjunctive_pruned(terms, postings, idfs, AVGDL, K1, B, k)

    union = np.unique(np.concatenate([postings[t].doc_ids for t in terms]))
    ref_s = exact_scores(union, terms, postings, idfs, AVGDL, K1, B)
    order = np.lexsort((union, -ref_s))[:k]
    assert np.array_equal(got_d, union[order])
    assert np.array_equal(got_s, ref_s[order])  # bitwise, not approx


@pytest.mark.parametrize("seed", range(4))
def test_conjunctive_selective_decode_identical(seed):
    rng = np.random.default_rng(100 + seed)
    n_docs = 5_000  # dense enough that AND has matches
    postings = _postings(rng, n_docs, [2000, 2500, 3000][: int(rng.integers(2, 4))])
    terms = sorted(postings)
    idfs = {t: idf(n_docs, postings[t].df) for t in terms}
    got_d, got_s = topk_conjunctive(terms, postings, idfs, AVGDL, K1, B, 10)

    cand = postings[terms[0]].doc_ids
    for t in terms[1:]:
        cand = cand[np.isin(cand, postings[t].doc_ids, assume_unique=True)]
    assert cand.size > 0, "fixture should intersect"
    ref = exact_scores(cand, terms, postings, idfs, AVGDL, K1, B)
    order = np.lexsort((cand, -ref))[:10]
    assert np.array_equal(got_d, cand[order])
    assert np.array_equal(got_s, ref[order])


def test_missing_term_semantics():
    rng = np.random.default_rng(9)
    postings = _postings(rng, 1000, [100])
    idfs = {"t0": 1.0, "zz": 0.5}
    d, s = topk_conjunctive(["t0", "zz"], postings, idfs, AVGDL, K1, B, 10)
    assert d.size == 0  # AND with absent term -> empty
    d, s = topk_disjunctive_pruned(["t0", "zz"], postings, idfs, AVGDL, K1, B, 10)
    assert d.size == 10  # OR scores present terms only


# ---------------------------------------------------------------------------
# hypothesis fuzz: pruning must be invisible in results
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_pruned_or_fuzz(data):
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    n_docs = data.draw(st.integers(500, 20_000))
    n_terms = data.draw(st.integers(1, 4))
    dfs = [
        data.draw(st.integers(1, min(n_docs, 3000))) for _ in range(n_terms)
    ]
    k = data.draw(st.integers(1, 40))
    postings = _postings(rng, n_docs, dfs)
    terms = sorted(postings)
    idfs = {t: idf(n_docs, postings[t].df) for t in terms}

    got_d, got_s = topk_disjunctive_pruned(terms, postings, idfs, AVGDL, K1, B, k)
    union = np.unique(np.concatenate([postings[t].doc_ids for t in terms]))
    ref_s = exact_scores(union, terms, postings, idfs, AVGDL, K1, B)
    order = np.lexsort((union, -ref_s))[:k]
    assert np.array_equal(got_d, union[order])
    assert np.array_equal(got_s, ref_s[order])


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_selective_block_decode_fuzz(data):
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    df = data.draw(st.integers(1, 2000))
    row = _random_term(rng, 1_000_000, df)
    tp = TermPostings(row)
    full_tf, full_dl = TermPostings(row).full()
    n_pos = data.draw(st.integers(1, df))
    positions = np.sort(rng.choice(df, size=n_pos, replace=False))
    tf, dl = tp.gather(positions)
    assert np.array_equal(tf, full_tf[positions])
    assert np.array_equal(dl, full_dl[positions])
