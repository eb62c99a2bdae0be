"""Codec round-trip + property tests (SURVEY.md §5(6))."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_assets_spark.index.codec import (
    BLOCK_SIZE,
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63], dtype=np.uint64)
    buf = encode_varint(vals)
    assert encode_varint(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varint(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert encode_varint(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    np.testing.assert_array_equal(decode_varint(buf), vals)


def test_varint_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varint_roundtrip_fuzz(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(decode_varint(encode_varint(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=500, unique=True),
    st.data(),
)
def test_postings_roundtrip_fuzz(doc_ids, data):
    doc_ids = np.sort(np.array(doc_ids, dtype=np.int64))
    n = doc_ids.size
    tfs = np.array(data.draw(st.lists(st.integers(1, 1000), min_size=n, max_size=n)))
    dls = np.array(data.draw(st.lists(st.integers(1, 5000), min_size=n, max_size=n)))
    enc = encode_postings(doc_ids, tfs, dls)
    d, t, l = decode_postings(enc["doc_gaps"], enc["tfs_enc"], enc["doclens_enc"])
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(l, dls)
    assert enc["df"] == n
    assert enc["cf"] == int(tfs.sum())
    # block metadata is a valid bound
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["block_last_doc"]) == nblocks
    assert enc["block_last_doc"][-1] == int(doc_ids[-1])
    for bi in range(nblocks):
        sl = slice(bi * BLOCK_SIZE, (bi + 1) * BLOCK_SIZE)
        assert enc["block_max_tf"][bi] == int(tfs[sl].max())
        assert enc["block_min_dl"][bi] == int(dls[sl].min())


def test_postings_rejects_unsorted():
    import pytest

    with pytest.raises(ValueError):
        encode_postings(np.array([5, 3]), np.array([1, 1]), np.array([1, 1]))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=40),
        max_size=20,
    )
)
def test_varint_concat_matches_per_list(lists):
    from elasticsearch_assets_spark.index.codec import decode_varint_concat

    bufs = [encode_varint(np.array(v, dtype=np.uint64)) for v in lists]
    vals, counts = decode_varint_concat(bufs)
    np.testing.assert_array_equal(
        counts, np.array([len(v) for v in lists], dtype=np.int64)
    )
    exp = (
        np.concatenate([np.array(v, dtype=np.uint64) for v in lists])
        if lists and any(lists)
        else np.array([], dtype=np.uint64)
    )
    np.testing.assert_array_equal(vals, exp)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=1, max_value=10**6),
            min_size=1, max_size=60, unique=True,
        ),
        min_size=1, max_size=15,
    ),
    st.data(),
)
def test_postings_concat_matches_per_list(id_lists, data):
    from elasticsearch_assets_spark.index.codec import (
        decode_doc_ids_concat,
        decode_postings_concat,
    )

    encs = []
    exp_docs, exp_tfs, exp_dls = [], [], []
    for ids in id_lists:
        ids = np.sort(np.array(ids, dtype=np.int64))
        n = ids.size
        tfs = np.array(
            data.draw(st.lists(st.integers(1, 500), min_size=n, max_size=n))
        )
        dls = np.array(
            data.draw(st.lists(st.integers(1, 900), min_size=n, max_size=n))
        )
        encs.append(encode_postings(ids, tfs, dls))
        exp_docs.append(ids)
        exp_tfs.append(tfs)
        exp_dls.append(dls)
    d, t, l, c = decode_postings_concat(
        [e["doc_gaps"] for e in encs],
        [e["tfs_enc"] for e in encs],
        [e["doclens_enc"] for e in encs],
    )
    np.testing.assert_array_equal(c, [len(x) for x in exp_docs])
    np.testing.assert_array_equal(d, np.concatenate(exp_docs))
    np.testing.assert_array_equal(t, np.concatenate(exp_tfs))
    np.testing.assert_array_equal(l, np.concatenate(exp_dls))
    d2, c2 = decode_doc_ids_concat([e["doc_gaps"] for e in encs])
    np.testing.assert_array_equal(d2, d)
    np.testing.assert_array_equal(c2, c)
