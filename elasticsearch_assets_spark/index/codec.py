"""Posting-list codec: delta-encoded docID gaps + LEB128 varints, block-max metadata.

The reference stores postings inside Elasticsearch/Lucene; this is our
from-scratch equivalent (BASELINE.json north_star: "delta-encoded docID gaps +
varint/PForDelta compression and block-max metadata"). Everything here is
vectorized numpy — these functions run inside Arrow-batched UDFs on the hot
path, so no per-element Python loops.

Block-max design: per BLOCK_SIZE-run of a posting list we store
(last_doc_id, max_tf, min_doclen). The BM25 per-doc contribution
``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` is increasing in tf and decreasing
in dl, so ``bound(max_tf, min_doclen)`` is a valid (slightly loose) upper
bound that needs no global avgdl at build time — the index stays one-pass.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
CODEC_VERSION = 1

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)
_CONT = np.uint8(0x80)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized; ≤10 byte-planes)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # number of 7-bit groups per value (at least 1)
    nbits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    alive = tmp > 0
    while alive.any():
        nbits[alive] += 1
        tmp >>= _SEVEN
        alive = tmp > 0
    ngroups = np.maximum(nbits, 1)
    total = int(ngroups.sum())
    out = np.zeros(total, dtype=np.uint8)
    # byte positions: starts[i] .. starts[i]+ngroups[i]-1
    starts = np.concatenate(([0], np.cumsum(ngroups)[:-1]))
    # plane-by-plane fill (max 10 planes)
    max_g = int(ngroups.max())
    shifted = v.copy()
    for plane in range(max_g):
        sel = ngroups > plane
        pos = starts[sel] + plane
        byte = (shifted[sel] & _MASK7).astype(np.uint8)
        not_last = (ngroups[sel] - 1) > plane
        byte = byte | np.where(not_last, _CONT, np.uint8(0))
        out[pos] = byte
        shifted >>= _SEVEN
    return out.tobytes()


def decode_varint(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to uint64 (vectorized via reduceat)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.array([], dtype=np.uint64)
    is_last = raw < 0x80
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    idx = np.arange(raw.size, dtype=np.int64)
    # position of each byte within its value
    group_start = starts[np.searchsorted(ends, idx, side="left")]
    pos = (idx - group_start).astype(np.uint64)
    contrib = (raw & np.uint8(0x7F)).astype(np.uint64) << (pos * _SEVEN)
    return np.add.reduceat(contrib, starts)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray
) -> dict:
    """Encode one term's (sorted-by-doc_id) postings into segment-row fields.

    Returns dict with: df, cf, doc_gaps/tfs_enc/doclens_enc (bytes),
    block_last_doc (list[int]), block_max_tf (list[int]),
    block_min_dl (list[int]).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    order_ok = np.all(np.diff(doc_ids) > 0) if doc_ids.size > 1 else True
    if not order_ok:
        raise ValueError("doc_ids must be strictly increasing")
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    doclens = np.ascontiguousarray(doclens, dtype=np.int64)
    gaps = np.empty_like(doc_ids)
    if doc_ids.size:
        gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    nblocks = (doc_ids.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_last, block_max_tf, block_min_dl = [], [], []
    for bi in range(nblocks):
        sl = slice(bi * BLOCK_SIZE, (bi + 1) * BLOCK_SIZE)
        block_last.append(int(doc_ids[sl][-1]))
        block_max_tf.append(int(tfs[sl].max()))
        block_min_dl.append(int(doclens[sl].min()))
    return {
        "df": int(doc_ids.size),
        "cf": int(tfs.sum()),
        "doc_gaps": encode_varint(gaps.astype(np.uint64)),
        "tfs_enc": encode_varint(tfs.astype(np.uint64)),
        "doclens_enc": encode_varint(doclens.astype(np.uint64)),
        "block_last_doc": block_last,
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
    }


def decode_postings(doc_gaps: bytes, tfs_enc: bytes, doclens_enc: bytes):
    """Decode to (doc_ids int64, tfs int64, doclens int64)."""
    gaps = decode_varint(doc_gaps).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = decode_varint(tfs_enc).astype(np.int64)
    doclens = decode_varint(doclens_enc).astype(np.int64)
    return doc_ids, tfs, doclens
