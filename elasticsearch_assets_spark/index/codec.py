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
CODEC_VERSION = 2  # v2: per-block byte offsets -> skippable blocks (WAND)

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized; ≤10 byte-planes)."""
    buf, _ = encode_varint_with_sizes(values)
    return buf


def encode_varint_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode; also return per-value byte counts (for batch slicing).

    2D byte-plane formulation: all (plane, value) bytes are computed as one
    (max_planes x n) uint8 matrix and compacted with a single boolean-mask
    gather in value-major order. No data-dependent loops, no int64 fancy
    scatter — ~3x fewer memory passes than the per-plane masked fill this
    replaced (matters at high core counts where the build is DRAM-bound;
    see BASELINE.md scaling notes)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b"", np.array([], dtype=np.int64)
    vmax = int(v.max())
    # byte count per value: 1 + number of passed 128^k thresholds
    ngroups = np.ones(n, dtype=np.int64)
    t = 1 << 7
    while t <= vmax:
        ngroups += v >= np.uint64(t)
        t <<= 7
    max_g = max(1, (vmax.bit_length() + 6) // 7)
    shifts = (np.arange(max_g, dtype=np.uint64) * _SEVEN)[:, None]
    planes = ((v[None, :] >> shifts) & _MASK7).astype(np.uint8)
    plane_idx = np.arange(max_g, dtype=np.int64)[:, None]
    planes |= (plane_idx < (ngroups[None, :] - 1)).astype(np.uint8) << 7
    keep = plane_idx < ngroups[None, :]
    # transpose ravel = (value 0's bytes, value 1's bytes, ...) — the LEB128
    # stream order
    return planes.T[keep.T].tobytes(), ngroups


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
    gaps_buf, gaps_sz = encode_varint_with_sizes(gaps.astype(np.uint64))
    tfs_buf, tfs_sz = encode_varint_with_sizes(tfs.astype(np.uint64))
    dls_buf, dls_sz = encode_varint_with_sizes(doclens.astype(np.uint64))

    def offs(sizes: np.ndarray) -> list[int]:
        pre = np.concatenate(([0], np.cumsum(sizes)))
        return [int(pre[bi * BLOCK_SIZE]) for bi in range(nblocks)]

    return {
        "df": int(doc_ids.size),
        "cf": int(tfs.sum()),
        "doc_gaps": gaps_buf,
        "tfs_enc": tfs_buf,
        "doclens_enc": dls_buf,
        "block_last_doc": block_last,
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
        "block_off_gaps": offs(gaps_sz),
        "block_off_tfs": offs(tfs_sz),
        "block_off_dls": offs(dls_sz),
    }


def encode_postings_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> dict:
    """Encode MANY posting lists at once (the hot path inside the build UDF).

    Inputs are the concatenated columns of a (seg_id, term, doc_id)-sorted
    batch; ``starts``/``ends`` delimit each (seg_id, term) group. One varint
    pass over the whole batch + reduceat for per-group/per-block stats — no
    per-group numpy calls (40× over the naive loop; see git history).

    Returns dict of column lists aligned with the groups.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    doclens = np.ascontiguousarray(doclens, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    ngroups = starts.size
    n = doc_ids.size

    # per-group delta encoding with group-boundary reset
    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[starts] = doc_ids[starts]
    # strictness check: every non-start gap must be > 0; starts must be >= 0
    nonstart_mask = np.ones(n, dtype=bool)
    nonstart_mask[starts] = False
    if np.any(gaps[nonstart_mask] <= 0) or np.any(doc_ids[starts] < 0):
        raise ValueError("doc_ids must be strictly increasing within groups")

    gaps_buf, gaps_sz = encode_varint_with_sizes(gaps.astype(np.uint64))
    tfs_buf, tfs_sz = encode_varint_with_sizes(tfs.astype(np.uint64))
    dls_buf, dls_sz = encode_varint_with_sizes(doclens.astype(np.uint64))

    starts_l, ends_l = starts.tolist(), ends.tolist()

    def split(buf: bytes, sizes: np.ndarray) -> list[bytes]:
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        off_l = offs.tolist()  # Python ints: no per-slice numpy scalar boxing
        mv = memoryview(buf)
        return [bytes(mv[off_l[s] : off_l[e]]) for s, e in zip(starts_l, ends_l)]

    # per-group stats
    df = (ends - starts).astype(np.int64)
    cf = np.add.reduceat(tfs, starts) if n else np.array([], dtype=np.int64)

    # block tiling: blocks are contiguous BLOCK_SIZE runs within each group
    nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    total_blocks = int(nblocks.sum())
    grp_of_block = np.repeat(np.arange(ngroups), nblocks)
    blk_cumstart = np.concatenate(([0], np.cumsum(nblocks)[:-1]))
    blk_in_grp = np.arange(total_blocks) - blk_cumstart[grp_of_block]
    blk_start = starts[grp_of_block] + blk_in_grp * BLOCK_SIZE
    blk_end = np.minimum(blk_start + BLOCK_SIZE, ends[grp_of_block])
    blk_last = doc_ids[blk_end - 1]
    blk_max_tf = np.maximum.reduceat(tfs, blk_start) if total_blocks else np.array([], dtype=np.int64)
    blk_min_dl = np.minimum.reduceat(doclens, blk_start) if total_blocks else np.array([], dtype=np.int64)
    cuts = np.cumsum(nblocks)[:-1]

    blk_bounds = np.concatenate(([0], cuts, [total_blocks]))
    bounds_list = blk_bounds.tolist()

    def ragged(arr: np.ndarray) -> list[list[int]]:
        """One C-level tolist + Python list slicing — ~2x np.split(+tolist),
        which pays per-group ndarray-view construction."""
        full = arr.tolist()
        return [
            full[bounds_list[i] : bounds_list[i + 1]]
            for i in range(len(bounds_list) - 1)
        ]

    def block_offsets(sizes: np.ndarray) -> list[list[int]]:
        """Byte offset of each block's first value, relative to its group's
        blob start — makes every block an independently decodable varint
        stream (LEB128 values are self-delimiting)."""
        pre = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=pre[1:])
        offs = pre[blk_start] - pre[starts[grp_of_block]]
        return ragged(offs)

    return {
        "df": df.tolist(),
        "cf": cf.tolist(),
        "doc_gaps": split(gaps_buf, gaps_sz),
        "tfs_enc": split(tfs_buf, tfs_sz),
        "doclens_enc": split(dls_buf, dls_sz),
        "block_last_doc": ragged(blk_last),
        "block_max_tf": ragged(blk_max_tf),
        "block_min_dl": ragged(blk_min_dl),
        "block_off_gaps": block_offsets(gaps_sz),
        "block_off_tfs": block_offsets(tfs_sz),
        "block_off_dls": block_offsets(dls_sz),
    }


def encode_positions_batch(
    positions: np.ndarray,
    tfs: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> list[bytes]:
    """Encode term positions for MANY posting lists at once (round 3:
    positional postings -> index-assisted phrase queries).

    `positions` is the flat stream of within-doc token positions, one run of
    `tfs[p]` strictly-increasing values per posting `p`, aligned with the
    (seg, term, doc)-sorted posting columns that `encode_postings_batch`
    received; `starts`/`ends` delimit each (seg, term) group IN POSTINGS.
    Per-posting delta encoding (first position absolute, then gaps) + one
    varint pass over the whole batch; returns one blob per group. Decoding
    needs only the tf stream (`decode_positions`), so positions add ONE
    nullable binary column to the segment schema and zero cost to
    non-phrase queries (column pruning skips it)."""
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n_occ = positions.size
    if n_occ != int(tfs.sum()):
        raise ValueError("positions length must equal sum(tfs)")
    # posting boundaries in the flat occurrence stream
    occ_bounds = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs, out=occ_bounds[1:])
    post_starts = occ_bounds[:-1]
    deltas = positions.copy()
    if n_occ:
        deltas[1:] -= positions[:-1]
        deltas[post_starts] = positions[post_starts]
    nonstart = np.ones(n_occ, dtype=bool)
    nonstart[post_starts[post_starts < n_occ]] = False
    if np.any(deltas[nonstart] <= 0) or (
        n_occ and np.any(positions[post_starts[post_starts < n_occ]] < 0)
    ):
        raise ValueError("positions must be strictly increasing within a doc")
    buf, sizes = encode_varint_with_sizes(deltas.astype(np.uint64))
    byte_offs = np.zeros(n_occ + 1, dtype=np.int64)
    np.cumsum(sizes, out=byte_offs[1:])
    mv = memoryview(buf)
    # group g's occurrences span occ_bounds[starts[g]] .. occ_bounds[ends[g]]
    lo = byte_offs[occ_bounds[np.asarray(starts, dtype=np.int64)]].tolist()
    hi = byte_offs[occ_bounds[np.asarray(ends, dtype=np.int64)]].tolist()
    return [bytes(mv[a:b]) for a, b in zip(lo, hi)]


def decode_positions(pos_enc: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode one group's position blob back to the flat position stream
    (per-posting reset cumsum; `tfs` gives the run lengths)."""
    deltas = decode_varint(pos_enc).astype(np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    if deltas.size == 0:
        return deltas
    cs = np.cumsum(deltas)
    post_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    # absolute[i] = cs[i] - cs[start] + deltas[start] within each posting
    base = np.repeat(cs[post_starts] - deltas[post_starts], tfs)
    return cs - base


def ragged_gather(
    flat: np.ndarray, counts: np.ndarray, order: np.ndarray
) -> np.ndarray:
    """Reorder a ragged array (runs of `counts[i]` values) by group `order`
    in one vectorized gather — used to carry position runs through the
    build's posting lexsort and the merge's re-sort."""
    starts = np.zeros(counts.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    new_counts = counts[order]
    idx = np.repeat(starts[order], new_counts) + _intra_block_arange(new_counts)
    return flat[idx]


def decode_varint_concat(bufs: list) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY LEB128 streams in ONE vectorized pass.

    The streams are self-delimiting (a value ends at its first byte
    < 0x80), so their concatenation decodes exactly like one stream;
    per-stream value counts fall out of a cumsum of terminator bytes over
    the stream boundaries. Returns (values uint64, counts int64 per
    input buffer). Turns N per-list decode calls into ~3 array passes —
    the batch shape for merge/compaction kernels that touch every list
    of a partition (N ≈ 30k lists per task on the bench compaction)."""
    n = len(bufs)
    if n == 0:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    sizes = np.fromiter((len(b) for b in bufs), np.int64, count=n)
    raw = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    if raw.size == 0:
        return np.array([], dtype=np.uint64), np.zeros(n, dtype=np.int64)
    is_last = raw < 0x80
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    idx = np.arange(raw.size, dtype=np.int64)
    group_start = starts[np.searchsorted(ends, idx, side="left")]
    pos = (idx - group_start).astype(np.uint64)
    contrib = (raw & np.uint8(0x7F)).astype(np.uint64) << (pos * _SEVEN)
    values = np.add.reduceat(contrib, starts)
    cum_last = np.concatenate(([0], np.cumsum(is_last)))
    bounds = np.concatenate(([0], np.cumsum(sizes)))
    counts = cum_last[bounds[1:]] - cum_last[bounds[:-1]]
    return values, counts


def decode_doc_ids_concat(doc_gaps: list) -> tuple[np.ndarray, np.ndarray]:
    """Batch decode_doc_ids: gap→id reconstruction is a SEGMENTED cumsum
    (one global cumsum, per-list offset subtracted — no per-list Python).
    Returns (doc_ids int64 concatenated, counts int64 per list)."""
    gaps, counts = decode_varint_concat(doc_gaps)
    gaps = gaps.astype(np.int64)
    total = np.cumsum(gaps)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    nonempty = counts > 0
    offsets = np.zeros(counts.size, dtype=np.int64)
    ne_starts = starts[nonempty]
    offsets[nonempty] = np.where(ne_starts > 0, total[ne_starts - 1], 0)
    return total - np.repeat(offsets, counts), counts


def decode_postings_concat(doc_gaps: list, tfs_enc: list, doclens_enc: list):
    """Batch decode_postings over aligned per-list byte streams: returns
    (doc_ids, tfs, doclens, counts) where the value arrays are the lists'
    postings concatenated in order and `counts` is postings-per-list."""
    doc_ids, counts = decode_doc_ids_concat(doc_gaps)
    tfs, tf_counts = decode_varint_concat(tfs_enc)
    dls, dl_counts = decode_varint_concat(doclens_enc)
    if not (
        np.array_equal(tf_counts, counts)
        and np.array_equal(dl_counts, counts)
    ):
        raise ValueError("posting stream lengths disagree across columns")
    return (
        doc_ids,
        tfs.astype(np.int64),
        dls.astype(np.int64),
        counts,
    )


def decode_postings(doc_gaps: bytes, tfs_enc: bytes, doclens_enc: bytes):
    """Decode to (doc_ids int64, tfs int64, doclens int64)."""
    gaps = decode_varint(doc_gaps).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = decode_varint(tfs_enc).astype(np.int64)
    doclens = decode_varint(doclens_enc).astype(np.int64)
    return doc_ids, tfs, doclens


def decode_doc_ids(doc_gaps: bytes) -> np.ndarray:
    """Decode only the docID stream (the WAND candidate pass skips tf/dl)."""
    return np.cumsum(decode_varint(doc_gaps).astype(np.int64))


def decode_value_blocks(
    blob: bytes, offs: np.ndarray, df: int, sel: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the selected blocks of a value stream (tfs/doclens).

    `offs` is the per-block byte-offset array, `sel` a sorted array of block
    indices. Returns (values, positions): `positions` are the global posting
    indices (0..df) the values correspond to. One concatenated varint pass —
    no per-block decode calls.
    """
    offs = np.asarray(offs, dtype=np.int64)
    nblocks = offs.size
    if sel.size == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    ends = np.concatenate((offs[1:], [len(blob)]))
    mv = memoryview(blob)
    buf = b"".join(bytes(mv[offs[b] : ends[b]]) for b in sel)
    vals = decode_varint(buf).astype(np.int64)
    counts = np.minimum((sel + 1) * BLOCK_SIZE, df) - sel * BLOCK_SIZE
    positions = np.repeat(sel * BLOCK_SIZE, counts) + _intra_block_arange(counts)
    return vals, positions


def _intra_block_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized ragged arange)."""
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return out - np.repeat(starts, counts)
