"""Unit tests for the durable doc->segment mapping (index/seg_map.py)."""

from __future__ import annotations

from elasticsearch_assets_spark.index.seg_map import (
    SegMapEntry,
    apply_merge_chunks,
    apply_merge_segments,
    load_seg_map,
    normalize,
    poison_seg_map,
    save_seg_map,
    upsert_chunk_entry,
)


def _identity(chunk: int, spc: int, lo=None, hi=None) -> SegMapEntry:
    return SegMapEntry(
        chunk=chunk, spc=spc, segs=[chunk * spc + i for i in range(spc)],
        lo=lo, hi=hi,
    )


def test_normalize_collapses_uniform_tables():
    # three entries sharing one table -> one unranged entry
    es = [SegMapEntry(chunk=c, spc=2, segs=[5, 6]) for c in range(3)]
    out = normalize(es)
    assert len(out) == 1 and out[0].segs == [5, 6] and out[0].lo is None


def test_normalize_keeps_distinct_tables():
    es = [_identity(0, 2, lo=0, hi=10), _identity(1, 2, lo=10, hi=20)]
    assert len(normalize(es)) == 2


def test_merge_segments_transform_matches_rewrite(tmp_path):
    # 4 ranged chunks x spc 4, target 4: chunk c table [4c..4c+3] % 4 ->
    # [0..3] for every chunk -> collapse to one unranged entry
    d = str(tmp_path)
    save_seg_map(d, [_identity(c, 4, lo=c * 100, hi=(c + 1) * 100) for c in range(4)])
    apply_merge_segments(d, 4)
    out = load_seg_map(d)
    assert len(out) == 1 and out[0].segs == [0, 1, 2, 3] and out[0].lo is None


def test_merge_segments_uneven_target_keeps_ranges(tmp_path):
    d = str(tmp_path)
    save_seg_map(d, [_identity(c, 4, lo=c * 100, hi=(c + 1) * 100) for c in range(2)])
    apply_merge_segments(d, 3)
    out = load_seg_map(d)
    # chunk 0: [0,1,2,3]%3=[0,1,2,0]; chunk 1: [4,5,6,7]%3=[1,2,0,1]
    assert len(out) == 2
    assert out[0].segs == [0, 1, 2, 0] and out[0].lo == 0
    assert out[1].segs == [1, 2, 0, 1] and out[1].lo == 100


def test_merge_chunks_transform_folds_picked_epochs(tmp_path):
    # streaming shape: unranged epoch entries, bases c*spc; merge epochs
    # 0 and 2 with segs_out == spc -> both tables become [base..base+spc-1]
    # -> dedupe to ONE entry; epoch 1 untouched
    d = str(tmp_path)
    for c in range(3):
        upsert_chunk_entry(d, _identity(c, 2))
    apply_merge_chunks(d, [0, 2], seg_base=10, segs_out=2, new_chunk=-1)
    out = load_seg_map(d)
    by_chunk = {e.chunk: e for e in out}
    assert set(by_chunk) == {-1, 1}
    assert by_chunk[-1].segs == [10, 11]
    assert by_chunk[1].segs == [2, 3]


def test_upsert_is_idempotent_per_chunk(tmp_path):
    d = str(tmp_path)
    upsert_chunk_entry(d, _identity(0, 2))
    upsert_chunk_entry(d, _identity(0, 2))  # epoch replay
    upsert_chunk_entry(d, _identity(1, 2))
    assert len(load_seg_map(d)) == 2


def test_poison_sticks(tmp_path):
    d = str(tmp_path)
    poison_seg_map(d)
    upsert_chunk_entry(d, _identity(0, 2))
    assert load_seg_map(d) is None
