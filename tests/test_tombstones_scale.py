"""Distributed tombstone tier (round-3 verdict items #1 and #6).

Mass deletes must never materialize a driver-side id list: delete_by_query
above `collect_cap` writes the matched frame as an executor-side parquet
deletion file; compaction's purge above `tombstone_broadcast_cap` routes
the exclusion set per segment with a cogroup instead of a numpy broadcast.
Both paths must be result-identical to the small-set paths they shadow,
and the purge trigger must bound the in-memory set automatically.
"""

from __future__ import annotations

import glob
import os

import pytest

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.index.merge import merge_segments
from elasticsearch_assets_spark.index.tombstones import (
    TombstoneOverflowError,
    add_tombstones,
    add_tombstones_df,
    clear_tombstones,
    load_tombstones,
    tombstone_count,
    tombstones_df,
)
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 600, partitions=4).cache()


def _build(spark, corpus, tmp_path_factory, name):
    d = str(tmp_path_factory.mktemp(name) / "idx")
    build_index(spark, corpus, d, num_segments=4, num_chunks=2)
    return d


def _term_matching_fraction(corpus, lo=0.15, hi=0.75, exclude=()):
    """A term matching a healthy MINORITY of docs — the most common term
    in pages_df appears in ~every doc, and deleting by it empties the
    index (a separate edge, tested in test_delete_everything_survives)."""
    from collections import Counter

    from elasticsearch_assets_spark.analysis.tokenizer import tokenize_series

    pdf = corpus.select("text").toPandas()
    n = len(pdf)
    c = Counter(
        t for toks in tokenize_series(pdf["text"]) for t in set(toks)
    )
    for t, k in c.most_common():
        if t not in exclude and lo * n <= k <= hi * n:
            return t
    raise AssertionError("no mid-frequency term in corpus")


def test_mass_delete_parquet_path_matches_collect_path(
    spark, corpus, tmp_path_factory
):
    """collect_cap=0 forces the executor-side parquet deletion write; the
    surviving result set must equal the JSON/collect path's, the second
    call must delete 0, and no JSON deletion file may appear."""
    da = _build(spark, corpus, tmp_path_factory, "massdel_a")
    db = _build(spark, corpus, tmp_path_factory, "massdel_b")
    ia, ib = InvertedIndex(spark, da), InvertedIndex(spark, db)
    term = _term_matching_fraction(corpus)
    probe = term

    n_a = ia.delete_by_query([term], collect_cap=0)  # parquet path
    n_b = ib.delete_by_query([term])  # default collect path
    assert n_a == n_b > 0
    assert glob.glob(os.path.join(da, "tombstones", "p-*.parquet"))
    assert not glob.glob(os.path.join(da, "tombstones", "t-*.json"))
    assert ia.delete_by_query([term], collect_cap=0) == 0
    ra = ia.search([probe], k=None).collect()
    rb = ib.search([probe], k=None).collect()
    assert [(r["doc_id"], r["score"]) for r in ra] == [
        (r["doc_id"], r["score"]) for r in rb
    ]
    # count parity across tiers
    assert tombstone_count(da) == tombstone_count(db) == n_a
    import numpy as np

    assert np.array_equal(load_tombstones(da), load_tombstones(db))


def test_distributed_purge_bit_identical_to_broadcast_purge(
    spark, corpus, tmp_path_factory
):
    """tombstone_broadcast_cap=0 forces the cogrouped purge; the compacted
    index must be search-identical to a broadcast-path purge of the same
    deletions, with the same corrected stats."""
    da = _build(spark, corpus, tmp_path_factory, "purge_cg")
    db = _build(spark, corpus, tmp_path_factory, "purge_np")
    ia, ib = InvertedIndex(spark, da), InvertedIndex(spark, db)
    term = _term_matching_fraction(corpus)
    ids = [r["doc_id"] for r in ia.search([term], k=None).collect()]
    assert ids
    # write via BOTH tiers so the purge has to union them
    half = len(ids) // 2
    add_tombstones(da, ids[:half])
    add_tombstones_df(
        da, spark.createDataFrame([(int(i),) for i in ids[half:]], "doc_id long")
    )
    add_tombstones(db, ids)
    merge_segments(spark, da, 2, apply_tombstones=True, tombstone_broadcast_cap=0)
    merge_segments(spark, db, 2, apply_tombstones=True)
    assert tombstone_count(da) == tombstone_count(db) == 0
    ia, ib = InvertedIndex(spark, da), InvertedIndex(spark, db)
    assert ia.meta.num_segments == ib.meta.num_segments == 2
    probe = _term_matching_fraction(corpus, lo=0.05, exclude={term})
    ra = ia.search([probe], k=None).collect()
    rb = ib.search([probe], k=None).collect()
    assert ra and [(r["doc_id"], r["score"]) for r in ra] == [
        (r["doc_id"], r["score"]) for r in rb
    ]
    assert not set(i for i, _ in ((r["doc_id"], 0) for r in ra)) & set(ids)
    # stats corrected identically (live-doc N drives BM25 idf)
    assert ia.meta.n_docs == ib.meta.n_docs


def test_purge_trigger_auto_compacts(spark, corpus, tmp_path_factory):
    """purge_trigger=0: any delete immediately triggers a physical purge —
    tombstones go to zero, deleted docs stay gone, stats drop to live."""
    d = _build(spark, corpus, tmp_path_factory, "autopurge")
    idx = InvertedIndex(spark, d)
    term = _term_matching_fraction(corpus)
    n_before = idx.meta.n_docs
    n = idx.delete_by_query([term], purge_trigger=0)
    assert n > 0
    assert tombstone_count(d) == 0
    assert not os.listdir(os.path.join(d, "tombstones"))
    idx = InvertedIndex(spark, d)
    assert idx.search([term], k=None).count() == 0
    assert idx.meta.n_docs == n_before - n  # purged stats are live-only


def test_tombstone_parquet_write_is_crash_atomic(spark, tmp_path):
    """A crash mid-write leaves only an ignored `.tmp-` dir: count, load
    and the distributed view never see it; a later successful write
    coexists with the debris."""
    d = str(tmp_path / "idx")
    os.makedirs(os.path.join(d, "tombstones", ".tmp-999"), exist_ok=True)
    with open(os.path.join(d, "tombstones", ".tmp-999", "part-0"), "w") as fh:
        fh.write("garbage")
    assert tombstone_count(d) == 0
    assert load_tombstones(d).size == 0
    assert tombstones_df(spark, d) is None
    add_tombstones_df(
        d, spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    )
    assert tombstone_count(d) == 50
    assert load_tombstones(d).size == 50
    clear_tombstones(d)
    assert tombstone_count(d) == 0


def test_load_tombstones_overflow_raises(spark, tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    add_tombstones(d, range(100))
    with pytest.raises(TombstoneOverflowError):
        load_tombstones(d, cap=50)
    assert load_tombstones(d, cap=None).size == 100
    assert tombstones_df(spark, d).count() == 100
    clear_tombstones(d)
    assert tombstone_count(d) == 0


def test_stream_auto_purge_on_tombstone_pressure(spark, tmp_path):
    """A streaming index with auto_purge_tombstones: deletes between
    epochs are physically purged at the next refresh (tombstones -> 0),
    the deleted docs stay gone, and the stream keeps appending +
    serving correctly afterwards."""
    from elasticsearch_assets_spark.streaming.index_stream import (
        StreamingIndexWriter,
    )

    corpus = pages_df(spark, 600, partitions=2).select("doc_id", "text").cache()
    d = str(tmp_path / "sp")
    writer = StreamingIndexWriter(
        d, segs_per_batch=2, auto_purge_tombstones=0
    )
    for b in range(2):
        writer(corpus.where(f"doc_id >= {b*200} AND doc_id < {(b+1)*200}"), b)
    writer.refresh(spark)
    idx = InvertedIndex(spark, d)
    victims = [r["doc_id"] for r in idx.search(["data"], k=None).collect()][:25]
    assert victims
    add_tombstones(d, victims)
    # next epoch + refresh triggers the purge
    writer(corpus.where("doc_id >= 400 AND doc_id < 600"), 2)
    writer.refresh(spark)
    assert tombstone_count(d) == 0
    idx = InvertedIndex(spark, d)
    assert idx.meta.n_docs == 600 - len(victims)
    got = {r["doc_id"] for r in idx.search(["data"], k=None).collect()}
    assert not got & set(victims)
    assert any(i >= 400 for i in got)  # post-purge epoch is serving


def test_delete_everything_survives(spark, tmp_path_factory):
    """Deleting every doc then purging leaves a live, empty index (the ES
    behavior): zero docs, zero tombstones, searches return empty."""
    d = str(tmp_path_factory.mktemp("delall") / "idx")
    small = pages_df(spark, 60, partitions=2)
    build_index(spark, small, d, num_segments=2, num_chunks=1)
    idx = InvertedIndex(spark, d)
    all_ids = [int(r["doc_id"]) for r in small.select("doc_id").collect()]
    add_tombstones(d, all_ids)
    merge_segments(spark, d, 1, apply_tombstones=True)
    idx = InvertedIndex(spark, d)
    assert idx.meta.n_docs == 0
    assert idx.search(["data"], k=None).count() == 0


def test_pit_carries_parquet_tombstones(spark, corpus, tmp_path_factory):
    """A PIT opened after a mass (parquet-tier) delete keeps excluding the
    deleted docs even after the source index purges and clears them."""
    d = _build(spark, corpus, tmp_path_factory, "pit_pq")
    idx = InvertedIndex(spark, d)
    term = _term_matching_fraction(corpus)
    idx.delete_by_query([term], collect_cap=0)
    pit = idx.pit()
    # source compacts away its tombstones; the PIT must not notice
    merge_segments(spark, d, 2, apply_tombstones=True)
    assert pit.search([term], k=None).count() == 0
    assert tombstone_count(d) == 0


def test_same_handle_fresh_after_auto_purge(spark, corpus, tmp_path_factory):
    """Round-4 advice #1: a delete_by_query that trips the auto-purge must
    leave the SAME live handle rank-identical to a freshly opened one —
    cached meta (n_docs/avgdl), the driver df cache, and the deletion set
    all re-sync, so a second search scores with post-purge (live-only)
    stats, not the pre-purge globals."""
    d = _build(spark, corpus, tmp_path_factory, "samehandle")
    idx = InvertedIndex(spark, d)
    term = _term_matching_fraction(corpus)
    probe = _term_matching_fraction(corpus, lo=0.05, exclude={term})
    # populate the handle's caches pre-purge (stats dict + meta)
    idx.search([probe], k=5).collect()
    assert idx._stats_cache is not None
    n_before = idx.meta.n_docs
    n = idx.delete_by_query([term], purge_trigger=0)
    assert n > 0
    # same handle, no reopen: meta/stats/tombstones must match a reopen
    fresh = InvertedIndex(spark, d)
    assert idx.meta.n_docs == fresh.meta.n_docs == n_before - n
    assert idx.meta.avgdl == fresh.meta.avgdl
    assert idx.tombstones.size == 0
    same = [(r["doc_id"], r["score"]) for r in idx.search([probe], k=None).collect()]
    ref = [(r["doc_id"], r["score"]) for r in fresh.search([probe], k=None).collect()]
    assert same and same == ref


def test_warmed_handle_repins_after_auto_purge(spark, corpus, tmp_path_factory):
    """A warm()-pinned handle whose own delete_by_query auto-purges must
    not keep serving the pre-purge pinned segments (deleted docs would
    reappear once tombstones clear): the purge cools and re-warms the pin
    over the compacted layout."""
    d = _build(spark, corpus, tmp_path_factory, "warmhandle")
    idx = InvertedIndex(spark, d).warm()
    term = _term_matching_fraction(corpus)
    deleted = {r["doc_id"] for r in idx.search([term], k=None).collect()}
    assert idx.delete_by_query([term], purge_trigger=0) == len(deleted)
    assert idx._warm_segments is not None  # still pinned, on the new layout
    got = {r["doc_id"] for r in idx.search([term], k=None).collect()}
    assert not got  # purged docs must NOT reappear through the old pin
    probe = _term_matching_fraction(corpus, lo=0.05, exclude={term})
    fresh = InvertedIndex(spark, d)
    same = [(r["doc_id"], r["score"]) for r in idx.search([probe], k=None).collect()]
    ref = [(r["doc_id"], r["score"]) for r in fresh.search([probe], k=None).collect()]
    assert same and same == ref
    idx.cool()


def test_refresh_tombstones_resyncs_after_external_purge(
    spark, corpus, tmp_path_factory
):
    """An open handle whose index is purged EXTERNALLY (e.g. a
    StreamingIndexWriter.refresh auto-purge in another process) re-syncs
    meta + stats on its next refresh_tombstones() — the layout key moved,
    so the cheap tombstone reload escalates to a full cache refresh."""
    d = _build(spark, corpus, tmp_path_factory, "exthandle")
    idx = InvertedIndex(spark, d)
    term = _term_matching_fraction(corpus)
    idx.search([term], k=5).collect()  # warm the caches
    n_before = idx.meta.n_docs
    victims = [r["doc_id"] for r in idx.search([term], k=None).collect()]
    add_tombstones(d, victims)
    merge_segments(spark, d, 2, apply_tombstones=True)  # external compaction
    idx.refresh_tombstones()
    assert idx.meta.n_docs == n_before - len(victims)
    assert idx.meta.num_segments == 2
    fresh = InvertedIndex(spark, d)
    probe = _term_matching_fraction(corpus, lo=0.05, exclude={term})
    same = [(r["doc_id"], r["score"]) for r in idx.search([probe], k=None).collect()]
    ref = [(r["doc_id"], r["score"]) for r in fresh.search([probe], k=None).collect()]
    assert same and same == ref
