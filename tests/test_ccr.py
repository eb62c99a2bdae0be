"""CCR follower: file-reconciliation replication against a leader index.

Reference contract: ES CCR — pull-based follower catch-up, read-only
while following, snapshot isolation from later leader writes until the
next poll, promote (unfollow) to a regular index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import (
    build_chunk,
    build_index,
    finalize_index,
)
from elasticsearch_assets_spark.index.ccr import promote_follower, sync_follower
from elasticsearch_assets_spark.index.seg_map import SegMapEntry, upsert_chunk_entry
from elasticsearch_assets_spark.query.engine import InvertedIndex


def _ranked(spark, d, terms=("spark", "join")):
    rows = InvertedIndex(spark, d).search(list(terms), k=None, mode="or").collect()
    return sorted((r["doc_id"], round(r["score"], 9)) for r in rows)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ccr")
    corpus = pages_df(spark, 1200, partitions=8).cache()
    leader = str(base / "leader")
    build_index(
        spark, corpus.where("doc_id < 800"), leader,
        num_segments=8, num_chunks=2,
    )
    return corpus, leader, base


def test_bootstrap_then_incremental_catchup(spark, setup):
    corpus, leader, base = setup
    follower = str(base / "f1")
    rep = sync_follower(spark, leader, follower)
    assert rep["mode"] == "bootstrap" and rep["n_docs"] == 800
    assert _ranked(spark, follower) == _ranked(spark, leader)

    # leader grows by one committed chunk (the streaming-epoch shape)
    build_chunk(
        spark, corpus.where("doc_id >= 800"), leader,
        chunk_id=2, seg_base=8, segs_per_chunk=4, nparts=4,
    )
    upsert_chunk_entry(
        leader, SegMapEntry(chunk=2, spc=4, segs=[8, 9, 10, 11])
    )
    finalize_index(
        spark, leader, num_segments=12, num_chunks=3,
        partitioning="doc_hash", segs_per_chunk=4,
    )
    rep2 = sync_follower(spark, leader, follower)
    assert rep2["mode"] == "incremental"
    assert rep2["chunks_added"] == ["chunk=2"]
    assert rep2["chunks_removed"] == []
    assert rep2["n_docs"] == 1200
    assert _ranked(spark, follower) == _ranked(spark, leader)
    # rank-identity vs a monolithic build over the same corpus
    mono = str(base / "mono")
    build_index(spark, corpus, mono, num_segments=8, num_chunks=2)
    assert _ranked(spark, follower) == _ranked(spark, mono)


def test_follower_is_isolated_until_next_sync(spark, setup):
    corpus, leader, base = setup
    follower = str(base / "f2")
    sync_follower(spark, leader, follower)
    before = _ranked(spark, follower)

    from elasticsearch_assets_spark.index.merge import merge_segments

    merge_segments(spark, leader, 4, apply_tombstones=True)
    # leader compaction deleted chunk files; the follower's hard links
    # keep the snapshot alive (the PIT refcount argument)
    assert _ranked(spark, follower) == before
    rep = sync_follower(spark, leader, follower)
    assert rep["chunks_added"] and rep["chunks_removed"]
    assert _ranked(spark, follower) == _ranked(spark, leader) == before


def test_sync_refusals_and_promote(spark, setup):
    corpus, leader, base = setup
    other = str(base / "other")
    build_index(
        spark, corpus.where("doc_id < 100"), other,
        num_segments=4, num_chunks=1,
    )
    with pytest.raises(ValueError, match="not a CCR follower"):
        sync_follower(spark, leader, other)

    follower = str(base / "f3")
    sync_follower(spark, leader, follower)
    with pytest.raises(ValueError, match="tracks"):
        sync_follower(spark, other, follower)

    promote_follower(follower)
    with pytest.raises(ValueError, match="not a CCR follower"):
        promote_follower(follower)
    # promoted index is a regular index now: following again refuses
    with pytest.raises(ValueError, match="not a CCR follower"):
        sync_follower(spark, leader, follower)


def test_tombstones_replicate(spark, setup):
    corpus, leader2, base = setup
    leader = str(base / "leader_del")
    build_index(
        spark, corpus.where("doc_id < 400"), leader,
        num_segments=4, num_chunks=1,
    )
    follower = str(base / "f4")
    sync_follower(spark, leader, follower)
    hit = InvertedIndex(spark, leader).search(["spark"], k=None).collect()
    victim = hit[0]["doc_id"]

    from elasticsearch_assets_spark.index.tombstones import add_tombstones

    add_tombstones(leader, [victim])
    sync_follower(spark, leader, follower)
    got = {r["doc_id"] for r in
           InvertedIndex(spark, follower).search(["spark"], k=None).collect()}
    assert victim not in got
