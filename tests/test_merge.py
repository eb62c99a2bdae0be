"""Segment merge/compaction: merged index must be search-identical."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index, read_manifest
from elasticsearch_assets_spark.index.merge import merge_segments
from elasticsearch_assets_spark.query.engine import InvertedIndex

QUERIES = [
    (["spark", "join"], "and", 10),
    (["the", "data"], "or", 25),
    (["crawl"], "and", None),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("merge") / "idx")
    corpus = pages_df(spark, 2500, partitions=8)
    build_index(spark, corpus, idx, num_chunks=4, num_segments=32)
    return idx


def _results(spark, idx_dir):
    out = {}
    ix = InvertedIndex(spark, idx_dir)
    for terms, mode, k in QUERIES:
        out[(tuple(terms), mode, k)] = [
            (r["doc_id"], r["score"]) for r in ix.search(terms, k=k, mode=mode).collect()
        ]
    return out


def test_merge_preserves_results_and_shrinks_segments(spark, built):
    before = _results(spark, built)
    seg_count_before = (
        spark.read.parquet(os.path.join(built, "segments"))
        .select("seg_id").distinct().count()
    )
    assert seg_count_before > 4

    merge_segments(spark, built, target_segments=4)

    seg_df = spark.read.parquet(os.path.join(built, "segments"))
    segs = {r["seg_id"] for r in seg_df.select("seg_id").distinct().collect()}
    assert segs <= set(range(4))
    # each (seg, term) appears exactly once after merge
    dup = (
        seg_df.groupBy("seg_id", "term").count().where(F.col("count") > 1).count()
    )
    assert dup == 0
    meta = InvertedIndex(spark, built).meta
    assert meta.num_segments == 4 and meta.num_chunks == 1

    after = _results(spark, built)
    assert after == before  # bit-identical docIDs and scores

    statuses = [r["status"] for r in read_manifest(built)]
    assert any(s.startswith("compacted:") for s in statuses)


def test_merge_is_atomic_no_leftover_dirs(spark, built):
    assert not os.path.exists(os.path.join(built, "segments.tmp"))
    assert not os.path.exists(os.path.join(built, "segments.old"))


# ---------------------------------------------------------------------------
# tombstone deletions
# ---------------------------------------------------------------------------


def test_tombstones_exclude_then_purge(spark, tmp_path):
    from elasticsearch_assets_spark.index.tombstones import (
        add_tombstones,
        load_tombstones,
    )
    from elasticsearch_assets_spark.index.merge import count_distinct_docs

    idx = str(tmp_path / "tomb")
    corpus = pages_df(spark, 1500, partitions=4)
    build_index(spark, corpus, idx, num_segments=8)
    base = InvertedIndex(spark, idx)
    full = base.search(["the", "data"], k=30, mode="or").collect()
    victims = {r["doc_id"] for r in full[:5]}

    assert add_tombstones(idx, victims) == 5
    ix = InvertedIndex(spark, idx)  # reload picks up tombstones
    got = ix.search(["the", "data"], k=30, mode="or").collect()
    assert not ({r["doc_id"] for r in got} & victims)
    # surviving docs keep their exact pre-delete scores (stats unchanged
    # until merge — the ES deleted-docs contract)
    before = {r["doc_id"]: r["score"] for r in full}
    for r in got:
        if r["doc_id"] in before:
            assert r["score"] == before[r["doc_id"]]
    # serving path agrees
    assert [(r["doc_id"], r["score"]) for r in got] == ix.search_local(
        ["the", "data"], k=30, mode="or"
    )

    # compaction purges physically and corrects stats
    n_before = ix.meta.n_docs
    merge_segments(spark, idx, target_segments=4)
    assert load_tombstones(idx).size == 0
    purged = InvertedIndex(spark, idx)
    assert purged.meta.n_docs == n_before - 5
    assert count_distinct_docs(spark, idx) == n_before - 5
    got2 = purged.search(["the", "data"], k=30, mode="or").collect()
    assert not ({r["doc_id"] for r in got2} & victims)
    # ranking of survivors is stable (same relative order; scores shift
    # because df/avgdl now reflect the purge)
    assert [r["doc_id"] for r in got2[:10]] == [
        r["doc_id"] for r in got if r["doc_id"] not in victims
    ][:10]


def test_tombstone_files_are_cumulative(tmp_path):
    from elasticsearch_assets_spark.index.tombstones import (
        add_tombstones,
        clear_tombstones,
        load_tombstones,
    )

    d = str(tmp_path / "i")
    add_tombstones(d, [3, 1])
    add_tombstones(d, [2, 3])
    assert load_tombstones(d).tolist() == [1, 2, 3]
    assert add_tombstones(d, []) == 0
    clear_tombstones(d)
    assert load_tombstones(d).size == 0


# ---------------------------------------------------------------------------
# tiered chunk compaction
# ---------------------------------------------------------------------------


def test_tiered_merge_plan_and_chunk_merge(spark, tmp_path):
    from elasticsearch_assets_spark.index.merge import merge_chunks, plan_tiered_merge
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    idx = str(tmp_path / "tiered")
    corpus = pages_df(spark, 1200, partitions=4)
    build_index(spark, corpus, idx, num_chunks=6, num_segments=12)
    assert plan_tiered_merge(idx, max_chunks=8) == []  # under the cap
    picks = plan_tiered_merge(idx, max_chunks=4, merge_factor=3)
    assert len(picks) == 3

    before = InvertedIndex(spark, idx)
    want = {
        q: [(r["doc_id"], r["score"]) for r in before.search(list(q), k=15, mode="or").collect()]
        for q in (("the", "data"), ("spark",))
    }
    n_docs_before = before.meta.n_docs

    new_chunk = merge_chunks(spark, idx, picks, segs_out=4)
    rows = read_manifest(idx)
    ids = {r["chunk_id"] for r in rows}
    assert new_chunk in ids and not (set(picks) & ids)
    assert sum(r["n_docs"] for r in rows if r["status"] == "committed") == n_docs_before

    # search results identical after the chunk-subset merge (re-finalize not
    # even needed: stats tables were not touched, segments are equivalent)
    after = InvertedIndex(spark, idx)
    for q, expected in want.items():
        got = [(r["doc_id"], r["score"]) for r in after.search(list(q), k=15, mode="or").collect()]
        assert got == expected

    import os
    for c in picks:
        assert not os.path.exists(f"{idx}/segments/chunk={c}")


def test_merge_chunks_validation(spark, tmp_path):
    from elasticsearch_assets_spark.index.merge import merge_chunks

    idx = str(tmp_path / "v")
    build_index(spark, pages_df(spark, 200, partitions=2), idx, num_chunks=2)
    with pytest.raises(ValueError):
        merge_chunks(spark, idx, [0])
    with pytest.raises(ValueError):
        merge_chunks(spark, idx, [0, 99])


def test_double_purge_cycle_keeps_doc_count_exact(spark, tmp_path):
    """Two tombstone->purge-compaction cycles: n_docs (and thus idf/avgdl)
    must equal the true live-doc count after EACH cycle — the corrective
    delta must account for prior compacted:* manifest rows, not only
    status=='committed' ones."""
    from elasticsearch_assets_spark.index.tombstones import add_tombstones

    idx = str(tmp_path / "idx")
    corpus = pages_df(spark, 400, partitions=4)
    build_index(spark, corpus, idx, num_chunks=2, num_segments=8)
    assert InvertedIndex(spark, idx).meta.n_docs == 400

    add_tombstones(idx, list(range(0, 50)))
    merge_segments(spark, idx, target_segments=4, apply_tombstones=True)
    assert InvertedIndex(spark, idx).meta.n_docs == 350

    add_tombstones(idx, list(range(50, 80)))
    merge_segments(spark, idx, target_segments=4, apply_tombstones=True)
    meta = InvertedIndex(spark, idx).meta
    assert meta.n_docs == 320, meta.n_docs

    # and search over the twice-purged index never returns a deleted doc
    ix = InvertedIndex(spark, idx)
    got = {r["doc_id"] for r in ix.search(["the"], k=None, mode="or").collect()}
    assert got.isdisjoint(set(range(80)))


def test_merge_chunks_before_first_finalize(spark, tmp_path):
    """Streaming auto-compaction can run before the first finalize_index
    writes meta.json — merge_chunks must not require it."""
    from elasticsearch_assets_spark.index.build import build_chunk
    from elasticsearch_assets_spark.index.merge import merge_chunks

    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    corpus = pages_df(spark, 200, partitions=2)
    for c in range(3):
        chunk = corpus.where(F.col("doc_id") % 3 == c).select("doc_id", "text")
        build_chunk(
            spark, chunk, idx, chunk_id=c, seg_base=c * 2,
            segs_per_chunk=2, nparts=2,
        )
    assert not os.path.exists(os.path.join(idx, "meta.json"))
    new_chunk = merge_chunks(spark, idx, [0, 1], segs_out=2)
    rows = read_manifest(idx)
    assert {r["chunk_id"] for r in rows} == {2, new_chunk}
