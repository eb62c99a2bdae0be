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
