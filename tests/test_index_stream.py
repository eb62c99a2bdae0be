"""Streaming incremental indexing: stream-built index == batch-built index."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index, read_manifest
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.streaming.index_stream import index_stream

SCHEMA = "doc_id long, text string"


def test_stream_index_matches_batch(spark, tmp_path):
    corpus = pages_df(spark, 1200, partitions=4).select("doc_id", "text").cache()
    # stage the stream source as two separate file drops
    src = str(tmp_path / "src")
    corpus.where("doc_id < 600").coalesce(1).write.mode("append").parquet(src)
    corpus.where("doc_id >= 600").coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    idx_dir = str(tmp_path / "sidx")
    q, writer = index_stream(
        stream, idx_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        segs_per_batch=4,
        trigger_available_now=True,
    )
    q.awaitTermination()
    meta = writer.refresh(spark)
    assert meta is not None and meta.n_docs == 1200

    batch_dir = str(tmp_path / "bidx")
    build_index(spark, corpus, batch_dir, num_segments=8)

    si = InvertedIndex(spark, idx_dir)
    bi = InvertedIndex(spark, batch_dir)
    assert si.meta.total_tokens == bi.meta.total_tokens
    assert si.meta.avgdl == pytest.approx(bi.meta.avgdl)
    for terms, mode, k in [(["spark", "join"], "and", 10), (["the", "data"], "or", 20)]:
        a = [(r["doc_id"], r["score"]) for r in si.search(terms, k=k, mode=mode).collect()]
        b = [(r["doc_id"], r["score"]) for r in bi.search(terms, k=k, mode=mode).collect()]
        assert a == b  # rank + score identical regardless of build path


def test_stream_index_chunks_and_restart_idempotence(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta doc{i}") for i in range(50)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    idx_dir = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q, writer = index_stream(
        stream, idx_dir, checkpoint_dir=ckpt, segs_per_batch=2,
        trigger_available_now=True,
    )
    q.awaitTermination()
    n_manifest = len(read_manifest(idx_dir))
    assert n_manifest >= 1

    # second file arrives; restart from the same checkpoint processes ONLY it
    spark.createDataFrame(
        [Row(doc_id=50 + i, text=f"gamma delta doc{50+i}") for i in range(50)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    q2, writer2 = index_stream(
        stream2, idx_dir, checkpoint_dir=ckpt, segs_per_batch=2,
        trigger_available_now=True,
    )
    q2.awaitTermination()
    meta = writer2.refresh(spark)
    assert meta.n_docs == 100
    assert InvertedIndex(spark, idx_dir).count_term("gamma") == 50
    assert InvertedIndex(spark, idx_dir).count_term("alpha") == 50


def test_stream_auto_compaction_bounds_chunks(spark, tmp_path):
    """A long-lived stream with auto-compaction keeps the chunk count
    bounded while preserving search results."""
    from elasticsearch_assets_spark.streaming.index_stream import (
        StreamingIndexWriter,
    )

    corpus = pages_df(spark, 900, partitions=3).select("doc_id", "text").cache()
    idx_dir = str(tmp_path / "ac")
    writer = StreamingIndexWriter(
        idx_dir, segs_per_batch=2, auto_compact_max_chunks=3,
        compact_merge_factor=3,
    )
    # simulate 6 micro-batches of 150 docs each
    for b in range(6):
        batch = corpus.where(f"doc_id >= {b*150} AND doc_id < {(b+1)*150}")
        writer(batch, b)
    meta = writer.refresh(spark)
    assert meta.n_docs == 900
    chunks = read_manifest(idx_dir)
    assert len([r for r in chunks if r["status"] == "committed"]) <= 4

    # equals a batch-built index
    batch_dir = str(tmp_path / "b")
    build_index(spark, corpus, batch_dir, num_segments=8)
    a = InvertedIndex(spark, idx_dir).search(["the", "data"], k=20, mode="or").collect()
    b2 = InvertedIndex(spark, batch_dir).search(["the", "data"], k=20, mode="or").collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b2]


def test_stream_cogroup_filtered_search_and_compaction(spark, tmp_path):
    """Streaming indexes get the executor-side cogroup filtered search via
    the durable seg_map (epoch chunks are unranged entries), and keep it
    through auto-compaction, whose merge folds the entries together."""
    from elasticsearch_assets_spark.index.seg_map import load_seg_map
    from elasticsearch_assets_spark.streaming.index_stream import (
        StreamingIndexWriter,
    )

    corpus = pages_df(spark, 600, partitions=3).select("doc_id", "text").cache()
    idx_dir = str(tmp_path / "cg")
    writer = StreamingIndexWriter(
        idx_dir, segs_per_batch=2, auto_compact_max_chunks=3,
        compact_merge_factor=3,
    )
    for b in range(4):
        writer(corpus.where(f"doc_id >= {b*150} AND doc_id < {(b+1)*150}"), b)
    writer.refresh(spark)

    idx = InvertedIndex(spark, idx_dir)
    filt = spark.range(0, 600, 3).withColumnRenamed("id", "doc_id")
    want = [
        (r["doc_id"], r["score"])
        for r in idx.search_filtered(
            ["the", "data"], filt, k=10, mode="or", strategy="broadcast"
        ).collect()
    ]
    got = idx.search_filtered(
        ["the", "data"], filt, k=10, mode="or", strategy="cogroup"
    )
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == want
    # auto-compaction merged epochs 0-2 (identical residue tables after the
    # fold) -> the map holds far fewer entries than epochs
    entries = load_seg_map(idx_dir)
    assert entries is not None and len(entries) <= 2
