"""Checkpoint/resume (SURVEY.md §2.10 R2-R3): a build killed mid-way must
resume from the chunk manifest and produce an index identical to an
uninterrupted build."""

from __future__ import annotations

import os
import shutil

import pytest

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import (
    build_index,
    committed_chunks,
    read_manifest,
)
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 3000, partitions=8).cache()


def _topk(spark, idx_dir, terms, mode="or", k=20):
    return [
        (r["doc_id"], r["score"])
        for r in InvertedIndex(spark, idx_dir).search(terms, k=k, mode=mode).collect()
    ]


def test_resume_skips_committed_chunks_and_matches_fresh(spark, tmp_path, corpus):
    fresh = str(tmp_path / "fresh")
    broken = str(tmp_path / "broken")
    build_index(spark, corpus, fresh, num_chunks=4, num_segments=16)
    build_index(spark, corpus, broken, num_chunks=4, num_segments=16)

    # simulate a kill after chunk 1: chunks 2,3 lose segments + manifest rows
    for c in (2, 3):
        shutil.rmtree(os.path.join(broken, "segments", f"chunk={c}"))
        os.remove(os.path.join(broken, "manifest", f"chunk-{c:05d}.json"))
    assert committed_chunks(spark, broken) == {0, 1}
    committed_at_before = {
        r["chunk_id"]: r["committed_at"] for r in read_manifest(broken)
    }

    meta = build_index(
        spark, corpus, broken, num_chunks=4, num_segments=16, resume=True
    )
    # chunks 0,1 were NOT rebuilt (commit timestamps untouched)
    after = {r["chunk_id"]: r["committed_at"] for r in read_manifest(broken)}
    assert after[0] == committed_at_before[0]
    assert after[1] == committed_at_before[1]
    assert committed_chunks(spark, broken) == {0, 1, 2, 3}

    # identical final index: same global stats, same top-k docIDs AND scores
    fresh_meta = InvertedIndex(spark, fresh).meta
    assert (meta.n_docs, meta.total_tokens, meta.avgdl) == (
        fresh_meta.n_docs, fresh_meta.total_tokens, fresh_meta.avgdl,
    )
    for terms, mode in ([["spark", "join"], "and"], [["the", "data"], "or"]):
        assert _topk(spark, broken, terms, mode) == _topk(spark, fresh, terms, mode)


def test_manifest_lineage_metrics(spark, tmp_path, corpus):
    idx = str(tmp_path / "m")
    build_index(spark, corpus, idx, num_chunks=2, num_segments=8)
    rows = read_manifest(idx)
    assert len(rows) == 2
    for r in rows:
        assert r["status"] == "committed"
        assert r["n_docs"] > 0 and r["n_postings"] > 0 and r["n_terms"] > 0
        assert r["wall_sec"] > 0 and r["docs_per_sec"] > 0  # R4 throughput lineage
    assert sum(r["n_docs"] for r in rows) == 3000


def test_resume_noop_when_all_committed(spark, tmp_path, corpus):
    idx = str(tmp_path / "noop")
    build_index(spark, corpus, idx, num_chunks=2, num_segments=8)
    before = {r["chunk_id"]: r["committed_at"] for r in read_manifest(idx)}
    build_index(spark, corpus, idx, num_chunks=2, num_segments=8, resume=True)
    assert {r["chunk_id"]: r["committed_at"] for r in read_manifest(idx)} == before


def test_resume_pins_original_build_params(spark, tmp_path):
    """A resume in a different session (different parallelism => different
    defaults) must reuse the ORIGINAL num_segments/num_chunks — otherwise
    committed and resumed chunks would carry incompatible doc->segment
    mappings under one doc_hash meta."""
    import json

    from elasticsearch_assets_spark.datagen.pages import pages_df
    from elasticsearch_assets_spark.index.build import (
        build_index, read_manifest,
    )
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    d = str(tmp_path / "idx")
    corpus = pages_df(spark, 400, partitions=4)
    build_index(spark, corpus, d, num_segments=8, num_chunks=4)
    # simulate a crash after 2 chunks: drop chunks 2,3 + their manifest rows
    import os as _os
    import shutil as _shutil

    for c in (2, 3):
        _shutil.rmtree(_os.path.join(d, "segments", f"chunk={c}"))
        _os.remove(_os.path.join(d, "manifest", f"chunk-{c:05d}.json"))

    # resume with DIFFERENT (wrong) explicit params: the pinned
    # build_params.json must win
    meta = build_index(
        spark, corpus, d, num_segments=32, num_chunks=8, resume=True
    )
    assert meta.num_segments == 8 and meta.num_chunks == 4
    assert json.load(open(_os.path.join(d, "build_params.json")))["num_segments"] == 8
    assert sorted(r["chunk_id"] for r in read_manifest(d)) == [0, 1, 2, 3]

    # the mapping is coherent: cogrouped filtered search equals broadcast
    idx = InvertedIndex(spark, d)
    filt = spark.range(0, 400, 2).withColumnRenamed("id", "doc_id")
    want = idx.search_filtered(
        ["spark", "the"], filt, k=10, mode="or", strategy="broadcast"
    ).collect()
    got = idx.search_filtered(
        ["spark", "the"], filt, k=10, mode="or", strategy="cogroup"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_resume_refuses_pre_pinning_index(spark, tmp_path):
    """Committed chunks + missing build_params.json (an index built before
    param pinning): the original segs_per_chunk is unrecoverable, so resume
    must refuse instead of recomputing defaults that can collide seg_id
    ranges across chunks (ADVICE round 2)."""
    import os

    import pytest as _pytest

    from elasticsearch_assets_spark.datagen.pages import pages_df
    from elasticsearch_assets_spark.index.build import build_index

    d = str(tmp_path / "idx")
    corpus = pages_df(spark, 200, partitions=2)
    build_index(spark, corpus, d, num_segments=8, num_chunks=2)
    os.remove(os.path.join(d, "build_params.json"))
    with _pytest.raises(ValueError, match="build_params.json is missing"):
        build_index(spark, corpus, d, num_segments=8, num_chunks=2, resume=True)
