"""Resharding (_shrink / _split): metadata-only topology changes.

Reference contract (/root/reference — Elasticsearch index APIs):
shrink re-homes existing segments into one index without re-analysis;
split clones the index per target and deletes non-routed docs, with
scores still counting the masked docs until a merge purges them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.index.merge import merge_segments
from elasticsearch_assets_spark.index.reshard import (
    shrink_shards,
    split_index,
    split_routing_col,
)
from elasticsearch_assets_spark.index.stats import load_meta
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("reshard")
    corpus = pages_df(spark, 1500, partitions=8).cache()
    mono = str(base / "mono")
    build_index(spark, corpus, mono, num_segments=8, num_chunks=2)
    shard_dirs = []
    for i, pred in enumerate(["doc_id % 2 = 0", "doc_id % 2 = 1"]):
        d = str(base / f"shard{i}")
        build_index(spark, corpus.where(pred), d, num_segments=4, num_chunks=2)
        shard_dirs.append(d)
    return corpus, mono, shard_dirs, base


def _ranked(idx, terms, mode="or", k=None):
    rows = idx.search(terms, k=k, mode=mode).collect()
    return sorted((r["doc_id"], round(r["score"], 9)) for r in rows)


@pytest.mark.parametrize(
    "terms,mode,k",
    [(["spark", "join"], "or", None), (["the", "data"], "and", 25)],
)
def test_shrink_rank_identical_to_monolithic(spark, setup, terms, mode, k):
    corpus, mono, shard_dirs, base = setup
    out = str(base / f"shrunk_{mode}_{k}")
    shrink_shards(spark, shard_dirs, out)
    assert _ranked(InvertedIndex(spark, out), terms, mode, k) == _ranked(
        InvertedIndex(spark, mono), terms, mode, k
    )


def test_shrink_stats_match_monolithic(spark, setup):
    corpus, mono, shard_dirs, base = setup
    out = str(base / "shrunk_stats")
    shrink_shards(spark, shard_dirs, out)
    m_out, m_mono = load_meta(out), load_meta(mono)
    assert m_out.n_docs == m_mono.n_docs
    assert m_out.total_tokens == m_mono.total_tokens
    assert m_out.avgdl == pytest.approx(m_mono.avgdl)
    # global df per term must match too (the rank-identity driver)
    import os

    a = spark.read.parquet(os.path.join(out, "stats"))
    b = spark.read.parquet(os.path.join(mono, "stats"))
    assert (
        a.join(b, "term", "full")
        .where(
            (a["df"] != b["df"])
            | a["df"].isNull()
            | b["df"].isNull()
        )
        .count()
        == 0
    )


def test_shrink_validation(spark, setup):
    corpus, mono, shard_dirs, base = setup
    with pytest.raises(ValueError):
        shrink_shards(spark, [shard_dirs[0]], str(base / "one"))
    out = str(base / "dup")
    shrink_shards(spark, shard_dirs, out)
    with pytest.raises(ValueError):
        shrink_shards(spark, shard_dirs, out)  # target exists


def test_split_routes_disjoint_and_exhaustive(spark, setup):
    corpus, mono, shard_dirs, base = setup
    targets = [str(base / "s0"), str(base / "s1"), str(base / "s2")]
    split_index(spark, mono, targets, doc_ids=corpus)
    src = InvertedIndex(spark, mono)
    want = dict(_ranked(src, ["spark", "join"], "or", None))
    got: dict[int, float] = {}
    for t, d in enumerate(targets):
        part = dict(_ranked(InvertedIndex(spark, d), ["spark", "join"], "or", None))
        routed = {
            r["doc_id"]
            for r in corpus.where(
                split_routing_col(F.col("doc_id"), 3, t)
            ).collect()
        }
        # only routed docs surface, with the SOURCE scores (global stats)
        assert set(part) <= routed
        assert not set(got) & set(part)
        got.update(part)
    assert got == want  # union reconstructs the source ranking exactly


def test_split_merge_purges_and_tightens_stats(spark, setup):
    corpus, mono, shard_dirs, base = setup
    targets = [str(base / "p0"), str(base / "p1")]
    split_index(spark, mono, targets, doc_ids=corpus)
    before = load_meta(targets[0])
    merge_segments(spark, targets[0], 4, apply_tombstones=True)
    after = load_meta(targets[0])
    routed = corpus.where(split_routing_col(F.col("doc_id"), 2, 0)).count()
    assert before.n_docs == load_meta(mono).n_docs  # ES pre-merge contract
    assert after.n_docs == routed  # post-merge: masked docs purged
    # post-purge ranking == an index built only over the routed docs
    fresh = str(base / "fresh0")
    build_index(
        spark,
        corpus.where(split_routing_col(F.col("doc_id"), 2, 0)),
        fresh,
        num_segments=4,
    )
    assert _ranked(InvertedIndex(spark, targets[0]), ["spark", "join"]) == _ranked(
        InvertedIndex(spark, fresh), ["spark", "join"]
    )


def test_ilm_warm_action_equals_fresh_build(spark, setup):
    from elasticsearch_assets_spark.index.reshard import ilm_warm_action
    from elasticsearch_assets_spark.index.tombstones import add_tombstones

    corpus, mono, shard_dirs, base = setup
    # fresh shard copies (the fixture shards are shared by other tests)
    import shutil

    shards = []
    for i, d in enumerate(shard_dirs):
        c = str(base / f"warm_src{i}")
        shutil.copytree(d, c)
        dead = [
            r["doc_id"]
            for r in corpus.where(f"doc_id % 2 = {i}")
            .where("doc_id % 11 = 0").collect()
        ]
        add_tombstones(c, dead)
        shards.append(c)
    warm = str(base / "warmed")
    ilm_warm_action(spark, shards, warm, segs_out=4)
    fresh = str(base / "warm_fresh")
    build_index(
        spark, corpus.where("doc_id % 11 <> 0"), fresh, num_segments=4,
    )
    assert _ranked(InvertedIndex(spark, warm), ["spark", "join"]) == _ranked(
        InvertedIndex(spark, fresh), ["spark", "join"]
    )
    assert load_meta(warm).n_docs == corpus.where("doc_id % 11 <> 0").count()
