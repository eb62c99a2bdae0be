"""Sharded serving: global-stats scoring must equal a monolithic index."""

from __future__ import annotations

import pytest

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.query.sharded import ShardedIndex


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("shards")
    corpus = pages_df(spark, 2400, partitions=8).cache()
    mono = str(base / "mono")
    build_index(spark, corpus, mono, num_segments=8)
    shard_dirs = []
    for i, pred in enumerate(["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]):
        d = str(base / f"shard{i}")
        build_index(spark, corpus.where(pred), d, num_segments=4)
        shard_dirs.append(d)
    return mono, shard_dirs


@pytest.mark.parametrize(
    "terms,mode,k",
    [
        (["spark", "join"], "and", 10),
        (["the", "data"], "or", 25),
        (["crawl"], "and", None),
        (["nosuchterm", "spark"], "and", 5),
        (["nosuchterm", "spark"], "or", 5),
    ],
)
def test_sharded_equals_monolithic(spark, setup, terms, mode, k):
    mono, shard_dirs = setup
    single = InvertedIndex(spark, mono)
    sharded = ShardedIndex(spark, shard_dirs)
    assert sharded.n_docs == single.meta.n_docs
    assert sharded.avgdl == pytest.approx(single.meta.avgdl)

    want = [(r["doc_id"], r["score"]) for r in single.search(terms, k=k, mode=mode).collect()]
    got = sharded.search_local(terms, k=k, mode=mode)
    assert got == want  # identical docs AND identical scores


def test_sharded_term_stats_sum(spark, setup):
    mono, shard_dirs = setup
    single = InvertedIndex(spark, mono)
    sharded = ShardedIndex(spark, shard_dirs)
    for t in ("the", "spark", "term0500"):
        assert sharded.count_term(t) == single.count_term(t)


def test_sharded_validation(spark, setup):
    with pytest.raises(ValueError):
        ShardedIndex(spark, [])
