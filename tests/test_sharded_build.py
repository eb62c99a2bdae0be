"""Multi-process sharded build (round-4 verdict item #5): the measured
executor-sizing finding (N independent small JVMs out-build one wide JVM)
as a runnable, tested deployment path — build_sharded spawns one process
per shard, the produced shards register as a ShardedIndex, and the
coordinator is rank-identical to a monolithic index over the same corpus.
"""

from __future__ import annotations

import os

import pytest

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.index.sharded_build import (
    build_sharded,
    _shard_slice,
)
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.query.sharded import ShardedIndex


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("shbuild")
    corpus = pages_df(spark, 900, partitions=4).cache()
    src = str(base / "corpus")
    corpus.write.mode("overwrite").parquet(src)
    mono = str(base / "mono")
    build_index(spark, corpus, mono, num_segments=4)
    res = build_sharded(
        src, str(base / "sharded"), n_shards=2, cores_per_shard=2,
        num_segments=2,
    )
    return corpus, mono, res


def test_child_results_and_coverage(built):
    corpus, mono, res = built
    assert len(res["shard_dirs"]) == 2
    assert res["total_docs"] == 900
    assert all(os.path.exists(os.path.join(d, "meta.json"))
               for d in res["shard_dirs"])
    assert res["agg_docs_per_sec"] and res["agg_docs_per_sec"] > 0
    # every shard non-empty (hash slice balances)
    for s in res["shards"]:
        assert s["n_docs"] > 0


def test_shard_slices_are_disjoint_and_exhaustive(spark, built):
    corpus, _, res = built
    a = {r["doc_id"] for r in
         _shard_slice(corpus, "doc_id", 2, 0).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         _shard_slice(corpus, "doc_id", 2, 1).select("doc_id").collect()}
    assert not (a & b)
    assert len(a) + len(b) == 900
    # the built shards hold exactly those slices
    ia = InvertedIndex(spark, res["shard_dirs"][0])
    ib = InvertedIndex(spark, res["shard_dirs"][1])
    assert ia.meta.n_docs == len(a) and ib.meta.n_docs == len(b)


@pytest.mark.parametrize(
    "terms,mode,k",
    [(["spark", "join"], "and", 10), (["the", "data"], "or", 25),
     (["crawl"], "and", None)],
)
def test_built_shards_rank_identical_to_monolithic(
    spark, built, terms, mode, k
):
    """The existing sharded-vs-monolithic identity contract, over shards
    the MULTI-PROCESS builder produced."""
    _, mono, res = built
    single = InvertedIndex(spark, mono)
    sharded = ShardedIndex(spark, res["shard_dirs"])
    assert sharded.n_docs == single.meta.n_docs
    assert sharded.avgdl == pytest.approx(single.meta.avgdl)
    want = [
        (r["doc_id"], r["score"])
        for r in single.search(terms, k=k, mode=mode).collect()
    ]
    assert sharded.search_local(terms, k=k, mode=mode) == want


def test_failed_child_raises(tmp_path):
    with pytest.raises(RuntimeError, match="failed"):
        build_sharded(
            "/nonexistent/parquet", str(tmp_path / "out"),
            n_shards=1, cores_per_shard=1,
        )
