"""Custom routing: hash-routed shards, single-shard search, global stats.

Reference contract: ES `?routing=` — index-time shard placement by
hash(routing_value) % n, search-time fan-out narrowed to that shard
(other values sharing the shard still match; exact narrowing needs a
query filter). Ranking here keeps the ShardedIndex global-stats (DFS)
contract — documented deviation from ES's default query_then_fetch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.index.reshard import split_routing_col
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.query.routing import (
    RoutedIndex,
    build_routed_shards,
    routing_shard,
)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("routing")
    corpus = (
        pages_df(spark, 900, partitions=8)
        .withColumn("tenant", F.concat(F.lit("t"), F.col("doc_id") % 7))
        .cache()
    )
    routed = str(base / "routed")
    build_routed_shards(spark, corpus, routed, 3, "tenant", num_segments=4)
    mono = str(base / "mono")
    build_index(spark, corpus.select("doc_id", "text"), mono,
                num_segments=8, num_chunks=2)
    return corpus, routed, mono


def test_python_hash_matches_spark_routing(spark, setup):
    corpus, routed, mono = setup
    got = corpus.select(
        "tenant",
        split_routing_col(F.col("tenant"), 3, 0).alias("is0"),
    ).distinct().collect()
    for r in got:
        assert (routing_shard(r["tenant"], 3) == 0) == r["is0"]


def test_routed_search_is_global_ranking_restricted_to_shard(spark, setup):
    corpus, routed, mono = setup
    idx = RoutedIndex(spark, routed)
    shard = idx.shard_of("t3")
    shard_docs = {
        r["doc_id"]
        for r in corpus.where(
            split_routing_col(F.col("tenant"), 3, shard)
        ).collect()
    }
    got = idx.search_local(["spark", "join"], k=None, mode="or", routing="t3")
    want = [
        (d, s)
        for d, s in InvertedIndex(spark, mono).search_local(
            ["spark", "join"], k=None, mode="or"
        )
        if d in shard_docs
    ]
    assert got == want  # scores global, membership = the routed shard
    assert set(d for d, _ in got) <= shard_docs


def test_unrouted_search_matches_monolithic(spark, setup):
    corpus, routed, mono = setup
    idx = RoutedIndex(spark, routed)
    got = idx.search_local(["spark", "join"], k=25, mode="or")
    want = InvertedIndex(spark, mono).search_local(
        ["spark", "join"], k=25, mode="or"
    )
    assert got == want


def test_routed_validation(spark, setup, tmp_path):
    corpus, routed, mono = setup
    with pytest.raises(ValueError, match="no routed index"):
        RoutedIndex(spark, mono)
    with pytest.raises(ValueError, match="already exists"):
        build_routed_shards(spark, corpus, routed, 3, "tenant")
    with pytest.raises(ValueError, match="at least two"):
        build_routed_shards(spark, corpus, str(tmp_path / "x"), 1, "tenant")
