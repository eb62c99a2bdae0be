"""Round-3 batch 23: cross-cluster search, index-template resolution,
scripted reindex."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index, reindex
from elasticsearch_assets_spark.query.engine import (
    InvertedIndex,
    cross_cluster_search,
)
from elasticsearch_assets_spark.sinks.index_selector import (
    resolve_templates,
    template_match_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 600, partitions=4).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_o") / "i")
    build_index(spark, corpus, d, num_segments=4, num_chunks=1)
    return InvertedIndex(spark, d)


def test_ccs_per_cluster_scoring(spark, corpus, index, tmp_path_factory):
    # second "cluster": a disjoint corpus half with its own stats
    d2 = str(tmp_path_factory.mktemp("idx_o2") / "i")
    half = corpus.where("doc_id % 2 = 1")
    build_index(spark, half, d2, num_segments=2, num_chunks=1)
    remote = InvertedIndex(spark, d2)
    out = cross_cluster_search(
        {"local": index, "remote": remote}, ["spark", "join"], k=20
    ).collect()
    assert {r["cluster"] for r in out} == {"local", "remote"}
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # per-cluster scores equal each cluster's own search (own stats)
    loc = {r["doc_id"]: r["score"]
           for r in index.search(["spark", "join"], k=20).collect()}
    rem = {r["doc_id"]: r["score"]
           for r in remote.search(["spark", "join"], k=20).collect()}
    for r in out:
        src = loc if r["cluster"] == "local" else rem
        assert r["score"] == src[r["doc_id"]]
    with pytest.raises(ValueError, match="at least one cluster"):
        cross_cluster_search({}, ["x"])


def test_template_resolution(spark):
    tpls = [("logs-*", 10, "logs"), ("logs-0000*", 20, "hot"), ("*", 0, "dflt")]
    df = spark.createDataFrame(
        [("logs-000001",), ("logs-123456",), ("metrics-1",)], "name string"
    )
    out = {r["name"]: r["template"]
           for r in resolve_templates(df, "name", tpls).collect()}
    assert out == {
        "logs-000001": "hot",     # higher priority wins
        "logs-123456": "logs",
        "metrics-1": "dflt",
    }
    with pytest.raises(ValueError, match="unique"):
        template_match_sql([("a*", 1, "x"), ("b*", 1, "y")], "n")
    with pytest.raises(ValueError, match="wildcards"):
        template_match_sql([("a%", 1, "x")], "n")
    with pytest.raises(ValueError, match="at least one"):
        template_match_sql([], "n")


def test_scripted_reindex_rewrites_stats(spark, corpus, index, tmp_path):
    dst = str(tmp_path / "re")
    reindex(
        spark, index, corpus, dst,
        transform={"text": "array_join(slice(split(text, ' '), 1, 5), ' ')"},
        num_segments=2, num_chunks=1,
    )
    new = InvertedIndex(spark, dst)
    # every doc's length is now <= 5 in the new index's stats
    assert new.meta.total_tokens <= 5 * new.meta.n_docs
    assert new.meta.n_docs == corpus.count()
    # search works over the truncated postings
    assert new.search(["the"], k=5).count() > 0
    with pytest.raises(ValueError, match="unknown columns"):
        reindex(spark, index, corpus, str(tmp_path / "re2"),
                transform={"nope": "1"})


def test_facet_histogram_bounds(spark):
    from elasticsearch_assets_spark.operators.facets import (
        facet_histogram_bounds,
    )

    df = spark.createDataFrame(
        [(1, 60.0), (2, 260.0), (3, 270.0), (4, 950.0)],
        "doc_id long, x double",
    )
    out = [
        (r["bucket"], r["doc_count"])
        for r in facet_histogram_bounds(
            df.select("doc_id"), df, "x", 200.0,
            offset=50.0, extended_lo=0.0, extended_hi=999.0,
        ).collect()
    ]
    # offset 50 -> bucket keys ...,-150,50,250,...; empties kept
    assert out == [
        (-150.0, 0), (50.0, 1), (250.0, 2), (450.0, 0), (650.0, 0),
        (850.0, 1),
    ]
    import pytest as _pt

    with _pt.raises(ValueError, match="interval"):
        facet_histogram_bounds(df.select("doc_id"), df, "x", 0,
                               extended_lo=0, extended_hi=1)
    with _pt.raises(ValueError, match="ordered"):
        facet_histogram_bounds(df.select("doc_id"), df, "x", 1,
                               extended_lo=5, extended_hi=1)
