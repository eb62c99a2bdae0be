"""Round-3 session-7 batch: named queries (matched_queries), geo_grid
query filter, delete_by_query contract-row support.

Reference surface: ES bool `_name` clauses / geo_grid query, semantics
from the ES docs, re-expressed as pruned posting lookups + shared-SQL
cell expressions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.analysis.tokenizer import tokenize_series
from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.operators.geo import geo_grid_filter
from elasticsearch_assets_spark.query.engine import InvertedIndex


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_df(spark, 600, partitions=4).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "plain")
    build_index(spark, corpus, d, num_segments=8, num_chunks=2)
    return InvertedIndex(spark, d)


@pytest.fixture(scope="module")
def doc_tokens(corpus):
    pdf = corpus.select("doc_id", "text").toPandas()
    toks = tokenize_series(pdf["text"])
    return dict(zip(pdf["doc_id"].tolist(), [list(t) for t in toks]))


def _terms(doc_tokens, n=4):
    from collections import Counter

    c = Counter(t for toks in doc_tokens.values() for t in set(toks))
    return [t for t, _ in c.most_common(n)]


# ---------------------------------------------------------------------------
# named queries
# ---------------------------------------------------------------------------


def test_search_named_flags_match_ground_truth(index, doc_tokens):
    t = _terms(doc_tokens, 3)
    named = {"ab": [t[0], t[1]], "c": [t[2]]}
    rows = index.search_named(named, k=None).collect()
    got = {r["doc_id"]: r["matched_queries"] for r in rows}
    for doc_id, mq in got.items():
        toks = set(doc_tokens[doc_id])
        expect = []
        if t[0] in toks and t[1] in toks:
            expect.append("ab")
        if t[2] in toks:
            expect.append("c")
        assert mq == "|".join(expect), doc_id
    # every doc with ANY of the terms appears (OR scoring set)
    union = {
        d for d, toks in doc_tokens.items()
        if set(t) & set(toks)
    }
    assert set(got) == union


def test_search_named_score_equals_or_search(index, doc_tokens):
    t = _terms(doc_tokens, 3)
    named = {"ab": [t[0], t[1]], "c": [t[2]]}
    plain = {
        r["doc_id"]: r["score"]
        for r in index.search(sorted(set(t)), k=None, mode="or").collect()
    }
    named_rows = index.search_named(named, k=None).collect()
    for r in named_rows:
        assert r["score"] == plain[r["doc_id"]]


def test_search_named_validates_and_caps(index, doc_tokens):
    with pytest.raises(ValueError, match="named clause"):
        index.search_named({})
    t = _terms(doc_tokens, 1)
    top = index.search_named({"a": [t[0]]}, k=5).collect()
    assert len(top) == 5
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# geo_grid query
# ---------------------------------------------------------------------------


def test_geo_grid_filter_matches_agg_cells(spark):
    from elasticsearch_assets_spark.operators.facets import geohash_sql

    df = spark.range(500).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 7) % 160 - 80).cast("double").alias("lat"),
        ((F.col("id") * 13) % 340 - 170).cast("double").alias("lon"),
    ).cache()
    cell_expr = F.expr(geohash_sql("lat", "lon", 2))
    wanted = [
        r["cell"]
        for r in df.select(cell_expr.alias("cell"))
        .groupBy("cell").count().orderBy(F.desc("count"), "cell")
        .limit(2).collect()
    ]
    out = geo_grid_filter(df, "lat", "lon", 2, wanted)
    got = out.select(cell_expr.alias("cell")).distinct().collect()
    assert {r["cell"] for r in got} == set(wanted)
    # count matches a direct recount over the same shared expression
    expect = df.where(cell_expr.isin(wanted)).count()
    assert out.count() == expect


def test_geo_grid_filter_validates(spark):
    df = spark.range(3).select(
        F.lit(0.0).alias("lat"), F.lit(0.0).alias("lon")
    )
    with pytest.raises(ValueError, match="non-empty"):
        geo_grid_filter(df, "lat", "lon", 2, [])
