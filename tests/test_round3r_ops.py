"""Round-3 batch 27: crawl-snapshot drift and n-gram diversity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators.textstats import ngram_diversity
from elasticsearch_assets_spark.operators.urls import snapshot_drift

SF = "/root/testdata/sf0.001"


def test_snapshot_drift_statuses(spark):
    old = spark.createDataFrame(
        [
            ("http://a.com/1", "f1"),
            ("http://a.com/2", "f2"),
            ("http://a.com/3", "f3"),
        ],
        "url string, fp string",
    )
    new = spark.createDataFrame(
        [
            ("HTTP://A.COM/1", "f1"),      # unchanged (canonicalized match)
            ("http://a.com/2", "f2x"),     # changed
            ("http://a.com/4", "f4"),      # added
        ],
        "url string, fp string",
    )
    out = {r["curl"]: r["status"] for r in snapshot_drift(old, new).collect()}
    assert out == {
        "http://a.com/1": "unchanged",
        "http://a.com/2": "changed",
        "http://a.com/3": "removed",
        "http://a.com/4": "added",
    }


def test_ngram_diversity_bruteforce(spark):
    from elasticsearch_assets_spark.analysis.tokenizer import tokenize_series

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = {
        r["lang"]: (r["distinct_ngrams"], r["total_ngrams"])
        for r in ngram_diversity(docs, n=2, strata_cols=["lang"]).collect()
    }
    pdf = docs.select("lang", "text").toPandas()
    brute: dict = {}
    for lang, ts in zip(pdf["lang"], tokenize_series(pdf["text"])):
        ts = list(ts)
        grams = [" ".join(ts[i : i + 2]) for i in range(len(ts) - 1)]
        d, t = brute.get(lang, (set(), 0))
        d = d | set(grams)
        brute[lang] = (d, t + len(grams))
    assert out == {k: (len(d), t) for k, (d, t) in brute.items()}
    # repetition drops diversity
    rep = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "c d e f g h i j")],
        "doc_id long, text string",
    )
    rows = {
        (): r
        for r in ngram_diversity(rep, n=2).collect()
    }
    r = rows[()]
    # 14 bigram occurrences, distinct: {a b, b a} ∪ 7 from doc2 = 9
    assert (r["distinct_ngrams"], r["total_ngrams"]) == (9, 14)
    with pytest.raises(ValueError, match="n must"):
        ngram_diversity(rep, n=0)


def test_winnow_guarantee_and_density(spark):
    from elasticsearch_assets_spark.operators.dedup import winnow_fingerprints

    run = " ".join(f"s{i}" for i in range(10))  # shared 10-token run
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {run} delta"),
            (2, f"{run} epsilon zeta eta theta iota"),
            (3, "totally different words here with no overlap at all ok"),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(docs, k=5, w=4)
    by_doc: dict = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    # guarantee: a shared run of >= w+k-1 = 8 tokens shares >= 1 fp
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[3] & by_doc[1])
    # density: selected fingerprints are far fewer than all k-grams
    n_grams_1 = len(docs.where("doc_id=1").head()["text"].split()) - 4
    assert len(by_doc[1]) < n_grams_1
    import pytest as _pt

    with _pt.raises(ValueError, match="k and w"):
        winnow_fingerprints(docs, k=0, w=4)


def test_sayt_edge_ngrams(spark):
    from elasticsearch_assets_spark.operators.texthash import (
        edge_ngrams_expr,
        tokens_expr,
    )
    from pyspark.sql import functions as FF

    df = spark.createDataFrame([("query a huge",)], "text string")
    got = df.select(
        edge_ngrams_expr(tokens_expr("text"), 2, 4).alias("e")
    ).head()["e"]
    assert sorted(got) == sorted(
        ["qu", "que", "quer", "query", "a", "hu", "hug", "huge"]
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="lo <= hi"):
        edge_ngrams_expr(FF.col("x"), 3, 2)


def test_polygon_with_holes(spark):
    from elasticsearch_assets_spark.operators.geo import (
        polygon_with_holes_predicate,
    )

    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 0.5, 0.5), (3, 20.0, 20.0)],
        "id long, lat double, lon double",
    )
    outer = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    hole = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    out = sorted(
        r["id"]
        for r in pts.where(
            polygon_with_holes_predicate("lat", "lon", outer, [hole])
        ).collect()
    )
    assert out == [1]  # 2 falls in the hole, 3 outside the outer ring


def test_esql_categorize_by(spark):
    from elasticsearch_assets_spark.query.esql import esql

    df = spark.createDataFrame(
        [
            (1, "error code 500 at node7"),
            (2, "error code 404 at node3"),
            (3, "login ok user42 fine"),
        ],
        "id long, msg string",
    )
    out = {
        r["category"]: r["n"]
        for r in esql(
            "FROM t | STATS n = count(*) BY CATEGORIZE(msg)", tables={"t": df}
        ).collect()
    }
    assert out == {"error code <num> at": 2, "login ok <num> fine": 1}


def test_cluster_split_no_leakage(spark):
    from elasticsearch_assets_spark.operators.sampling import cluster_split

    clusters = spark.createDataFrame(
        [(i, i % 20) for i in range(400)], "doc_id long, rep long"
    )
    out = cluster_split(clusters, 0.5)
    by_rep: dict = {}
    for r in out.collect():
        by_rep.setdefault(r["rep"], set()).add(r["split"])
    # every cluster is entirely on one side
    assert all(len(s) == 1 for s in by_rep.values())
    splits = {rep: next(iter(s)) for rep, s in by_rep.items()}
    assert set(splits.values()) == {"train", "holdout"}
    # deterministic
    again = {r["doc_id"]: r["split"] for r in cluster_split(clusters, 0.5).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in out.collect())
    import pytest as _pt

    with _pt.raises(ValueError, match="holdout_rate"):
        cluster_split(clusters, 1.5)
