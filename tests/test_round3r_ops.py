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
