"""Index sorting + early-terminated sorted top-k (ES index.sort).

The prune must be EXACT: range-partitioned files cover disjoint key
ranges, so a covering prefix reproduces the full-scan ORDER BY LIMIT
bit-for-bit while opening a fraction of the files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.sources.sorted_scan import (
    plan_sorted_topk,
    sorted_topk,
    write_sorted,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sorted")
    df = spark.range(0, 20_000).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 7919) % 100_000).alias("score"),
        (F.col("id") % 5).alias("kind"),
    )
    path = str(base / "t")
    write_sorted(df, path, "score", num_files=16)
    return df, path


@pytest.mark.parametrize("k,desc", [(10, True), (10, False), (500, True)])
def test_sorted_topk_matches_full_scan(spark, table, k, desc):
    df, path = table
    got = sorted_topk(
        spark, path, "score", k, descending=desc, tiebreak="event_id"
    ).collect()
    order = F.col("score").desc() if desc else F.col("score").asc()
    want = df.orderBy(order, F.col("event_id").asc()).limit(k).collect()
    assert [(r["event_id"], r["score"]) for r in got] == [
        (r["event_id"], r["score"]) for r in want
    ]


def test_prune_reads_a_strict_prefix(spark, table):
    df, path = table
    picked, total = plan_sorted_topk(path, "score", 10)
    assert total == 16 and len(picked) == 1  # ~1250 rows/file >> k
    picked2, _ = plan_sorted_topk(path, "score", 5000)
    assert 4 <= len(picked2) < 16


def test_sorted_topk_with_filter_is_exact(spark, table):
    df, path = table
    got = sorted_topk(
        spark, path, "score", 50, where="kind = 3", tiebreak="event_id"
    ).collect()
    want = (
        df.where("kind = 3")
        .orderBy(F.col("score").desc(), F.col("event_id").asc())
        .limit(50)
        .collect()
    )
    assert [(r["event_id"], r["score"]) for r in got] == [
        (r["event_id"], r["score"]) for r in want
    ]


def test_k_larger_than_table(spark, table):
    df, path = table
    got = sorted_topk(
        spark, path, "score", 50_000, where="kind = 1", tiebreak="event_id"
    )
    assert got.count() == df.where("kind = 1").count()
