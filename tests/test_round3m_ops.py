"""Round-3 batch 21: optimistic-concurrency upserts, maxsim late
interaction, knn similarity threshold, ILM retention planning."""

from __future__ import annotations

from datetime import date

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators.similarity import (
    chunk_vectors,
    cosine_topk,
    maxsim_topk,
)
from elasticsearch_assets_spark.operators.transforms import plan_retention
from elasticsearch_assets_spark.sinks.keyed_table import KeyedParquetTable

SF = "/root/testdata/sf0.001"


def test_upsert_occ_semantics(spark, tmp_path):
    t = KeyedParquetTable(spark, str(tmp_path / "t"), key="k", num_buckets=4)
    t.create(
        spark.createDataFrame(
            [(1, "a", 0), (2, "b", 0), (3, "c", 5)],
            "k long, v string, _seq_no long",
        )
    )
    batch = spark.createDataFrame(
        [
            (1, "A", 0),   # correct seq -> updates, bumps to 1
            (2, "B", 9),   # stale seq -> conflict, untouched
            (3, "C", 5),   # correct (non-zero) seq -> updates to 6
            (4, "D", 0),   # new key -> insert at seq 0
        ],
        "k long, v string, _if_seq_no long",
    )
    conflicts = t.upsert_occ(batch)
    assert [(r["k"], r["expected"], r["current"]) for r in conflicts.collect()] == [
        (2, 9, 0)
    ]
    state = {r["k"]: (r["v"], r["_seq_no"]) for r in t.read().collect()}
    assert state == {1: ("A", 1), 2: ("b", 0), 3: ("C", 6), 4: ("D", 0)}
    # second identical batch: key 1 now at seq 1, expected 0 -> conflict
    conflicts2 = t.upsert_occ(batch)
    got = sorted((r["k"], r["current"]) for r in conflicts2.collect())
    assert got == [(1, 1), (2, 0), (3, 6)]
    with pytest.raises(ValueError, match="missing"):
        t.upsert_occ(batch.drop("_if_seq_no"))


def test_upsert_occ_requires_versioned_table(spark, tmp_path):
    t = KeyedParquetTable(spark, str(tmp_path / "t2"), key="k")
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    batch = spark.createDataFrame([(1, "A", 0)], "k long, v string, _if_seq_no long")
    with pytest.raises(ValueError, match="_seq_no"):
        t.upsert_occ(batch)


def test_maxsim_bruteforce(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    pdf = emb.toPandas()
    qv = np.asarray(
        pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0], dtype=np.float64
    )
    qchunks = qv.reshape(4, 16)
    mv = chunk_vectors(emb, 4)
    got = [
        (r["vec_id"], r["score"]) for r in maxsim_topk(mv, qchunks.tolist(), k=5).collect()
    ]
    scores = {}
    for vid, v in zip(pdf["vec_id"], pdf["embedding"]):
        d = np.asarray(v, dtype=np.float64).reshape(4, 16)
        scores[int(vid)] = float(sum((q @ d.T).max() for q in qchunks))
    want = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:5]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
    with pytest.raises(ValueError, match="at least one query"):
        maxsim_topk(mv, [])
    with pytest.raises(ValueError, match="n_chunks"):
        chunk_vectors(emb, 0)


def test_cosine_similarity_threshold(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 0").head()["embedding"]]
    full = cosine_topk(emb, qv, k=10).collect()
    thr = full[3]["score"]  # cut below the 4th hit
    pruned = cosine_topk(emb, qv, k=10, similarity=thr).collect()
    assert [(r["vec_id"], r["score"]) for r in pruned] == [
        (r["vec_id"], r["score"]) for r in full[:4]
    ]


def test_plan_retention(spark):
    plan = spark.createDataFrame(
        [
            (date(2024, 1, 1), 10, "logs-000001"),
            (date(2024, 1, 2), 10, "logs-000001"),
            (date(2024, 1, 10), 10, "logs-000002"),
            (date(2024, 1, 20), 10, "logs-000003"),
        ],
        "day date, n_docs bigint, index_name string",
    )
    out = {r["index_name"]: r["action"] for r in plan_retention(plan, 10).collect()}
    # newest = Jan 20; idx1 last day Jan 2 (18d, delete), idx2 Jan 10
    # (10d, keep — boundary is strict >), idx3 newest (keep)
    assert out == {
        "logs-000001": "delete",
        "logs-000002": "keep",
        "logs-000003": "keep",
    }
    rows = {r["index_name"]: r for r in plan_retention(plan, 10).collect()}
    assert rows["logs-000001"]["n_docs"] == 20
    assert rows["logs-000001"]["first_day"] == date(2024, 1, 1)
    with pytest.raises(ValueError, match="delete_after_days"):
        plan_retention(plan, -1)
