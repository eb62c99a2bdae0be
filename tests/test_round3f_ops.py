"""Round-3 batch 14: data-management APIs — sliced scroll, ES transforms
(latest / pivot), _rollover planning, snapshot/restore.

Reference surface: the multi-worker scroll split the reference's slicers
coordinate (/root/reference/asset/elasticsearch_reader, ES `slice` param),
the ES transform API's two materialization shapes, ILM-style rollover
naming the reference's bulk sender targets (elasticsearch_bulk index
routing), and the ES snapshot/restore repository contract."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.operators.transforms import (
    fold_rollover,
    plan_rollover,
    rollover_name,
    transform_latest,
    transform_pivot,
)
from elasticsearch_assets_spark.query.engine import (
    InvertedIndex,
    restore_snapshot,
)
from elasticsearch_assets_spark.sources.reader import (
    DateReader,
    ReaderConfig,
    slice_predicate_col,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


# ---------------------------------------------------------------------------
# sliced scroll
# ---------------------------------------------------------------------------


def test_slices_disjoint_and_covering(spark, events):
    total = events.count()
    seen = 0
    ids = set()
    for s in range(4):
        part = events.where(slice_predicate_col("event_id", s, 4))
        rows = [r["event_id"] for r in part.select("event_id").collect()]
        assert not ids.intersection(rows)  # disjoint
        ids.update(rows)
        seen += len(rows)
    assert seen == total  # covering
    # deterministic: same slice twice = same rows
    a = sorted(
        r["event_id"]
        for r in events.where(slice_predicate_col("event_id", 1, 4))
        .select("event_id").collect()
    )
    b = sorted(
        r["event_id"]
        for r in events.where(slice_predicate_col("event_id", 1, 4))
        .select("event_id").collect()
    )
    assert a == b


def test_reader_slice_config(spark):
    cfg = ReaderConfig(
        path=f"{SF}/events.parquet", date_field_name="ts",
        slice_id=0, slice_max=2, slice_field="event_id",
    )
    half = DateReader(spark, cfg).dataframe().count()
    full = spark.read.parquet(f"{SF}/events.parquet").count()
    assert 0 < half < full
    with pytest.raises(ValueError, match="both slice_id"):
        ReaderConfig(path="x", slice_id=1)
    with pytest.raises(ValueError, match=r"\[0, slice_max\)"):
        ReaderConfig(path="x", slice_id=5, slice_max=4, slice_field="k")
    with pytest.raises(ValueError, match="slice_field or key_field"):
        ReaderConfig(path="x", slice_id=1, slice_max=4)
    # composes with the date range: sliced subset of the ranged scan
    ranged = ReaderConfig(
        path=f"{SF}/events.parquet", date_field_name="ts",
        start="2024-01-02", end="2024-01-05",
        slice_id=1, slice_max=3, slice_field="event_id",
    )
    sliced_ranged = DateReader(spark, ranged).dataframe()
    assert sliced_ranged.where(
        (F.col("ts") < "2024-01-02") | (F.col("ts") >= "2024-01-05")
    ).count() == 0


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_transform_latest_matches_bruteforce(events):
    out = {
        r["user_id"]: r["event_id"]
        for r in transform_latest(events, "user_id", "ts", tiebreak="event_id").collect()
    }
    brute: dict = {}
    for r in events.collect():
        key = r["user_id"]
        cand = (r["ts"], r["event_id"])
        if key not in brute or cand > brute[key]:
            brute[key] = cand
    assert out == {k: v[1] for k, v in brute.items()}


def test_transform_pivot(events):
    out = {
        r["event_type"]: (r["n"], r["mx"])
        for r in transform_pivot(
            events, "event_type", {"n": ("value_count", "event_id"), "mx": ("max", "value")}
        ).collect()
    }
    brute: dict = {}
    for r in events.collect():
        n, mx = brute.get(r["event_type"], (0, float("-inf")))
        brute[r["event_type"]] = (n + 1, max(mx, r["value"]))
    assert out == brute
    with pytest.raises(ValueError, match="unsupported pivot agg"):
        transform_pivot(events, "event_type", {"x": ("median", "value")})
    with pytest.raises(ValueError, match="at least one"):
        transform_pivot(events, "event_type", {})


# ---------------------------------------------------------------------------
# rollover
# ---------------------------------------------------------------------------


def test_fold_rollover_docs_and_age():
    days = [date(2024, 1, d) for d in range(1, 11)]
    # max_docs: 100 per batch, roll at >=250 -> gens 1,1,1,2,2,2,...
    gens = fold_rollover([(d, 100) for d in days], max_docs=250)
    assert gens == [1, 1, 1, 2, 2, 2, 3, 3, 3, 4]
    # max_age 3 days: day1..day4 (age 3 on day4) then roll
    gens = fold_rollover([(d, 1) for d in days], max_age_days=3)
    assert gens == [1, 1, 1, 1, 2, 2, 2, 2, 3, 3]
    # either condition triggers
    gens = fold_rollover(
        [(days[0], 500), (days[1], 1), (days[5], 1)],
        max_docs=400, max_age_days=3,
    )
    assert gens == [1, 2, 2]
    with pytest.raises(ValueError):
        fold_rollover([(days[0], 1)])
    assert rollover_name("logs", 7) == "logs-000007"


def test_plan_rollover_generations_monotone(spark, events):
    out = plan_rollover(events, "ts", "logs", max_docs=200).collect()
    assert [r["day"] for r in out] == sorted(r["day"] for r in out)
    gens = [r["generation"] for r in out]
    assert gens == sorted(gens) and gens[0] == 1
    assert all(
        r["index_name"] == rollover_name("logs", r["generation"]) for r in out
    )
    # every generation's doc total reaches the threshold except maybe the last
    per_gen: dict = {}
    for r in out:
        per_gen[r["generation"]] = per_gen.get(r["generation"], 0) + r["n_docs"]
    for g in sorted(per_gen)[:-1]:
        assert per_gen[g] >= 200


# ---------------------------------------------------------------------------
# snapshot / restore
# ---------------------------------------------------------------------------


def test_snapshot_restore_isolated(spark, tmp_path):
    corpus = pages_df(spark, 400, partitions=4)
    src_dir = str(tmp_path / "src")
    build_index(spark, corpus, src_dir, num_segments=4, num_chunks=1)
    idx = InvertedIndex(spark, src_dir)
    before = [(r["doc_id"], r["score"]) for r in idx.search(["spark"], k=None).collect()]

    repo = str(tmp_path / "repo")
    idx.snapshot(repo, "s1")
    with pytest.raises(ValueError, match="already exists"):
        idx.snapshot(repo, "s1")

    # mutate the live index AFTER the snapshot
    from elasticsearch_assets_spark.index.tombstones import add_tombstones

    victim = before[0][0]
    add_tombstones(idx.index_dir, [victim])
    idx.refresh_tombstones()
    assert victim not in {d for d, _ in _pairs(idx.search(["spark"], k=None))}

    restored = restore_snapshot(spark, repo, "s1", str(tmp_path / "rest"))
    assert _pairs(restored.search(["spark"], k=None)) == before

    # restore isolation the other way: delete on the restored copy,
    # snapshot still restorable and the live index unaffected
    add_tombstones(restored.index_dir, [before[1][0]])
    restored.refresh_tombstones()
    again = restore_snapshot(spark, repo, "s1", str(tmp_path / "rest2"))
    assert _pairs(again.search(["spark"], k=None)) == before

    with pytest.raises(ValueError, match="no snapshot"):
        restore_snapshot(spark, repo, "nope", str(tmp_path / "x"))
    with pytest.raises(ValueError, match="already exists"):
        restore_snapshot(spark, repo, "s1", str(tmp_path / "rest"))


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]
