"""Planner semantics tests mirroring the reference's exact-sequence style
(/root/reference/test/elasticsearch_reader-spec.js:277-307,
 /root/reference/test/id_slicer-spec.js:215-253) on engineered distributions
(FIXTURES.md §4)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.plans.date_slicer import plan_date_slices, slice_predicate
from elasticsearch_assets_spark.plans.datemath import parse_date_math
from elasticsearch_assets_spark.plans.id_slicer import ALPHABETS, plan_key_slices, key_predicate


def _ts_df(spark, epochs_ms):
    return spark.createDataFrame(
        [(i, e) for i, e in enumerate(epochs_ms)], "id long, ms long"
    ).select("id", F.timestamp_millis(F.col("ms")).alias("ts"))


BASE = 1_600_000_000_000  # 2020-09-13T12:26:40Z


class TestDateSlicer:
    def _check_invariants(self, plan, size, min_unit_ms=1):
        slices = plan.slices
        assert sum(s.count for s in slices) == plan.total
        # contiguous [start, end) cover of [start, limit)
        assert slices[0].start == plan.start
        assert slices[-1].end == plan.limit
        for a, b in zip(slices, slices[1:]):
            assert a.end == b.start
        for s in slices:
            width_ms = (s.end - s.start).total_seconds() * 1000
            assert s.count <= size or width_ms <= min_unit_ms

    def test_uniform(self, spark):
        # 1000 docs over 1000 seconds, size 100 → ~10 even slices
        df = _ts_df(spark, [BASE + i * 1000 for i in range(1000)])
        plan = plan_date_slices(df, "ts", size=100)
        self._check_invariants(plan, 100)
        assert 8 <= len(plan.slices) <= 14
        assert plan.total == 1000

    def test_hot_middle(self, spark):
        # sparse except one hot second holding 500 docs (size 100)
        epochs = [BASE + i * 10_000 for i in range(100)]
        epochs += [BASE + 500_000 + i for i in range(500)]
        df = _ts_df(spark, epochs)
        plan = plan_date_slices(df, "ts", size=100)
        self._check_invariants(plan, 100)
        assert plan.recursions > 0  # hot bucket forced refinement
        hot = [s for s in plan.slices if s.count > 100]
        for s in hot:  # any oversized slice must be at min width (1ms grid)
            assert (s.end - s.start).total_seconds() * 1000 <= 2

    def test_sparse_gaps_expansion(self, spark):
        # bursts separated by long empty stretches are absorbed (coalesce)
        epochs = [BASE + i for i in range(50)]
        epochs += [BASE + 10_000_000 + i for i in range(50)]
        df = _ts_df(spark, epochs)
        plan = plan_date_slices(df, "ts", size=200)
        self._check_invariants(plan, 200)
        assert len(plan.slices) == 1  # all 100 docs fit one slice spanning the gap

    def test_exclusive_end_covers_last_doc(self, spark):
        df = _ts_df(spark, [BASE, BASE + 5000])
        plan = plan_date_slices(df, "ts", size=10)
        assert plan.limit == datetime.fromtimestamp(
            (BASE + 5001) / 1000, tz=timezone.utc
        )
        # predicate [start, end): every doc matched exactly once
        total = 0
        for s in plan.slices:
            total += df.where(slice_predicate("ts", s)).count()
        assert total == 2

    def test_single_ms_resolution(self, spark):
        # all docs in one ms: slice cannot shrink below 1 unit; emits oversize
        df = _ts_df(spark, [BASE] * 300)
        plan = plan_date_slices(df, "ts", size=100)
        assert plan.total == 300
        assert len(plan.slices) == 1
        assert plan.slices[0].count == 300

    def test_explicit_bounds(self, spark):
        df = _ts_df(spark, [BASE + i * 1000 for i in range(100)])
        start = datetime.fromtimestamp(BASE / 1000 + 10, tz=timezone.utc)
        end = datetime.fromtimestamp(BASE / 1000 + 20, tz=timezone.utc)
        plan = plan_date_slices(df, "ts", size=5, start=start, end=end)
        assert plan.total == 10
        assert plan.start == start and plan.limit == end


class TestIdSlicer:
    def test_prefix_deepening_order(self, spark):
        # 'a*' small; 'b*' oversized → descends: emits a, b0, b1, b2 in order
        keys = [f"a{i:02d}" for i in range(5)]
        keys += [f"b0x{i}" for i in range(8)] + [f"b1x{i}" for i in range(8)] + [
            f"b2x{i}" for i in range(4)
        ]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        plan = plan_key_slices(df, "k", size=10, key_type="base64url")
        assert [s.prefix for s in plan] == ["a", "b0", "b1", "b2"]
        assert [s.count for s in plan] == [5, 8, 8, 4]

    def test_counts_cover_all(self, spark):
        import hashlib

        keys = [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in range(2000)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        plan = plan_key_slices(df, "k", size=200, key_type="hexadecimal")
        assert sum(s.count for s in plan) == 2000
        assert all(s.count <= 200 for s in plan)
        # every key matched by exactly one prefix (prefix-free plan)
        ps = [s.prefix for s in plan]
        for p in ps:
            assert not any(q != p and q.startswith(p) for q in ps)

    def test_resume_after_key(self, spark):
        keys = [f"{c}{i}" for c in "abc" for i in range(3)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        plan = plan_key_slices(df, "k", size=10, after_key="a")
        assert [s.prefix for s in plan] == ["b", "c"]

    def test_key_range_validation(self, spark):
        df = spark.createDataFrame([("a1",)], "k string")
        with pytest.raises(ValueError):
            plan_key_slices(df, "k", key_type="hexadecimal", key_range=["z"])

    def test_alphabet_sizes(self):
        # max slicer fanout bounds, /root/reference/asset/id_reader/index.js:115-125
        assert len(ALPHABETS["base64url"]) == 64
        assert len(ALPHABETS["base64"]) == 64
        assert len(ALPHABETS["hexadecimal"]) == 16

    def test_key_predicate(self, spark):
        from elasticsearch_assets_spark.plans.id_slicer import KeySlice

        df = spark.createDataFrame([("abc",), ("abd",), ("xyz",)], "k string")
        assert df.where(key_predicate("k", KeySlice("ab", 2))).count() == 2


class TestDateMath:
    def test_now_arithmetic(self):
        now = datetime(2020, 6, 15, 12, 30, 45, tzinfo=timezone.utc)
        assert parse_date_math("now-1h", now) == datetime(
            2020, 6, 15, 11, 30, 45, tzinfo=timezone.utc
        )
        assert parse_date_math("now-1h/h", now) == datetime(
            2020, 6, 15, 11, 0, 0, tzinfo=timezone.utc
        )
        assert parse_date_math("now+1M/d", now) == datetime(
            2020, 7, 15, tzinfo=timezone.utc
        )
        assert parse_date_math("now/w", now) == datetime(
            2020, 6, 15, tzinfo=timezone.utc
        )  # Monday

    def test_anchored(self):
        assert parse_date_math("2020-01-31||+1M") == datetime(
            2020, 2, 29, tzinfo=timezone.utc
        )

    def test_iso_and_epoch(self):
        assert parse_date_math("2020-06-15T10:00:00Z") == datetime(
            2020, 6, 15, 10, tzinfo=timezone.utc
        )
        assert parse_date_math("1600000000000") == datetime(
            2020, 9, 13, 12, 26, 40, tzinfo=timezone.utc
        )

    def test_bad_input(self):
        with pytest.raises(ValueError):
            parse_date_math("now-1h garbage")
