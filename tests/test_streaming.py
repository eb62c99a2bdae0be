"""Structured-Streaming persistent mode (T1-T5) + state storage (S9) tests.

Streaming runs use file sources with trigger(availableNow) so they are
deterministic: all staged input is processed in one run, then compared
against the equivalent batch computation.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from elasticsearch_assets_spark.state.storage import CachedStateStorage
from elasticsearch_assets_spark.streaming import persistent as P

EV_SCHEMA = "event_id long, ts timestamp, val string"


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def staged(spark, tmp_path):
    src = str(tmp_path / "src")
    # two "arrivals": the second includes a late row for window 0 and dups
    _write_batch(
        spark, src,
        [
            Row(event_id=1, ts=_ts(0, 10), val="a"),
            Row(event_id=2, ts=_ts(0, 50), val="b"),
            Row(event_id=3, ts=_ts(1, 10), val="c"),
        ],
    )
    _write_batch(
        spark, src,
        [
            Row(event_id=4, ts=_ts(0, 30), val="late-but-in-delay"),
            Row(event_id=3, ts=_ts(1, 10), val="c"),  # duplicate key
            Row(event_id=5, ts=_ts(2, 20), val="d"),
        ],
    )
    return src


def test_parse_interval():
    assert P.parse_interval("5s") == "5 second"
    assert P.parse_interval("2m") == "2 minute"
    assert P.parse_interval("500ms") == "500 millisecond"
    assert P.parse_interval("1h") == "1 hour"
    with pytest.raises(ValueError):
        P.parse_interval("auto")  # persistent mode needs explicit interval
    with pytest.raises(ValueError):
        P.parse_interval("5fortnights")


def test_windowed_counts_match_batch(spark, staged, tmp_path):
    stream = P.file_stream(spark, staged, EV_SCHEMA)
    counts = P.windowed_counts(stream, "ts", "1m", delay="30s")
    got = P.run_to_table(
        counts,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="complete",
        queryName="wc",
    ).collect()
    batch = (
        spark.read.parquet(staged)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "cnt")
        .collect()
    )
    want = {r["win_start"]: r["cnt"] for r in batch}
    assert {r["win_start"]: r["cnt"] for r in got} == want
    assert want[_ts(0)] == 3  # late row landed in its event-time window


def test_stream_dedup_within_watermark(spark, staged, tmp_path):
    stream = P.file_stream(spark, staged, EV_SCHEMA)
    dd = P.stream_dedup(stream, ["event_id"], "ts", delay="10m")
    rows = P.run_to_table(
        dd, checkpoint_dir=str(tmp_path / "ckpt2"), queryName="dd"
    ).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3, 4, 5]  # duplicate event_id=3 dropped


def test_generator_stream_schema(spark):
    gen = P.generator_stream(spark, rows_per_second=10)
    assert gen.isStreaming
    assert [f[0] for f in gen.dtypes] == [
        "event_id", "created", "url", "bytes", "location",
    ]


def test_persistent_window_tumbling_only(spark, staged):
    stream = P.file_stream(spark, staged, EV_SCHEMA)
    w = P.persistent_window(stream, "ts", "1m", delay="30s")
    assert "window" in w.columns and w.isStreaming


# ---------------------------------------------------------------------------
# state storage
# ---------------------------------------------------------------------------


@pytest.fixture()
def store(spark, tmp_path):
    return CachedStateStorage(spark, str(tmp_path / "state"), key="_key", num_buckets=4)


def _state_rows(spark, *pairs):
    return spark.createDataFrame(
        [Row(_key=k, payload=v) for k, v in pairs], "_key string, payload string"
    )


def test_mset_mget_roundtrip(spark, store):
    store.mset(_state_rows(spark, ("k1", "v1"), ("k2", "v2")))
    got = {r["_key"]: r["payload"] for r in store.mget(["k1", "k3"]).collect()}
    assert got == {"k1": "v1"}  # only present keys return (reference mget)
    assert store.count() == 2
    store.mset(_state_rows(spark, ("k2", "v2b"), ("k4", "v4")))
    got = {r["_key"]: r["payload"] for r in store.mget(["k2", "k4"]).collect()}
    assert got == {"k2": "v2b", "k4": "v4"}


def test_enrich_join(spark, store):
    store.mset(_state_rows(spark, ("a", "cached-a")))
    incoming = spark.createDataFrame(
        [Row(_key="a", payload="new"), Row(_key="b", payload="new")],
        "_key string, payload string",
    )
    out = {r["_key"]: (r["payload"], r["payload_state"]) for r in store.enrich(incoming).collect()}
    assert out == {"a": ("new", "cached-a"), "b": ("new", None)}


def test_single_key_lru_and_persistence(spark, store, tmp_path):
    store.set({"_key": "x", "payload": "px"})
    assert store.get("x")["payload"] == "px"
    assert store.get("missing") is None
    # a fresh instance over the same path sees persisted state (persist=true,
    # reference schema.js:30-33)
    again = CachedStateStorage(spark, str(tmp_path / "state"), key="_key", num_buckets=4)
    assert again.get("x")["payload"] == "px"
    store.delete(["x"])
    assert CachedStateStorage(
        spark, str(tmp_path / "state"), key="_key", num_buckets=4
    ).get("x") is None


def test_mget_on_empty_store(spark, store):
    assert store.mget(["nothing"]).count() == 0
    assert store.count() == 0


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------


def test_keyed_running_stats_accumulates_across_restarts(spark, tmp_path):
    from elasticsearch_assets_spark.streaming.stateful import keyed_running_stats

    src = str(tmp_path / "st_src")
    ckpt = str(tmp_path / "st_ckpt")
    _write_batch(
        spark, src,
        [Row(event_id=1, ts=_ts(0), val="a"), Row(event_id=1, ts=_ts(1), val="a"),
         Row(event_id=2, ts=_ts(2), val="b")],
    )

    def run_once(qname):
        # foreachBatch sink: supports checkpoint recovery (memory sink does not)
        collected = []
        stream = P.file_stream(spark, src, EV_SCHEMA)
        stats = keyed_running_stats(
            stream.withColumn("v", F.lit(10.0)),
            key_col="val", ts_col="ts", value_col="v",
        )
        q = (
            stats.writeStream.foreachBatch(
                lambda df, _bid: collected.extend(df.collect())
            )
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return {r["key"]: (r["cnt"], r["total"]) for r in collected}

    first = run_once("st1")
    assert first == {"a": (2, 20.0), "b": (1, 10.0)}

    # more data arrives; a RESTARTED query (same checkpoint) must resume the
    # persisted per-key state, not restart the counters
    _write_batch(
        spark, src,
        [Row(event_id=3, ts=_ts(3), val="a"), Row(event_id=4, ts=_ts(4), val="c")],
    )
    second = run_once("st2")
    assert second["a"] == (3, 30.0)  # 2 (from state) + 1 new
    assert second["c"] == (1, 10.0)
    assert "b" not in second  # update mode: untouched keys aren't re-emitted


def test_stateful_version_mismatch_raises():
    """A checkpoint whose state struct happens to be shape-compatible but
    carries a different STATE_VERSION must fail fast, never silently
    reinterpret stored values (ADVICE round 2: Spark's state-schema check
    ignores field names)."""
    import pandas as pd
    import pytest as _pytest

    from elasticsearch_assets_spark.streaming import stateful as S

    class FakeState:
        exists = True
        get = (1, 2.0, 3, S.STATE_VERSION - 1)

        def update(self, v):
            pass

    pdf = pd.DataFrame(
        {"value": [1.0], "ts": [pd.Timestamp("2024-01-01")]}
    )
    with _pytest.raises(ValueError, match="state version"):
        list(S._stats_fn(("k",), iter([pdf]), FakeState()))
    assert "ver int" in S.STATE_SCHEMA
    assert S.checkpoint_dir("/tmp/x").endswith(f"state_v{S.STATE_VERSION}")
