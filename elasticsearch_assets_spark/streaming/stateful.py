"""Custom stateful streaming operator (SURVEY.md §2.9 T5, §2.1 S9 persist).

`keyed_running_stats` keeps per-key running (count, sum, last event-time)
across micro-batches with `applyInPandasWithState` — the Spark-native form
of the reference's persisted state storage (`persist: true` writes the LRU
through to ES, /root/reference/asset/elasticsearch_state_storage/
schema.js:30-33): state lives in the streaming checkpoint, so a restarted
query resumes exactly where it stopped (tested).

State is Arrow-typed and partitioned by key — at 10^9 keys this scales with
executors (RocksDB state store in production configs), no driver state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, cnt bigint, total double, last_ts timestamp"
# STATE_VERSION history:
#   v1: (cnt, total, last_ms)  — millisecond event-time
#   v2: (cnt, total, last_us)  — microsecond event-time (parquet TIMESTAMP
#       precision; ms truncation diverged from a batch max(ts))
#   v3: (cnt, total, last_us, ver) — explicit version column (see below)
# Spark's state-schema compatibility check (DataType.
# equalsIgnoreNameAndCompatibleNullability) IGNORES field names, so a
# rename with identical types — exactly the v1->v2 ms->us change — would
# restart silently and reinterpret stored values. Two defenses:
#   * the struct carries a `ver int` column: a restart from any checkpoint
#     whose arity/types differ aborts at Spark's schema check, and one
#     whose shape happens to match is validated per-key at read time
#     (_stats_fn raises on ver mismatch — fail-fast, never silent).
#   * callers should also suffix checkpoint paths with STATE_VERSION
#     (checkpoint_dir() below) so old and new state never share a location.
STATE_VERSION = 3
STATE_SCHEMA = "cnt bigint, total double, last_us bigint, ver int"


def checkpoint_dir(base: str) -> str:
    """Version-scoped checkpoint location: a v_N checkpoint can never be
    opened by v_M code, independent of struct-shape coincidences."""
    import os

    return os.path.join(base, f"state_v{STATE_VERSION}")


def _stats_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        cnt, total, last_us, ver = state.get
        if ver != STATE_VERSION:
            raise ValueError(
                f"stateful checkpoint holds state version {ver}, code is "
                f"v{STATE_VERSION}: restart from a fresh checkpoint "
                "(the source replays and rebuilds state)"
            )
    else:
        cnt, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            # microsecond precision: event timestamps are parquet TIMESTAMP
            # (us); ms truncation would lose ordering vs a batch max(ts)
            last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
    state.update((cnt, float(total), int(last_us), STATE_VERSION))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "cnt": [cnt],
            "total": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def keyed_running_stats(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum, max event-time), updated every batch.

    Input stream needs (key_col, ts_col timestamp, value_col numeric); the
    state handle persists in the checkpoint across restarts.
    """
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _stats_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
