"""Deterministic reference-shaped `events` docs (FIXTURES.md §2).

Mirrors the reference generator's canonical document
(/root/reference/asset/elasticsearch_data_generator/default_schema.js:9-34,
/root/reference/docs/ops_reference.md:131-143) with hash-derived fields:
(ip, userAgent, url, uuid, created, ipv6, location, bytes, id).

Used by the date-slice planner, id-prefix planner, geo, and index-selector
tests. `created` is linear over [start, end) so planner tests can pin exact
slice boundaries like /root/reference/test/elasticsearch_reader-spec.js:277-307.
"""

from __future__ import annotations

import base64
import hashlib
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_UAS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)",
    "Mozilla/5.0 (X11; Linux x86_64)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 14_0 like Mac OS X)",
    "Mozilla/5.0 (Android 11; Mobile)",
    "curl/7.68.0",
    "python-requests/2.25.1",
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
]

DEFAULT_START_MS = 1561939200000  # 2019-07-01T00:00:00Z (covers the pinned weekly goldens)
DEFAULT_RANGE_MS = 14 * 24 * 3600 * 1000


def events_pandas(
    n: int,
    ids: np.ndarray | None = None,
    start_ms: int = DEFAULT_START_MS,
    range_ms: int = DEFAULT_RANGE_MS,
    resolution: str = "ms",
) -> pd.DataFrame:
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    ids = ids.astype(np.int64)
    ts_ms = start_ms + (ids * range_ms) // max(n, 1)
    if resolution == "s":
        ts_ms = (ts_ms // 1000) * 1000
    lat = -80 + (ids * 7) % 160
    lon = -170 + (ids * 13) % 340
    ips = [f"10.{(int(i) >> 16) & 255}.{(int(i) >> 8) & 255}.{int(i) & 255}" for i in ids]
    ids_b64 = [
        base64.urlsafe_b64encode(hashlib.sha1(str(int(i)).encode()).digest())[:9].decode()
        for i in ids
    ]
    return pd.DataFrame(
        {
            "ip": ips,
            "userAgent": [_UAS[int(i) % 8] for i in ids],
            "url": [f"https://example{int(i) % 97}.org" for i in ids],
            "uuid": [str(uuid.uuid5(uuid.NAMESPACE_URL, str(int(i)))) for i in ids],
            "created": pd.to_datetime(ts_ms, unit="ms"),
            "ipv6": [f"2001:db8::{int(i) & 0xffff:x}" for i in ids],
            "location": [f"{int(a)},{int(o)}" for a, o in zip(lat, lon)],
            "bytes": 7850 + (ids * 31) % (5642867 - 7850),
            "id": ids_b64,
            "event_id": ids,
        }
    )


EVENTS_SCHEMA = (
    "ip string, userAgent string, url string, uuid string, created timestamp, "
    "ipv6 string, location string, bytes long, id string, event_id long"
)


def events_df(
    spark: SparkSession,
    n: int,
    partitions: int = 8,
    start_ms: int = DEFAULT_START_MS,
    range_ms: int = DEFAULT_RANGE_MS,
    resolution: str = "ms",
) -> DataFrame:
    base = spark.range(0, n, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield events_pandas(
                n, ids=pdf["id"].to_numpy(), start_ms=start_ms, range_ms=range_ms,
                resolution=resolution,
            )

    return base.mapInPandas(gen, schema=EVENTS_SCHEMA)
