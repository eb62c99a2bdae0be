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

# id alphabets per the reference's regexID types
# (/root/reference/asset/elasticsearch_data_generator/default_schema.js:50-64):
#   base64url:   [a-zA-Z1-9\-\_]\w{8}   (9 chars)
#   hexadecimal: [0-9a-f]{8}
#   HEXADECIMAL: [0-9A-F]{8}
def _parse_start_key(spec: str) -> str:
    """`id_start_key` is a one-char regex class: 'a' pins the first char,
    '[a-f]'/'[ab]' draws from the class (docs/ops_reference.md:169-170)."""
    if spec.startswith("[") and spec.endswith("]"):
        chars: list[str] = []
        body = spec[1:-1]
        i = 0
        while i < len(body):
            if i + 2 < len(body) and body[i + 1] == "-":
                chars.extend(
                    chr(c) for c in range(ord(body[i]), ord(body[i + 2]) + 1)
                )
                i += 3
            else:
                chars.append(body[i])
                i += 1
        return "".join(chars)
    return spec


def make_doc_ids(
    ids: np.ndarray,
    set_id: str = "base64url",
    id_start_key: str | None = None,
) -> list[str]:
    """Deterministic doc ids in the reference's `set_id` alphabets, with the
    optional forced-first-character `id_start_key` (hash-derived instead of
    randexp so builds are reproducible — C7)."""
    first_class = _parse_start_key(id_start_key) if id_start_key else None
    out = []
    for i in ids:
        digest = hashlib.sha1(str(int(i)).encode()).digest()
        if set_id == "base64url":
            # 9 chars, same derivation the events fixture always used
            s = base64.urlsafe_b64encode(digest)[:9].decode()
        elif set_id == "hexadecimal":
            s = digest.hex()[:8]
        elif set_id == "HEXADECIMAL":
            s = digest.hex()[:8].upper()
        else:
            raise ValueError(f"unknown set_id {set_id!r}")
        if first_class is not None:
            s = first_class[digest[0] % len(first_class)] + s[1:]
        out.append(s)
    return out


def events_pandas(
    n: int,
    ids: np.ndarray | None = None,
    start_ms: int = DEFAULT_START_MS,
    range_ms: int = DEFAULT_RANGE_MS,
    resolution: str = "ms",
    set_id: str = "base64url",
    id_start_key: str | None = None,
    date_format: str = "isoBetween",
    date_key: str = "created",
    now_ms: int | None = None,
) -> pd.DataFrame:
    """`date_format` mirrors the reference's `format` knob
    (docs/ops_reference.md:164-183): isoBetween/utcBetween spread dates over
    [start, start+range) (we store TIMESTAMP, always UTC — the iso/utc
    distinction is a string-rendering concern); dateNow/utcDate stamp every
    doc with `now_ms` (caller-injected so builds stay deterministic).
    `date_key` renames the date column (reference default "created")."""
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    ids = ids.astype(np.int64)
    if date_format in ("isoBetween", "utcBetween"):
        ts_ms = start_ms + (ids * range_ms) // max(n, 1)
    elif date_format in ("dateNow", "utcDate"):
        if now_ms is None:
            raise ValueError(f"{date_format} needs now_ms for determinism")
        ts_ms = np.full(len(ids), now_ms, dtype=np.int64)
    else:
        raise ValueError(f"unknown format {date_format!r}")
    if resolution == "s":
        ts_ms = (ts_ms // 1000) * 1000
    lat = -80 + (ids * 7) % 160
    lon = -170 + (ids * 13) % 340
    ips = [f"10.{(int(i) >> 16) & 255}.{(int(i) >> 8) & 255}.{int(i) & 255}" for i in ids]
    doc_ids = make_doc_ids(ids, set_id=set_id, id_start_key=id_start_key)
    return pd.DataFrame(
        {
            "ip": ips,
            "userAgent": [_UAS[int(i) % 8] for i in ids],
            "url": [f"https://example{int(i) % 97}.org" for i in ids],
            "uuid": [str(uuid.uuid5(uuid.NAMESPACE_URL, str(int(i)))) for i in ids],
            date_key: pd.to_datetime(ts_ms, unit="ms"),
            "ipv6": [f"2001:db8::{int(i) & 0xffff:x}" for i in ids],
            "location": [f"{int(a)},{int(o)}" for a, o in zip(lat, lon)],
            "bytes": 7850 + (ids * 31) % (5642867 - 7850),
            "id": doc_ids,
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
    set_id: str = "base64url",
    id_start_key: str | None = None,
    date_format: str = "isoBetween",
    date_key: str = "created",
    now_ms: int | None = None,
) -> DataFrame:
    base = spark.range(0, n, numPartitions=partitions)
    schema = EVENTS_SCHEMA.replace("created timestamp", f"{date_key} timestamp")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield events_pandas(
                n, ids=pdf["id"].to_numpy(), start_ms=start_ms, range_ms=range_ms,
                resolution=resolution, set_id=set_id, id_start_key=id_start_key,
                date_format=date_format, date_key=date_key, now_ms=now_ms,
            )

    return base.mapInPandas(gen, schema=schema)
