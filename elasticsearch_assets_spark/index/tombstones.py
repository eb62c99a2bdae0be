"""Document deletion via tombstones (Lucene/ES semantics).

Immutable segments cannot remove a posting in place; Elasticsearch marks
docs deleted and purges them at segment merge. Same here:

* ``add_tombstones`` appends doc ids to ``<index>/tombstones/`` (atomic
  driver-side files, like the chunk manifest);
* ``add_tombstones_df`` is the DISTRIBUTED tier: a DataFrame of matched
  ids is written as a parquet deletion file straight from the executors
  — the id set never materializes on the driver (mass deletes at 100 TB
  scale: a retention sweep matching 10^8 docs stays executor-side end to
  end; see ``query/engine.py delete_by_query``);
* the query engine loads the (small) tombstone set once per handle and
  excludes those docs BEFORE ranking — deletions are visible immediately
  and exclusion-before-top-k is rank-safe for the surviving docs;
* **collection stats (df, N, avgdl) intentionally still count tombstoned
  docs until compaction** — byte-for-byte the ES/Lucene behavior (deleted
  docs affect scores until merge);
* ``merge_segments(..., apply_tombstones=True)`` drops tombstoned postings
  physically, clears the tombstone files, and re-finalizes stats. Above
  ``TOMBSTONE_BROADCAST_CAP`` ids the purge switches from the broadcast
  numpy exclusion to a cogrouped anti-set routed per segment (see
  ``index/merge.py``) so the big set never rides a broadcast either.

The in-memory tombstone set the serving/query path holds is bounded:
``load_tombstones`` refuses above ``TOMBSTONE_MEMORY_CAP`` (the engine's
documented contract is that ``delete_by_query`` triggers a physical purge
before the set can reach that size — ``purge_trigger``); 1 M deletions =
8 MB broadcast, the worst allowed case ~160 MB.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Iterable

import numpy as np

# Ids the driver/serving path will hold in memory (and broadcast into
# ranking kernels). delete_by_query's purge trigger keeps real indexes far
# below this; the cap turns a would-be driver OOM into a loud error.
TOMBSTONE_MEMORY_CAP = 20_000_000

# Above this many tombstones, compaction's purge routes the exclusion set
# per segment with a cogroup instead of broadcasting one numpy array.
TOMBSTONE_BROADCAST_CAP = 5_000_000

# delete_by_query: matched-id sets up to this size collect to the driver
# (one small JSON deletion file, the low-latency path); larger sets are
# written executor-side as parquet deletion files.
DELETE_COLLECT_CAP = 100_000

# delete_by_query: total tombstone cardinality above this triggers an
# immediate physical purge (merge_segments(apply_tombstones=True)) — the
# auto-compaction analog of Lucene's deletes_pct_allowed merge pressure.
# Keeps the per-query in-memory exclusion set bounded far under
# TOMBSTONE_MEMORY_CAP.
TOMBSTONE_PURGE_TRIGGER = 2_000_000


class TombstoneOverflowError(RuntimeError):
    """Tombstone cardinality exceeds what the in-memory query path may
    hold; run ``merge_segments(..., apply_tombstones=True)`` (the
    distributed purge) before reopening the index."""


def _tdir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def add_tombstones(index_dir: str, doc_ids: Iterable[int]) -> int:
    """Append a deletion set; returns how many ids were recorded."""
    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return 0
    os.makedirs(_tdir(index_dir), exist_ok=True)
    path = os.path.join(_tdir(index_dir), f"t-{time.time_ns():020d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(ids, fh)
    os.replace(tmp, path)
    return len(ids)


def add_tombstones_df(index_dir: str, ids_df, count: int | None = None) -> int:
    """Executor-side deletion write: ``ids_df`` (one ``doc_id`` column) is
    written as ``tombstones/p-<ts>.parquet/`` with a driver-side count
    sidecar (``.count.json`` — lets ``tombstone_count`` stay metadata-only).
    The write goes to a temp dir and lands via os.replace-style dir rename,
    the same atomic-commit rule every other metadata writer follows; a
    crash mid-write leaves only an ignored ``.tmp-`` dir. Returns the
    recorded id count. The ids never pass through the driver.

    ONE Spark job: when ``count`` isn't supplied, it is derived from the
    written parquet footers (a driver-side metadata read), not a separate
    ``count()`` — a mass delete_by_query would otherwise execute its full
    matched-query scoring job twice (round-4 advice #4)."""
    from pyspark.sql import functions as F

    ids_df = ids_df.select(F.col("doc_id").cast("long").alias("doc_id"))
    os.makedirs(_tdir(index_dir), exist_ok=True)
    ts = time.time_ns()
    final = os.path.join(_tdir(index_dir), f"p-{ts:020d}.parquet")
    tmp = os.path.join(_tdir(index_dir), f".tmp-{ts:020d}")
    ids_df.write.mode("overwrite").parquet(tmp)
    if count is None:
        import pyarrow.parquet as pq

        count = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(tmp, "*.parquet"))
        )
    count = int(count)
    if count == 0:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        return 0
    os.rename(tmp, final)  # atomic dir move on one filesystem
    side = final + ".count.json"
    with open(side + ".tmp", "w") as fh:
        json.dump({"n": count}, fh)
    os.replace(side + ".tmp", side)
    return count


def _parquet_dirs(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(_tdir(index_dir), "p-*.parquet")))


def tombstone_count(index_dir: str) -> int:
    """Upper bound on tombstone cardinality, metadata-only: JSON file
    lengths plus parquet sidecar counts. Duplicate ids across deletion
    files double-count — fine for the purge trigger and the memory-cap
    gate, both of which want an upper bound."""
    n = 0
    for p in glob.glob(os.path.join(_tdir(index_dir), "t-*.json")):
        with open(p) as fh:
            n += len(json.load(fh))
    for d in _parquet_dirs(index_dir):
        try:
            with open(d + ".count.json") as fh:
                n += int(json.load(fh)["n"])
        except OSError:
            # sidecar missing (foreign writer): fall back to a footer read
            import pyarrow.parquet as pq

            n += sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(d, "*.parquet"))
            )
    return n


def load_tombstones(
    index_dir: str, cap: int | None = TOMBSTONE_MEMORY_CAP
) -> np.ndarray:
    """Sorted unique tombstoned doc ids (empty array when none), JSON tier
    plus parquet tier. Raises TombstoneOverflowError above `cap` — the
    query path must never silently materialize an unbounded set (pass
    cap=None only in tooling that knows better)."""
    if cap is not None:
        n = tombstone_count(index_dir)
        if n > cap:
            raise TombstoneOverflowError(
                f"{n} tombstoned ids exceed the in-memory cap {cap}; "
                "compact first: merge_segments(..., apply_tombstones=True)"
            )
    ids: set[int] = set()
    for p in glob.glob(os.path.join(_tdir(index_dir), "t-*.json")):
        with open(p) as fh:
            ids.update(json.load(fh))
    arrs: list[np.ndarray] = [np.array(sorted(ids), dtype=np.int64)]
    for d in _parquet_dirs(index_dir):
        import pyarrow.parquet as pq

        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            arrs.append(
                pq.read_table(f, columns=["doc_id"])["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
    if len(arrs) == 1:
        return arrs[0]
    return np.unique(np.concatenate(arrs))


def tombstones_df(spark, index_dir: str):
    """The full tombstone set as a distributed DataFrame (`doc_id` long) —
    the purge path's view; JSON-tier ids are small by contract and ride a
    createDataFrame, parquet tiers stay executor-read. None when empty."""
    from pyspark.sql import functions as F

    parts = []
    ids: set[int] = set()
    for p in glob.glob(os.path.join(_tdir(index_dir), "t-*.json")):
        with open(p) as fh:
            ids.update(json.load(fh))
    if ids:
        parts.append(
            spark.createDataFrame(
                [(int(i),) for i in sorted(ids)], "doc_id long"
            )
        )
    dirs = _parquet_dirs(index_dir)
    if dirs:
        parts.append(
            spark.read.parquet(*dirs).select(
                F.col("doc_id").cast("long").alias("doc_id")
            )
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def clear_tombstones(index_dir: str) -> None:
    import shutil

    for p in glob.glob(os.path.join(_tdir(index_dir), "t-*.json")):
        os.remove(p)
    for d in _parquet_dirs(index_dir):
        side = d + ".count.json"
        if os.path.exists(side):
            os.remove(side)
        shutil.rmtree(d)
