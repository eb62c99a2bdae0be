"""Document deletion via tombstones (Lucene/ES semantics).

Immutable segments cannot remove a posting in place; Elasticsearch marks
docs deleted and purges them at segment merge. Same here:

* ``add_tombstones`` appends doc ids to ``<index>/tombstones/`` (atomic
  driver-side files, like the chunk manifest);
* the query engine loads the (small) tombstone set once per handle and
  excludes those docs BEFORE ranking — deletions are visible immediately
  and exclusion-before-top-k is rank-safe for the surviving docs;
* **collection stats (df, N, avgdl) intentionally still count tombstoned
  docs until compaction** — byte-for-byte the ES/Lucene behavior (deleted
  docs affect scores until merge);
* ``merge_segments(..., apply_tombstones=True)`` drops tombstoned postings
  physically, clears the tombstone files, and re-finalizes stats.

At scale the tombstone set is bounded by compaction cadence; it ships to
executors as a broadcast numpy array (1 M deletions = 8 MB).
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Iterable

import numpy as np


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


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc ids (empty array when none)."""
    ids: set[int] = set()
    for p in glob.glob(os.path.join(_tdir(index_dir), "t-*.json")):
        with open(p) as fh:
            ids.update(json.load(fh))
    return np.array(sorted(ids), dtype=np.int64)


def clear_tombstones(index_dir: str) -> None:
    for p in glob.glob(os.path.join(_tdir(index_dir), "t-*.json")):
        os.remove(p)
