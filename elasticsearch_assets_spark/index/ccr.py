"""ES cross-cluster replication (CCR): a follower index tracks a leader.

Reference behavior: ES CCR followers replicate a leader index's shard
operations pull-style; the follower is read-only while following and can
be promoted to a regular index (unfollow). The reference repo's users
run exactly this shape for cross-cluster copies of indexed corpora.

Spark-first re-expression: replication is FILE reconciliation against
the leader's committed snapshot — chunk directories are immutable once
committed (chunk commits are atomic; compaction writes NEW chunk ids and
deletes old dirs), so a sync is:

  1. link leader chunk dirs the follower lacks (hard links — metadata
     only, the PIT/snapshot machinery's refcount argument),
  2. drop follower chunk dirs the leader no longer has (compaction),
  3. wholesale-relink the small metadata (stats/, manifest/, tombstones/,
     meta.json, seg_map.json, build_params.json) — after which the
     follower IS the leader's committed snapshot, stats included.

ES ships operations because clusters don't share storage; on shared /
object storage the exact equivalent is snapshot-id pinning + file-level
catch-up, which is what this is. A torn read of a mid-finalize leader is
detected by comparing the leader's meta.json before and after the link
pass (finalize replaces meta via os.replace LAST, so equality brackets a
consistent snapshot) and retried.

100 TB note: sync cost is O(new files) inode ops per poll — independent
of corpus size; the follower serves queries from the same immutable
chunk files, so a promoted follower is production-ready instantly.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import SparkSession


def _chunk_files(index_dir: str) -> "dict[str, set[str]]":
    out: "dict[str, set[str]]" = {}
    for d in glob.glob(os.path.join(index_dir, "segments", "chunk=*")):
        out[os.path.basename(d)] = {
            os.path.basename(f)
            for f in glob.glob(os.path.join(d, "*.parquet"))
        }
    return out


def _link(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:  # cross-device / FS without hard links
        shutil.copy2(src, dst)


def _relink_dir(leader_dir: str, follower_dir: str, sub: str, pat: str) -> None:
    src_files = glob.glob(os.path.join(leader_dir, sub, pat))
    dst = os.path.join(follower_dir, sub)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    if src_files:
        os.makedirs(dst)
        for f in src_files:
            _link(f, os.path.join(dst, os.path.basename(f)))


def _read_meta_bytes(index_dir: str) -> bytes:
    with open(os.path.join(index_dir, "meta.json"), "rb") as f:
        return f.read()


def sync_follower(
    spark: SparkSession, leader_dir: str, follower_dir: str
) -> dict:
    """Create or catch up a follower of `leader_dir` at `follower_dir`.
    Returns a report dict (mode, chunks_added, chunks_removed, n_docs).
    Refuses to sync into a non-follower index directory. Idempotent —
    a no-change sync links nothing and removes nothing."""
    if not os.path.exists(os.path.join(leader_dir, "meta.json")):
        raise ValueError(f"leader has no committed snapshot: {leader_dir!r}")
    marker = os.path.join(follower_dir, "ccr.json")
    bootstrap = not os.path.exists(os.path.join(follower_dir, "meta.json"))
    if not bootstrap:
        if not os.path.exists(marker):
            raise ValueError(
                f"{follower_dir!r} is an existing index but not a CCR "
                "follower (no ccr.json) — refusing to overwrite it"
            )
        with open(marker) as f:
            lead = json.load(f)["leader"]
        if os.path.abspath(lead) != os.path.abspath(leader_dir):
            raise ValueError(
                f"follower tracks {lead!r}, not {leader_dir!r} — promote "
                "it first (promote_follower) to change leaders"
            )

    for attempt in range(3):
        before = _read_meta_bytes(leader_dir)
        l_chunks = _chunk_files(leader_dir)
        f_chunks = _chunk_files(follower_dir)
        # a same-named chunk with a different file set means the leader
        # rewrote it (shouldn't happen — chunks are immutable — but a
        # relink is the safe reconciliation either way)
        changed = {
            c for c in (l_chunks.keys() & f_chunks.keys())
            if l_chunks[c] != f_chunks[c]
        }
        added = sorted((l_chunks.keys() - f_chunks.keys()) | changed)
        removed = sorted((f_chunks.keys() - l_chunks.keys()) | changed)
        for c in removed:
            shutil.rmtree(os.path.join(follower_dir, "segments", c))
        for c in added:
            dst = os.path.join(follower_dir, "segments", c)
            os.makedirs(dst, exist_ok=True)
            for fname in l_chunks[c]:
                _link(os.path.join(leader_dir, "segments", c, fname),
                      os.path.join(dst, fname))
        for sub, pat in (
            ("stats", "*.parquet"),
            ("manifest", "*.json"),
            ("tombstones", "*.json"),
        ):
            _relink_dir(leader_dir, follower_dir, sub, pat)
        for fname in ("meta.json", "seg_map.json", "build_params.json"):
            dst = os.path.join(follower_dir, fname)
            if os.path.exists(dst):
                os.remove(dst)
            src = os.path.join(leader_dir, fname)
            if os.path.exists(src):
                _link(src, dst)
        if _read_meta_bytes(leader_dir) == before:
            break  # consistent bracket — the snapshot we linked is whole
    else:
        raise RuntimeError(
            f"leader {leader_dir!r} kept changing mid-sync (3 attempts) — "
            "retry when the write burst settles"
        )
    with open(marker + ".tmp", "w") as f:
        json.dump({"leader": os.path.abspath(leader_dir)}, f)
    os.replace(marker + ".tmp", marker)
    meta = json.loads(_read_meta_bytes(follower_dir))
    return {
        "mode": "bootstrap" if bootstrap else "incremental",
        "chunks_added": added,
        "chunks_removed": removed,
        "n_docs": meta["n_docs"],
    }


def promote_follower(follower_dir: str) -> None:
    """ES unfollow + promote: the follower becomes a regular index.
    File-level: drop the ccr marker — the chunk files are already the
    real immutable segments (hard links), so no data moves and later
    writes/compaction on the promoted index never touch the old leader
    (every metadata writer replaces via new inodes)."""
    marker = os.path.join(follower_dir, "ccr.json")
    if not os.path.exists(marker):
        raise ValueError(f"{follower_dir!r} is not a CCR follower")
    os.remove(marker)
