"""Durable doc->segment mapping that SURVIVES compaction (round-3 fix).

The cogrouped filtered-search path (query/engine.py `search_filtered`,
strategy="cogroup") shuffles only filter ids, keyed by the segment each doc
lives in. Round 2 derived that mapping from `meta.partitioning == "doc_hash"`
plus manifest chunk ranges — and returned None the moment any compaction row
appeared, silently degrading to the driver-collect/exhaustive fallbacks on
exactly the indexes a 100 TB deployment has (compaction is routine there).

This module makes the mapping a first-class, durable artifact:
`<index_dir>/seg_map.json` holds one entry per chunk,

    entry = {chunk, lo, hi, spc, segs: [int] * spc}
    seg_id(doc) = segs[ pmod(xxhash64(doc_id), spc) ]

i.e. a closed-form residue->segment LOOKUP TABLE. The original doc_hash
build writes the identity table (segs[i] = chunk*spc + i); every compaction
then *transforms* the tables instead of invalidating them:

* `merge_segments(target)`  : segs[i] -> segs[i] % target      (all entries)
* `merge_chunks(picks, ...)`: segs[i] -> base + segs[i] % out  (picked only)

because both merges remap seg ids by exactly those arithmetic rules
(index/merge.py:150-152, 253-255). After a transform, entries with identical
(range, table) dedupe, and a map whose entries ALL share one table collapses
to a single unranged entry — the streaming auto-compaction steady state, so
the map stays O(live chunks), not O(epochs ever).

Routing (`route_ids`) is pure DataFrame ops: the tiny entries table is
broadcast, ranged entries join on [lo, hi), unranged entries (streaming
epochs, whose chunk membership is arrival-time, not id-range) replicate each
filter id to every entry's candidate segment — sound because the cogroup
kernel treats ids as a RESTRICTION (docs absent from a segment simply don't
match), and bounded by the auto-compaction chunk cap.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

SEG_MAP_FILE = "seg_map.json"


@dataclass
class SegMapEntry:
    chunk: int
    spc: int
    segs: list[int]
    lo: int | None = None  # [lo, hi) doc-id range; None = all ids (epoch chunk)
    hi: int | None = None

    def key(self) -> tuple:
        return (self.chunk, self.lo, self.hi, self.spc, tuple(self.segs))


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, SEG_MAP_FILE)


def _load_raw(index_dir: str) -> dict | None:
    p = _path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_seg_map(
    index_dir: str, entries: list[SegMapEntry], kind: str = "doc_hash"
) -> None:
    tmp = _path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"version": 1, "kind": kind, "entries": [asdict(e) for e in entries]},
            f,
        )
    os.replace(tmp, _path(index_dir))  # atomic, same as manifest commits


def poison_seg_map(index_dir: str) -> None:
    """Mark the mapping unknowable (input-partitioned chunks: seg = input
    split id, not a function of doc_id)."""
    save_seg_map(index_dir, [], kind="opaque")


def load_seg_map(index_dir: str) -> list[SegMapEntry] | None:
    raw = _load_raw(index_dir)
    if raw is None or raw.get("kind") != "doc_hash" or not raw["entries"]:
        return None
    return [SegMapEntry(**e) for e in raw["entries"]]


def normalize(entries: list[SegMapEntry]) -> list[SegMapEntry]:
    """Dedupe identical entries; collapse an all-uniform map to one
    unranged entry (every doc maps through the same table regardless of
    which chunk it arrived in)."""
    out: list[SegMapEntry] = []
    seen: set[tuple] = set()
    for e in entries:
        k = e.key()
        if k not in seen:
            seen.add(k)
            out.append(e)
    if len(out) > 1:
        tables = {(e.spc, tuple(e.segs)) for e in out}
        if len(tables) == 1:
            spc, segs = next(iter(tables))
            out = [SegMapEntry(chunk=out[0].chunk, spc=spc, segs=list(segs))]
    return out


def upsert_chunk_entry(index_dir: str, entry: SegMapEntry) -> None:
    """Idempotently (re)register one chunk's mapping — the streaming writer
    calls this per epoch; a replayed epoch replaces its own entry."""
    raw = _load_raw(index_dir)
    if raw is not None and raw.get("kind") != "doc_hash":
        return  # poisoned stays poisoned
    entries = (
        [SegMapEntry(**e) for e in raw["entries"] if e["chunk"] != entry.chunk]
        if raw is not None
        else []
    )
    entries.append(entry)
    save_seg_map(index_dir, normalize(entries))


def apply_merge_chunks(
    index_dir: str,
    picks: list[int],
    *,
    seg_base: int,
    segs_out: int,
    new_chunk: int,
) -> None:
    """Mirror merge.merge_chunks' seg-id rewrite: picked chunks' docs now
    live at seg_base + (old_seg % segs_out) under the new chunk id."""
    raw = _load_raw(index_dir)
    if raw is None or raw.get("kind") != "doc_hash":
        return
    picked = set(picks)
    entries = []
    for d in raw["entries"]:
        e = SegMapEntry(**d)
        if e.chunk in picked:
            e.segs = [seg_base + (s % segs_out) for s in e.segs]
            e.chunk = new_chunk
        entries.append(e)
    save_seg_map(index_dir, normalize(entries))


def apply_merge_segments(index_dir: str, target_segments: int) -> None:
    """Mirror merge.merge_segments' rewrite: every seg id -> id % target."""
    raw = _load_raw(index_dir)
    if raw is None or raw.get("kind") != "doc_hash":
        return
    entries = []
    for d in raw["entries"]:
        e = SegMapEntry(**d)
        e.segs = [s % target_segments for s in e.segs]
        e.chunk = 0  # full compaction leaves a single chunk
        entries.append(e)
    save_seg_map(index_dir, normalize(entries))


def route_ids(spark, ids, entries: list[SegMapEntry]):
    """(doc_id) -> (seg_id, doc_id), executor-side. Duplicate (seg, doc)
    pairs are harmless (the scorer uniques the allowed set).

    Single-entry maps (single-chunk builds, fully-compacted indexes — the
    common case) compile to a pure projection over a LITERAL residue table:
    no join, no extra exchange, same plan cost as the pre-seg_map derived
    expression. Multi-entry maps broadcast the tiny entries table and
    non-equi join ranged entries on [lo, hi) (unranged match every id),
    then look the segment up in the per-row residue array."""
    from pyspark.sql import functions as F

    if len(entries) == 1 and entries[0].lo is None:
        e = entries[0]
        table = F.array(*[F.lit(int(s)) for s in e.segs])
        return ids.select(
            F.element_at(
                table, (F.pmod(F.xxhash64("doc_id"), F.lit(e.spc)) + 1).cast("int")
            ).alias("seg_id"),
            "doc_id",
        )
    edf = spark.createDataFrame(
        [(e.lo, e.hi, e.spc, e.segs) for e in entries],
        "lo long, hi long, spc int, segs array<int>",
    )
    cond = F.col("lo").isNull() | (
        (F.col("doc_id") >= F.col("lo")) & (F.col("doc_id") < F.col("hi"))
    )
    return ids.join(F.broadcast(edf), cond).select(
        F.element_at(
            "segs", (F.pmod(F.xxhash64("doc_id"), F.col("spc")) + 1).cast("int")
        ).alias("seg_id"),
        "doc_id",
    )
