"""ES ``_shrink`` / ``_split`` (index resharding) on the engine's layout.

Reference behavior: Elasticsearch reshapes an index's shard topology
without re-analyzing any document —

* ``_shrink`` recombines source shards into fewer target shards by
  re-homing the existing Lucene segments;
* ``_split`` hard-links every source segment into each target shard and
  marks the documents that don't route there as deleted; routing is
  ``hash(_id) % n_targets``, and scores keep counting the masked docs
  until a merge purges them (the ES/Lucene deleted-docs contract).

Both are re-expressed as metadata + columnar-segment operations here —
no tokenization, no posting re-encode:

* ``shrink_shards`` reads each source's segment TABLE once, offsets its
  seg_ids (so doc-disjoint posting rows can never collide under the
  scorer's dict-by-term — the resume-collision hazard ADVICE.md flagged),
  writes them as one chunk per source in the target, unions tombstones,
  and re-finalizes. Collection stats are recomputed from the union, so
  BM25 over the shrunk index is RANK-IDENTICAL to a monolithic index
  over the union corpus (the engine's global-stats invariant; tested).
* ``split_index`` clones the committed files per target (hard links, the
  PIT/snapshot machinery) and tombstones the non-routed docs. Routing
  uses the cross-engine 60-bit md5 hash (operators/texthash.py), so an
  oracle can reproduce the routed subset verbatim. Per-target results
  equal the source ranking restricted to the routed docs under GLOBAL
  stats — exactly ES before the post-split merge; a later
  ``merge_segments(apply_tombstones=True)`` purges and tightens stats,
  exactly ES after it.

Scale note (100 TB): shrink moves segment tables through one
read→offset→write pass per source (no shuffle — seg_id arithmetic is a
projection); split's clone is O(files) inode ops per target plus one
routing scan. The routing ids pass through the driver only as the
tombstone manifest (bounded by corpus id count; on an object-store
deployment write them as a tombstone parquet instead — same contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_assets_spark.index.build import (
    _commit_manifest_row,
    finalize_index,
    read_manifest,
)
from elasticsearch_assets_spark.index.seg_map import (
    SegMapEntry,
    load_seg_map,
    save_seg_map,
)
from elasticsearch_assets_spark.index.stats import load_meta
from elasticsearch_assets_spark.index.tombstones import (
    add_tombstones,
    load_tombstones,
)


def shrink_shards(
    spark: SparkSession, src_dirs: list[str], out_dir: str
) -> None:
    """ES _shrink: recombine `src_dirs` (doc-disjoint shard indexes) into
    ONE index at `out_dir`. Source i's segments become chunk i with
    seg_id += offset_i; stats/meta re-finalize from the union."""
    if len(src_dirs) < 2:
        raise ValueError("shrink needs at least two source shards")
    if os.path.exists(os.path.join(out_dir, "meta.json")):
        raise ValueError(f"target index already exists: {out_dir!r}")
    metas = [load_meta(d) for d in src_dirs]
    if len({(m.k1, m.b) for m in metas}) != 1:
        raise ValueError("source shards disagree on BM25 params")
    if len({m.tokenizer_version for m in metas}) != 1:
        raise ValueError("source shards disagree on tokenizer version")
    if len({m.positions for m in metas}) != 1:
        raise ValueError(
            "source shards disagree on positional postings "
            "(rebuild the non-positional shard with positions=True)"
        )
    offsets = []
    acc = 0
    for m in metas:
        offsets.append(acc)
        acc += m.num_segments

    entries: "list[SegMapEntry] | None" = []
    for i, (src, m) in enumerate(zip(src_dirs, metas)):
        seg = spark.read.parquet(os.path.join(src, "segments"))
        seg = seg.drop("chunk").withColumn(
            "seg_id", (F.col("seg_id") + F.lit(offsets[i])).cast("int")
        )
        seg.write.mode("errorifexists").parquet(
            os.path.join(out_dir, "segments", f"chunk={i}")
        )
        src_rows = [
            r for r in read_manifest(src)
            if r["status"] == "committed" or r["status"].startswith("compacted")
        ]
        _commit_manifest_row(out_dir, {
            "chunk_id": i,
            "lo": min((r["lo"] for r in src_rows), default=0),
            "hi": max((r["hi"] for r in src_rows), default=0),
            "n_docs": sum(r["n_docs"] for r in src_rows),
            "n_postings": sum(r["n_postings"] for r in src_rows),
            "n_terms": 0,  # term sets overlap across source chunks
            "wall_sec": 0.0,
            "docs_per_sec": 0.0,
            "status": "committed",
            "committed_at": 0.0,
        })
        # the source seg_maps transform (segs += offset, chunk renumber
        # keeps entries unique); any source without one poisons the whole
        # target map (routing would silently miss that source's docs)
        if entries is not None:
            src_map = load_seg_map(src)
            if src_map is None:
                entries = None
            else:
                for e in src_map:
                    entries.append(SegMapEntry(
                        chunk=len(entries),
                        spc=e.spc,
                        segs=[s + offsets[i] for s in e.segs],
                        lo=e.lo,
                        hi=e.hi,
                    ))
    dead = set()
    for src in src_dirs:
        dead.update(load_tombstones(src).tolist())
    add_tombstones(out_dir, dead)
    if entries is not None:
        save_seg_map(out_dir, entries)
    finalize_index(
        spark, out_dir, num_segments=acc, num_chunks=len(src_dirs),
        partitioning="opaque",
    )


def split_routing_sql(id_expr: str, n_targets: int, target: int) -> str:
    """DuckDB-verbatim routing predicate for target t of n (split docs)."""
    from elasticsearch_assets_spark.operators.texthash import hash60_sql

    return (
        f"({hash60_sql(f'CAST({id_expr} AS VARCHAR)')} % {n_targets})"
        f" = {target}"
    )


def split_routing_col(id_col, n_targets: int, target: int):
    """Spark twin of split_routing_sql (bit-identical hash)."""
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    return (hash60_expr(id_col.cast("string")) % n_targets) == target


def split_index(
    spark: SparkSession,
    src_dir: str,
    out_dirs: list[str],
    doc_ids: DataFrame | None = None,
    id_col: str = "doc_id",
) -> None:
    """ES _split: clone the committed index into each target (hard links)
    and tombstone the docs that don't route there (hash60(_id) % n).
    `doc_ids` supplies the id universe (any DataFrame with `id_col`,
    e.g. the corpus); when None it is decoded from the index's own
    postings (one segment scan)."""
    from elasticsearch_assets_spark.query.engine import (
        InvertedIndex,
        clone_index_files,
    )

    n = len(out_dirs)
    if n < 2:
        raise ValueError("split needs at least two targets")
    if doc_ids is None:
        idx = InvertedIndex(spark, src_dir)
        doc_ids = idx.all_doc_ids() if hasattr(idx, "all_doc_ids") else None
        if doc_ids is None:
            raise ValueError("pass doc_ids (a DataFrame with the id column)")
    ids = doc_ids.select(F.col(id_col)).distinct()
    for t, d in enumerate(out_dirs):
        if os.path.exists(os.path.join(d, "meta.json")):
            raise ValueError(f"target index already exists: {d!r}")
        clone_index_files(src_dir, d)
        masked = ids.where(
            ~split_routing_col(F.col(id_col), n, t)
        ).collect()
        add_tombstones(d, (r[id_col] for r in masked))


def ilm_warm_action(
    spark: SparkSession,
    src_dirs: "list[str]",
    out_dir: str,
    segs_out: int = 4,
) -> None:
    """ES ILM warm phase for a read-mostly index: shrink (recombine the
    shards, shrink_shards) then forcemerge (tiered merge with tombstone
    purge — index/merge.py). After the purge, collection stats tighten
    to the survivors, so the warmed index ranks exactly like a fresh
    build over the live docs (the deleted-docs contract's other side;
    tested + oracle-checked). Both steps are the metadata/segment-table
    operations documented on their functions — no re-tokenization."""
    from elasticsearch_assets_spark.index.merge import merge_segments

    shrink_shards(spark, src_dirs, out_dir)
    merge_segments(spark, out_dir, segs_out, apply_tombstones=True)
