"""Segment merge / compaction (SURVEY.md §2.8, M3).

Chunked/incremental builds leave many small segments (one set per chunk —
the Lucene "many small flushes" shape); queries then pay per-segment
overhead and tiny posting lists compress worse. `merge_segments` compacts an
index to `target_segments` doc-buckets:

  segments --map: new_seg = old_seg % target--> repartition(new_seg)
           --applyInPandas: decode + k-way merge by (term, doc) + re-encode
           --> compacted segment rows

Only ENCODED bytes shuffle (the compressed posting lists, ~10x smaller than
raw postings); documents are never touched. Doc-disjointness of the source
segments means merging is pure list concatenation + sort — tf/doclen values
are unchanged, so the merged index is bit-identical under search (tested).
Stats and meta are preserved; the manifest gains a `compacted` marker row.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from elasticsearch_assets_spark.index.build import SEGMENT_SCHEMA, read_manifest
from elasticsearch_assets_spark.index.codec import decode_postings, encode_postings_batch
from elasticsearch_assets_spark.index.stats import load_meta


def _merge_partition(
    batches: Iterator[pd.DataFrame], excluded: np.ndarray | None = None
) -> Iterator[pd.DataFrame]:
    """Rows of (new_seg_id, term, encoded...) -> one merged row per
    (new_seg_id, term). Decodes every input list, drops tombstoned docs,
    concatenates, sorts by (seg, term, doc) in one vectorized pass,
    re-encodes in one batch call."""
    rows = [pdf for pdf in batches if len(pdf)]
    if not rows:
        return
    pdf = pd.concat(rows, ignore_index=True)
    del rows
    docs_l, tfs_l, dls_l = [], [], []
    counts = np.empty(len(pdf), dtype=np.int64)
    for i, (g, t, d) in enumerate(
        zip(pdf["doc_gaps"], pdf["tfs_enc"], pdf["doclens_enc"])
    ):
        doc_ids, tfs, dls = decode_postings(bytes(g), bytes(t), bytes(d))
        if excluded is not None and excluded.size:
            keep = ~np.isin(doc_ids, excluded)
            doc_ids, tfs, dls = doc_ids[keep], tfs[keep], dls[keep]
        counts[i] = doc_ids.size
        docs_l.append(doc_ids)
        tfs_l.append(tfs)
        dls_l.append(dls)
    if not any(c for c in counts):
        return
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    dls = np.concatenate(dls_l)
    del docs_l, tfs_l, dls_l
    segs = np.repeat(pdf["seg_id"].to_numpy(dtype=np.int64), counts)
    codes, uniques = pd.factorize(pdf["term"], sort=False)
    term_codes = np.repeat(codes.astype(np.int64), counts)
    order = np.lexsort((docs, term_codes, segs))
    segs, term_codes, docs = segs[order], term_codes[order], docs[order]
    tfs, dls = tfs[order], dls[order]
    change = (
        np.flatnonzero((segs[1:] != segs[:-1]) | (term_codes[1:] != term_codes[:-1])) + 1
    )
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [segs.size]))
    enc = encode_postings_batch(docs, tfs, dls, starts, ends)
    out = pd.DataFrame(
        {
            "seg_id": segs[starts].astype(np.int32),
            "term": np.asarray(uniques, dtype=object)[term_codes[starts]],
            **enc,
        }
    )
    yield out.sort_values("term", kind="stable", ignore_index=True)


def count_distinct_docs(spark: SparkSession, index_dir: str) -> int:
    """Exact live-doc count: decode only the docID streams, unique per
    segment (segments are doc-disjoint), sum. Used after a tombstone-
    applying compaction to correct collection stats."""
    from elasticsearch_assets_spark.index.codec import decode_doc_ids

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, set] = {}
        for pdf in batches:
            for seg, g in zip(pdf["seg_id"], pdf["doc_gaps"]):
                ids = decode_doc_ids(bytes(g))
                seen.setdefault(int(seg), set()).update(ids.tolist())
        yield pd.DataFrame({"n": [sum(len(s) for s in seen.values())]})

    seg = spark.read.parquet(os.path.join(index_dir, "segments"))
    # repartition by seg_id so each task holds whole segments
    counts = seg.select("seg_id", "doc_gaps").repartition("seg_id").mapInPandas(
        fn, "n long"
    )
    return int(counts.agg(F.sum("n")).collect()[0][0] or 0)


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    target_segments: int,
    *,
    shuffle_partitions: int | None = None,
    apply_tombstones: bool = True,
) -> None:
    """Compact `index_dir` in place to `target_segments` segments.

    Doc-disjoint inputs guarantee no (term, doc) collisions. With
    `apply_tombstones` (default), tombstoned docs are physically purged,
    the tombstone files cleared, and stats/meta re-finalized with the
    corrected doc count — the Lucene merge contract. The old segment tree
    is atomically swapped (write to segments.tmp, rename) so a crash
    mid-merge leaves the original index intact.
    """
    from elasticsearch_assets_spark.index.build import (
        _commit_manifest_row,
        finalize_index,
    )
    from elasticsearch_assets_spark.index.tombstones import (
        clear_tombstones,
        load_tombstones,
    )

    seg_path = os.path.join(index_dir, "segments")
    tmp_path = os.path.join(index_dir, "segments.tmp")
    nparts = shuffle_partitions or min(
        target_segments, int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    excluded = load_tombstones(index_dir) if apply_tombstones else None
    if excluded is not None and excluded.size == 0:
        excluded = None
    src = spark.read.parquet(seg_path).withColumn(
        "seg_id", F.pmod(F.col("seg_id"), F.lit(target_segments)).cast("int")
    )
    merged = src.repartition(nparts, "seg_id").mapInPandas(
        lambda it: _merge_partition(it, excluded), schema=SEGMENT_SCHEMA
    )
    merged.write.mode("overwrite").parquet(os.path.join(tmp_path, "chunk=0"))

    old = os.path.join(index_dir, "segments.old")
    shutil.rmtree(old, ignore_errors=True)
    os.rename(seg_path, old)
    os.rename(tmp_path, seg_path)
    shutil.rmtree(old)

    meta = load_meta(index_dir)
    meta.num_segments = target_segments
    meta.num_chunks = 1
    meta.save(index_dir)
    # lineage: record the compaction in the manifest
    prior = read_manifest(index_dir)
    row = {
        "chunk_id": max((r["chunk_id"] for r in prior), default=-1) + 1,
        "lo": 0,
        "hi": 0,
        "n_docs": 0,
        "n_postings": 0,
        "n_terms": 0,
        "wall_sec": 0.0,
        "docs_per_sec": 0.0,
        "status": f"compacted:{target_segments}",
        "committed_at": time.time(),
    }
    if excluded is not None:
        # purge happened: correct the manifest doc total so re-finalized
        # stats (df, N, avgdl) reflect only live docs, then drop tombstones
        true_docs = count_distinct_docs(spark, index_dir)
        manifest_sum = sum(
            r["n_docs"] for r in prior if r["status"] == "committed"
        )
        row["n_docs"] = true_docs - manifest_sum  # corrective delta
        row["status"] = f"compacted:{target_segments}:purged:{excluded.size}"
    _commit_manifest_row(index_dir, row)
    if excluded is not None:
        clear_tombstones(index_dir)
        finalize_index(spark, index_dir, target_segments, 1)
