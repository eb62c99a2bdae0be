"""Streaming incremental index maintenance (T1 + M3 composed).

A document stream becomes a continuously-growing inverted index: each
micro-batch is built and committed as one chunk (`index/build.build_chunk`),
exactly the unit a resumable batch build uses, so

* retries are idempotent (a re-delivered epoch overwrites its own chunk dir
  and re-commits the same manifest row — exactly-once at the index level
  on top of foreachBatch's at-least-once);
* the index is queryable between batches after `refresh()` (re-finalize:
  global stats + meta), which is the Elasticsearch "refresh" analogue;
* long streams are compacted with index.merge.merge_segments (the
  "too many small segments" problem is the same as Lucene's).

BM25 scores shift as collection stats grow — that is inherent to streaming
relevance, identical to ES behavior.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from elasticsearch_assets_spark.index.build import (
    build_chunk,
    committed_chunks,
    finalize_index,
)
from elasticsearch_assets_spark.index.stats import IndexMeta


class StreamingIndexWriter:
    """foreachBatch handler that appends each micro-batch as an index chunk."""

    def __init__(
        self,
        index_dir: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        segs_per_batch: int = 8,
        nparts: int = 8,
        partitioning: str = "doc_hash",
        positions: bool = False,
        refresh_every: int = 1,
        auto_compact_max_chunks: int | None = None,
        compact_merge_factor: int = 4,
        auto_purge_tombstones: int | None = None,
    ):
        self.index_dir = index_dir
        self.id_col = id_col
        self.text_col = text_col
        self.segs_per_batch = segs_per_batch
        self.nparts = nparts
        self.partitioning = partitioning
        self.positions = positions
        self.refresh_every = max(1, refresh_every)
        # Lucene-style tiered policy: when committed chunks exceed this cap,
        # refresh() merges the `compact_merge_factor` smallest into one
        self.auto_compact_max_chunks = auto_compact_max_chunks
        self.compact_merge_factor = compact_merge_factor
        # deletes-pressure purge (round-4, next to the chunk-count cap):
        # when tombstone cardinality exceeds this at a refresh, run the
        # physical purge compaction — the Lucene deletes_pct_allowed
        # analog for long-lived streams receiving delete traffic
        self.auto_purge_tombstones = auto_purge_tombstones
        os.makedirs(index_dir, exist_ok=True)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        src = batch_df.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            F.col(self.text_col).alias("text"),
        )
        if src.isEmpty():
            return
        build_chunk(
            batch_df.sparkSession, src, self.index_dir,
            chunk_id=int(batch_id),
            seg_base=int(batch_id) * self.segs_per_batch,
            segs_per_chunk=self.segs_per_batch,
            nparts=self.nparts,
            partitioning=self.partitioning,
            positions=self.positions,
        )
        # register the epoch's doc->segment mapping (unranged: chunk
        # membership is arrival-time, not id-range). Idempotent per epoch,
        # like the chunk commit itself; auto-compaction later folds these
        # entries together (seg_map.apply_merge_chunks + normalize).
        from elasticsearch_assets_spark.index.seg_map import (
            SegMapEntry,
            poison_seg_map,
            upsert_chunk_entry,
        )

        if self.partitioning == "doc_hash":
            base = int(batch_id) * self.segs_per_batch
            upsert_chunk_entry(
                self.index_dir,
                SegMapEntry(
                    chunk=int(batch_id),
                    spc=self.segs_per_batch,
                    segs=[base + i for i in range(self.segs_per_batch)],
                ),
            )
        else:
            poison_seg_map(self.index_dir)
        if (int(batch_id) + 1) % self.refresh_every == 0:
            self.refresh(batch_df.sparkSession)

    def refresh(self, spark: SparkSession) -> IndexMeta | None:
        """Re-finalize (global stats + meta) so queries see all committed
        chunks — the ES refresh analogue. With auto_compact_max_chunks set,
        first folds the smallest chunks together when the count exceeds the
        cap (bounded segment growth for long-lived streams). With
        auto_purge_tombstones set, a refresh that finds more undeleted
        tombstones than the cap runs the full physical purge
        (merge_segments(apply_tombstones=True) — distributed above the
        broadcast cap) before the tiered merge, so delete traffic on a
        long-lived stream can never grow the exclusion set unboundedly."""
        if self.auto_purge_tombstones is not None:
            from elasticsearch_assets_spark.index.tombstones import (
                tombstone_count,
            )

            if tombstone_count(self.index_dir) > self.auto_purge_tombstones:
                from elasticsearch_assets_spark.index.merge import (
                    merge_segments,
                )

                merge_segments(
                    spark, self.index_dir, self.segs_per_batch,
                    apply_tombstones=True,
                )
        if self.auto_compact_max_chunks is not None:
            from elasticsearch_assets_spark.index.merge import (
                merge_chunks,
                plan_tiered_merge,
            )

            picks = plan_tiered_merge(
                self.index_dir,
                max_chunks=self.auto_compact_max_chunks,
                merge_factor=self.compact_merge_factor,
            )
            if len(picks) >= 2:
                from elasticsearch_assets_spark.index.build import read_manifest

                lowest = min(
                    (r["chunk_id"] for r in read_manifest(self.index_dir)),
                    default=0,
                )
                merge_chunks(
                    spark, self.index_dir, picks,
                    segs_out=self.segs_per_batch,
                    # negative id space: epoch numbers own the ids >= 0
                    new_chunk_id=min(0, lowest) - 1,
                )
        chunks = committed_chunks(spark, self.index_dir)
        if not chunks:
            return None
        return finalize_index(
            spark, self.index_dir,
            num_segments=self.segs_per_batch * len(chunks),
            num_chunks=len(chunks),
        )


def index_stream(
    stream: DataFrame,
    index_dir: str,
    *,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    segs_per_batch: int = 8,
    trigger_available_now: bool = False,
    processing_time: str | None = None,
):
    """Start the streaming index build; returns the StreamingQuery.

    `checkpoint_dir` gives epoch tracking (Spark replays uncommitted epochs
    after a crash; chunk commits are idempotent so replay is safe)."""
    writer = StreamingIndexWriter(
        index_dir, id_col=id_col, text_col=text_col, segs_per_batch=segs_per_batch
    )
    w = stream.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start(), writer
