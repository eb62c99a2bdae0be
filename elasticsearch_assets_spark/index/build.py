"""Inverted-index builder: corpus DataFrame -> immutable segment files + stats.

From-scratch Spark-first replacement for the indexing path the reference
delegates to Elasticsearch bulk writes
(/root/reference/asset/elasticsearch_bulk/index.js, .../elasticsearch_index_selector/index.js)
per BASELINE.json north_star. Shape of the job:

  corpus --mapInPandas(tokenize)--> (term, doc_id, tf, doclen)      [no shuffle]
         --repartition(P, seg_id)--> doc-bucketed partitions        [ONE shuffle]
         --sortWithinPartitions(seg_id, term, doc_id)
         --mapInPandas(encode)--> (seg_id, term, df, cf, postings…) [no shuffle]
         --write parquet segments

Design notes for 100 TB:

* **Document-bucketed segments** (`seg_id = xxhash64(doc_id) % num_segments`),
  not term-partitioned lists: every query term's postings for a given doc are
  co-located, so multi-term intersection + WAND run segment-locally with no
  query-time shuffle, and head-term postings are spread uniformly across all
  segments — this *is* the salted-repartition skew handling (the salt is the
  doc hash; the reference's analogous trick is secondary key-splitting of hot
  ranges, /root/reference/asset/elasticsearch_reader/slicer.js:323-332).
* **One shuffle total**, keyed by seg_id, with map-side nothing to combine
  (tf already aggregated per doc inside the tokenize pass).
* **Resumable chunks** (R2): the corpus is split into `num_chunks` doc_id
  ranges; each chunk is an independent job writing `segments/chunk=<c>/` +
  a committed manifest row. Re-running skips committed chunks. Chunk ranges
  prune the corpus scan via parquet min/max on doc_id.
* Rank-identity across segment counts: segmentation affects only locality;
  df/N/avgdl are global, scores per doc don't depend on which segment holds it.
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_assets_spark.analysis.tokenizer import TOKENIZER_VERSION, tokenize_series
from elasticsearch_assets_spark.index.codec import CODEC_VERSION, encode_postings_batch
from elasticsearch_assets_spark.index.stats import IndexMeta

POSTINGS_SCHEMA = "term string, doc_id long, tf long, doclen long"
SEGMENT_SCHEMA = (
    "seg_id int, term string, df long, cf long, "
    "doc_gaps binary, tfs_enc binary, doclens_enc binary, "
    "block_last_doc array<long>, block_max_tf array<long>, block_min_dl array<long>, "
    "block_off_gaps array<long>, block_off_tfs array<long>, block_off_dls array<long>"
)
MANIFEST_SCHEMA = (
    "chunk_id int, lo long, hi long, n_docs long, n_postings long, n_terms long, "
    "wall_sec double, docs_per_sec double, status string, committed_at double"
)


def _tokenize_emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id, text) batches -> (term, doc_id, tf, doclen) rows, vectorized."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        toks = tokenize_series(pdf["text"])
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in toks]) \
            if lens.sum() else np.array([], dtype=object)
        flat_docs = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens)
        flat_dls = np.repeat(lens, lens)
        tf = (
            pd.DataFrame({"term": flat_terms, "doc_id": flat_docs, "doclen": flat_dls})
            .groupby(["doc_id", "term"], sort=False)
            .agg(tf=("term", "size"), doclen=("doclen", "first"))
            .reset_index()
        )
        yield tf[["term", "doc_id", "tf", "doclen"]]


def _encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Sorted (seg_id, term, doc_id) batches -> one encoded row per (seg_id, term).

    Carries the trailing (possibly batch-spanning) group between batches.
    """
    carry: pd.DataFrame | None = None

    def flush(pdf: pd.DataFrame, keep_tail: bool):
        nonlocal carry
        keys = (pdf["seg_id"].astype(str) + "\x00" + pdf["term"]).to_numpy()
        boundaries = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [len(pdf)]))
        if keep_tail:
            # hold back the last group — it may continue in the next batch
            carry = pdf.iloc[starts[-1] :]
            pdf = pdf.iloc[: starts[-1]]
            starts, ends = starts[:-1], ends[:-1]
        if starts.size == 0:
            return None
        enc = encode_postings_batch(
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["doclen"].to_numpy(),
            starts,
            ends,
        )
        return pd.DataFrame(
            {
                "seg_id": pdf["seg_id"].to_numpy()[starts],
                "term": pdf["term"].to_numpy()[starts],
                **enc,
            }
        )

    for pdf in batches:
        if len(pdf) == 0:
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        out = flush(pdf, keep_tail=True)
        if out is not None and len(out):
            yield out
    if carry is not None and len(carry):
        out = flush(carry, keep_tail=False)
        if out is not None and len(out):
            yield out


def _chunk_ranges(lo: int, hi: int, num_chunks: int) -> list[tuple[int, int]]:
    """num_chunks contiguous [lo, hi) doc_id ranges covering [lo, hi]."""
    span = hi - lo + 1
    edges = [lo + (span * c) // num_chunks for c in range(num_chunks)] + [hi + 1]
    return [(edges[c], edges[c + 1]) for c in range(num_chunks)]


def committed_chunks(spark: SparkSession, index_dir: str) -> set[int]:
    mpath = os.path.join(index_dir, "manifest")
    try:
        m = spark.read.parquet(mpath)
    except Exception:
        return set()
    return {
        r["chunk_id"]
        for r in m.where(F.col("status") == "committed").select("chunk_id").collect()
    }


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_segments: int = 32,
    num_chunks: int = 1,
    shuffle_partitions: int | None = None,
    resume: bool = False,
) -> IndexMeta:
    """Build (or resume) the inverted index for `corpus` into `index_dir`."""
    os.makedirs(index_dir, exist_ok=True)
    src = corpus.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    bounds = src.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        raise ValueError("empty corpus")
    ranges = _chunk_ranges(int(lo), int(hi), num_chunks)
    segs_per_chunk = max(1, num_segments // num_chunks)
    nparts = shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if not resume:
        import shutil

        for sub in ("manifest", "segments", "stats"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    done = committed_chunks(spark, index_dir) if resume else set()

    for c, (clo, chi) in enumerate(ranges):
        if c in done:
            continue
        t0 = time.monotonic()
        # single-chunk builds skip the range filter so count() stays
        # parquet-metadata-only and the scan reads no predicate
        chunk_src = (
            src
            if num_chunks == 1
            else src.where((F.col("doc_id") >= clo) & (F.col("doc_id") < chi))
        )
        postings = chunk_src.mapInPandas(_tokenize_emit, schema=POSTINGS_SCHEMA)
        seg_base = c * segs_per_chunk
        postings = postings.withColumn(
            "seg_id",
            (F.lit(seg_base) + F.pmod(F.xxhash64("doc_id"), F.lit(segs_per_chunk)))
            .cast("int"),
        )
        encoded = (
            postings.repartition(min(nparts, segs_per_chunk), "seg_id")
            .sortWithinPartitions("seg_id", "term", "doc_id")
            .mapInPandas(_encode_partition, schema=SEGMENT_SCHEMA)
        )
        seg_path = os.path.join(index_dir, "segments", f"chunk={c}")
        encoded.write.mode("overwrite").parquet(seg_path)

        seg_df = spark.read.parquet(seg_path)
        agg = seg_df.agg(
            F.sum("cf").alias("toks"),
            F.count("*").alias("lists"),
            F.count_distinct("term").alias("terms"),
        ).collect()[0]
        n_docs = chunk_src.count()
        wall = time.monotonic() - t0
        row = (
            c, int(clo), int(chi), int(n_docs), int(agg["lists"] or 0),
            int(agg["terms"] or 0), wall, (n_docs / wall if wall > 0 else 0.0),
            "committed", time.time(),
        )
        # checkpoint after every chunk so a kill mid-build loses ≤1 chunk (R2)
        spark.createDataFrame([row], schema=MANIFEST_SCHEMA).write.mode("append").parquet(
            os.path.join(index_dir, "manifest")
        )

    return finalize_index(spark, index_dir, num_segments, num_chunks)


def finalize_index(
    spark: SparkSession, index_dir: str, num_segments: int, num_chunks: int
) -> IndexMeta:
    """Global term stats + meta.json from committed segments + manifest."""
    seg_df = spark.read.parquet(os.path.join(index_dir, "segments"))
    stats = seg_df.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )
    stats.write.mode("overwrite").parquet(os.path.join(index_dir, "stats"))
    m = spark.read.parquet(os.path.join(index_dir, "manifest"))
    n_docs = m.where(F.col("status") == "committed").agg(F.sum("n_docs")).collect()[0][0]
    total = spark.read.parquet(os.path.join(index_dir, "stats")).agg(F.sum("cf")).collect()[0][0]
    meta = IndexMeta(
        n_docs=int(n_docs),
        total_tokens=int(total),
        avgdl=float(total) / float(n_docs),
        num_segments=num_segments,
        num_chunks=num_chunks,
        tokenizer_version=TOKENIZER_VERSION,
        codec_version=CODEC_VERSION,
    )
    meta.save(index_dir)
    return meta
