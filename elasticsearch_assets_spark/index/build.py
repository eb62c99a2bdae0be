"""Inverted-index builder: corpus DataFrame -> immutable segment files + stats.

From-scratch Spark-first replacement for the indexing path the reference
delegates to Elasticsearch bulk writes
(/root/reference/asset/elasticsearch_bulk/index.js, .../elasticsearch_index_selector/index.js)
per BASELINE.json north_star. Shape of the job:

  corpus --repartition(P, seg_id)--> doc-bucketed partitions   [ONE shuffle,
                                                                of DOCUMENTS]
         --mapInPandas(tokenize+aggregate+sort+encode)--> segment rows
         --write parquet segments

Design notes for 100 TB:

* **Shuffle documents, not postings.** Tokenizing AFTER the doc shuffle means
  the one shuffle moves ~|corpus text| bytes instead of the 3-5x larger
  (term, doc, tf, doclen) row stream, and the JVM never sorts the posting
  stream at all — each partition builds its posting lists in one vectorized
  numpy pass (factorize -> lexsort -> reduceat -> varint), exactly a Lucene
  segment flush. Per-partition memory = its docs' postings; size
  num_segments so a partition's postings fit an executor (knob below).
* **Document-bucketed segments** (`seg_id = xxhash64(doc_id) % num_segments`),
  not term-partitioned lists: every query term's postings for a given doc are
  co-located, so multi-term intersection + WAND run segment-locally with no
  query-time shuffle, and head-term postings are spread uniformly across all
  segments — this *is* the salted-repartition skew handling (the salt is the
  doc hash; the reference's analogous trick is secondary key-splitting of hot
  ranges, /root/reference/asset/elasticsearch_reader/slicer.js:323-332).
  num_segments defaults to 4x the shuffle partitions so bucket->partition
  hashing stays balanced (max/mean load ~1.3 instead of ~2 at 1:1).
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

from elasticsearch_assets_spark.analysis.tokenizer import (
    TOKENIZER_VERSION,
    encode_tokens,
    tokenize_flat,
)
from elasticsearch_assets_spark.index.codec import CODEC_VERSION, encode_postings_batch
from elasticsearch_assets_spark.index.stats import IndexMeta

SEGMENT_SCHEMA = (
    "seg_id int, term string, df long, cf long, "
    "doc_gaps binary, tfs_enc binary, doclens_enc binary, "
    "block_last_doc array<long>, block_max_tf array<long>, block_min_dl array<long>, "
    "block_off_gaps array<long>, block_off_tfs array<long>, block_off_dls array<long>"
)
# positional indexes (build_index(positions=True)) add one binary column:
# per-posting delta-encoded within-doc term positions (codec.
# encode_positions_batch). Nullable and pruned away by every non-phrase
# query's column selection — zero cost unless a phrase query reads it.
SEGMENT_SCHEMA_POS = SEGMENT_SCHEMA + ", pos_enc binary"
# manifest rows are driver-side JSON-line files (one per chunk commit):
# {chunk_id, lo, hi, n_docs, n_postings, n_terms, wall_sec, docs_per_sec,
#  status, committed_at} — metadata writes must not cost a Spark job each
MANIFEST_FIELDS = (
    "chunk_id", "lo", "hi", "n_docs", "n_postings", "n_terms",
    "wall_sec", "docs_per_sec", "status", "committed_at",
)


def _tokenize_batch(pdf: pd.DataFrame, positions: bool = False):
    """One (doc_id, text, seg_id) batch -> (uniques obj[], codes i64[],
    docs i64[], tfs i64[], dls i64[], segs i64[][, pos i64[]]) with tf
    pre-aggregated per (doc, term). Tokenization + term coding stay in
    Arrow/RE2 kernels (tokenize_flat + dictionary_encode, ~2x the
    pandas-regex path); term strings leave this function only as the small
    per-batch vocabulary. With `positions`, the extra return value is the
    flat stream of within-doc token positions, one increasing run per
    (doc, term) posting (a stable argsort replaces the np.unique
    aggregation so occurrence order survives)."""
    flat, lens = tokenize_flat(pdf["text"])
    if lens.sum() == 0:
        e = np.array([], dtype=np.int64)
        base = (np.array([], dtype=object), e, e, e, e, e)
        return base + (e,) if positions else base
    codes, uniques = encode_tokens(flat)
    flat_docidx = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
    key = flat_docidx * len(uniques) + codes
    if not positions:
        uk, counts = np.unique(key, return_counts=True)
        docidx = uk // len(uniques)
        code = (uk % len(uniques)).astype(np.int64)
        return (
            np.asarray(uniques, dtype=object),
            code,
            pdf["doc_id"].to_numpy(dtype=np.int64)[docidx],
            counts.astype(np.int64),
            lens[docidx],
            pdf["seg_id"].to_numpy(dtype=np.int64)[docidx],
        )
    doc_offs = np.zeros(len(pdf), dtype=np.int64)
    np.cumsum(lens[:-1], out=doc_offs[1:])
    pos_in_doc = np.arange(lens.sum(), dtype=np.int64) - np.repeat(doc_offs, lens)
    order = np.argsort(key, kind="stable")  # stable: positions stay increasing
    skey = key[order]
    change = np.flatnonzero(skey[1:] != skey[:-1]) + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [skey.size])))
    gk = skey[starts]
    docidx = gk // len(uniques)
    code = (gk % len(uniques)).astype(np.int64)
    return (
        np.asarray(uniques, dtype=object),
        code,
        pdf["doc_id"].to_numpy(dtype=np.int64)[docidx],
        counts.astype(np.int64),
        lens[docidx],
        pdf["seg_id"].to_numpy(dtype=np.int64)[docidx],
        pos_in_doc[order],
    )


def _segment_writer(out_batch_rows: int = 65_536, positions: bool = False):
    """mapInPandas fn: doc-bucketed (doc_id, text, seg_id) partition ->
    encoded segment rows. Accumulates the partition's aggregated postings,
    then ONE vocab-merge + lexsort + batch-encode — the Lucene-flush shape,
    no JVM sort, no posting-row shuffle. The partition-level merge touches
    strings only at vocabulary size: per-batch vocabs are re-factorized and
    per-posting codes remapped through an int lookup (object-array passes
    over the full posting stream are what saturate memory bandwidth at high
    core counts)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab_l, codes_l, docs_l, tfs_l, dls_l, segs_l = [], [], [], [], [], []
        pos_l: list[np.ndarray] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = _tokenize_batch(pdf, positions=positions)
            u, c, d, tf, dl, sg = out[:6]
            if c.size:
                vocab_l.append(u)
                codes_l.append(c)
                docs_l.append(d)
                tfs_l.append(tf)
                dls_l.append(dl)
                segs_l.append(sg)
                if positions:
                    pos_l.append(out[6])
        if not codes_l:
            return
        # merge per-batch vocabularies (small) -> global codes per batch
        all_vocab = np.concatenate(vocab_l)
        gcodes_of_vocab, uniques = pd.factorize(all_vocab, sort=False)
        offs = np.concatenate(([0], np.cumsum([v.size for v in vocab_l])[:-1]))
        codes = np.concatenate(
            [gcodes_of_vocab[off : off + v.size][c] for off, v, c in zip(offs, vocab_l, codes_l)]
        )
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        segs = np.concatenate(segs_l)
        flat_pos = np.concatenate(pos_l) if positions else None
        del vocab_l, codes_l, docs_l, tfs_l, dls_l, segs_l, pos_l, all_vocab
        order = np.lexsort((docs, codes, segs))
        if positions:
            # positions are ragged runs of tfs[i] per posting — carry them
            # through the posting sort with one vectorized gather
            from elasticsearch_assets_spark.index.codec import ragged_gather

            flat_pos = ragged_gather(flat_pos, tfs, order)
        segs, codes, docs = segs[order], codes[order], docs[order]
        tfs, dls = tfs[order], dls[order]
        change = np.flatnonzero((segs[1:] != segs[:-1]) | (codes[1:] != codes[:-1])) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [segs.size]))
        enc = encode_postings_batch(docs, tfs, dls, starts, ends)
        if positions:
            from elasticsearch_assets_spark.index.codec import (
                encode_positions_batch,
            )

            enc["pos_enc"] = encode_positions_batch(flat_pos, tfs, starts, ends)
        out = pd.DataFrame(
            {
                "seg_id": segs[starts].astype(np.int32),
                "term": np.asarray(uniques, dtype=object)[codes[starts]],
                **enc,
            }
        )
        # emit rows term-sorted so parquet row groups carry tight term
        # min/max ranges -> query-time `term IN (...)` prunes row groups
        out = out.sort_values("term", kind="stable", ignore_index=True)
        for lo in range(0, len(out), out_batch_rows):
            yield out.iloc[lo : lo + out_batch_rows]

    return fn


def _chunk_ranges(lo: int, hi: int, num_chunks: int) -> list[tuple[int, int]]:
    """num_chunks contiguous [lo, hi) doc_id ranges covering [lo, hi]."""
    span = hi - lo + 1
    edges = [lo + (span * c) // num_chunks for c in range(num_chunks)] + [hi + 1]
    return [(edges[c], edges[c + 1]) for c in range(num_chunks)]


def read_manifest(index_dir: str) -> list[dict]:
    import glob
    import json

    rows = []
    for p in sorted(glob.glob(os.path.join(index_dir, "manifest", "chunk-*.json"))):
        with open(p) as fh:
            rows.append(json.load(fh))
    return rows


def _commit_manifest_row(index_dir: str, row: dict) -> None:
    import json

    mdir = os.path.join(index_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"chunk-{row['chunk_id']:05d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(row, fh)
    os.replace(tmp, path)  # atomic commit marker (R2)


def committed_chunks(spark: SparkSession, index_dir: str) -> set[int]:
    return {
        r["chunk_id"] for r in read_manifest(index_dir) if r["status"] == "committed"
    }


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_segments: int | None = None,
    num_chunks: int = 1,
    shuffle_partitions: int | None = None,
    resume: bool = False,
    partitioning: str = "doc_hash",
    positions: bool = False,
) -> IndexMeta:
    """Build (or resume) the inverted index for `corpus` into `index_dir`.

    `partitioning`:
      * "doc_hash" — one shuffle keyed by seg_id = xxhash64(doc_id) %
        num_segments: deterministic doc->segment assignment independent of
        input layout. The shuffle is RANGE-partitioned on seg_id (exact
        ~equal segment count per partition — hash placement of S buckets
        into P partitions is balls-into-bins, measured 3x task skew) and
        defaults to 2x the cluster parallelism (two task waves absorb
        residual stragglers; measured +70% build throughput at local[32]
        vs one-task-per-core hash placement).
      * "input" — ZERO shuffle: each input split becomes one segment
        (seg_id = spark_partition_id), the Lucene-flush shape. Right when
        the corpus is already well-partitioned (the usual 100 TB case —
        a shuffle of the whole corpus text is the single largest cost).
    `num_segments` defaults to 4x the cluster parallelism. A partition
    holds whole segments; size them so one partition's postings fit in an
    executor's memory.
    """
    os.makedirs(index_dir, exist_ok=True)
    src = corpus.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    par = spark.sparkContext.defaultParallelism
    nparts = shuffle_partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions")), 2 * par
    )
    if num_segments is None:
        num_segments = 4 * par
    # the doc->segment mapping (num_segments/num_chunks/partitioning) is
    # pinned at first build: a RESUME in a different session (different
    # parallelism => different defaults) MUST reuse the original values, or
    # already-committed chunks and new chunks would carry incompatible seg
    # mappings under one doc_hash meta — silently wrong cogroup routing.
    params_path = os.path.join(index_dir, "build_params.json")
    if resume:
        if os.path.exists(params_path):
            import json

            with open(params_path) as fh:
                saved = json.load(fh)
            num_segments = saved["num_segments"]
            num_chunks = saved["num_chunks"]
            partitioning = saved["partitioning"]
            positions = saved.get("positions", False)
        elif committed_chunks(spark, index_dir):
            # chunks committed by a build that predates param pinning: the
            # original segs_per_chunk is unrecoverable, and recomputing it
            # from THIS session's parallelism can collide seg_id ranges
            # across chunks (two doc-disjoint posting rows sharing a seg_id
            # => silently wrong BM25) — refuse rather than guess.
            raise ValueError(
                f"cannot resume {index_dir!r}: committed chunks exist but "
                "build_params.json is missing (index predates param "
                "pinning). Rebuild with resume=False, or restore the "
                "original num_segments/num_chunks/partitioning into "
                "build_params.json."
            )
    segs_per_chunk = max(1, num_segments // num_chunks)
    if num_chunks > 1:
        bounds = src.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        if lo is None:
            raise ValueError("empty corpus")
        ranges = _chunk_ranges(int(lo), int(hi), num_chunks)
    else:
        ranges = [(None, None)]
    if not resume:
        import shutil

        for sub in ("manifest", "segments", "stats"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    done = committed_chunks(spark, index_dir) if resume else set()
    import json as _json

    tmp = params_path + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(
            {
                "num_segments": num_segments,
                "num_chunks": num_chunks,
                "partitioning": partitioning,
                "positions": positions,
            },
            fh,
        )
    os.replace(tmp, params_path)

    for c, (clo, chi) in enumerate(ranges):
        if c in done:
            continue
        # single-chunk builds skip the range filter so count() stays
        # parquet-metadata-only and the scan reads no predicate
        chunk_src = (
            src
            if num_chunks == 1
            else src.where((F.col("doc_id") >= clo) & (F.col("doc_id") < chi))
        )
        build_chunk(
            spark, chunk_src, index_dir,
            chunk_id=c,
            seg_base=c * segs_per_chunk,
            segs_per_chunk=segs_per_chunk,
            nparts=nparts,
            partitioning=partitioning,
            positions=positions,
            lo=clo,
            hi=chi,
            # single-chunk builds: finalize (next) derives the same totals
            # from the stats table — skip the extra full-segment-scan job
            collect_metrics=num_chunks > 1,
        )

    # durable doc->segment mapping (index/seg_map.py): the full entry set is
    # (re)written every build — correct under resume, where skipped chunks
    # still need their entries. Compactions TRANSFORM this file instead of
    # invalidating it, keeping the cogrouped filtered-search path alive.
    from elasticsearch_assets_spark.index.seg_map import (
        SegMapEntry,
        poison_seg_map,
        save_seg_map,
    )

    if partitioning == "doc_hash":
        save_seg_map(
            index_dir,
            [
                SegMapEntry(
                    chunk=c,
                    spc=segs_per_chunk,
                    segs=[c * segs_per_chunk + i for i in range(segs_per_chunk)],
                    lo=clo,
                    hi=chi,
                )
                for c, (clo, chi) in enumerate(ranges)
            ],
        )
    else:
        poison_seg_map(index_dir)  # seg = input split id, not f(doc_id)

    return finalize_index(
        spark, index_dir, num_segments, num_chunks,
        partitioning=partitioning if partitioning == "doc_hash" else "opaque",
        segs_per_chunk=segs_per_chunk,
    )


def build_chunk(
    spark: SparkSession,
    chunk_src: DataFrame,
    index_dir: str,
    *,
    chunk_id: int,
    seg_base: int,
    segs_per_chunk: int,
    nparts: int,
    partitioning: str = "doc_hash",
    lo: int | None = None,
    hi: int | None = None,
    collect_metrics: bool = True,
    positions: bool = False,
) -> dict:
    """Build + atomically commit ONE chunk (`segments/chunk=<id>/` + manifest
    row). Idempotent: rerunning overwrites the same chunk dir and re-commits
    — the unit of work for resumable batch builds AND streaming micro-batch
    indexing (each foreachBatch epoch is one chunk). `chunk_src` must have
    (doc_id, text) columns. `positions` adds the positional stream
    (SEGMENT_SCHEMA_POS) for index-assisted phrase queries."""
    t0 = time.monotonic()
    if partitioning == "input":
        # seg = input split; no shuffle at all. The offset keeps chunk
        # segment ids disjoint (ids are labels, uniqueness is enough).
        bucketed = chunk_src.withColumn(
            "seg_id",
            (F.lit(seg_base) + F.spark_partition_id()).cast("int"),
        )
    else:
        # range partitioning on the (uniform-integer) seg_id gives each task
        # an exact ~equal share of segments; hash placement is balls-into-
        # bins (some tasks 2 segments, some 6 → 3x wall skew, measured).
        # Equal seg_id values always land in one partition, so segments
        # never split across writers. The range boundaries come from a
        # sampling pass that reads only doc_id (column-pruned), negligible
        # next to the text shuffle.
        bucketed = chunk_src.withColumn(
            "seg_id",
            (F.lit(seg_base) + F.pmod(F.xxhash64("doc_id"), F.lit(segs_per_chunk)))
            .cast("int"),
        ).repartitionByRange(min(nparts, segs_per_chunk), "seg_id")
    encoded = bucketed.mapInPandas(
        _segment_writer(positions=positions),
        schema=SEGMENT_SCHEMA_POS if positions else SEGMENT_SCHEMA,
    )
    seg_path = os.path.join(index_dir, "segments", f"chunk={chunk_id}")
    encoded.write.mode("overwrite").parquet(seg_path)

    # one combined metadata job per chunk: postings/terms from the just-
    # written segment footers + doc count (metadata-only when unfiltered).
    # Skipped (zeros) when the caller derives the totals from the global
    # stats pass instead (single-chunk builds).
    if collect_metrics:
        seg_df = spark.read.parquet(seg_path)
        agg = seg_df.agg(
            F.count("*").alias("lists"),
            F.count_distinct("term").alias("terms"),
        ).collect()[0]
    else:
        agg = {"lists": 0, "terms": 0}
    n_docs = chunk_src.count()
    wall = time.monotonic() - t0
    row = {
        "chunk_id": chunk_id,
        "lo": int(lo if lo is not None else 0),
        "hi": int(hi if hi is not None else 0),
        "n_docs": int(n_docs),
        "n_postings": int(agg["lists"] or 0),
        "n_terms": int(agg["terms"] or 0),
        "wall_sec": wall,
        "docs_per_sec": (n_docs / wall if wall > 0 else 0.0),
        "status": "committed",
        "committed_at": time.time(),
    }
    # checkpoint after every chunk so a kill mid-build loses ≤1 chunk (R2)
    _commit_manifest_row(index_dir, row)
    return row


def finalize_index(
    spark: SparkSession,
    index_dir: str,
    num_segments: int,
    num_chunks: int,
    *,
    partitioning: str = "opaque",
    segs_per_chunk: int = 0,
) -> IndexMeta:
    """Global term stats + meta.json from committed segments + manifest.
    Positional-ness is DETECTED from the segment schema (pos_enc column) so
    every finalize caller — batch build, streaming refresh, post-compaction
    re-finalize — records it without threading a flag."""
    seg_df = spark.read.parquet(os.path.join(index_dir, "segments"))
    has_positions = "pos_enc" in seg_df.columns
    stats = seg_df.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf"),
        F.count("*").alias("n_lists"),
    ).cache()
    stats.write.mode("overwrite").parquet(os.path.join(index_dir, "stats"))
    # committed chunks + compaction rows (whose n_docs is a corrective
    # delta after a tombstone purge)
    manifest = read_manifest(index_dir)
    n_docs = sum(
        r["n_docs"]
        for r in manifest
        if r["status"] == "committed" or r["status"].startswith("compacted")
    )
    # totals from the (tiny, cached) stats df, not another segments scan
    total, n_postings, n_terms = stats.agg(
        F.sum("cf"), F.sum("n_lists"), F.count("*")
    ).collect()[0]
    stats.unpersist()
    # backfill lineage metrics for a single-chunk build that skipped its
    # per-chunk metadata job (collect_metrics=False) — R4 stays complete
    committed = [r for r in manifest if r["status"] == "committed"]
    if len(committed) == 1 and committed[0]["n_postings"] == 0:
        row = dict(committed[0])
        row["n_postings"] = int(n_postings or 0)
        row["n_terms"] = int(n_terms or 0)
        _commit_manifest_row(index_dir, row)
    # delete-everything edge: a purge can leave zero live docs (ES allows
    # it — the index stays open, empty); aggregates come back NULL then
    meta = IndexMeta(
        n_docs=int(n_docs),
        total_tokens=int(total or 0),
        avgdl=float(total or 0) / float(n_docs) if n_docs else 0.0,
        num_segments=num_segments,
        num_chunks=num_chunks,
        tokenizer_version=TOKENIZER_VERSION,
        codec_version=CODEC_VERSION,
        partitioning=partitioning,
        segs_per_chunk=segs_per_chunk,
        positions=has_positions,
    )
    meta.save(index_dir)
    return meta


def reindex(
    spark: SparkSession,
    src,
    corpus: DataFrame,
    dst_dir: str,
    where: str | None = None,
    transform: dict[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    **build_kw,
) -> IndexMeta:
    """ES _reindex: copy LIVE source documents (tombstones excluded — the
    delete purge without waiting for compaction) matching `where` into a
    brand-new index at `dst_dir`, optionally rewriting fields with
    `transform` (column -> SQL expression, the engine's one script
    contract; unknown names raise, like update_by_query). The destination
    is a FRESH index: its collection stats (N, df, avgdl) are the
    subset's — the ES contract, oracle-verified by the reindex_search
    contract row.

    `src` is the source index handle (duck-typed: only `.tombstones` is
    read); `corpus` its stored-fields table. Plan: the `where` predicate
    is a Catalyst filter pushed into the corpus scan, the tombstone list
    (small by the compaction invariant) broadcast anti-joins, then the
    standard range-partitioned chunked build runs — same codec, same
    resumability.

    Reference surface: the reader→sender copy pipeline
    (/root/reference/asset/elasticsearch_reader +
    /root/reference/asset/elasticsearch_bulk form exactly this move); its
    ES-native equivalent is _reindex."""
    df = corpus
    if where is not None:
        df = df.where(F.expr(where))
    ts = getattr(src, "tombstones", None)
    if ts is not None and getattr(ts, "size", 0):
        tomb = spark.createDataFrame(
            [(int(i),) for i in ts], f"{id_col} long"
        )
        df = df.join(F.broadcast(tomb), id_col, "left_anti")
    if transform:
        unknown = sorted(set(transform) - set(df.columns))
        if unknown:
            raise ValueError(f"transform names unknown columns: {unknown}")
        for c, e in transform.items():
            df = df.withColumn(c, F.expr(e))
    return build_index(
        spark, df, dst_dir, id_col=id_col, text_col=text_col, **build_kw
    )


def build_sayt_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    lo: int = 2,
    hi: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    **build_kw,
) -> IndexMeta:
    """Build the search-as-you-type companion index (ES `index_prefixes`
    / `search_as_you_type` subfield): the corpus re-analyzed with
    index-time edge n-grams — each token's distinct leading prefixes of
    length lo..hi plus the full token (operators/texthash.
    edge_ngrams_expr, the shared-SQL-twin expression the sayt oracle row
    uses). Attach the result with `InvertedIndex.attach_sayt(idx, lo,
    hi)` and bare prefix queries become single posting lookups
    (engine.search_prefix_sayt) instead of N-term dictionary expansions.

    Cost model for the trade: index size grows by ~(hi - lo + 1) grams
    per token (ES pays the same for index_prefixes); prefix-query cost
    drops from O(expansions) posting lists to one. At 10^12 docs the
    expansion width grows with vocabulary while this path stays O(1) —
    the reason ES ships the subfield."""
    from elasticsearch_assets_spark.operators.texthash import (
        edge_ngrams_expr,
        tokens_expr,
    )

    derived = corpus.select(
        F.col(id_col),
        F.concat_ws(
            " ", edge_ngrams_expr(tokens_expr(text_col), lo, hi)
        ).alias("_sayt_text"),
    )
    return build_index(
        spark, derived, index_dir, id_col=id_col, text_col="_sayt_text",
        **build_kw,
    )
