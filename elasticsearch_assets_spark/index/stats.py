"""Index-level metadata + BM25 collection statistics.

Layout of an index directory (all Parquet unless noted):

    <index_dir>/segments/chunk=<c>/   one row per (seg_id, term) posting list
    <index_dir>/stats/                (term, df, cf) global term stats
    <index_dir>/manifest/             per-chunk checkpoint + lineage rows
    <index_dir>/meta.json             collection constants (this module)

The stats table is the Spark-native replacement for what Lucene keeps in
segment headers; global df across segments is what makes BM25 scores
rank-identical no matter how many segments/partitions the build used
(SURVEY.md §7.3(1)).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

K1 = 1.2
B = 0.75


@dataclass
class IndexMeta:
    n_docs: int
    total_tokens: int
    avgdl: float
    num_segments: int
    num_chunks: int
    tokenizer_version: int
    codec_version: int
    k1: float = K1
    b: float = B
    # doc->segment mapping contract: "doc_hash" means seg_id is computable
    # as chunk_id*segs_per_chunk + pmod(xxhash64(doc_id), segs_per_chunk)
    # from the manifest chunk ranges — the distributed filtered-search path
    # (engine.search_filtered) relies on it. "opaque" (input-partitioned
    # builds, compacted/merged indexes, streaming chunk ids) disables it.
    partitioning: str = "opaque"
    segs_per_chunk: int = 0
    # positional index (pos_enc stream present): phrase queries are
    # index-assisted; detected from the segment schema at finalize time
    positions: bool = False

    def save(self, index_dir: str) -> None:
        # temp + os.replace (new inode), like every other metadata writer:
        # hard-link clones (PIT / snapshot / _split) share meta.json's
        # inode, so an in-place "w" truncate-write here would leak the
        # clone's post-merge stats back into the source index.
        path = os.path.join(index_dir, "meta.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2)
        os.replace(tmp, path)


def load_meta(index_dir: str) -> IndexMeta:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return IndexMeta(**json.load(f))


def disk_usage(index_dir: str) -> "list[dict]":
    """ES `_disk_usage`: per-field on-disk footprint of the index.

    Reference behavior: ES analyzes each field's contribution to the
    shard's disk usage (inverted index, doc values, ...). Here the index
    IS columnar parquet, so the answer comes straight from the file
    footers: per section (segments / stats) and column, the compressed
    and uncompressed byte totals and value counts — driver-side metadata
    only, no data pages read (the same O(files) planning cost as
    sorted_scan's pruning; a table format serves this from its
    manifest).

    Returns rows sorted (section, column):
      {"section", "column", "compressed_bytes", "uncompressed_bytes",
       "n_values"}
    """
    import glob as _glob

    import pyarrow.parquet as pq

    out: "dict[tuple[str, str], list[int]]" = {}
    for section, pattern in (
        ("segments", os.path.join(index_dir, "segments", "*", "*.parquet")),
        ("stats", os.path.join(index_dir, "stats", "*.parquet")),
    ):
        for f in _glob.glob(pattern):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for i in range(rg.num_columns):
                    col = rg.column(i)
                    key = (section, col.path_in_schema)
                    acc = out.setdefault(key, [0, 0, 0])
                    acc[0] += col.total_compressed_size
                    acc[1] += col.total_uncompressed_size
                    acc[2] += col.num_values
    return [
        {
            "section": s, "column": c,
            "compressed_bytes": v[0], "uncompressed_bytes": v[1],
            "n_values": v[2],
        }
        for (s, c), v in sorted(out.items())
    ]


def set_similarity(index_dir: str, k1: float, b: float) -> IndexMeta:
    """ES custom BM25 similarity (the index-settings `similarity` block:
    `{"type": "BM25", "k1": ..., "b": ...}`): the constants live in the
    index metadata — every scorer (distributed kernels, serving path,
    explain) reads them from meta, so changing them here re-ranks
    consistently everywhere. Like ES, this is an index-level setting, not
    a per-query knob; changing it on a live index is the ES
    close-update-reopen flow (open handles cache meta — re-open the
    InvertedIndex after calling this).

    meta.save is temp + os.replace, so the update is safe on hard-link
    clones (PIT / snapshot / split)."""
    if k1 < 0 or not (0.0 <= b <= 1.0):
        raise ValueError("BM25 needs k1 >= 0 and 0 <= b <= 1")
    meta = load_meta(index_dir)
    meta.k1 = float(k1)
    meta.b = float(b)
    meta.save(index_dir)
    return meta
