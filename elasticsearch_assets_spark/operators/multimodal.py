"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns beside a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so each task processes
whole record batches (the 100 TB shape: media bytes never pass through the
driver, batches stream executor-side).

The sandbox has no image/audio codecs, so the *decode kernels* are stubbed:
``codec="fake"`` runs a deterministic byte-statistics decoder (real Spark
plumbing — schema, batching, partitioning — is exercised end-to-end);
``codec="pillow"``/``codec="ffmpeg"`` raise ``NotImplementedError`` at the
call boundary where the real library would be invoked.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "struct<mime:string, n_bytes:bigint, width:int, height:int, duration_ms:bigint>"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes long, mean_byte double, byte_entropy double, "
    "phash long"
)

FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary, frame_off long"


def attach_fake_media(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministically synthesize a binary media column + metadata struct
    from existing columns (stand-in for a real WARC/image payload; the
    downstream plumbing cannot tell the difference)."""
    media = F.encode(F.col(text_col), "UTF-8").cast("binary")
    n = F.octet_length(media).cast("bigint")
    return df.select(
        F.col(id_col),
        media.alias("media"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            n.alias("n_bytes"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(640)).cast("int").alias("width"),
            F.pmod(F.xxhash64(F.col(id_col) + 1), F.lit(480)).cast("int").alias("height"),
            (n * 10).alias("duration_ms"),
        ).alias("media_meta"),
    )


def _fake_decode_batch(media: pd.Series) -> pd.DataFrame:
    """Deterministic 'decode': byte statistics + a 64-bit perceptual-hash
    stand-in (xor-fold of the byte histogram)."""
    means, ents, phashes, sizes = [], [], [], []
    for buf in media:
        a = np.frombuffer(bytes(buf), dtype=np.uint8)
        sizes.append(int(a.size))
        if a.size == 0:
            means.append(0.0), ents.append(0.0), phashes.append(0)
            continue
        counts = np.bincount(a, minlength=256).astype(np.float64)
        p = counts[counts > 0] / a.size
        means.append(float(a.mean()))
        ents.append(float(-(p * np.log2(p)).sum()))
        h = np.uint64(0xCBF29CE484222325)
        for i, c in enumerate(counts.astype(np.uint64)):
            h = np.uint64((int(h) ^ (int(c) << (i % 56))) & 0x7FFFFFFFFFFFFFFF)
        phashes.append(int(h))
    return pd.DataFrame(
        {"n_bytes": sizes, "mean_byte": means, "byte_entropy": ents, "phash": phashes}
    )


def image_features(df: DataFrame, *, codec: str = "fake") -> DataFrame:
    """media table -> per-doc feature rows via mapInPandas (Arrow batches)."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec={codec!r}: real image decoding needs pillow/opencv, not "
            "available in this environment; plumbing is identical to 'fake'"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = _fake_decode_batch(pdf["media"])
            feats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            feats.insert(1, "mime", pdf["media_meta"].map(lambda m: m["mime"]))
            yield feats[
                ["doc_id", "mime", "n_bytes", "mean_byte", "byte_entropy", "phash"]
            ]

    return df.select("doc_id", "media", "media_meta").mapInPandas(
        fn, IMAGE_FEATURES_SCHEMA
    )


def frame_sample(
    df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8, codec: str = "fake"
) -> DataFrame:
    """'Video' frame sampling: emit <=max_frames fixed-stride byte windows
    per media blob, one output row per frame (1->N mapInPandas)."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec={codec!r}: real frame extraction needs ffmpeg bindings"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, offs = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(buf)
                for k in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    off = k * every_n_bytes
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(raw[off : off + every_n_bytes])
                    offs.append(off)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "frame_idx": idxs,
                        "frame_bytes": frames,
                        "frame_off": offs,
                    }
                )

    return df.select("doc_id", "media").mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-expression media accounting (no decode): size + sha256 per doc.
    SQL-oracle-able; the cheap first pass a real pipeline runs for manifest
    building before any decoding."""
    return df.select(
        F.col("doc_id"),
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.sha2(F.col("media"), 256).alias("sha"),
    )
