"""Bulk-sink semantics (SURVEY.md §2.1 S7): batch sizing + key routing.

The reference assembles ES bulk bodies as a flat array alternating
[action-metadata, doc] and (a) splits oversize arrays at <= 2*size elements
without ever separating a metadata/doc pair, (b) routes records to clusters
by the first character of `_id`
(/root/reference/asset/elasticsearch_bulk/index.js:54-74, 98-152).

In Spark the wire format disappears — writes are declarative — but both
behaviors survive as:

* `split_bulk_array`: the planning-time utility with the reference's exact
  pair-preserving split semantics (golden sizes 101/19 pinned by
  /root/reference/test/elasticsearch_bulk-spec.js:61-77). Used to derive
  `maxRecordsPerFile` / coalesce targets for sinks that feed a real bulk
  endpoint.
* `route_by_key`: first-char-of-key routing as a partition column with the
  reference's '*' fallback semantics, so a write `partitionBy('_connection')`
  reproduces multisend fan-out (at 100 TB this is a hash-partitioned write,
  not a driver loop).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

_META_TYPES = ("index", "create", "update", "delete")


def _meta_type(item: Any) -> str | None:
    """Which bulk action a flat-array element is, if it is action metadata."""
    if isinstance(item, Mapping):
        for t in _META_TYPES:
            if t in item:
                return t
    return None


def split_bulk_array(data: Sequence[Any], size: int) -> list[list[Any]]:
    """Split a flat [meta, doc, meta, doc, ...] array into chunks of <= 2*size
    elements, never separating a metadata element from its following doc.

    Port of the *semantics* at
    /root/reference/asset/elasticsearch_bulk/index.js:54-74: walk in chunks of
    2*size; if the element at the cut is non-delete action metadata, cut just
    before it (its doc is next), else cut just after it. `delete` has no doc
    so it may end a chunk.
    """
    doc_limit = size * 2
    items = list(data)
    if len(items) <= doc_limit:
        return [items]
    out: list[list[Any]] = []
    while items:
        end = doc_limit if len(items) - 1 > doc_limit else len(items) - 1
        t = _meta_type(items[end])
        cut = end if (t is not None and t != "delete") else end + 1
        out.append(items[:cut])
        items = items[cut:]
    return out


def route_by_key(
    df: DataFrame,
    connection_map: Mapping[str, str],
    *,
    key_col: str = "_id",
    index_col: str | None = None,
    index_append: bool = False,
    out_col: str = "_connection",
) -> DataFrame:
    """Multisend routing: map first char of the key through connection_map.

    Reference behavior (/root/reference/asset/elasticsearch_bulk/index.js:
    98-152): keys whose first char is in the map go to that connection;
    otherwise to the '*' entry when present; otherwise they are invalid
    (here: routed to NULL so callers can assert none exist). Map keys may be
    comma-separated char lists ("a,b": "conn1"), as the reference's
    connection_map allows. With `index_append`, '-<char>' is appended to the
    target index for mapped (non-wildcard) keys.
    """
    expanded: dict[str, str] = {}
    for chars, conn in connection_map.items():
        for ch in chars.split(","):
            expanded[ch.strip()] = conn
    fallback = expanded.pop("*", None)

    first = F.substring(F.col(key_col).cast("string"), 1, 1)
    mapping = F.create_map(
        *[F.lit(x) for kv in expanded.items() for x in kv]
    )
    routed: Column = mapping.getItem(first)
    if fallback is not None:
        routed = F.coalesce(routed, F.lit(fallback))
    df = df.withColumn(out_col, routed)
    if index_append and index_col:
        df = df.withColumn(
            index_col,
            F.when(
                mapping.getItem(first).isNotNull(),
                F.concat(F.col(index_col), F.lit("-"), first),
            ).otherwise(F.col(index_col)),
        )
    return df


def write_bulk(
    df: DataFrame,
    path: str,
    *,
    size: int = 500,
    partition_cols: Sequence[str] = ("_connection",),
    mode: str = "append",
) -> None:
    """Sink a routed action DataFrame as parquet, bounding records-per-file by
    the bulk `size` knob (reference default 500,
    /root/reference/asset/elasticsearch_bulk/index.js:178)."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", size)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
