"""ES index sorting + early-terminated sorted top-k.

Reference behavior: ES `index.sort.field` stores each segment's docs in
sort order so a search sorting by that field terminates early — it reads
a prefix of each segment instead of the whole index (the classic
long-tail win for "latest N" queries).

Spark-first shape: `write_sorted` range-partitions the table on the sort
key (equal keys land in one file; files cover DISJOINT key ranges) and
sorts within partitions — the parquet footer of every file then carries
exact min/max for the key. `sorted_topk` plans the query driver-side
from footers alone: files ordered by their best key, the shortest prefix
whose (filtered) row count covers k is scanned, everything else is never
opened. Disjoint ranges make the prune EXACT, not heuristic: every row
in a better-ranged file beats every row in a worse one, and key ties
cannot straddle files.

With a residual `where` filter the covering prefix can't be known from
footers, so the planner doubles the prefix until the filtered count
reaches k (each probe is one count over the prefix — a planning-level
scan bounded by log2(files) rounds, and the final answer still reads
only the chosen prefix).

100 TB note: the footer pass is O(files) driver-side metadata (the same
information a table format serves from its manifest); the scan cost is
O(prefix), independent of table size — exactly ES's early-termination
contract. On Iceberg/Delta the equivalent is sort-ordered writes +
min/max manifest pruning.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    *,
    num_files: int = 8,
) -> None:
    """Materialize `df` range-partitioned + sorted on `sort_col` (the ES
    index.sort write path). One shuffle (range exchange) + in-partition
    sort — the price paid once at write time that every sorted query
    then amortizes."""
    (
        df.repartitionByRange(num_files, F.col(sort_col).asc())
        .sortWithinPartitions(F.col(sort_col).asc())
        .write.mode("errorifexists")
        .parquet(path)
    )


def _file_stats(path: str, sort_col: str) -> "list[tuple[str, object, object, int]]":
    """(file, min, max, rows) from parquet footers — no data pages read."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if sort_col not in idx:
            raise ValueError(f"{f!r} has no column {sort_col!r}")
        lo = hi = None
        rows = 0
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx[sort_col]).statistics
            if st is None or not st.has_min_max:
                raise ValueError(
                    f"{f!r} lacks min/max statistics for {sort_col!r}"
                )
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
            rows += md.row_group(g).num_rows
        if rows:
            out.append((f, lo, hi, rows))
    if not out:
        raise ValueError(f"no parquet files under {path!r}")
    return out


def plan_sorted_topk(
    path: str, sort_col: str, k: int, *, descending: bool = True
) -> "tuple[list[str], int]":
    """The no-filter plan: files ordered by best key, shortest prefix
    whose footer row count covers k. Returns (files_to_scan, total)."""
    stats = _file_stats(path, sort_col)
    stats.sort(key=(lambda s: s[2]) if descending else (lambda s: s[1]),
               reverse=descending)
    picked, cum = [], 0
    for f, lo, hi, rows in stats:
        picked.append(f)
        cum += rows
        if cum >= k:
            break
    return picked, len(stats)


def sorted_topk(
    spark: SparkSession,
    path: str,
    sort_col: str,
    k: int,
    *,
    descending: bool = True,
    where: "str | None" = None,
    tiebreak: "str | None" = None,
) -> DataFrame:
    """Top-k by `sort_col` over a write_sorted table, reading only the
    covering file prefix. Exact: result rows and order are identical to
    a full-table ORDER BY ... LIMIT k (tested). `tiebreak` column makes
    the cut deterministic under key ties (recommended: the id column)."""
    stats = _file_stats(path, sort_col)
    stats.sort(key=(lambda s: s[2]) if descending else (lambda s: s[1]),
               reverse=descending)
    order = [
        F.col(sort_col).desc() if descending else F.col(sort_col).asc()
    ]
    if tiebreak:
        order.append(F.col(tiebreak).asc())

    def read(files: "list[str]") -> DataFrame:
        df = spark.read.parquet(*files)
        return df.where(F.expr(where)) if where else df

    n = 0
    cum = 0
    for i, (_, _, _, rows) in enumerate(stats):
        n, cum = i + 1, cum + rows
        if cum >= k:
            break
    if where is not None:
        # the footer count bounds UNfiltered rows; double the prefix
        # until the filtered count covers k (<= log2(files) probes)
        while n < len(stats):
            if read([s[0] for s in stats[:n]]).limit(k).count() >= k:
                break
            n = min(len(stats), n * 2)
    return read([s[0] for s in stats[:n]]).orderBy(*order).limit(k)
