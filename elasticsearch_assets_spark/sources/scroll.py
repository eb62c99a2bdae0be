"""ES scroll API facade: sequential deep pagination as a keyset-cursor
iterator.

Reference behavior: a scroll request pins a snapshot and returns fixed-size
batches in a stable order until exhausted; each response carries the cursor
for the next. This re-expression keeps the two halves explicit:

- snapshot stability comes from the PIT layer (engine.pit hard-links the
  committed files) or from reading an immutable parquet path — scroll
  itself does not copy anything;
- the cursor is the last row's sort key (the search_after mechanism), so
  every page is one pushed-down `> cursor` filter + TakeOrderedAndProject.
  No page ever pays OFFSET's skip-and-discard: page N costs the same scan
  as page 1 at any depth — the property that makes scroll usable for a
  full-corpus export at 10^12 docs, where OFFSET-style paging is O(N^2).

The iterator materializes one page at a time on the driver (exactly the
reference's consumption shape — a scroll consumer IS a driver-side loop
over batches; the per-page limit bounds driver memory)."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def scroll_page(
    df: DataFrame,
    sort_cols: list[str],
    size: int,
    after: "tuple | None" = None,
    ascending: bool = True,
) -> DataFrame:
    """One scroll batch: rows strictly after the cursor in the total order
    defined by `sort_cols` (which must end in a tiebreak-unique column —
    ES uses _shard_doc; callers here use the id). The cursor filter is a
    lexicographic strict-greater predicate Catalyst pushes into the scan;
    at 10^12 docs only the cursor-adjacent files survive min/max pruning
    when the table is sorted/bucketed by the leading sort column."""
    if size < 1:
        raise ValueError("size must be >= 1")
    if not sort_cols:
        raise ValueError("scroll needs at least one sort column")
    out = df
    if after is not None:
        if len(after) != len(sort_cols):
            raise ValueError(
                f"cursor arity {len(after)} != sort arity {len(sort_cols)}"
            )
        # lexicographic (c1, c2, ...) > (a1, a2, ...)
        pred = None
        for i, c in enumerate(sort_cols):
            eq = None
            for j in range(i):
                e = F.col(sort_cols[j]) == F.lit(after[j])
                eq = e if eq is None else (eq & e)
            gt = (
                F.col(c) > F.lit(after[i])
                if ascending
                else F.col(c) < F.lit(after[i])
            )
            term = gt if eq is None else (eq & gt)
            pred = term if pred is None else (pred | term)
        out = out.where(pred)
    order = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in sort_cols
    ]
    return out.orderBy(*order).limit(size)


def scroll_pages(
    df: DataFrame,
    sort_cols: list[str],
    size: int,
    ascending: bool = True,
    max_pages: int | None = None,
) -> "Iterator[list[Row]]":
    """Iterate the whole frame in scroll batches. Yields collected pages
    (the consumer shape); the cursor advances from each page's last row.
    `max_pages` bounds runaway consumers (ES bounds scroll by keepalive)."""
    after = None
    n = 0
    while max_pages is None or n < max_pages:
        rows = scroll_page(
            df, sort_cols, size, after=after, ascending=ascending
        ).collect()
        if not rows:
            return
        yield rows
        if len(rows) < size:
            return
        after = tuple(rows[-1][c] for c in sort_cols)
        n += 1
