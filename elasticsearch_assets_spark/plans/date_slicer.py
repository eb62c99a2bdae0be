"""Statistics-driven date-range partition planner (Half A, SURVEY.md §3.1).

Re-expresses the reference's adaptive date slicer
(/root/reference/asset/elasticsearch_reader/elasticsearch_date_range/slicer.js:16-541)
as a set-oriented plan: the reference issues one count query per candidate
range, recursively halving oversized ranges (slicer.js:183-222) and expanding
empty ones (slicer.js:227-240); we take ONE histogram pass per refinement
level over a fine-grained bucket grid and do the split/coalesce arithmetic on
the driver. Same observable semantics:

* slices are contiguous, half-open [start, end), in time order, covering
  [start, limit) where limit = max(ts) + 1 resolution unit
  (slicer.js:127-130 adds +1 so the last doc is covered);
* each slice's count ≤ size unless the slice is already 1 resolution unit
  wide (minimum width, slicer.js:163-176);
* empty stretches are absorbed into the following slice (range expansion);
* recursion/expansion totals are reported like the reference's
  `slicer:slice:recursion` / `range_expansion` events (R5).

At 100 TB this costs O(levels) aggregate scans (each a map-side partial
count) instead of the reference's O(slices) sequential count round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame, functions as F

MS = {"ms": 1, "s": 1000}


@dataclass(frozen=True)
class DateSlice:
    start: datetime  # inclusive
    end: datetime  # exclusive
    count: int


@dataclass
class DateSlicePlan:
    slices: list[DateSlice]
    start: datetime
    limit: datetime
    total: int
    recursions: int = 0
    expansions: int = 0
    metrics: dict = field(default_factory=dict)


def _utc(dt: datetime) -> datetime:
    return dt.replace(tzinfo=timezone.utc) if dt.tzinfo is None else dt


def slice_predicate(ts_col: str | Column, sl: DateSlice) -> Column:
    """[start inclusive, end exclusive) — P2, simple_api_reader/index.js:145-149."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (c >= F.lit(sl.start.replace(tzinfo=None))) & (
        c < F.lit(sl.end.replace(tzinfo=None))
    )


def _histogram(
    df: DataFrame, ts_col: str, start: datetime, bucket_ms: int
) -> dict[int, int]:
    """bucket index -> count, one aggregate pass (A1)."""
    start_naive = start.replace(tzinfo=None)
    bucket = F.floor(
        (F.unix_millis(F.col(ts_col)) - F.unix_millis(F.lit(start_naive))) / bucket_ms
    )
    rows = df.groupBy(bucket.alias("b")).agg(F.count("*").alias("c")).collect()
    return {int(r["b"]): int(r["c"]) for r in rows}


def plan_date_slices(
    df: DataFrame,
    ts_col: str,
    size: int = 5000,
    *,
    start: datetime | None = None,
    end: datetime | None = None,
    resolution: str = "ms",
    max_levels: int = 6,
    fine_factor: int = 4,
) -> DateSlicePlan:
    """Plan [start, end)-contiguous slices targeting ≤ `size` docs each.

    `size` default mirrors the reference reader default of 5000
    (/root/reference/asset/elasticsearch_reader/index.js:50).
    """
    unit_ms = MS[resolution]
    pred = None
    if start is not None:
        pred = F.col(ts_col) >= F.lit(_utc(start).replace(tzinfo=None))
    if end is not None:
        p2 = F.col(ts_col) < F.lit(_utc(end).replace(tzinfo=None))
        pred = p2 if pred is None else (pred & p2)
    scoped = df.where(pred) if pred is not None else df

    # getDates (slicer.js:151-161): resolve bounds from data when not given
    row = scoped.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    if row["n"] == 0:
        now = _utc(start or datetime.now(timezone.utc))
        return DateSlicePlan(slices=[], start=now, limit=now, total=0)
    lo = _utc(start) if start is not None else _utc(row["lo"])
    # +1 resolution unit past the max so the last doc is covered (slicer.js:127-130)
    limit = _utc(end) if end is not None else _utc(row["hi"]) + timedelta(
        milliseconds=unit_ms
    )
    total = int(row["n"])

    # floor bounds to the resolution grid
    lo = lo.replace(microsecond=(lo.microsecond // 1000) * 1000)
    if resolution == "s":
        lo = lo.replace(microsecond=0)

    est_slices = max(1, -(-total // size))
    range_ms = max(unit_ms, int((limit - lo).total_seconds() * 1000))
    # bucket width = unit * 2^k so refinement levels nest exactly
    target = max(1, range_ms // max(1, est_slices * fine_factor) // unit_ms)
    bucket_ms = unit_ms * (1 << max(0, (target - 1).bit_length()))

    hist = _histogram(scoped, ts_col, lo, bucket_ms)
    recursions = 0
    levels = 1

    # refine oversized buckets with progressively finer histograms — the
    # set-oriented analogue of the reference's recursive halving; each level
    # is ONE aggregate job over only the oversized buckets' rows
    oversized = {b for b, c in hist.items() if c > size and bucket_ms > unit_ms}
    cur_bucket_ms = bucket_ms
    fine_maps: list[tuple[int, dict[int, int]]] = []  # (width_ms, histogram)
    while oversized and cur_bucket_ms > unit_ms and levels < max_levels:
        ratio = 8 if cur_bucket_ms // unit_ms >= 8 else cur_bucket_ms // unit_ms
        new_bucket_ms = cur_bucket_ms // ratio
        start_naive = lo.replace(tzinfo=None)
        bcol = F.floor(
            (F.unix_millis(F.col(ts_col)) - F.unix_millis(F.lit(start_naive)))
            / cur_bucket_ms
        )
        sub = scoped.where(bcol.isin([int(b) for b in oversized]))
        fine = _histogram(sub, ts_col, lo, new_bucket_ms)
        fine_maps.append((new_bucket_ms, fine))
        recursions += len(oversized)
        oversized = {
            b for b, c in fine.items() if c > size and new_bucket_ms > unit_ms
        }
        cur_bucket_ms = new_bucket_ms
        levels += 1

    # flatten to a sorted list of (start_ms_offset, width_ms, count) leaves
    leaves: list[tuple[int, int, int]] = []

    def emit_leaves(b: int, width_ms: int, count: int, level: int) -> None:
        if count > size and level < len(fine_maps) and width_ms > unit_ms:
            sub_ms, fine = fine_maps[level]
            ratio = width_ms // sub_ms
            covered = 0
            for sb in range(b * ratio, (b + 1) * ratio):
                c = fine.get(sb, 0)
                covered += c
                if c > 0:
                    emit_leaves(sb, sub_ms, c, level + 1)
            return
        leaves.append((b * width_ms, width_ms, count))

    for b in sorted(hist):
        emit_leaves(b, bucket_ms, hist[b], 0)
    leaves.sort()

    # greedy pack: accumulate leaves until adding the next would exceed size;
    # empty stretches between leaves are absorbed into the current slice
    # (range expansion, slicer.js:227-240)
    slices: list[DateSlice] = []
    acc_count = 0
    acc_start = 0  # first slice anchors at the range start
    expansions = 0
    prev_end: int | None = None
    end_off = int((limit - lo).total_seconds() * 1000)
    for off, width, count in leaves:
        if acc_count and acc_count + count > size:
            slices.append(_mk_slice(lo, acc_start, off, acc_count))
            acc_start, acc_count = off, 0
        if prev_end is not None and off > prev_end:
            expansions += 1  # an empty stretch was absorbed
        acc_count += count
        prev_end = off + width
    slices.append(_mk_slice(lo, acc_start, end_off, acc_count))

    return DateSlicePlan(
        slices=slices,
        start=lo,
        limit=limit,
        total=total,
        recursions=recursions,
        expansions=expansions,
        metrics={"levels": levels, "bucket_ms": bucket_ms, "leaves": len(leaves)},
    )


def _mk_slice(lo: datetime, start_off: int, end_off: int, count: int) -> DateSlice:
    return DateSlice(
        start=lo + timedelta(milliseconds=start_off),
        end=lo + timedelta(milliseconds=end_off),
        count=count,
    )


# ---------------------------------------------------------------------------
# X4: secondary key-subslicing of hot ranges (subslice_by_key)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CombinedSlice:
    """A hot date range further split by key prefix — the reference's
    `{start, end, key, count}` slice (slicer.js:323-332 + id_slicer.js:70-76,
    91-94): emitted when a minimum-width date slice still exceeds the
    subslice threshold."""

    start: datetime  # inclusive
    end: datetime  # exclusive
    prefix: str
    count: int


def combined_predicate(ts_col: str | Column, key_col: str | Column, sl: CombinedSlice) -> Column:
    from elasticsearch_assets_spark.plans.id_slicer import KeySlice, key_predicate

    return slice_predicate(ts_col, DateSlice(sl.start, sl.end, sl.count)) & key_predicate(
        key_col, KeySlice(sl.prefix, sl.count)
    )


def subslice_by_key(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    plan: DateSlicePlan,
    *,
    threshold: int = 50_000,
    size: int = 10_000,
    key_type: str = "base64url",
    starting_depth: int = 1,
) -> list["DateSlice | CombinedSlice"]:
    """Replace slices with count >= threshold by key-prefix sub-slices.

    `threshold` default mirrors subslice_key_threshold
    (/root/reference/asset/elasticsearch_reader/index.js:154). Slice order is
    preserved; sub-slices are alphabet-ordered within their range, like the
    reference's makeKeyList (slicer.js:281-285).
    """
    from elasticsearch_assets_spark.plans.id_slicer import plan_key_slices

    out: list[DateSlice | CombinedSlice] = []
    for sl in plan.slices:
        if sl.count < threshold:
            out.append(sl)
            continue
        scoped = df.where(slice_predicate(ts_col, sl))
        keys = plan_key_slices(
            scoped, key_col, size=size, key_type=key_type, starting_depth=starting_depth
        )
        out.extend(
            CombinedSlice(start=sl.start, end=sl.end, prefix=k.prefix, count=k.count)
            for k in keys
        )
    return out
