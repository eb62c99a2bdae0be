"""Snapshot lifecycle management (ES SLM) — retention over a snapshot
repository.

ES's SLM retention rule set (`expire_after`, `min_count`, `max_count`) has
two deliberate asymmetries this module reproduces exactly:

  * `expire_after` yields to `min_count`: the newest `min_count` snapshots
    are kept even when expired (a quiet repo must never age itself empty);
  * `max_count` overrides freshness: beyond the newest `max_count`,
    snapshots are deleted even when unexpired.

So, ranking snapshots newest-first:

    keep  iff  rank <= min_count  OR  (age <= expire_after AND
                                       rank <= max_count)

The plan itself is set-oriented (one window over SNAPSHOT-COUNT rows — a
repository holds thousands of snapshots, never corpus-scale data), so the
decision table is oracle-checkable; `apply_retention` is the filesystem
glue that executes a plan against a real repository directory
(engine.snapshot / restore_snapshot's layout, one directory per snapshot).

Reference surface: the reference ships its indexes to Elasticsearch, where
snapshot retention is operated through SLM policies
(/root/reference/asset/elasticsearch_bulk writes what ES snapshots); this
module is that operational contract re-expressed over the repo's own
snapshot layout.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window, functions as F


def retention_plan(
    snapshots: DataFrame,
    now: str,
    *,
    expire_after_days: int,
    min_count: int,
    max_count: int,
    name_col: str = "name",
    ts_col: str = "ts",
) -> DataFrame:
    """The SLM retention decision table: one row per snapshot with its
    newest-first rank, age in days, keep flag, and the ES-style reason
    (`retained` / `expired` / `max_count_exceeded`). `now` is an ISO
    date/timestamp string — pinned by the caller, never wall clock (the
    determinism contract every time-dependent op here follows).

    Day arithmetic stays integer (datediff), timestamps serialize as ISO
    strings — the cross-engine timestamp rules from CLAUDE.md."""
    if min_count > max_count:
        raise ValueError("min_count must be <= max_count")
    w = Window.orderBy(F.col(ts_col).desc(), F.col(name_col).asc())
    ranked = snapshots.select(
        F.col(name_col).alias("name"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("snap_date"),
        F.datediff(F.lit(now).cast("timestamp"), F.col(ts_col)).alias(
            "age_days"
        ),
        F.row_number().over(w).alias("rank"),
    )
    keep = (F.col("rank") <= min_count) | (
        (F.col("age_days") <= expire_after_days)
        & (F.col("rank") <= max_count)
    )
    reason = (
        F.when(keep, F.lit("retained"))
        .when(F.col("age_days") > expire_after_days, F.lit("expired"))
        .otherwise(F.lit("max_count_exceeded"))
    )
    return ranked.select(
        "name", "snap_date", "age_days", "rank",
        keep.alias("keep"), reason.alias("reason"),
    ).orderBy("rank")


def list_snapshots(repo_dir: str) -> list[str]:
    """Snapshot names in a repository directory (one subdir per snapshot,
    engine.snapshot's layout)."""
    if not os.path.isdir(repo_dir):
        return []
    return sorted(
        d
        for d in os.listdir(repo_dir)
        if os.path.exists(os.path.join(repo_dir, d, "meta.json"))
    )


def apply_retention(repo_dir: str, plan_rows: list) -> list[str]:
    """Execute a collected retention plan against the repository: delete
    every snapshot directory whose row says keep=False, return the deleted
    names. Unknown names raise BEFORE anything is removed (a plan computed
    against a different repo must not delete here); deletion is per-
    snapshot-directory, so a snapshot is either fully present or gone —
    hard links make this safe for restored/cloned indexes (their inodes
    survive, the refcount argument in clone_index_files)."""
    names = {r["name"] for r in plan_rows}
    missing = names - set(list_snapshots(repo_dir))
    if missing:
        raise ValueError(f"plan names not in repository: {sorted(missing)}")
    deleted = []
    for r in plan_rows:
        if not r["keep"]:
            shutil.rmtree(os.path.join(repo_dir, r["name"]))
            deleted.append(r["name"])
    return sorted(deleted)
