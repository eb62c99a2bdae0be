"""Keyed parquet table with MERGE semantics (SURVEY.md §2.1 S8, §7.3 #7).

The reference's update/upsert/delete bulk actions require a mutable keyed
store — Elasticsearch's doc-id index. Production target is Iceberg
``MERGE INTO t USING s ON t.key = s.key WHEN MATCHED ... WHEN NOT MATCHED
INSERT`` / ``DELETE FROM t WHERE key IN (...)``; the sandbox has no Iceberg
jar, so this module implements the same semantics over plain parquet with
**hash-bucket dynamic partition overwrite**:

* rows live under ``bucket=<pmod(xxhash64(key), n)>`` partitions;
* a merge joins the update set against ONLY the affected buckets (partition
  pruning on an IN-list of bucket values) and rewrites only those buckets
  (``partitionOverwriteMode=dynamic``) — at 100 TB a merge touching 0.1% of
  keys rewrites ~0.1% of files, the same I/O shape as Iceberg's
  copy-on-write MERGE.

Actions (reference /root/reference/asset/elasticsearch_index_selector/
index.js:75-124):
  index  -> insert-or-replace by key (full row)
  create -> insert only if key absent
  update -> overwrite listed fields of existing rows only
  upsert -> update existing + insert missing
  delete -> remove rows by key
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


class KeyedParquetTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "_id",
        num_buckets: int = 64,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.num_buckets = num_buckets

    # -- helpers -----------------------------------------------------------
    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col(self.key).cast("string")), F.lit(self.num_buckets)).cast("int"),
        )

    def exists(self) -> bool:
        return os.path.exists(self.path) and any(
            e.startswith("bucket=") for e in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop("bucket")

    def _read_buckets(self, buckets: list[int]) -> DataFrame:
        # IN-list on the partition column -> Spark prunes to just these dirs
        return self.spark.read.parquet(self.path).where(
            F.col("bucket").isin(buckets)
        )

    def _write(self, df: DataFrame, mode: str) -> None:
        self._bucket(df).write.mode(mode).partitionBy("bucket").parquet(self.path)

    def _affected_buckets(self, source: DataFrame) -> list[int]:
        rows = (
            self._bucket(source.select(self.key))
            .select("bucket")
            .distinct()
            .collect()
        )
        return [r["bucket"] for r in rows]

    def _overwrite_buckets(self, merged: DataFrame) -> None:
        # dynamic mode (scoped to THIS writer, not session-wide): only
        # partitions present in `merged` are replaced
        merged.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("bucket").parquet(self.path)

    # -- actions ------------------------------------------------------------
    def append(self, df: DataFrame) -> None:
        """`index` when keys are fresh / initial load."""
        self._write(df, "append")

    def index(self, df: DataFrame) -> None:
        """Insert-or-replace whole rows by key."""
        if not self.exists():
            self._write(df, "append")
            return
        src = self._bucket(df).dropDuplicates([self.key])
        buckets = [r["bucket"] for r in src.select("bucket").distinct().collect()]
        tgt = self._read_buckets(buckets)
        kept = tgt.join(src.select(self.key), self.key, "left_anti")
        self._overwrite_buckets(kept.unionByName(src))

    def create(self, df: DataFrame) -> None:
        """Insert only rows whose key does not already exist."""
        if not self.exists():
            self._write(df.dropDuplicates([self.key]), "append")
            return
        src = self._bucket(df).dropDuplicates([self.key])
        buckets = [r["bucket"] for r in src.select("bucket").distinct().collect()]
        tgt = self._read_buckets(buckets)
        fresh = src.join(tgt.select(self.key), self.key, "left_anti")
        fresh.write.mode("append").partitionBy("bucket").parquet(self.path)

    def _merge_exprs(
        self,
        tgt: DataFrame,
        src: DataFrame,
        update_exprs: dict[str, str],
        *,
        insert_missing: bool,
        strict: bool = True,
    ) -> DataFrame:
        """MERGE with per-column UPDATE EXPRESSIONS — the reference's
        Painless-script cases (`ctx._source.count += add` with
        `script_params`, /root/reference/test/index_selector-spec.js:245-290)
        re-expressed as `MERGE ... WHEN MATCHED THEN UPDATE SET col = expr`
        per SURVEY.md §2.11. `update_exprs` maps a target column to a SQL
        expression over aliases `t` (existing row) and `s` (source row, which
        may carry extra param columns like `s.add`), e.g.
        ``{"count": "t.count + s.add"}``. Matched rows evaluate the
        expressions (non-listed columns keep target values — script updates
        touch only their fields); unmatched source rows insert source values
        when `insert_missing` (upsert), else are ignored (update).

        When `strict` (user-supplied update_exprs / update_fields), unknown
        expression keys raise: the reference's script update fails loudly on
        a bad field, so a typo'd column must not become a silent no-op.
        Non-strict (exprs derived from ALL source columns) filters instead —
        extra source columns are legitimate script params (`s.add`)."""
        updatable = set(tgt.columns) - {self.key, "bucket"}
        unknown = set(update_exprs) - updatable
        if unknown:
            if strict:
                raise ValueError(
                    f"update_exprs keys {sorted(unknown)} are not updatable "
                    f"target columns (have: {sorted(updatable)})"
                )
            update_exprs = {
                k: v for k, v in update_exprs.items() if k in updatable
            }
        t = tgt.drop("bucket").alias("t")
        s = src.drop("bucket").alias("s")
        cond = F.col(f"t.{self.key}") == F.col(f"s.{self.key}")
        joined = t.join(s, cond, "full_outer" if insert_missing else "left_outer")
        t_key, s_key = F.col(f"t.{self.key}"), F.col(f"s.{self.key}")
        out = [F.coalesce(t_key, s_key).alias(self.key)]
        src_cols = set(src.columns)
        for c in tgt.columns:
            if c in (self.key, "bucket"):
                continue
            matched_val = (
                F.expr(update_exprs[c]) if c in update_exprs else F.col(f"t.{c}")
            )
            insert_val = F.col(f"s.{c}") if c in src_cols else F.lit(None)
            out.append(
                F.when(s_key.isNull(), F.col(f"t.{c}"))
                .when(t_key.isNull(), insert_val)
                .otherwise(matched_val)
                .alias(c)
            )
        return self._bucket(joined.select(*out))

    def _apply_merge(
        self,
        df: DataFrame,
        update_exprs: dict[str, str],
        *,
        insert_missing: bool,
        strict: bool = True,
    ) -> None:
        src = self._bucket(df).dropDuplicates([self.key])
        buckets = [r["bucket"] for r in src.select("bucket").distinct().collect()]
        merged = self._merge_exprs(
            self._read_buckets(buckets), src, update_exprs,
            insert_missing=insert_missing, strict=strict,
        )
        self._overwrite_buckets(merged)

    def _field_exprs(
        self, src: DataFrame, update_fields: Sequence[str] | None
    ) -> dict[str, str]:
        """`update_fields` as MERGE expressions: matched rows take the
        source value, falling back to the target when the source value is
        null (the historical coalesce semantics, tested). An explicit
        `update_fields` name absent from the source raises (typo guard)."""
        src_cols = {c for c in src.columns if c not in (self.key, "bucket")}
        if update_fields is not None:
            missing = set(update_fields) - src_cols
            if missing:
                raise ValueError(
                    f"update_fields {sorted(missing)} are not source "
                    f"columns (have: {sorted(src_cols)})"
                )
        upd = set(update_fields) if update_fields is not None else src_cols
        return {c: f"coalesce(s.{c}, t.{c})" for c in upd & src_cols}

    def upsert(
        self,
        df: DataFrame,
        update_fields: Sequence[str] | None = None,
        update_exprs: dict[str, str] | None = None,
    ) -> None:
        """MERGE: matched rows take source values (all fields, only
        `update_fields`, or computed `update_exprs` — see _merge_exprs);
        unmatched source rows are inserted."""
        if not self.exists():
            self._write(df.dropDuplicates([self.key]), "append")
            return
        exprs = update_exprs if update_exprs is not None else self._field_exprs(
            df, update_fields
        )
        strict = update_exprs is not None or update_fields is not None
        self._apply_merge(df, exprs, insert_missing=True, strict=strict)

    def update(
        self,
        df: DataFrame,
        update_fields: Sequence[str] | None = None,
        update_exprs: dict[str, str] | None = None,
    ) -> None:
        """Overwrite fields of EXISTING rows only (no insert); with
        `update_exprs`, matched rows evaluate the expressions instead."""
        if not self.exists():
            return
        exprs = update_exprs if update_exprs is not None else self._field_exprs(
            df, update_fields
        )
        strict = update_exprs is not None or update_fields is not None
        self._apply_merge(df, exprs, insert_missing=False, strict=strict)

    SEQ_COL = "_seq_no"

    def upsert_occ(
        self, df: DataFrame, expected_col: str = "_if_seq_no"
    ) -> DataFrame:
        """ES optimistic concurrency control (`if_seq_no`): each source row
        names the sequence number it read (`expected_col`); a matched row
        updates ONLY when the target's current _seq_no equals it, and a
        successful update bumps _seq_no by one (the ES per-operation seq).
        Mismatched rows are left untouched and RETURNED as the conflict
        report (key, expected, current) — the set-oriented spelling of the
        ES 409 version_conflict_engine_exception, for the caller's
        read-retry loop (the reference retries update conflicts the same
        way). Unmatched source rows insert at seq 0 (upsert semantics;
        pass only known keys for strict ES if_seq_no behavior).

        The merge itself rides the same bucket-pruned MERGE machinery as
        every other write: one full-outer join per affected bucket, no
        driver materialization beyond the bucket list."""
        seq = self.SEQ_COL
        if not self.exists():
            raise ValueError("versioned upsert needs an existing table")
        if expected_col not in df.columns:
            raise ValueError(f"source is missing {expected_col!r}")
        sample = self.read().columns
        if seq not in sample:
            raise ValueError(
                f"table has no {seq!r} column — create it with seq 0 rows"
            )
        src = self._bucket(df).dropDuplicates([self.key])
        buckets = [
            r["bucket"] for r in src.select("bucket").distinct().collect()
        ]
        tgt = self._read_buckets(buckets)
        # conflict report BEFORE the merge (collected by the caller)
        conflicts = (
            tgt.drop("bucket").alias("t")
            .join(src.drop("bucket").alias("s"), self.key)
            .where(F.col(f"t.{seq}") != F.col(f"s.{expected_col}"))
            .select(
                F.col(self.key),
                F.col(f"s.{expected_col}").alias("expected"),
                F.col(f"t.{seq}").alias("current"),
            )
        )
        conflicts = self.spark.createDataFrame(
            conflicts.collect(), f"{self.key} long, expected long, current long"
        )
        ok = f"t.{seq} = s.{expected_col}"
        exprs = {
            c: f"CASE WHEN {ok} THEN s.{c} ELSE t.{c} END"
            for c in df.columns
            if c not in (self.key, expected_col, seq)
        }
        exprs[seq] = f"CASE WHEN {ok} THEN t.{seq} + 1 ELSE t.{seq} END"
        src_seeded = src.withColumn(seq, F.lit(0).cast("long"))
        merged = self._merge_exprs(
            self._read_buckets(buckets), src_seeded, exprs,
            insert_missing=True, strict=True,
        )
        self._overwrite_buckets(merged)
        return conflicts

    def delete(self, keys: DataFrame) -> None:
        """Remove rows whose key appears in `keys`."""
        if not self.exists():
            return
        src = self._bucket(keys.select(self.key)).dropDuplicates([self.key])
        buckets = [r["bucket"] for r in src.select("bucket").distinct().collect()]
        tgt = self._read_buckets(buckets)
        kept = tgt.join(src.select(self.key), self.key, "left_anti")
        # compute survivors BEFORE the overwrite invalidates the lazy scan
        surviving = {
            r["bucket"] for r in kept.select("bucket").distinct().collect()
        }
        self._overwrite_buckets(kept)
        # a bucket that lost ALL rows emits nothing, so dynamic overwrite
        # leaves its old files — drop those partition dirs explicitly
        # (Iceberg MERGE handles this natively in production)
        import shutil

        for b in set(buckets) - surviving:
            shutil.rmtree(os.path.join(self.path, f"bucket={b}"), ignore_errors=True)
