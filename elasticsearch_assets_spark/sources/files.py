"""File-format ingestion sources: newline-delimited JSON and CSV.

Reference behavior: the reference's readers pull documents out of an
existing Elasticsearch cluster; the ingestion boundary of THIS engine is
raw files (a Common-Crawl-style corpus lands as ndjson/WET/CSV long before
it is a table). These readers give that boundary the same surface shape as
sources/reader.py: explicit schema, field projection, [start, end) date
predicate.

Design for 100 TB:

* **Explicit schema is REQUIRED.** Schema inference on text formats is a
  full extra pass over the data (Spark samples, DuckDB sniffs) and can
  mis-type columns between files; at ingest scale both are unacceptable.
* **Projection + filters still prune.** Spark pushes required columns into
  the JSON/CSV parsers (unneeded fields are never materialized) and — with
  `spark.sql.json.filterPushdown.enabled` / `...csv.filterPushdown.enabled`
  (default true) — evaluates pushed filters DURING parsing, skipping the
  rest of a rejected record.
* **Text formats are the ingest hop, not the working set.** One pass
  converts to parquet (columnar, splittable, predicate-pushable); every
  downstream operator here assumes that. `to_parquet` is that pass:
  read → optional repartition by a key → write, after which the date/id
  slicers (plans/) operate on footer-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _finish(
    df: DataFrame,
    fields: "list[str] | None",
    date_field: "str | None",
    start,
    end,
) -> DataFrame:
    if date_field is not None:
        if start is not None:
            df = df.where(F.col(date_field) >= F.lit(start))
        if end is not None:
            df = df.where(F.col(date_field) < F.lit(end))
    if fields:
        cols = list(fields)
        if date_field is not None and date_field not in cols:
            cols.append(date_field)  # forced date field, reader.py contract
        df = df.select(*cols)
    return df


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    fields: "list[str] | None" = None,
    date_field: "str | None" = None,
    start=None,
    end=None,
) -> DataFrame:
    """Newline-delimited JSON scan with an explicit schema (DDL string),
    optional projection and [start, end) date predicate. Records that
    fail to parse surface as all-null rows under the default PERMISSIVE
    mode; pass corrupt handling downstream or use mode options on top."""
    if not schema or not isinstance(schema, str):
        raise ValueError("read_ndjson requires an explicit DDL schema")
    df = spark.read.schema(schema).json(path)
    return _finish(df, fields, date_field, start, end)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    sep: str = ",",
    fields: "list[str] | None" = None,
    date_field: "str | None" = None,
    start=None,
    end=None,
) -> DataFrame:
    """CSV scan with an explicit schema. RFC-4180 quoting is assumed on
    both the write and read side (the contract row's oracle reads the
    same files through DuckDB's independent parser); prefer ndjson for
    free-text fields with exotic quoting."""
    if not schema or not isinstance(schema, str):
        raise ValueError("read_csv requires an explicit DDL schema")
    df = (
        spark.read.schema(schema)
        .option("header", str(bool(header)).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _finish(df, fields, date_field, start, end)


def to_parquet(
    df: DataFrame,
    out_dir: str,
    *,
    partition_by: "list[str] | None" = None,
    repartition: "int | None" = None,
) -> None:
    """The one-pass ingest conversion: text format -> parquet. At corpus
    scale this is where you pay parse cost ONCE; everything after runs on
    footer-pruned columnar scans."""
    if repartition:
        df = df.repartition(repartition)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(out_dir)
