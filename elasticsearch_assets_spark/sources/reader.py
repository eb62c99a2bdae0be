"""Reader facade: the `elasticsearch_reader` / `id_reader` operator surface
re-expressed on DataFrames (SURVEY.md §2.1 S1-S5).

A reader = table path + validated config (date field, size, lucene query,
fields projection, geo filters, key settings). The reference splits this into
a slicer (planning) and per-slice fetches; here `dataframe()` gives the whole
scoped scan (Catalyst pushes every predicate down) and `plan()`/`read_slice()`
expose the reference's slice-by-slice contract for checkpointed batch jobs.

Config validation mirrors the convict schema rules at
/root/reference/asset/elasticsearch_reader/index.js:24-234:
  - date reader requires `date_field_name` (throws if missing: slicer.js:115-117)
  - `fields` projection force-includes the date field
    (/root/reference/asset/simple_api_reader/index.js:52-55)
  - geo params: box and point+distance are mutually exclusive; both need
    `geo_field` (index.js:236-276)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from elasticsearch_assets_spark.operators import geo as geo_ops
from elasticsearch_assets_spark.plans.date_slicer import (
    CombinedSlice,
    DateSlice,
    DateSlicePlan,
    combined_predicate,
    plan_date_slices,
    slice_predicate,
    subslice_by_key,
)
from elasticsearch_assets_spark.plans.datemath import parse_date_math
from elasticsearch_assets_spark.plans.id_slicer import (
    KeySlice,
    key_predicate,
    plan_key_slices,
)
from elasticsearch_assets_spark.query.lucene import compile_filter, parse_lucene, text_terms
from elasticsearch_assets_spark.sources.tables import load_table


@dataclass
class ReaderConfig:
    path: str
    date_field_name: str | None = None
    size: int = 5000  # reference default, elasticsearch_reader/index.js:50
    start: str | None = None  # ISO / epoch-ms / date-math
    end: str | None = None
    query: str | None = None  # lucene subset, ANDed onto every slice (P4)
    fields: list[str] | None = None
    time_resolution: str = "ms"  # 's' | 'ms' (index.js:168-186)
    # geo (P5/P6/F6)
    geo_field: str | None = None
    geo_box_top_left: str | None = None
    geo_box_bottom_right: str | None = None
    geo_point: str | None = None
    geo_distance: str | None = None
    geo_sort_point: str | None = None
    geo_sort_order: str = "asc"
    # output unit for the sort distance (reference geo_sort_unit,
    # index.js:228-235): when set, the scan gains a `_distance` column in
    # that unit (sort order itself is unit-independent)
    geo_sort_unit: str | None = None
    # id reader (S3/S4)
    key_field: str | None = None
    key_type: str = "base64url"
    key_range: list[str] | None = None
    starting_key_depth: int = 1
    # X4: secondary key-splitting of hot date ranges
    # (subslice_key_threshold default: elasticsearch_reader/index.js:154)
    subslice_by_key: bool = False
    subslice_key_threshold: int = 50_000
    # ES sliced scroll (`slice: {id, max}`): deterministic hash partition of
    # the scan by a key column — worker w of W reads slice_id=w, slice_max=W.
    # ES hashes _id with murmur; the engine contract is the cross-engine
    # 60-bit md5 hash (operators/texthash.py), same split every run.
    slice_id: int | None = None
    slice_max: int | None = None
    slice_field: str | None = None  # defaults to key_field
    # analysis
    text_col: str = "text"
    # ES runtime fields (runtime_mappings): search-time computed columns
    # in the engine's one script dialect (Spark SQL expressions — the same
    # contract as script_score / scripted updates). Applied to the scan
    # BEFORE predicates/projection/sort, so runtime fields are queryable
    # in the Lucene surface, projectable via `fields`, and sortable —
    # exactly the ES contract. They may shadow mapped columns (ES
    # shadowing semantics). Predicates on runtime fields evaluate in the
    # JVM (no parquet pushdown — true in ES too: runtime fields cost at
    # query time); all other predicates keep their pushdown.
    runtime_mappings: "dict[str, str] | None" = None

    def __post_init__(self) -> None:
        box = self.geo_box_top_left or self.geo_box_bottom_right
        dist = self.geo_point or self.geo_distance
        if (box or dist) and not self.geo_field:
            raise ValueError("geo parameters require geo_field")
        if box and dist:
            raise ValueError(
                "geo_box_* and geo_point/geo_distance are mutually exclusive"
            )
        if box and not (self.geo_box_top_left and self.geo_box_bottom_right):
            raise ValueError("geo box needs both corners")
        if dist and not (self.geo_point and self.geo_distance):
            raise ValueError("geo distance needs geo_point and geo_distance")
        if self.geo_box_top_left:
            geo_ops.parse_geo_point(self.geo_box_top_left)
            geo_ops.parse_geo_point(self.geo_box_bottom_right)
        if self.geo_point:
            geo_ops.parse_geo_point(self.geo_point)
            geo_ops.parse_distance(self.geo_distance)
        if self.time_resolution not in ("s", "ms"):
            raise ValueError("time_resolution must be 's' or 'ms'")
        if self.runtime_mappings:
            import re as _re

            for name in self.runtime_mappings:
                if not _re.match(r"^[A-Za-z_]\w*$", name):
                    raise ValueError(
                        f"runtime field name must be an identifier: {name!r}"
                    )
        if (self.slice_id is None) != (self.slice_max is None):
            raise ValueError("sliced scroll needs both slice_id and slice_max")
        if self.slice_id is not None:
            if self.slice_max < 2:
                raise ValueError("slice_max must be >= 2 (the ES contract)")
            if not (0 <= self.slice_id < self.slice_max):
                raise ValueError("slice_id must be in [0, slice_max)")
            if self.slice_field is None and self.key_field is None:
                raise ValueError("sliced scroll needs slice_field or key_field")


def slice_predicate_col(field: str, slice_id: int, slice_max: int) -> Column:
    """ES sliced-scroll partition predicate: doc belongs to slice s of W iff
    hash60(field) % W == s. Slices are disjoint and cover the table by
    construction (tested), so W independent jobs can split one scan with no
    coordination — the reference's multi-worker scroll contract. Stays a
    pushable-adjacent JVM expression (md5+conv in codegen; the scan itself
    still prunes on any conjoined range predicates)."""
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    return (hash60_expr(F.col(field).cast("string")) % slice_max) == slice_id


def slice_predicate_sql(field: str, slice_id: int, slice_max: int) -> str:
    """DuckDB twin of slice_predicate_col (value-identical hash)."""
    from elasticsearch_assets_spark.operators.texthash import hash60_sql

    return f"({hash60_sql(f'CAST({field} AS VARCHAR)')} % {slice_max}) = {slice_id}"


def attach_metadata(
    df: DataFrame,
    *,
    key_col: str | None = None,
    event_ts_col: str | None = None,
    index_name: str | None = None,
) -> DataFrame:
    """S1 metadata mapping: the reference wraps every hit as
    DataEntity.make(_source, {_key, _processTime, _ingestTime, _eventTime,
    _index}) (/root/reference/asset/elasticsearch_reader/reader.js:14-28).
    Spark has no hidden per-row metadata, so they become plain columns:
    deterministic where possible (_key from a column, _event_ts from the
    date field), wall-clock stamps where the reference also used wall-clock.
    """
    out = df
    if key_col is not None:
        out = out.withColumn("_key", F.col(key_col).cast("string"))
    else:
        # engine-assigned deterministic key (C7) — content hash
        out = out.withColumn(
            "_key", F.sha1(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
        )
    now = F.current_timestamp()
    out = out.withColumn("_process_ts", now).withColumn("_ingest_ts", now)
    if event_ts_col is not None:
        out = out.withColumn("_event_ts", F.col(event_ts_col))
    if index_name is not None:
        out = out.withColumn("_index", F.lit(index_name))
    return out


def apply_runtime_mappings(df: DataFrame, mappings: "dict[str, str]") -> DataFrame:
    """ES runtime fields: one withColumn(F.expr(script)) per field, in
    insertion order (later scripts may reference earlier runtime fields,
    the ES `emit`-chain composition)."""
    for name, script in mappings.items():
        df = df.withColumn(name, F.expr(script))
    return df


class BaseReader:
    def __init__(self, spark: SparkSession, config: ReaderConfig):
        self.spark = spark
        self.config = config
        self._ast = parse_lucene(config.query) if config.query else None

    # -- scan assembly ------------------------------------------------------

    def _base(self) -> DataFrame:
        df = load_table(self.spark, self.config.path)
        if self.config.runtime_mappings:
            df = apply_runtime_mappings(df, self.config.runtime_mappings)
        return df

    def _predicates(self) -> Column | None:
        c = self.config
        pred: Column | None = None

        def conj(p: Column | None, q: Column) -> Column:
            return q if p is None else (p & q)

        if c.start is not None and c.date_field_name:
            lo = parse_date_math(str(c.start)).replace(tzinfo=None)
            pred = conj(pred, F.col(c.date_field_name) >= F.lit(lo))
        if c.end is not None and c.date_field_name:
            hi = parse_date_math(str(c.end)).replace(tzinfo=None)
            pred = conj(pred, F.col(c.date_field_name) < F.lit(hi))
        if self._ast is not None:
            pred = conj(
                pred, compile_filter(self._ast, text_col=c.text_col)
            )
        if c.geo_field:
            lat, lon = geo_ops.point_cols(c.geo_field)
            if c.geo_box_top_left:
                pred = conj(
                    pred,
                    geo_ops.bbox_predicate(
                        lat, lon, c.geo_box_top_left, c.geo_box_bottom_right
                    ),
                )
            if c.geo_point:
                pred = conj(
                    pred,
                    geo_ops.distance_predicate(lat, lon, c.geo_point, c.geo_distance),
                )
        if c.slice_id is not None:
            fieldname = c.slice_field or c.key_field
            pred = conj(
                pred, slice_predicate_col(fieldname, c.slice_id, c.slice_max)
            )
        return pred

    def _project(self, df: DataFrame) -> DataFrame:
        c = self.config
        if not c.fields:
            return df
        cols = list(c.fields)
        # the date field is force-included so slicing stays possible (P1)
        if c.date_field_name and c.date_field_name not in cols:
            cols.append(c.date_field_name)
        return df.select(*cols)

    def _sort(self, df: DataFrame) -> DataFrame:
        c = self.config
        if c.geo_sort_point and c.geo_field:
            lat, lon = geo_ops.point_cols(c.geo_field)
            if c.geo_sort_unit:
                dist = geo_ops.distance_col(
                    lat, lon, c.geo_sort_point, unit=c.geo_sort_unit
                )
                df = df.withColumn("_distance", dist)
                col = F.col("_distance")
                return df.orderBy(
                    col.asc() if c.geo_sort_order == "asc" else col.desc()
                )
            return df.orderBy(
                geo_ops.distance_sort(
                    lat, lon, c.geo_sort_point, ascending=c.geo_sort_order == "asc"
                )
            )
        return df

    def dataframe(self) -> DataFrame:
        """The whole scoped scan: range ∧ (user query) ∧ geo, projected and
        sorted — one declarative plan, every structured predicate pushed down."""
        df = self._base()
        pred = self._predicates()
        if pred is not None:
            df = df.where(pred)
        return self._sort(self._project(df))

    def count(self) -> int:
        """F4: count without fetch."""
        df = self._base()
        pred = self._predicates()
        return (df.where(pred) if pred is not None else df).count()

    def bm25_terms(self) -> list[str]:
        """Free-text terms of the query — route to the Half-B index for
        relevance ranking (the part the reference delegates to ES)."""
        return text_terms(self._ast, text_col=self.config.text_col) if self._ast is not None else []


class DateReader(BaseReader):
    """S1/S2: date-range reader with adaptive slice planning."""

    def __init__(self, spark: SparkSession, config: ReaderConfig):
        if not config.date_field_name:
            raise ValueError("date reader requires date_field_name")  # slicer.js:115-117
        super().__init__(spark, config)

    def plan(self) -> DateSlicePlan:
        df = self._base()
        pred = self._predicates()
        if pred is not None:
            df = df.where(pred)
        c = self.config
        return plan_date_slices(
            df,
            c.date_field_name,
            size=c.size,
            start=parse_date_math(str(c.start)) if c.start else None,
            end=parse_date_math(str(c.end)) if c.end else None,
            resolution=c.time_resolution,
        )

    def plan_with_subslices(self) -> list["DateSlice | CombinedSlice"]:
        """X4: the date plan with hot ranges secondarily split by key prefix
        (requires key_field; subslice_by_key config)."""
        c = self.config
        if not (c.subslice_by_key and c.key_field):
            raise ValueError("plan_with_subslices needs subslice_by_key + key_field")
        df = self._base()
        pred = self._predicates()
        if pred is not None:
            df = df.where(pred)
        return subslice_by_key(
            df, c.date_field_name, c.key_field, self.plan(),
            threshold=c.subslice_key_threshold, size=c.size,
            key_type=c.key_type, starting_depth=c.starting_key_depth,
        )

    def read_slice(self, sl: "DateSlice | CombinedSlice") -> DataFrame:
        c = self.config
        if isinstance(sl, CombinedSlice):
            base_pred = combined_predicate(c.date_field_name, c.key_field, sl)
        else:
            base_pred = slice_predicate(c.date_field_name, sl)
        df = self._base().where(base_pred)
        pred = self._predicates()
        if pred is not None:
            df = df.where(pred)
        return self._sort(self._project(df))

    def repartitioned(self, plan: DateSlicePlan | None = None) -> DataFrame:
        """Whole scan, range-partitioned on the date field so each task gets
        ~`size` docs — the Spark-native equivalent of slice dispatch."""
        plan = plan or self.plan()
        n = max(1, len(plan.slices))
        return self.dataframe().repartitionByRange(n, F.col(self.config.date_field_name))


class IdReader(BaseReader):
    """S3/S4: keyspace-prefix reader."""

    def __init__(self, spark: SparkSession, config: ReaderConfig):
        if not config.key_field:
            raise ValueError("id reader requires key_field")
        super().__init__(spark, config)

    def plan(self, after_key: str | None = None) -> list[KeySlice]:
        df = self._base()
        pred = self._predicates()
        if pred is not None:
            df = df.where(pred)
        c = self.config
        return plan_key_slices(
            df,
            c.key_field,
            size=c.size,
            key_type=c.key_type,
            key_range=c.key_range,
            starting_depth=c.starting_key_depth,
            after_key=after_key,
        )

    def read_slice(self, sl: KeySlice) -> DataFrame:
        df = self._base().where(key_predicate(self.config.key_field, sl))
        pred = self._predicates()
        if pred is not None:
            df = df.where(pred)
        return self._sort(self._project(df))
