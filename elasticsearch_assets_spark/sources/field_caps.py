"""ES `_field_caps` API: per-field capabilities (type, searchable,
aggregatable, which indices carry the field) across one or more indices.

Reference behavior: clients call field_caps before building queries/aggs to
learn what each field supports; fields present in only some indices report
those indices.

Here an "index" is a parquet-backed table; capabilities derive from the
Spark schema with a deterministic Spark-type -> ES-type mapping. This is a
pure metadata operation — parquet FOOTERS only, no data pages, driver-side
(the same planning-level contract as index/stats.py disk_usage). The
contract-row oracle re-derives the identical table from DuckDB's
independent schema reader (DESCRIBE over the same files), so the two
footer readers cross-check.

Type mapping (documented contract):
  bigint->long, int->integer, smallint->short, tinyint->byte,
  float->float, double->double, boolean->boolean, date->date,
  timestamp/timestamp_ntz->date, binary->binary, string->keyword
  (except the analyzed body field `text`, which is ES `text`:
  searchable, NOT aggregatable), array<float>/array<double>->dense_vector
  (searchable via knn, not aggregatable). Unmapped Spark types raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SIMPLE = {
    "bigint": "long",
    "int": "integer",
    "smallint": "short",
    "tinyint": "byte",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "date",
    "timestamp_ntz": "date",
    "binary": "binary",
}

# (searchable, aggregatable) per ES type
_CAPS = {
    "text": (True, False),
    "dense_vector": (True, False),
    "binary": (False, False),
}

ANALYZED_BODY_FIELD = "text"  # the tokenizer contract's analyzed field


def _es_type(field_name: str, spark_type: str) -> str:
    if spark_type == "string":
        return "text" if field_name == ANALYZED_BODY_FIELD else "keyword"
    if spark_type in ("array<float>", "array<double>"):
        return "dense_vector"
    try:
        return _SIMPLE[spark_type]
    except KeyError:
        raise ValueError(
            f"field {field_name!r}: no ES type mapping for Spark type "
            f"{spark_type!r}"
        ) from None


def field_caps(
    spark: SparkSession, tables: "dict[str, DataFrame]"
) -> DataFrame:
    """Capabilities across `tables` ({index_name: frame}). Returns one row
    per (field, es_type): searchable, aggregatable, n_indices, and the
    comma-joined sorted index list (arrays would hash-compare fine, but a
    string keeps the oracle one expression)."""
    if not tables:
        raise ValueError("field_caps needs at least one index")
    acc: "dict[tuple[str, str], list[str]]" = {}
    for index_name in sorted(tables):
        for f in tables[index_name].schema.fields:
            es_t = _es_type(f.name, f.dataType.simpleString())
            acc.setdefault((f.name, es_t), []).append(index_name)
    rows = []
    for (field, es_t), idxs in sorted(acc.items()):
        searchable, aggregatable = _CAPS.get(es_t, (True, True))
        rows.append(
            (field, es_t, searchable, aggregatable, len(idxs),
             ",".join(sorted(idxs)))
        )
    return spark.createDataFrame(
        rows,
        "field string, es_type string, searchable boolean, "
        "aggregatable boolean, n_indices long, indices string",
    )
