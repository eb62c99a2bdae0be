"""ES runtime fields (`runtime_mappings`): fields computed at search time
from a script, usable in queries, filters, sorts, and aggregations without
reindexing.

Reference behavior: ES evaluates the painless script per document during
the query phase; a runtime field may shadow a mapped field of the same
name, and later-defined runtime fields can reference earlier ones.

Here the script dialect is a Spark SQL expression (the engine's one script
dialect — stored scripts / script_score / ingest share it, state/scripts.py),
so a runtime mapping compiles to a PROJECTION: Catalyst collapses the whole
chain into the existing scan projection, the expressions run JVM-side in
whole-stage codegen, and any filter written against a runtime field that
folds to a deterministic input predicate still pushes down. Nothing is
materialized — exactly ES's "computed at search time" contract, at scan
throughput instead of per-doc script dispatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def validate_runtime_mappings(mappings: "dict[str, str]") -> None:
    """Parse every expression through Catalyst's expression parser so a
    broken script fails loudly at definition time (ES validates painless
    at the same point). F.expr is lazy in Spark 4 — Column creation no
    longer parses — so this goes straight to the session parser."""
    spark = SparkSession.getActiveSession()
    for name, source in mappings.items():
        if not name or not isinstance(source, str) or not source.strip():
            raise ValueError(f"runtime field {name!r} needs a non-empty expression")
        if spark is not None:
            spark._jsparkSession.sessionState().sqlParser().parseExpression(
                source
            )


def apply_runtime_mappings(
    df: DataFrame, mappings: "dict[str, str]"
) -> DataFrame:
    """Attach runtime fields to a frame. Definition order matters: a later
    field may reference an earlier one (chained withColumn — Catalyst
    collapses the chain to ONE projection). A runtime field whose name
    matches an existing column SHADOWS it, per ES semantics."""
    validate_runtime_mappings(mappings)
    out = df
    for name, source in mappings.items():
        out = out.withColumn(name, F.expr(source))
    return out
