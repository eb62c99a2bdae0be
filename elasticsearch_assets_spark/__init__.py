"""PySpark-native full-text engine with the capabilities of the Teraslice
``elasticsearch-assets`` operator bundle (reference at /root/reference, studied in
SURVEY.md) — built from scratch on DataFrames + vectorized Arrow UDFs.

Half A (what the reference's own code does): date-slice / id-slice planning,
match-query reader semantics, sink formatting — re-expressed as predicate-pushdown
scans with statistics-driven partitioning (``plans/``, ``sources/``, ``operators/``).

Half B (what the reference delegates to Elasticsearch): inverted-index build +
BM25 top-k query engine (``index/``, ``query/``).
"""

__version__ = "0.1.0"
