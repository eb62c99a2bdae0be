"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(f"{v:.4f}" if not math.isnan(v) else "nan")
            elif isinstance(v, pd.Timestamp):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract entry (driver records the weaker check):
        # must run and produce rows with a stable schema
        got = q(spark, SF_DIR).toPandas()
        assert len(got) > 0 and len(got.columns) > 0
        return
    got = q(spark, SF_DIR).toPandas()
    exp = duck.sql(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"rowcount {len(got)} != {len(exp)}"
    assert _normalize(got) == _normalize(exp)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0]["score"] >= rows[-1]["score"]


def test_no_duplicate_contract_keys():
    """A repeated dict key in queries()/oracle_sql() silently shadows the
    earlier row (found once: two sessions both registered
    'ann_topk_filtered'). Parse the AST and reject duplicates."""
    import ast
    import collections

    tree = ast.parse(open(entry_mod.__file__).read())
    for fn in ast.walk(tree):
        if not (isinstance(fn, ast.FunctionDef) and fn.name in ("queries", "oracle_sql")):
            continue
        keys = [
            k.value
            for node in ast.walk(fn)
            if isinstance(node, ast.Dict)
            for k in node.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        ]
        dupes = [k for k, n in collections.Counter(keys).items() if n > 1]
        assert not dupes, f"duplicate contract keys in {fn.name}(): {dupes}"


def test_no_duplicate_toplevel_names():
    """Python's last-assignment-wins silently shadows an earlier module
    constant or function — bitten twice now (_PTOKS_CTE in session 3,
    _FACET_EXT_STATS_SQL in session 10: the new bucket oracle shadowed the
    extended_stats agg's oracle and the driver gate caught the mismatch).
    Reject ANY duplicated top-level assignment or def in the entry
    module."""
    import ast
    import collections

    tree = ast.parse(open(entry_mod.__file__).read())
    names: collections.Counter = collections.Counter()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names[t.id] += 1
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            names[node.name] += 1
    dups = {n: c for n, c in names.items() if c > 1}
    assert not dups, f"shadowed top-level names: {dups}"
