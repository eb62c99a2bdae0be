"""Full-mirror correctness artifact (round-3 verdict item #2).

The driver samples only ~50 of the contract rows per round; this script
runs EVERY `queries()` entry against its DuckDB oracle at sf0.01 — the
exact same check `tests/test_entry_contract.py` mirrors — and writes a
machine-readable `CONTRACT_LOCAL_r{N}.json` in the driver's row shape:

    {name: {rows_match, schema_match, hash_match,
            spark_rows, oracle_rows, err}}

so every row has an auditable record each round, not just the sampled
20%. Rows without an oracle (the declared non-SQL-expressible ops) get
the driver's weaker rows-only check (`hash_match: null`).

Usage: python scripts/contract_local.py [--round 4] [--sf-dir .../sf0.01]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def _normalize(df) -> list[tuple]:
    # byte-for-byte the local mirror's normalization
    import pandas as pd

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or f"CONTRACT_LOCAL_r{args.round:02d}.json"

    import duckdb

    import __spark_entry__ as entry_mod
    from elasticsearch_assets_spark.session import get_spark

    spark = get_spark(
        app_name="contract_local", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    t_start = time.time()
    for i, name in enumerate(sorted(queries)):
        rec: dict = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            got = queries[name](spark, args.sf_dir).toPandas()
            rec["spark_rows"] = int(len(got))
            sql = oracles.get(name)
            if sql is None:
                # rows-only check, like the driver's weaker record
                rec["rows_match"] = len(got) > 0 and len(got.columns) > 0
                rec["schema_match"] = len(got.columns) > 0
                rec["hash_match"] = None
            else:
                exp = con.sql(sql).df()
                rec["oracle_rows"] = int(len(exp))
                rec["rows_match"] = len(got) == len(exp)
                rec["schema_match"] = sorted(got.columns) == sorted(exp.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _normalize(got) == _normalize(exp)
                )
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        results[name] = rec
        ok = rec["hash_match"] if rec["hash_match"] is not None else rec["rows_match"]
        print(f"[{i + 1}/{len(queries)}] {name}: {'OK' if ok else 'FAIL'}", flush=True)

    n_full = sum(1 for r in results.values() if r["hash_match"])
    n_rows_only = sum(
        1 for r in results.values()
        if r["hash_match"] is None and r["rows_match"]
    )
    n_fail = len(results) - n_full - n_rows_only
    summary = {
        "_summary": {
            "total": len(results),
            "hash_match": n_full,
            "rows_only_ok": n_rows_only,
            "failed": n_fail,
            "sf_dir": args.sf_dir,
            "wall_sec": round(time.time() - t_start, 1),
        }
    }
    with open(out_path, "w") as fh:
        json.dump({**summary, **results}, fh, indent=1)
    print(
        f"{out_path}: {n_full} hash-match + {n_rows_only} rows-only OK, "
        f"{n_fail} failed, {summary['_summary']['wall_sec']} s"
    )
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
