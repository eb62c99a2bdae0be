"""Tombstone-cardinality stress (round-3 verdict item #6).

Measures what 10^6–10^7 undeleted tombstones — the pre-compaction worst
case the purge trigger bounds — cost each affected path:

* refresh_tombstones (driver load of both tiers into the numpy set);
* query latency with the exclusion set riding the scoring kernels
  (closure-captured numpy array → pickled per task);
* purge compaction, broadcast path vs the cogrouped distributed path.

Writes one JSON record to BENCH/tombstone_stress.json. Run solo (the
usual bench hygiene — no concurrent suites).

Usage: python scripts/tombstone_stress.py [--docs 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_assets_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--out", default="BENCH/tombstone_stress.json")
    args = ap.parse_args()

    from elasticsearch_assets_spark.datagen.pages import pages_df
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.index.merge import merge_segments
    from elasticsearch_assets_spark.index.tombstones import (
        add_tombstones_df,
        clear_tombstones,
        tombstone_count,
    )
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    spark = get_spark(master="local[16]", shuffle_partitions=32)
    base = "/tmp/tomb_stress"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    idx_dir = os.path.join(base, "idx")

    t0 = time.time()
    build_index(
        spark,
        pages_df(spark, args.docs, partitions=32),
        idx_dir,
        num_segments=16,
        num_chunks=1,
    )
    build_s = time.time() - t0

    def add_synthetic(n: int) -> float:
        # ids beyond the corpus range: np.isin pays full search cost,
        # zero rows actually drop — the pure-overhead worst case
        t = time.time()
        add_tombstones_df(
            idx_dir,
            spark.range(2_000_000_000, 2_000_000_000 + n).selectExpr(
                "id as doc_id"
            ),
        )
        return time.time() - t

    def query_ms(idx, reps=5) -> float:
        best = float("inf")
        for _ in range(reps):
            t = time.time()
            idx.search(["data", "system"], k=10, mode="and").collect()
            best = min(best, time.time() - t)
        return best

    rec: dict = {"docs": args.docs, "build_s": round(build_s, 3)}

    idx = InvertedIndex(spark, idx_dir)
    rec["query_s_tombstones_0"] = round(query_ms(idx), 3)

    for n, label in ((1_000_000, "1e6"), (10_000_000, "1e7")):
        clear_tombstones(idx_dir)
        rec[f"write_s_{label}"] = round(add_synthetic(n), 3)
        t = time.time()
        idx.refresh_tombstones()
        rec[f"refresh_s_{label}"] = round(time.time() - t, 3)
        assert idx.tombstones.size == n
        rec[f"query_s_tombstones_{label}"] = round(query_ms(idx), 3)

    # purge cost, both engines, on identical hard-to-clone state: rebuild
    # fresh indexes (hard links would share tombstone files)
    for cap, label in ((None, "broadcast_1e6"), (0, "cogroup_1e6")):
        d = os.path.join(base, f"purge_{label}")
        build_index(
            spark,
            pages_df(spark, args.docs, partitions=32),
            d,
            num_segments=16,
            num_chunks=1,
        )
        add_tombstones_df(
            d,
            spark.range(2_000_000_000, 2_001_000_000).selectExpr(
                "id as doc_id"
            ),
        )
        t = time.time()
        kw = {} if cap is None else {"tombstone_broadcast_cap": cap}
        merge_segments(spark, d, 16, apply_tombstones=True, **kw)
        rec[f"purge_s_{label}"] = round(time.time() - t, 3)
        assert tombstone_count(d) == 0

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
