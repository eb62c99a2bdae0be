"""Multi-process sharded index build — the deployment topology for this
host class (round-5, verdict item #5).

Measured repeatedly (scripts/ceiling_bench.py, BASELINE.md): one 32-thread
local JVM extracts ~half the build throughput of four independent 8-core
JVMs on the same box (108k vs 219k docs/s at the canonical shape) — the
same reason real Spark clusters run several 4-8 core executors per node
instead of one node-sized executor (GC, codegen JIT, and shuffle-client
contention all scale badly with executor width). `build_sharded` turns
that benchmark finding into a runnable path: N child PROCESSES (one JVM
each, `local[cores_per_shard]`) each build one shard index over a
disjoint hash-slice of the corpus, concurrently; the shards register as
a `query/sharded.ShardedIndex`, whose global-stats coordinator is
rank-identical to a monolithic index over the union corpus (tested —
the existing sharded-vs-monolithic identity suite runs over shards this
builder produced).

On a real cluster the same shape is N spark-submit jobs (or one job with
`DataFrameWriter.partitionBy`-style shard routing) — the shard contract
is only "disjoint doc sets, shared BM25 params", enforced here by the
deterministic hash slice.

CLI (also the child entry point)::

    python -m elasticsearch_assets_spark.index.sharded_build \
        --input /data/corpus_parquet --out /data/index \
        --shards 4 --cores 8
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_PKG_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _shard_slice(df, id_col: str, n_shards: int, shard: int):
    """Deterministic disjoint slice: pmod(xxhash64(id), n) == shard.
    Hash-based (not range) so any id distribution balances; xxhash64 is
    a JVM column expression, so the slice predicate rides the parquet
    scan of every child (each child reads the full file listing but
    filters before tokenization — the expensive stage)."""
    from pyspark.sql import functions as F

    return df.where(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)) == shard
    )


def build_one_shard(
    input_parquet: str,
    shard_dir: str,
    shard: int,
    n_shards: int,
    cores: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_segments: "int | None" = None,
    positions: bool = False,
    result_file: "str | None" = None,
    warm: bool = False,
) -> dict:
    """Child-process body: own SparkSession (own JVM), one shard.
    `warm=True` runs a tiny throwaway build first so the reported
    build_sec excludes one-time JVM/codegen/python-worker warmup (the
    ceiling_bench child protocol — deployment throughput is the warm
    number; cold-start amortizes over a real corpus)."""
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.session import get_spark

    spark = get_spark(
        app_name=f"shard_build_{shard}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    src = spark.read.parquet(input_parquet)
    part = _shard_slice(src, id_col, n_shards, shard)
    if warm:
        build_index(
            spark, part.limit(2000), shard_dir + ".warm",
            id_col=id_col, text_col=text_col, num_chunks=1,
        )
    t0 = time.monotonic()
    kwargs: dict = dict(
        id_col=id_col, text_col=text_col, num_chunks=1, positions=positions
    )
    if num_segments is not None:
        kwargs["num_segments"] = num_segments
    meta = build_index(spark, part, shard_dir, **kwargs)
    sec = time.monotonic() - t0
    out = {
        "shard": shard,
        "dir": shard_dir,
        "n_docs": meta.n_docs,
        "build_sec": round(sec, 3),
        "docs_per_sec": round(meta.n_docs / sec, 1) if sec > 0 else None,
    }
    if result_file:
        tmp = result_file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(out, fh)
        os.replace(tmp, result_file)
    spark.stop()
    return out


def build_sharded(
    input_parquet: str,
    out_dir: str,
    n_shards: int = 4,
    cores_per_shard: int = 8,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_segments: "int | None" = None,
    positions: bool = False,
    python: str = sys.executable,
    warm: bool = False,
) -> dict:
    """Build `n_shards` shard indexes in `n_shards` INDEPENDENT JVMs,
    concurrently. Returns {"shard_dirs": [...], "shards": [child result
    dicts], "total_docs", "wall_sec", "agg_docs_per_sec"} where
    agg_docs_per_sec = total_docs / max(child build_sec) — the
    concurrent-build throughput (children overlap; the slowest shard
    bounds the wall). Open the result with
    `ShardedIndex(spark, result["shard_dirs"])`.

    Each child is `python -m elasticsearch_assets_spark.index.
    sharded_build --child ...` — the exact process shape a per-node
    orchestrator (systemd unit, k8s pod, one spark-submit per shard)
    runs in production."""
    if n_shards < 1:
        raise ValueError("need n_shards >= 1")
    os.makedirs(out_dir, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = _PKG_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    results_files = []
    shard_dirs = []
    for i in range(n_shards):
        sd = os.path.join(out_dir, f"shard-{i:04d}")
        rf = os.path.join(out_dir, f".result-{i:04d}.json")
        shard_dirs.append(sd)
        results_files.append(rf)
        cmd = [
            python, "-m", "elasticsearch_assets_spark.index.sharded_build",
            "--child", "--input", input_parquet, "--shard-dir", sd,
            "--shard", str(i), "--shards", str(n_shards),
            "--cores", str(cores_per_shard),
            "--id-col", id_col, "--text-col", text_col,
            "--result", rf,
        ]
        if num_segments is not None:
            cmd += ["--segments", str(num_segments)]
        if positions:
            cmd.append("--positions")
        if warm:
            cmd.append("--warm")
        procs.append(subprocess.Popen(cmd, env=env))
    t0 = time.monotonic()
    fails = [i for i, p in enumerate(procs) if p.wait() != 0]
    wall = time.monotonic() - t0
    if fails:
        raise RuntimeError(f"shard build processes failed: {fails}")
    shards = [json.load(open(rf)) for rf in results_files]
    for rf in results_files:
        os.unlink(rf)
    total = sum(s["n_docs"] for s in shards)
    slowest = max(s["build_sec"] for s in shards)
    return {
        "shard_dirs": shard_dirs,
        "shards": shards,
        "total_docs": total,
        "wall_sec": round(wall, 3),
        "agg_docs_per_sec": round(total / slowest, 1) if slowest else None,
    }


def _main(argv: "list[str] | None" = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--input", required=True)
    ap.add_argument("--out")
    ap.add_argument("--shard-dir")
    ap.add_argument("--shard", type=int)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--segments", type=int)
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--result")
    args = ap.parse_args(argv)
    if args.child:
        build_one_shard(
            args.input, args.shard_dir, args.shard, args.shards, args.cores,
            id_col=args.id_col, text_col=args.text_col,
            num_segments=args.segments, positions=args.positions,
            result_file=args.result, warm=args.warm,
        )
        return
    if not args.out:
        ap.error("--out is required")
    res = build_sharded(
        args.input, args.out, args.shards, args.cores,
        id_col=args.id_col, text_col=args.text_col,
        num_segments=args.segments, positions=args.positions,
        warm=args.warm,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    _main()
