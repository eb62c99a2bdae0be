"""End-to-end training-data pipeline over a web-text corpus — every stage
is an operator from this repo, composed the way a production corpus build
would chain them:

  read → normalize → language ID → quality (heuristic + corpus-LM +
  hashed classifier) → exact dedup → near-dup (LSH) → keep-best →
  exact-substring span removal → decontaminate vs a benchmark set →
  leakage-free cluster split → temperature mixture → sample/upsample →
  context-window packing → balanced shards → corpus accounting

Run:  python scripts/pipeline_demo.py [sf_dir]   (default /root/testdata/sf0.01)

Each stage is lazy; the script materializes counts per stage so the whole
chain executes. At 100 TB the same composition holds: every stage is
either a zero-shuffle column pass (lang/quality/sample/chunk) or a
bucketed join documented in docs/SCALE.md (dedup family).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators import dedup as OD
from elasticsearch_assets_spark.operators import textstats as OT
from elasticsearch_assets_spark.operators.sampling import stratified_sample
from elasticsearch_assets_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="pipeline_demo", master="local[8]",
                      shuffle_partitions=16)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"[0] raw corpus: {n0} docs")

    # 1. language ID + quality, both zero-shuffle column passes
    lang = OT.lang_id(docs)
    qual = OT.quality_score(docs)
    enriched = (
        docs.join(lang.withColumnRenamed("doc_id", "doc_id"), "doc_id")
        .join(qual, "doc_id")
    )
    keep = enriched.where((F.col("quality") >= 0.3) & (F.col("pred_lang") != "und"))
    n1 = keep.count()
    print(f"[1] lang+quality filter: {n1} docs kept")

    # 2. exact dedup (hash groupBy)
    exact = OD.exact_dedup_filter(keep)
    n2 = exact.count()
    print(f"[2] exact dedup: {n2} docs")

    # 3. near-dup clustering (LSH candidates -> verify -> components);
    # 2-gram shingles — unigram sets are too coarse on short synthetic docs
    pairs = OD.lsh_candidate_pairs(exact, n=2, k=8, bands=4, threshold=0.8)
    clusters = OD.dedup_clusters(exact.select("doc_id"), pairs, max_iter=50)
    best = OD.dedup_keep_best(clusters, qual)
    survivors = exact.join(best.select("doc_id"), "doc_id", "left_semi")
    n3 = survivors.count()
    print(f"[3] near-dup keep-best: {n3} docs")

    # 4. decontaminate vs a held-out benchmark sample (n-gram rule):
    # decontaminate() returns the FLAGGED docs — anti-join to drop them
    bench = docs.where(F.col("doc_id") % 101 == 0)
    flagged = OD.decontaminate(survivors, bench, n=8)
    clean = survivors.join(flagged.select("doc_id"), "doc_id", "left_anti")
    n4 = clean.count()
    print(f"[4] decontaminated: {n4} docs ({survivors.count() - n4} flagged)")

    # 5. mixture sampling by language (deterministic hash cut)
    mixed = stratified_sample(
        clean, "lang", {"en": 0.9, "de": 0.6, "fr": 0.6, "es": 0.6, "zh": 0.4}
    )
    n5 = mixed.count()
    print(f"[5] mixture sample: {n5} docs")

    # 6. context-window chunking into training units
    chunks = OT.chunk_documents(mixed, window=64, stride=48)
    n6 = chunks.count()
    print(f"[6] chunks (64/48): {n6} training units")

    # 7. exact-substring duplicate-span removal (Lee et al. apply step)
    removed = OD.remove_duplicate_spans(mixed, L=8)
    n_rem = removed.agg(F.sum("n_removed")).head()[0] or 0
    print(f"[7] dup-span removal: {n_rem} tokens dropped corpus-wide")

    # 8. corpus-LM + hashed-classifier quality signals (zero/one-shuffle)
    lm = OT.unigram_lm_score(mixed)
    hc = OT.hash_classifier_score(mixed)
    q_join = lm.join(hc.select("doc_id", "score"), "doc_id")
    n8 = q_join.where((F.col("xent") > 1.0) & (F.col("score") > 0.2)).count()
    print(f"[8] LM+classifier band: {n8} docs inside the keep band")

    # 9. leakage-free train/holdout split on the near-dup clusters
    from elasticsearch_assets_spark.operators.sampling import cluster_split

    split = cluster_split(clusters, 0.1)
    n_hold = split.where("split = 'holdout'").count()
    print(f"[9] cluster split: {n_hold} docs held out (cluster-atomic)")

    # 10. temperature mixture -> per-stratum rates -> deterministic
    # upsampling of the under-represented strata
    from elasticsearch_assets_spark.operators.sampling import (
        temperature_rates,
        upsample,
    )

    acct0 = OT.corpus_accounting(mixed, ["lang"]).select("lang", "total_tokens")
    rates_df = temperature_rates(acct0, "lang", "total_tokens", 0.7, 30_000)
    rates = {r["lang"]: min(r["rate"], 3.0) for r in rates_df.collect()}
    balanced = upsample(mixed, "lang", rates, default_rate=1.0)
    n10 = balanced.count()
    print(f"[10] temperature-balanced corpus: {n10} rows (with copies)")

    # 11. pack into 2048-token context windows + token-balanced shards
    from elasticsearch_assets_spark.operators.packing import (
        balanced_shards,
        pack_documents,
    )

    packed = pack_documents(mixed, 2048, bucket_width=100)
    n_bins = packed.agg(F.max("bin")).head()[0] + 1
    shards = balanced_shards(mixed, 8)
    spread = shards.groupBy("shard").agg(F.sum("n_tokens").alias("t"))
    ts = [r["t"] for r in spread.collect()]
    print(f"[11] packed into {n_bins} windows; 8 shards within "
          f"{(max(ts) - min(ts)) / max(ts):.1%} token spread")

    # 12. accounting: what did we end up with, per stratum?
    acct = OT.corpus_accounting(mixed, ["lang"])
    print("[12] final mixture accounting:")
    for r in acct.collect():
        print(
            f"    {r['lang']}: {r['n_docs']} docs, "
            f"{r['total_tokens']} tokens, avg quality "
            f"{r['avg_quality']:.3f}"
        )

    # 13. training order: deterministic shards, easy-to-hard by quality
    from elasticsearch_assets_spark.operators.sampling import (
        curriculum_order,
    )

    order = curriculum_order(
        mixed.withColumn("q", F.length("text")), "q", 8, id_col="doc_id"
    )
    n13 = order.count()
    print(f"[13] curriculum order: {n13} rows across 8 shards")

    # 14. objective transforms: T5 span corruption + FIM (both
    # hash-deterministic — a resumed job emits byte-identical pairs)
    sc = OT.span_corruption(mixed.select("doc_id", "text").distinct())
    n14 = sc.where(F.col("targets") != "").count()
    fim = OT.fim_transform(mixed.select("doc_id", "text").distinct())
    modes = {r["mode"]: r["n"] for r in
             fim.groupBy("mode").agg(F.count("*").alias("n")).collect()}
    print(f"[14] span-corruption pairs with targets: {n14}; "
          f"FIM modes: {modes}")
    spark.stop()


if __name__ == "__main__":
    main()
