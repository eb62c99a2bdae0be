"""Per-round benchmark: headline index-build throughput + BM25 query latencies.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {<name>: sec, ...}, "sf": <sf>, ...extras}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_DOCS (pages corpus size,
default scaled from sf). Scaling-evidence protocol lives in
scripts/scaling_bench.py (writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.pages import pages_df
from elasticsearch_assets_spark.index.build import build_index
from elasticsearch_assets_spark.query.engine import InvertedIndex
from elasticsearch_assets_spark.session import get_spark
from elasticsearch_assets_spark.sources.tables import load_sf_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_SF = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
try:
    SF = float(_SF)
except ValueError:
    SF = 0.1
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(int(2_000_000 * SF))))

BENCH_QUERIES = [
    ("q_and2", ["spark", "join"], "and", 10),
    ("q_and3", ["query", "scan", "merge"], "and", 10),
    ("q_and_rare", ["term0500", "term0123"], "and", 10),
    ("q_or2", ["spark", "crawl"], "or", 10),
    ("q_or_head", ["the", "data"], "or", 10),
    ("q_or_mixed", ["term1500", "index", "web"], "or", 100),
    ("q_single_head", ["the"], "and", 10),
    ("q_single_tail", ["term1234"], "and", 10),
]


def main() -> None:
    t_total = time.monotonic()
    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    queries: dict[str, float] = {}
    extras: dict[str, object] = {}

    # --- corpus prep (not counted in build time; cached across rounds) ------
    pages_path = f"/tmp/esa_bench_pages_{N_PAGES}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        pages_df(spark, N_PAGES, partitions=max(CPUS, 16)).write.mode(
            "overwrite"
        ).parquet(pages_path)
    corpus = spark.read.parquet(pages_path)

    # warm JVM + python-UDF worker pool (first mapInPandas stage pays worker
    # fork + import costs) with the small documents-table build.
    # `index_build_documents` keeps the historical cold-inclusive number for
    # round-over-round comparability; the r1->r2 "regression" in it was
    # root-caused to cold-start noise (the table is 5k docs — warm builds
    # run ~1.2-1.4 s regardless of round; cold adds 4-7 s of one-time
    # worker-pool fork + imports that varies with host load), so the warm
    # best-of-2 below is the number that tracks the actual build path.
    t0 = time.monotonic()
    docs = load_sf_table(spark, SF_DIR, "documents")
    build_index(
        spark, docs, "/tmp/esa_bench_idx_documents", num_segments=8, num_chunks=1
    )
    queries["index_build_documents"] = round(time.monotonic() - t0, 3)
    warm = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        build_index(
            spark, docs, "/tmp/esa_bench_idx_documents",
            num_segments=8, num_chunks=1,
        )
        warm = min(warm, time.monotonic() - t0)
    queries["index_build_documents_warm"] = round(warm, 3)

    # --- headline: index build throughput (best of 2 — the shared-host VM
    # adds up to 2x wall noise to single runs) -------------------------------
    build_sec = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        meta = build_index(
            spark, corpus, f"/tmp/esa_bench_idx_{N_PAGES}", num_chunks=1
        )
        build_sec = min(build_sec, time.monotonic() - t0)
    queries["index_build_pages"] = round(build_sec, 3)
    extras["index_docs_per_sec"] = round(N_PAGES / build_sec, 1)
    extras["index_tokens_per_sec"] = round(meta.total_tokens / build_sec, 1)
    extras["n_pages"] = N_PAGES

    # positional variant (phrase/proximity support): same corpus, positions
    # ride as one extra binary column — the delta vs index_build_pages is
    # the cost of the positional stream
    t0 = time.monotonic()
    build_index(
        spark, corpus, f"/tmp/esa_bench_idx_{N_PAGES}_pos",
        num_chunks=1, positions=True,
    )
    queries["index_build_pages_pos"] = round(time.monotonic() - t0, 3)

    # --- query latencies over the pages index ------------------------------
    idx = InvertedIndex(spark, f"/tmp/esa_bench_idx_{N_PAGES}")
    lats: list[float] = []
    for name, terms, mode, k in BENCH_QUERIES:
        reps = []
        for _ in range(3):
            t0 = time.monotonic()
            idx.search(terms, k=k, mode=mode).collect()
            reps.append(time.monotonic() - t0)
        best = min(reps)
        queries[name] = round(best, 3)
        lats.extend(reps)
    lats.sort()
    extras["query_p50_sec"] = round(statistics.median(lats), 3)
    extras["query_p95_sec"] = round(lats[int(len(lats) * 0.95) - 1], 3)

    # serving path: same kernels, one pushed-down scan job + driver scoring
    slats: list[float] = []
    for name, terms, mode, k in BENCH_QUERIES:
        for _ in range(3):
            t0 = time.monotonic()
            idx.search_local(terms, k=k or 10, mode=mode)
            slats.append(time.monotonic() - t0)
    slats.sort()
    extras["serving_p50_sec"] = round(statistics.median(slats), 3)
    extras["serving_p95_sec"] = round(slats[int(len(slats) * 0.95) - 1], 3)

    # NOTE: thread-pooled QPS was measured and removed — py4j + the GIL
    # serialize driver-side jobs, so concurrent-thread numbers just restate
    # p50. Horizontal serving scale = multiple driver processes per index.

    # --- round-3 surface: positional queries, rewrites, query strings ------
    pidx = InvertedIndex(spark, f"/tmp/esa_bench_idx_{N_PAGES}_pos")

    def q_best(name, fn, reps: int = 3) -> None:
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        queries[name] = round(best, 3)

    q_best("q_phrase", lambda: pidx.search_phrase("the join", k=10).collect())
    q_best(
        "q_near",
        lambda: pidx.search_near("the", "join", slop=3, k=10).collect(),
    )
    # 100-term dictionary rewrite (term12xx) run as a scored OR
    q_best("q_prefix100", lambda: idx.search_prefix("term12", k=10).collect())
    # same prefix through the search-as-you-type companion index: ONE
    # posting lookup instead of the 100-term scored OR (round-3 verdict
    # item #4 — the scale path: expansion width grows with vocabulary,
    # this stays O(1) terms). Built once per bench dir, reused like the
    # main index; hi=8 covers the 6-char bench prefix.
    sayt_dir = f"/tmp/esa_bench_idx_{N_PAGES}_sayt"
    if not os.path.exists(os.path.join(sayt_dir, "meta.json")):
        from elasticsearch_assets_spark.index.build import build_sayt_index

        build_sayt_index(
            spark, corpus, sayt_dir, lo=2, hi=8, num_chunks=1
        )
    idx.attach_sayt(InvertedIndex(spark, sayt_dir), lo=2, hi=8)
    q_best(
        "q_prefix_sayt",
        lambda: idx.search_prefix_sayt("term12", k=10).collect(),
    )
    # type-ahead compound: full-token clause + sayt prefix clause summed
    q_best(
        "q_mbp_sayt",
        lambda: idx.match_bool_prefix_sayt("the term12", k=10).collect(),
    )
    # the DEFAULT route a naive user hits (round-5): a plain DSL
    # {"prefix": ...} body on the sayt-attached index — auto-routes to
    # the companion (ES index_prefixes transparent rewrite), so this row
    # should read ~q_prefix_sayt, not ~q_prefix100
    from elasticsearch_assets_spark.query.dsl import search_dsl as _sdsl

    q_best(
        "q_prefix_dsl",
        lambda: _sdsl(
            idx, {"query": {"prefix": {"text": "term12"}}, "size": 10}
        ).collect(),
    )
    # full query-string composition: term AND 100-term rewrite AND filter,
    # structured part restricted through the cogrouped distributed path
    q_best(
        "q_querystring",
        lambda: idx.search_querystring(
            f"the AND term12* AND doc_id:>={N_PAGES // 2}", corpus, k=10
        ).collect(),
    )
    # compound queries: msm counting pass, head-term exclusion, dis_max agg
    q_best(
        "q_msm",
        lambda: idx.search(
            ["spark", "join", "merge"], k=10, mode="or", min_should_match=2
        ).collect(),
    )
    q_best(
        "q_mustnot",
        lambda: idx.search(["spark", "join"], k=10, must_not=["the"]).collect(),
    )
    q_best(
        "q_dismax",
        lambda: idx.dis_max(
            [["spark", "join"], ["index", "web"]], tie_breaker=0.3, k=10
        ).collect(),
    )
    # simple_query_string: groups + prefix rewrite + index-assisted negation
    q_best(
        "q_sqs",
        lambda: idx.search_simple_query_string(
            "spark term12* index|web -the", k=10
        ).collect(),
    )
    # intervals: ordered 3-term chain over positional postings
    q_best(
        "q_intervals",
        lambda: pidx.search_intervals(
            ["the", "join", "web"], max_gaps=12, k=10
        ).collect(),
    )
    # span_or of an enumerated near window and a term
    q_best(
        "q_span_or",
        lambda: pidx.search_span_or(
            [("near", "the", "join", 3, True), ("term", "crawl")], k=10
        ).collect(),
    )

    # --- training-data pipeline operators over the sf tables ----------------
    from elasticsearch_assets_spark.operators import dedup as OD
    from elasticsearch_assets_spark.operators import similarity as OS

    docs = load_sf_table(spark, SF_DIR, "documents")
    emb = load_sf_table(spark, SF_DIR, "embeddings")
    qv = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]

    def op_best(name, fn, reps: int = 2) -> None:
        # best-of: the first run pays whole-stage-codegen compilation for
        # the op's (large) expression trees; steady-state is what scales
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        queries[name] = round(best, 3)

    op_best("op_minhash_sigs", lambda: OD.minhash_signatures(docs, n=1, k=8).count())
    # max_bucket: the synthetic vocab is tiny, so identical-signature
    # buckets degenerate — the skew cap is the designed defense
    op_best(
        "op_lsh_candidates",
        lambda: OD.lsh_candidate_pairs(docs, n=1, k=8, bands=4, max_bucket=100).count(),
    )
    # candidate-local verification (round-2 fix: per-pair set intersection,
    # never the corpus-wide pairwise Jaccard join)
    op_best(
        "op_lsh_verified",
        lambda: OD.lsh_candidate_pairs(
            docs, n=1, k=8, bands=4, max_bucket=100, threshold=0.8
        ).count(),
    )
    # 60-bit / 15-bit-block defaults; explicit skew cap = the scale config
    op_best(
        "op_simhash_pairs",
        lambda: OD.simhash_pairs(docs, max_bucket=1_000_000).count(),
    )
    op_best("op_ann_bruteforce", lambda: OS.cosine_topk(emb, qv, k=10).collect())
    from elasticsearch_assets_spark.operators.textstats import repetition_stats

    op_best("op_repetition_stats", lambda: repetition_stats(docs).count())
    # PII scrub: map-only regexp pass over the full pages corpus
    from elasticsearch_assets_spark.operators.textstats import pii_scrub

    op_best("op_pii_scrub", lambda: pii_scrub(corpus).count())
    # percolator: 32 stored queries vs the full pages corpus in one
    # tokenize pass + broadcast join
    from elasticsearch_assets_spark.operators.percolate import (
        make_queries,
        percolate,
    )

    perc_specs = [
        (i, [f"term{i:04d}", "the"], 2) for i in range(16)
    ] + [(100 + i, [f"term1{i:03d}"], 1) for i in range(16)]
    perc_qs = make_queries(spark, perc_specs)
    op_best("op_percolate", lambda: percolate(perc_qs, corpus).count())
    # passage-level dedup + benchmark decontamination (round-3 webtext ops)
    op_best("op_dedup_passages", lambda: OD.dedup_passages(docs, n=4).count())
    op_best(
        "op_decontaminate",
        lambda: OD.decontaminate(
            docs, docs.where(F.col("doc_id") % 101 == 0), n=8
        ).count(),
    )

    # multi_match: two per-field searches + one hash-agg combine (both
    # fields backed by same-corpus indexes here — the timing exercises the
    # real two-search union plan)
    from elasticsearch_assets_spark.query.engine import multi_match as MM

    q_best(
        "q_multi_match",
        lambda: MM(
            {"text": (idx, 1.0), "pos": (pidx, 2.0)},
            ["spark", "join"], match_type="best_fields", tie_breaker=0.3, k=10,
        ).collect(),
    )
    # term suggester: full-dictionary levenshtein scan + TakeOrdered
    q_best("q_suggest", lambda: idx.suggest("spork", max_edits=2, size=5).collect())
    # composite agg page (keyset filter before the grouped shuffle)
    from elasticsearch_assets_spark.operators.facets import facet_composite

    q_best(
        "q_composite_page",
        lambda: facet_composite(
            corpus, ["lang", "doc_key"], size=100, after=("de", "k")
        ).collect(),
    )

    # phrase + WIDE filter (90% of the corpus) through the cogrouped
    # ladder — the regime where the old phrase+filter path raised at
    # collect_cap; ids ship executor-side instead
    q_best(
        "q_phrase_filtered_wide",
        lambda: pidx.search_phrase_filtered(
            "the join", corpus.where(F.col("doc_id") % 10 != 0),
            k=10, strategy="cogroup",
        ).collect(),
    )

    # _msearch fusion: all 8 headline queries in ONE segment scan vs run
    # separately — the amortization a batched query front-end gets (the
    # per-query results are bit-identical to search(), tested)
    msearch_specs = [
        {"query": terms, "mode": mode, "k": k or 10}
        for _, terms, mode, k in BENCH_QUERIES
    ]
    q_best("q_msearch8_fused", lambda: idx.msearch(msearch_specs).collect())
    q_best(
        "q_msearch8_separate",
        lambda: [
            idx.search(t, k=k or 10, mode=m).collect()
            for _, t, m, k in BENCH_QUERIES
        ],
    )
    # learned-sparse (text_expansion) scoring: weighted 6-token query,
    # one pushed scan + one hash agg on doc_id
    q_best(
        "q_sparse",
        lambda: idx.search_sparse(
            {"spark": 1.0, "join": 0.7, "index": 0.5, "web": 0.4,
             "crawl": 0.3, "term1234": 1.5},
            k=10,
        ).collect(),
    )
    # int8-quantized ANN vs the float brute-force baseline above
    op_best(
        "op_ann_int8", lambda: OS.quantized_cosine_topk(emb, qv, k=10).collect()
    )
    # deterministic mixture sampling over the full pages corpus (pure JVM
    # filter on the scan — zero shuffle)
    from elasticsearch_assets_spark.operators.sampling import stratified_sample

    op_best(
        "op_mixture_sample",
        lambda: stratified_sample(
            corpus, "lang", {"en": 0.5, "de": 0.9, "fr": 0.1},
            default_rate=0.25,
        ).count(),
    )
    # Apriori frequent pairs over the documents table (level-1 prune then
    # JVM pair expansion); support scales with the table
    from elasticsearch_assets_spark.operators.itemsets import frequent_pairs

    n_docs_sf = docs.count()
    op_best(
        "op_frequent_pairs",
        lambda: frequent_pairs(
            docs, "doc_id", "split(text, ' ')", max(int(n_docs_sf * 0.3), 2)
        ).count(),
    )

    # filtered search on the documents index (cogrouped executor-side path)
    didx = InvertedIndex(spark, "/tmp/esa_bench_idx_documents")
    filt = docs.where(F.col("doc_id") % 3 == 0)
    reps = []
    for _ in range(3):
        t0 = time.monotonic()
        didx.search_filtered(["spark", "table"], filt, k=10, mode="or").collect()
        reps.append(time.monotonic() - t0)
    queries["q_filtered_cogroup"] = round(min(reps), 3)

    # LOW-selectivity filtered search on the big pages index: 90% of the
    # corpus passes the filter, i.e. the regime where the broadcast path
    # would have collected ~N ids to the driver — the forced cogroup plan
    # ships them executor-side instead (round-2 verdict item #7)
    wide = corpus.where(F.col("doc_id") % 10 != 0)
    reps = []
    for _ in range(3):
        t0 = time.monotonic()
        idx.search_filtered(
            ["spark", "table"], wide, k=10, mode="or", strategy="cogroup"
        ).collect()
        reps.append(time.monotonic() - t0)
    queries["q_filtered_cogroup_wide"] = round(min(reps), 3)

    # optional-should (bool must+should, session 12): should postings ride
    # the same pushed scan, never widening the must candidate set — the
    # cost over the plain AND query is one gather per clause
    reps = []
    for _ in range(3):
        t0 = time.monotonic()
        idx.search_optional_should(
            ["spark", "join"], [(["table"], 1.0), (["data", "query"], 2.0)],
            k=10,
        ).collect()
        reps.append(time.monotonic() - t0)
    queries["q_opt_should"] = round(min(reps), 3)

    # ... and under the LOW-selectivity filter (forced cogroup): the
    # filtered composition at the scale-path plan
    reps = []
    for _ in range(3):
        t0 = time.monotonic()
        idx.search_filtered(
            ["spark", "join"], wide, k=10, strategy="cogroup",
            opt_should=[(["table"], 1.0), (["data", "query"], 2.0)],
            opt_msm=1,
        ).collect()
        reps.append(time.monotonic() - t0)
    queries["q_opt_should_filtered"] = round(min(reps), 3)

    # --- round-3 session-4 ops: corpus-curation + query surface ----------
    from elasticsearch_assets_spark.operators.packing import pack_documents
    from elasticsearch_assets_spark.operators.textstats import (
        hash_classifier_score,
        normalize_text,
        unigram_lm_score,
    )
    from elasticsearch_assets_spark.query.esql import esql as esql_run

    # exact-substring dup removal over the full pages corpus (detect's two
    # compact shuffles + one doc-keyed join; text never shuffles)
    op_best(
        "op_dup_span_removal",
        lambda: OD.remove_duplicate_spans(corpus, L=8).count(),
    )
    # corpus-LM quality: term agg + join-back + doc agg over pages
    # reps=3: this op's large agg expression tree JITs over the first two
    # runs (9.5 -> 8.1 -> 4.8 s measured solo); best-of-2 reports warm-up
    op_best("op_unigram_lm", lambda: unigram_lm_score(corpus).count(), reps=3)
    # session-6 curation ops: DSIR importance weights (tokenize + dual-
    # distribution hash agg + broadcast ratio join), CCNet perplexity
    # buckets on the approx path (percentile_approx thresholds — the
    # no-global-sort 10^12-doc plan), tokenizer fertility (zero-shuffle)
    from elasticsearch_assets_spark.operators.textstats import (
        ccnet_buckets,
        dsir_importance,
        fertility_stats,
    )

    dsir_in = corpus.withColumn("_t", F.col("doc_id") % 10 == 0)
    # round-4: default engine is "fused" (two corpus scans, one 4096-row
    # histogram shuffle, zero persist — textstats._dsir_fused). cold =
    # first run (empty worker md5 memo); warm = rerun with the memo
    # populated (the resampling-rerun loop; the old 1.8 s warm number
    # measured the sql engine's CacheManager hit, a plan the fused
    # engine deliberately drops as infeasible at 10^12 docs). Report
    # both; never best-of over the warm-up boundary.
    op_best(
        "op_dsir",
        lambda: dsir_importance(dsir_in, "_t", n_buckets=4096).count(),
        reps=1,
    )
    op_best(
        "op_dsir_warm",
        lambda: dsir_importance(dsir_in, "_t", n_buckets=4096).count(),
    )
    op_best(
        "op_ccnet_buckets",
        lambda: ccnet_buckets(corpus, thresholds="approx").count(),
    )
    op_best("op_fertility", lambda: fertility_stats(corpus).count())
    # session-10: distributed BPE tokenizer training (the corpus reduces to
    # its cached vocabulary once; each merge = one pair-count agg + one
    # symbol-array fold) and the zero-shuffle application of the learned
    # merge list to the full corpus
    from elasticsearch_assets_spark.operators import bpe as OB

    _bpe_merges: list = []

    def _bpe_train() -> None:
        _bpe_merges.clear()
        _bpe_merges.extend(OB.bpe_learn(corpus, 16))

    op_best("op_bpe_train16", _bpe_train, reps=1)
    op_best("op_bpe_apply", lambda: OB.bpe_apply(corpus, _bpe_merges).count())
    # semantic stand-in embed+rank (zero shuffle before the global cut) and
    # per-host cap (one WindowGroupLimit-pruned shuffle)
    from elasticsearch_assets_spark.operators.sampling import cap_per_host
    from elasticsearch_assets_spark.operators.semantic import semantic_topk

    op_best(
        "op_semantic_topk",
        lambda: semantic_topk(corpus, "spark join table row", k=10).count(),
    )
    hosted = corpus.withColumn(
        "host", F.concat(F.lit("h"), F.col("doc_id") % 500)
    )
    op_best("op_host_cap", lambda: cap_per_host(hosted, "host", 5).count())
    # hashed classifier + normalization: zero-shuffle JVM passes
    op_best(
        "op_hash_classifier", lambda: hash_classifier_score(corpus).count()
    )
    op_best("op_normalize_text", lambda: normalize_text(corpus).count())
    # banded sign-LSH embedding near-dup (key-only candidate join + verify).
    # planes sized to the corpus: ~log2(n / target_bucket) keeps per-bucket
    # candidate volume bounded (4 planes = 16 buckets is right for 500
    # vectors but quadratic-ish at 2k+ — the documented tuning rule)
    import math as _math

    n_emb = emb.count()
    planes = max(4, int(_math.log2(max(n_emb, 2) / 32)))
    op_best(
        "op_lsh_neardup",
        lambda: OS.lsh_neardup_pairs(
            emb, tau=0.45, n_planes=planes, n_tables=8
        ).count(),
    )
    # distributed-prefix-sum sequence packing over pages
    op_best(
        "op_pack_documents",
        lambda: pack_documents(corpus, 2048, bucket_width=10_000).count(),
    )
    # ES|QL stats pipe over the events table (one declarative plan)
    q_best(
        "q_esql_stats",
        lambda: esql_run(
            "FROM events | WHERE event_type == 'click' AND value > 5"
            " | EVAL day = date_format(ts, 'yyyy-MM-dd')"
            " | STATS n = count(*), avg_v = avg(value) BY day | SORT day",
            spark=spark, sf_dir=SF_DIR,
        ).collect(),
    )
    # three-clause unordered span_near through the positional kernel
    q_best(
        "q_span_near3",
        lambda: pidx.search_span_near(
            ["the", "join", "data"], slop=3, in_order=False, k=10
        ).collect(),
    )
    # session-7 ops: general spans-near-spans (span_multi inside near),
    # seasonal MAD anomaly scan, BPE vocab-first pair counting
    q_best(
        "q_span_near_multi",
        lambda: pidx.search_span_near_spans(
            pidx.span_multi("term1", kind="prefix", max_expansions=50),
            ("near", "the", "data", 2, False),
            slop=2, in_order=False, k=10,
        ).collect(),
    )
    from elasticsearch_assets_spark.operators.anomaly import mad_outliers

    ev_mad = load_sf_table(spark, SF_DIR, "events")
    op_best(
        "op_anomaly_mad",
        lambda: mad_outliers(ev_mad, "value", F.hour("ts")).count(),
    )
    from elasticsearch_assets_spark.operators.textstats import bpe_pair_counts

    op_best("op_bpe_pairs", lambda: bpe_pair_counts(corpus, n=20).collect())

    # session-8 ops: ES|QL TS two-level time-series agg (window + 2 hash
    # aggs sharing one exchange), cross_fields blended scoring, int8
    # oversample + exact re-score, multi-level Apriori itemsets
    from elasticsearch_assets_spark.operators.itemsets import (
        frequent_itemsets,
    )
    from elasticsearch_assets_spark.operators.similarity import (
        rescore_vector_topk,
    )
    from elasticsearch_assets_spark.query.engine import cross_fields

    ts_meta = {
        "m": {"dimensions": ["sid"], "ts": "ts", "tiebreak": "event_id"}
    }
    ev_ts = ev_mad.withColumn("sid", F.col("user_id") % 64)
    q_best(
        "q_esql_ts",
        lambda: esql_run(
            "TS m | STATS mr = max(rate(value)),"
            " am = max(avg_over_time(value)), n = sum(count_over_time(value))"
            " BY h = BUCKET(ts, 1 hour) | SORT h",
            tables={"m": ev_ts}, time_series=ts_meta,
        ).collect(),
    )
    q_best(
        "q_cross_fields",
        lambda: cross_fields(
            {"text": (idx, 1.0), "pos": (pidx, 2.0)},
            ["spark", "join"], k=10, tie_breaker=0.3,
        ).collect(),
    )
    op_best(
        "op_ann_rescore",
        lambda: rescore_vector_topk(emb, qv, k=10, oversample=3.0).collect(),
    )
    op_best(
        "op_itemsets3",
        lambda: frequent_itemsets(
            docs, "doc_id", "split(text, ' ')", 0.25, max_size=3
        ).count(),
    )
    # warm-cache serving: segments+stats pinned in executor memory (the
    # ES page-cache warm-up) — same query, no parquet IO per request
    idx.warm()
    q_best(
        "q_and2_warm",
        lambda: idx.search(["spark", "join"], k=10, mode="and").collect(),
    )
    idx.cool()

    # --- round-3 session-5 ops ------------------------------------------
    # binary-quantized ANN: hamming prefilter + exact rerank vs the float
    # brute-force op_ann_bruteforce above
    # rerank=256 (12.8% of this 2k-vector table): measured recall@10
    # 0.8 -> 1.0 vs rerank=128 — 1-bit codes need deep rescore pools,
    # the ES BBQ oversampling guidance; latency delta is noise here
    op_best(
        "op_ann_bbq",
        lambda: OS.ann_topk_binary(emb, qv, k=10, rerank=256).collect(),
    )
    # SemDeDup: cluster-bounded semantic dedup (the scale path next to the
    # O(n^2) emb near-dup baseline)
    op_best(
        "op_semdedup",
        lambda: OS.semdedup(emb, n_centroids=16, threshold=0.45).count(),
    )
    # ES|QL FORK + FUSE: two branch pipes RRF-merged by key
    q_best(
        "q_esql_fuse",
        lambda: esql_run(
            "FROM documents | EVAL _id = doc_id"
            " | FORK (WHERE lang == 'en' | EVAL _score = TO_DOUBLE(n_chars)"
            "         | SORT _score DESC, _id ASC | LIMIT 100)"
            "        (WHERE STARTS_WITH(source, 'src1')"
            "         | EVAL _score = TO_DOUBLE(doc_id * 37 % 101)"
            "         | SORT _score DESC, _id ASC | LIMIT 100)"
            " | FUSE rrf KEY BY _id | SORT _score DESC, _id ASC | LIMIT 10",
            spark=spark, sf_dir=SF_DIR,
        ).collect(),
    )
    # ingest pipeline: 8-processor chain fused into one projection + filter
    from elasticsearch_assets_spark.sinks.ingest import run_pipeline

    events_tbl = load_sf_table(spark, SF_DIR, "events")
    op_best(
        "op_ingest_pipeline",
        lambda: run_pipeline(events_tbl, [
            {"set": {"field": "tag", "value": "v1"}},
            {"gsub": {"field": "event_type", "pattern": "[aeiou]",
                      "replacement": "_", "target_field": "etg"}},
            {"uppercase": {"field": "event_type", "target_field": "etu"}},
            {"script": {"target_field": "v2", "source": "value * value"}},
            {"convert": {"field": "user_id", "type": "string",
                         "target_field": "uid"}},
            {"fingerprint": {"fields": ["event_id", "event_type"]}},
            {"drop": {"if": "event_type = 'error'"}},
        ]).count(),
    )
    # sorted top-k: footer-pruned prefix scan vs the full TakeOrdered scan
    import shutil as _sh
    import uuid as _uuid

    from elasticsearch_assets_spark.sources.sorted_scan import (
        sorted_topk, write_sorted,
    )

    _sorted_dir = f"/tmp/esa_bench_sorted_{_uuid.uuid4().hex[:8]}"
    write_sorted(events_tbl, _sorted_dir, "ts", num_files=32)
    q_best(
        "q_sorted_topk",
        lambda: sorted_topk(
            spark, _sorted_dir, "ts", 100, tiebreak="event_id"
        ).collect(),
    )
    q_best(
        "q_fullscan_topk",
        lambda: events_tbl.orderBy(
            F.col("ts").desc(), F.col("event_id").asc()
        ).limit(100).collect(),
    )
    _sh.rmtree(_sorted_dir, ignore_errors=True)

    # compaction throughput: hard-link clone of the pages index merged
    # 32 -> 8 segments with tombstone purge (the steady-state operational
    # cost of the delete/merge path; clone keeps the bench index intact)
    import shutil as _sh9
    import uuid as _uuid9

    from elasticsearch_assets_spark.index.merge import merge_segments
    from elasticsearch_assets_spark.index.tombstones import add_tombstones
    from elasticsearch_assets_spark.query.engine import clone_index_files

    def _compact_once() -> None:
        d = f"/tmp/esa_bench_compact_{_uuid9.uuid4().hex[:8]}"
        os.makedirs(d, exist_ok=True)
        clone_index_files(f"/tmp/esa_bench_idx_{N_PAGES}", d)
        add_tombstones(d, list(range(0, N_PAGES, 13)))
        merge_segments(spark, d, 8, apply_tombstones=True)
        _sh9.rmtree(d, ignore_errors=True)

    op_best("op_compaction_purge", _compact_once, reps=1)

    # ANN quality-at-speed: recall@10 of the bucketed/quantized paths vs
    # the exact top-10 (the numbers a 100 TB deployment trades on).
    # HEADLINE row = the engine's default ANN recommendation
    # (rescore_vector_topk: int8 quantized scan + exact rescore of
    # k*oversample candidates, ES's rescore_vector recipe) — target
    # recall@10 >= 0.9 (round-3 verdict item #3). The LSH row uses the
    # round-4 recall_target auto-tune with the MEASURED neighbor
    # similarity of this table (true top-10 sit at cos 0.31-0.41 —
    # synthetic embeddings have no tight clusters), which honestly picks
    # a deep radius (5 of 8): on unclusterable data single-table
    # hyperplane LSH must probe most buckets for >=0.9 recall, exactly
    # why the rescore path is the default recommendation.
    exact10 = {
        r["vec_id"]
        for r in OS.cosine_topk(emb, qv, k=10).collect()
    }
    default10 = {
        r["vec_id"]
        for r in OS.rescore_vector_topk(emb, qv, k=10, oversample=4.0).collect()
    }
    lsh10 = {
        r["vec_id"]
        for r in OS.ann_topk_lsh(
            emb, qv, k=10, n_planes=8, recall_target=0.9, neighbor_cos=0.35
        ).collect()
    }
    int810 = {
        r["vec_id"] for r in OS.quantized_cosine_topk(emb, qv, k=10).collect()
    }
    bbq10 = {
        r["vec_id"] for r in OS.ann_topk_binary(emb, qv, k=10, rerank=256).collect()
    }
    extras["ann_recall10"] = round(len(exact10 & default10) / 10.0, 3)
    extras["ann_lsh_recall10"] = round(len(exact10 & lsh10) / 10.0, 3)
    extras["ann_int8_recall10"] = round(len(exact10 & int810) / 10.0, 3)
    extras["ann_bbq_recall10"] = round(len(exact10 & bbq10) / 10.0, 3)
    # IVF — the ONLY sub-linear candidate path, i.e. the one a 10^12-vector
    # deployment actually runs (round-4 verdict "what's wrong" #3). On THIS
    # table the synthetic embeddings are unclusterable (true top-10 at cos
    # 0.31-0.41), so reaching recall>=0.9 honestly costs nprobe=24 of 64
    # cells (~38% scan — measured sweep: nprobe 8/16/24/32 -> recall
    # 0.5/0.8/0.9/1.0). Real embedding corpora cluster, which is where
    # IVF's nprobe/n_cells fraction drops to 1-5%; the 10^12 arithmetic
    # and why this table is the worst case: docs/SCALE.md §IVF.
    _ivf_cents = OS.train_ivf_centroids(emb, n_centroids=64, sample=20_000)
    ivf10 = {
        r["vec_id"]
        for r in OS.ann_topk_ivf(
            emb, qv, k=10, centroids=_ivf_cents, nprobe=24
        ).collect()
    }
    extras["ann_ivf_recall10"] = round(len(exact10 & ivf10) / 10.0, 3)
    extras["ann_ivf_scan_frac"] = round(24 / 64, 3)
    q_best(
        "q_ann_ivf",
        lambda: OS.ann_topk_ivf(
            emb, qv, k=10, centroids=_ivf_cents, nprobe=24
        ).collect(),
    )

    # --- round-3 session-9 ops ------------------------------------------
    # paragraph keep-first dedup + ICT pair generation over a line-derived
    # corpus; post_filter's one-scan hits+total shape at 80% selectivity
    from elasticsearch_assets_spark.operators.mining import ict_pairs

    wrapped = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", " a ", ".\n"), " the ", "…\n- "
        ).alias("text"),
    )
    op_best("op_paragraph_dedup", lambda: OD.paragraph_dedup(wrapped).count())
    op_best("op_ict_pairs", lambda: ict_pairs(wrapped).count())
    _pf = corpus.where(F.col("doc_id") % 5 != 0)
    q_best(
        "q_post_filter",
        lambda: idx.search_post_filter(
            ["spark", "join"], _pf, k=10, mode="or"
        ).collect(),
    )

    # --- round-3 session-13 ops -----------------------------------------
    # nested query: per-passage BM25 rolled up to parents (MaxP) — child
    # passage index over the documents table, built once and reused
    from elasticsearch_assets_spark.operators.relations import passage_corpus
    from elasticsearch_assets_spark.query.dsl import search_dsl as _sdsl13

    np_dir = f"/tmp/esa_bench_idx_passages_{SF}"
    if not os.path.exists(os.path.join(np_dir, "meta.json")):
        build_index(
            spark, passage_corpus(docs, n=20, slot_base=16), np_dir,
            num_chunks=1,
        )
    np_idx = InvertedIndex(spark, np_dir)
    q_best(
        "q_nested_maxp",
        lambda: _sdsl13(
            idx,
            {"query": {"nested": {
                "path": "passages",
                "query": {"match": {"text": "spark table"}},
                "score_mode": "max",
            }}, "size": 10},
            nested_paths={"passages": (np_idx, 16)},
        ).collect(),
    )

    # --- multi-process sharded deployment build (round-5, verdict #5) -----
    # The executor-sizing finding as a runnable path: 4 independent
    # local[8] JVMs each build one hash-disjoint shard of the pages
    # corpus CONCURRENTLY (index/sharded_build.build_sharded — the
    # production per-node topology; same 4x8 shape whose ceiling sum read
    # 219k docs/s vs one local[32] at 108k). agg throughput = total docs /
    # slowest child's warm build; rank identity of the produced shards vs
    # the monolithic index is checked in-record. NOTE the THROUGHPUT
    # number here is a path-works check, not the deployment ceiling: at
    # bench scale each shard holds only N_PAGES/4 docs (50k at sf0.1), so
    # per-child fixed costs (job scheduling, first-stage codegen) eat the
    # rate a 400k-doc/JVM shard amortizes away — the ceiling record
    # (scripts/ceiling_bench.py, BENCH/ceiling_s10.json) is the sizing
    # evidence; this row proves the orchestration + rank identity.
    import shutil as _shsb

    from elasticsearch_assets_spark.index.sharded_build import build_sharded
    from elasticsearch_assets_spark.query.sharded import ShardedIndex

    _sb_out = f"/tmp/esa_bench_sharded_{N_PAGES}"
    _shsb.rmtree(_sb_out, ignore_errors=True)
    try:
        sb = build_sharded(
            pages_path, _sb_out, n_shards=4,
            cores_per_shard=max(1, CPUS // 4), warm=True,
        )
        extras["sharded_build_docs_per_sec"] = sb["agg_docs_per_sec"]
        extras["sharded_build_wall_sec"] = sb["wall_sec"]
        extras["sharded_vs_inproc_ratio"] = round(
            sb["agg_docs_per_sec"] / float(extras["index_docs_per_sec"]), 3
        )
        sh = ShardedIndex(spark, sb["shard_dirs"])
        mono_top = [
            (r["doc_id"], r["score"])
            for r in idx.search(["spark", "join"], k=10, mode="and").collect()
        ]
        extras["sharded_rank_identity"] = (
            sh.search_local(["spark", "join"], k=10, mode="and") == mono_top
        )
    finally:
        _shsb.rmtree(_sb_out, ignore_errors=True)

    # --- window health self-annotation (round-4 verdict item, bench must
    # carry its own load canary) -------------------------------------------
    # One more WARM build of the pages corpus, measured at the END of the
    # run: the same 200k-page warm-build probe shape the repo's ad-hoc
    # window checks use. probe_ratio_vs_canonical compares it against the
    # documented healthy-host floor (BASELINE.md: healthy ≈ 100k+ docs/s,
    # repo record 150.1k) so every BENCH_r{N}.json self-reports whether
    # its absolutes were taken on a degraded window — two consecutive
    # driver records had to be adjudicated from outside evidence before.
    PROBE_CANONICAL_DOCS_PER_SEC = 100_000.0
    t0 = time.monotonic()
    build_index(
        spark, corpus, f"/tmp/esa_bench_idx_{N_PAGES}", num_chunks=1
    )
    probe_sec = time.monotonic() - t0
    probe_dps = N_PAGES / probe_sec
    extras["probe_docs_per_sec"] = round(probe_dps, 1)
    extras["probe_ratio_vs_canonical"] = round(
        probe_dps / PROBE_CANONICAL_DOCS_PER_SEC, 3
    )
    # the in-run build rows double as the START-of-run probe; their ratio
    # vs the end probe exposes window drift WITHIN the record
    start_dps = extras.get("index_docs_per_sec") or probe_dps
    extras["probe_drift_end_over_start"] = round(
        probe_dps / float(start_dps), 3
    )

    total = time.monotonic() - t_total
    print(
        json.dumps(
            {
                "metric": "index_build_plus_query_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF,
                "cpus": CPUS,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
