"""Deduplication operators for large-scale training-data pipelines.

Five dedup families over a ``documents``-shaped table (doc_id, text, ...):

* exact          — content-hash groupBy, keep lowest doc_id
* n-gram Jaccard — shingle inverted join, exact pairwise Jaccard
* MinHash + LSH  — per-row signatures (texthash.minhash_expr, NO shuffle),
                   banded bucket join for candidates, exact-Jaccard verify
* SimHash        — per-row 32-bit fingerprints, hamming-radius pairs via
                   multi-probe band join
* embedding      — cosine near-dup pairs (see similarity.py for ANN)

Scale notes (100 TB): signatures are pure column expressions computed in the
same scan that reads the text — the only shuffles are the candidate-pair
joins, whose keys are (band_id, band_hash)/(shingle) with cardinality ≈
corpus size, not pair count. Bucket skew (a degenerate band bucket holding
millions of docs) is the MinHash analogue of the reference's oversized-slice
recursion (/root/reference/asset/elasticsearch_reader/slicer.js:183-222):
`lsh_candidate_pairs(max_bucket)` drops buckets above the cap, mirroring how
the reference refuses to emit oversized slices, and AQE handles residual
join skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from elasticsearch_assets_spark.operators.texthash import (
    MH_PRIME,
    MINHASH_PERMS,
    shingles_expr,
    simhash_expr,
    tokens_expr,
)


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact text content.

    Hash-groupBy on md5(text) rather than the raw text so the shuffle moves
    32-byte keys, not documents.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The deduplicated corpus itself (all columns, one row per content)."""
    keep = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    n: int = 1,
    threshold: float = 0.6,
    max_doc_freq: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All unordered pairs (a < b) with shingle-set Jaccard >= threshold.

    Plan: distinct shingles exploded -> self-equi-join on shingle (the
    inverted-index trick: only docs sharing >=1 shingle ever meet) ->
    count common -> join the two set sizes -> Jaccard. Output
    (id_a, id_b, jaccard).

    This is the EXACT baseline; its join is near-quadratic on head shingles
    (every doc pair sharing "the" meets). `max_doc_freq` is the scale
    guard: shingles appearing in more docs are dropped from the JOIN side
    only (set sizes still count them), turning the computed Jaccard into a
    LOWER BOUND of the true value — emitted pairs genuinely clear the
    threshold (no false positives); pairs whose overlap is mostly head
    shingles can be missed. With pruning off (default) values are exact.
    At corpus scale prefer lsh_candidate_pairs.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(shingles_expr(tokens_expr(text_col), n))
        ).alias("sh"),
    ).repartition("sh")  # one tokenize pass; both join sides reuse it
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    joinable = sh
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .drop("df")
        )
        joinable = sh.join(rare, "sh", "left_semi")
    a = joinable.alias("a")
    b = joinable.alias("b")
    common = (
        a.join(b, "sh")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    *,
    n: int = 1,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig: array<long>[k]) — computed in the reading scan, no shuffle.

    Two-stage projection (same trick as simhash_fingerprints): the md5-based
    hash60 runs ONCE per distinct shingle in its own select; the k
    permutations read the staged hash array — md5 cost is O(shingles), not
    O(shingles * k). Values are identical to the single-stage expression
    (the DuckDB twin in __spark_entry__ is unchanged)."""
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(shingles_expr(tokens_expr(text_col), n)),
            lambda s: hash60_expr(s) % MH_PRIME,
        ).alias("hs"),
    )
    sig = []
    for j in range(k):
        a, b = MINHASH_PERMS[j]
        sig.append(
            F.coalesce(
                F.array_min(
                    F.transform("hs", lambda h: (F.lit(a) * h + F.lit(b)) % MH_PRIME)
                ),
                F.lit(MH_PRIME),
            )
        )
    return hashed.select("id", F.array(*sig).alias("sig"))


def _lsh_banded(
    df: DataFrame,
    *,
    n: int,
    k: int,
    bands: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, band, bucket) rows: the k minhash values cut into `bands`
    bands, bucket = md5 of the band's values — shared by the self-join
    (lsh_candidate_pairs) and cross-corpus (dedup_against) paths so the
    bucket keys are identical by construction."""
    assert k % bands == 0
    r = k // bands
    sigs = minhash_signatures(df, n=n, k=k, text_col=text_col, id_col=id_col)
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",", *[F.slice("sig", bi * r + 1, r)[i] for i in range(r)]
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    df: DataFrame,
    *,
    n: int = 1,
    k: int = 8,
    bands: int = 4,
    threshold: float | None = None,
    max_bucket: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup candidates: docs agreeing on all rows of >=1 LSH band.

    k minhash values are cut into `bands` bands of k/bands rows; a band's
    bucket key is md5 of its values. Docs sharing a bucket are candidates.
    With `threshold`, candidates are verified with exact shingle Jaccard
    (ngram_jaccard semantics) and filtered. `max_bucket` drops degenerate
    buckets (skew guard) before the pair blow-up.
    """
    banded = _lsh_banded(df, n=n, k=k, bands=bands, text_col=text_col, id_col=id_col)
    # one shuffle on the join key -> both self-join sides reuse the same
    # exchange (signatures computed once), co-partitioned join
    banded = banded.repartition("band", "bucket")
    if max_bucket is not None:
        ok = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") <= max_bucket)
            .drop("c")
        )
        banded = banded.join(ok, ["band", "bucket"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if threshold is None:
        return cand
    # verify ONLY the candidate pairs: join each side to its per-doc
    # distinct-shingle set and intersect per pair. Cost is O(candidates),
    # never the corpus-wide all-pairs Jaccard join — at 10^12 docs the
    # candidate set is the LSH-pruned output, while a full shingle self-join
    # is near-cartesian on head shingles. The one repartition materializes
    # the tokenize+shingle projection as a single exchange that BOTH pair-
    # side joins reuse (same hash key — the doc id value).
    sets_df = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles_expr(tokens_expr(text_col), n)).alias("shset"),
    ).repartition("id")
    return (
        cand.join(
            sets_df.withColumnsRenamed({"id": "id_a", "shset": "sh_a"}), "id_a"
        )
        .join(sets_df.withColumnsRenamed({"id": "id_b", "shset": "sh_b"}), "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        # common > 0: a bucket-collision pair sharing NO shingle is not a
        # near-dup pair even at threshold 0.0 (matches ngram_jaccard_pairs,
        # whose inverted join can only ever see co-occurring pairs)
        .where((F.col("common") > 0) & (F.col("jaccard") >= threshold))
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame,
    *,
    n_bits: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, simhash: long) — per-row expression, no shuffle.

    Default 60 bits (the Manku-style wide fingerprint, capped at the 60
    informative bits of the cross-engine hash60 kernel — bits 60-63 of
    token hashes are constant zero, so wider fingerprints add no signal
    and 2^63 would overflow signed int64 in both engines).

    Two-stage projection: tokens are hashed ONCE into an array column
    (JVM-side md5), then the bit-votes are summed in ONE vectorized numpy
    pass over Arrow batches (a bit-plane matrix + reduceat per doc) — the
    pure column-expression spelling (texthash.simhash_expr, kept as the
    oracle/SQL-twin reference and tested equal) folds the hash array once
    PER BIT, n_bits full-array passes. Integer math is identical in both.
    """
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens_expr(text_col), hash60_expr).alias("hs"),
    )
    @F.pandas_udf("long")
    def votes(hs: pd.Series) -> pd.Series:
        # null hash array (null text) -> null fingerprint, matching the
        # column-expression spelling (null join keys never pair up)
        null_mask = hs.isna()
        lens = hs.str.len().fillna(0).to_numpy(dtype=np.int64)
        out = np.zeros(len(hs), dtype=np.int64)
        nonempty = lens > 0
        if nonempty.any():
            flat = np.concatenate(
                [np.asarray(a, dtype=np.uint64) for a in hs[nonempty]]
            )
            starts = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
            doc_lens = lens[nonempty]
            fp = np.zeros(doc_lens.size, dtype=np.int64)
            # one bit-plane at a time: peak extra memory is one int64 row
            # over the batch's tokens, not an (n_bits x tokens) matrix
            # (vote = 2*ones - len > 0  <=>  2*ones > len)
            for j in range(n_bits):
                ones = np.add.reduceat(
                    ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.int64),
                    starts,
                )
                fp |= ((2 * ones > doc_lens).astype(np.int64)) << j
            out[nonempty] = fp
        res = pd.Series(out, dtype="Int64")
        res[null_mask.to_numpy()] = pd.NA
        return res

    return hashed.select("id", votes(F.col("hs")).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    *,
    n_bits: int = 60,
    max_hamming: int = 3,
    n_blocks: int = 4,
    max_bucket: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs within `max_hamming` bits, via the block-permutation trick:

    split the fingerprint into `n_blocks` bit-blocks; any pair within
    hamming distance < n_blocks must agree exactly on >=1 block
    (pigeonhole, requires max_hamming <= n_blocks - 1), so the join key is
    (block_idx, block_value) — never all-pairs. Verification computes the
    true hamming distance with bit_count(xor).

    Scale shape (Manku et al., WWW'07): the defaults give 15-bit blocks —
    2^15 join values per block, so at n docs the expected bucket is
    n/32768, vs n/256 with the old 32-bit/8-bit defaults whose pair join
    exploded quadratically. `max_bucket` drops degenerate buckets (a
    boilerplate fingerprint shared by millions of docs) before the pair
    blow-up — the same skew guard as lsh_candidate_pairs. It is OPT-IN
    (default None = exact recall): enabling it trades recall inside
    over-cap buckets for a bound on the pair join, so scale deployments
    should set it deliberately (e.g. 1_000_000) — a cap silently enabled
    by default would reduce recall on boilerplate-heavy corpora with no
    signal to the caller.
    """
    if max_hamming > n_blocks - 1:
        raise ValueError("need max_hamming <= n_blocks - 1 for pigeonhole soundness")
    fp = simhash_fingerprints(df, n_bits=n_bits, text_col=text_col, id_col=id_col)
    width = n_bits // n_blocks
    mask = (1 << width) - 1
    blocks = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask)).alias("val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bv"),
    ).select("id", "simhash", "bv.blk", "bv.val")
    # materialize one shuffle on the join key: the a/b sides of the self-
    # join then read the SAME exchange (ReusedExchange) instead of running
    # the fingerprint pipeline twice, and the join is co-partitioned
    blocks = blocks.repartition("blk", "val")
    if max_bucket is not None:
        ok = (
            blocks.groupBy("blk", "val")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") <= max_bucket)
            .drop("c")
        )
        blocks = blocks.join(ok, ["blk", "val"], "left_semi")
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(b, ["blk", "val"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # filter BEFORE the dedup shuffle: only hamming survivors move;
        # candidates failing the radius never leave their join partition
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components -> canonical representative)
# ---------------------------------------------------------------------------


def dedup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Assign every doc the MIN doc id of its near-dup connected component.

    `pairs` is any (id_a, id_b) near-dup edge set (Jaccard/LSH/SimHash/
    cosine). Iterative min-label propagation over the undirected edges; each
    round is one join + min-aggregate, converging in O(component diameter)
    rounds (near-dup components are shallow; cap max_iter). The standard
    keep-one-per-cluster filter is then `WHERE doc_id = rep`.

    At 10^12 scale: label propagation is the Spark-idiomatic component
    algorithm (alternating large-star/small-star halves the rounds; the
    simple propagation keeps the plan to joins the optimizer understands).
    Convergence check is a count of changed labels per round (one action).
    """
    # cache the edge set: every propagation round joins against it, and its
    # lineage is the whole (possibly expensive) pair-generation pipeline —
    # uncached, that pipeline would re-execute up to max_iter times
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .cache()
    )
    labels = ids.select(F.col(id_col).alias("id")).withColumn("rep", F.col("id"))
    prev_cached = None
    for it in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("rep").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("rep"), F.coalesce("nmin", F.col("rep"))).alias("new_rep"),
                F.col("rep"),
            )
        ).cache()
        changed = updated.where(F.col("new_rep") != F.col("rep")).count()
        # the count materialized `updated`; the previous round's cache (and
        # its lineage) is no longer needed — unpersist so 20+ rounds don't
        # accumulate cached partitions
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = updated
        labels = updated.select("id", F.col("new_rep").alias("rep"))
        if changed == 0:
            break
        # cut lineage periodically: each round's plan references the prior
        # round's join, growing the logical plan linearly otherwise
        if (it + 1) % 5 == 0:
            labels = labels.localCheckpoint(eager=True)
            prev_cached.unpersist()
            prev_cached = None
    out = labels.select(F.col("id").alias(id_col), "rep")
    if prev_cached is not None:
        # materialize the result before releasing the caches backing it
        out = out.localCheckpoint(eager=True)
        prev_cached.unpersist()
    edges.unpersist()
    return out


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs with cosine similarity >= threshold (exact, O(n^2)).

    Brute force is the verification/baseline path; at corpus scale, first
    bucket with similarity.hyperplane_lsh and verify only within buckets.
    """
    from elasticsearch_assets_spark.operators.similarity import cosine_expr

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# passage-level dedup (CCNet/Gopher-style) and benchmark decontamination
# ---------------------------------------------------------------------------


def dedup_passages(
    df: DataFrame,
    *,
    n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide passage dedup, the CCNet/Gopher web-text cleanup: split
    each document into DISJOINT n-token passages and keep only the FIRST
    occurrence of each distinct passage across the whole corpus (first =
    smallest (doc_id, position)); later repeats are cut out of their
    documents. The corpus here has no newlines, so fixed n-token chunks
    stand in for CCNet's line/paragraph unit — the plan is identical.

    Returns (doc_id, total_chunks, kept_chunks, cleaned_text); cleaned_text
    is the surviving passages rejoined in document order, NULL when the
    whole document was duplicate material.

    Plan: one tokenize pass -> inline-exploded (pos, passage) pairs -> the
    keep-first decision is a row_number window PARTITIONED BY the passage
    hash (high cardinality: one tiny group per distinct passage, so the
    window shuffle is skew-free by construction and moves 32-byte hashes,
    never documents) -> reassembly is a grouped sort_array(collect_list)
    on doc_id. Two shuffles total, both on compact keys, regardless of
    corpus size."""
    toks = tokens_expr(text_col)
    chunks = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(n)),
        lambda i: F.struct(
            i.alias("pos"), F.concat_ws(" ", F.slice(toks, i, n)).alias("chunk")
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.inline(chunks)
    ).where(F.col("chunk") != "")
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("chunk"))).orderBy(
        F.col("doc_id").asc(), F.col("pos").asc()
    )
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("pos"), F.col("chunk"))
    )
    agg = ranked.groupBy("doc_id").agg(
        F.count("*").alias("total_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("kept_chunks"),
        F.sort_array(F.collect_list(kept_struct)).alias("_kept"),
    )
    cleaned = F.when(
        F.col("kept_chunks") > 0,
        F.array_join(F.transform(F.col("_kept"), lambda s: s["chunk"]), " "),
    )
    return agg.select(
        "doc_id", "total_chunks", "kept_chunks", cleaned.alias("cleaned_text")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination for training corpora: flag every corpus
    document sharing at least one word n-gram with any benchmark/eval
    document (the n-gram-overlap rule used by GPT-3/PaLM-style dataset
    curation; n=13 is the GPT-3 convention). Returns (doc_id, overlap) —
    the number of DISTINCT contaminated n-grams per flagged doc; join
    anti against it to drop them.

    Plan: the benchmark side is tiny by definition (an eval set), so its
    distinct shingle set broadcasts; the corpus side is ONE tokenize+
    explode pass hash-joined against that broadcast — no self-join, no
    shuffle of the corpus text, cost linear in corpus tokens at any
    scale."""
    def sh(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(shingles_expr(tokens_expr(text_col), n))
            ).alias("sh"),
        )

    bench = F.broadcast(sh(benchmark).select("sh").distinct())
    return (
        sh(corpus)
        .join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("overlap"))
    )


def duplicate_spans(
    df: DataFrame,
    *,
    L: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring duplicate-region detection (the overlapping-window
    form of Lee et al.'s "Deduplicating Training Data Makes Language
    Models Better" exact-substring dedup, re-expressed over token
    windows instead of a suffix array): every L-token window whose text
    occurs >= `min_occurrences` times in the corpus marks its positions;
    per document, overlapping/adjacent marked windows merge into maximal
    duplicated spans [span_start, span_end) (1-based token positions).

    Returns (doc_id, span_start, span_end, span_len), ordered.

    Plan: one tokenize pass -> inline-exploded (pos, md5(window)) pairs
    (a JVM transform over the token array — no Python); duplication is a
    COUNT window PARTITIONED BY the 32-byte hash (high cardinality,
    skew-free, ONE shuffle); span merging is a grouped
    sort_array(collect_list) + one JVM `aggregate` fold per doc (windows
    share length L, so ends are monotone and the fold is exact). Two
    compact-key shuffles total at any corpus size — never a suffix
    array, never document text on the wire."""
    from pyspark.sql import Window

    toks = tokens_expr(text_col)
    windows = F.when(
        F.size(toks) >= L,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(L - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(toks, i, L))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))
    exploded = df.select(F.col(id_col).alias("doc_id"), F.inline(windows))
    cnt = F.count("*").over(Window.partitionBy("h"))
    marked = exploded.withColumn("_n", cnt).where(
        F.col("_n") >= min_occurrences
    )
    merged = marked.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("ps")
    ).select(
        "doc_id",
        F.expr(
            f"""
            aggregate(
              ps,
              cast(array() as array<struct<s:int,e:int>>),
              (acc, p) -> if(
                size(acc) > 0 AND p <= element_at(acc, -1).e,
                concat(
                  slice(acc, 1, size(acc) - 1),
                  array(named_struct(
                    's', element_at(acc, -1).s,
                    'e', greatest(element_at(acc, -1).e, p + {L})))),
                concat(acc, array(named_struct('s', p, 'e', p + {L}))))
            )
            """
        ).alias("spans"),
    )
    return (
        merged.select("doc_id", F.explode("spans").alias("sp"))
        .select(
            "doc_id",
            F.col("sp.s").alias("span_start"),
            F.col("sp.e").alias("span_end"),
            (F.col("sp.e") - F.col("sp.s")).alias("span_len"),
        )
        .orderBy(F.col("doc_id").asc(), F.col("span_start").asc())
    )


def dedup_keep_best(
    clusters: DataFrame,
    quality: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep-best representative selection — the step every production
    dedup pipeline runs AFTER clustering: for each near-dup component,
    keep the member with the highest quality score (ties → smallest id),
    not an arbitrary one. `clusters` is dedup_clusters' (id, rep) output;
    `quality` any (id, quality) score (operators/textstats.quality_score).

    Plan: one equi-join on the id + one window rank partitioned by `rep`
    — rep keys partition the doc space, and partition width is the
    cluster size, already bounded upstream by the near-dup caps, so no
    skew. Returns one row per cluster: (id, rep, quality) of the
    survivor, id ASC."""
    from pyspark.sql import Window

    j = clusters.join(quality, id_col)
    w = Window.partitionBy("rep").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "rep", "quality")
        .orderBy(F.col(id_col).asc())
    )


def dedup_against(
    new: DataFrame,
    base: DataFrame,
    *,
    n: int = 1,
    k: int = 8,
    bands: int = 4,
    threshold: float | None = None,
    max_bucket: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental (cross-corpus) near-dup detection: candidates between
    NEW documents and the existing BASE corpus — the 'dedupe today's
    crawl against the standing 100 TB corpus' shape every continuously
    ingesting pipeline runs. Same MinHash-LSH banding as
    lsh_candidate_pairs (identical bucket keys — _lsh_banded is shared),
    but the bucket join is strictly NEW × BASE: no new×new or base×base
    pairs, so re-ingesting never re-pairs the base against itself and
    the pair blow-up is bounded by the increment's size, not the
    corpus'. `max_bucket` caps degenerate BASE buckets (the skew guard —
    boilerplate buckets in a web corpus) BEFORE the join.

    Returns (new_id, base_id) candidates; with `threshold`, verified
    (new_id, base_id, jaccard >= threshold) via candidate-local shingle
    intersection — O(candidates), never a corpus-wide Jaccard join."""
    bn = _lsh_banded(new, n=n, k=k, bands=bands, text_col=text_col, id_col=id_col)
    bb = _lsh_banded(base, n=n, k=k, bands=bands, text_col=text_col, id_col=id_col)
    bb = bb.repartition("band", "bucket")
    if max_bucket is not None:
        ok = (
            bb.groupBy("band", "bucket")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") <= max_bucket)
            .drop("c")
        )
        bb = bb.join(ok, ["band", "bucket"], "left_semi")
    cand = (
        bn.withColumnRenamed("id", "new_id")
        .join(bb.withColumnRenamed("id", "base_id"), ["band", "bucket"])
        .select("new_id", "base_id")
        .distinct()
    )
    if threshold is None:
        return cand
    new_sets = new.select(
        F.col(id_col).alias("new_id"),
        F.array_distinct(shingles_expr(tokens_expr(text_col), n)).alias("sh_a"),
    )
    base_sets = base.select(
        F.col(id_col).alias("base_id"),
        F.array_distinct(shingles_expr(tokens_expr(text_col), n)).alias("sh_b"),
    )
    return (
        cand.join(new_sets, "new_id")
        .join(base_sets, "base_id")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .where((F.col("common") > 0) & (F.col("jaccard") >= threshold))
        .select("new_id", "base_id", "jaccard")
    )


def remove_duplicate_spans(
    df: DataFrame,
    *,
    L: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring duplicate REMOVAL (the apply step of Lee et al.
    2022's exact-substring dedup; duplicate_spans is the detect step):
    every token covered by a corpus-duplicated span is dropped and the
    document rebuilt from the survivors. Returns
    (doc_id, n_tokens, n_removed, clean_fp) where clean_fp is the md5 of
    the space-joined kept tokens ('' when everything was duplicated) —
    text never leaves the executors; downstream readers re-derive the
    cleaned text from (doc, kept-span) metadata the same way.

    Plan: the detect step's two compact-key shuffles, then the span lists
    rejoin the corpus on doc_id (one equi-join; docs without duplicated
    spans pass through the left join untouched) and the token filter is
    one JVM lambda over (token, index) — no Python, no text shuffle."""
    spans = duplicate_spans(
        df, L=L, text_col=text_col, id_col=id_col,
        min_occurrences=min_occurrences,
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("__spans")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("__toks")
    ).join(per_doc, "doc_id", "left")
    spans_arr = F.coalesce(
        F.col("__spans"), F.array().cast("array<struct<s:int,e:int>>")
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            spans_arr, lambda sp: (i + 1 >= sp["s"]) & (i + 1 < sp["e"])
        ),
    )
    n = F.size(F.col("__toks"))
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (n - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.concat_ws(" ", kept)).alias("clean_fp"),
    )


def winnow_fingerprints(
    df: DataFrame,
    *,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS local-fingerprinting scheme): hash every token k-gram,
    then from every window of w consecutive hashes keep the MINIMUM.
    Guarantee: any shared run of >= w + k - 1 tokens shares at least one
    fingerprint, while only ~2/(w+1) of the hashes are stored — the
    compact sketch for plagiarism-style overlap detection between the
    all-pairs MinHash estimate and the exact dup_spans scan.

    Returns (doc_id, fingerprint, first_window) — distinct fingerprints
    per doc with the earliest selecting window. Plan: shingle hashes and
    per-window minima are JVM array lambdas on the scan; ONE hash agg on
    (doc, fingerprint) does the distinct+earliest."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    toks = tokens_expr(text_col)
    hashes = F.transform(
        shingles_expr(toks, k),
        lambda s: hash60_expr(s),
    )
    n = F.size(hashes)
    wins = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(1), n - (w - 1)),
            lambda i: F.struct(
                F.array_min(F.slice(hashes, i, w)).alias("fp"),
                i.alias("win"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<fp:bigint,win:int>>"))
    exploded = df.select(F.col(id_col).alias("doc_id"), F.inline(wins))
    return (
        exploded.groupBy("doc_id", "fp")
        .agg(F.min("win").alias("first_window"))
        .select(
            "doc_id", F.col("fp").alias("fingerprint"), "first_window"
        )
    )


def bloom_prejoin_dedup(
    new: DataFrame,
    base: DataFrame,
    *,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-pruned incremental EXACT dedup (the runtime-filter idea as an
    explicit operator, since Spark's bloom_filter_agg is not exposed to
    SQL): the BASE corpus's content fingerprints build a Bloom filter —
    per-partition bitmaps OR-reduced, O(m_bits/8) bytes each — and a NEW
    document whose fingerprint misses the filter is DEFINITELY novel and
    skips the join entirely; only possible-hits (true dups + the FP rate)
    enter the exact anti-join. Output is EXACT (the verify never lies;
    the bloom only prunes join input — typically by 1-FP_rate of the
    novel fraction). Returns the new rows that survive dedup.

    Scale notes: the filter is built distributed and reduced driver-side
    (m_bits/8 bytes per partition — 128 KiB at the default; size
    m_bits ≈ 10–15 × |base| for ~sub-% FP), then rides to executors as a
    broadcast closure; membership is a vectorized numpy bit test inside
    mapInPandas — no per-row Python. k positions derive from the one
    60-bit content hash via odd-multiplier mixing (deterministic, no
    RNG)."""
    if m_bits < 8 or (m_bits & (m_bits - 1)) != 0:
        raise ValueError("m_bits must be a power of two >= 8")
    if not (1 <= k_hashes <= len(MINHASH_PERMS)):
        raise ValueError(f"k_hashes must be in [1, {len(MINHASH_PERMS)}]")
    from elasticsearch_assets_spark.operators.texthash import hash60_expr

    mask = m_bits - 1
    mults = [a | 1 for a, _ in MINHASH_PERMS[:k_hashes]]

    def positions(h: np.ndarray) -> list[np.ndarray]:
        return [((h * m) >> 7) & mask for m in mults]

    base_h = base.select(hash60_expr(F.col(text_col)).alias("h"))

    def build_fn(it):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        seen = False
        for pdf in it:
            if not len(pdf):
                continue
            seen = True
            h = pdf["h"].to_numpy(dtype=np.int64)
            for pos in positions(h):
                np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    parts = base_h.mapInPandas(build_fn, "bitmap binary").collect()
    bloom = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in parts:
        bloom |= np.frombuffer(r["bitmap"], dtype=np.uint8)

    new_h = new.withColumn("__h", hash60_expr(F.col(text_col)))

    def member_fn(it):
        for pdf in it:
            if not len(pdf):
                yield pdf
                continue
            h = pdf["__h"].to_numpy(dtype=np.int64)
            hit = np.ones(len(h), dtype=bool)
            for pos in positions(h):
                hit &= (bloom[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
            pdf = pdf.copy()
            pdf["__maybe"] = hit
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in new_h.schema.fields
    ) + ", __maybe boolean"
    flagged = new_h.mapInPandas(member_fn, schema)
    definitely_new = flagged.where(~F.col("__maybe"))
    candidates = flagged.where(F.col("__maybe"))
    verified = candidates.join(
        base_h.withColumnRenamed("h", "__h").distinct(), "__h", "left_anti"
    )
    return definitely_new.unionByName(verified).drop("__h", "__maybe")


def resolve_keepers(
    clusters: DataFrame,
    meta: DataFrame,
    *,
    priority_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Post-clustering keep/drop resolution — the step a RedPajama/
    SlimPajama-style pipeline runs after near-dup clustering: within each
    cluster keep exactly ONE document, the (priority, id)-minimum (so
    callers encode "keep longest" as priority = -length, "keep preferred
    source" as a source rank; id breaks ties deterministically).

    `clusters` is dedup_clusters' (id, rep) output; `meta` carries the
    priority. ONE hash agg on rep (min over a (priority, id) struct —
    map-side partials absorb big clusters) + one join back keyed by rep.
    Cluster count <= doc count, so the winners side is the smaller join
    input at any scale.

    Returns (id, rep, keeper, keep, priority)."""
    j = clusters.join(
        meta.select(F.col(id_col), F.col(priority_col)), id_col
    )
    winners = (
        j.groupBy("rep")
        .agg(
            F.min(F.struct(F.col(priority_col), F.col(id_col))).alias("_w")
        )
        .select("rep", F.col(f"_w.{id_col}").alias("keeper"))
    )
    return j.join(winners, "rep").select(
        F.col(id_col),
        "rep",
        "keeper",
        (F.col(id_col) == F.col("keeper")).alias("keep"),
        F.col(priority_col),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level exact PARAGRAPH dedup, keep-first (the Dolma/
    RefinedWeb paragraph pass, one granularity above
    remove_boilerplate_lines): every repeated paragraph keeps only its
    globally FIRST occurrence — ordered by (doc id, position) — and is
    stripped everywhere else; document paragraph order is preserved.
    Differs from boilerplate removal in both rule (first survives vs
    frequent-stripped-everywhere) and key (global first occurrence needs
    a total order, not a doc-frequency count).

    Plan — text shuffles ONCE, and never fans out as rows: paragraph
    hashes leave the corpus scan as (32-byte hash, id, pos) TRIPLES
    (paragraph text feeds md5 map-side only), the winner election is one
    min-struct hash agg on the hash (skew-free key), winners re-key by
    doc into per-doc surviving-position arrays, and the rebuild is a
    single index-aware array filter on the original row — no posexplode
    of text, no re-assembly groupBy, no window, no per-row Python.

    Returns (id, cleaned_text, n_paras, n_removed)."""
    sep_lit = sep.replace("\\", "\\\\").replace("'", "\\'")
    paras = F.expr(
        f"filter(transform(split({text_col}, '{sep_lit}'), p -> trim(p)),"
        " p -> p != '')"
    )
    base = df.select(F.col(id_col), paras.alias("_paras"))
    triples = base.select(
        F.col(id_col),
        F.posexplode(F.transform(F.col("_paras"), F.md5)).alias("pos", "h"),
    )
    keep_pos = (
        triples.groupBy("h")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w"))
        .groupBy(F.col(f"_w.{id_col}").alias(id_col))
        .agg(F.collect_list("_w.pos").alias("_keep"))
    )
    joined = base.join(keep_pos, id_col, "left")
    kept = F.filter(
        F.col("_paras"),
        lambda p, i: F.array_contains(
            F.coalesce(F.col("_keep"), F.array().cast("array<int>")), i
        ),
    )
    # no orderBy: a global sort Exchange buys nothing a consumer can't
    # add itself (the contract compare is order-insensitive)
    return joined.select(
        id_col,
        F.array_join(kept, sep).alias("cleaned_text"),
        F.size("_paras").cast("long").alias("n_paras"),
        (F.size("_paras") - F.size(kept)).cast("long").alias("n_removed"),
    )
