"""Dedup operator tests: expression correctness vs independent Python
re-implementations, plus pigeonhole/candidate-superset guarantees."""

from __future__ import annotations

import hashlib
import itertools

import pytest
from pyspark.sql import Row

from elasticsearch_assets_spark.operators import dedup as D
from elasticsearch_assets_spark.operators.texthash import MH_PRIME, MINHASH_PERMS


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_tokens(text: str) -> list[str]:
    import re

    return re.findall(r"[^\W_]+", text.lower())


def py_minhash(shingles: set[str], k: int = 8) -> list[int]:
    out = []
    for a, b in MINHASH_PERMS[:k]:
        vals = [(a * (h60(s) % MH_PRIME) + b) % MH_PRIME for s in shingles]
        out.append(min(vals) if vals else MH_PRIME)
    return out


def py_simhash(tokens: list[str], n_bits: int = 60) -> int:
    acc = 0
    for j in range(n_bits):
        vote = sum(1 if (h60(t) >> j) & 1 else -1 for t in tokens)
        if vote > 0:
            acc += 1 << j
    return acc


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup of 0
    (3, "completely different content about spark sql engines"),
    (4, "spark sql engines about completely different content"),  # perm of 3
    (5, "unrelated short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in CORPUS], "doc_id long, text string"
    )


def test_exact_dedup(spark, docs):
    groups = D.exact_dedup(docs).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    assert by_keep[0] == 2  # docs 0,1 collapse
    assert len(groups) == 5
    kept = sorted(r["doc_id"] for r in D.exact_dedup_filter(docs).collect())
    assert kept == [0, 2, 3, 4, 5]


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, n=1, threshold=0.0).collect()
    }
    # doc0 vs doc2: unigram sets {the,quick,brown,fox,jumps,over,lazy,dog}
    # vs {...leaps...}: |common|=7, |union|=9
    assert pairs[(0, 2)] == pytest.approx(7 / 9)
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert pairs[(3, 4)] == pytest.approx(1.0)  # permutation: same token set
    # thresholding keeps only the near-dups
    hi = D.ngram_jaccard_pairs(docs, n=1, threshold=0.75).collect()
    assert {(r["id_a"], r["id_b"]) for r in hi} == {(0, 1), (0, 2), (1, 2), (3, 4)}


def test_ngram_bigram_ordering_sensitivity(spark, docs):
    # permuted doc 3/4 share all unigrams but few bigrams
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, n=2, threshold=0.0).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    # doc3/doc4 share 4 of 8 distinct bigrams -> 0.5, well under their
    # unigram jaccard of 1.0
    assert pairs.get((3, 4), 0.0) == pytest.approx(0.5)


def test_minhash_signature_matches_python(spark, docs):
    sigs = {r["id"]: list(r["sig"]) for r in D.minhash_signatures(docs, n=1).collect()}
    for i, t in CORPUS:
        assert sigs[i] == py_minhash(set(py_tokens(t))), f"doc {i}"
    assert sigs[0] == sigs[1]  # identical docs, identical signatures
    assert sigs[3] == sigs[4]  # same unigram set


def test_minhash_empty_doc_sentinel(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="")], "doc_id long, text string")
    sig = D.minhash_signatures(df, n=1).collect()[0]["sig"]
    assert list(sig) == [MH_PRIME] * 8


def test_lsh_candidates_contain_true_neardups(spark, docs):
    cand = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(docs, n=1, k=8, bands=4).collect()
    }
    # identical-signature pairs collide in every band — guaranteed candidates
    assert (0, 1) in cand and (3, 4) in cand
    verified = D.lsh_candidate_pairs(docs, n=1, k=8, bands=4, threshold=0.75)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (0, 1) in got and (3, 4) in got
    assert all(p in cand for p in got)  # verify only filters


def test_lsh_max_bucket_drops_degenerate_buckets(spark):
    same = spark.createDataFrame(
        [Row(doc_id=i, text="same text forever") for i in range(10)],
        "doc_id long, text string",
    )
    assert (
        D.lsh_candidate_pairs(same, max_bucket=5).count() == 0
        and D.lsh_candidate_pairs(same).count() == 45
    )


def test_simhash_matches_python(spark, docs):
    fps = {r["id"]: r["simhash"] for r in D.simhash_fingerprints(docs).collect()}
    for i, t in CORPUS:
        assert fps[i] == py_simhash(py_tokens(t)), f"doc {i}"
    assert fps[0] == fps[1]


def test_simhash_pairs_equal_bruteforce(spark, docs):
    fps = {i: py_simhash(py_tokens(t)) for i, t in CORPUS}
    # default (60-bit Manku shape) and legacy 32-bit both checked
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_pairs(docs, max_hamming=3, n_blocks=4).collect()
    }
    assert got == want
    with pytest.raises(ValueError):
        D.simhash_pairs(docs, max_hamming=5, n_blocks=4)


def test_embedding_neardup_pairs(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((12, 8)).astype(np.float32)
    vecs[5] = vecs[3] + 0.01 * rng.standard_normal(8).astype(np.float32)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.embedding_neardup_pairs(df, threshold=0.95).collect()
    }
    v = vecs.astype(np.float64)
    sims = (v @ v.T) / (
        np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
    )
    want = {
        (a, b): sims[a, b]
        for a, b in itertools.combinations(range(12), 2)
        if sims[a, b] >= 0.95
    }
    assert set(got) == set(want) and (3, 5) in got
    for p, c in got.items():
        assert c == pytest.approx(want[p], abs=1e-9)


def test_dedup_clusters_connected_components(spark):
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # components: {0,1,2,3} (chain), {5,6}, singletons 4,7,8,9
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    reps = {r["doc_id"]: r["rep"] for r in D.dedup_clusters(ids, pairs).collect()}
    assert reps == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}


def test_dedup_clusters_from_jaccard_pairs(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, n=1, threshold=0.75)
    ids = docs.select("doc_id")
    reps = {r["doc_id"]: r["rep"] for r in D.dedup_clusters(ids, pairs).collect()}
    # docs 0,1,2 are one near-dup component; 3,4 another; 5 alone
    assert reps[0] == reps[1] == reps[2] == 0
    assert reps[3] == reps[4] == 3
    assert reps[5] == 5
    survivors = sorted(d for d, r in reps.items() if d == r)
    assert survivors == [0, 3, 5]


def test_simhash_32bit_still_supported(spark, docs):
    """The narrow 32-bit shape remains available for compat (explicit
    n_bits); defaults are the scale-sane 60-bit/15-bit-block shape."""
    fps = {
        r["id"]: r["simhash"]
        for r in D.simhash_fingerprints(docs, n_bits=32).collect()
    }
    for i, t in CORPUS:
        assert fps[i] == py_simhash(py_tokens(t), n_bits=32), f"doc {i}"
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_pairs(
            docs, n_bits=32, max_hamming=3, n_blocks=4
        ).collect()
    }
    assert got == want


def test_simhash_max_bucket_drops_degenerate_buckets(spark):
    """Identical docs collapse into one (blk, val) bucket per block; the
    skew cap drops those buckets before the pair join (mirrors the LSH
    guard)."""
    same = spark.createDataFrame(
        [Row(doc_id=i, text="same text everywhere") for i in range(12)],
        "doc_id long, text string",
    )
    assert D.simhash_pairs(same, max_bucket=5).count() == 0
    assert D.simhash_pairs(same).count() == 66  # 12 choose 2


def test_lsh_verify_is_candidate_local(spark, docs):
    """Threshold verification equals exact Jaccard restricted to the
    candidate set (never a corpus-wide pairwise join): every verified pair
    is a candidate AND its jaccard matches ngram_jaccard_pairs."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, n=1, threshold=0.0).collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(docs, n=1, k=8, bands=4).collect()
    }
    verified = D.lsh_candidate_pairs(
        docs, n=1, k=8, bands=4, threshold=0.6
    ).collect()
    for r in verified:
        key = (r["id_a"], r["id_b"])
        assert key in cand
        assert abs(r["jaccard"] - exact[key]) < 1e-12
        assert r["jaccard"] >= 0.6


def test_ngram_max_doc_freq_prunes_head_shingles(spark, docs):
    """The max_doc_freq guard drops head shingles from the join side only:
    emitted pairs' jaccard is a lower bound of the exact value and no pair
    is emitted that the exact computation would reject."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, n=1, threshold=0.0).collect()
    }
    pruned = D.ngram_jaccard_pairs(docs, n=1, threshold=0.5, max_doc_freq=3).collect()
    assert len(pruned) > 0
    for r in pruned:
        key = (r["id_a"], r["id_b"])
        assert r["jaccard"] <= exact[key] + 1e-12  # lower bound
        assert exact[key] >= 0.5  # no false positives vs exact threshold

    # shingles in every doc ("the" analogue): with max_doc_freq=1 nothing
    # is joinable, so no pairs at all
    assert (
        D.ngram_jaccard_pairs(docs, n=1, threshold=0.0, max_doc_freq=1).count() == 0
    )
