"""Round-3 batch: training-pipeline selection ops — tokenizer fertility,
DSIR importance resampling (Xie et al. 2023), CCNet perplexity buckets
(Wenzek et al. 2020).

All three are corpus-curation stages a 100 TB pretraining pipeline runs
between dedup and packing; each has an exact DuckDB contract twin
(fertility_stats / dsir_weights / ccnet_buckets rows).
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators import textstats as T
from elasticsearch_assets_spark.operators.texthash import tokens_expr


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the data pipeline runs the data", True),
        (1, "don't split contractions like we'll or it's", False),
        (2, "numbers 123 and version 4.5 mix with words", True),
        (3, "   leading space, punctuation!!! and: braces {x}", False),
        (4, "unicode café naïve 中文 tokens", True),
        (5, "", False),
        (6, "repeat repeat repeat repeat", True),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_tgt boolean"
    )


# --- fertility -----------------------------------------------------------

# Python-re mirror of PRETOKEN_RE (\p{L}/\p{N} -> [^\W\d_]/\d over str)
_PY_PRETOKEN = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+"
)


def _py_units(text: str) -> list[str]:
    return [m for m in _PY_PRETOKEN.findall(text) if m.strip()]


def test_fertility_matches_python_re(docs):
    out = {
        r["doc_id"]: r
        for r in T.fertility_stats(docs).collect()
    }
    for row in docs.collect():
        exp_units = _py_units(row["text"])
        got = out[row["doc_id"]]
        assert got["n_subwords"] == len(exp_units), (row["text"], exp_units)
        assert got["n_words"] == len(row["text"].split())
        assert got["n_bytes"] == len(row["text"].encode("utf-8"))
        assert got["n_chars"] == len(row["text"])


def test_fertility_ratios_and_empty_doc(docs):
    out = {r["doc_id"]: r for r in T.fertility_stats(docs).collect()}
    empty = out[5]
    assert empty["n_subwords"] == 0 and empty["n_words"] == 0
    assert empty["fertility"] is None and empty["bytes_per_token"] is None
    full = out[0]
    assert full["fertility"] == pytest.approx(
        full["n_subwords"] / full["n_words"]
    )
    assert full["bytes_per_token"] == pytest.approx(
        full["n_bytes"] / full["n_subwords"]
    )


def test_fertility_contractions_counted_as_separate_units(docs):
    # "don't" -> "don" + "'t"; "we'll" -> "we" + "'ll" (GPT-2 behavior)
    units = _py_units("don't split we'll")
    assert "'t" in units and "'ll" in units
    got = T.fertility_stats(docs).where(F.col("doc_id") == 1).collect()[0]
    assert got["n_subwords"] == len(_py_units(
        "don't split contractions like we'll or it's"
    ))


# --- DSIR ----------------------------------------------------------------

def _brute_dsir(rows, n_buckets, lam):
    """Numpy-free brute force of the paper's weight over the same hashed
    buckets (md5-60bit % B, unigrams + bigrams)."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    tok_re = re.compile(r"[^\W_]+", re.UNICODE)
    doc_feats = {}
    for doc_id, text, tgt in rows:
        toks = tok_re.findall(text.lower())
        feats = toks + [
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        ]
        doc_feats[doc_id] = (tgt, [h60(f) % n_buckets for f in feats])
    q, p = {}, {}
    for tgt, bs in doc_feats.values():
        for b in bs:
            q[b] = q.get(b, 0) + 1
            if tgt:
                p[b] = p.get(b, 0) + 1
    tq, tp = sum(q.values()), sum(p.values())
    out = {}
    for doc_id, (tgt, bs) in doc_feats.items():
        if not bs:
            continue
        logw = sum(
            math.log((p.get(b, 0) + lam) / (tp + lam * n_buckets))
            - math.log((q[b] + lam) / (tq + lam * n_buckets))
            for b in bs
        )
        out[doc_id] = (len(bs), logw)
    return out


def test_dsir_matches_brute_force(docs):
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(docs, "is_tgt", n_buckets=64).collect()
    }
    rows = [(r["doc_id"], r["text"], r["is_tgt"]) for r in docs.collect()]
    exp = _brute_dsir(rows, 64, 0.5)
    assert set(got) == set(exp)  # doc 5 (empty) drops from both
    for doc_id, (n, logw) in exp.items():
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(logw, rel=1e-9)


def test_dsir_target_docs_score_higher_on_their_own_terms(spark):
    # target slice repeats a marker term; docs made of that term must
    # outweigh docs made of never-in-target terms
    rows = [(i, "alpha beta gamma", True) for i in range(5)] + [
        (10, "alpha beta gamma", False),
        (11, "zeta eta theta", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    w = {
        r["doc_id"]: r["logw"]
        for r in T.dsir_importance(df, "is_tgt", n_buckets=128).collect()
    }
    assert w[10] > w[11]


def test_dsir_validates_buckets(docs):
    with pytest.raises(ValueError):
        T.dsir_importance(docs, "is_tgt", n_buckets=1)


# --- CCNet buckets -------------------------------------------------------

def test_ccnet_exact_thirds(docs):
    present = docs.where(F.length("text") > 0)  # empty doc has no tokens
    out = T.ccnet_buckets(present).collect()
    n = len(out)
    sizes = {"head": 0, "middle": 0, "tail": 0}
    for r in out:
        sizes[r["bucket"]] += 1
    assert sizes["head"] == n // 3
    assert sizes["head"] + sizes["middle"] == (2 * n) // 3
    # bucket order tracks (xent_r, doc_id) ascending
    ranked = sorted(out, key=lambda r: (r["xent_r"], r["doc_id"]))
    labels = [r["bucket"] for r in ranked]
    assert labels == sorted(
        labels, key=lambda b: {"head": 0, "middle": 1, "tail": 2}[b]
    )


def test_ccnet_approx_path_no_global_sort(docs):
    present = docs.where(F.length("text") > 0)
    out = T.ccnet_buckets(present, thresholds="approx")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan.split("Exchange")[0]  # no global sort stage
    rows = out.collect()
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail"}
    # monotone: any head xent_r <= any tail xent_r
    by = {}
    for r in rows:
        by.setdefault(r["bucket"], []).append(r["xent_r"])
    if by.get("head") and by.get("tail"):
        assert max(by["head"]) <= min(by["tail"])


def test_ccnet_rejects_unknown_thresholds(docs):
    with pytest.raises(ValueError):
        T.ccnet_buckets(docs, thresholds="nope")
