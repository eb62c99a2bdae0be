"""Session-10 operators: distributed BPE tokenizer training + application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.operators import bpe


# --- independent reference (re-implemented here, not imported, so the test
# is not circular with bpe_learn_local) ------------------------------------


def _ref_bpe(word_counts, k, min_count=2):
    vocab = {w: ([c for c in w], n) for w, n in word_counts.items() if len(w) >= 2}
    merges = []
    for _ in range(k):
        pc: dict = {}
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + n
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        for w, (syms, n) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, n)
    return merges


CORPUS = [
    "the lower the newer the wider",
    "low lower lowest new newer newest",
    "wide wider widest low low low",
    "newer lower wider newest lowest",
]


def _word_counts(docs):
    wc: dict = {}
    for t in docs:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_learn_matches_independent_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    got = bpe.bpe_learn(df, 6)
    ref = _ref_bpe(_word_counts(CORPUS), 6)
    assert got == ref
    # and the module's pure-python trainer (the oracle path) agrees too
    assert bpe.bpe_learn_local(list(_word_counts(CORPUS).items()), 6) == ref


def test_bpe_local_greedy_left_to_right():
    # "aaa" + merge (a,a) -> [aa, a]: newly formed symbols never re-merge
    # under the same rule within the pass
    assert bpe._apply_local(list("aaa"), "a", "a") == ["aa", "a"]
    assert bpe._apply_local(list("aaaa"), "a", "a") == ["aa", "aa"]
    # cascade across DIFFERENT rules is allowed (later fold in the chain)
    s = bpe._apply_local(list("aaa"), "a", "a")
    assert bpe._apply_local(s, "aa", "a") == ["aaa"]


def test_bpe_spark_fold_matches_local(spark):
    # the Spark aggregate() fold == the python greedy pass, including the
    # self-pair and merged-symbol-as-left cases
    words = ["aaa", "aaaa", "banana", "a", "ab"]
    merges = [("a", "a"), ("a", "n"), ("an", "an")]
    df = spark.createDataFrame([(w,) for w in words], ["wd"])
    expr = bpe.apply_merges_spark_sql("wd", merges)
    got = {r["wd"]: r["syms"] for r in df.select("wd", F.expr(expr).alias("syms")).collect()}
    for w in words:
        s = [c for c in w]
        for a, b in merges:
            s = bpe._apply_local(s, a, b)
        assert got[w] == s, (w, got[w], s)


def test_bpe_min_count_stop(spark):
    # every pair unique -> all counts 1 -> min_count=2 stops immediately
    df = spark.createDataFrame([(0, "abc def")], ["doc_id", "text"])
    assert bpe.bpe_learn(df, 5) == []
    # min_count=1 learns something
    assert len(bpe.bpe_learn(df, 5, min_count=1)) > 0


def test_bpe_apply_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(0, "low lower")], ["doc_id", "text"])
    out = bpe.bpe_apply(df, [("l", "o"), ("lo", "w")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map: the 100 TB application shape
    rows = {r["doc_id"]: r["bpe"] for r in out.collect()}
    assert rows[0] == ["low", "low", "e", "r"]


def test_bpe_symbol_literal_guard():
    with pytest.raises(ValueError):
        bpe.apply_merges_spark_sql("wd", [("a'", "b")])
