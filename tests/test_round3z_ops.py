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
    with pytest.raises(ValueError):
        T.dsir_importance(docs, "is_tgt", feature_hash="sha1")


def test_dsir_plan_knobs_value_identical(docs):
    base = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(docs, "is_tgt", n_buckets=64).collect()
    }
    # persist_features=False: the leak-free two-scan plan, same values
    nop = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(
            docs, "is_tgt", n_buckets=64, persist_features=False
        ).collect()
    }
    assert set(base) == set(nop)
    for d, (n, w) in base.items():
        assert nop[d][0] == n and nop[d][1] == pytest.approx(w, rel=1e-12)
    # xxhash64 (sql engine only): same shape/feature counts (bucket
    # assignment differs by design — the production hash is not the
    # oracle hash)
    xx = {
        r["doc_id"]: r["n_feats"]
        for r in T.dsir_importance(
            docs, "is_tgt", n_buckets=64, feature_hash="xxhash64",
            engine="sql",
        ).collect()
    }
    assert set(xx) == set(base)
    assert all(xx[d] == base[d][0] for d in base)


def test_dsir_engines_identical(docs):
    """pandas batch kernel == SQL explode chain: n_feats exactly equal,
    logw to FP round-off (the pandas path groups (doc,bucket) counts —
    the oracle's own shape — so only summation grouping differs)."""
    pd_res = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(
            docs, "is_tgt", n_buckets=64, engine="pandas"
        ).collect()
    }
    sql_res = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(
            docs, "is_tgt", n_buckets=64, engine="sql"
        ).collect()
    }
    assert set(pd_res) == set(sql_res)
    for d, (n, w) in sql_res.items():
        assert pd_res[d][0] == n
        assert pd_res[d][1] == pytest.approx(w, rel=1e-12)
    # fused (the round-4 default): same doc set, n_feats exact, logw to
    # FP round-off (prefix-sum differences vs grouped sums)
    fu_res = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(
            docs, "is_tgt", n_buckets=64, engine="fused"
        ).collect()
    }
    assert set(fu_res) == set(sql_res)
    for d, (n, w) in sql_res.items():
        assert fu_res[d][0] == n
        assert fu_res[d][1] == pytest.approx(w, rel=1e-9)
    # invalid combinations are loud
    with pytest.raises(ValueError):
        T.dsir_importance(docs, "is_tgt", engine="arrow")
    with pytest.raises(ValueError):
        T.dsir_importance(
            docs, "is_tgt", feature_hash="xxhash64", engine="pandas"
        )


def test_dsir_pandas_null_target_and_unicode(spark):
    """NULL target counts as non-target (both engines); non-ASCII
    features hash identically through the Python md5 and hash60_expr."""
    rows = [
        (1, "héllo wörld héllo", True),
        (2, "héllo naïve café", None),
        (3, "wörld café zebra", False),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, is_tgt boolean"
    )
    a = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(
            df, "is_tgt", n_buckets=32, engine="pandas"
        ).collect()
    }
    b = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(
            df, "is_tgt", n_buckets=32, engine="sql"
        ).collect()
    }
    assert set(a) == {1, 2, 3} and set(b) == {1, 2, 3}
    for d, (n, w) in b.items():
        assert a[d][0] == n
        assert a[d][1] == pytest.approx(w, rel=1e-12)


def test_dsir_string_ids_survive_default_engine(spark):
    """Round-4 advice #3: the fused default must preserve a non-integer id
    column's dtype (web corpora key on URL/string ids) — it previously
    hardcoded `long` and crashed in Arrow conversion. Values must match
    the sql engine on the same string-keyed frame."""
    rows = [
        ("url-a", "alpha beta alpha", True),
        ("url-b", "alpha beta gamma", False),
        ("url-c", "zeta eta theta", False),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, is_tgt boolean")
    fu = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(df, "is_tgt", n_buckets=32).collect()
    }
    sq = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in T.dsir_importance(
            df, "is_tgt", n_buckets=32, engine="sql"
        ).collect()
    }
    assert set(fu) == set(sq) == {"url-a", "url-b", "url-c"}
    for d, (n, w) in sq.items():
        assert fu[d][0] == n
        assert fu[d][1] == pytest.approx(w, rel=1e-9)


def test_dsir_unigram_hash_memo_is_capped(monkeypatch):
    """Round-4 advice #2: _DSIR_UHASH must stop inserting past its cap —
    an unbounded web vocabulary would otherwise grow executor memory
    without bound. Past the cap, values still compute correctly (hash
    uncached), the dict just stops growing."""
    import numpy as np
    import pandas as pd

    from elasticsearch_assets_spark.operators import textstats as TS

    monkeypatch.setattr(TS, "_DSIR_UHASH", {})
    monkeypatch.setattr(TS, "_DSIR_UHASH_CAP", 3)
    pdf = pd.DataFrame({"_txt": ["aa bb cc dd ee aa"]})
    uni_b, _, lens, _ = TS._dsir_batch_buckets(pdf, 64, "_txt")
    assert lens.sum() == 6
    assert len(TS._DSIR_UHASH) == 3  # capped, not 5
    # bit-parity with the uncapped run
    monkeypatch.setattr(TS, "_DSIR_UHASH", {})
    monkeypatch.setattr(TS, "_DSIR_UHASH_CAP", 4_000_000)
    uni_b2, _, _, _ = TS._dsir_batch_buckets(pdf, 64, "_txt")
    assert np.array_equal(uni_b, uni_b2)
    assert len(TS._DSIR_UHASH) == 5


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


# --- runtime fields --------------------------------------------------------

from elasticsearch_assets_spark.query.runtime_fields import (  # noqa: E402
    apply_runtime_mappings,
    validate_runtime_mappings,
)


def test_runtime_fields_chain_and_shadow(spark):
    df = spark.createDataFrame([(1, 10), (2, 300)], "id long, n long")
    out = apply_runtime_mappings(
        df,
        {
            "kb": "CAST(n AS DOUBLE) / 1024.0",
            "kb2": "kb * 2",          # later field references earlier one
            "n": "n + 1",             # shadows the mapped field (ES semantics)
        },
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["kb2"] == pytest.approx(2 * 10 / 1024.0)
    assert rows[1]["n"] == 11


def test_runtime_fields_validation_is_loud(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception):
        validate_runtime_mappings({"bad": "SELECT FROM WHERE"})
    with pytest.raises(ValueError):
        validate_runtime_mappings({"empty": "   "})
    # valid parse but unresolvable column fails at resolution, loudly
    with pytest.raises(Exception):
        apply_runtime_mappings(df, {"x": "no_such_col + 1"}).collect()


def test_runtime_field_filter_pushes_to_scan(spark, tmp_path):
    p = str(tmp_path / "rt.parquet")
    spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "id long, n long"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = apply_runtime_mappings(df, {"big": "n > 500"}).where("big")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n), GreaterThan(n,500)]" in plan


# --- field_caps ------------------------------------------------------------

from elasticsearch_assets_spark.sources.field_caps import (  # noqa: E402
    field_caps,
)


def test_field_caps_merges_and_maps_types(spark):
    a = spark.createDataFrame([], "doc_id long, text string, lang string")
    b = spark.createDataFrame([], "doc_id long, vec array<float>, ok boolean")
    out = {
        (r["field"], r["es_type"]): r
        for r in field_caps(spark, {"ia": a, "ib": b}).collect()
    }
    assert out[("doc_id", "long")]["n_indices"] == 2
    assert out[("doc_id", "long")]["indices"] == "ia,ib"
    t = out[("text", "text")]
    assert t["searchable"] and not t["aggregatable"]
    v = out[("vec", "dense_vector")]
    assert v["searchable"] and not v["aggregatable"]
    assert out[("lang", "keyword")]["aggregatable"]
    assert out[("ok", "boolean")]["indices"] == "ib"


def test_field_caps_same_field_different_types_two_rows(spark):
    a = spark.createDataFrame([], "x long")
    b = spark.createDataFrame([], "x string")
    rows = field_caps(spark, {"ia": a, "ib": b}).collect()
    got = {(r["field"], r["es_type"]): r["indices"] for r in rows}
    assert got == {("x", "long"): "ia", ("x", "keyword"): "ib"}


def test_field_caps_unmapped_type_raises(spark):
    bad = spark.createDataFrame([], "m map<string,string>")
    with pytest.raises(ValueError, match="no ES type mapping"):
        field_caps(spark, {"i": bad})
    with pytest.raises(ValueError):
        field_caps(spark, {})


# --- filtered kNN ----------------------------------------------------------

import numpy as np  # noqa: E402

from elasticsearch_assets_spark.operators import similarity as S  # noqa: E402


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.randn(8)], i % 4) for i in range(80)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_filtered_is_not_a_post_filter(vecs):
    qv = [1.0] + [0.0] * 7
    unfiltered = [r["vec_id"] for r in S.cosine_topk(vecs, qv, k=10).collect()]
    filtered = S.knn_filtered(vecs, qv, k=10, filter="label = 3").collect()
    assert len(filtered) == 10
    assert all(r["vec_id"] % 4 == 3 for r in filtered)
    # a post-filter of the unfiltered top-10 would keep ~2-3 rows only
    post = [v for v in unfiltered if v % 4 == 3]
    assert len(post) < 10


def test_knn_filtered_short_result_when_few_qualify(vecs):
    qv = [1.0] + [0.0] * 7
    out = S.knn_filtered(vecs, qv, k=10, filter="vec_id < 3").collect()
    assert len(out) == 3  # all qualifying docs, never padded


def test_knn_filtered_ivf_parity_on_probed_cells(vecs):
    qv = [1.0] + [0.0] * 7
    cents = S.train_ivf_centroids(vecs, n_centroids=4, sample=80)
    ivf = S.knn_filtered(
        vecs, qv, k=5, filter="label % 2 = 0", method="ivf",
        centroids=cents, nprobe=4,  # all cells probed -> exact
    ).collect()
    exact = S.knn_filtered(vecs, qv, k=5, filter="label % 2 = 0").collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in ivf] == [
        (r["vec_id"], round(r["score"], 9)) for r in exact
    ]


def test_knn_filtered_validation(vecs):
    with pytest.raises(ValueError, match="method"):
        S.knn_filtered(vecs, [0.0] * 8, filter="label = 0", method="hnsw")
    with pytest.raises(ValueError, match="centroids"):
        S.knn_filtered(vecs, [0.0] * 8, filter="label = 0", method="ivf")


# --- moving_fn holt --------------------------------------------------------

from elasticsearch_assets_spark.operators import facets as OFA  # noqa: E402


def _py_holt(vals, a=0.5, b=0.5):
    s, tr = vals[0], 0.0
    for v in vals[1:]:
        s_new = a * v + (1 - a) * (s + tr)
        tr = b * (s_new - s) + (1 - b) * tr
        s = s_new
    return s + tr


@pytest.fixture(scope="module")
def series(spark):
    vals = [364, 339, 333, 326, 353, 331, 302, 312]
    return spark.createDataFrame(
        [(f"b{i:02d}", v) for i, v in enumerate(vals)],
        "bucket string, doc_count long",
    )


def test_holt_matches_sequential_fold(series):
    out = {
        r["bucket"]: r["holt"]
        for r in OFA.moving_fn(series, "holt", window=4).collect()
    }
    vals = [r["doc_count"] for r in series.orderBy("bucket").collect()]
    for i in range(len(vals)):
        w = [float(v) for v in vals[max(0, i - 3) : i + 1]]
        assert out[f"b{i:02d}"] == pytest.approx(_py_holt(w), abs=0), (i, w)


def test_holt_beta_zero_reduces_to_ewma(series):
    h = OFA.moving_fn(series, "holt", window=5, alpha=0.5, beta=0.0)
    e = OFA.moving_fn(series, "ewma", window=5, alpha=0.5)
    got_h = {r["bucket"]: r["holt"] for r in h.collect()}
    got_e = {r["bucket"]: r["ewma"] for r in e.collect()}
    assert got_h == got_e  # bit-identical: b stays 0, s == ewma fold


def test_holt_single_value_window_is_identity(series):
    out = OFA.moving_fn(series, "holt", window=1).collect()
    for r in out:
        assert r["holt"] == float(r["doc_count"])


# --- significance heuristics ------------------------------------------------

def test_mutual_information_matches_manual(spark):
    import math

    fg_df, bg_df, fg_total, bg_total = 8.0, 20.0, 50.0, 500.0
    n = bg_total
    t1, t0 = fg_df, bg_df - fg_df
    o1, o0 = fg_total - t1, (bg_total - fg_total) - t0
    exp = sum(
        (c / n) * math.log2(c * n / (r * k))
        for c, r, k in [
            (t1, t1 + t0, t1 + o1), (t0, t1 + t0, t0 + o0),
            (o1, o1 + o0, t1 + o1), (o0, o1 + o0, t0 + o0),
        ]
        if c > 0
    )
    got = _score_one(spark, "mutual_information", fg_df, bg_df, fg_total, bg_total)
    assert got == pytest.approx(exp, rel=1e-12)


def test_gnd_matches_manual_and_degenerate(spark):
    import math

    fg_df, bg_df, fg_total, bg_total = 8.0, 20.0, 50.0, 500.0
    num = max(math.log(bg_df), math.log(fg_total)) - math.log(fg_df)
    den = math.log(bg_total) - min(math.log(bg_df), math.log(fg_total))
    exp = math.exp(-2.0 * num / den)
    got = _score_one(spark, "gnd", fg_df, bg_df, fg_total, bg_total)
    assert got == pytest.approx(exp, rel=1e-12)
    # denominator degenerates only when the term is in EVERY background
    # doc AND the foreground IS the background (ln N == min) -> 1.0
    assert _score_one(spark, "gnd", 500.0, 500.0, 500.0, 500.0) == 1.0


def test_mi_under_represented_is_zero(spark):
    # fgp (1/50) < bgp (400/500)
    assert _score_one(spark, "mutual_information", 1.0, 400.0, 50.0, 500.0) == 0.0


def _score_one(spark, heuristic, fg_df, bg_df, fg_total, bg_total):
    df = spark.createDataFrame(
        [(fg_df, bg_df)], "fg_df double, bg_df double"
    )
    col = OFA.significance_score(
        heuristic, F.col("fg_df"), F.col("bg_df"), fg_total, bg_total
    )
    return df.select(col.alias("s")).collect()[0]["s"]


def test_unknown_heuristic_raises():
    with pytest.raises(ValueError, match="heuristic"):
        OFA.significance_score("nope", F.lit(1), F.lit(1), 1.0, 2.0)


# --- file sources -----------------------------------------------------------

from elasticsearch_assets_spark.sources import files as FSRC  # noqa: E402


def test_ndjson_roundtrip_with_date_slice(spark, tmp_path):
    src = str(tmp_path / "nd")
    df = spark.createDataFrame(
        [(1, "2024-01-05", "a"), (2, "2024-01-10", "b"), (3, "2024-01-20", "c")],
        "id long, d string, v string",
    )
    df.coalesce(1).write.mode("overwrite").json(src)
    out = FSRC.read_ndjson(
        spark, src, "id long, d string, v string",
        fields=["id", "v"], date_field="d",
        start="2024-01-10", end="2024-01-20",
    )
    rows = out.collect()
    assert [r["id"] for r in rows] == [2]
    # forced date field rides along even when not projected (reader.py contract)
    assert set(out.columns) == {"id", "v", "d"}


def test_csv_roundtrip_and_projection(spark, tmp_path):
    src = str(tmp_path / "csv")
    df = spark.createDataFrame(
        [(1, "hello world", 11), (2, "x", 1)], "id long, t string, n long"
    )
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(src)
    out = FSRC.read_csv(spark, src, "id long, t string, n long", fields=["id", "n"])
    assert sorted((r["id"], r["n"]) for r in out.collect()) == [(1, 11), (2, 1)]
    assert out.columns == ["id", "n"]


def test_file_sources_require_schema(spark):
    with pytest.raises(ValueError, match="schema"):
        FSRC.read_ndjson(spark, "/tmp/x", "")
    with pytest.raises(ValueError, match="schema"):
        FSRC.read_csv(spark, "/tmp/x", None)  # type: ignore[arg-type]


def test_to_parquet_conversion(spark, tmp_path):
    src, dst = str(tmp_path / "nd2"), str(tmp_path / "pq")
    spark.createDataFrame(
        [(i, f"t{i}", "en" if i % 2 else "de") for i in range(20)],
        "id long, t string, lang string",
    ).coalesce(1).write.mode("overwrite").json(src)
    df = FSRC.read_ndjson(spark, src, "id long, t string, lang string")
    FSRC.to_parquet(df, dst, partition_by=["lang"], repartition=2)
    back = spark.read.parquet(dst)
    assert back.count() == 20
    import os
    assert sorted(
        d for d in os.listdir(dst) if d.startswith("lang=")
    ) == ["lang=de", "lang=en"]


# --- ES|QL COMPLETION -------------------------------------------------------

from elasticsearch_assets_spark.query.esql import esql  # noqa: E402


def test_esql_completion_stand_in(spark):
    df = spark.createDataFrame(
        [(1, "Alpha Beta gamma delta epsilon zeta eta theta iota kappa")],
        "id long, text string",
    )
    out = esql(
        "FROM t | COMPLETION s = CONCAT('sum: ', text) WITH m1 | KEEP id, s",
        tables={"t": df},
    ).collect()
    # first 8 analyzed tokens of the PROMPT (prefix included), id-tagged
    assert out[0]["s"] == "[m1] sum alpha beta gamma delta epsilon zeta eta"


def test_esql_completion_column_usable_downstream(spark):
    df = spark.createDataFrame([(1, "x y"), (2, "z")], "id long, text string")
    out = esql(
        "FROM t | COMPLETION s = text WITH m | WHERE LOCATE(s, 'z') > 0"
        " | KEEP id",
        tables={"t": df},
    ).collect()
    assert [r["id"] for r in out] == [2]


def test_esql_completion_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="COMPLETION"):
        esql("FROM t | COMPLETION text", tables={"t": df})
    # SHOW stays known-unsupported with guidance
    with pytest.raises(ValueError, match="not supported"):
        esql("FROM t | SHOW INFO", tables={"t": df})


# --- moving_fn: simple builtins + holtWinters --------------------------------

def _py_hw(ws, a=0.5, bt=0.5, g=0.5, p=3):
    s, b, c, i = ws[0], 0.0, [0.0] * p, 1
    for v in ws[1:]:
        j = i % p
        s_new = a * (v - c[j]) + (1 - a) * (s + b)
        b_new = a * bt * (v - c[j] - s) + (1 - a * bt) * b
        c_new = g * (v - (a * (v - c[j]) + (1 - a) * (s + b))) + (1 - g) * c[j]
        s, b, c[j] = s_new, b_new, c_new
        i += 1
    return s + b + c[i % p]


def test_holt_winters_matches_sequential_fold(series):
    out = {
        r["bucket"]: r["holtWinters"]
        for r in OFA.moving_fn(series, "holtWinters", window=6, period=3).collect()
    }
    vals = [r["doc_count"] for r in series.orderBy("bucket").collect()]
    for i in range(len(vals)):
        w = [float(v) for v in vals[max(0, i - 5) : i + 1]]
        assert out[f"b{i:02d}"] == pytest.approx(_py_hw(w), abs=0), (i, w)


def test_holt_winters_gamma_zero_reduces_to_holt(series):
    hw = OFA.moving_fn(series, "holtWinters", window=5, gamma=0.0, period=3)
    h = OFA.moving_fn(series, "holt", window=5)
    got_hw = {r["bucket"]: r["holtWinters"] for r in hw.collect()}
    got_h = {r["bucket"]: r["holt"] for r in h.collect()}
    assert got_hw == got_h  # seasonal stays 0 -> identical fold


def test_moving_fn_simple_builtins(series):
    import numpy as np

    vals = [r["doc_count"] for r in series.orderBy("bucket").collect()]
    out = series
    for f in ("min", "max", "sum", "unweightedAvg", "stdDev"):
        out = OFA.moving_fn(out, f, window=4)
    rows = {r["bucket"]: r for r in out.collect()}
    for i in range(len(vals)):
        w = vals[max(0, i - 3) : i + 1]
        r = rows[f"b{i:02d}"]
        assert r["min"] == min(w) and r["max"] == max(w)
        assert r["sum"] == sum(w)
        assert r["unweightedAvg"] == pytest.approx(sum(w) / len(w))
        assert r["stdDev"] == pytest.approx(float(np.std(w)), rel=1e-12)


def test_moving_fn_validation(series):
    with pytest.raises(ValueError, match="unsupported"):
        OFA.moving_fn(series, "nope")
    with pytest.raises(ValueError, match="period"):
        OFA.moving_fn(series, "holtWinters", period=0)


# --- dedup cluster resolution ------------------------------------------------

from elasticsearch_assets_spark.operators import dedup as D  # noqa: E402


def test_resolve_keepers_priority_and_ties(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, rep long",
    )
    meta = spark.createDataFrame(
        # cluster 1: doc 2 wins on priority; cluster 5: tie -> lower id
        [(1, 5), (2, 1), (3, 9), (4, 7), (5, 3), (6, 3)],
        "doc_id long, prio long",
    )
    out = {r["doc_id"]: r for r in
           D.resolve_keepers(clusters, meta, priority_col="prio").collect()}
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    assert all(out[i]["keeper"] == 2 for i in (1, 2, 3))
    assert out[4]["keep"]  # singleton keeps itself
    assert out[5]["keep"] and not out[6]["keep"]  # tie -> lower doc_id


def test_resolve_keepers_exactly_one_per_cluster(spark):
    import random

    rng = random.Random(3)
    rows = [(i, i % 7) for i in range(70)]
    clusters = spark.createDataFrame(rows, "doc_id long, rep long")
    meta = spark.createDataFrame(
        [(i, rng.randint(0, 5)) for i in range(70)], "doc_id long, prio long"
    )
    out = D.resolve_keepers(clusters, meta, priority_col="prio").collect()
    by_rep = {}
    for r in out:
        by_rep.setdefault(r["rep"], []).append(r)
    for rep, members in by_rep.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1
        best = min(members, key=lambda m: (m["prio"], m["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]


# --- bigram LM (stupid backoff) ----------------------------------------------

def test_bigram_lm_matches_brute_force(spark):
    import hashlib  # noqa: F401  (parallel with the DSIR brute force)

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "a dog sat"),
        (3, "solo"),          # < 2 tokens -> drops
        (4, "the cat sat on the mat again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in T.bigram_lm_score(df).collect()
    }
    # brute force
    tok = lambda s: re.findall(r"[^\W_]+", s.lower())  # noqa: E731
    bgs, unis = {}, {}
    for _, text in rows:
        ts = tok(text)
        for w in ts:
            unis[w] = unis.get(w, 0) + 1
        for i in range(len(ts) - 1):
            bgs[(ts[i], ts[i + 1])] = bgs.get((ts[i], ts[i + 1]), 0) + 1
    ctx = {}
    for (v, _), c in bgs.items():
        ctx[v] = ctx.get(v, 0) + c
    t = sum(unis.values())
    exp = {}
    for doc_id, text in rows:
        ts = tok(text)
        if len(ts) < 2:
            continue
        lps = []
        for i in range(len(ts) - 1):
            v, w = ts[i], ts[i + 1]
            p = bgs[(v, w)] / ctx[v]  # in-corpus: always observed
            lps.append(-math.log(p))
        exp[doc_id] = (len(lps), sum(lps) / len(lps))
    assert set(got) == set(exp)
    for d, (n, x) in exp.items():
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(x, rel=1e-12)


def test_bigram_lm_backoff_arm_on_held_out(spark):
    # freeze counts on a train corpus (counts_from), score held-out docs:
    # seen bigram -> cnt/ctx arm; unseen bigram of seen words -> backoff
    # 0.4*cf(w)/T; OOV word -> add-one floor 0.4*1/T
    train = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma"), (2, "beta delta"),
         (3, "beta gamma")],
        "doc_id long, text string",
    )
    # ctx(beta) = 3 (left-context occurrences), cnt(beta gamma) = 2,
    # unigram T = 8, cf(gamma) = 2
    held = spark.createDataFrame(
        [(10, "beta gamma"),     # seen bigram: p = 2/3
         (11, "alpha gamma"),    # unseen bigram, seen w: p = 0.4*2/8
         (12, "alpha qqq")],     # OOV word (add-one floor): p = 0.4*1/8
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["xent"]
        for r in T.bigram_lm_score(held, counts_from=train).collect()
    }
    assert got[10] == pytest.approx(-math.log(2 / 3), rel=1e-12)
    assert got[11] == pytest.approx(-math.log(0.4 * 2 / 8), rel=1e-12)
    assert got[12] == pytest.approx(-math.log(0.4 * 1 / 8), rel=1e-12)


def test_bigram_lm_rare_continuations_score_higher(spark):
    corpus = spark.createDataFrame(
        [(0, "x y x y x y x y"), (1, "x z")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["xent"] for r in T.bigram_lm_score(corpus).collect()}
    assert got[0] < got[1]


# --- token budget plan --------------------------------------------------------

from elasticsearch_assets_spark.operators.sampling import (  # noqa: E402
    token_budget_plan,
)


def test_token_budget_plan_caps_and_deficit(spark):
    acct = spark.createDataFrame(
        [("a", 100), ("b", 1000), ("c", 500)], "source string, n_tokens long"
    )
    out = {
        r["source"]: r
        for r in token_budget_plan(
            acct, {"a": 1.0, "b": 1.0}, 2000, max_epochs=3.0
        ).collect()
    }
    assert set(out) == {"a", "b"}  # unweighted strata drop
    # a: target 1000 over 100 avail -> capped at 3 epochs, deficit 700
    assert out["a"]["rate"] == pytest.approx(3.0)
    assert out["a"]["achieved_tokens"] == pytest.approx(300.0)
    assert out["a"]["deficit_tokens"] == pytest.approx(700.0)
    # b: target 1000 over 1000 avail -> rate 1, no deficit
    assert out["b"]["rate"] == pytest.approx(1.0)
    assert out["b"]["deficit_tokens"] == pytest.approx(0.0)


def test_token_budget_plan_validation(spark):
    acct = spark.createDataFrame([("a", 100)], "source string, n_tokens long")
    with pytest.raises(ValueError, match="unknown strata"):
        token_budget_plan(acct, {"zz": 1.0}, 100)
    with pytest.raises(ValueError, match="positive"):
        token_budget_plan(acct, {"a": 1.0}, 0)
    with pytest.raises(ValueError, match="non-empty"):
        token_budget_plan(acct, {}, 100)
