"""Round-3 batch: ES|QL FUSE + the scalar-function rewrite layer.

Reference behavior: ES|QL FUSE (ES 9.1, tech preview) merges FORK
branches that retrieved the same document, assigning an RRF score;
ES|QL scalar/aggregate functions (TO_*, MV_*, CASE, DATE_*, CIDR_MATCH,
STARTS_WITH, LOCATE, COUNT_DISTINCT, MEDIAN) per the ES|QL function
reference. All compile to JVM column expressions via esql._rewrite_funcs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.query.esql import _rewrite_funcs, esql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the data pipeline", "en", "src1", 17),
        (1, "ein anderes dokument", "de", "src2", 20),
        (2, "the spark join data", "en", "src1", 19),
        (3, "third doc here", "en", "src3", 14),
        (4, "vier datenpunkte", "de", "src1", 16),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# --- rewrite layer -------------------------------------------------------

def test_rewrite_nested_and_case_insensitivity_contract():
    # uppercase = ES|QL spelling, lowercase passes through as Spark SQL
    assert _rewrite_funcs("TO_UPPER(x)") == "upper(x)"
    assert _rewrite_funcs("date_format(ts, 'y')") == "date_format(ts, 'y')"
    assert _rewrite_funcs("DATE_FORMAT('y', ts)") == "date_format(ts, 'y')"
    assert (
        _rewrite_funcs("STARTS_WITH(TO_LOWER(a), TO_STRING(b))")
        == "startswith(lower(a), CAST(b AS STRING))"
    )


def test_rewrite_case_odd_even_args():
    assert "ELSE 0" in _rewrite_funcs("CASE(a == 1, 2, 0)")
    assert "ELSE" not in _rewrite_funcs("CASE(a == 1, 2)")
    with pytest.raises(ValueError):
        _rewrite_funcs("CASE(a)")


def test_rewrite_cidr_folds_literal_bounds():
    out = _rewrite_funcs("CIDR_MATCH(ip, '192.168.1.0/24')")
    assert "BETWEEN 3232235776 AND 3232236031" in out
    with pytest.raises(ValueError):
        _rewrite_funcs("CIDR_MATCH(ip, block_col)")  # must be a literal


def test_rewrite_date_diff_unit_validation():
    assert _rewrite_funcs("DATE_DIFF('hour', a, b)").startswith(
        "timestampdiff(HOUR"
    )
    with pytest.raises(ValueError):
        _rewrite_funcs("DATE_DIFF('fortnight', a, b)")


def test_mv_functions_match_python(spark, docs):
    out = esql(
        "FROM d | EVAL arr = MV_SORT(array(n_chars, doc_id, 3)),"
        " s = MV_SUM(arr), a = MV_AVG(arr), f = MV_FIRST(arr),"
        " l = MV_LAST(arr), n = MV_COUNT(MV_DEDUPE(arr))"
        " | KEEP doc_id, s, a, f, l, n | SORT doc_id",
        tables={"d": docs},
    ).collect()
    for r in out:
        vals = sorted([r["doc_id"], 3])  # n_chars added below
    for r, (doc_id, _, _, _, n_chars) in zip(out, sorted(
        [(0, 0, 0, 0, 17), (1, 0, 0, 0, 20), (2, 0, 0, 0, 19),
         (3, 0, 0, 0, 14), (4, 0, 0, 0, 16)]
    )):
        vals = sorted([n_chars, doc_id, 3])
        assert r["s"] == pytest.approx(sum(vals))
        assert r["a"] == pytest.approx(sum(vals) / 3)
        assert r["f"] == vals[0] and r["l"] == vals[-1]
        assert r["n"] == len(set(vals))


# --- FUSE ----------------------------------------------------------------

def _fuse_frame(spark, docs, rc=60):
    return esql(
        "FROM d | EVAL _id = doc_id"
        " | FORK (WHERE lang == 'en' | EVAL _score = TO_DOUBLE(n_chars)"
        "          | SORT _score DESC, _id ASC | LIMIT 10)"
        "        (WHERE source == 'src1' | EVAL _score = TO_DOUBLE(doc_id)"
        "          | SORT _score DESC, _id ASC | LIMIT 10)"
        f" | FUSE rrf KEY BY _id RANK_CONSTANT {rc}"
        " | SORT _score DESC, _id ASC",
        tables={"d": docs},
    )


def test_fuse_rrf_matches_hand_computation(spark, docs):
    got = {r["_id"]: r["_score"] for r in _fuse_frame(spark, docs).collect()}
    # branch1 (en, by n_chars desc): 2(19), 0(17), 3(14) -> ranks 1..3
    # branch2 (src1, by doc_id desc): 4, 2, 0 -> ranks 1..3
    want = {
        2: 1 / 61 + 1 / 62,
        0: 1 / 62 + 1 / 63,
        3: 1 / 63,
        4: 1 / 61,
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v)


def test_fuse_drops_fork_and_branch_score_columns(spark, docs):
    cols = _fuse_frame(spark, docs).columns
    assert "_fork" not in cols and "_rank" not in cols
    assert "_score" in cols


def test_fuse_validation(spark, docs):
    with pytest.raises(ValueError, match="rrf | linear"):
        esql("FROM d | FUSE zscore", tables={"d": docs})
    with pytest.raises(ValueError, match="RANK_CONSTANT applies"):
        esql(
            "FROM d | EVAL _id = doc_id, _score = 1.0, _fork = 'fork1'"
            " | FUSE linear RANK_CONSTANT 10",
            tables={"d": docs},
        )
    with pytest.raises(ValueError, match="_fork"):
        esql("FROM d | EVAL _id = doc_id, _score = 1.0 | FUSE",
             tables={"d": docs})


def test_fuse_rank_constant_changes_scores(spark, docs):
    a = {r["_id"]: r["_score"] for r in _fuse_frame(spark, docs, 60).collect()}
    b = {r["_id"]: r["_score"] for r in _fuse_frame(spark, docs, 10).collect()}
    assert set(a) == set(b)
    assert all(b[k] > a[k] for k in a)


def test_aggregate_spellings(spark, docs):
    out = esql(
        "FROM d | STATS u = COUNT_DISTINCT(lang), m = MEDIAN(n_chars)",
        tables={"d": docs},
    ).collect()[0]
    assert out["u"] == 2
    assert out["m"] == pytest.approx(17.0)


# --- binary (1-bit) quantization ANN — ES BBQ ---------------------------

def test_binary_codes_cross_engine_bit_parity(spark):
    import duckdb

    from elasticsearch_assets_spark.operators import similarity as S

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(path)
    sp = {
        r["vec_id"]: r["code"]
        for r in emb.select(
            "vec_id", S.binary_code_expr("embedding").alias("code")
        ).collect()
    }
    dk = dict(
        duckdb.sql(
            f"SELECT vec_id, {S.binary_code_sql('embedding', 64, 'duckdb')} "
            f"FROM '{path}'"
        ).fetchall()
    )
    assert sp == dk


def test_binary_query_code_matches_column_packing(spark):
    from elasticsearch_assets_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    row = emb.where("vec_id = 7").select(
        "embedding", S.binary_code_expr("embedding").alias("code")
    ).head()
    assert S.binary_query_code([float(x) for x in row["embedding"]]) == row["code"]
    # bit 63 set -> negative int64 (the sign-bit constant path)
    assert S.binary_query_code([1.0] * 64) == -1
    assert S.binary_query_code([-1.0] * 64) == 0


def test_binary_dim_validation():
    from elasticsearch_assets_spark.operators import similarity as S

    import pytest as _pt

    with _pt.raises(ValueError):
        S.binary_code_sql("e", 65, "spark")
    with _pt.raises(ValueError):
        S.binary_query_code([0.0] * 65)
    with _pt.raises(ValueError):
        S.binary_code_sql("e", 8, "postgres")


def test_bbq_recall_and_exhaustive_rerank_is_exact(spark):
    from elasticsearch_assets_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 3").head()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, qv, k=10).collect()]
    got = [r["vec_id"] for r in S.ann_topk_binary(emb, qv, k=10, rerank=128).collect()]
    assert len(set(exact) & set(got)) >= 8  # oversampled hamming recall
    # rerank >= corpus -> candidate set is the whole corpus -> exact
    n = emb.count()
    full = [r["vec_id"] for r in S.ann_topk_binary(emb, qv, k=10, rerank=n).collect()]
    assert full == exact


# --- completion contexts / ERR / moving_fn -------------------------------

def test_completion_contexts_filters_and_boosts(spark, docs):
    from elasticsearch_assets_spark.operators.suggesters import (
        completion_contexts,
    )

    out = completion_contexts(
        docs, "d", ["en", "de"], boosts={"de": 3.0},
        ctx_col="lang", size=None,
    ).collect()
    by = {(r["suggestion"], r["context"]): r for r in out}
    # 'data' appears in en docs 0 and 2; 'datenpunkte' in de doc 4
    assert by[("data", "en")]["df"] == 2
    assert by[("data", "en")]["score"] == pytest.approx(2.0)
    assert by[("datenpunkte", "de")]["score"] == pytest.approx(3.0)
    assert all(r["context"] in ("en", "de") for r in out)
    with pytest.raises(ValueError):
        completion_contexts(docs, "", ["en"], ctx_col="lang")
    with pytest.raises(ValueError):
        completion_contexts(docs, "d", ["en"], boosts={"fr": 2.0},
                            ctx_col="lang")


def test_err_hand_computed(spark):
    from elasticsearch_assets_spark.operators.rankeval import (
        expected_reciprocal_rank,
    )

    results = spark.createDataFrame(
        [(0, 10, 3.0), (0, 11, 2.0), (0, 12, 1.0)],
        "query_id int, doc_id long, score double",
    )
    judgments = spark.createDataFrame(
        [(0, 10, 3), (0, 12, 2)], "query_id int, doc_id long, grade int"
    )
    got = expected_reciprocal_rank(results, judgments, k=3, max_grade=3)
    r1, r3 = 7 / 8, 3 / 8
    want = r1 / 1 + (1 - r1) * 0 / 2 + (1 - r1) * 1 * r3 / 3
    assert got.collect()[0]["err"] == pytest.approx(want)


def test_err_no_relevant_is_zero(spark):
    from elasticsearch_assets_spark.operators.rankeval import (
        expected_reciprocal_rank,
    )

    results = spark.createDataFrame(
        [(0, 1, 1.0)], "query_id int, doc_id long, score double"
    )
    judgments = spark.createDataFrame(
        [], "query_id int, doc_id long, grade int"
    )
    assert expected_reciprocal_rank(results, judgments).collect()[0][
        "err"
    ] == pytest.approx(0.0)


def test_moving_fn_hand_computed(spark):
    from elasticsearch_assets_spark.operators import facets as OFA

    ser = spark.createDataFrame(
        [("a", 2), ("b", 4), ("c", 6), ("d", 8)],
        "bucket string, doc_count long",
    )
    out = OFA.moving_fn(ser, "linearWeightedAvg", window=3)
    out = OFA.moving_fn(out, "ewma", window=3, alpha=0.5)
    rows = {r["bucket"]: r for r in out.collect()}
    assert rows["a"]["linearWeightedAvg"] == pytest.approx(2.0)
    assert rows["b"]["linearWeightedAvg"] == pytest.approx((2 + 8) / 3)
    assert rows["c"]["linearWeightedAvg"] == pytest.approx(
        (2 * 1 + 4 * 2 + 6 * 3) / 6
    )
    assert rows["d"]["linearWeightedAvg"] == pytest.approx(
        (4 * 1 + 6 * 2 + 8 * 3) / 6
    )
    # ewma fold: a; .5*4+.5*2=3; .5*6+.5*3=4.5 (window c = [2,4,6])
    assert rows["a"]["ewma"] == pytest.approx(2.0)
    assert rows["b"]["ewma"] == pytest.approx(3.0)
    assert rows["c"]["ewma"] == pytest.approx(4.5)
    assert rows["d"]["ewma"] == pytest.approx(0.5 * 8 + 0.5 * (0.5 * 6 + 0.5 * 4))
    # holtWinters graduated to a supported builtin in session 6
    # (test_round3z_ops.py); unknown names still raise
    with pytest.raises(ValueError):
        OFA.moving_fn(ser, "movavg9000")


# --- SemDeDup ------------------------------------------------------------

def test_semdedup_keep_rule_and_pair_coverage(spark):
    from elasticsearch_assets_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = S.semdedup(emb, n_centroids=8, threshold=0.45, sample=10_000)
    rows = out.collect()
    assert [r["vec_id"] for r in rows] == sorted(r["vec_id"] for r in rows)
    flags = {r["vec_id"]: r["is_dup"] for r in rows}
    cent = {r["vec_id"]: r["centroid"] for r in rows}

    # brute-force reference: same centroids (deterministic trainer), so
    # recompute priorities + pairs in python and compare every decision
    import numpy as np

    cents = S.train_ivf_centroids(emb, n_centroids=8, sample=10_000)
    pdf = emb.orderBy("vec_id").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    dots = x @ cents.T
    assign = np.argmax(dots, axis=1)
    nrm = np.linalg.norm(x, axis=1)
    ccos = dots[np.arange(len(x)), assign] / nrm
    xs = x / nrm[:, None]
    want_dup = set()
    for c in range(8):
        idx = np.where(assign == c)[0]
        sims = xs[idx] @ xs[idx].T
        for ii, i in enumerate(idx):
            for jj, j in enumerate(idx):
                if i == j or sims[ii, jj] < 0.45:
                    continue
                if (ccos[i], ids[i]) < (ccos[j], ids[j]):
                    want_dup.add(int(ids[j]))
    assert {v for v, f in flags.items() if f} == want_dup
    assert all(cent[int(ids[i])] == int(assign[i]) for i in range(len(ids)))
    assert 0 < len(want_dup) < len(ids)  # threshold actually bites


# --- watcher + validate_query --------------------------------------------

def test_watcher_fires_and_suppresses(spark):
    from elasticsearch_assets_spark.operators.watcher import execute_watch

    df = spark.createDataFrame(
        [(1, "err"), (2, "err"), (3, "ok")], "id long, kind string"
    )
    fired = execute_watch(df, {
        "input": {"filter": "kind = 'err'", "aggs": {"n": "count(*)"}},
        "condition": "n >= 2",
        "actions": ["page"],
    })
    assert fired["condition_met"] and fired["actions_fired"] == ["page"]
    assert fired["payload"]["n"] == 2
    quiet = execute_watch(df, {
        "input": {"filter": "kind = 'err'", "aggs": {"n": "count(*)"}},
        "condition": "n >= 5",
        "actions": ["page"],
    })
    assert not quiet["condition_met"] and quiet["actions_fired"] == []
    import pytest as _pt

    with _pt.raises(ValueError, match="condition"):
        execute_watch(df, {"input": {"aggs": {"n": "count(*)"}}})


def test_validate_query(spark):
    import os

    from elasticsearch_assets_spark.query.engine import InvertedIndex

    # reuse the entry's cached docs index at the test scale
    import __spark_entry__ as E

    idx = E._docs_index(spark, "/root/testdata/sf0.001")
    ok, expl = idx.validate_query("spark AND join")
    assert ok and "scoring clause" in expl
    bad, msg = idx.validate_query("spark AND (join")
    assert not bad and "unexpected end" in msg


# --- Gopher rules + C4 line filters --------------------------------------

def test_gopher_rules_hand_computed(spark):
    from elasticsearch_assets_spark.operators.textstats import gopher_rules

    good = ("the quick data pipeline should be useful to most of the "
            "folks and that they have plenty with it " * 5).strip()
    words = good.split()
    assert sum(len(w) for w in words) / len(words) >= 3.0  # fixture sanity
    rows = {r["doc_id"]: r for r in gopher_rules(spark.createDataFrame(
        [(0, good),
         (1, "# # # tiny"),
         (2, "- bullet one\n- bullet two\nplain line…")],
        "doc_id long, text string",
    )).collect()}
    g = rows[0]
    assert g["n_words"] == len(words) and g["passes_gopher"]
    assert g["n_stopwords"] == 8
    assert g["frac_alpha_words"] == pytest.approx(1.0)
    b = rows[1]
    assert b["symbol_ratio"] == pytest.approx(3 / 4)
    assert not b["passes_gopher"]  # too short, too symbol-heavy
    c = rows[2]
    assert c["frac_bullet_lines"] == pytest.approx(2 / 3)
    assert c["frac_ellipsis_lines"] == pytest.approx(1 / 3)


def test_c4_line_filter_branches(spark):
    from elasticsearch_assets_spark.operators.textstats import c4_line_filter

    rows = {r["doc_id"]: r for r in c4_line_filter(spark.createDataFrame(
        [(0, "one good sentence here.\ntwo more words follow!\n"
             "is this kept?\nno terminal punct\nshort."),
         (1, "good line number one.\nlorem ipsum filler text.\n"
             "third full line here."),
         (2, "calls function() { return 1; }\na fine line indeed.\n"
             "b fine line indeed.\nc fine line indeed.")],
        "doc_id long, text string",
    )).collect()}
    a = rows[0]
    # 'no terminal punct' dropped (no punct); 'short.' dropped (<3 words)
    assert a["n_lines"] == 5 and a["n_kept"] == 3 and a["keep"]
    assert a["cleaned_text"].split("\n") == [
        "one good sentence here.", "two more words follow!",
        "is this kept?",
    ]
    assert rows[1]["has_lorem"] and not rows[1]["keep"]
    assert rows[2]["has_brace"] and not rows[2]["keep"]


# --- ES|QL RERANK + counter rate -----------------------------------------

def test_rerank_stand_in_scorer(spark, docs):
    out = {r["doc_id"]: r["_score"] for r in esql(
        'FROM d | RERANK "spark data" ON text | KEEP doc_id, _score',
        tables={"d": docs},
    ).collect()}
    # doc 2 'the spark join data' -> overlap 2/2 + tf 2/200
    assert out[2] == pytest.approx(1.0 + 2 / 200)
    # doc 0 'the data pipeline' -> overlap 1/2 + tf 1/200
    assert out[0] == pytest.approx(0.5 + 1 / 200)
    assert out[1] == pytest.approx(0.0)
    with pytest.raises(ValueError, match="analyzable"):
        esql('FROM d | RERANK "..." ON text', tables={"d": docs})
    with pytest.raises(ValueError, match="does not exist"):
        esql('FROM d | RERANK "x" ON zzz', tables={"d": docs})


def test_counter_rate_reset_compensation(spark):
    from elasticsearch_assets_spark.operators.facets import counter_rate

    rows = [
        # series A, one hour bucket: 10 -> 25 -> 5 (reset) -> 12
        ("2024-01-01 10:00:00", "A", 10.0, 1),
        ("2024-01-01 10:10:00", "A", 25.0, 2),
        ("2024-01-01 10:20:00", "A", 5.0, 3),
        ("2024-01-01 10:30:00", "A", 12.0, 4),
        # series A, next bucket: single sample -> increase 0
        ("2024-01-01 11:10:00", "A", 20.0, 5),
        # series B: monotone
        ("2024-01-01 10:05:00", "B", 100.0, 6),
        ("2024-01-01 10:45:00", "B", 160.0, 7),
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, sid string, c double, eid long"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {(r["sid"], str(r["bucket"])): r for r in counter_rate(
        df, "ts", "c", ["sid"], 3600, order_tiebreak="eid"
    ).collect()}
    a = out[("A", "2024-01-01 10:00:00")]
    # increase = 15 + (reset -> 5) + 7 = 27
    assert a["increase"] == pytest.approx(27.0)
    assert a["rate"] == pytest.approx(27.0 / 3600)
    assert a["n_samples"] == 4
    assert out[("A", "2024-01-01 11:00:00")]["increase"] == pytest.approx(0.0)
    assert out[("B", "2024-01-01 10:00:00")]["increase"] == pytest.approx(60.0)


# --- geo_shape envelope relations ----------------------------------------

def test_envelope_relations_hand_cases(spark):
    from elasticsearch_assets_spark.operators.geo import (
        envelope_relation_predicate, envelope_relation_sql,
    )

    df = spark.createDataFrame(
        [
            (0, 0.0, 10.0, 0.0, 10.0),    # inside the query box
            (1, -5.0, 25.0, -5.0, 25.0),  # contains the query box
            (2, 15.0, 25.0, 15.0, 25.0),  # overlaps the corner
            (3, 40.0, 50.0, 40.0, 50.0),  # disjoint
        ],
        "id long, minlat double, maxlat double, minlon double, maxlon double",
    )
    q = (-1.0, 20.0, -1.0, 20.0)
    got = {}
    for rel in ("intersects", "disjoint", "within", "contains"):
        got[rel] = {
            r["id"]
            for r in df.where(
                envelope_relation_predicate(
                    "minlat", "maxlat", "minlon", "maxlon", q, rel
                )
            ).collect()
        }
    assert got["intersects"] == {0, 1, 2}
    assert got["disjoint"] == {3}
    assert got["within"] == {0}
    assert got["contains"] == {1}
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown geo_shape relation"):
        envelope_relation_sql("a", "b", "c", "d", q, "touches")
    with _pt.raises(ValueError, match="min <= max"):
        envelope_relation_sql("a", "b", "c", "d", (5, 1, 0, 1), "within")


def test_scalar_funcs_batch2(spark):
    out = esql(
        "ROW a = 1 | EVAL m3 = MV_MEDIAN(array(9, 1, 2)),"
        " m4 = MV_MEDIAN(array(1, 2, 9, 100)),"
        " sp = SPLIT('a.b.c', '.'),"
        " rep = REPLACE('banana', 'an', 'X'),"
        " t = TAU()",
        spark=spark,
    ).collect()[0]
    assert out["m3"] == pytest.approx(2.0)
    assert out["m4"] == pytest.approx(5.5)
    assert out["sp"] == ["a", "b", "c"]  # literal dot, not regex any-char
    assert out["rep"] == "bXXa"
    import math

    assert out["t"] == pytest.approx(math.tau)
    with pytest.raises(ValueError, match="literal"):
        _rewrite_funcs("SPLIT(x, col)")
    with pytest.raises(ValueError, match="DATE_TRUNC"):
        _rewrite_funcs("DATE_TRUNC(ts)")


def test_disk_usage_accounting(spark, tmp_path):
    from elasticsearch_assets_spark.datagen.pages import pages_df
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.index.stats import disk_usage

    d = str(tmp_path / "idx")
    build_index(spark, pages_df(spark, 500, partitions=4), d,
                num_segments=4, num_chunks=1)
    rows = disk_usage(d)
    by = {(r["section"], r["column"]): r for r in rows}
    assert ("stats", "term") in by and ("segments", "term") in by
    # every byte count positive; compression actually compresses the
    # posting streams (delta-varint columns are binary blobs)
    assert all(r["compressed_bytes"] > 0 for r in rows)
    total = sum(r["compressed_bytes"] for r in rows)
    import glob as g
    import os as o

    on_disk = sum(
        o.path.getsize(f)
        for f in g.glob(f"{d}/segments/*/*.parquet") + g.glob(f"{d}/stats/*.parquet")
    )
    assert 0 < total <= on_disk  # column bytes <= file bytes (footers etc.)


# --- suggest modes / stored scripts --------------------------------------

def test_suggest_modes(spark):
    import __spark_entry__ as E

    idx = E._docs_index(spark, "/root/testdata/sf0.001")
    # present input: missing-mode suppresses everything
    assert idx.suggest("spark", 2, suggest_mode="missing").count() == 0
    absent = idx.suggest("spork", 2, suggest_mode="missing")
    assert absent.count() > 0
    pop = idx.suggest("sort", 2, suggest_mode="popular").collect()
    sort_df = idx.term_stats(["sort"]).get("sort", 0)
    assert all(r["df"] > sort_df for r in pop)
    assert all(r["suggestion"] != "sort" for r in pop)
    with pytest.raises(ValueError, match="suggest_mode"):
        idx.suggest("x", suggest_mode="weird")


def test_stored_scripts_crud(spark, tmp_path):
    from elasticsearch_assets_spark.state.scripts import (
        delete_script, get_script, list_scripts, put_script,
    )

    d = str(tmp_path / "scripts")
    put_script(d, "s1", "n_chars % 3 = 0")
    put_script(d, "s2", "value > 5")
    assert get_script(d, "s1") == "n_chars % 3 = 0"
    assert set(list_scripts(d)) == {"s1", "s2"}
    put_script(d, "s1", "n_chars % 4 = 0")  # overwrite
    assert get_script(d, "s1") == "n_chars % 4 = 0"
    delete_script(d, "s2")
    with pytest.raises(KeyError):
        get_script(d, "s2")
    with pytest.raises(ValueError, match="bad script id"):
        put_script(d, "no/slash", "1 = 1")
    from pyspark.errors import ParseException

    with pytest.raises(ParseException):
        put_script(d, "broken", "n_chars %% = (")


def test_boilerplate_removal_hand_case(spark):
    from elasticsearch_assets_spark.operators.textstats import (
        remove_boilerplate_lines,
    )

    bp = "accept cookies to continue"
    rows = [
        (0, f"{bp}\nunique zero content here\nfooter menu"),
        (1, f"intro one\n{bp}\nfooter menu"),
        (2, f"{bp}\nbody two\nfooter menu"),
        (3, "totally unique document"),
    ]
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(
        spark.createDataFrame(rows, "doc_id long, text string"),
        min_doc_freq=3,
    ).collect()}
    # bp + footer appear in 3 docs -> stripped; unique lines survive in order
    assert out[0]["cleaned_text"] == "unique zero content here"
    assert out[1]["cleaned_text"] == "intro one"
    assert out[2]["cleaned_text"] == "body two"
    assert out[3]["cleaned_text"] == "totally unique document"
    assert out[0]["n_removed"] == 2 and out[3]["n_removed"] == 0
    # multi-line survivor keeps order
    out2 = remove_boilerplate_lines(
        spark.createDataFrame(
            [(9, "alpha first\nbeta second\ngamma third")],
            "doc_id long, text string",
        ),
        min_doc_freq=2,
    ).collect()[0]
    assert out2["cleaned_text"].split("\n") == [
        "alpha first", "beta second", "gamma third"
    ]


def test_esql_like_wildcards(spark):
    df = spark.createDataFrame(
        [("src1",), ("src10",), ("src2",), ("a.c",), ("abc",)], "s string"
    )
    got = sorted(
        r["s"] for r in esql('FROM t | WHERE s LIKE "src1*"',
                             tables={"t": df}).collect()
    )
    assert got == ["src1", "src10"]
    # ? is exactly one char; . is literal (portable escape)
    got2 = sorted(
        r["s"] for r in esql('FROM t | WHERE s LIKE "a.?"',
                             tables={"t": df}).collect()
    )
    assert got2 == ["a.c"]
    # single-quoted = SQL LIKE untouched
    got3 = sorted(
        r["s"] for r in esql("FROM t | WHERE s LIKE 'src%'",
                             tables={"t": df}).collect()
    )
    assert got3 == ["src1", "src10", "src2"]


def test_sigterms_background_filter_changes_scores(spark):
    from elasticsearch_assets_spark.operators.facets import significant_terms

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    matches = docs.where("text LIKE '%spark%'").select("doc_id")
    full = {r["term"]: r for r in significant_terms(
        matches, docs, n=None, min_doc_count=2
    ).collect()}
    bg = {r["term"]: r for r in significant_terms(
        matches, docs, n=None, min_doc_count=2,
        background=docs.where("lang = 'en'"),
    ).collect()}
    assert set(bg) <= set(full)  # bg df can only shrink the term set
    some = next(iter(bg))
    assert bg[some]["bg_df"] <= full[some]["bg_df"]


def test_ltr_rescore_hand_computed(spark):
    import __spark_entry__ as E

    idx = E._docs_index(spark, "/root/testdata/sf0.001")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = docs.select(
        "doc_id", (F.col("n_chars") * 0).cast("double").alias("f_zero")
    )
    # zero features + query_weight 1, model_weight 1 -> primary ranking
    base = idx.search(["spark"], k=10, mode="or").collect()
    ltr = idx.ltr_rescore(
        ["spark"], feats, {"f_zero": 5.0}, window_size=10, k=10,
        mode="or", query_weight=1.0, model_weight=1.0,
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in base] == [
        (r["doc_id"], round(r["score"], 9)) for r in ltr
    ]
    # model replaces by default: score == the linear feature value
    feats2 = docs.select(
        "doc_id", (F.col("doc_id") % 3).cast("double").alias("f_m")
    )
    out = idx.ltr_rescore(
        ["spark"], feats2, {"f_m": 2.0}, window_size=10, k=10, mode="or"
    ).collect()
    win = {r["doc_id"] for r in idx.search(["spark"], k=10, mode="or").collect()}
    assert {r["doc_id"] for r in out} == win
    assert all(r["score"] == pytest.approx((r["doc_id"] % 3) * 2.0) for r in out)
    with pytest.raises(ValueError, match="lacks columns"):
        idx.ltr_rescore(["spark"], feats2, {"nope": 1.0})


def test_terms_order_by_subagg(spark):
    from elasticsearch_assets_spark.operators.facets import (
        facet_terms_metrics,
    )

    corpus = spark.createDataFrame(
        [(0, "a", 10), (1, "a", 20), (2, "b", 100), (3, "c", 1)],
        "doc_id long, g string, v long",
    )
    matches = corpus.select("doc_id")
    by_avg = [r["bucket"] for r in facet_terms_metrics(
        corpus.select("doc_id"), corpus, "g", "v",
        order_by="avg", ascending=True,
    ).collect()]
    assert by_avg == ["c", "a", "b"]
    with pytest.raises(ValueError, match="order_by"):
        facet_terms_metrics(matches, corpus, "g", "v", order_by="median")


def test_multi_match_phrase_any_field(spark):
    import __spark_entry__ as E
    from elasticsearch_assets_spark.query.engine import multi_match as MM

    sf = "/root/testdata/sf0.001"
    tidx = E._docs_index_title(spark, sf)
    pidx = E._docs_index_pos(spark, sf)
    out = MM(
        {"title": (tidx, 2.0), "text": (pidx, 1.0)},
        ["table", "hash"], match_type="phrase", tie_breaker=0.3, k=None,
    ).collect()
    text_hits = {r["doc_id"] for r in pidx.search_phrase(
        ["table", "hash"], k=None
    ).collect()}
    title_hits = {r["doc_id"] for r in tidx.search_phrase(
        ["table", "hash"], k=None
    ).collect()}
    assert {r["doc_id"] for r in out} == text_hits | title_hits
    assert title_hits <= text_hits  # title is a prefix of text
    # a doc matching only in text scores its unboosted text score
    only_text = text_hits - title_hits
    if only_text:
        d = min(only_text)
        ts = dict(
            (r["doc_id"], r["score"])
            for r in pidx.search_phrase(["table", "hash"], k=None).collect()
        )
        got = {r["doc_id"]: r["score"] for r in out}
        assert got[d] == pytest.approx(ts[d])


def test_esql_weighted_avg_top_and_drop_wildcard(spark, docs):
    out = esql(
        "FROM d | STATS wa = WEIGHTED_AVG(n_chars, doc_id + 1),"
        " tp = TOP(n_chars, 2, 'desc'), bt = TOP(n_chars, 2, 'asc')",
        tables={"d": docs},
    ).collect()[0]
    vals = [(17, 1), (20, 2), (19, 3), (14, 4), (16, 5)]
    want = sum(v * w for v, w in vals) / sum(w for _, w in vals)
    assert out["wa"] == pytest.approx(want)
    assert out["tp"] == [20, 19] and out["bt"] == [14, 16]
    with pytest.raises(ValueError, match="TOP takes"):
        _rewrite_funcs("TOP(x, n, 'desc')")
    # DROP wildcards
    cols = esql("FROM d | DROP n_*, lang", tables={"d": docs}).columns
    assert cols == ["doc_id", "text", "source"]
    with pytest.raises(ValueError, match="matches nothing"):
        esql("FROM d | DROP zz*", tables={"d": docs})


def test_es_sql_match_and_boundaries(spark, docs):
    from elasticsearch_assets_spark.query.essql import es_sql

    out = es_sql(
        "SELECT doc_id FROM d WHERE MATCH(text, 'data') ORDER BY doc_id",
        {"d": docs},
    ).collect()
    assert [r["doc_id"] for r in out] == [0, 2]
    # view is dropped after the call
    assert spark.catalog.tableExists("d") is False
    # returned plan still executes after the drop
    df = es_sql("SELECT count(*) AS n FROM d", {"d": docs})
    assert df.collect()[0]["n"] == 5
    with pytest.raises(ValueError, match="SCORE"):
        es_sql("SELECT SCORE() FROM d", {"d": docs})
    with pytest.raises(ValueError, match="bad table name"):
        es_sql("SELECT 1", {"b;ad": docs})


def test_graph_explore_edges(spark):
    from elasticsearch_assets_spark.operators.graph import graph_explore

    corpus = spark.createDataFrame(
        [(0, "spark fast engine"), (1, "spark fast engine"),
         (2, "spark fast cluster"), (3, "slow other things"),
         (4, "spark fast engine extra")],
        "doc_id long, text string",
    )
    out = graph_explore(corpus, ["spark"], vertices=3, min_doc_count=3)
    rows = {(r["source"], r["target"]): r for r in out.collect()}
    # 'fast' co-occurs in all 4 seed docs, 'engine' in 3
    assert ("spark", "fast") in rows and rows[("spark", "fast")]["doc_count"] == 4
    assert rows[("spark", "engine")]["doc_count"] == 3
    # 'slow'/'other' never reach min_doc_count in the foreground
    assert all(t not in ("slow", "other", "spark") for _, t in rows)
    assert graph_explore(corpus, ["absentterm"]).count() == 0


def test_mlt_unlike_subtracts_terms(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    idx = E._docs_index(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    base = idx.more_like_this(7, docs, max_terms=5, k=None).collect()
    neg = idx.more_like_this(7, docs, max_terms=5, k=None, unlike=7).collect()
    # unlike == the source doc bans every source term -> empty result
    assert base and not neg
    # an absent unlike id is a no-op
    same = idx.more_like_this(
        7, docs, max_terms=5, k=None, unlike=10**9
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in base] == [
        (r["doc_id"], r["score"]) for r in same
    ]


def test_phrase_suggest_collate(spark):
    import __spark_entry__ as E

    idx = E._docs_index(spark, "/root/testdata/sf0.001")
    flagged = idx.suggest_phrase(
        "spork jion", size=None, collate=True, collate_prune=True
    ).collect()
    assert any(r["collate_match"] for r in flagged)
    pruned = idx.suggest_phrase(
        "spork jion", size=None, collate=True
    ).collect()
    assert "collate_match" not in (pruned[0].asDict() if pruned else {})
    assert {r["suggestion"] for r in pruned} == {
        r["suggestion"] for r in flagged if r["collate_match"]
    }
    # scores unchanged by collate for surviving phrases
    base = {r["suggestion"]: r["score"] for r in idx.suggest_phrase(
        "spork jion", size=None
    ).collect()}
    for r in pruned:
        assert r["score"] == pytest.approx(base[r["suggestion"]])


def test_filters_other_bucket_and_terms_missing(spark):
    from elasticsearch_assets_spark.operators.facets import (
        facet_filters, facet_terms_metrics,
    )

    df = spark.createDataFrame(
        [(0, "a", 5), (1, "b", 50), (2, None, 500), (3, "a", None)],
        "doc_id long, g string, v long",
    )
    out = {r["bucket"]: r["doc_count"] for r in facet_filters(
        df, {"big": F.col("v") >= 50, "is_a": F.col("g") == "a"},
        other_bucket=True,
    ).collect()}
    # doc 1: big; doc 2: big; doc 0,3: is_a; none match neither -> 0
    assert out == {"big": 2, "is_a": 2, "_other_": 0}
    out2 = {r["bucket"]: r["doc_count"] for r in facet_filters(
        df, {"big": F.col("v") >= 500}, other_bucket=True,
    ).collect()}
    # null v counts as non-matching (filter context) -> lands in other
    assert out2 == {"big": 1, "_other_": 3}
    with pytest.raises(ValueError, match="collides"):
        facet_filters(df, {"_other_": F.lit(True)}, other_bucket=True)

    m = df.select("doc_id")
    t = {r["bucket"]: r["doc_count"] for r in facet_terms_metrics(
        m, df, "g", "v", missing="(none)"
    ).collect()}
    assert t == {"a": 2, "b": 1, "(none)": 1}
    t2 = {r["bucket"]: r["doc_count"] for r in facet_terms_metrics(
        m, df, "g", "v"
    ).collect()}
    assert t2 == {"a": 2, "b": 1}  # ES drops missing without the param
