"""Round-3 session-8 ops: ES|QL TS (9.x time-series querying).

TS replaces FROM and turns the first STATS into a two-level aggregation:
over-time inner functions (RATE, AVG/MIN/MAX/SUM/COUNT/FIRST/
LAST_OVER_TIME) per (series dimensions x group keys), then the outer
aggregate across series. RATE implements the engine's one counter
contract — reset-compensated increase / bucket seconds, identical math
to operators/facets.counter_rate."""

from __future__ import annotations

import datetime as dt

import pytest

from elasticsearch_assets_spark.query.esql import esql


def _t(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def metrics(spark):
    # two series (hosts), two hour-buckets; counter resets inside h0/a
    rows = [
        # host, ts,                 counter, gauge, uid
        ("a", _t(0), 10.0, 1.0, 1),
        ("a", _t(10), 25.0, 3.0, 2),   # +15
        ("a", _t(20), 5.0, 5.0, 3),    # reset -> +5
        ("a", _t(30), 8.0, 7.0, 4),    # +3
        ("b", _t(5), 100.0, 10.0, 5),
        ("b", _t(45), 160.0, 30.0, 6),  # +60
        # second hour
        ("a", _t(0) + dt.timedelta(hours=1), 9.0, 2.0, 7),
        ("b", _t(5) + dt.timedelta(hours=1), 170.0, 20.0, 8),
        ("b", _t(5) + dt.timedelta(hours=1), 175.0, 22.0, 9),  # ts tie
    ]
    return rows


@pytest.fixture(scope="module")
def mdf(spark, metrics):
    return spark.createDataFrame(
        metrics, "host string, ts timestamp, c double, g double, uid int"
    )


META = {"m": {"dimensions": ["host"], "ts": "ts", "tiebreak": "uid"}}


def _run(mdf, stats):
    out = esql(
        f"TS m | STATS {stats} BY h = BUCKET(ts, 1 hour) | SORT h",
        tables={"m": mdf},
        time_series=META,
    )
    return {r["h"].hour: r for r in out.collect()}


def test_ts_rate_reset_compensated(mdf):
    got = _run(mdf, "mr = max(rate(c)), sr = sum(rate(c))")
    # h0: series a increase = 15 + 5 + 3 = 23; series b increase = 60
    assert got[0]["mr"] == pytest.approx(60.0 / 3600.0)
    assert got[0]["sr"] == pytest.approx((23.0 + 60.0) / 3600.0)
    # h1: series a single sample -> 0; series b 170 -> 175 -> increase 5
    assert got[1]["mr"] == pytest.approx(5.0 / 3600.0)
    assert got[1]["sr"] == pytest.approx(5.0 / 3600.0)


def test_ts_over_time_inner_then_outer(mdf):
    got = _run(
        mdf,
        "am = max(avg_over_time(g)), sm = sum(max_over_time(g)),"
        " mn = min(min_over_time(g)), n = sum(count_over_time(g))",
    )
    # h0: series a avg = (1+3+5+7)/4 = 4, series b avg = 20 -> max 20
    assert got[0]["am"] == pytest.approx(20.0)
    assert got[0]["sm"] == pytest.approx(7.0 + 30.0)
    assert got[0]["mn"] == pytest.approx(1.0)
    assert got[0]["n"] == 6
    assert got[1]["n"] == 3


def test_ts_first_last_tiebreak(mdf):
    got = _run(
        mdf, "lt = sum(last_over_time(g)), ft = sum(first_over_time(g))"
    )
    # h1 series b has two samples at the SAME ts: uid order decides —
    # first = 20 (uid 8), last = 22 (uid 9); series a contributes 2
    assert got[1]["ft"] == pytest.approx(2.0 + 20.0)
    assert got[1]["lt"] == pytest.approx(2.0 + 22.0)


def test_ts_by_can_include_dimension(mdf):
    out = esql(
        "TS m | STATS r = sum(rate(c)) BY host, h = BUCKET(ts, 1 hour)"
        " | SORT host, h",
        tables={"m": mdf},
        time_series=META,
    )
    rows = {(r["host"], r["h"].hour): r["r"] for r in out.collect()}
    assert rows[("a", 0)] == pytest.approx(23.0 / 3600.0)
    assert rows[("b", 0)] == pytest.approx(60.0 / 3600.0)


def test_ts_requires_metadata(mdf):
    with pytest.raises(ValueError, match="time-series metadata"):
        esql("TS m | STATS x = max(rate(c)) BY h = BUCKET(ts, 1 hour)",
             tables={"m": mdf})


def test_ts_rejects_plain_aggregate(mdf):
    with pytest.raises(ValueError, match="outer\\(inner\\(metric\\)\\)"):
        _run(mdf, "x = avg(g)")


def test_ts_rate_needs_fixed_bucket(mdf):
    with pytest.raises(ValueError, match="fixed-width time BUCKET"):
        esql(
            "TS m | STATS x = max(rate(c)) BY host",
            tables={"m": mdf}, time_series=META,
        )


def test_ts_second_stats_is_regular(mdf):
    # after the TS STATS consumed the metadata, a second STATS is plain
    out = esql(
        "TS m | STATS r = sum(rate(c)) BY host, h = BUCKET(ts, 1 hour)"
        " | STATS total = sum(r), nb = count(*)",
        tables={"m": mdf},
        time_series=META,
    )
    r = out.collect()[0]
    assert r["nb"] == 4
    assert r["total"] == pytest.approx(88.0 / 3600.0)


# ---------------------------------------------------------------------------
# ES|QL scalar battery 5 extras / random_sampler / frequent_itemsets
# ---------------------------------------------------------------------------


def test_esql_sha1_passthrough(spark):
    import hashlib

    out = esql(
        'ROW s = "abc" | EVAL h = SHA1(s)',
        tables={}, spark=spark,
    ).collect()[0]
    assert out["h"] == hashlib.sha1(b"abc").hexdigest()


def test_random_sampler_scaling(spark):
    from elasticsearch_assets_spark.operators.facets import (
        facet_random_sampler,
    )
    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )
    import hashlib

    rows = [(i, "g1" if i % 2 == 0 else "g2", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, v double")
    out = {
        r["bucket"]: r
        for r in facet_random_sampler(
            df, 0.5, "grp", "v", seed="t"
        ).collect()
    }
    # brute-force the same hash cut
    cut = rate_threshold_hex(0.5)
    kept = [
        (i, g, v) for i, g, v in rows
        if hashlib.md5(f"t|{i}".encode()).hexdigest()[:8] < cut
    ]
    for g in ("g1", "g2"):
        sub = [r for r in kept if r[1] == g]
        assert out[g]["doc_count"] == pytest.approx(len(sub) / 0.5)
        assert out[g]["sum_v"] == pytest.approx(sum(r[2] for r in sub) / 0.5)
        assert out[g]["avg_v"] == pytest.approx(
            sum(r[2] for r in sub) / len(sub)
        )


def test_random_sampler_rejects_bad_probability(spark):
    from elasticsearch_assets_spark.operators.facets import (
        facet_random_sampler,
    )

    df = spark.createDataFrame([(1, "a", 1.0)], "doc_id long, g string, v double")
    with pytest.raises(ValueError):
        facet_random_sampler(df, 0.0, "g", "v")


def _brute_itemsets(txns, ms, max_size):
    from itertools import combinations

    sets = {}
    for t in txns:
        t = sorted(set(t))
        for k in range(2, max_size + 1):
            for c in combinations(t, k):
                sets[c] = sets.get(c, 0) + 1
    return {c: n for c, n in sets.items() if n >= ms}


def test_frequent_itemsets_bruteforce(spark):
    from elasticsearch_assets_spark.operators.itemsets import (
        frequent_itemsets,
    )
    import math
    import random

    rng = random.Random(11)
    txns = [
        [rng.choice("abcdefgh") for _ in range(rng.randint(1, 6))]
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(txns)],
        "doc_id long, text string",
    )
    ratio = 0.15
    got = {
        (tuple(r["itemset"].split("|")), r["size"]): r["support"]
        for r in frequent_itemsets(
            df, "doc_id", "split(text, ' ')", ratio, max_size=4
        ).collect()
    }
    ms = math.ceil(ratio * len(txns))
    want = _brute_itemsets(txns, ms, 4)
    assert {k[0]: v for k, v in got.items()} == want
    for (items, size), _ in got.items():
        assert len(items) == size


def test_frequent_itemsets_empty_level_short_circuits(spark):
    from elasticsearch_assets_spark.operators.itemsets import (
        frequent_itemsets,
    )

    # no pair is frequent -> size-3 never runs, result empty
    df = spark.createDataFrame(
        [(0, "a b"), (1, "c d"), (2, "e f")], "doc_id long, text string"
    )
    out = frequent_itemsets(df, "doc_id", "split(text, ' ')", 0.67, 3)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# multi_match cross_fields (term-centric blended scoring)
# ---------------------------------------------------------------------------

_XF_TITLES = [
    "spark engine",       # 0: spark in title only
    "join planner",       # 1: join in title only
    "spark join",         # 2: both in title
    "index build",        # 3: neither
    "query spark",        # 4
]
_XF_BODIES = [
    "the fast engine runs",          # 0: no join/spark in body
    "spark shuffles the data",       # 1: spark in body
    "merge and scan",                # 2
    "spark join join here",          # 3: both in body
    "scan scan scan",                # 4
]


@pytest.fixture(scope="module")
def xf_indexes(spark, tmp_path_factory):
    from elasticsearch_assets_spark.index.build import build_index
    from elasticsearch_assets_spark.query.engine import InvertedIndex

    base = tmp_path_factory.mktemp("xf")
    out = {}
    for name, texts in (("title", _XF_TITLES), ("text", _XF_BODIES)):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        d = str(base / name)
        build_index(spark, df, d, num_segments=2)
        out[name] = InvertedIndex(spark, d)
    return out


def _brute_cross(fields, terms, tie=0.0, boosts=None):
    """fields: {name: list[str] docs}; returns {doc: score} + per-doc
    matched-term sets, with blended df and per-field norms."""
    import math

    from elasticsearch_assets_spark.query.bm25 import B, K1, idf

    boosts = boosts or {}
    toks = {f: [t.split() for t in docs] for f, docs in fields.items()}
    n = {f: len(docs) for f, docs in fields.items()}
    avgdl = {f: sum(len(d) for d in tk) / len(tk) for f, tk in toks.items()}
    df = {
        t: max(sum(t in d for d in tk) for tk in toks.values())
        for t in terms
    }
    scores, matched = {}, {}
    for t in terms:
        if df[t] == 0:
            continue
        for i in range(len(next(iter(toks.values())))):
            per_field = []
            for f, tk in toks.items():
                tf = tk[i].count(t)
                if tf == 0:
                    continue
                dl = len(tk[i])
                s = (
                    idf(n[f], df[t])
                    * tf * (K1 + 1)
                    / (tf + K1 * (1 - B + B * dl / avgdl[f]))
                    * boosts.get(f, 1.0)
                )
                per_field.append(s)
            if per_field:
                ts = max(per_field) + tie * (sum(per_field) - max(per_field))
                scores[i] = scores.get(i, 0.0) + ts
                matched.setdefault(i, set()).add(t)
    return scores, matched


def test_cross_fields_matches_bruteforce(xf_indexes):
    from elasticsearch_assets_spark.query.engine import cross_fields

    got = {
        r["doc_id"]: r["score"]
        for r in cross_fields(
            {"title": (xf_indexes["title"], 2.0), "text": (xf_indexes["text"], 1.0)},
            ["spark", "join"], k=None, tie_breaker=0.3,
        ).collect()
    }
    want, _ = _brute_cross(
        {"title": _XF_TITLES, "text": _XF_BODIES},
        ["spark", "join"], tie=0.3, boosts={"title": 2.0},
    )
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d]), d


def test_cross_fields_and_is_term_centric(xf_indexes):
    from elasticsearch_assets_spark.query.engine import (
        cross_fields, multi_match,
    )

    fields = {
        "title": (xf_indexes["title"], 1.0),
        "text": (xf_indexes["text"], 1.0),
    }
    xf = {r["doc_id"] for r in
          cross_fields(fields, ["spark", "join"], k=None, mode="and").collect()}
    # doc 1: join in TITLE, spark in BODY — no single field has both
    assert 1 in xf
    bf = {r["doc_id"] for r in
          multi_match(fields, ["spark", "join"], match_type="best_fields",
                      k=None, mode="and").collect()}
    assert 1 not in bf          # best_fields AND is field-centric
    assert xf >= bf             # term-centric AND is strictly weaker


def test_cross_fields_and_empty_when_term_absent_everywhere(xf_indexes):
    from elasticsearch_assets_spark.query.engine import cross_fields

    fields = {
        "title": (xf_indexes["title"], 1.0),
        "text": (xf_indexes["text"], 1.0),
    }
    out = cross_fields(fields, ["spark", "zzzmissing"], k=None, mode="and")
    assert out.count() == 0


def test_cross_fields_blended_df_differs_from_best_fields(xf_indexes):
    from elasticsearch_assets_spark.query.bm25 import B, K1, idf
    from elasticsearch_assets_spark.query.engine import cross_fields

    # 'join' has df 2 in title, df 1 in text -> blended df 2 lowers the
    # TEXT-side idf below its own-field value; doc 3's body-only 'join'
    # must score with idf(n_text, 2), not idf(n_text, 1)
    out = {
        r["doc_id"]: r["score"]
        for r in cross_fields(
            {"title": (xf_indexes["title"], 1.0), "text": (xf_indexes["text"], 1.0)},
            ["join"], k=None,
        ).collect()
    }
    toks = [t.split() for t in _XF_BODIES]
    avgdl = sum(map(len, toks)) / len(toks)
    tf, dl = 2.0, 4.0  # doc 3 body: 'join' twice, 4 tokens
    blended = idf(5, 2) * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
    own = idf(5, 1) * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
    assert out[3] == pytest.approx(blended)
    assert abs(out[3] - own) > 1e-6


# ---------------------------------------------------------------------------
# knn rescore_vector (oversample quantized -> exact re-score)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vec_df(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_rescore_vector_scores_are_exact(vec_df):
    from elasticsearch_assets_spark.operators.similarity import (
        cosine_topk, rescore_vector_topk,
    )

    df, rows = vec_df
    q = rows[7][1]
    got = rescore_vector_topk(df, q, k=5, oversample=4.0).collect()
    exact = {
        r["vec_id"]: r["score"] for r in cosine_topk(df, q, 300).collect()
    }
    # every returned score is the EXACT float cosine, not the quantized one
    for r in got:
        assert r["score"] == pytest.approx(exact[r["vec_id"]], abs=1e-12)
    # descending, k rows
    ss = [r["score"] for r in got]
    assert ss == sorted(ss, reverse=True) and len(ss) == 5


def test_rescore_vector_recall_beats_quantized_only(vec_df):
    from elasticsearch_assets_spark.operators.similarity import (
        cosine_topk, quantized_cosine_topk, rescore_vector_topk,
    )

    df, rows = vec_df
    hits_q = hits_r = 0
    for probe in (1, 50, 123):
        q = rows[probe][1]
        truth = {r["vec_id"] for r in cosine_topk(df, q, 10).collect()}
        qz = {r["vec_id"] for r in quantized_cosine_topk(df, q, 10).collect()}
        rs = {r["vec_id"] for r in rescore_vector_topk(df, q, 10, 4.0).collect()}
        hits_q += len(truth & qz)
        hits_r += len(truth & rs)
    assert hits_r >= hits_q  # rescoring can only help recall


def test_rescore_vector_prequantized_path(vec_df):
    from elasticsearch_assets_spark.operators.similarity import (
        quantize_embeddings, rescore_vector_topk,
    )

    df, rows = vec_df
    q = rows[7][1]
    qt = quantize_embeddings(df)
    a = rescore_vector_topk(df, q, k=5, oversample=4.0).collect()
    b = rescore_vector_topk(df, q, k=5, oversample=4.0, quantized=qt).collect()
    assert [(r["vec_id"], r["score"]) for r in a] == [
        (r["vec_id"], r["score"]) for r in b
    ]


def test_rescore_vector_validates(vec_df):
    from elasticsearch_assets_spark.operators.similarity import (
        rescore_vector_topk,
    )

    df, rows = vec_df
    with pytest.raises(ValueError):
        rescore_vector_topk(df, rows[0][1], k=5, oversample=0.5)


# ---------------------------------------------------------------------------
# EQL sequence ... until
# ---------------------------------------------------------------------------


def test_eql_until_expires_chains(spark):
    from elasticsearch_assets_spark.operators.sequences import eql_sequence

    rows = [
        # user, ts,      type,   id
        (1, _t(0), "view", 1),
        (1, _t(5), "error", 2),       # chain completes, nothing between
        (2, _t(0), "view", 3),
        (2, _t(2), "reset", 4),       # until event INSIDE the chain
        (2, _t(5), "error", 5),
        (3, _t(0), "view", 6),
        (3, _t(5), "error", 7),
        (3, _t(9), "reset", 8),       # until AFTER completion: harmless
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    base = eql_sequence(
        df, "user_id", ["event_type = 'view'", "event_type = 'error'"],
        maxspan_seconds=3600,
    )
    assert {r["user_id"] for r in base.collect()} == {1, 2, 3}
    out = eql_sequence(
        df, "user_id", ["event_type = 'view'", "event_type = 'error'"],
        maxspan_seconds=3600, until="event_type = 'reset'",
    )
    assert {r["user_id"] for r in out.collect()} == {1, 3}


def test_eql_sample_unordered(spark):
    from elasticsearch_assets_spark.operators.sequences import eql_sample

    rows = [
        (1, _t(5), "b", 1),   # order b before a — sample doesn't care
        (1, _t(9), "a", 2),
        (2, _t(0), "a", 3),   # no b for user 2
        (3, _t(0), "a", 4),
        (3, _t(1), "a", 5),   # earliest a = id 4
        (3, _t(2), "b", 6),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = {
        r["user_id"]: (r["id_0"], r["id_1"])
        for r in eql_sample(
            df, "user_id", ["event_type = 'a'", "event_type = 'b'"]
        ).collect()
    }
    assert out == {1: (2, 1), 3: (4, 6)}


def test_parse_fuzziness_auto_ladder():
    from elasticsearch_assets_spark.query.expand import parse_fuzziness

    assert parse_fuzziness(2, "ab") == 2
    assert parse_fuzziness("AUTO", "ab") == 0
    assert parse_fuzziness("AUTO", "abc") == 1
    assert parse_fuzziness("auto", "abcde") == 1
    assert parse_fuzziness("AUTO", "abcdef") == 2
    assert parse_fuzziness("AUTO:2,4", "ab") == 1
    assert parse_fuzziness("AUTO:2,4", "abcd") == 2
    with pytest.raises(ValueError):
        parse_fuzziness("FUZZY", "x")
    with pytest.raises(ValueError):
        parse_fuzziness("AUTO:6,3", "x")


# ---------------------------------------------------------------------------
# hard-negative mining
# ---------------------------------------------------------------------------


def test_hard_negatives_excludes_positives_and_matches_search(xf_indexes, spark):
    from elasticsearch_assets_spark.operators.mining import (
        mine_hard_negatives,
    )

    idx = xf_indexes["text"]
    queries = [(10, ["spark"]), (20, ["scan"])]
    # label each query's single top doc as its positive
    tops = {
        qid: idx.search(t, k=1, mode="or").collect()[0]["doc_id"]
        for qid, t in queries
    }
    positives = spark.createDataFrame(
        [(q, d) for q, d in tops.items()], "query_id long, doc_id long"
    )
    out = mine_hard_negatives(idx, queries, positives, k=2, depth=5)
    rows = out.collect()
    for r in rows:
        assert r["doc_id"] != tops[r["query_id"]]
    # negatives == search() results minus the positive, in rank order
    for qid, t in queries:
        want = [
            r["doc_id"] for r in idx.search(t, k=5, mode="or").collect()
            if r["doc_id"] != tops[qid]
        ][:2]
        got = [r["doc_id"] for r in rows if r["query_id"] == qid]
        assert got == want


def test_hard_negatives_validates(xf_indexes, spark):
    from elasticsearch_assets_spark.operators.mining import (
        mine_hard_negatives,
    )

    pos = spark.createDataFrame([(0, 1)], "query_id long, doc_id long")
    with pytest.raises(ValueError):
        mine_hard_negatives(xf_indexes["text"], [(0, ["a"])], pos, k=5, depth=3)
    with pytest.raises(ValueError):
        mine_hard_negatives(xf_indexes["text"], [], pos)


def test_esql_now_requires_pin(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 1),)], "ts timestamp")
    with pytest.raises(ValueError, match="now="):
        esql("FROM m | WHERE ts < NOW()", tables={"m": df})


def test_esql_span_arithmetic_and_now(spark):
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i)) for i in range(10)],
        "i long, ts timestamp",
    )
    out = esql(
        "FROM m | WHERE ts >= NOW() - 3 days | STATS n = count(*)",
        tables={"m": df}, now=dt.datetime(2024, 1, 8),
    ).collect()[0]
    # NOW()-3d = Jan 5; rows Jan 5..10 -> ids 4..9
    assert out["n"] == 6
    # BUCKET spans are untouched by the interval rewrite
    out2 = esql(
        "FROM m | STATS n = count(*) BY h = BUCKET(ts, 1 day) | SORT h",
        tables={"m": df},
    )
    assert out2.count() == 10


def test_facet_counts_with_other(spark):
    from elasticsearch_assets_spark.operators.facets import (
        facet_counts_with_other,
    )

    rows = [(i, ["a", "a", "a", "b", "b", "c", "d"][i % 7]) for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    m = df.select("doc_id")
    got = facet_counts_with_other(m, df, "g", 2).collect()
    assert [(r["bucket"], r["doc_count"]) for r in got] == [
        ("a", 30), ("b", 20), ("_other_", 20),
    ]
    # n covering everything -> other row still present, zero
    got2 = facet_counts_with_other(m, df, "g", 10).collect()
    assert got2[-1]["bucket"] == "_other_" and got2[-1]["doc_count"] == 0


def test_change_point_spike_dip_classification(spark):
    import pyspark.sql.functions as F

    def run(vals):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "k long, v double"
        )
        out = esql("FROM m | CHANGE_POINT v ON k", tables={"m": df})
        hit = out.where(F.col("type").isNotNull()).collect()
        assert len(hit) == 1
        return hit[0]["k"], hit[0]["type"]

    # single positive excursion -> spike at its position
    assert run([10, 10, 10, 50, 10, 10, 10]) == (3, "spike")
    # single negative excursion -> dip
    assert run([10, 10, 10, -30, 10, 10, 10]) == (3, "dip")
    # genuine level shift -> step_change at the first shifted row
    assert run([10, 10, 10, 30, 30, 30, 30]) == (3, "step_change")


# ---------------------------------------------------------------------------
# analyzer filter chain additions
# ---------------------------------------------------------------------------


def test_analyze_new_filters(xf_indexes):
    idx = xf_indexes["text"]
    toks = lambda s, f: [t for _, t in idx.analyze(s, filters=f)]  # noqa: E731
    assert toks("café naïve test", ["asciifolding"]) == ["cafe", "naive", "test"]
    assert toks("a b c", ["shingle:2"]) == ["a", "a b", "b", "b c", "c"]
    assert toks("a b c d", ["shingle:3"]) == [
        "a", "a b c", "b", "b c d", "c", "d",
    ]
    assert toks("ab abc abcd abcde", ["length:3:4"]) == ["abc", "abcd"]
    assert toks("hello hi", ["truncate:3"]) == ["hel", "hi"]
    assert toks("abc de", ["reverse"]) == ["cba", "ed"]
    # chains compose in order
    assert toks("café x", ["asciifolding", "length:4:9"]) == ["cafe"]
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown token filter"):
        idx.analyze("x", filters=["bogus"])
    with _pt.raises(ValueError, match="shingle size"):
        idx.analyze("x", filters=["shingle:1"])


# ---------------------------------------------------------------------------
# T5 span corruption (deterministic blockwise)
# ---------------------------------------------------------------------------


def test_span_corruption_reconstructs(spark):
    import hashlib
    import re as _re

    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )
    from elasticsearch_assets_spark.operators.textstats import (
        span_corruption,
    )

    texts = {
        0: " ".join(f"t{i}" for i in range(37)),
        1: "a b",
        2: " ".join(f"w{i}" for i in range(10)),
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r for r in span_corruption(df, seed="u").collect()
    }
    thr = rate_threshold_hex(0.5)
    for did, text in texts.items():
        toks = text.split(" ")
        inp, tgt = out[did]["inputs"], out[did]["targets"]
        # 1) brute-force the mask and check inputs/targets exactly
        nb = -(-len(toks) // 10)
        want_in, want_tgt, k = [], [], 0
        for b in range(nb):
            blk = toks[b * 10:(b + 1) * 10]
            if hashlib.md5(f"u|{did}|{b}".encode()).hexdigest()[:8] < thr:
                s = f"<extra_id_{k}>"
                want_in += [s] + blk[3:]
                want_tgt += [s] + blk[:3]
                k += 1
            else:
                want_in += blk
        assert inp == " ".join(want_in), did
        assert tgt == " ".join(want_tgt), did
        # 2) the pair reconstructs the original text: substituting each
        # sentinel in inputs with its target run is lossless
        fills = dict(
            _re.findall(r"(<extra_id_\d+>) ?((?:(?!<extra_id_)\S+ ?)*)", tgt)
        )
        rebuilt = _re.sub(
            r"<extra_id_\d+>",
            lambda m: fills[m.group(0)].strip() or m.group(0),
            inp,
        )
        assert " ".join(rebuilt.split()) == text if tgt else inp == text


def test_span_corruption_validates(spark):
    from elasticsearch_assets_spark.operators.textstats import (
        span_corruption,
    )

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        span_corruption(df, span=0)
    with pytest.raises(ValueError):
        span_corruption(df, span=10, block=10)


def test_fim_transform_reconstructs(spark):
    from elasticsearch_assets_spark.operators.textstats import fim_transform

    texts = {
        0: " ".join(f"t{i}" for i in range(12)),
        1: "a b",          # < 3 tokens -> plain passthrough
        7: " ".join(f"w{i}" for i in range(5)),
        13: "x y z",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {r["doc_id"]: r for r in fim_transform(df).collect()}
    import re as _re

    assert out[1]["mode"] == "plain" and out[1]["fim"] == "a b"
    for did, text in texts.items():
        r = out[did]
        if r["mode"] == "plain":
            continue
        body = r["fim"]
        if r["mode"] == "psm":
            m = _re.match(
                r"^<PRE>(?: (.*?))? <SUF>(?: (.*?))? <MID>(?: (.*))?$", body
            )
            assert m, (did, body)
            pre, suf, mid = (g or "" for g in m.groups())
            assert mid, did  # c2 > c1 guarantees a non-empty middle
            rebuilt = " ".join(x for x in (pre, mid, suf) if x)
        else:
            m = _re.match(
                r"^<PRE> <SUF>(?: (.*?))? <MID>(?: (.*))?$", body
            )
            assert m, (did, body)
            suf, premid = (g or "" for g in m.groups())
            rebuilt = " ".join(x for x in (premid, suf) if x)
        assert rebuilt == text, did


def test_fim_modes_split_by_hash(spark):
    from elasticsearch_assets_spark.operators.textstats import fim_transform

    df = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(200)], "doc_id long, text string"
    )
    modes = [r["mode"] for r in fim_transform(df).collect()]
    assert modes.count("plain") == 0
    assert 60 < modes.count("spm") < 140  # ~50/50 cut


def test_curriculum_order(spark):
    import hashlib

    from elasticsearch_assets_spark.operators.sampling import (
        curriculum_order,
    )

    rows = [(i, float((i * 37) % 100)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, q double")
    got = curriculum_order(df, "q", 3, salt="t").collect()
    # brute-force shard cut
    cuts = [int(i * 16**8 / 3) for i in range(1, 3)]
    def shard(i):
        h = int(hashlib.md5(f"t|{i}".encode()).hexdigest()[:8], 16)
        return sum(h >= c for c in cuts)
    by_shard = {}
    for i, q in rows:
        by_shard.setdefault(shard(i), []).append((q, i))
    want = {}
    for s, lst in by_shard.items():
        for pos, (_q, i) in enumerate(sorted(lst), start=1):
            want[i] = (s, pos)
    assert {r["doc_id"]: (r["shard"], r["position"]) for r in got} == want
    # descending flips the order
    d = curriculum_order(df, "q", 1, ascending=False, salt="t").collect()
    qs = [dict(rows)[r["doc_id"]] for r in sorted(d, key=lambda r: r["position"])]
    assert qs == sorted(qs, reverse=True)


def test_truncate_embeddings_unit_and_recall(vec_df):
    import math

    from elasticsearch_assets_spark.operators.similarity import (
        cosine_topk, truncate_embeddings,
    )

    df, rows = vec_df
    tr = truncate_embeddings(df, 8)
    got = {r["vec_id"]: r["embedding"] for r in tr.limit(50).collect()}
    for vid, v in got.items():
        raw = rows[vid][1][:8]
        n = math.sqrt(sum(x * x for x in raw))
        assert len(v) == 8
        assert v == pytest.approx([x / n for x in raw])
        assert sum(x * x for x in v) == pytest.approx(1.0)
    # truncated search still recalls a decent share of the full top-k
    q = rows[7][1]
    qn = math.sqrt(sum(x * x for x in q[:8]))
    truth = {r["vec_id"] for r in cosine_topk(df, q, 10).collect()}
    approx = {
        r["vec_id"]
        for r in cosine_topk(tr, [x / qn for x in q[:8]], 10).collect()
    }
    assert len(truth & approx) >= 2  # random 16-dim data, half the dims
    # no-renormalize path keeps raw values
    raw8 = truncate_embeddings(df, 8, renormalize=False).limit(1).collect()[0]
    assert raw8["embedding"] == pytest.approx(rows[raw8["vec_id"]][1][:8])
    with pytest.raises(ValueError):
        truncate_embeddings(df, 0)


def test_percolate_filtered(spark):
    from elasticsearch_assets_spark.operators.percolate import (
        make_filtered_queries, percolate_filtered,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark join fast", 100, "en"),
            (1, "spark join slow", 500, "en"),
            (2, "query only", 100, "de"),
            (3, "query stuff", 100, "en"),
        ],
        "doc_id long, text string, n_chars long, lang string",
    )
    qs = make_filtered_queries(
        spark,
        [
            (0, ["spark", "join"], 2, "n_chars >= 300"),
            (1, ["query"], 1, "lang = 'en'"),
            (2, ["query"], 1, None),
        ],
    )
    got = {(r["doc_id"], r["query_id"])
           for r in percolate_filtered(qs, docs).collect()}
    assert got == {(1, 0), (3, 1), (2, 2), (3, 2)}
    with pytest.raises(ValueError, match="at least one term"):
        make_filtered_queries(spark, [(0, [], 1, "n_chars > 0")])


# ---------------------------------------------------------------------------
# hypothesis fuzz: the deterministic transforms' invariants
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcde", min_size=1, max_size=4),
            min_size=1, max_size=40,
        ),
        min_size=1, max_size=6,
    )
)
def test_span_corruption_invariants_fuzz(spark, token_lists):
    import hashlib

    from elasticsearch_assets_spark.operators.sampling import (
        rate_threshold_hex,
    )
    from elasticsearch_assets_spark.operators.textstats import (
        span_corruption,
    )

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(token_lists)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           span_corruption(df, span=2, block=5, seed="hz").collect()}
    thr = rate_threshold_hex(0.5)
    for did, toks in enumerate(token_lists):
        inp, tgt = out[did]["inputs"], out[did]["targets"]
        nb = -(-len(toks) // 5)
        want_in, want_tgt, k = [], [], 0
        for b in range(nb):
            blk = toks[b * 5:(b + 1) * 5]
            if hashlib.md5(f"hz|{did}|{b}".encode()).hexdigest()[:8] < thr:
                s = f"<extra_id_{k}>"
                want_in += [s] + blk[2:]
                want_tgt += [s] + blk[:2]
                k += 1
            else:
                want_in += blk
        assert inp == " ".join(want_in)
        assert tgt == " ".join(want_tgt)
