"""Round-3 session-7 batch: ES|QL function battery 4 (TO_DEGREES /
TO_RADIANS / COPY_SIGN / SCALB / ROUND_TO), STATS battery 3 (PERCENTILE /
STD_DEV / VALUES), and the 8.17 full-text WHERE functions (QSTR / KQL /
MATCH_PHRASE) wired through the Lucene-subset compiler.

Contract twins: esql_scalar_funcs4, esql_stats_funcs2, esql_qstr,
esql_kql, esql_match_phrase.
"""

from __future__ import annotations

import math

import pytest

from elasticsearch_assets_spark.query.esql import esql
from elasticsearch_assets_spark.query.lucene import (
    And, Cmp, Or, Term, parse_kql,
)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (0, "click", 5.0, "the quick brown fox"),
        (1, "view", 25.0, "quick start guide"),
        (2, "click", 120.0, "hash join plan"),
        (3, "error", 600.0, "rehash join fallback"),
        (4, "view", -3.0, "fox hash  join spaced"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double, text string"
    )


# --- scalar battery 4 ------------------------------------------------------

def test_degrees_radians_roundtrip(ev):
    out = esql(
        "FROM t | EVAL d = TO_DEGREES(PI()), r = TO_RADIANS(180.0)"
        " | KEEP event_id, d, r | SORT event_id",
        tables={"t": ev},
    ).collect()
    assert out[0].d == pytest.approx(180.0)
    assert out[0].r == pytest.approx(math.pi)


def test_copy_sign_and_scalb(ev):
    out = esql(
        "FROM t | EVAL c1 = COPY_SIGN(3.5, -2.0), c2 = COPY_SIGN(-3.5, 2.0),"
        " s = SCALB(value, 2) | KEEP event_id, c1, c2, s | SORT event_id",
        tables={"t": ev},
    ).collect()
    assert out[0].c1 == -3.5 and out[0].c2 == 3.5
    assert out[0].s == 20.0 and out[4].s == -12.0


def test_round_to_clamps_and_rounds_down(ev):
    out = esql(
        "FROM t | EVAL r = ROUND_TO(value, 0.0, 10.0, 100.0, 500.0)"
        " | KEEP event_id, r | SORT event_id",
        tables={"t": ev},
    ).collect()
    # 5 -> 0, 25 -> 10, 120 -> 100, 600 -> 500, -3 -> clamp to smallest
    assert [r.r for r in out] == [0.0, 10.0, 100.0, 500.0, 0.0]


def test_round_to_requires_points(ev):
    with pytest.raises(ValueError, match="ROUND_TO"):
        esql("FROM t | EVAL r = ROUND_TO(value)", tables={"t": ev})


def test_stats_percentile_stddev_values(ev):
    out = esql(
        "FROM t | STATS p50 = PERCENTILE(value, 50), sd = STD_DEV(value),"
        " vs = VALUES(event_type) | EVAL v = array_join(vs, ',')"
        " | KEEP p50, sd, v",
        tables={"t": ev},
    ).collect()[0]
    vals = [5.0, 25.0, 120.0, 600.0, -3.0]
    mean = sum(vals) / 5
    assert out.p50 == 25.0  # exact interpolation == the sorted middle
    assert out.sd == pytest.approx(
        math.sqrt(sum((v - mean) ** 2 for v in vals) / 5)
    )
    assert out.v == "click,error,view"  # distinct, sorted determinism


# --- KQL translation -------------------------------------------------------

def test_parse_kql_word_operators_and_spaced_colon():
    ast = parse_kql("event_type : click and value >= 10")
    assert ast == And(
        children=(
            Term(field="event_type", value="click"),
            Cmp(field="value", op=">=", value="10"),
        )
    )


def test_parse_kql_field_group_or():
    ast = parse_kql("event_type: (click or view)")
    assert ast == Or(
        children=(
            Term(field="event_type", value="click"),
            Term(field="event_type", value="view"),
        )
    )


def test_parse_kql_terms_starting_with_operator_words():
    # "orange" / "android" must not be eaten by the or/and rewrites
    ast = parse_kql("orange and android")
    assert ast == And(
        children=(Term(None, "orange"), Term(None, "android"))
    )


def test_parse_kql_rejects_nested_and_existence():
    with pytest.raises(ValueError, match="nested-field"):
        parse_kql("parent: { child: x }")
    # `field: *` is now the _exists_ rewrite (test_round4c_ops); a
    # non-field left side is still an error
    with pytest.raises(ValueError, match="existence"):
        parse_kql('"quoted phrase": *')


# --- full-text WHERE functions ---------------------------------------------

def test_where_kql_filters(ev):
    out = esql(
        "FROM t | WHERE KQL('event_type: (click or view) and value >= 10')"
        " | KEEP event_id | SORT event_id",
        tables={"t": ev},
    ).collect()
    assert [r.event_id for r in out] == [1, 2]


def test_where_qstr_analyzed_text(ev):
    out = esql(
        "FROM t | WHERE QSTR('text:(quick AND fox) OR event_type:error')"
        " | KEEP event_id | SORT event_id",
        tables={"t": ev},
    ).collect()
    assert [r.event_id for r in out] == [0, 3]


def test_where_match_phrase_adjacency(ev):
    out = esql(
        "FROM t | WHERE MATCH_PHRASE(text, 'hash join')"
        " | KEEP event_id | SORT event_id",
        tables={"t": ev},
    ).collect()
    # matches the adjacent pair, the multi-space pair, AND the
    # substring-boundary case (no word boundary in filter-context
    # phrases — same contract as the query-string Phrase plan)
    assert [r.event_id for r in out] == [2, 3, 4]


def test_fulltext_must_be_whole_condition(ev):
    with pytest.raises(ValueError, match="entire WHERE condition"):
        esql(
            "FROM t | WHERE QSTR('quick') AND value > 0",
            tables={"t": ev},
        )


# --- conversion battery ------------------------------------------------------

def test_to_ip_validates_octets(ev):
    out = esql(
        "FROM t | EVAL a = TO_IP('10.0.255.1'), b = TO_IP('256.1.1.1'),"
        " c = TO_IP('1.2.3'), d = TO_IP('01.2.3.4')"
        " | KEEP event_id, a, b, c, d | SORT event_id",
        tables={"t": ev},
    ).collect()[0]
    assert out.a == "10.0.255.1"
    assert out.b is None and out.c is None and out.d is None


def test_to_version_orders_semver_not_lexicographic(ev):
    out = esql(
        "FROM t | EVAL v = CASE(event_id == 0, '1.10.0',"
        " event_id == 1, '1.9.2', event_id == 2, '1.10.0-beta',"
        " event_id == 3, '0.9', '2.0.0')"
        " | EVAL vk = TO_VERSION(v) | KEEP v | SORT vk",
        tables={"t": ev},
    ).collect()
    # semver: 0.9 < 1.9.2 < 1.10.0-beta < 1.10.0 < 2.0.0
    assert [r.v for r in out] == [
        "0.9", "1.9.2", "1.10.0-beta", "1.10.0", "2.0.0"
    ]


def test_to_datetime_epoch_millis(ev):
    out = esql(
        "FROM t | WHERE event_id == 0"
        " | EVAL d = DATE_FORMAT('yyyy-MM-dd HH:mm:ss.SSS',"
        "   TO_DATETIME(86400500)) | KEEP d",
        tables={"t": ev},
    ).collect()[0]
    assert out.d == "1970-01-02 00:00:00.500"


# --- DISSECT modifiers + RLIKE -------------------------------------------------

def test_dissect_pad_and_named_skip(ev):
    out = esql(
        "FROM t | WHERE event_id == 0"
        " | EVAL line = 'click   u42 17'"
        " | DISSECT line '%{et->} %{?uid} %{v}'"
        " | KEEP et, v",
        tables={"t": ev},
    ).collect()[0]
    assert out.et == "click" and out.v == "17"


def test_dissect_pad_single_space_still_matches(ev):
    out = esql(
        "FROM t | WHERE event_id == 0 | EVAL line = 'a b c'"
        " | DISSECT line '%{x->} %{y} %{z}' | KEEP x, y, z",
        tables={"t": ev},
    ).collect()[0]
    assert (out.x, out.y, out.z) == ("a", "b", "c")


def test_dissect_reference_and_ordered_append_raise(ev):
    # %{+key} appends now (session 8); reference keys and the ordered
    # form %{+k/n} stay unsupported
    with pytest.raises(ValueError, match="reference keys"):
        esql(
            "FROM t | EVAL line = 'a b' | DISSECT line '%{*x} %{&x}'",
            tables={"t": ev},
        )
    with pytest.raises(ValueError, match="ordered append"):
        esql(
            "FROM t | EVAL line = 'a b' | DISSECT line '%{+x/2} %{+x/1}'",
            tables={"t": ev},
        )


def test_rlike_is_full_string_anchored(ev):
    out = esql(
        'FROM t | WHERE event_type RLIKE "cl.*" | KEEP event_id'
        " | SORT event_id",
        tables={"t": ev},
    ).collect()
    assert [r.event_id for r in out] == [0, 2]
    # substring semantics would also match 'click' via "lic"; anchored
    # must not
    assert esql(
        'FROM t | WHERE event_type RLIKE "lic" | KEEP event_id',
        tables={"t": ev},
    ).count() == 0


def test_not_rlike(ev):
    out = esql(
        'FROM t | WHERE event_type NOT RLIKE "(?:click|view)"'
        " | KEEP event_id",
        tables={"t": ev},
    ).collect()
    assert [r.event_id for r in out] == [3]


# --- range-type ENRICH ----------------------------------------------------------

def test_enrich_range_matches_half_open_bands(spark, ev):
    bands = spark.createDataFrame(
        [(0.0, 25.0, "small"), (25.0, 1000.0, "big")],
        "value_lo double, value_hi double, band string",
    )
    out = esql(
        "FROM t | ENRICH b ON value WITH band | KEEP event_id, band"
        " | SORT event_id",
        tables={"t": ev, "b": bands},
    ).collect()
    # values: 5, 25, 120, 600, -3 -> small, big (25 excluded from small:
    # half-open), big, big, null (below every band)
    assert [(r.event_id, r.band) for r in out] == [
        (0, "small"), (1, "big"), (2, "big"), (3, "big"), (4, None)
    ]


def test_enrich_range_missing_with_field_raises(spark, ev):
    bands = spark.createDataFrame(
        [(0.0, 1.0, "x")], "value_lo double, value_hi double, band string"
    )
    with pytest.raises(ValueError, match="not in policy"):
        esql(
            "FROM t | ENRICH b ON value WITH nosuch",
            tables={"t": ev, "b": bands},
        )


# --- spatial relations -----------------------------------------------------------

def test_st_relations_closed_boundaries(ev):
    out = esql(
        "FROM t | WHERE event_id == 0"
        " | EVAL q = TO_GEOSHAPE('BBOX (0.0, 10.0, 10.0, 0.0)'),"
        "   edge = TO_GEOPOINT('POINT (10.0 5.0)'),"
        "   outp = TO_GEOPOINT('POINT (10.5 5.0)'),"
        "   inner = TO_GEOSHAPE('BBOX (2.0, 8.0, 8.0, 2.0)')"
        " | EVAL a = ST_INTERSECTS(edge, q), b = ST_DISJOINT(outp, q),"
        "   c = ST_CONTAINS(q, inner), d = ST_WITHIN(inner, q),"
        "   e = ST_CONTAINS(inner, q)"
        " | KEEP a, b, c, d, e",
        tables={"t": ev},
    ).collect()[0]
    assert (out.a, out.b, out.c, out.d, out.e) == (
        True, True, True, True, False
    )


# --- geo_match ENRICH ------------------------------------------------------------

def test_enrich_geo_first_match_wins_and_null_outside(spark, ev):
    regions = spark.createDataFrame(
        [("BBOX (0.0, 10.0, 10.0, 0.0)", "inner"),
         ("BBOX (0.0, 20.0, 20.0, 0.0)", "outer")],
        "shape string, region string",
    )
    pts = spark.createDataFrame(
        [(0, "POINT (5.0 5.0)"), (1, "POINT (15.0 15.0)"),
         (2, "POINT (-1.0 5.0)")],
        "event_id long, p string",
    )
    out = esql(
        "FROM t | ENRICH r ON p WITH region | KEEP event_id, region"
        " | SORT event_id",
        tables={"t": pts, "r": regions},
    ).collect()
    # point 0 is in BOTH boxes: first policy row wins; point 2 outside
    assert [(r.event_id, r.region) for r in out] == [
        (0, "inner"), (1, "outer"), (2, None)
    ]


def test_enrich_geo_polygon_shape_raises(spark, ev):
    regions = spark.createDataFrame(
        [("POLYGON ((0 0, 1 0, 1 1, 0 0))", "tri")],
        "shape string, region string",
    )
    pts = spark.createDataFrame([(0, "POINT (0.5 0.2)")],
                                "event_id long, p string")
    with pytest.raises(ValueError, match="BBOX"):
        esql("FROM t | ENRICH r ON p WITH region",
             tables={"t": pts, "r": regions})


# --- FROM METADATA _index -----------------------------------------------------

def test_from_metadata_index_tags_sources(spark, ev):
    a = ev.limit(2)
    out = esql(
        "FROM a, b METADATA _index | STATS n = COUNT(*) BY _index"
        " | SORT _index",
        tables={"a": a, "b": ev},
    ).collect()
    assert [(r._index, r.n) for r in out] == [("a", 2), ("b", 5)]


def test_from_metadata_rejects_unknown_fields(spark, ev):
    with pytest.raises(ValueError, match="_index only"):
        esql("FROM a METADATA _score | LIMIT 1", tables={"a": ev})
