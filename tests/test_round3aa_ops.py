"""Round-3 batch (session 7): ES|QL function batteries 3 — string/bytes/
hash spellings, math passthroughs, multivalue batch 2 (MV_SLICE/MV_APPEND/
MV_ZIP/MV_PERCENTILE/MV_PSERIES_WEIGHTED_SUM), IP_PREFIX.

Contract twins: esql_scalar_funcs3 / esql_math_funcs / esql_mv_funcs2.
"""

from __future__ import annotations

import math

import pytest

from elasticsearch_assets_spark.query.esql import esql


def _one(spark, q: str) -> dict:
    rows = esql(q, spark=spark).collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_mv_slice_semantics(spark):
    # ES: 0-based, end inclusive, negatives from the end
    r = _one(
        spark,
        "ROW a = array(10, 20, 30, 40)"
        " | EVAL m = MV_SLICE(a, 1, 2), h = MV_SLICE(a, 2),"
        "   t = MV_SLICE(a, -2, -1), one = MV_SLICE(a, -1)",
    )
    assert r["m"] == [20, 30]
    assert r["h"] == [30]
    assert r["t"] == [30, 40]
    assert r["one"] == [40]


def test_mv_zip_default_and_custom_delim(spark):
    r = _one(
        spark,
        "ROW a = array('p', 'q'), b = array('1', '2')"
        " | EVAL d = MV_ZIP(a, b), c = MV_ZIP(a, b, '-')",
    )
    assert r["d"] == ["p,1", "q,2"]
    assert r["c"] == ["p-1", "q-2"]


def test_mv_append_and_percentile(spark):
    r = _one(
        spark,
        "ROW a = array(1.0, 3.0, 2.0)"
        " | EVAL ap = MV_APPEND(a, array(9.0)),"
        "   p0 = MV_PERCENTILE(a, 0), p50 = MV_PERCENTILE(a, 50),"
        "   p100 = MV_PERCENTILE(a, 100), p25 = MV_PERCENTILE(a, 25)",
    )
    assert r["ap"] == [1.0, 3.0, 2.0, 9.0]
    assert r["p0"] == 1.0 and r["p50"] == 2.0 and r["p100"] == 3.0
    assert r["p25"] == pytest.approx(1.5)  # 1 + 0.5*(2-1)


def test_mv_pseries_weighted_sum(spark):
    r = _one(
        spark,
        "ROW a = array(4.0, 4.0, 4.0) | EVAL s = MV_PSERIES_WEIGHTED_SUM(a, 2.0)",
    )
    assert r["s"] == pytest.approx(4.0 + 4.0 / 4 + 4.0 / 9)


def test_ip_prefix_masks_and_validates(spark):
    r = _one(
        spark,
        "ROW ip = '192.168.200.77'"
        " | EVAL a = IP_PREFIX(ip, 24, 0), b = IP_PREFIX(ip, 12, 0),"
        "   c = IP_PREFIX(ip, 0, 0), d = IP_PREFIX(ip, 32, 0)",
    )
    assert r["a"] == "192.168.200.0"
    assert r["b"] == "192.160.0.0"
    assert r["c"] == "0.0.0.0"
    assert r["d"] == "192.168.200.77"
    with pytest.raises(ValueError, match="literal"):
        esql("ROW x = 1 | EVAL p = IP_PREFIX('1.2.3.4', x, 0)", spark=spark)
    with pytest.raises(ValueError, match="<= 32"):
        esql("ROW x = 1 | EVAL p = IP_PREFIX('1.2.3.4', 40, 0)", spark=spark)


def test_hash_algorithms_and_errors(spark):
    r = _one(
        spark,
        "ROW s = 'abc' | EVAL m = HASH('md5', s), h = HASH('sha256', s),"
        " m2 = MD5(s), h2 = SHA256(s)",
    )
    import hashlib

    assert r["m"] == hashlib.md5(b"abc").hexdigest() == r["m2"]
    assert r["h"] == hashlib.sha256(b"abc").hexdigest() == r["h2"]
    with pytest.raises(ValueError, match="algorithm"):
        esql("ROW s = 'x' | EVAL h = HASH('crc32', s)", spark=spark)


def test_base64_roundtrip_and_byte_length(spark):
    r = _one(
        spark,
        "ROW s = 'café' | EVAL b = TO_BASE64(s), r = FROM_BASE64(TO_BASE64(s)),"
        " bl = BIT_LENGTH(s), byl = BYTE_LENGTH(s)",
    )
    assert r["r"] == "café"
    assert r["byl"] == 5  # UTF-8: e-acute is 2 bytes
    assert r["bl"] == 40
    import base64

    assert base64.b64decode(r["b"]).decode() == "café"


def test_math_passthroughs(spark):
    r = _one(
        spark,
        "ROW x = -2.0 | EVAL cb = CBRT(8.0), sg = SIGNUM(x), hy = HYPOT(3.0, 4.0),"
        " lg = LOG(2.0, 8.0), sh = SINH(0.0), e = E()",
    )
    assert r["cb"] == pytest.approx(2.0)
    assert r["sg"] == -1.0
    assert r["hy"] == pytest.approx(5.0)
    assert r["lg"] == pytest.approx(3.0)
    assert r["sh"] == 0.0
    assert r["e"] == pytest.approx(math.e)


# --- spatial layer (contract twins: esql_spatial / esql_spatial_agg) ------


def test_st_distance_matches_geo_kernel(spark):
    from elasticsearch_assets_spark.operators.geo import haversine_m
    from pyspark.sql import functions as F

    r = _one(
        spark,
        "ROW p = 'POINT (2.5 48.8)'"
        " | EVAL d = ST_DISTANCE(p, TO_GEOPOINT('POINT (-0.1 51.5)'))",
    )
    df = spark.range(1).select(
        haversine_m(F.lit(48.8), F.lit(2.5), 51.5, -0.1).alias("d")
    )
    assert r["d"] == pytest.approx(df.head()["d"], rel=1e-12)
    # Paris -> London is ~344 km
    assert 330_000 < r["d"] < 360_000


def test_st_xy_and_geohash(spark):
    r = _one(
        spark,
        "ROW p = 'POINT (-5.25 40.5)'"
        " | EVAL x = ST_X(p), y = ST_Y(p), gh = ST_GEOHASH(p, 5)",
    )
    assert r["x"] == -5.25 and r["y"] == 40.5
    # cross-check against the proven facet geohash expression
    from elasticsearch_assets_spark.operators.facets import geohash_sql
    from pyspark.sql import functions as F

    ref = spark.range(1).select(
        F.expr(geohash_sql("40.5", "-5.25", 5)).alias("gh")
    ).head()["gh"]
    assert r["gh"] == ref and len(r["gh"]) == 5
    with pytest.raises(ValueError, match="literal"):
        esql("ROW n = 3 | EVAL g = ST_GEOHASH('POINT (0 0)', n)", spark=spark)


def test_centroid_and_extent_roundtrip(spark):
    rows = esql(
        "ROW x = array(0, 1, 2) | MV_EXPAND x"
        " | EVAL p = CONCAT('POINT (', TO_STRING(TO_DOUBLE(x) * 10.0 - 5.0),"
        "   ' ', TO_STRING(TO_DOUBLE(x) * 2.0 + 0.25), ')')"
        " | STATS c = ST_CENTROID_AGG(p), e = ST_EXTENT_AGG(p)"
        " | EVAL cx = ST_X(c), cy = ST_Y(c), x0 = ST_XMIN(e), x1 = ST_XMAX(e),"
        "   y1 = ST_YMAX(e), y0 = ST_YMIN(e)",
        spark=spark,
    ).collect()
    r = rows[0].asDict()
    # lons -5, 5, 15 -> centroid 5; lats 0.25, 2.25, 4.25 -> centroid 2.25
    assert r["cx"] == pytest.approx(5.0) and r["cy"] == pytest.approx(2.25)
    assert (r["x0"], r["x1"], r["y1"], r["y0"]) == (-5.0, 15.0, 4.25, 0.25)
