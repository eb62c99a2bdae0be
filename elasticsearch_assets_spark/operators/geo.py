"""Geo predicates and distance sort (SURVEY.md §2.2 P5-P6, §2.3 F6, §2.6 C5-C6).

The reference validates `"lat,lon"` strings and range-checks them
(/root/reference/asset/elasticsearch_reader/index.js:236-248), supports a
bounding-box filter (:192-201), a point+radius filter with units mi/yd/ft/km/m
(:202-211, 250-276), and geo-distance sort (:212-232). All of it compiles to
plain JVM-side column expressions here — no UDFs, fully pushdown/codegen
friendly; the distance filter is pre-pruned with a bounding box so the
haversine only runs on candidates.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, functions as F

# meters per unit — /root/reference/asset/elasticsearch_reader/index.js:250-262
UNIT_METERS = {
    "m": 1.0,
    "km": 1000.0,
    "mi": 1609.344,
    "yd": 0.9144,
    "ft": 0.3048,
}

EARTH_RADIUS_M = 6_371_008.8

_POINT_RE = re.compile(r"^\s*(-?\d+(\.\d+)?)\s*,\s*(-?\d+(\.\d+)?)\s*$")


def parse_geo_point(s: str) -> tuple[float, float]:
    """Validate and parse a `"lat,lon"` string (C5)."""
    m = _POINT_RE.match(s)
    if not m:
        raise ValueError(f"geo point must be 'lat,lon', got {s!r}")
    lat, lon = float(m.group(1)), float(m.group(3))
    if not (-90.0 <= lat <= 90.0):
        raise ValueError(f"latitude {lat} out of range [-90, 90]")
    if not (-180.0 <= lon <= 180.0):
        raise ValueError(f"longitude {lon} out of range [-180, 180]")
    return lat, lon


def parse_distance(s: str) -> float:
    """'200km' / '50mi' -> meters (C6)."""
    m = re.match(r"^\s*(\d+(\.\d+)?)\s*(m|km|mi|yd|ft)\s*$", s)
    if not m:
        raise ValueError(f"bad distance {s!r} (expected e.g. '200km')")
    return float(m.group(1)) * UNIT_METERS[m.group(3)]


def point_cols(geo_col: str | Column) -> tuple[Column, Column]:
    """Split a `"lat,lon"` string column into double (lat, lon) columns."""
    c = F.col(geo_col) if isinstance(geo_col, str) else geo_col
    parts = F.split(c, ",")
    return parts[0].cast("double"), parts[1].cast("double")


def bbox_predicate(
    lat: Column, lon: Column, top_left: str, bottom_right: str
) -> Column:
    """P5: geo bounding box (corners given as "lat,lon" strings)."""
    n, w = parse_geo_point(top_left)
    s, e = parse_geo_point(bottom_right)
    return lat.between(s, n) & lon.between(w, e)


def haversine_m(lat: Column, lon: Column, plat: float, plon: float) -> Column:
    """Great-circle distance in meters — pure built-in expressions."""
    rlat, rlon = F.radians(lat), F.radians(lon)
    prlat, prlon = math.radians(plat), math.radians(plon)
    dlat = rlat - F.lit(prlat)
    dlon = rlon - F.lit(prlon)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat) * F.lit(math.cos(prlat)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def distance_predicate(
    lat: Column, lon: Column, point: str, distance: str
) -> Column:
    """P6: point+radius filter, bounding-box pre-pruned then exact haversine."""
    plat, plon = parse_geo_point(point)
    radius_m = parse_distance(distance)
    dlat_deg = math.degrees(radius_m / EARTH_RADIUS_M)
    cos_lat = max(0.01, math.cos(math.radians(plat)))
    dlon_deg = dlat_deg / cos_lat
    bbox = lat.between(plat - dlat_deg, plat + dlat_deg) & lon.between(
        plon - dlon_deg, plon + dlon_deg
    )
    return bbox & (haversine_m(lat, lon, plat, plon) <= radius_m)


def distance_sort(
    lat: Column, lon: Column, point: str, ascending: bool = True
) -> Column:
    """F6: ORDER BY great-circle distance from a point."""
    plat, plon = parse_geo_point(point)
    d = haversine_m(lat, lon, plat, plon)
    return d.asc() if ascending else d.desc()


def distance_col(
    lat: Column, lon: Column, point: str, unit: str = "m"
) -> Column:
    """Great-circle distance from a point, converted to `unit` — the
    reference's `geo_sort_unit` knob (elasticsearch_reader/index.js:228-235
    + checkUnits): ES reports the sort values in the requested unit; the
    unit never changes the ORDER, only the exposed numbers."""
    if unit not in UNIT_METERS:
        raise ValueError(
            f"geo_sort_unit must be one of {sorted(UNIT_METERS)}, got {unit!r}"
        )
    plat, plon = parse_geo_point(point)
    return haversine_m(lat, lon, plat, plon) / F.lit(UNIT_METERS[unit])


def point_in_polygon_sql(
    lat_sql: str, lon_sql: str, vertices: list[tuple[float, float]]
) -> str:
    """ONE engine-portable SQL boolean for ES's geo_polygon query: the
    even-odd ray cast (a horizontal ray from the point crosses an odd
    number of polygon edges), unrolled per edge — CASE/comparison
    arithmetic only, so the IDENTICAL string runs as a Spark JVM column
    (F.expr) and as the DuckDB oracle. Vertices are (lat, lon) pairs,
    closed implicitly (last connects to first); points exactly on an
    edge follow the half-open crossing rule (deterministic, both
    engines). Wrap-around polygons (crossing the antimeridian) are not
    supported — the non-wrapping contract the geo operators share."""
    if len(vertices) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    terms = []
    n = len(vertices)
    for i in range(n):
        y1, x1 = (float(v) for v in vertices[i])
        y2, x2 = (float(v) for v in vertices[(i + 1) % n])
        if y1 == y2:
            continue  # horizontal edge never crosses the horizontal ray
        cross = (
            f"(CASE WHEN (({y1} > ({lat_sql})) <> ({y2} > ({lat_sql}))) "
            f"AND (({lon_sql}) < ({x2} - {x1}) * (({lat_sql}) - {y1}) "
            f"/ ({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END)"
        )
        terms.append(cross)
    if not terms:
        return "FALSE"
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def polygon_predicate(
    lat_sql: str, lon_sql: str, vertices: list[tuple[float, float]]
) -> Column:
    """point_in_polygon_sql compiled to a Spark column (whole-stage
    codegen; pushes as far as the expression allows)."""
    return F.expr(point_in_polygon_sql(lat_sql, lon_sql, vertices))


def polygon_with_holes_sql(
    lat: str,
    lon: str,
    outer: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] | None = None,
) -> str:
    """ES geo_shape polygon-with-holes containment as ONE shared SQL
    boolean: inside the outer ring AND outside every hole ring — each
    ring is the same unrolled ray-cast as point_in_polygon_sql, so the
    combined text stays engine-portable (parity by construction)."""
    parts = [f"({point_in_polygon_sql(lat, lon, outer)})"]
    for h in holes or []:
        parts.append(f"NOT ({point_in_polygon_sql(lat, lon, h)})")
    return " AND ".join(parts)


def polygon_with_holes_predicate(
    lat_sql: str,
    lon_sql: str,
    outer: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] | None = None,
) -> Column:
    """polygon_with_holes_sql compiled to a Spark column (the SAME text —
    parity by construction, like polygon_predicate)."""
    return F.expr(polygon_with_holes_sql(lat_sql, lon_sql, outer, holes))


def envelope_relation_sql(
    minlat: str, maxlat: str, minlon: str, maxlon: str,
    qbox: "tuple[float, float, float, float]",
    relation: str,
) -> str:
    """ES geo_shape envelope relations over shape DOCUMENTS (each doc a
    lat/lon box) vs a query envelope — pure interval algebra per axis,
    ONE SQL text evaluated verbatim by Spark and DuckDB (bit parity by
    construction, the shared-SQL-text pattern).

    `qbox` = (qminlat, qmaxlat, qminlon, qmaxlon). Relations follow the
    ES geo_shape query: intersects (default), disjoint, within (doc
    inside query), contains (doc contains query). Boxes are closed; the
    anti-meridian is out of scope (documented, as in the engine's other
    geo predicates)."""
    a, b, c, d = (float(x) for x in qbox)
    if a > b or c > d:
        raise ValueError("query envelope needs min <= max per axis")
    inter = (
        f"(NOT ({maxlat} < {a} OR {minlat} > {b} "
        f"OR {maxlon} < {c} OR {minlon} > {d}))"
    )
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return f"(NOT {inter})"
    if relation == "within":
        return (
            f"({minlat} >= {a} AND {maxlat} <= {b} "
            f"AND {minlon} >= {c} AND {maxlon} <= {d})"
        )
    if relation == "contains":
        return (
            f"({minlat} <= {a} AND {maxlat} >= {b} "
            f"AND {minlon} <= {c} AND {maxlon} >= {d})"
        )
    raise ValueError(
        f"unknown geo_shape relation {relation!r} "
        "(intersects | disjoint | within | contains)"
    )


def envelope_relation_predicate(
    minlat: "str | Column", maxlat, minlon, maxlon,
    qbox: "tuple[float, float, float, float]",
    relation: str = "intersects",
) -> Column:
    """Spark twin of envelope_relation_sql (same text through F.expr when
    given column names; composes with pushed scans)."""
    cols = [minlat, maxlat, minlon, maxlon]
    if all(isinstance(x, str) for x in cols):
        return F.expr(envelope_relation_sql(*cols, qbox, relation))
    raise ValueError("pass column NAMES so the one SQL text drives both engines")


def geo_grid_filter(df, lat_col: str, lon_col: str, precision: int,
                    cells: "list[str]"):
    """ES geo_grid query (geohash form): keep rows whose precision-P
    geohash cell is one of `cells`. The cell expression is the shared
    SQL-text kernel (operators/facets.geohash_sql) that also drives the
    geohash_grid agg and ST_GEOHASH, so query-vs-agg cell assignment is
    bit-identical by construction. At 100 TB the cell is a natural
    partition/bucket column: persisting it turns this filter into
    partition pruning instead of a full scan (cf. the reference's
    geo query support, elasticsearch_reader/index.js geo handling)."""
    from elasticsearch_assets_spark.operators.facets import geohash_sql

    if not cells:
        raise ValueError("geo_grid_filter: cells must be non-empty")
    cell = geohash_sql(lat_col, lon_col, precision)
    in_list = ", ".join(f"'{c}'" for c in cells)
    return df.where(F.expr(f"({cell}) IN ({in_list})"))
