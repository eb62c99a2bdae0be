"""Reader facade + geo operator tests (S1-S5, P5-P6, F6)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.datagen.events import events_pandas
from elasticsearch_assets_spark.operators.geo import (
    haversine_m,
    parse_distance,
    parse_geo_point,
)
from elasticsearch_assets_spark.sources.reader import DateReader, IdReader, ReaderConfig


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ev") / "events.parquet")
    spark.createDataFrame(events_pandas(2000)).write.parquet(p)
    return p


class TestGeoPrimitives:
    def test_parse_point(self):
        assert parse_geo_point("45.5,-120.25") == (45.5, -120.25)
        for bad in ["91,0", "0,181", "nonsense", "1;2"]:
            with pytest.raises(ValueError):
                parse_geo_point(bad)

    def test_parse_distance_units(self):
        assert parse_distance("1km") == 1000.0
        assert parse_distance("1mi") == 1609.344
        assert parse_distance("3ft") == pytest.approx(0.9144)
        with pytest.raises(ValueError):
            parse_distance("5parsec")

    def test_haversine_known_value(self, spark):
        # Paris -> London ≈ 343.5 km
        df = spark.createDataFrame([(48.8566, 2.3522)], "lat double, lon double")
        d = df.select(haversine_m(F.col("lat"), F.col("lon"), 51.5074, -0.1278).alias("d"))
        meters = d.collect()[0]["d"]
        assert math.isclose(meters, 343_500, rel_tol=0.01)


class TestReaderConfig:
    def test_geo_requires_field(self):
        with pytest.raises(ValueError):
            ReaderConfig(path="x", geo_point="1,1", geo_distance="1km")

    def test_geo_exclusive(self):
        with pytest.raises(ValueError):
            ReaderConfig(
                path="x", geo_field="location",
                geo_box_top_left="1,1", geo_box_bottom_right="0,2",
                geo_point="1,1", geo_distance="1km",
            )

    def test_date_reader_requires_date_field(self, spark):
        with pytest.raises(ValueError):
            DateReader(spark, ReaderConfig(path="x"))


class TestDateReader:
    def test_scan_range_and_query(self, spark, events_path):
        cfg = ReaderConfig(
            path=events_path,
            date_field_name="created",
            start="2019-07-02T00:00:00Z",
            end="2019-07-04T00:00:00Z",
            query="bytes:>=15000",
        )
        r = DateReader(spark, cfg)
        rows = r.dataframe().collect()
        assert rows
        for row in rows:
            assert row["bytes"] >= 15000
            assert "2019-07-02" <= str(row["created"]) < "2019-07-04"
        assert r.count() == len(rows)

    def test_fields_projection_forces_date_field(self, spark, events_path):
        cfg = ReaderConfig(
            path=events_path, date_field_name="created", fields=["ip", "bytes"]
        )
        df = DateReader(spark, cfg).dataframe()
        assert df.columns == ["ip", "bytes", "created"]

    def test_plan_and_slices_cover(self, spark, events_path):
        cfg = ReaderConfig(path=events_path, date_field_name="created", size=300)
        r = DateReader(spark, cfg)
        plan = r.plan()
        assert plan.total == 2000
        assert sum(s.count for s in plan.slices) == 2000
        total = sum(r.read_slice(s).count() for s in plan.slices)
        assert total == 2000

    def test_geo_bbox(self, spark, events_path):
        cfg = ReaderConfig(
            path=events_path, date_field_name="created",
            geo_field="location",
            geo_box_top_left="40,-100", geo_box_bottom_right="0,0",
        )
        rows = DateReader(spark, cfg).dataframe().collect()
        assert rows
        for row in rows:
            lat, lon = (float(x) for x in row["location"].split(","))
            assert 0 <= lat <= 40 and -100 <= lon <= 0

    def test_geo_distance_and_sort(self, spark, events_path):
        cfg = ReaderConfig(
            path=events_path, date_field_name="created",
            geo_field="location",
            geo_point="0,0", geo_distance="3000km",
            geo_sort_point="0,0",
        )
        rows = DateReader(spark, cfg).dataframe().collect()
        assert rows
        # verify radius + ascending distance order with a python haversine
        def hav_km(lat, lon):
            from math import asin, cos, radians, sin, sqrt
            a = sin(radians(lat) / 2) ** 2 + cos(0) * cos(radians(lat)) * sin(radians(lon) / 2) ** 2
            return 2 * 6371.0088 * asin(sqrt(a))

        dists = []
        for row in rows:
            lat, lon = (float(x) for x in row["location"].split(","))
            d = hav_km(lat, lon)
            assert d <= 3000 * 1.001
            dists.append(d)
        assert dists == sorted(dists)

    def test_bm25_terms_routing(self, spark, events_path):
        cfg = ReaderConfig(
            path=events_path, date_field_name="created",
            query="bytes:>=100 AND spark join", text_col="url",
        )
        assert DateReader(spark, cfg).bm25_terms() == ["spark", "join"]


class TestIdReader:
    def test_plan_and_read(self, spark, events_path):
        cfg = ReaderConfig(path=events_path, key_field="id", size=200)
        r = IdReader(spark, cfg)
        plan = r.plan()
        assert sum(s.count for s in plan) == 2000
        assert all(s.count <= 200 for s in plan)
        first = plan[0]
        got = r.read_slice(first).count()
        assert got == first.count


class TestSubsliceByKey:
    """X4: hot date ranges secondarily split by key prefix."""

    def test_hot_range_subsliced_and_covering(self, spark, tmp_path):
        from elasticsearch_assets_spark.plans.date_slicer import CombinedSlice
        from elasticsearch_assets_spark.sources.reader import DateReader, ReaderConfig

        # 2000 uniform events + 400 at ONE instant: the hot instant is a
        # minimum-width slice that time-splitting cannot shrink — exactly the
        # case the reference's subslice_by_key exists for
        pdf = events_pandas(2400)
        hot_ts = pdf.loc[1000, "created"]
        pdf.loc[2000:, "created"] = hot_ts
        path = str(tmp_path / "hot.parquet")
        spark.createDataFrame(pdf).write.parquet(path)

        cfg = ReaderConfig(
            path=path,
            date_field_name="created",
            size=200,
            key_field="id",
            key_type="base64url",
            subslice_by_key=True,
            subslice_key_threshold=300,
        )
        rdr = DateReader(spark, cfg)
        slices = rdr.plan_with_subslices()
        combined = [s for s in slices if isinstance(s, CombinedSlice)]
        assert combined, "hot instant should be key-subsliced"

        # every doc lands in exactly one slice: totals add up, reads agree
        total = sum(s.count for s in slices)
        assert total == 2400
        read_total = sum(rdr.read_slice(s).count() for s in slices)
        assert read_total == total
        # combined sub-slices respect the size cap (unless at max depth)
        for s in combined:
            assert s.count <= 200 or len(s.prefix) >= 8

    def test_requires_config(self, spark, events_path):
        from elasticsearch_assets_spark.sources.reader import DateReader, ReaderConfig

        cfg = ReaderConfig(path=events_path, date_field_name="created")
        with pytest.raises(ValueError):
            DateReader(spark, cfg).plan_with_subslices()


class TestMetadataColumns:
    def test_attach_metadata(self, spark, events_path):
        from elasticsearch_assets_spark.sources.reader import attach_metadata

        df = spark.read.parquet(events_path).limit(5)
        out = attach_metadata(
            df, key_col="id", event_ts_col="created", index_name="events-v1"
        )
        rows = out.collect()
        for r in rows:
            assert r["_key"] == r["id"]
            assert r["_event_ts"] == r["created"]
            assert r["_index"] == "events-v1"
            assert r["_process_ts"] is not None and r["_ingest_ts"] is not None

    def test_auto_key_is_deterministic(self, spark, events_path):
        from elasticsearch_assets_spark.sources.reader import attach_metadata

        df = spark.read.parquet(events_path).limit(5).select("id", "url")
        a = {r["id"]: r["_key"] for r in attach_metadata(df).collect()}
        b = {r["id"]: r["_key"] for r in attach_metadata(df).collect()}
        assert a == b and all(len(k) == 40 for k in a.values())


def test_geo_sort_unit_mirrors_reference_units(spark):
    """geo_sort_unit (reference index.js:228-235): the exposed sort
    distance converts by the reference's meters-per-unit table; the order
    never changes."""
    import pytest as _pytest
    from pyspark.sql import Row

    from elasticsearch_assets_spark.operators.geo import UNIT_METERS, distance_col
    from elasticsearch_assets_spark.sources.reader import DateReader, ReaderConfig

    import datetime as _dt

    ts = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(event_id=1, ts=ts, geo="10.0,10.0"),
            Row(event_id=2, ts=ts, geo="20.0,20.0"),
            Row(event_id=3, ts=ts, geo="30.0,30.0"),
        ]
    )
    path = "/tmp/esa_geo_unit_test"
    df.write.mode("overwrite").parquet(path)

    def scan(unit):
        cfg = ReaderConfig(
            path=path, date_field_name="ts", geo_field="geo",
            geo_sort_point="0,0", geo_sort_order="asc", geo_sort_unit=unit,
        )
        return DateReader(spark, cfg).dataframe().select("event_id", "_distance").collect()

    km = scan("km")
    mi = scan("mi")
    assert [r["event_id"] for r in km] == [1, 2, 3]
    assert [r["event_id"] for r in mi] == [1, 2, 3]
    for a, b in zip(km, mi):
        # the reference's unit table: mi value = km value * 1000 / 1609.344
        assert b["_distance"] == pytest.approx(
            a["_distance"] * UNIT_METERS["km"] / UNIT_METERS["mi"], rel=1e-12
        )
    # every reference unit is accepted; junk is rejected (checkUnits)
    from pyspark.sql import functions as F

    for u in UNIT_METERS:
        distance_col(F.lit(1.0), F.lit(1.0), "0,0", unit=u)
    with _pytest.raises(ValueError, match="geo_sort_unit"):
        distance_col(F.lit(1.0), F.lit(1.0), "0,0", unit="furlong")
