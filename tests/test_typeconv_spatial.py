"""T3/T4 scalar transforms + the canonical type-decomposition layer:
spatial WKB/WKT/GeoJSON recode, interval <-> ISO-8601, vendor DDL type
parsing (reference: yadamuSpatialLibrary.js, yadamuLibrary.js:201-229,
:378-460)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from yadamu___yet_another_data_migration_utility_spark.functions.spatial import (
    geojson_to_geom,
    geom_to_geojson,
    geom_to_wkb,
    geom_to_wkt,
    recode_spatial_columns,
    wkb_to_geom,
    wkt_to_geom,
)
from yadamu___yet_another_data_migration_utility_spark.functions.typeconv import (
    TypeSpec,
    classify_iso8601,
    decompose_data_type,
    interval_dt_to_iso8601,
    interval_ym_to_iso8601,
    iso8601_to_interval_dt,
    iso8601_to_interval_ym,
    spark_type_for,
)

GEOMS = [
    {"type": "Point", "coordinates": [1.5, -2.25]},
    {"type": "LineString", "coordinates": [[0.0, 0.0], [10.0, 0.0], [10.0, 5.5]]},
    {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]],  # hole
        ],
    },
    {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    {
        "type": "MultiLineString",
        "coordinates": [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]],
    },
    {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
            [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]],
        ],
    },
    {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [7.0, 8.0]},
            {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 2.0]]},
        ],
    },
]


@pytest.mark.parametrize("g", GEOMS, ids=[g["type"] for g in GEOMS])
def test_spatial_roundtrips_all_types(g):
    """Every format pair must round-trip every OGC simple-feature type
    exactly (coordinates are binary-exact through WKB; WKT/GeoJSON use
    shortest-round-trip float text)."""
    assert wkb_to_geom(geom_to_wkb(g)) == g
    assert wkt_to_geom(geom_to_wkt(g)) == g
    assert geojson_to_geom(geom_to_geojson(g)) == g
    # cross-chain: wkt -> wkb -> geojson -> wkt is the identity
    wkt = geom_to_wkt(g)
    assert geom_to_wkt(geojson_to_geom(geom_to_geojson(
        wkb_to_geom(geom_to_wkb(wkt_to_geom(wkt)))))) == wkt


def test_spatial_wkb_reads_big_endian_and_ewkb_srid():
    import struct

    # big-endian point (byte order 0)
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
    assert wkb_to_geom(be) == {"type": "Point", "coordinates": [3.0, 4.0]}
    # PostGIS EWKB: SRID flag + embedded srid, little-endian
    ewkb = (b"\x01" + struct.pack("<I", 1 | 0x20000000)
            + struct.pack("<I", 4326) + struct.pack("<dd", 1.0, 2.0))
    assert wkb_to_geom(ewkb) == {"type": "Point", "coordinates": [1.0, 2.0]}
    # Z geometries are rejected, not silently truncated
    zpt = b"\x01" + struct.pack("<I", 0x80000001) + struct.pack("<ddd", 1, 2, 3)
    with pytest.raises(ValueError, match="Z/M"):
        wkb_to_geom(zpt)


def test_spatial_wkt_number_formatting_canonical():
    g = {"type": "Point", "coordinates": [5.0, -0.5]}
    assert geom_to_wkt(g) == "POINT (5 -0.5)"  # integral -> no decimal point
    # MULTIPOINT bare-member syntax is accepted on read
    assert wkt_to_geom("MULTIPOINT (1 2, 3 4)") == {
        "type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]
    }


def test_spatial_recode_columns_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "POINT (1 2)"), (2, "LINESTRING (0 0, 1 1)"), (3, None)],
        "id long, geom string",
    )
    as_wkb = recode_spatial_columns(df, ["geom"], "wkt", "wkb")
    back = recode_spatial_columns(as_wkb, ["geom"], "wkb", "wkt")
    got = {(r["id"], r["geom"]) for r in back.collect()}
    assert got == {(1, "POINT (1 2)"), (2, "LINESTRING (0 0, 1 1)"), (3, None)}
    gj = {r["id"]: r["geom"]
          for r in recode_spatial_columns(df, ["geom"], "wkt", "geojson").collect()}
    assert gj[1] == '{"type":"Point","coordinates":[1.0,2.0]}'


def test_spatial_property_fuzz_roundtrip():
    """Hypothesis: arbitrary finite coordinates (incl. negatives, tiny
    and huge magnitudes, non-representable decimals) survive every
    format chain bit-exactly through WKB and value-exactly through the
    text formats (repr is shortest-round-trip)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.floats(
        allow_nan=False, allow_infinity=False, width=64,
        min_value=-1e12, max_value=1e12,
    )
    point = st.tuples(coord, coord).map(list)
    line = st.lists(point, min_size=2, max_size=6)
    geom = st.one_of(
        point.map(lambda c: {"type": "Point", "coordinates": c}),
        line.map(lambda c: {"type": "LineString", "coordinates": c}),
        st.lists(line, min_size=1, max_size=3).map(
            lambda c: {"type": "MultiLineString", "coordinates": c}
        ),
    )

    @settings(max_examples=60, deadline=None)
    @given(g=geom)
    def check(g):
        assert wkb_to_geom(geom_to_wkb(g)) == g
        assert wkt_to_geom(geom_to_wkt(g)) == g
        assert geojson_to_geom(geom_to_geojson(g)) == g
        wkt = geom_to_wkt(g)
        assert geom_to_wkt(wkb_to_geom(geom_to_wkb(wkt_to_geom(wkt)))) == wkt

    check()


# ----------------------------------------------------------------------
# intervals
# ----------------------------------------------------------------------


def test_interval_iso8601_roundtrip(spark):
    df = spark.sql("""SELECT * FROM VALUES
      (INTERVAL '3-7' YEAR TO MONTH,  INTERVAL '2 03:04:05.123456' DAY TO SECOND),
      (INTERVAL '-1-2' YEAR TO MONTH, INTERVAL '-0 00:00:01.5' DAY TO SECOND),
      (INTERVAL '0-0' YEAR TO MONTH,  INTERVAL '0 00:00:50' DAY TO SECOND)
      AS t(ym, dt)""")
    enc = df.select(
        interval_ym_to_iso8601(F.col("ym")).alias("ym_iso"),
        interval_dt_to_iso8601(F.col("dt")).alias("dt_iso"),
    )
    got = [(r.ym_iso, r.dt_iso) for r in enc.collect()]
    assert got == [
        ("P3Y7M", "P2DT3H4M5.123456S"),
        ("-P1Y2M", "-P0DT0H0M1.5S"),
        ("P0Y0M", "P0DT0H0M50S"),  # whole seconds: no spurious zero-strip
    ]
    # parse back (interval types have no Python materialization; compare
    # via the JVM-side string form)
    back = enc.select(
        iso8601_to_interval_ym(F.col("ym_iso")).cast("string").alias("ym"),
        iso8601_to_interval_dt(F.col("dt_iso")).cast("string").alias("dt"),
    )
    orig = df.select(F.col("ym").cast("string").alias("ym"),
                     F.col("dt").cast("string").alias("dt"))
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in orig.collect()]


def test_iso8601_parse_optional_components_and_weeks(spark):
    df = spark.createDataFrame([("P2Y",), ("P5M",), ("-P1W2DT3H",), ("PT45.25S",)],
                               "iso string")
    got = df.select(
        iso8601_to_interval_ym(F.col("iso")).cast("string").alias("ym"),
        iso8601_to_interval_dt(F.col("iso")).cast("string").alias("dt"),
    ).collect()
    assert got[0].ym == "INTERVAL '2-0' YEAR TO MONTH"
    assert got[1].ym == "INTERVAL '0-5' YEAR TO MONTH"
    assert got[2].dt == "INTERVAL '-9 03:00:00' DAY TO SECOND"  # 1W+2D folded
    assert got[3].dt == "INTERVAL '0 00:00:45.25' DAY TO SECOND"


def test_classify_iso8601():
    assert classify_iso8601("P3Y7M") == "YM"
    assert classify_iso8601("P5M") == "YM"
    assert classify_iso8601("P2DT3H4M5S") == "DMS"
    assert classify_iso8601("PT5M") == "DMS"  # M after T is minutes
    with pytest.raises(ValueError):
        classify_iso8601("nope")


# ----------------------------------------------------------------------
# canonical type decomposition
# ----------------------------------------------------------------------


def test_decompose_data_type():
    assert decompose_data_type("NUMBER(10,2)") == TypeSpec("number", None, 10, 2)
    assert decompose_data_type("varchar(max)") == TypeSpec("varchar", None, -1)
    assert decompose_data_type("timestamp(6) with time zone") == TypeSpec(
        "timestamp", None, 6, None, "with time zone"
    )
    assert decompose_data_type("interval year to month") == TypeSpec(
        "interval", "year to month"
    )


def test_spark_type_for_mapping():
    import pyspark.sql.types as T

    assert spark_type_for("NUMBER(10,2)") == T.DecimalType(10, 2)
    assert spark_type_for("varchar(4000)") == T.StringType()
    assert spark_type_for("blob") == T.BinaryType()
    assert spark_type_for("timestamp(6) with time zone") == T.TimestampType()
    assert spark_type_for("timestamp(6)") == T.TimestampNTZType()
    assert spark_type_for("interval year to month") == T.YearMonthIntervalType()
    assert spark_type_for("interval day to second") == T.DayTimeIntervalType()
    assert spark_type_for("some_vendor_thing(3)") == T.StringType()  # lossless fallback
