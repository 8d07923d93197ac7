"""Type-conversion catalog queries: interval ISO-8601 and spatial
recode, each oracle-checked end-to-end.

These drive the T3/T4 scalar transforms (functions/typeconv.py,
functions/spatial.py) through real table data so the driver's DuckDB
compare pins their text encodings exactly -- the reference's
serialization contracts (yadamuLibrary.js:378-460 intervals,
yadamuSpatialLibrary.js recode matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.spatial import spatial_recode
from ..functions.typeconv import interval_dt_to_iso8601, iso8601_to_interval_dt
from .catalog import _register, load

_EPOCH = "1995-01-01 00:00:00"


@_register(
    "interval_iso8601",
    f"""
    WITH iv AS (
      SELECT l_orderkey,
             date_diff('second', TIMESTAMP '{_EPOCH}', l_shipdate) AS total_s
      FROM lineitem
    ),
    enc AS (
      SELECT l_orderkey,
             concat(
               CASE WHEN total_s < 0 THEN '-' ELSE '' END,
               'P', CAST(abs(total_s) // 86400 AS VARCHAR),
               'DT', CAST((abs(total_s) % 86400) // 3600 AS VARCHAR),
               'H', CAST((abs(total_s) % 3600) // 60 AS VARCHAR),
               'M', CAST(abs(total_s) % 60 AS VARCHAR), 'S'
             ) AS iso_duration
      FROM iv
    )
    SELECT iso_duration,
           COUNT(*) AS n,
           CAST(MIN(l_orderkey) AS BIGINT) AS first_order,
           TRUE AS all_roundtrip
    FROM enc
    GROUP BY iso_duration
    """,
)
def interval_iso8601(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 interval conversion, oracle-checked: each lineitem's shipping
    offset from a fixed epoch becomes a DayTimeIntervalType, serialized
    to ISO-8601 ('P{d}DT{h}H{m}M{s}S') and parsed BACK -- all_roundtrip
    proves iso8601_to_interval_dt(interval_dt_to_iso8601(x)) == x on
    every row (a single failing row flips the aggregate and the oracle
    hash). The encoding itself is pinned by DuckDB building the same
    text arithmetically.

    Scale: the per-row side is a pure codegen'd projection
    (extract/concat) + one algebraic groupBy; the regex-heavy general
    ISO parser then runs only on the DISTINCT encoded strings (post-
    aggregate, ~thousands not millions) -- encode is injective on this
    domain, so decode(encode(x)) == x on every row iff
    encode(decode(s)) == s on every distinct encoded s."""
    l = load(spark, sf_dir, "lineitem")
    iv = (F.col("l_shipdate") - F.lit(_EPOCH).cast("timestamp")).alias("iv")
    enc = l.select(
        "l_orderkey", interval_dt_to_iso8601(iv).alias("iso_duration")
    )
    grouped = enc.groupBy("iso_duration").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_orderkey").alias("first_order"),
    )
    reenc = interval_dt_to_iso8601(iso8601_to_interval_dt(F.col("iso_duration")))
    return grouped.withColumn("all_roundtrip", reenc == F.col("iso_duration"))


_GEO_SQL = """
    WITH pts AS (
      SELECT c_custkey,
             c_custkey % 3 AS shape,
             CAST(c_custkey % 360 - 180 AS BIGINT) AS x,
             CAST((c_custkey * 7) % 180 - 90 AS BIGINT) AS y
      FROM customer
    )
    SELECT c_custkey,
           CASE shape
             WHEN 0 THEN concat('POINT (', x, ' ', y, ')')
             WHEN 1 THEN concat('LINESTRING (', x, ' ', y, ', ', x + 1, ' ', y + 1, ')')
             ELSE concat('POLYGON ((', x, ' ', y, ', ', x + 1, ' ', y, ', ',
                         x + 1, ' ', y + 1, ', ', x, ' ', y, '))')
           END AS wkt_out,
           CASE shape
             WHEN 0 THEN concat('{"type":"Point","coordinates":[',
                                x, '.0,', y, '.0]}')
             WHEN 1 THEN concat('{"type":"LineString","coordinates":[[',
                                x, '.0,', y, '.0],[', x + 1, '.0,', y + 1, '.0]]}')
             ELSE concat('{"type":"Polygon","coordinates":[[[',
                         x, '.0,', y, '.0],[', x + 1, '.0,', y, '.0],[',
                         x + 1, '.0,', y + 1, '.0],[', x, '.0,', y, '.0]]]}')
           END AS geojson
    FROM pts
"""


@_register("spatial_recode", _GEO_SQL)
def spatial_recode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 spatial conversion, oracle-checked: deterministic integral
    geometries (point/linestring/polygon per customer) are built as
    WKT, then pushed through the codec chain
    WKT -> WKB -> GeoJSON -> WKT (four directions of the reference's
    recode matrix, yadamuSpatialLibrary.js:70-118). The oracle builds
    the expected final WKT *and* the intermediate GeoJSON textually, so
    any encode/decode drift in any hop breaks the hash.

    Scale: narrow projection; three Arrow-batched UDF hops (the codec
    is the work -- the reference pays the same per value, per row)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    x = (F.col("c_custkey") % 360 - 180).cast("long").cast("string")
    y = ((F.col("c_custkey") * 7) % 180 - 90).cast("long").cast("string")
    x1 = ((F.col("c_custkey") % 360 - 180) + 1).cast("long").cast("string")
    y1 = (((F.col("c_custkey") * 7) % 180 - 90) + 1).cast("long").cast("string")
    shape = F.col("c_custkey") % 3
    wkt_in = (
        F.when(shape == 0, F.concat(F.lit("POINT ("), x, F.lit(" "), y, F.lit(")")))
        .when(
            shape == 1,
            F.concat(F.lit("LINESTRING ("), x, F.lit(" "), y, F.lit(", "),
                     x1, F.lit(" "), y1, F.lit(")")),
        )
        .otherwise(
            F.concat(F.lit("POLYGON (("), x, F.lit(" "), y, F.lit(", "),
                     x1, F.lit(" "), y, F.lit(", "),
                     x1, F.lit(" "), y1, F.lit(", "),
                     x, F.lit(" "), y, F.lit("))")),
        )
    )
    staged = c.select("c_custkey", wkt_in.alias("wkt_in"))
    wkb = spatial_recode(F.col("wkt_in"), "wkt", "wkb")
    staged = staged.select("c_custkey", wkb.alias("wkb"))
    gj = spatial_recode(F.col("wkb"), "wkb", "geojson")
    staged = staged.select("c_custkey", gj.alias("geojson"))
    out_wkt = spatial_recode(F.col("geojson"), "geojson", "wkt")
    return staged.select("c_custkey", out_wkt.alias("wkt_out"), "geojson")
