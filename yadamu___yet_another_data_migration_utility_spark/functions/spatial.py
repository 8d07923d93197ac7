"""Spatial conversion (T3): WKB <-> WKT <-> GeoJSON recode.

The reference recodes spatial columns between WKB/EWKB hex, WKT/EWKT
and GeoJSON when source and target vendors disagree on the wire format
(/root/reference/src/YADAMU/common/yadamuSpatialLibrary.js:16-118,
a row-at-a-time wrapper over the wkx package). Here the codec is
implemented from scratch for the OGC simple-feature geometry types
(Point, LineString, Polygon, MultiPoint, MultiLineString, MultiPolygon,
GeometryCollection; 2-D coordinates) and exposed as Arrow-batched
pandas UDFs -- one Python pass per ~10k-row Arrow batch, against the
reference's per-row JS calls.

Internal interchange form is the GeoJSON object (dict). WKB is emitted
little-endian and accepted in either endianness; EWKB's SRID flag
(0x20000000, PostGIS) is accepted on read and stripped -- the SRID
travels out-of-band in table metadata, as the reference does for
non-EWKT targets. Z/M dimensions are rejected loudly rather than
silently truncated.

WKT number formatting is canonical: integral coordinates print without
a decimal point, others via repr (shortest round-trip) -- deterministic
across engines, which is what the oracle compare needs.

Scale: a narrow projection over the column -- no shuffle, no join; the
UDF cost is the codec itself, Arrow-batched.
"""

from __future__ import annotations

import json
import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf

_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}
_CODES = {v: k for k, v in _TYPES.items()}
_EWKB_SRID_FLAG = 0x20000000
_DIM_FLAGS = 0x80000000 | 0x40000000  # wkb Z / M bits (rejected)


# ----------------------------------------------------------------------
# WKB
# ----------------------------------------------------------------------


class _WkbReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geometry(self) -> dict:
        bo = "<" if self.buf[self.pos] == 1 else ">"
        self.pos += 1
        (code,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        if code & _DIM_FLAGS or (code % 1000) != code and code // 1000 in (1, 2, 3):
            raise ValueError("Z/M geometries not supported (2-D codec)")
        if code & _EWKB_SRID_FLAG:  # EWKB: skip the embedded SRID
            code &= ~_EWKB_SRID_FLAG
            self.pos += 4
        name = _TYPES.get(code)
        if name is None:
            raise ValueError(f"unsupported WKB geometry code {code}")
        if name == "GeometryCollection":
            (n,) = struct.unpack_from(bo + "I", self.buf, self.pos)
            self.pos += 4
            return {"type": name, "geometries": [self.geometry() for _ in range(n)]}
        return {"type": name, "coordinates": self._coords(name, bo)}

    def _point(self, bo: str) -> list[float]:
        x, y = struct.unpack_from(bo + "dd", self.buf, self.pos)
        self.pos += 16
        return [x, y]

    def _ring(self, bo: str) -> list[list[float]]:
        (n,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        return [self._point(bo) for _ in range(n)]

    def _coords(self, name: str, bo: str):
        if name == "Point":
            return self._point(bo)
        if name == "LineString":
            return self._ring(bo)
        if name == "Polygon":
            (n,) = struct.unpack_from(bo + "I", self.buf, self.pos)
            self.pos += 4
            return [self._ring(bo) for _ in range(n)]
        # Multi*: each element is a full nested WKB geometry
        (n,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        return [self.geometry()["coordinates"] for _ in range(n)]


def wkb_to_geom(buf: bytes) -> dict:
    return _WkbReader(bytes(buf)).geometry()


def geom_to_wkb(g: dict) -> bytes:
    name = g["type"]
    code = _CODES[name]
    out = [b"\x01", struct.pack("<I", code)]
    if name == "GeometryCollection":
        parts = g["geometries"]
        out.append(struct.pack("<I", len(parts)))
        out.extend(geom_to_wkb(p) for p in parts)
        return b"".join(out)
    c = g["coordinates"]
    if name == "Point":
        out.append(struct.pack("<dd", *c))
    elif name == "LineString":
        out.append(_pack_ring(c))
    elif name == "Polygon":
        out.append(struct.pack("<I", len(c)))
        out.extend(_pack_ring(r) for r in c)
    else:  # Multi*: elements are nested full geometries
        member = name[5:]  # Point / LineString / Polygon
        out.append(struct.pack("<I", len(c)))
        out.extend(geom_to_wkb({"type": member, "coordinates": e}) for e in c)
    return b"".join(out)


def _pack_ring(ring) -> bytes:
    return struct.pack("<I", len(ring)) + b"".join(
        struct.pack("<dd", *pt) for pt in ring
    )


# ----------------------------------------------------------------------
# WKT
# ----------------------------------------------------------------------


def _num(x: float) -> str:
    return str(int(x)) if float(x).is_integer() and abs(x) < 1e15 else repr(float(x))


def _wkt_pt(pt) -> str:
    return f"{_num(pt[0])} {_num(pt[1])}"


def geom_to_wkt(g: dict) -> str:
    name = g["type"]
    if name == "GeometryCollection":
        inner = ", ".join(geom_to_wkt(p) for p in g["geometries"])
        return f"GEOMETRYCOLLECTION ({inner})"
    c = g["coordinates"]
    u = name.upper()
    if name == "Point":
        return f"POINT ({_wkt_pt(c)})"
    if name == "LineString":
        return f"LINESTRING ({', '.join(_wkt_pt(p) for p in c)})"
    if name == "Polygon":
        rings = ", ".join(f"({', '.join(_wkt_pt(p) for p in r)})" for r in c)
        return f"POLYGON ({rings})"
    if name == "MultiPoint":
        return f"MULTIPOINT ({', '.join(f'({_wkt_pt(p)})' for p in c)})"
    if name == "MultiLineString":
        lines = ", ".join(f"({', '.join(_wkt_pt(p) for p in ln)})" for ln in c)
        return f"MULTILINESTRING ({lines})"
    if name == "MultiPolygon":
        polys = ", ".join(
            "(" + ", ".join(f"({', '.join(_wkt_pt(p) for p in r)})" for r in poly) + ")"
            for poly in c
        )
        return f"MULTIPOLYGON ({polys})"
    raise ValueError(f"unsupported geometry type {u}")


class _WktParser:
    def __init__(self, text: str):
        self.t = text
        self.pos = 0

    def _skip(self):
        while self.pos < len(self.t) and self.t[self.pos].isspace():
            self.pos += 1

    def _word(self) -> str:
        self._skip()
        start = self.pos
        while self.pos < len(self.t) and (self.t[self.pos].isalpha()):
            self.pos += 1
        return self.t[start:self.pos].upper()

    def _expect(self, ch: str):
        self._skip()
        if self.pos >= len(self.t) or self.t[self.pos] != ch:
            raise ValueError(f"malformed WKT at {self.pos}: expected {ch!r}")
        self.pos += 1

    def _peek(self) -> str:
        self._skip()
        return self.t[self.pos] if self.pos < len(self.t) else ""

    def _number(self) -> float:
        self._skip()
        start = self.pos
        while self.pos < len(self.t) and self.t[self.pos] not in " ,()":
            self.pos += 1
        return float(self.t[start:self.pos])

    def _point(self) -> list[float]:
        return [self._number(), self._number()]

    def _seq(self, item):
        self._expect("(")
        out = [item()]
        while self._peek() == ",":
            self.pos += 1
            out.append(item())
        self._expect(")")
        return out

    def _paren_point(self) -> list[float]:
        # MULTIPOINT accepts both (1 2) and bare 1 2 member syntax
        if self._peek() == "(":
            self._expect("(")
            p = self._point()
            self._expect(")")
            return p
        return self._point()

    def geometry(self) -> dict:
        w = self._word()
        if w == "POINT":
            self._expect("(")
            c = self._point()
            self._expect(")")
            return {"type": "Point", "coordinates": c}
        if w == "LINESTRING":
            return {"type": "LineString", "coordinates": self._seq(self._point)}
        if w == "POLYGON":
            return {"type": "Polygon",
                    "coordinates": self._seq(lambda: self._seq(self._point))}
        if w == "MULTIPOINT":
            return {"type": "MultiPoint", "coordinates": self._seq(self._paren_point)}
        if w == "MULTILINESTRING":
            return {"type": "MultiLineString",
                    "coordinates": self._seq(lambda: self._seq(self._point))}
        if w == "MULTIPOLYGON":
            return {
                "type": "MultiPolygon",
                "coordinates": self._seq(
                    lambda: self._seq(lambda: self._seq(self._point))
                ),
            }
        if w == "GEOMETRYCOLLECTION":
            return {"type": "GeometryCollection",
                    "geometries": self._seq(self.geometry)}
        raise ValueError(f"unsupported WKT geometry {w!r}")


def wkt_to_geom(text: str) -> dict:
    return _WktParser(text).geometry()


# ----------------------------------------------------------------------
# GeoJSON + column-level recode
# ----------------------------------------------------------------------


def geom_to_geojson(g: dict) -> str:
    return json.dumps(g, separators=(",", ":"))


def geojson_to_geom(text: str) -> dict:
    g = json.loads(text)
    if g.get("type") not in _CODES:
        raise ValueError(f"unsupported GeoJSON type {g.get('type')!r}")
    return g


_DECODE = {"wkb": wkb_to_geom, "wkt": wkt_to_geom, "geojson": geojson_to_geom}
_ENCODE = {"wkb": geom_to_wkb, "wkt": geom_to_wkt, "geojson": geom_to_geojson}
SPATIAL_FORMATS = tuple(_DECODE)


def spatial_recode(c: Column, source_format: str, target_format: str) -> Column:
    """Column-level spatial recode (the reference's recodeSpatialColumns,
    yadamuSpatialLibrary.js:70-118): wkb|wkt|geojson -> wkb|wkt|geojson.
    NULLs pass through; malformed input raises (ON_ERROR policy routes
    the row to quarantine upstream, operators.apply)."""
    if source_format not in _DECODE or target_format not in _ENCODE:
        raise ValueError(f"formats must be one of {SPATIAL_FORMATS}")
    dec, enc = _DECODE[source_format], _ENCODE[target_format]
    ret = "binary" if target_format == "wkb" else "string"

    @pandas_udf(ret)
    def recode(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else enc(dec(v)))

    return recode(c)


def recode_spatial_columns(
    df: DataFrame, columns: list[str], source_format: str, target_format: str
) -> DataFrame:
    """Recode every named spatial column in one projection pass."""
    out = df
    for name in columns:
        out = out.withColumn(name, spatial_recode(out[name], source_format,
                                                  target_format))
    return out
