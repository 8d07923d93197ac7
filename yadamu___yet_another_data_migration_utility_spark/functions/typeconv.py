"""Canonical type decomposition + interval conversions (T4 / D-layer).

Reference capabilities re-expressed:

- ``decompose_data_type`` -- parse a vendor DDL type string
  (``"NUMBER(10,2)"``, ``"varchar(max)"``, ``"timestamp(6) with time
  zone"``) into ``{type, type_qualifier, length, scale, qualifier}``
  (/root/reference/src/YADAMU/common/yadamuLibrary.js:201-229), and map
  the canonical names onto Spark types -- the seam a SECOND source
  schema plugs into (the vendor matrices, e.g.
  /root/reference/src/YADAMU/vertica/node/statementGenerator.js:76-367,
  reduce to rows of this mapping).
- Interval <-> ISO-8601 -- the reference serializes vendor intervals as
  ISO-8601 durations (yadamuLibrary.js:378-387 intervalYearMonthTo8601 /
  intervalDaySecondTo8601; :389-460 parse8601Interval). Here both
  directions are PURE Catalyst expressions over Spark's ANSI interval
  types (extract / make_ym_interval / make_dt_interval + string
  algebra), so conversion stays inside whole-stage codegen -- no UDF.

Scale: decompose is driver-side DDL work (O(columns)); the interval
converters are per-row codegen'd expressions that fuse into the scan
projection like any cast.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------------------
# canonical type decomposition
# ----------------------------------------------------------------------


@dataclass(frozen=True)
class TypeSpec:
    """Decomposed vendor type: ``NUMBER(10,2)`` -> (number, None, 10, 2).
    ``length=-1`` encodes ``(max)`` (the reference's convention)."""

    type: str
    type_qualifier: str | None = None
    length: int | None = None
    scale: int | None = None
    qualifier: str | None = None  # text after the closing paren


def decompose_data_type(data_type: str) -> TypeSpec:
    """Parse ``name[ qualifier words][(length[,scale])[ suffix]]``.
    Mirrors the reference's split semantics (yadamuLibrary.js:201-229):
    the first word is the type, remaining pre-paren words are the type
    qualifier ('with time zone'), ``max`` maps to length -1."""
    head, _, paren = data_type.strip().partition("(")
    words = head.strip().split()
    if not words:
        raise ValueError(f"empty data type: {data_type!r}")
    type_name = words[0].lower()
    type_qualifier = " ".join(words[1:]).lower() or None
    length = scale = None
    qualifier = None
    if paren:
        inside, _, suffix = paren.partition(")")
        qualifier = suffix.strip().lower() or None
        parts = [p.strip() for p in inside.split(",")]
        if len(parts) > 1:
            length, scale = int(parts[0]), int(parts[1])
        elif parts[0]:
            length = -1 if parts[0].lower() == "max" else int(parts[0])
    return TypeSpec(type_name, type_qualifier, length, scale, qualifier)


#: canonical lowercase type name -> Spark type factory (spec -> DataType).
#: Covers the interchange types the export/staged formats carry; a new
#: vendor contributes rows here, nothing else changes (_align does the
#: cast). Unknown names fall back to string -- lossless, re-castable.
_TYPE_MAP = {
    "boolean": lambda s: T.BooleanType(),
    "tinyint": lambda s: T.ByteType(),
    "smallint": lambda s: T.ShortType(),
    "int": lambda s: T.IntegerType(),
    "integer": lambda s: T.IntegerType(),
    "bigint": lambda s: T.LongType(),
    "float": lambda s: T.FloatType(),
    "real": lambda s: T.FloatType(),
    "double": lambda s: T.DoubleType(),
    "number": lambda s: (
        T.DecimalType(s.length, s.scale or 0)
        if s.length and s.length > 0 else T.DecimalType(38, 18)
    ),
    "decimal": lambda s: (
        T.DecimalType(s.length, s.scale or 0)
        if s.length and s.length > 0 else T.DecimalType(38, 18)
    ),
    "numeric": lambda s: (
        T.DecimalType(s.length, s.scale or 0)
        if s.length and s.length > 0 else T.DecimalType(38, 18)
    ),
    "char": lambda s: T.StringType(),
    "nchar": lambda s: T.StringType(),
    "varchar": lambda s: T.StringType(),
    "nvarchar": lambda s: T.StringType(),
    "varchar2": lambda s: T.StringType(),
    "text": lambda s: T.StringType(),
    "clob": lambda s: T.StringType(),
    "json": lambda s: T.StringType(),
    "xml": lambda s: T.StringType(),
    "binary": lambda s: T.BinaryType(),
    "varbinary": lambda s: T.BinaryType(),
    "blob": lambda s: T.BinaryType(),
    "raw": lambda s: T.BinaryType(),
    "bytea": lambda s: T.BinaryType(),
    "date": lambda s: T.DateType(),
    "timestamp": lambda s: (
        T.TimestampType()
        if (s.type_qualifier or "").startswith("with time zone")
        or (s.qualifier or "").startswith("with time zone")
        else T.TimestampNTZType()
    ),
    "datetime": lambda s: T.TimestampNTZType(),
    "interval": lambda s: (
        T.YearMonthIntervalType()
        if "year" in (s.type_qualifier or "") or "month" in (s.type_qualifier or "")
        else T.DayTimeIntervalType()
    ),
}


def spark_type_for(data_type: str | TypeSpec) -> T.DataType:
    """Canonical vendor type -> Spark type (unknown -> string)."""
    spec = (
        data_type if isinstance(data_type, TypeSpec) else decompose_data_type(data_type)
    )
    factory = _TYPE_MAP.get(spec.type)
    return factory(spec) if factory else T.StringType()


# ----------------------------------------------------------------------
# interval <-> ISO-8601 (pure Catalyst expressions)
# ----------------------------------------------------------------------


def interval_ym_to_iso8601(c: Column) -> Column:
    """YearMonthIntervalType -> 'P{y}Y{m}M' (sign prefix '-' when
    negative; both components non-negative in the text, like the
    reference's year-month encoding)."""
    months = c.cast("int")  # Spark's total-months view of a YM interval
    sign = F.when(months < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(months)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(sign, F.lit("P"), (a / 12).cast("long").cast("string"),
                 F.lit("Y"), (a % 12).cast("string"), F.lit("M"))
    )


def interval_dt_to_iso8601(c: Column) -> Column:
    """DayTimeIntervalType -> 'P{d}DT{h}H{m}M{s[.ffffff]}S' (the
    reference's day-second encoding, with its D-component typo fixed
    and fractional seconds preserved at full µs precision)."""
    d = F.extract(F.lit("DAY"), c)
    h = F.extract(F.lit("HOUR"), c)
    mi = F.extract(F.lit("MINUTE"), c)
    s = F.extract(F.lit("SECOND"), c)  # decimal, carries fractional µs
    neg = (d < 0) | (h < 0) | (mi < 0) | (s < 0)
    sign = F.when(neg, F.lit("-")).otherwise(F.lit(""))
    sec_txt = F.regexp_replace(
        F.regexp_replace(F.abs(s).cast("string"), "0+$", ""), r"\.$", ""
    )
    d, h, mi = F.abs(d), F.abs(h), F.abs(mi)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            sign, F.lit("P"), d.cast("string"), F.lit("DT"),
            h.cast("string"), F.lit("H"), mi.cast("string"), F.lit("M"),
            sec_txt, F.lit("S"),
        )
    )


_ISO_RE = (
    r"^(-?)P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def iso8601_to_interval_ym(c: Column) -> Column:
    """'P{y}Y{m}M' (either component optional, '-' prefix) ->
    YearMonthIntervalType. Pure regexp_extract + make_ym_interval."""
    neg = F.when(F.regexp_extract(c, _ISO_RE, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
    y = F.coalesce(F.nullif(F.regexp_extract(c, _ISO_RE, 2), F.lit("")), F.lit("0"))
    m = F.coalesce(F.nullif(F.regexp_extract(c, _ISO_RE, 3), F.lit("")), F.lit("0"))
    return F.make_ym_interval(neg * y.cast("int"), neg * m.cast("int"))


def iso8601_to_interval_dt(c: Column) -> Column:
    """'P{d}DT{h}H{m}M{s}S' (components optional, weeks folded to days,
    '-' prefix, fractional seconds) -> DayTimeIntervalType."""
    def grp(i: int) -> Column:
        return F.coalesce(
            F.nullif(F.regexp_extract(c, _ISO_RE, i), F.lit("")), F.lit("0")
        )

    neg = F.when(F.regexp_extract(c, _ISO_RE, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
    days = grp(5).cast("int") + grp(4).cast("int") * 7
    return F.make_dt_interval(
        neg * days,
        neg * grp(6).cast("int"),
        neg * grp(7).cast("int"),
        neg.cast("decimal(1,0)") * grp(8).cast("decimal(18,6)"),
    )


# parse8601Interval's classification (yadamuLibrary.js:389-460): which
# interval family does an ISO duration belong to?
def classify_iso8601(text: str) -> str:
    """'YM' when the duration carries year/month components, else 'DMS'
    -- the reference's routing rule for choosing a target column type."""
    m = re.match(_ISO_RE, text)
    if not m:
        raise ValueError(f"not an ISO-8601 duration: {text!r}")
    return "YM" if (m.group(2) or m.group(3)) else "DMS"
