"""Debezium-style CDC envelope codec: JSON change events <-> the
engine's canonical changelog schema.

Real WAL tails are rarely pre-normalized parquet: a binlog/logical-
decoding connector (Debezium being the de-facto standard) publishes one
JSON document per change with ``before``/``after`` row images, an ``op``
code (``c``reate / ``u``pdate / ``d``elete / ``r``ead-snapshot) and a
``source`` block carrying the log sequence number. The reference engine
likewise normalizes each vendor's wire format into one internal row
shape before writing (per-vendor DataTypes/parsers under
/root/reference/src/YADAMU/*/node/, e.g. the MySQL and Postgres
statement libraries); this module is that normalization layer for the
Spark engine, done once, declaratively, JVM-side.

Everything is pure Catalyst (``from_json`` / ``to_json`` / ``unbase64``
/ ``timestamp_micros``) -- no Python runs per row, so the decode step
fuses into the same whole-stage-codegen pass as the downstream
winner-per-key reduction. At 10^10 events the decode adds zero extra
shuffles and zero Python workers.

Wire conventions (matching Debezium's JSON converter):
- binary columns   -> base64 strings (Debezium ``bytes``);
- timestamp columns-> int64 epoch MICROseconds (io.debezium.time
  .MicroTimestamp) -- encoded/decoded with ``unix_micros`` /
  ``timestamp_micros``, both JVM-side and timezone-immune;
- deletes carry the full row in ``before`` (REPLICA IDENTITY FULL) and
  ``after = null``; with default replica identity only the key columns
  would be present -- the decoder only requires the key;
- ``source.lsn`` is the authoritative ordering token (the engine's
  ``lsn``); ``ts_ms`` the commit wall-clock;
- optionally the whole payload is wrapped in Kafka Connect's
  ``{"schema": ..., "payload": ...}`` envelope (``wrapped=True``).

Null-``value`` rows (Kafka tombstones emitted after a delete for log
compaction) are dropped by the decoder: the delete itself already
arrived as ``op='d'``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "encode_debezium",
    "decode_debezium",
    "debezium_value_schema",
]

#: canonical op <-> Debezium op. ``r`` (snapshot read) decodes to an
#: upsert like ``c``; unknown codes decode to themselves upper-cased so
#: the quarantine splitter downstream tags them ``bad_op`` instead of
#: this layer guessing.
_ENC_OP = {"I": "c", "U": "u", "D": "d"}


def _wire_type(dt: T.DataType, field: str) -> T.DataType:
    """JSON-side type for one payload field (see module conventions)."""
    if isinstance(dt, T.BinaryType):
        return T.StringType()  # base64
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return T.LongType()  # epoch micros
    if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
        raise ValueError(
            f"envelope payload field {field!r} has nested type {dt.simpleString()}; "
            "flatten it (or carry it as a JSON string column) before encoding"
        )
    return dt


def debezium_value_schema(payload_schema: T.StructType) -> T.StructType:
    """Spark schema of the envelope ``value`` JSON for a payload shape.

    ``payload_schema`` is the CANONICAL (engine-side) schema of one row
    image -- e.g. the page-table columns. Binary/timestamp fields are
    replaced by their wire types so ``from_json`` can parse them; the
    decoder converts back.
    """
    img = T.StructType(
        [
            T.StructField(f.name, _wire_type(f.dataType, f.name), True)
            for f in payload_schema.fields
        ]
    )
    return T.StructType(
        [
            T.StructField("before", img, True),
            T.StructField("after", img, True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                        T.StructField("db", T.StringType(), True),
                        T.StructField("table", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def _to_wire(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.BinaryType):
        return F.base64(col)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp"))
    return col


def _from_wire(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.BinaryType):
        return F.unbase64(col)
    if isinstance(dt, T.TimestampNTZType):
        return F.timestamp_micros(col).cast("timestamp_ntz")
    if isinstance(dt, T.TimestampType):
        return F.timestamp_micros(col)
    return col.cast(dt)


def encode_debezium(
    df: DataFrame,
    key: str | list[str] = "url",
    lsn_col: str = "lsn",
    op_col: str = "op",
    ts_col: str | None = "warc_ts",
    db: str = "crawl",
    table: str = "pages",
    wrapped: bool = False,
) -> DataFrame:
    """Render canonical change events as Debezium JSON envelopes.

    Returns ``(key string, value string)`` -- the Kafka record shape.
    ``key`` is the Debezium key envelope (a JSON object with one field
    per key column -- exactly how the real connectors encode a
    composite primary key); ``value`` the change envelope described in
    the module docstring. Every column except ``lsn_col``/``op_col``
    is part of the row image. Used by the fixtures (synthesize a
    realistic connector feed), by tests (round-trip proof) and as the
    mirror-out wire format.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload_cols = [c for c in df.columns if c not in (lsn_col, op_col)]
    missing = [k for k in keys if k not in payload_cols]
    if missing:
        raise ValueError(
            f"key column(s) {missing} not in payload {payload_cols}")
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    img = F.struct(
        *[_to_wire(F.col(c), dtypes[c]).alias(c) for c in payload_cols]
    )
    is_del = F.col(op_col) == "D"
    op_code = F.col(op_col)
    for canon, wire in _ENC_OP.items():
        op_code = F.when(F.col(op_col) == canon, wire).otherwise(op_code)
    ts_ms = (
        (F.unix_micros(F.col(ts_col).cast("timestamp")) / 1000).cast("long")
        if ts_col and ts_col in payload_cols
        else F.lit(None).cast("long")
    )
    value = F.struct(
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        F.struct(
            F.col(lsn_col).cast("long").alias("lsn"),
            ts_ms.alias("ts_ms"),
            F.lit(db).alias("db"),
            F.lit(table).alias("table"),
        ).alias("source"),
        op_code.alias("op"),
        ts_ms.alias("ts_ms"),
    )
    value_json = F.to_json(value)
    if wrapped:
        # Kafka Connect JsonConverter with schemas.enable=true wraps the
        # payload; the schema block itself is connector metadata the
        # decoder never reads, so a stub object keeps the wire shape
        # honest without hauling a full type description per record.
        value_json = F.concat(
            F.lit('{"schema":{"type":"struct","name":"Envelope"},"payload":'),
            value_json,
            F.lit("}"),
        )
    return df.select(
        F.to_json(F.struct(*[F.col(k).alias(k) for k in keys])).alias("key"),
        value_json.alias("value"),
    )


def decode_debezium(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
    lsn_col: str = "lsn",
    op_col: str = "op",
    wrapped: bool = False,
    table_col: str | None = None,
) -> DataFrame:
    """Normalize Debezium envelope JSON into the canonical changelog.

    Output columns: ``lsn_col``, ``op_col`` (I/U/D; unknown wire codes
    pass through upper-cased for the quarantine splitter), then the
    payload columns in ``payload_schema`` order. Row images resolve
    per IMAGE, not per field: updates read from ``after`` whenever the
    event carries one (a connector with full replica identity ships
    BOTH images, and a field set to NULL in ``after`` must decode as
    NULL -- a per-field coalesce would resurrect the before-image
    value), deletes fall back to ``before``. Tombstone records (null
    or blank ``value``) are dropped; a non-blank record whose envelope
    fails to parse -- or, in ``wrapped`` mode, whose ``$.payload`` is
    missing -- decodes to an all-NULL row so the downstream quarantine
    splitter records it (``null_key``) instead of it vanishing.

    ``table_col`` optionally surfaces ``source.table`` -- the routing
    token for schema-level replay of a multi-table topic.

    Scale: one ``from_json`` projection -- no shuffle, no Python; the
    JSON parse and every conversion below it stay inside the scan's
    codegen stage, so tailing a 10^10-event topic costs exactly the
    downstream plan plus a per-record parse.
    """
    raw = F.col(value_col)
    if wrapped:
        raw = F.get_json_object(raw, "$.payload")
    env = F.from_json(raw, debezium_value_schema(payload_schema))
    dtypes = {f.name: f.dataType for f in payload_schema.fields}
    op_wire = F.upper(env["op"])
    op = (
        F.when(env["op"].isin("c", "r"), "I")
        .when(env["op"] == "u", "U")
        .when(env["op"] == "d", "D")
        .otherwise(op_wire)
    )
    cols = [
        env["source"]["lsn"].alias(lsn_col),
        op.alias(op_col),
    ]
    if table_col is not None:
        cols.insert(0, env["source"]["table"].alias(table_col))
    image = F.when(env["after"].isNotNull(), env["after"]).otherwise(
        env["before"]
    )
    for name in payload_schema.names:
        cols.append(_from_wire(image[name], dtypes[name]).alias(name))
    # tombstones (null/blank records) are log-compaction noise; any
    # OTHER unparseable record must survive to the quarantine, so the
    # filter tests the raw record, never the extracted payload
    present = F.col(value_col).isNotNull() & (
        F.length(F.trim(F.col(value_col))) > 0
    )
    return df.filter(present).select(*cols)
