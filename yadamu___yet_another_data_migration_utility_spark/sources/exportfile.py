"""Monolithic JSON export file: the reference's signature artifact.

One JSON document ``{systemInformation, ddl, metadata, data}`` with
per-table row arrays (reference: fileDBI writer pipeline
/root/reference/src/YADAMU/file/node/fileDBI.js:404-418; document shape
and value encodings /root/reference/src/YADAMU/file/node/jsonWriter.js
:63-85 -- binary as hex text :22-26, timestamps as ISO-8601,
non-finite doubles as "NaN"/"Infinity"/"-Infinity" sentinels).

Scale honesty: a single JSON document is a COMPATIBILITY/interchange
format -- it is written by one stream no matter the engine (the
reference does exactly this). The distributed path for big data is the
staged data set (sources/staged.py: control file + parallel per-table
files). Export here streams ``toLocalIterator`` so the driver holds one
Arrow batch at a time, never the table; import materializes through
``spark.createDataFrame`` per table. Use it for schema interchange and
modest tables, not for 100 TB.

Optional ``compression="gzip"`` wraps the document in gzip (reference:
the createGzip stage, fileDBI.js:344-372).
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import json
import math
import os
import uuid
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMAT_VENDOR = "yadamu_spark_cdc"
TS_FMT = "%Y-%m-%dT%H:%M:%S.%f"


def _encode_value(v: Any, dt: T.DataType) -> Any:
    if v is None:
        return None
    if isinstance(dt, T.BinaryType):
        return bytes(v).hex()  # reference convention: hex text
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return v.strftime(TS_FMT)
    if isinstance(dt, T.DateType):
        return v.isoformat()
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Infinity" if f > 0 else "-Infinity"
        return f
    if isinstance(dt, T.DecimalType):
        return str(v)  # exact, scale-preserving
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        # nested payloads ride as JSON-native structures
        return v
    return v


def _decode_value(v: Any, dt: T.DataType) -> Any:
    if v is None:
        return None
    if isinstance(dt, T.BinaryType):
        return bytes.fromhex(v)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime.strptime(v, TS_FMT)
    if isinstance(dt, T.DateType):
        return _dt.date.fromisoformat(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        if v == "NaN":
            return float("nan")
        if v == "Infinity":
            return float("inf")
        if v == "-Infinity":
            return float("-inf")
        return float(v)
    if isinstance(dt, T.DecimalType):
        return Decimal(v)
    return v


def export_json(
    tables: dict[str, DataFrame],
    path: str,
    compression: str | None = None,
    batch_rows: int = 10_000,
) -> dict:
    """Write ONE JSON export document for ``tables``. Returns the
    metadata section. Atomic: written to a temp name, renamed last."""
    if compression not in (None, "gzip"):
        raise ValueError("compression must be None or 'gzip'")
    metadata: dict[str, Any] = {}
    for name, df in tables.items():
        metadata[name] = {
            "tableName": name,
            "columnNames": df.columns,
            "schema": df.schema.jsonValue(),
        }
    doc_head = {
        "systemInformation": {
            "vendor": FORMAT_VENDOR,
            "exportVersion": 1,
            "sessionTimeZone": "UTC",
        },
        "ddl": [],
        "metadata": metadata,
    }
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    raw = open(tmp, "wb")
    out: io.TextIOBase
    if compression == "gzip":
        out = io.TextIOWrapper(gzip.GzipFile(fileobj=raw, mode="wb"), encoding="utf-8")
    else:
        out = io.TextIOWrapper(raw, encoding="utf-8")
    try:
        head = json.dumps(doc_head)[:-1]  # strip closing brace, keep streaming
        out.write(head)
        out.write(', "data": {')
        for ti, (name, df) in enumerate(tables.items()):
            dts = [f.dataType for f in df.schema.fields]
            if ti:
                out.write(", ")
            out.write(json.dumps(name))
            out.write(": [")
            first = True
            # toLocalIterator: one partition in driver memory at a time
            for row in df.toLocalIterator():
                rec = [_encode_value(row[i], dts[i]) for i in range(len(dts))]
                if not first:
                    out.write(", ")
                out.write(json.dumps(rec))
                first = False
            out.write("]")
        out.write("}}")
        out.flush()
    finally:
        out.close()
    os.rename(tmp, path)
    return metadata


def import_json(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Read a monolithic export document back into DataFrames with the
    exact exported schemas (no inference)."""
    if path.endswith(".gz") or _is_gzip(path):
        with gzip.open(path, "rt", encoding="utf-8") as f:
            doc = json.load(f)
    else:
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
    out: dict[str, DataFrame] = {}
    for name, meta in doc["metadata"].items():
        schema = T.StructType.fromJson(meta["schema"])
        dts = [f.dataType for f in schema.fields]
        rows = [
            tuple(_decode_value(v, dt) for v, dt in zip(rec, dts))
            for rec in doc["data"].get(name, [])
        ]
        out[name] = spark.createDataFrame(rows, schema)
    return out


def _is_gzip(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == b"\x1f\x8b"
