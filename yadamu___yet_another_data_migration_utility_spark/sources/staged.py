"""Staged file dataset: UNLOAD / LOAD with a control file.

The reference's loader DBI materializes a schema as a *staged data set*:
a control file naming per-table metadata + data files, data as CSV/JSON
per table (control file shape:
/root/reference/src/YADAMU/loader/node/loaderDBI.js:321
``{settings, systemInformation, metadata, data}``; CSV value encoding:
/root/reference/src/YADAMU/common/yadamuWriter.js:346-465 -- hex for
binary, ISO-8601 UTC for timestamps, quote-doubling; read-side decode:
/root/reference/src/YADAMU/loader/node/csvTransform.js:45-57 -- '' ->
NULL, hex -> Buffer).

Spark-first re-expression: ``df.write.csv/json/parquet`` per table +
a JSON control file carrying the exact Spark schema, written LAST so a
complete control file implies complete data (the same commit-marker
pattern as LakeTable's ``_current``). Type fidelity rules:

- binary columns -> lowercase hex text on CSV write, ``unhex`` on read
  (the reference's exact convention);
- timestamps -> microsecond ISO-8601, parsed back with the same format;
- empty string vs NULL disambiguated with an explicit nullValue token
  (CSV cannot natively distinguish them -- the reference maps '' to
  NULL, losing empty strings; we keep both lossless);
- JSON/parquet formats need no conversion (schema-on-read from the
  control file).

Scale: per-table writes are plain distributed Spark jobs; the control
file is O(tables), never O(rows). On S3 the LOAD side reads with the
stored schema -- no inference scan over 100 TB.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTROL_FILE = "control.json"
#: token for SQL NULL in CSV files; empty string stays '' (lossless,
#: unlike the reference's EMPTY_STRING_IS_NULL coercion)
NULL_TOKEN = "\\N"
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _csv_encode(df: DataFrame) -> tuple[DataFrame, list[str]]:
    """Binary -> hex text (reference convention, jsonWriter.js:22-26)."""
    bin_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.BinaryType)]
    for c in bin_cols:
        df = df.withColumn(c, F.lower(F.hex(F.col(c))))
    return df, bin_cols


def unload(
    tables: dict[str, DataFrame],
    root: str,
    fmt: str = "parquet",
    compression: str | None = None,
    mappings: dict | None = None,
) -> dict:
    """Write a staged data set: data files per table + control file.

    ``fmt`` in {parquet, csv, json}. ``compression`` is passed straight
    to the Spark writer (csv/json: gzip|bzip2|deflate|...; parquet:
    zstd|snappy|gzip) -- the reference's gzip pipeline stage
    (/root/reference/src/YADAMU/file/node/fileDBI.js:344-372) is one
    writer option here, applied per data file so reads stay parallel.
    ``mappings`` renames tables/columns on the way out
    (operators.mapping; reference yadamuDBI.js:497-653); the control
    file records the *mapped* identifiers plus the mapping itself so a
    round-trip can invert it. Returns the control dict."""
    from ..operators.mapping import map_columns, map_table_name

    if fmt not in ("parquet", "csv", "json"):
        raise ValueError(f"unsupported staged format: {fmt}")
    os.makedirs(root, exist_ok=True)
    control: dict = {
        "format_version": 1,
        "data_format": fmt,
        "compression": compression,
        "identifier_mappings": mappings or {},
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "tables": {},
    }
    for src_name, df in tables.items():
        name = map_table_name(mappings, src_name)
        df = map_columns(df, mappings, src_name)
        path = os.path.join(root, "data", name)
        schema = df.schema
        bin_cols: list[str] = []
        if fmt == "csv":
            df, bin_cols = _csv_encode(df)
            w = (
                df.write.mode("overwrite")
                .option("header", "true")
                .option("nullValue", NULL_TOKEN)
                # default emptyValue writes '' as a QUOTED "" -- the only
                # encoding the reader can distinguish from NULL
                .option("timestampFormat", TS_FMT)
                .option("timestampNTZFormat", TS_FMT)
            )
            if compression:
                w = w.option("compression", compression)
            w.csv(path)
        elif fmt == "json":
            w = (df.write.mode("overwrite")
                 .option("timestampFormat", TS_FMT)
                 .option("timestampNTZFormat", TS_FMT))
            if compression:
                w = w.option("compression", compression)
            w.json(path)
        else:
            w = df.write.mode("overwrite")
            if compression:
                w = w.option("compression", compression)
            w.parquet(path)
        control["tables"][name] = {
            "path": os.path.join("data", name),
            "schema": schema.jsonValue(),
            "hex_encoded_columns": bin_cols,
        }
    # control file written LAST = commit marker (atomic rename)
    tmp = os.path.join(root, f".{CONTROL_FILE}.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(control, f, indent=2)
    os.rename(tmp, os.path.join(root, CONTROL_FILE))
    return control


def load_staged(
    spark: SparkSession, root: str, mappings: dict | None = None
) -> dict[str, DataFrame]:
    """Read a staged data set back with full type fidelity (schema from
    the control file -- no inference). ``mappings`` renames
    tables/columns on the way in (pass ``operators.mapping.invert`` of
    the unload mapping to round-trip to the original identifiers)."""
    from ..operators.mapping import map_columns, map_table_name

    with open(os.path.join(root, CONTROL_FILE)) as f:
        control = json.load(f)
    fmt = control["data_format"]
    out: dict[str, DataFrame] = {}
    for name, meta in control["tables"].items():
        schema = T.StructType.fromJson(meta["schema"])
        path = os.path.join(root, meta["path"])
        if fmt == "csv":
            # read hex-encoded binary as string first, then unhex
            read_schema = T.StructType(
                [
                    T.StructField(f.name, T.StringType() if f.name in meta["hex_encoded_columns"] else f.dataType, f.nullable)
                    for f in schema.fields
                ]
            )
            # multiLine: the writer quotes embedded newlines, so the
            # reader must not split records on raw \n. Scale note:
            # multiLine CSV files are not splittable (one task per
            # file) -- the unload side already writes many files per
            # table, which restores read parallelism.
            df = (
                spark.read.schema(read_schema)
                .option("header", "true")
                .option("multiLine", "true")
                .option("nullValue", NULL_TOKEN)
                .option("timestampFormat", TS_FMT)
                .option("timestampNTZFormat", TS_FMT)
                .csv(path)
            )
            for c in meta["hex_encoded_columns"]:
                df = df.withColumn(c, F.unhex(F.upper(F.col(c))))
        elif fmt == "json":
            df = (spark.read.schema(schema)
                  .option("timestampFormat", TS_FMT)
                  .option("timestampNTZFormat", TS_FMT).json(path))
        else:
            df = spark.read.schema(schema).parquet(path)
        out[map_table_name(mappings, name)] = map_columns(df, mappings, name)
    return out
