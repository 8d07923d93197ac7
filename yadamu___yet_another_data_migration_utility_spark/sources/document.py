"""Document-collection source/sink: the reference's MongoDB path.

The reference treats a Mongo collection as a table of documents and
offers two transformations (mongoDBI.js:105-119):

- ``DOCUMENT_TO_ARRAY`` (read): each document becomes a relational row
  -- top-level keys to columns (mongoParser.js:56);
- ``ARRAY_TO_DOCUMENT`` (write): each relational row becomes one
  document keyed by column names (statementGenerator.js:78-98).

Spark-first re-expression: a collection is a directory of JSON-lines
text files -- each line one document, ``_id`` a field inside the
document, exactly Mongo's layout -- plus a tiny ``collection.json``
sidecar recording the exact Spark row schema when the collection was
produced from typed rows. The transformations are single narrow
projections:

- ``rows_to_documents``: ``F.to_json(F.struct(*))`` -- JVM-side, no
  shuffle, whole-stage codegen;
- ``documents_to_rows``: ``F.from_json`` with an explicit schema; a
  schemaless collection (the true Mongo case) reads via
  ``spark.read.json`` distributed inference.

Scale: JSON-lines text is splittable, so a 100 TB collection reads with
one task per split; inference is Spark's own distributed sampler; the
sidecar is O(1). Timestamps are microsecond ISO-8601 (same convention
as ``staged.py``); with the stored schema the round-trip is lossless
(nulls dropped by ``to_json`` come back as nulls from ``from_json``).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .staged import TS_FMT

COLLECTION_FILE = "collection.json"
ID_COL = "_id"
DOC_COL = "document"
_JSON_OPTS = {
    "timestampFormat": TS_FMT,
    # parquet timestamps read as TIMESTAMP_NTZ in Spark 4; to_json/
    # from_json format those via this SEPARATE option (default is
    # millisecond precision -- silently lossy without it)
    "timestampNTZFormat": TS_FMT,
}


def rows_to_documents(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """ARRAY_TO_DOCUMENT: one JSON document (string) per row.

    Returns a single-column ``document`` DataFrame. ``id_col`` names the
    column doubling as Mongo's ``_id``; omitted, a deterministic ``_id``
    is derived as the md5 of the row's document text (stable across
    runs, unlike ``monotonically_increasing_id``). Narrow -- no shuffle.
    """
    body = F.to_json(F.struct(*[F.col(c) for c in df.columns]), _JSON_OPTS)
    if id_col is not None:
        if id_col not in df.columns:
            raise ValueError(f"id_col {id_col!r} not in {df.columns}")
        doc = body
    else:
        # inject the derived _id as a proper document field
        doc = F.to_json(
            F.struct(F.md5(body).alias(ID_COL),
                     *[F.col(c) for c in df.columns]),
            _JSON_OPTS,
        )
    return df.select(doc.alias(DOC_COL))


def documents_to_rows(df: DataFrame, schema: T.StructType,
                      doc_col: str = DOC_COL) -> DataFrame:
    """DOCUMENT_TO_ARRAY with an explicit schema: top-level document
    keys become typed columns (mongoParser.js:56). Narrow, codegen'd."""
    parsed = df.select(F.from_json(F.col(doc_col), schema, _JSON_OPTS).alias("d"))
    return parsed.select("d.*")


def write_collection(df: DataFrame, root: str, id_col: str | None = None,
                     compression: str | None = None) -> dict:
    """Write a DataFrame as a document collection.

    A ``(document)``-shaped input is written as-is (document
    passthrough, the reference's Mongo-to-Mongo copy, schemaless);
    anything else goes through ARRAY_TO_DOCUMENT and the sidecar
    records the exact row schema for a lossless typed read-back.
    Sidecar written LAST = commit marker. Returns the sidecar dict."""
    is_docs = df.columns == [DOC_COL]
    row_schema = None if is_docs else df.schema.jsonValue()
    docs = df if is_docs else rows_to_documents(df, id_col=id_col)
    data_path = os.path.join(root, "data")
    w = docs.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(data_path)
    side = {
        "format_version": 1,
        "data_path": "data",
        "compression": compression,
        "id_column": id_col,
        "row_schema": row_schema,  # None => schemaless collection
    }
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".{COLLECTION_FILE}.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(side, f, indent=2)
    os.rename(tmp, os.path.join(root, COLLECTION_FILE))
    return side


def read_collection(spark: SparkSession, root: str,
                    mode: str = "rows") -> DataFrame:
    """Read a document collection back.

    ``mode="documents"``: the Mongo shape ``(_id, document)`` -- ``_id``
    pulled from inside the document, payload untouched.
    ``mode="rows"``: DOCUMENT_TO_ARRAY -- with the sidecar's stored row
    schema when present (lossless, no inference scan over 100 TB), else
    Spark's distributed JSON inference (the schemaless Mongo case).
    """
    with open(os.path.join(root, COLLECTION_FILE)) as f:
        side = json.load(f)
    path = os.path.join(root, side["data_path"])
    if mode == "documents":
        lines = spark.read.text(path)
        id_field = side["id_column"] or ID_COL
        return lines.select(
            F.get_json_object("value", f"$.{id_field}").alias(ID_COL),
            F.col("value").alias(DOC_COL),
        )
    if mode != "rows":
        raise ValueError(f"mode must be 'documents' or 'rows', got {mode!r}")
    if side["row_schema"] is not None:
        schema = T.StructType.fromJson(side["row_schema"])
        lines = spark.read.text(path)
        return documents_to_rows(lines, schema, doc_col="value")
    # schemaless: each line IS a JSON document -- distributed inference
    return spark.read.option("timestampFormat", TS_FMT).json(path)
