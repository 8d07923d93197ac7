"""Tests for the document-collection source (S8, ref mongoDBI.js
DOCUMENT_TO_ARRAY / ARRAY_TO_DOCUMENT) and the operation trace log
(M2, ref yadamuDBI.js:243-251 sqlTrace)."""

from __future__ import annotations

import datetime
import json
import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from yadamu___yet_another_data_migration_utility_spark.operators import trace
from yadamu___yet_another_data_migration_utility_spark.sources.document import (
    DOC_COL,
    read_collection,
    rows_to_documents,
    write_collection,
)


def _sample(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ])
    rows = [
        (1, "alpha", 1.5, datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
         json.dumps({"k": 7})),
        (2, 'quo"te,comma', -0.25, datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
         None),
        (3, None, 3.0000000000000004, None, json.dumps({"k": None})),
    ]
    return spark.createDataFrame(rows, schema)


def test_document_roundtrip_typed(spark, tmp_path):
    df = _sample(spark)
    root = str(tmp_path / "coll")
    side = write_collection(df, root, id_col="id")
    assert side["row_schema"] is not None
    back = read_collection(spark, root, mode="rows")
    assert back.schema == df.schema
    a = sorted(df.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    assert a == b  # lossless: us timestamps, doubles, nulls, quotes


def test_document_mode_read_has_id_and_payload(spark, tmp_path):
    df = _sample(spark)
    root = str(tmp_path / "coll")
    write_collection(df, root, id_col="id")
    docs = read_collection(spark, root, mode="documents")
    assert docs.columns == ["_id", DOC_COL]
    got = {r._id: json.loads(r.document) for r in docs.collect()}
    assert set(got) == {"1", "2", "3"}
    assert got["1"]["name"] == "alpha"


def test_document_derived_id_is_deterministic(spark, tmp_path):
    df = _sample(spark)
    d1 = rows_to_documents(df).orderBy(DOC_COL).collect()
    d2 = rows_to_documents(df).orderBy(DOC_COL).collect()
    assert d1 == d2
    ids = [json.loads(r.document)["_id"] for r in d1]
    assert len(set(ids)) == 3  # distinct md5-derived _id per row


def test_document_passthrough_and_schemaless_inference(spark, tmp_path):
    # a (document)-shaped frame writes as-is => schemaless collection
    docs = rows_to_documents(_sample(spark), id_col="id")
    root = str(tmp_path / "raw")
    side = write_collection(docs, root)
    assert side["row_schema"] is None
    back = read_collection(spark, root, mode="rows")  # distributed inference
    assert back.count() == 3
    assert "name" in back.columns and "score" in back.columns


def test_trace_span_and_readback(spark, tmp_path):
    path = str(tmp_path / "trace.jsonl")
    trace.enable(path, tag="manager")
    try:
        with trace.span("merge", table="/t1") as info:
            info["rows"] = 42
            info["batch_id"] = 7
        with pytest.raises(ValueError):
            with trace.span("read", table="/t2"):
                raise ValueError("boom")
        tdf = trace.trace_df(spark, path)
        rows = {r.op: r for r in tdf.collect()}
        assert rows["merge"].rows == 42 and rows["merge"].batch_id == 7
        assert rows["merge"].elapsed_sec is not None
        assert "boom" in rows["read"].detail  # failures are logged too
        assert [r.tag for r in rows.values()] == ["manager", "manager"]
    finally:
        trace.disable()


def test_trace_disabled_is_noop(tmp_path):
    trace.disable()
    trace.trace_event("merge", table="/t", rows=1)  # must not raise/write
    assert not trace.enabled()


def test_laketable_commits_traced(spark, tmp_path):
    from yadamu___yet_another_data_migration_utility_spark.sources.laketable import LakeTable

    path = str(tmp_path / "trace.jsonl")
    root = str(tmp_path / "lt")
    df = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1).alias("lsn"), F.lit("x").alias("v")
    )
    trace.enable(path)
    try:
        t = LakeTable.create(root, df.schema, key="k", bucket_count=2)
        t.append(spark, df)
        recs = [json.loads(l) for l in open(path)]
        assert any(r["op"] == "append" and r["rows"] == 10 for r in recs)
    finally:
        trace.disable()


def test_compact_commit_traced_as_compact(spark, tmp_path):
    """Audit-less commits (compact) must be labeled by their summary
    operation in the trace, not fall back to 'create'."""
    from yadamu___yet_another_data_migration_utility_spark.sources.laketable import LakeTable

    path = str(tmp_path / "trace_compact.jsonl")
    root = str(tmp_path / "lt_compact")
    schema = "url string, val string"
    import pyspark.sql.types as T

    t = LakeTable.create(
        root, T._parse_datatype_string(schema), key="url", bucket_count=2,
        merge_mode="mor",
    )
    b = spark.createDataFrame(
        [("a", "v1", "I", 1)], "url string, val string, op string, lsn long"
    )
    t.merge(spark, b, batch_id=0)
    trace.enable(path)
    try:
        assert t.compact(spark, all_deltas=True) is not None
        recs = [json.loads(l) for l in open(path)]
        assert any(r["op"] == "compact" for r in recs)
        assert not any(r["op"] == "create" for r in recs)
    finally:
        trace.disable()
