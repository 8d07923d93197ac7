"""Staged dataset (UNLOAD/LOAD) round-trip fidelity -- the reference's
file-format contract (control file + per-table data files, CSV hex
binary / ISO timestamps), SURVEY.md §2.a S5/W6."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yadamu___yet_another_data_migration_utility_spark.operators.compare import compare
from yadamu___yet_another_data_migration_utility_spark.sources.staged import (
    load_staged,
    unload,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("amount", T.DecimalType(12, 2)),
        T.StructField("payload", T.BinaryType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def tricky_df(spark):
    rows = [
        (1, "plain", datetime.datetime(2024, 1, 2, 3, 4, 5, 123456), None, bytearray(b"\x00\xff\x10"), True, 1.5),
        (2, 'quote"comma,', datetime.datetime(2024, 6, 1), None, None, False, float("nan")),
        (3, "", None, None, bytearray(b""), None, None),  # empty string vs NULL
        (4, None, datetime.datetime(1999, 12, 31, 23, 59, 59), None, bytearray(b"ab"), True, -0.0),
        (5, "newline\nin field", datetime.datetime(2024, 3, 1), None, bytearray(b"\x7f"), False, 2.0),
    ]
    import decimal

    rows = [
        (r[0], r[1], r[2], decimal.Decimal("12345.67") if r[0] % 2 else None, r[4], r[5], r[6])
        for r in rows
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip_lossless(spark, tmp_path, tricky_df, fmt):
    root = str(tmp_path / f"ds_{fmt}")
    unload({"t": tricky_df}, root, fmt=fmt)
    back = load_staged(spark, root)["t"]
    assert back.schema == tricky_df.schema
    if fmt == "csv":
        # NaN in a double column is excluded (CSV has no standard NaN
        # token across engines); embedded newlines round-trip via
        # quoted fields + multiLine read
        cols = [c for c in tricky_df.columns if c != "score"]
        res = compare(tricky_df.select(cols), back.select(cols))
        assert res.ok, res
        # empty string stays empty, NULL stays NULL (stricter than the
        # reference's EMPTY_STRING_IS_NULL coercion)
        got = {r["id"]: r["name"] for r in back.collect()}
        assert got[3] == ""
        assert got[4] is None
    else:
        res = compare(tricky_df.drop("score"), back.drop("score"))
        assert res.ok, res


def test_control_file_is_commit_marker(spark, tmp_path, tricky_df):
    import os

    root = str(tmp_path / "ds")
    unload({"a": tricky_df, "b": tricky_df.select("id", "name")}, root, fmt="parquet")
    assert os.path.exists(os.path.join(root, "control.json"))
    out = load_staged(spark, root)
    assert set(out) == {"a", "b"}
    assert out["b"].columns == ["id", "name"]
