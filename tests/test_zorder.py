"""Z-order (Morton) clustering for compaction rewrites.

Why it matters at 100 TB: file- and row-group-level min/max pruning is
only as good as the data layout. A lexicographic rewrite sort serves
its LEADING column; the interleaved z-key bounds EVERY listed
dimension per row group, so pushed-down range predicates on any of
them skip row groups (Delta OPTIMIZE ZORDER / Iceberg z-order rewrite
strategy). These tests verify the bit algebra, the measured locality
win over a lexicographic sort, and state preservation.
"""
from __future__ import annotations

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    LakeTable,
    _zorder_expr,
    _zorder_key,
)


def test_zorder_expr_interleaves_bits(spark):
    """k=2, bits=2: bit j of column i lands at position j*k + i.
    x=0b10 -> bit 1 at position 2 (=4); y=0b01 -> bit 0 at position 1
    (=2); z = 6. Plus a 16-bit identity spot check."""
    df = spark.range(1).select(
        _zorder_expr([F.lit(2), F.lit(1)], bits=2).alias("z"),
        _zorder_expr([F.lit(0b1010), F.lit(0b0101)], bits=4).alias("z2"),
        _zorder_expr([F.lit(65535), F.lit(0)], bits=16).alias("z3"),
    )
    row = df.collect()[0]
    assert row["z"] == 6
    # x bits 1,3 -> positions 2,6; y bits 0,2 -> positions 1,5
    assert row["z2"] == (1 << 2) + (1 << 6) + (1 << 1) + (1 << 5)
    # all 16 x-bits land on even positions
    assert row["z3"] == sum(1 << (2 * b) for b in range(16))


def _rg_spans(t: LakeTable, cols: list[str]) -> dict[str, float]:
    """Mean fractional (max-min)/domain span per row group, per col,
    over the manifest's live base file."""
    import os

    m = t.manifest()
    files = [f for fl in m["buckets"].values() for f in fl]
    assert len(files) == 1, files
    md = pq.ParquetFile(os.path.join(t.root, files[0])).metadata
    assert md.num_row_groups >= 8, "need multiple row groups to measure"
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    lo = {c: None for c in cols}
    hi = {c: None for c in cols}
    spans = {c: [] for c in cols}
    per_rg = []
    for rg in range(md.num_row_groups):
        row = {}
        for c in cols:
            st = md.row_group(rg).column(idx[c]).statistics
            row[c] = (st.min, st.max)
            lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
            hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        per_rg.append(row)
    for row in per_rg:
        for c in cols:
            dom = hi[c] - lo[c] or 1
            spans[c].append((row[c][1] - row[c][0]) / dom)
    return {c: sum(v) / len(v) for c, v in spans.items()}


@pytest.fixture()
def small_row_groups(spark):
    hc = spark._jsc.hadoopConfiguration()
    old = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    yield
    if old is None:
        hc.unset("parquet.block.size")
    else:
        hc.set("parquet.block.size", old)


def test_compact_zorder_bounds_every_dimension(spark, tmp_path,
                                               small_row_groups):
    """Measured locality: after a z-order compact, EVERY row group's
    bounding box is a small fraction of the (x, y) domain; after a
    lexicographic sort by x, the y axis spans ~the whole domain in
    every row group. Same data, same file count."""
    n, side = 60000, 224
    src = spark.range(n).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") % side).alias("x"),
        ((F.col("id") * 7919) % side).alias("y"),  # decorrelated axis
    )
    spans = {}
    for mode in ("lex", "z"):
        root = str(tmp_path / mode)
        t = LakeTable.create(root, src.schema, key="k", bucket_count=1)
        t.append(spark, src, batch_id=0)
        if mode == "lex":
            v = t.compact(spark, buckets=[0], sort_within_buckets=["x"])
        else:
            v = t.compact(spark, buckets=[0], zorder_by=["x", "y"])
        assert v is not None
        assert t.read(spark).count() == n  # state preserved
        spans[mode] = _rg_spans(t, ["x", "y"])
    # lexicographic: x tight, y unconstrained
    assert spans["lex"]["x"] < 0.25
    assert spans["lex"]["y"] > 0.8
    # z-order: BOTH constrained -- and y at a fraction of the lex span
    assert spans["z"]["x"] < 0.5
    assert spans["z"]["y"] < 0.5
    assert spans["z"]["y"] < spans["lex"]["y"] / 2


def test_compact_zorder_preserves_lww_state(spark, tmp_path):
    """z-order compact folds deltas exactly like a plain compact:
    winners survive, tombstones disappear, timestamps/nulls intact."""
    root = str(tmp_path / "t")
    src = spark.createDataFrame(
        [(f"u{i}", i % 7, float(i)) for i in range(50)],
        "k string, x long, v double")
    t = LakeTable.create(root, src.schema, key="k", bucket_count=2)
    t.append(spark, src, batch_id=0)
    chg = spark.createDataFrame(
        [("u1", 99, 1.5, "U", 100), ("u2", None, None, "U", 101),
         ("u3", 0, 0.0, "D", 102)],
        "k string, x long, v double, op string, lsn long")
    t.merge(spark, chg, batch_id=1)
    t.compact(spark, all_deltas=True, zorder_by=["x", "v"])
    got = {(r["k"], r["x"], r["v"]) for r in
           t.read(spark).select("k", "x", "v").collect()}
    assert ("u1", 99, 1.5) in got and ("u2", None, None) in got
    assert not any(k == "u3" for k, _, _ in got)
    assert len(got) == 49
    assert not any(t.manifest()["deltas"].values())


def test_compact_zorder_validations(spark, tmp_path):
    root = str(tmp_path / "t")
    src = spark.createDataFrame([("a", 1, "s")], "k string, x long, s string")
    t = LakeTable.create(root, src.schema, key="k", bucket_count=1)
    t.append(spark, src, batch_id=0)
    with pytest.raises(ValueError, match="not both"):
        t.compact(spark, buckets=[0], sort_within_buckets=["x"],
                  zorder_by=["x"])
    with pytest.raises(ValueError, match="no column"):
        t.compact(spark, buckets=[0], zorder_by=["nope"])
    with pytest.raises(ValueError, match="unsupported type"):
        t.compact(spark, buckets=[0], zorder_by=["s"])


def test_zorder_key_constant_and_null_axes(spark):
    """A constant or all-NULL axis ranks as cell 0 everywhere (never
    poisons the interleave); NULLs in a live axis co-locate at 0."""
    import pyspark.sql.types as T

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "a long, b long")
    schema = T.StructType([T.StructField("a", T.LongType()),
                           T.StructField("b", T.LongType())])
    z = df.select(_zorder_key(df, ["a", "b"], schema)).collect()
    assert [r["_z"] for r in z] == sorted(r["_z"] for r in z)
    # all-NULL b contributes nothing: keys are the spread of a alone
    assert len({r["_z"] for r in z}) == 3
