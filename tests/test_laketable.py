"""LakeTable format: commits, merge semantics per op-type, fencing,
schema evolution, time travel, compaction."""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from yadamu___yet_another_data_migration_utility_spark.sources.laketable import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.StringType()),
    ]
)


def mk(spark, root, bucket_count=4):
    return LakeTable.create(root, SCHEMA, key="url", bucket_count=bucket_count)


def batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, val string, op string, lsn long"
    )


def state(spark, t):
    return {
        (r["url"], r["val"], r["_lsn"])
        for r in t.read(spark).select("url", "val", "_lsn").collect()
    }


def test_create_and_empty_read(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    assert t.read(spark).count() == 0
    assert t.current_version() == 1
    assert LakeTable.exists(tmp_table_root)


def test_insert_update_delete(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    t.merge(spark, batch(spark, [("a", "v1", "I", 1), ("b", "v1", "I", 2)]), batch_id=0)
    assert state(spark, t) == {("a", "v1", 1), ("b", "v1", 2)}
    # update a, delete b, insert c
    t.merge(
        spark,
        batch(spark, [("a", "v2", "U", 3), ("b", None, "D", 4), ("c", "v1", "I", 5)]),
        batch_id=1,
    )
    assert state(spark, t) == {("a", "v2", 3), ("c", "v1", 5)}


def test_lsn_monotonic_discard_stale(spark, tmp_table_root):
    """An event older than the applied _lsn must lose (restart replay)."""
    t = mk(spark, tmp_table_root)
    t.merge(spark, batch(spark, [("a", "new", "U", 10)]), batch_id=0)
    t.merge(spark, batch(spark, [("a", "old", "U", 5)]), batch_id=1)
    assert state(spark, t) == {("a", "new", 10)}


def test_batch_fencing_exactly_once(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    r1 = t.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=7)
    v = t.current_version()
    r2 = t.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=7)  # replay
    assert not r1.fenced and r2.fenced
    assert t.current_version() == v  # no new snapshot
    assert state(spark, t) == {("a", "v1", 1)}


def test_delete_then_reinsert_same_batch(spark, tmp_table_root):
    """Reduction keeps only the max-LSN event: later reinsert wins."""
    t = mk(spark, tmp_table_root)
    # pre-reduced batches have one row per key; simulate across batches
    t.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=0)
    t.merge(spark, batch(spark, [("a", None, "D", 2)]), batch_id=1)
    t.merge(spark, batch(spark, [("a", "v3", "I", 3)]), batch_id=2)
    assert state(spark, t) == {("a", "v3", 3)}


def test_delete_nonexistent_key_is_noop(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    t.merge(spark, batch(spark, [("ghost", None, "D", 1)]), batch_id=0)
    assert t.read(spark).count() == 0


def test_schema_evolution_additive(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    t.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=0)
    evolved = spark.createDataFrame(
        [("b", "v1", "text/html", "I", 2)],
        "url string, val string, content_type string, op string, lsn long",
    )
    t.merge(spark, evolved, batch_id=1)
    got = {
        (r["url"], r["val"], r["content_type"])
        for r in t.read(spark).select("url", "val", "content_type").collect()
    }
    # old row backfilled NULL, new row typed
    assert got == {("a", "v1", None), ("b", "v1", "text/html")}
    assert "content_type" in t.schema().fieldNames()


def test_time_travel(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    t.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=0)
    v2 = t.current_version()
    t.merge(spark, batch(spark, [("a", "v2", "U", 2)]), batch_id=1)
    old = {(r["url"], r["val"]) for r in t.read(spark, version=v2).collect()}
    new = {(r["url"], r["val"]) for r in t.read(spark).select("url", "val").collect()}
    assert old == {("a", "v1")} and new == {("a", "v2")}


def test_bucket_pruning_untouched_files_inherited(spark, tmp_table_root):
    """A merge touching one key must not rewrite other buckets' files."""
    t = mk(spark, tmp_table_root, bucket_count=8)
    many = [(f"u{i}", "v1", "I", i + 1) for i in range(64)]
    t.merge(spark, batch(spark, many), batch_id=0)
    m0 = t.manifest()
    t.merge(spark, batch(spark, [("u0", "v2", "U", 100)]), batch_id=1)
    m1 = t.manifest()
    changed = [b for b in m0["buckets"] if m0["buckets"][b] != m1["buckets"].get(b)]
    assert len(changed) == 1  # only u0's bucket rewritten
    assert m1["audit"]["touched_buckets"] == 1


def test_append_bulk_path(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed = spark.createDataFrame(
        [("a", "v1", 0), ("b", "v1", 0)], "url string, val string, _lsn long"
    )
    t.append(spark, seed, batch_id=0)
    assert t.read(spark).count() == 2
    # merge on top of the seed
    t.merge(spark, batch(spark, [("a", "v2", "U", 1)]), batch_id=1)
    assert state(spark, t) == {("a", "v2", 1), ("b", "v1", 0)}


def test_audit_and_lineage(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    t.merge(spark, batch(spark, [("a", "v1", "I", 1), ("b", None, "D", 2)]), batch_id=0)
    audits = t.audit_entries()
    assert audits[-1]["rows_in"] == 2
    assert audits[-1]["rows_deleted"] == 1
    lin = t.lineage_entries()
    # lineage = per-bucket APPLIED rows (incl. the tombstone): 'a' and
    # the delete of 'b' were both applied by this batch
    assert sum(r["row_count"] for r in lin) == 2
    assert all(r["min_lsn"] <= r["max_lsn"] for r in lin)


def test_compact(spark, tmp_table_root):
    t = mk(spark, tmp_table_root, bucket_count=2)
    for i in range(6):
        t.append(spark, spark.createDataFrame(
            [(f"u{i}", "v", i)], "url string, val string, _lsn long"))
    m = t.manifest()
    assert any(len(fl) > 2 for fl in m["buckets"].values())
    before = t.read(spark).count()
    t.compact(spark, max_files_per_bucket=2)
    m2 = t.manifest()
    assert all(len(fl) <= 2 for fl in m2["buckets"].values())
    assert t.read(spark).count() == before


def test_commit_conflict_detected(spark, tmp_table_root):
    t1 = mk(spark, tmp_table_root)
    t2 = LakeTable.load(tmp_table_root)
    m1 = t1.manifest()
    t1.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=0)
    stale = {**m1, "version": m1["version"] + 1, "parent": m1["version"]}
    with pytest.raises(RuntimeError, match="commit conflict"):
        t2._write_manifest(stale, expected_parent=m1["version"])
