"""General MERGE INTO: arbitrary update/delete/insert clauses over a
keyed table -- the Delta/Iceberg MERGE surface next to the CDC-
specialized ``merge()``. The reference engine is insert-only per job
(/root/reference/src/YADAMU/common/yadamuDBI.js copy pipeline); this is
the upsert surface a lake-table user expects on top of it."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from yadamu___yet_another_data_migration_utility_spark.sources.fsio import (
    CommitConflict,
)
from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    ConstraintViolation,
    LakeTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("status", T.StringType()),
    ]
)


def seed_table(spark, root, n=50, bucket_count=8, merge_mode="cow"):
    t = LakeTable.create(str(root), SCHEMA, key="url",
                         bucket_count=bucket_count, merge_mode=merge_mode)
    df = spark.range(n).select(
        F.concat(F.lit("https://x/p/"), F.col("id")).alias("url"),
        F.col("id").cast("double").alias("value"),
        F.lit("old").alias("status"),
    )
    t.append(spark, df)
    return t


def source_df(spark, ids):
    return spark.createDataFrame(
        [(f"https://x/p/{i}", float(1000 + i), "new") for i in ids],
        "url string, value double, status string",
    )


def state(spark, t):
    return {
        r["url"]: (r["value"], r["status"])
        for r in t.read(spark).collect()
    }


def test_update_insert_delete_semantics(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=20)
    # source: updates 0-4, inserts 100-102, deletes 10-12
    src = source_df(spark, [0, 1, 2, 3, 4, 100, 101, 102]).unionByName(
        source_df(spark, [10, 11, 12]).withColumn("status", F.lit("drop"))
    )
    v, counts = t.merge_into(
        spark, src,
        update_set={"value": "s.value * 2", "status": "s.status"},
        delete=True, delete_condition="s.status = 'drop'",
        insert_values="all",
    )
    assert v == t.current_version()
    assert counts == {"rows_source": 11, "rows_updated": 5,
                      "rows_deleted": 3, "rows_inserted": 3}
    got = state(spark, t)
    assert len(got) == 20 - 3 + 3
    for i in range(5):  # updated: expr over s
        assert got[f"https://x/p/{i}"] == (2 * (1000.0 + i), "new")
    for i in (10, 11, 12):  # deleted
        assert f"https://x/p/{i}" not in got
    for i in (100, 101, 102):  # inserted ("all")
        assert got[f"https://x/p/{i}"] == (1000.0 + i, "new")
    for i in range(5, 10):  # untouched
        assert got[f"https://x/p/{i}"] == (float(i), "old")


def test_conditional_update_and_insert_only_modes(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=10)
    src = source_df(spark, [0, 1, 2, 50])
    # update only when the target row is 'old' AND the key is even
    v, counts = t.merge_into(
        spark, src,
        update_set="all",
        update_condition="t.status = 'old' AND t.value % 2 = 0",
        insert_values=None,
    )
    got = state(spark, t)
    assert counts["rows_updated"] == 2  # keys 0 and 2
    assert counts["rows_inserted"] == 0
    assert "https://x/p/50" not in got  # no insert clause
    assert got["https://x/p/1"] == (1.0, "old")  # condition false -> kept
    assert got["https://x/p/0"] == (1000.0, "new")

    # insert-only (WHEN NOT MATCHED only): matched rows untouched
    v2, c2 = t.merge_into(spark, source_df(spark, [0, 60]),
                          update_set=None, insert_values="all")
    assert c2["rows_updated"] == 0 and c2["rows_inserted"] == 1
    got2 = state(spark, t)
    assert got2["https://x/p/0"] == (1000.0, "new")  # not re-updated
    assert got2["https://x/p/60"] == (1060.0, "new")


def test_insert_values_dict_missing_cols_null(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=5)
    v, c = t.merge_into(
        spark, source_df(spark, [90]),
        update_set=None,
        insert_values={"value": "s.value + 0.5"},  # status omitted -> NULL
    )
    assert c["rows_inserted"] == 1
    row = [r for r in t.read(spark).collect()
           if r["url"] == "https://x/p/90"][0]
    assert row["value"] == 1090.5 and row["status"] is None


def test_no_op_source_and_fence_replay(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=5)
    v0 = t.current_version()
    # empty source -> no commit
    v, c = t.merge_into(spark, source_df(spark, []), update_set="all")
    assert v is None and t.current_version() == v0
    # no clause fires (matched rows but update_condition false, no insert)
    v, c = t.merge_into(spark, source_df(spark, [0, 1]),
                        update_set="all", update_condition="false",
                        insert_values=None)
    assert v is None and c["rows_updated"] == 0
    assert t.current_version() == v0

    # fenced replay is an exact no-op
    v1, c1 = t.merge_into(spark, source_df(spark, [0]),
                          update_set="all", batch_id=7)
    assert v1 is not None and c1["rows_updated"] == 1
    v2, c2 = t.merge_into(spark, source_df(spark, [0, 1, 2]),
                          update_set="all", batch_id=7)
    assert v2 is None and c2.get("fenced") == 1
    assert t.current_version() == v1


def test_bucket_pruning_carries_untouched_files(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=200, bucket_count=16)
    m0 = t.manifest()
    v, c = t.merge_into(spark, source_df(spark, [3]), update_set="all")
    m1 = t.manifest()
    changed = [b for b in m0["buckets"]
               if m0["buckets"][b] != m1["buckets"][b]]
    assert len(changed) == 1  # exactly the key's bucket rewritten
    untouched = [b for b in m0["buckets"] if b not in changed]
    for b in untouched:  # carried by reference, not rewritten
        assert m1["buckets"][b] == m0["buckets"][b]


def test_mor_deltas_folded_in_touched_bucket(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=30, merge_mode="mor")
    # land CDC deltas: update keys 0-9 at lsn 1000+
    chg = spark.createDataFrame(
        [(f"https://x/p/{i}", float(i), "cdc", "U", 1000 + i)
         for i in range(10)],
        "url string, value double, status string, op string, lsn long",
    )
    t.merge(spark, chg, batch_id=1)
    assert any(t.manifest()["deltas"].values())
    src = source_df(spark, list(range(30)))
    v, c = t.merge_into(spark, src, update_set={"status": "'merged'"})
    assert c["rows_updated"] == 30
    m = t.manifest()
    assert not any(m["deltas"][b] for b in m["deltas"])  # folded
    got = state(spark, t)
    # CDC value survived (update only SET status), status overwritten
    assert got["https://x/p/0"] == (0.0, "merged")
    assert len(got) == 30


def test_merge_into_wins_downstream_lsn_order(spark, tmp_table_root):
    """Updated rows get a fresh _lsn above the watermark, so a
    snapshot-diff consumer (mirror) sees them win."""
    t = seed_table(spark, tmp_table_root, n=5, merge_mode="mor")
    chg = spark.createDataFrame(
        [("https://x/p/0", 0.0, "cdc", "U", 500)],
        "url string, value double, status string, op string, lsn long")
    t.merge(spark, chg, batch_id=1)
    hw = t.lsn_high_watermark()
    t.merge_into(spark, source_df(spark, [0]), update_set="all")
    assert t.lsn_high_watermark() > hw
    row = t.read(spark, public=False).filter(
        F.col("url") == "https://x/p/0").collect()[0]
    assert row["_lsn"] == hw + 1


def test_validation_errors(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=5)
    v0 = t.current_version()
    src = source_df(spark, [0])
    with pytest.raises(ValueError, match="at least one clause"):
        t.merge_into(spark, src, update_set=None, insert_values=None)
    with pytest.raises(ValueError, match="merge key"):
        t.merge_into(spark, src, update_set={"url": "'x'"})
    with pytest.raises(ValueError, match="unknown/engine"):
        t.merge_into(spark, src, update_set={"_lsn": "1"})
    with pytest.raises(ValueError, match="no key column"):
        t.merge_into(spark, src.drop("url"), update_set="all")
    # duplicate source keys rejected up front
    dup = source_df(spark, [0, 0, 1])
    with pytest.raises(ValueError, match="duplicate key"):
        t.merge_into(spark, dup, update_set="all")
    # NULL source keys rejected
    nul = source_df(spark, [1]).withColumn(
        "url", F.lit(None).cast("string"))
    with pytest.raises(ValueError, match="NULL keys"):
        t.merge_into(spark, nul, update_set="all")
    # nothing committed by any of the failures
    assert t.current_version() == v0


def test_constraint_violation_aborts_cleanly(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=5)
    t.add_constraint(spark, "value_nonneg", "value >= 0")
    v0 = t.current_version()
    bad = source_df(spark, [0]).withColumn("value", F.lit(-5.0))
    with pytest.raises(ConstraintViolation, match="value_nonneg"):
        t.merge_into(spark, bad, update_set="all")
    assert t.current_version() == v0
    assert state(spark, t)["https://x/p/0"] == (0.0, "old")
    # deletes can't violate: removing the row under a CHECK is fine
    v, c = t.merge_into(spark, source_df(spark, [1]), update_set=None,
                        insert_values=None, delete=True)
    assert c["rows_deleted"] == 1


def test_concurrent_commit_conflict_is_clean(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=10)
    src = source_df(spark, [0])
    # simulate a commit landing between manifest read and publish by
    # committing through a second handle after merge_into pinned m
    t2 = LakeTable.load(str(tmp_table_root))
    orig = t.manifest

    def racing_manifest(*a, **k):
        m = orig(*a, **k)
        if not getattr(racing_manifest, "fired", False):
            racing_manifest.fired = True
            t2.append(spark, source_df(spark, [99]).select(
                "url", "value", "status"))
        return m

    t.manifest = racing_manifest
    with pytest.raises(CommitConflict):
        t.merge_into(spark, src, update_set="all")
    t.manifest = orig
    # table is intact and retryable
    v, c = t.merge_into(spark, src, update_set="all")
    assert c["rows_updated"] == 1
    assert state(spark, t)["https://x/p/99"] == (1099.0, "new")


def test_source_key_rename(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=5)
    src = source_df(spark, [0, 77]).withColumnRenamed("url", "page_url")
    v, c = t.merge_into(spark, src, source_key="page_url",
                        update_set={"value": "s.value"},
                        insert_values={"value": "s.value"})
    got = state(spark, t)
    assert c["rows_updated"] == 1 and c["rows_inserted"] == 1
    assert got["https://x/p/0"] == (1000.0, "old")
    assert got["https://x/p/77"][0] == 1077.0


def test_by_source_delete_and_update(spark, tmp_table_root):
    """WHEN NOT MATCHED BY SOURCE: target rows absent from the source
    delete (or update) -- conditions see t.* only."""
    t = seed_table(spark, tmp_table_root, n=10)
    src = source_df(spark, [0, 1, 2])
    v, c = t.merge_into(
        spark, src,
        update_set="all", insert_values=None,
        by_source_delete=True,
        by_source_delete_condition="t.value >= 8",   # only 8, 9 drop
        by_source_update={"status": "'stale'"},
    )
    assert c["rows_updated"] == 3 + 5   # 3 matched + 5 marked stale
    assert c["rows_deleted"] == 2
    got = state(spark, t)
    assert len(got) == 8
    for i in (0, 1, 2):
        assert got[f"https://x/p/{i}"] == (1000.0 + i, "new")
    for i in range(3, 8):
        assert got[f"https://x/p/{i}"] == (float(i), "stale")
    for i in (8, 9):
        assert f"https://x/p/{i}" not in got


def test_sync_from_converges_to_snapshot(spark, tmp_table_root):
    """sync_from makes table state == snapshot, stamps ONLY changed
    rows, and is a no-commit no-op when already converged."""
    t = seed_table(spark, tmp_table_root, n=6, merge_mode="mor")
    hw = t.lsn_high_watermark()
    snap = spark.createDataFrame(
        [("https://x/p/0", 0.0, "old"),      # unchanged
         ("https://x/p/1", 111.0, "old"),    # value changed
         ("https://x/p/2", 2.0, "snap"),     # status changed
         ("https://x/p/9", 9.0, "snap")],    # new key
        "url string, value double, status string")
    v, c = t.sync_from(spark, snap, batch_id=42)
    assert c == {"rows_source": 4, "rows_updated": 2,
                 "rows_deleted": 3, "rows_inserted": 1}
    rows = {r["url"]: r for r in
            t.read(spark, public=False).collect()}
    got = {u: (r["value"], r["status"]) for u, r in rows.items()}
    assert got == {"https://x/p/0": (0.0, "old"),
                   "https://x/p/1": (111.0, "old"),
                   "https://x/p/2": (2.0, "snap"),
                   "https://x/p/9": (9.0, "snap")}
    # unchanged row kept its lsn; changed/inserted rows got the stamp
    assert rows["https://x/p/0"]["_lsn"] != hw + 1
    for u in ("https://x/p/1", "https://x/p/2", "https://x/p/9"):
        assert rows[u]["_lsn"] == hw + 1

    # replay is fenced
    v2, c2 = t.sync_from(spark, snap, batch_id=42)
    assert v2 is None and c2.get("fenced") == 1

    # already-converged sync commits NOTHING (no version churn)
    v3 = t.current_version()
    v4, c4 = t.sync_from(spark, snap)
    assert v4 is None and t.current_version() == v3
    assert c4 == {"rows_source": 4, "rows_updated": 0,
                  "rows_deleted": 0, "rows_inserted": 0}


def test_by_source_update_all_rejected(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=3)
    with pytest.raises(ValueError, match="by_source_update"):
        t.merge_into(spark, source_df(spark, [0]),
                     update_set=None, insert_values=None,
                     by_source_update="all")


def test_merge_into_on_branch_isolated_then_fast_forward(spark, tmp_table_root):
    """merge_into composes with writable branches: the branch commit is
    invisible on main until fast_forward."""
    t = seed_table(spark, tmp_table_root, n=6)
    t.create_branch("fix")
    b = t.for_branch("fix")
    v, c = b.merge_into(spark, source_df(spark, [0, 99]),
                        update_set="all", insert_values="all")
    assert c["rows_updated"] == 1 and c["rows_inserted"] == 1
    # main unchanged, branch converged
    assert state(spark, t)["https://x/p/0"] == (0.0, "old")
    assert "https://x/p/99" not in state(spark, t)
    got_b = state(spark, b)
    assert got_b["https://x/p/0"] == (1000.0, "new")
    assert got_b["https://x/p/99"] == (1099.0, "new")
    t.fast_forward("fix")
    assert state(spark, t) == got_b


def test_merge_into_evolve_appends_column(spark, tmp_table_root):
    """evolve=True: a new source column joins the schema (nullable);
    old rows read it as NULL, Delta autoMerge semantics."""
    t = seed_table(spark, tmp_table_root, n=6)
    src = source_df(spark, [0, 99]).withColumn(
        "crawl_id", F.lit("c-2024"))
    v, c = t.merge_into(spark, src, update_set="all",
                        insert_values="all", evolve=True)
    assert c["rows_updated"] == 1 and c["rows_inserted"] == 1
    assert "crawl_id" in [f.name for f in t.schema().fields]
    rows = {r["url"]: r["crawl_id"] for r in t.read(spark).collect()}
    assert rows["https://x/p/0"] == "c-2024"
    assert rows["https://x/p/99"] == "c-2024"
    assert rows["https://x/p/1"] is None  # untouched row: typed NULL

    # without evolve, the same source still merges (new column ignored)
    v2, c2 = t.merge_into(spark, source_df(spark, [1]).withColumn(
        "extra", F.lit(1)), update_set="all")
    assert c2["rows_updated"] == 1
    assert "extra" not in [f.name for f in t.schema().fields]


def test_sync_from_evolve_backfills_new_column(spark, tmp_table_root):
    """sync_from(evolve=True): a snapshot carrying a new column
    updates EVERY row that gains a value for it (NULL <=> value is a
    difference), so the backfill is complete, not insert-only."""
    t = seed_table(spark, tmp_table_root, n=4)
    snap = spark.range(4).select(
        F.concat(F.lit("https://x/p/"), F.col("id")).alias("url"),
        F.col("id").cast("double").alias("value"),
        F.lit("old").alias("status"),
        F.lit("r7").alias("rev"),
    )
    v, c = t.sync_from(spark, snap, evolve=True)
    assert c == {"rows_source": 4, "rows_updated": 4,
                 "rows_deleted": 0, "rows_inserted": 0}
    got = {r["url"]: r["rev"] for r in t.read(spark).collect()}
    assert set(got.values()) == {"r7"} and len(got) == 4
    # converged: the second sync is a no-commit no-op
    v2, c2 = t.sync_from(spark, snap, evolve=True)
    assert v2 is None and c2["rows_updated"] == 0


def test_source_key_type_mismatch_is_cast_before_bucketing(spark, tmp_path):
    """An int source key against a long table key must hash into the
    SAME buckets as the table (xxhash64 is type-sensitive) -- without
    the up-front cast the rewrite would silently drop rows."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
    ])
    t = LakeTable.create(str(tmp_path / "lk"), schema, key="id",
                         bucket_count=8)
    t.append(spark, spark.createDataFrame(
        [(i, "old") for i in range(20)], "id long, val string"))
    src = spark.createDataFrame(
        [(3, "new"), (99, "new")], "id int, val string")  # INT key
    v, c = t.merge_into(spark, src, update_set="all", insert_values="all")
    assert c["rows_updated"] == 1 and c["rows_inserted"] == 1
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert len(got) == 21          # nothing lost
    assert got[3] == "new" and got[99] == "new"
    # a key that casts to NULL is rejected, not silently inserted
    bad = spark.createDataFrame([("abc", "x")], "id string, val string")
    with pytest.raises(ValueError, match="NULL"):
        t.merge_into(spark, bad, update_set="all")


def test_delete_only_merge_does_not_advance_watermark(spark, tmp_table_root):
    """Like delete_where, a delete-only merge_into stamps no surviving
    row, so it must not advance lsn_high or claim an LSN range."""
    t = seed_table(spark, tmp_table_root, n=6)
    hw = t.lsn_high_watermark()
    v, c = t.merge_into(spark, source_df(spark, [0, 1]),
                        update_set=None, insert_values=None, delete=True)
    assert c["rows_deleted"] == 2
    assert t.lsn_high_watermark() == hw
    a = [e for e in t.audit_entries()
         if e.get("operation") == "merge_into"][-1]
    assert a["min_lsn"] is None and a["max_lsn"] is None


def test_sync_from_refuses_empty_snapshot(spark, tmp_table_root):
    t = seed_table(spark, tmp_table_root, n=4)
    empty = source_df(spark, [])
    with pytest.raises(ValueError, match="EMPTY snapshot"):
        t.sync_from(spark, empty)
    assert len(state(spark, t)) == 4   # untouched
    v, c = t.sync_from(spark, empty, allow_empty=True)
    assert c["rows_deleted"] == 4 and state(spark, t) == {}
