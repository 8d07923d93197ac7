"""Snapshot rollback: revert to a retained version, then re-replay.

Reference parity: YADAMU aborts/rolls back a failed copy inside its
transaction window (src/YADAMU/common/yadamuDBI.js rollbackTransaction);
a lake table generalizes that to reverting ALREADY-COMMITTED batches --
Iceberg's rollback_to_snapshot. The CDC-critical parts under test: the
fence ledger reverts with the state (reverted batches can re-replay,
still exactly-once per replay), lsn_high does NOT revert (synthetic
stamps stay above everything downstream has applied), and a change
window crossing the rollback emits reverted keys as NULL-LSN upserts
the tail stamps -- so a mirror follows the revert instead of diverging.
"""
from __future__ import annotations

import pytest

from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    LakeTable,
    RebaseError,
)
from yadamu___yet_another_data_migration_utility_spark.streaming.stream import (
    mirror,
)

from tests.test_laketable import MODES, batch, mk, state


def seed3(spark, t):
    """Two good batches, one bad one; returns the good version."""
    t.merge(spark, batch(spark, [("a", "v1", "I", 1), ("b", "v1", "I", 2)]),
            batch_id=0)
    t.merge(spark, batch(spark, [("a", "v2", "U", 3), ("c", "v1", "I", 4)]),
            batch_id=1)
    good = t.current_version()
    t.merge(spark, batch(spark, [("a", "BAD", "U", 5), ("b", None, "D", 6),
                                 ("d", "BAD", "I", 7)]), batch_id=2)
    return good


@pytest.mark.parametrize("mode", MODES)
def test_rollback_restores_state_and_fences(spark, tmp_table_root, mode):
    t = mk(spark, tmp_table_root, merge_mode=mode)
    good = seed3(spark, t)
    bad_head = t.current_version()
    v = t.rollback_to(good)
    assert v == bad_head + 1 == t.current_version()
    assert state(spark, t) == {("a", "v2", 3), ("b", "v1", 2), ("c", "v1", 4)}
    # ledger reverted: batch 2 can re-replay; 0/1 still fenced
    assert not t.is_applied(2) and t.is_applied(0) and t.is_applied(1)
    t.merge(spark, batch(spark, [("a", "v3", "U", 8)]), batch_id=2)
    assert state(spark, t) == {("a", "v3", 8), ("b", "v1", 2), ("c", "v1", 4)}
    # history preserved: the bad state is still time-travelable
    bad = t.read(spark, version=bad_head)
    assert {(r["url"], r["val"]) for r in bad.collect()} == {
        ("a", "BAD"), ("c", "v1"), ("d", "BAD")}
    # fsck is clean: reverted-range audits are legitimately unfenced
    rep = t.validate(spark)
    assert rep["ok"], rep["issues"]


def test_rollback_guards(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed3(spark, t)
    with pytest.raises(ValueError, match="not older"):
        t.rollback_to(t.current_version())
    with pytest.raises(ValueError, match="not older"):
        t.rollback_to(t.current_version() + 5)
    # rolling back to a TAG name resolves like everywhere else
    t.tag("good", version=3)
    t.rollback_to("good")
    assert state(spark, t) == {("a", "v2", 3), ("b", "v1", 2), ("c", "v1", 4)}
    # expired target is a clean error
    t2 = mk(spark, tmp_table_root + "_2")
    seed3(spark, t2)
    for i in range(12):
        t2.merge(spark, batch(spark, [("z", f"v{i}", "U", 100 + i)]),
                 batch_id=50 + i)
    t2.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="expired"):
        t2.rollback_to(2)


def test_mirror_converges_across_rollback(spark, tmp_table_root):
    """The hardest consumer case: the replica is seeded BEFORE the bad
    batch and follows THROUGH it on the delta fast path, so it holds
    b's physical tombstone (LSN 6). The rollback then resurrects b at
    LSN 2 -- under physical LSNs the resurrect would lose to the
    tombstone and the replica would silently diverge forever. The
    NULL-stamped rollback window must win instead."""
    t = mk(spark, tmp_table_root)
    t.merge(spark, batch(spark, [("a", "v1", "I", 1), ("b", "v1", "I", 2)]),
            batch_id=0)
    t.merge(spark, batch(spark, [("a", "v2", "U", 3), ("c", "v1", "I", 4)]),
            batch_id=1)
    good = t.current_version()
    # replica aligned at the good state
    rep, _ = mirror(spark, t, tmp_table_root + "_rep",
                    stop_at_version=good, max_polls=3)
    # bad batch lands; replica follows it (fast path: tombstone for b
    # with its physical LSN 6 is now IN the replica)
    t.merge(spark, batch(spark, [("a", "BAD", "U", 5), ("b", None, "D", 6),
                                 ("d", "BAD", "I", 7)]), batch_id=2)
    rep, _ = mirror(spark, t, tmp_table_root + "_rep",
                    stop_at_version=t.current_version(), max_polls=3)
    assert {(r["url"], r["val"]) for r in
            rep.read(spark).select("url", "val").collect()} == {
        ("a", "BAD"), ("c", "v1"), ("d", "BAD")}
    t.rollback_to(good)
    t.merge(spark, batch(spark, [("d", "v1", "I", 9)]), batch_id=2)
    rep, _ = mirror(spark, t, tmp_table_root + "_rep",
                    stop_at_version=t.current_version(), max_polls=3)
    # exact convergence: a reverted past its BAD row, b resurrected past
    # its replica-held tombstone, d re-replayed
    src = {(r["url"], r["val"])
           for r in t.read(spark).select("url", "val").collect()}
    got = {(r["url"], r["val"])
           for r in rep.read(spark).select("url", "val").collect()}
    assert got == src == {("a", "v2"), ("b", "v1"), ("c", "v1"), ("d", "v1")}


def test_change_window_crossing_rollback_emits_stamped_reverts(
        spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    good = seed3(spark, t)
    since = t.current_version()  # cursor is AT the bad state
    t.rollback_to(good)
    ch = t.read_changes(spark, since).collect()
    got = {(r["url"], r["_change_type"], r["val"], r["_lsn"]) for r in ch}
    # the WHOLE rollback-crossing window is NULL-stamped: a reverted,
    # b resurrected (a consumer may hold its higher-LSN tombstone),
    # d removed
    assert got == {("a", "upsert", "v2", None),
                   ("b", "upsert", "v1", None),
                   ("d", "delete", None, None)}
    # lsn_high did NOT revert: it is above every LSN ever applied
    assert t.lsn_high_watermark() > 7


def test_rollback_across_schema_evolution_and_successive(
        spark, tmp_table_root):
    from pyspark.sql import functions as F

    t = mk(spark, tmp_table_root)
    t.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=0)
    v1 = t.current_version()
    ev = batch(spark, [("b", "v1", "I", 2)]).withColumn("lang", F.lit("en"))
    t.merge(spark, ev, batch_id=1)
    assert "lang" in t.read(spark).columns
    t.rollback_to(v1)
    # schema reverted with the state
    assert "lang" not in t.read(spark).columns
    assert state(spark, t) == {("a", "v1", 1)}
    # successive rollbacks get distinct lsn_high bands (ordered stamps)
    h1 = t.lsn_high_watermark()
    t.merge(spark, batch(spark, [("c", "v1", "I", 30)]), batch_id=2)
    t.rollback_to(v1)
    assert t.lsn_high_watermark() > h1
    # a concurrent commit between plan and publish aborts the rollback:
    # let a merge land, then make rollback_to PLAN against the head as
    # it stood before that merge (the stale read a real race produces).
    # Its CAS loses to the intervening commit and the rebase guard must
    # refuse to silently drop it.
    t.merge(spark, batch(spark, [("d", "v1", "I", 40)]), batch_id=3)
    real_manifest, seen = t.manifest, {"n": 0}

    def stale_head(version=None):
        if version is None and seen["n"] == 0:
            seen["n"] += 1
            return real_manifest(t.current_version() - 1)
        return real_manifest(version)

    t.manifest = stale_head
    try:
        with pytest.raises(RebaseError, match="rollback aborted"):
            t.rollback_to(v1)
    finally:
        del t.manifest  # drop the instance shadow
    # nothing moved: the intervening merge survived
    assert ("d", "v1", 40) in state(spark, t)


def test_rollback_then_expire_keeps_referenced_files(spark, tmp_table_root):
    """A rollback head RE-references data dirs older than the retention
    horizon (the target's files). expire_snapshots sweeps by dir age but
    protects every file a retained manifest references -- the revert's
    files must survive an aggressive expire and the table stay readable
    and fsck-clean."""
    t = mk(spark, tmp_table_root)
    good = seed3(spark, t)
    t.rollback_to(good)
    # push the retention horizon well past the target's commit dirs
    for i in range(6):
        t.merge(spark, batch(spark, [("z", f"v{i}", "U", 100 + i)]),
                batch_id=10 + i)
    t.expire_snapshots(keep_last=2)
    assert state(spark, t) == {("a", "v2", 3), ("b", "v1", 2),
                               ("c", "v1", 4), ("z", "v5", 105)}
    rep = t.validate(spark)
    assert rep["ok"], rep["issues"]


def test_rollup_refresh_across_rollback(spark, tmp_path):
    """A continuous aggregate following the base table must converge
    through a rollback: the crossing window takes the snapshot-diff
    path (a rollback adds no delta files), the changed keys are exact,
    and the refreshed rollup equals a full recompute."""
    import pyspark.sql.types as T

    from yadamu___yet_another_data_migration_utility_spark.streaming.rollup import (
        IncrementalRollup,
    )

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    base = LakeTable.create(str(tmp_path / "base"), schema, key="url",
                            bucket_count=4, merge_mode="mor")

    def b(rows):
        return spark.createDataFrame(
            rows, "url string, kind string, value double, op string, lsn long")

    base.merge(spark, b([("a", "x", 1.0, "I", 1), ("b", "y", 2.0, "I", 2)]),
               batch_id=0)
    good = base.current_version()
    ru = IncrementalRollup.create(
        spark, str(tmp_path / "roll"), base, dims=["kind"], sums=["value"])
    # bad batch lands and the rollup follows it
    base.merge(spark, b([("a", "x", 100.0, "U", 3), ("b", None, None, "D", 4),
                         ("d", "y", 7.0, "I", 5)]), batch_id=1)
    ru.refresh(spark)
    # revert the base, then re-replay a corrected batch
    base.rollback_to(good)
    base.merge(spark, b([("d", "y", 7.5, "I", 6)]), batch_id=1)
    ru.refresh(spark)
    got = {tuple(str(v) for v in r)
           for r in ru.read(spark).select("kind", "n_rows", "sum_value")
           .collect()}
    exp = {tuple(str(v) for v in r)
           for r in ru.recompute(spark).select("kind", "n_rows", "sum_value")
           .collect()}
    assert got == exp == {("x", "1", "1.000000"), ("y", "2", "9.500000")}


def test_rollback_on_branch(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    good = seed3(spark, t)
    b = t.create_branch("dev")
    b.merge(spark, batch(spark, [("e", "v1", "I", 20)]), batch_id=10)
    b.rollback_to(good)  # reverts the branch past its own commit
    assert state(spark, b) == {("a", "v2", 3), ("b", "v1", 2), ("c", "v1", 4)}
    # main is untouched by the branch's rollback
    assert ("a", "BAD", 5) in state(spark, t)
    t.fast_forward("dev")
    assert state(spark, t) == {("a", "v2", 3), ("b", "v1", 2), ("c", "v1", 4)}
