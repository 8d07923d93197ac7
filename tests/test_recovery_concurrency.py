"""Crash recovery and multi-writer commits.

The two round-3 robustness contracts:

1. A crash between the batch's data write and the manifest publish
   must be HANDS-OFF recoverable: the replayed batch commits (fresh
   uuid commit dir -- no path collision with the orphan), final state
   matches the oracle, and retention eventually sweeps the orphan.
   Reference contract: reconnect-and-resume,
   /root/reference/src/YADAMU/common/yadamuDBI.js:704-813.
2. Two writers committing concurrently into one table must BOTH land
   (optimistic rebase on the manifest-name CAS) when their work
   composes -- always for merge-on-read/append, disjoint buckets for
   copy-on-write -- and the loser must abort CLEANLY (RebaseError, no
   partial state) when it does not.
"""

from __future__ import annotations

import os
import threading

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from yadamu___yet_another_data_migration_utility_spark.sources.fsio import (
    CommitConflict,
    LocalFS,
)
from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    LakeTable,
    RebaseError,
)

SCHEMA = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("val", T.StringType())]
)
MODES = ["mor", "cow"]


def mk(root, bucket_count=8, merge_mode="mor"):
    return LakeTable.create(root, SCHEMA, key="url", bucket_count=bucket_count,
                            merge_mode=merge_mode)


def batch(spark, rows):
    return spark.createDataFrame(rows, "url string, val string, op string, lsn long")


def state(spark, t):
    return {
        (r["url"], r["val"], r["_lsn"])
        for r in t.read(spark).select("url", "val", "_lsn").collect()
    }


# ----------------------------------------------------------------------
# 1. crash between data write and manifest publish
# ----------------------------------------------------------------------


@pytest.mark.parametrize("mode", MODES)
def test_crash_between_data_write_and_commit_recovers(
    spark, tmp_table_root, mode, monkeypatch
):
    t = mk(tmp_table_root, merge_mode=mode)
    t.merge(spark, batch(spark, [("a", "v1", "I", 1), ("b", "v1", "I", 2)]), batch_id=0)
    v_before = t.current_version()
    data_dir = os.path.join(tmp_table_root, "data")
    dirs_before = set(os.listdir(data_dir))

    # simulate the crash: the batch's parquet files reach disk, the
    # manifest publish never runs (process death between the two)
    def die(self, manifest, expected_parent):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(LakeTable, "_write_manifest", die)
    crash_batch = [("a", "v2", "U", 3), ("c", "v1", "I", 4)]
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.merge(spark, batch(spark, crash_batch), batch_id=1)
    monkeypatch.undo()

    # on-disk: an orphan commit dir exists, nothing references it,
    # the table head did not move
    orphans = set(os.listdir(data_dir)) - dirs_before
    assert len(orphans) == 1
    assert t.current_version() == v_before
    assert not t.is_applied(1)

    # restart: replaying the SAME batch must commit hands-off (fresh
    # uuid dir -- the orphan cannot wedge the write) and reach the
    # oracle state
    t2 = LakeTable.load(tmp_table_root)
    r = t2.merge(spark, batch(spark, crash_batch), batch_id=1)
    assert not r.fenced and r.rows_in == 2
    assert state(spark, t2) == {("a", "v2", 3), ("b", "v1", 2), ("c", "v1", 4)}

    # the orphan ages past the retention horizon and is swept
    for b in range(2, 5):
        t2.merge(spark, batch(spark, [("a", f"v{b + 1}", "U", b + 2)]), batch_id=b)
    if mode == "mor":
        t2.compact(spark, all_deltas=True)
    t2.expire_snapshots(keep_last=1)
    left = set(os.listdir(data_dir))
    assert not (orphans & left), f"orphan survived retention: {orphans & left}"
    assert state(spark, t2) == {("a", "v5", 6), ("b", "v1", 2), ("c", "v1", 4)}


def test_crash_after_manifest_publish_before_pointer_rolls_forward(
    spark, tmp_table_root, monkeypatch
):
    """Crash AFTER the vN.json publish but BEFORE the pointer hint is
    written: the commit is durable (the manifest-name CAS is the
    commit), readers roll forward past the stale hint, and the replayed
    batch fences as already-applied."""
    t = mk(tmp_table_root, merge_mode="mor")
    t.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=0)

    real_put_atomic = type(t.fs).put_atomic
    monkeypatch.setattr(
        type(t.fs), "put_atomic",
        lambda self, path, data: (_ for _ in ()).throw(RuntimeError("simulated crash")),
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.merge(spark, batch(spark, [("b", "v1", "I", 2)]), batch_id=1)
    monkeypatch.setattr(type(t.fs), "put_atomic", real_put_atomic)

    t2 = LakeTable.load(tmp_table_root)
    assert t2.is_applied(1)  # roll-forward sees the published manifest
    r = t2.merge(spark, batch(spark, [("b", "v1", "I", 2)]), batch_id=1)
    assert r.fenced
    assert state(spark, t2) == {("a", "v1", 1), ("b", "v1", 2)}


class SimulatedCrash(RuntimeError):
    pass


class CrashFS(LocalFS):
    """Fault-injecting FS: dies (before performing the op) on the k-th
    metadata MUTATION. Sweeping k over the whole create+merge sequence
    proves hands-off recovery at EVERY metadata crash point, not just
    hand-picked ones."""

    def __init__(self, crash_after: int):
        self.remaining = crash_after

    def _tick(self):
        self.remaining -= 1
        if self.remaining < 0:
            raise SimulatedCrash("injected metadata crash")

    def put_if_absent(self, path, data):
        self._tick()
        return super().put_if_absent(path, data)

    def put_atomic(self, path, data):
        self._tick()
        return super().put_atomic(path, data)

    def makedirs(self, path):
        self._tick()
        return super().makedirs(path)

    def remove(self, path):
        self._tick()
        return super().remove(path)

    def rmtree(self, path):
        self._tick()
        return super().rmtree(path)


def test_crash_sweep_every_metadata_mutation(spark, tmp_path):
    """For every k: run create + seed-merge + second-merge with a crash
    injected before the k-th metadata mutation, then recover with a
    clean FS and replay -- the table must always end in the oracle
    state with both batches applied exactly once. Terminates when a
    full pass sees no crash (k beyond the op count)."""
    from yadamu___yet_another_data_migration_utility_spark.sources.fsio import LocalFS

    b0 = [("a", "v1", "I", 1), ("b", "v1", "I", 2)]
    b1 = [("a", "v2", "U", 3), ("c", "v1", "I", 4)]
    want = {("a", "v2", 3), ("b", "v1", 2), ("c", "v1", 4)}
    k = 0
    while True:
        root = str(tmp_path / f"sweep{k}")
        cfs = CrashFS(k)
        crashed = False
        try:
            t = LakeTable.create(root, SCHEMA, key="url", bucket_count=4,
                                 merge_mode="mor", fs=cfs)
            t.merge(spark, batch(spark, b0), batch_id=0)
            t.merge(spark, batch(spark, b1), batch_id=1)
        except SimulatedCrash:
            crashed = True

        # --- recovery with a clean FS, exactly like a process restart ---
        if not LakeTable.exists(root):
            try:
                t2 = LakeTable.create(root, SCHEMA, key="url", bucket_count=4,
                                      merge_mode="mor")
            except FileExistsError:
                # interrupted create whose manifest was durable: the
                # pointer was repaired, load() must now work
                t2 = LakeTable.load(root)
        else:
            t2 = LakeTable.load(root)
        for bid, rows in ((0, b0), (1, b1)):
            if not t2.is_applied(bid):
                r = t2.merge(spark, batch(spark, rows), batch_id=bid)
                assert not r.fenced
        assert state(spark, t2) == want, f"crash point k={k}"
        assert t2.is_applied(0) and t2.is_applied(1)
        if not crashed:
            break
        k += 1
    assert k >= 5, f"sweep covered only {k} mutation points"


# ----------------------------------------------------------------------
# 2. concurrent writers
# ----------------------------------------------------------------------


def test_concurrent_threads_disjoint_batches_both_commit(spark, tmp_table_root):
    """Two threads merging disjoint key sets into one mor table: both
    commits land (rebase on conflict), final state equals the oracle."""
    mk(tmp_table_root, merge_mode="mor")
    t1, t2 = LakeTable.load(tmp_table_root), LakeTable.load(tmp_table_root)
    rows_a = [(f"a{i}", "v", "I", i + 1) for i in range(20)]
    rows_b = [(f"b{i}", "v", "I", 100 + i) for i in range(20)]
    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def worker(tbl, rows, bid):
        try:
            barrier.wait(timeout=60)
            tbl.merge(spark, batch(spark, rows), batch_id=bid)
        except Exception as e:  # noqa: BLE001 -- surfaced via assert below
            errs.append(e)

    th = [
        threading.Thread(target=worker, args=(t1, rows_a, 1)),
        threading.Thread(target=worker, args=(t2, rows_b, 2)),
    ]
    for x in th:
        x.start()
    for x in th:
        x.join(timeout=300)
    assert not errs, errs

    t = LakeTable.load(tmp_table_root)
    assert t.current_version() == 3  # create + two commits
    assert t.is_applied(1) and t.is_applied(2)
    want = {(u, "v", lsn) for (u, _v, _op, lsn) in rows_a + rows_b}
    assert state(spark, t) == want


def _forced_conflict_merge(spark, root, rows_mine, rows_other, mode, bid=1, obid=2):
    """Deterministic conflict: another writer commits BETWEEN this
    merge's data write and its manifest publish (via pre_commit_hook),
    forcing the manifest-name CAS to fail and the rebase path to run."""
    t_mine = LakeTable.load(root)
    t_other = LakeTable.load(root)

    def intervene():
        t_other.merge(spark, batch(spark, rows_other), batch_id=obid, mode=mode)

    return t_mine.merge(
        spark, batch(spark, rows_mine), batch_id=bid, mode=mode,
        pre_commit_hook=intervene,
    )


@pytest.mark.parametrize("mode", MODES)
def test_rebase_on_forced_conflict_both_commit(spark, tmp_table_root, mode):
    """mor: rebases onto ANY intervening commit. cow: rebases when the
    intervening commit touched disjoint buckets."""
    t = mk(tmp_table_root, merge_mode=mode, bucket_count=8)
    if mode == "cow":
        # pick two keys in different buckets (xxhash64 pmod 8, JVM-side)
        probe = spark.createDataFrame(
            [(f"k{i}",) for i in range(32)], "url string"
        ).select(
            "url", F.pmod(F.xxhash64("url"), F.lit(8)).cast("int").alias("b")
        ).collect()
        by_bucket: dict[int, str] = {}
        for r in probe:
            by_bucket.setdefault(r["b"], r["url"])
        k1, k2 = list(by_bucket.values())[:2]
        rows_mine = [(k1, "mine", "I", 1)]
        rows_other = [(k2, "other", "I", 2)]
    else:
        rows_mine = [(f"a{i}", "mine", "I", i + 1) for i in range(10)]
        rows_other = [(f"b{i}", "other", "I", 100 + i) for i in range(10)]

    r = _forced_conflict_merge(
        spark, tmp_table_root, rows_mine, rows_other, mode=mode
    )
    assert not r.fenced
    assert t.current_version() == 3
    assert t.is_applied(1) and t.is_applied(2)
    want = {(u, v, lsn) for (u, v, _op, lsn) in rows_mine + rows_other}
    assert state(spark, t) == want
    # audit rows exist for BOTH commits
    ops = [a["batch_id"] for a in t.audit_entries()]
    assert set(ops) >= {1, 2}


def test_cow_rebase_overlapping_buckets_aborts_cleanly(spark, tmp_table_root):
    """cow writers racing on the SAME key: the loser must raise
    RebaseError and leave no trace (no fence, no files referenced, no
    head movement beyond the winner's commit)."""
    t = mk(tmp_table_root, merge_mode="cow", bucket_count=8)
    with pytest.raises(RebaseError, match="same buckets"):
        _forced_conflict_merge(
            spark, tmp_table_root,
            rows_mine=[("k", "mine", "I", 1)],
            rows_other=[("k", "other", "I", 2)],
            mode="cow",
        )
    assert t.current_version() == 2  # only the intervening commit landed
    assert t.is_applied(2) and not t.is_applied(1)
    assert state(spark, t) == {("k", "other", 2)}
    # the loser's data dir was cleaned up: every remaining commit dir is
    # referenced by the winner's manifest
    m = t.manifest()
    referenced = {
        f.split(os.sep)[1]
        for fl in list(m["buckets"].values()) + list(m.get("deltas", {}).values())
        for f in fl
    }
    on_disk = set(os.listdir(os.path.join(tmp_table_root, "data")))
    assert on_disk == referenced


def test_concurrent_same_batch_id_fences_exactly_once(spark, tmp_table_root):
    """Two writers delivering the SAME batch (at-least-once redelivery
    across processes): exactly one applies, the other fences during its
    rebase -- no duplicate rows, no error."""
    t = mk(tmp_table_root, merge_mode="mor")
    rows = [("a", "v1", "I", 1), ("b", "v1", "I", 2)]
    r = _forced_conflict_merge(
        spark, tmp_table_root, rows_mine=rows, rows_other=rows, bid=7, obid=7,
        mode="mor",
    )
    assert r.fenced  # the intervening writer won; ours became a no-op
    assert t.current_version() == 2
    assert state(spark, t) == {("a", "v1", 1), ("b", "v1", 2)}


def test_manifest_name_cas_rejects_stale_parent(spark, tmp_table_root):
    """Direct CAS check (replaces the old pointer-compare test): a
    manifest built against a stale parent fails with CommitConflict."""
    t1 = mk(tmp_table_root)
    t2 = LakeTable.load(tmp_table_root)
    m1 = t1.manifest()
    t1.merge(spark, batch(spark, [("a", "v1", "I", 1)]), batch_id=0)
    stale = {**m1, "version": m1["version"] + 1, "parent": m1["version"]}
    with pytest.raises(CommitConflict, match="commit conflict"):
        t2._write_manifest(stale, expected_parent=m1["version"])


# ----------------------------------------------------------------------
# 3. read_changes across an expire boundary
# ----------------------------------------------------------------------


def test_read_changes_window_crossing_expire_horizon_is_clean_error(
    spark, tmp_table_root
):
    t = mk(tmp_table_root, merge_mode="mor")
    for b in range(6):
        t.merge(spark, batch(spark, [(f"k{b}", "v", "I", b + 1)]), batch_id=b)
    v_mid = t.current_version()
    t.compact(spark, all_deltas=True)
    t.merge(spark, batch(spark, [("k9", "v", "I", 99)]), batch_id=9)
    t.expire_snapshots(keep_last=2)  # drops everything before the compact

    # window start expired -> clean ValueError, not FileNotFoundError
    with pytest.raises(ValueError, match="expired"):
        t.read_changes(spark, 2)
    with pytest.raises(ValueError, match="expired"):
        t.read_changes(spark, v_mid)  # also expired (only last 2 kept)

    # beyond-head until: clean ValueError
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.read_changes(spark, 2, t.current_version() + 1)

    # a fully-retained window still works (diff path: compact inside
    # history, but the window itself is one mor merge -> fast path)
    v_since = t.current_version() - 1
    got = {
        (r["url"], r["_change_type"])
        for r in t.read_changes(spark, v_since).collect()
    }
    assert got == {("k9", "upsert")}


def test_crash_sweep_day2_operation_chain(spark, tmp_path):
    """The metadata crash sweep extended across the day-2 surfaces:
    create -> fenced append -> mor merge -> general merge_into
    (fenced) -> compact -> delete_where. For every k, crash before the
    k-th metadata mutation, then recover hands-off on a clean FS:
    replay the fenced steps that did not land, re-run the idempotent
    maintenance, and require the oracle state plus a clean fsck.
    Proves the newer commit surfaces share merge()'s recovery
    contract, not just the original create+merge pair."""
    seed = [("a", "s1"), ("b", "s1"), ("c", "s1"), ("d", "s1")]
    b1 = [("a", "v2", "U", 10), ("e", "v1", "I", 11), ("b", None, "D", 12)]
    want = {("a", "v2"), ("c", "mi"), ("e", "v1")}

    def recover_and_finish(t2):
        if not t2.is_applied(0):
            t2.append(spark, spark.createDataFrame(
                seed, "url string, val string"), batch_id=0)
        if not t2.is_applied(1):
            r = t2.merge(spark, batch(spark, b1), batch_id=1)
            assert not r.fenced
        if not t2.is_applied(2):
            src = spark.createDataFrame(
                [("c", "mi", "U"), ("f", "gone", "I"), ("d", None, "D")],
                "url string, val string, act string")
            v, counts = t2.merge_into(
                spark, src,
                update_set={"val": "s.val"},
                update_condition="s.act = 'U'",
                delete=True, delete_condition="s.act = 'D'",
                insert_values={"val": "s.val"},
                insert_condition="s.act = 'I'",
                batch_id=2)
            assert counts.get("fenced") != 1
        t2.compact(spark, all_deltas=True)      # idempotent maintenance
        t2.delete_where(spark, predicate="val = 'gone'")

    k = 0
    while True:
        root = str(tmp_path / f"day2sweep{k}")
        cfs = CrashFS(k)
        crashed = False
        try:
            t = LakeTable.create(root, SCHEMA, key="url", bucket_count=4,
                                 merge_mode="mor", fs=cfs)
            recover_and_finish(t)
        except SimulatedCrash:
            crashed = True

        # --- recovery with a clean FS, exactly like a process restart ---
        if not LakeTable.exists(root):
            try:
                t2 = LakeTable.create(root, SCHEMA, key="url",
                                      bucket_count=4, merge_mode="mor")
            except FileExistsError:
                t2 = LakeTable.load(root)
        else:
            t2 = LakeTable.load(root)
        recover_and_finish(t2)
        got = {(r["url"], r["val"])
               for r in t2.read(spark).select("url", "val").collect()}
        assert got == want, f"crash point k={k}"
        fsck = t2.validate(spark)
        assert fsck["ok"], f"crash point k={k}: {fsck['issues']}"
        if not crashed:
            break
        k += 1
    assert k >= 10, f"day-2 sweep covered only {k} mutation points"
