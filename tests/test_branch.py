"""Branches: writable named refs that fast-forward back onto main.

Reference parity: YADAMU's staged copies become visible only when the
whole migration publishes (src/YADAMU/common/yadamuDBI.js transaction
wrappers); Iceberg formalizes multi-commit staging as BRANCHES
(CREATE BRANCH / fast_forward). Here a branch is an isolated manifest
namespace continuing main's version numbering from its fork point:
every engine operation (merge, append, compact, delete_where, tags,
time travel, read_changes) runs on a branch view unchanged, and
fast_forward adopts the branch manifests byte-for-byte via the same
name-CAS as any commit -- so audit chains and change cursors carry
across the publish without a seam.
"""
from __future__ import annotations

import json
import os

import pytest

from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    MANIFEST_DIR,
    LakeTable,
    RebaseError,
)

from tests.test_laketable import SCHEMA, batch, mk, state


def seed(spark, t):
    t.merge(spark, batch(spark, [("a", "v1", "I", 1), ("b", "v1", "I", 2)]),
            batch_id=0)


def test_branch_commits_isolated_from_main(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed(spark, t)
    main_head = t.current_version()
    b = t.create_branch("dev")
    assert t.branches() == {
        "dev": {"fork_version": main_head, "head": main_head}}
    b.merge(spark, batch(spark, [("a", "v2", "U", 10), ("c", "v1", "I", 11)]),
            batch_id=1)
    # branch advanced in main's numbering; main untouched
    assert b.current_version() == main_head + 1
    assert t.current_version() == main_head
    assert state(spark, b) == {("a", "v2", 10), ("b", "v1", 2),
                               ("c", "v1", 11)}
    assert state(spark, t) == {("a", "v1", 1), ("b", "v1", 2)}
    # fencing is per-branch: the branch knows batch 1, main does not
    assert b.is_applied(1) and not t.is_applied(1)
    # audit chain crosses the fork into main's history
    assert [a["batch_id"] for a in b.audit_entries()] == [0, 1]


def test_fast_forward_publishes_and_preserves_history(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed(spark, t)
    fork = t.current_version()
    b = t.create_branch("dev")
    b.merge(spark, batch(spark, [("a", "v2", "U", 10)]), batch_id=1)
    b.merge(spark, batch(spark, [("b", None, "D", 11)]), batch_id=2)
    head = t.fast_forward("dev")
    assert head == fork + 2 == t.current_version()
    assert state(spark, t) == {("a", "v2", 10)}
    # manifests adopted verbatim: fences, audits and per-version reads
    assert t.is_applied(1) and t.is_applied(2)
    assert [a["batch_id"] for a in t.audit_entries()] == [0, 1, 2]
    assert state(spark, LakeTable(tmp_table_root)) == {("a", "v2", 10)}
    # intermediate branch version is now main time travel
    mid = t.read(spark, version=fork + 1)
    assert {(r["url"], r["val"]) for r in mid.collect()} == {
        ("a", "v2"), ("b", "v1")}
    # branch is gone; its name is reusable
    assert t.branches() == {}
    t.create_branch("dev")


def test_read_changes_cursor_continues_across_publish(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed(spark, t)
    fork = t.current_version()
    b = t.create_branch("dev")
    b.merge(spark, batch(spark, [("a", "v2", "U", 10), ("c", "v1", "I", 11)]),
            batch_id=1)
    t.fast_forward("dev")
    # a downstream follower whose cursor predates the publish tails the
    # adopted commit as if it had landed on main directly
    ch = t.read_changes(spark, since_version=fork)
    got = {(r["url"], r["_lsn"], r["_change_type"]) for r in ch.collect()}
    assert got == {("a", 10, "upsert"), ("c", 11, "upsert")}


def test_fast_forward_diverged_main_aborts_cleanly(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed(spark, t)
    b = t.create_branch("dev")
    b.merge(spark, batch(spark, [("a", "v2", "U", 10)]), batch_id=1)
    t.merge(spark, batch(spark, [("b", "v2", "U", 12)]), batch_id=2)
    with pytest.raises(RebaseError, match="diverged"):
        t.fast_forward("dev")
    # nothing moved: main kept its commit, branch is intact and readable
    assert state(spark, t) == {("a", "v1", 1), ("b", "v2", 12)}
    assert state(spark, b) == {("a", "v2", 10), ("b", "v1", 2)}
    assert "dev" in t.branches()


def test_fast_forward_resumes_after_partial_crash(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed(spark, t)
    fork = t.current_version()
    b = t.create_branch("dev")
    b.merge(spark, batch(spark, [("a", "v2", "U", 10)]), batch_id=1)
    b.merge(spark, batch(spark, [("c", "v1", "I", 11)]), batch_id=2)
    # simulate a crash mid-publish: first branch manifest already copied
    src = b._manifest_path(fork + 1)
    dst = os.path.join(tmp_table_root, MANIFEST_DIR,
                       os.path.basename(src))
    with open(src) as f:
        txt = f.read()
    with open(dst, "w") as f:
        f.write(txt)
    head = t.fast_forward("dev")  # recognizes the identical prefix
    assert head == fork + 2
    assert state(spark, t) == {("a", "v2", 10), ("b", "v1", 2),
                               ("c", "v1", 11)}


def test_live_branch_pins_retention_at_fork(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed(spark, t)
    fork = t.current_version()
    b = t.create_branch("dev")
    b.merge(spark, batch(spark, [("a", "v2", "U", 10)]), batch_id=1)
    for i in range(6):  # main marches on past the fork
        t.merge(spark, batch(spark, [("b", f"m{i}", "U", 20 + i)]),
                batch_id=10 + i)
    res = t.expire_snapshots(keep_last=1)
    # the fork manifest (and everything after) survives for the branch
    assert res["oldest_kept_version"] == fork
    assert state(spark, b) == {("a", "v2", 10), ("b", "v1", 2)}
    # dropping the branch releases the pin
    t.drop_branch("dev")
    res = t.expire_snapshots(keep_last=1)
    assert res["oldest_kept_version"] == t.current_version()


def test_branch_supports_maintenance_and_tags(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed(spark, t)
    b = t.create_branch("dev")
    b.merge(spark, batch(spark, [("a", "v2", "U", 10), ("c", "v1", "I", 11)]),
            batch_id=1)
    b.compact(spark)  # folds branch deltas; a plain commit on the branch
    vtag = b.tag("pre-cleanup")
    b.delete_where(spark, "val = 'v1'")
    assert state(spark, b) == {("a", "v2", 10)}
    # branch-local tag time-travels on the branch...
    tagged = b.read(spark, version="pre-cleanup")
    assert {r["url"] for r in tagged.collect()} == {"a", "b", "c"}
    # ...and is invisible on main until publish
    assert "pre-cleanup" not in t.refs()
    t.fast_forward("dev")
    assert t.refs()["pre-cleanup"] == vtag - 1  # tag targets its parent
    assert state(spark, t) == {("a", "v2", 10)}


def test_branch_guards(spark, tmp_table_root):
    t = mk(spark, tmp_table_root)
    seed(spark, t)
    with pytest.raises(ValueError, match="bad branch name"):
        t.create_branch("main")
    with pytest.raises(ValueError, match="unknown branch"):
        t.for_branch("nope")
    b = t.create_branch("dev")
    with pytest.raises(FileExistsError):
        t.create_branch("dev")
    # maintenance and staging stay on main
    with pytest.raises(ValueError, match="main view"):
        b.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="main view"):
        b.stage_merge(spark, batch(spark, [("x", "v", "I", 99)]), batch_id=9)
    with pytest.raises(ValueError, match="main view"):
        b.create_branch("nested")
    # for_branch("main") hands back a main view
    assert t.for_branch("main").branch == "main"
    # branching from an older version (by number) works
    b2 = t.create_branch("old", version=1)
    assert b2.read(spark).count() == 0
