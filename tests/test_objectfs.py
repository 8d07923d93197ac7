"""ObjectFS -- the DEPLOYABLE object-store backend (pyarrow.fs) --
must carry the full LakeTable lifecycle exactly like LocalFS. The
primitive-level S3 semantics are proven by tests/test_fsio_object.py's
fake; this module proves the real class (the one a deployment
configures) against the engine end-to-end, LocalFileSystem-backed.

The WHOLE laketable suite also runs under ObjectFS via
``SPARK_GRAFT_TEST_FS=objectfs python -m pytest tests/test_laketable.py``
(tests/test_laketable.py's ``mk`` honors the env var; the verified run
is recorded in COVERAGE.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from yadamu___yet_another_data_migration_utility_spark.sources.fsio import (
    CommitConflict,
    ObjectFS,
)
from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    LakeTable,
)

SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("val", T.StringType()),
])

CHG = "url string, val string, op string, lsn long"


def _b(spark, rows):
    return spark.createDataFrame(rows, CHG)


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_lifecycle_on_objectfs(spark, tmp_path, mode):
    fs = ObjectFS()
    root = str(tmp_path / "lake")
    t = LakeTable.create(root, SCHEMA, key="url", bucket_count=4,
                         merge_mode=mode, fs=fs)
    t.merge(spark, _b(spark, [("a", "1", "I", 1), ("b", "2", "I", 2)]), 0)
    t.merge(spark, _b(spark, [("a", "3", "U", 3), ("b", None, "D", 4)]), 1)
    got = {(r["url"], r["val"]) for r in t.read(spark, public=True).collect()}
    assert got == {("a", "3")}
    # fence replays through the ObjectFS CAS
    assert t.merge(spark, _b(spark, [("z", "9", "I", 9)]), 1).fenced
    # compact + time travel + retention through ObjectFS traversal
    t.compact(spark, all_deltas=True)
    assert {(r["url"], r["val"])
            for r in t.read(spark, version=2, public=True).collect()} == {
        ("a", "1"), ("b", "2")}
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.manifest(2)
    assert {(r["url"], r["val"])
            for r in t.read(spark, public=True).collect()} == {("a", "3")}


def test_conflict_and_reload_on_objectfs(spark, tmp_path):
    fs = ObjectFS()
    root = str(tmp_path / "lake")
    t = LakeTable.create(root, SCHEMA, key="url", fs=fs)
    t.merge(spark, _b(spark, [("a", "1", "I", 1)]), 0)
    # a second handle over the SAME store (fresh ObjectFS) sees the data
    t2 = LakeTable.load(root, fs=ObjectFS())
    assert t2.read(spark, public=True).count() == 1
    # direct CAS loss surfaces as CommitConflict
    p = t._manifest_path(t.current_version())
    with pytest.raises(CommitConflict):
        fs.put_if_absent(p, "{}")


def test_objectfs_day2_surfaces(spark, tmp_path):
    fs = ObjectFS()
    t = LakeTable.create(str(tmp_path / "lake"), SCHEMA, key="url",
                         bucket_count=4, fs=fs)
    t.merge(spark, _b(spark, [(f"u{i}", f"v{i}", "I", i + 1)
                              for i in range(20)]), 0)
    t.compact(spark, all_deltas=True)
    # bloom harvest + lookup: footer reads and sidecar I/O through pyarrow
    info = t.harvest_blooms(spark)
    assert info["files_indexed"] > 0
    assert t.plan_files(keys=["nope"]) == {"plain": [], "delta_resolved": []}
    rows = t.lookup(spark, ["u3"], public=True).collect()
    assert [(r["url"], r["val"]) for r in rows] == [("u3", "v3")]
    # metadata-only count reads footers through ObjectFS
    assert t.row_count() == 20
    # branch + fast-forward: branch metadata CAS through ObjectFS
    br = t.create_branch("fix")
    br.merge(spark, _b(spark, [("u3", "patched", "U", 99)]), 7)
    t.fast_forward("fix")
    got = t.lookup(spark, ["u3"], public=True).collect()
    assert got[0]["val"] == "patched"
    # fsck is clean
    assert t.validate()["ok"]


def test_spark_scheme_prefixing():
    fs = ObjectFS(spark_scheme="s3a")
    assert fs.spark_path("bucket/warehouse/t/data/f.parquet") == (
        "s3a://bucket/warehouse/t/data/f.parquet")
    assert ObjectFS().spark_path("/x/y") == "/x/y"


def test_require_cas_guard():
    # a non-local backend without an injected conditional PUT must be
    # refusable for multi-writer use
    class FakeRemote:
        pass

    import pyarrow.fs as pafs

    with pytest.raises(ValueError, match="cas_put"):
        ObjectFS(fs=pafs.SubTreeFileSystem("/", pafs.LocalFileSystem()),
                 require_cas=True)


def test_injected_cas_put_is_used(tmp_path):
    calls = []

    def cas(path, data):
        calls.append(path)
        raise CommitConflict("412")

    fs = ObjectFS(cas_put=cas)
    with pytest.raises(CommitConflict):
        fs.put_if_absent(str(tmp_path / "v1.json"), "{}")
    assert calls


# ======================================================================
# Contested-CAS property fuzz (VERDICT r4 ask #4): a racing writer wins
# the conditional PUT ahead of the caller for every scheduled attempt
# sequence. Each loss is a REAL competing commit (a second LakeTable
# handle lands the contested manifest version first), so the caller's
# optimistic loop must REBASE onto genuine intervening state -- or, when
# every retry is lost, abort cleanly with no orphan state. Reference
# analogue: the multi-writer reconnect accounting
# (/root/reference/src/YADAMU/common/yadamuDBI.js:704-813).
# ======================================================================

import os as _os
import re as _re


class _RacingFS(ObjectFS):
    """ObjectFS whose manifest CAS loses to a real phantom writer on the
    next ``lose_next`` attempts -- the S3 ``If-None-Match`` 412 path
    driven end-to-end (the phantom publishes the contested version, THEN
    the caller's exclusive create runs and fails honestly)."""

    def __init__(self, phantom):
        super().__init__()
        self.phantom = phantom  # zero-arg: performs one real competing commit
        self.lose_next = 0
        self.losses = 0

    def put_if_absent(self, path, data):
        if (_re.fullmatch(r"v\d+\.json", _os.path.basename(path))
                and self.lose_next > 0):
            self.lose_next -= 1
            self.losses += 1
            self.phantom()  # racing writer lands this version first
        super().put_if_absent(path, data)


def _mk_contested(spark, tmp_path):
    """Table under a racing FS + a phantom writer handle over the SAME
    store; returns (table, racing_fs, model, next_lsn_box)."""
    root = str(tmp_path / "lake")
    model: dict[str, tuple[str, int]] = {}  # url -> (val, lsn), LWW
    lsn_box = [100]
    phantom_state = {"n": 0}

    def phantom():
        phantom_state["n"] += 1
        t2 = LakeTable.load(root, fs=ObjectFS())
        url = f"k{phantom_state['n'] % 6}"
        lsn_box[0] += 1
        lsn = lsn_box[0]
        val = f"phantom{phantom_state['n']}"
        t2.merge(spark, _b(spark, [(url, val, "U", lsn)]),
                 batch_id=1000 + phantom_state["n"])
        if model.get(url, ("", -1))[1] < lsn:
            model[url] = (val, lsn)

    fs = _RacingFS(phantom)
    t = LakeTable.create(root, SCHEMA, key="url", bucket_count=4,
                         merge_mode="mor", fs=fs)
    return t, fs, model, lsn_box


def _assert_matches_model(spark, t, model):
    got = {r["url"]: r["val"] for r in t.read(spark, public=True).collect()}
    assert got == {u: v for u, (v, _) in model.items()}
    assert t.validate()["ok"]


@pytest.mark.parametrize("losses", [1, 2, 3, 4])
def test_contested_cas_rebase_wins_after_k_losses(spark, tmp_path, losses):
    t, fs, model, lsn_box = _mk_contested(spark, tmp_path)
    lsn_box[0] += 1
    lsn = lsn_box[0]
    batch = [("k0", "caller", "U", lsn), ("caller_only", "x", "I", lsn)]
    fs.lose_next = losses
    res = t.merge(spark, _b(spark, batch), batch_id=1)
    assert fs.losses == losses and fs.lose_next == 0
    assert not res.fenced and res.version is not None
    # every phantom commit + the caller's own rebased commit are all live
    for url, val, l in [(u, v, l) for (u, v, op, l) in batch]:
        if model.get(url, ("", -1))[1] < l:
            model[url] = (val, l)
    _assert_matches_model(spark, t, model)
    # version chain: create + losses phantom commits + 1 caller commit
    assert t.current_version() == losses + 2


def test_contested_cas_exhaustion_aborts_cleanly(spark, tmp_path):
    t, fs, model, lsn_box = _mk_contested(spark, tmp_path)
    fs.lose_next = 5  # == max_retries: every attempt loses
    with pytest.raises(CommitConflict):
        t.merge(spark, _b(spark, [("caller_only", "x", "I", 999)]), batch_id=1)
    # clean abort: caller's rows absent, phantom commits intact, no
    # orphan commit dir left behind (merge rmtree'd it), fsck green
    _assert_matches_model(spark, t, model)
    assert "caller_only" not in {
        r["url"] for r in t.read(spark, public=True).collect()}
    data_dir = _os.path.join(t.root, "data")
    on_disk = set()
    for d in _os.listdir(data_dir):
        for base, _, files in _os.walk(_os.path.join(data_dir, d)):
            for f in files:
                if f.endswith(".parquet"):
                    rel = _os.path.relpath(_os.path.join(base, f), t.root)
                    on_disk.add(rel)
    # every data file still on disk is referenced by SOME live manifest
    live = set()
    for v in range(1, t.current_version() + 1):
        mv = t.manifest(v)
        for which in ("buckets", "deltas"):
            live |= {f for fl in mv.get(which, {}).values() for f in fl}
    assert on_disk <= live, on_disk - live


def test_contested_cas_fence_drops_duplicate_batch(spark, tmp_path):
    # the phantom commits the CALLER'S batch id first -> the caller's
    # loop must return fenced, applying NOTHING (exactly-once across
    # racing writers)
    root = str(tmp_path / "lake")

    def phantom():
        t2 = LakeTable.load(root, fs=ObjectFS())
        t2.merge(spark, _b(spark, [("a", "winner", "U", 50)]), batch_id=7)

    fs = _RacingFS(phantom)
    t = LakeTable.create(root, SCHEMA, key="url", bucket_count=4,
                         merge_mode="mor", fs=fs)
    t.merge(spark, _b(spark, [("a", "seed", "I", 1)]), batch_id=0)
    fs.lose_next = 1
    res = t.merge(spark, _b(spark, [("a", "loser", "U", 60)]), batch_id=7)
    assert res.fenced and res.version is None
    got = {r["url"]: r["val"] for r in t.read(spark, public=True).collect()}
    assert got == {"a": "winner"}  # the loser's rows never landed


@pytest.mark.parametrize("seed", [11, 29])
def test_contested_cas_random_schedule_fuzz(spark, tmp_path, seed):
    """Seeded sequence of caller merges, each contested 0-2 times, with
    day-2 surfaces (compact, metadata count) interleaved -- the model
    must hold at every step."""
    import random

    rng = random.Random(seed)
    t, fs, model, lsn_box = _mk_contested(spark, tmp_path)
    for i in range(8):
        lsn_box[0] += 1
        lsn = lsn_box[0]
        url = f"k{rng.randrange(6)}"
        val = f"caller{i}"
        fs.lose_next = rng.randrange(3)
        res = t.merge(spark, _b(spark, [(url, val, "U", lsn)]), batch_id=i + 1)
        assert not res.fenced
        if model.get(url, ("", -1))[1] < lsn:
            model[url] = (val, lsn)
        if i == 4:
            t.compact(spark, all_deltas=True)
    assert fs.losses > 0  # the schedule actually contested something
    _assert_matches_model(spark, t, model)
    # day-2 after contested history: compact to a delta-free snapshot,
    # then the metadata-only count must agree with the model
    t.compact(spark, all_deltas=True)
    assert t.row_count() == len(model)
