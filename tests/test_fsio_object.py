"""Object-store port proof: run the LakeTable commit protocol through
an FS whose commit primitives have exactly S3's semantics -- conditional
PUT (single exclusive write at the final key: no tmp file, no hardlink)
and plain PUT (truncating write at the key: no rename). If the protocol
secretly depended on anything stronger than the two primitives
documented in sources/fsio.py, the lifecycle below would break.

Also pins the immutability contract the port relies on: every manifest
name is conditional-PUT exactly once and never rewritten; only the
``_current`` hint uses plain PUT.
"""

from __future__ import annotations

import os
import re
import threading

import pytest

from yadamu___yet_another_data_migration_utility_spark.sources.fsio import (
    CommitConflict,
    LocalFS,
)
from yadamu___yet_another_data_migration_utility_spark.sources.laketable import (
    LakeTable,
)


class ObjectStorePutFS(LocalFS):
    """LocalFS with the two metadata commit primitives REPLACED by
    their object-store forms (fsio.py's documented S3 port):

    - ``put_if_absent`` = conditional PUT ``If-None-Match: *``: one
      exclusive create at the final key (O_CREAT|O_EXCL); losing the
      race is the 412 -> CommitConflict. No tmp file, no os.link.
    - ``put_atomic`` = plain PUT: truncating write at the key. No
      rename. (The ``_current`` pointer is a hint readers re-validate,
      so a torn read costs probes, never correctness.)

    Directory creation stays real (Spark's local data plane needs it;
    S3 treats prefixes as free). Call log pins the immutability
    contract.
    """

    def __init__(self):
        self.cas_keys: list[str] = []
        self.put_keys: list[str] = []
        self._lock = threading.Lock()

    def put_if_absent(self, path: str, data: str) -> None:
        with self._lock:
            self.cas_keys.append(path)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflict(
                f"commit conflict: {os.path.basename(path)} already published"
            ) from None
        with os.fdopen(fd, "w") as f:
            f.write(data)

    def put_atomic(self, path: str, data: str) -> None:
        with self._lock:
            self.put_keys.append(path)
        with open(path, "w") as f:
            f.write(data)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "url string, val string, op string, lsn long")


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_laketable_lifecycle_on_object_primitives(spark, tmp_path, mode):
    fs = ObjectStorePutFS()
    root = str(tmp_path / "lake")
    schema = (
        spark.createDataFrame([], "url string, val string").schema
    )
    t = LakeTable.create(root, schema, key="url", bucket_count=4,
                         merge_mode=mode, fs=fs)
    t.append(spark, spark.createDataFrame(
        [(f"u{i}", f"v{i}") for i in range(20)], "url string, val string"
    ), batch_id=0)
    # two merges incl. a delete; winners by max lsn per key
    t.merge(spark, _batch(spark, [("u1", "w1", "U", 10), ("u2", None, "D", 11),
                                  ("u1", "w1b", "U", 12)]), batch_id=1)
    t.merge(spark, _batch(spark, [("u3", "w3", "U", 20), ("u1", "w1c", "U", 21)]),
            batch_id=2)
    got = {r["url"]: r["val"] for r in t.read(spark).collect()}
    assert got["u1"] == "w1c" and "u2" not in got and got["u3"] == "w3"
    assert len(got) == 19  # 20 seeded - 1 deleted
    # maintenance through the same primitives
    assert t.compact(spark, all_deltas=True) is not None or mode == "cow"
    t.expire_snapshots(keep_last=2)
    got2 = {r["url"]: r["val"] for r in t.read(spark).collect()}
    assert got2 == got
    # immutability contract: every manifest key conditional-PUT exactly
    # once; the _current hint is the ONLY plain-PUT target
    manifest_keys = [k for k in fs.cas_keys if re.match(r"v\d+\.json$", os.path.basename(k))]
    assert len(manifest_keys) == len(set(manifest_keys))
    assert fs.put_keys and all(os.path.basename(k) == "_current" for k in fs.put_keys)
    # a reload through the same FS sees the identical state
    t2 = LakeTable.load(root, fs=fs)
    assert t2.current_version() == t.current_version()


def test_conditional_put_conflict_drives_rebase(spark, tmp_path):
    """Two writers, one table root, object primitives: the loser's
    conditional PUT raises CommitConflict and the rebase lands both
    commits -- the S3 multi-writer story end-to-end."""
    fs_a, fs_b = ObjectStorePutFS(), ObjectStorePutFS()
    root = str(tmp_path / "lake")
    schema = spark.createDataFrame([], "url string, val string").schema
    ta = LakeTable.create(root, schema, key="url", bucket_count=4, fs=fs_a)
    ta.append(spark, spark.createDataFrame(
        [(f"u{i}", f"v{i}") for i in range(8)], "url string, val string"
    ), batch_id=0)
    tb = LakeTable.load(root, fs=fs_b)
    head = ta.current_version()

    # force the race deterministically: tb commits BETWEEN ta's data
    # write and ta's manifest publish, so ta's conditional PUT of
    # v{head+1} hits the 412 (CommitConflict) and the rebase runs --
    # entirely on object primitives
    def intervene():
        tb.merge(spark, _batch(spark, [("u2", "b", "U", 200)]), batch_id=2)

    ra = ta.merge(spark, _batch(spark, [("u1", "a", "U", 100)]), batch_id=1,
                  pre_commit_hook=intervene)
    assert ra.version == head + 2  # rebased past tb's v{head+1}
    got = {r["url"]: r["val"] for r in tb.read(spark).collect()}
    assert got["u1"] == "a" and got["u2"] == "b"
    # the contested key v{head+1} was conditional-PUT by BOTH writers:
    # published by tb, 412'd for ta
    attempted = fs_a.cas_keys + fs_b.cas_keys
    v_contested = [k for k in attempted if os.path.basename(k) == f"v{head + 1:012d}.json"]
    assert len(v_contested) == 2


def test_raw_conditional_put_semantics(tmp_path):
    fs = ObjectStorePutFS()
    p = str(tmp_path / "v1.json")
    fs.put_if_absent(p, "first")
    with pytest.raises(CommitConflict):
        fs.put_if_absent(p, "second")
    assert fs.read_text(p) == "first"
    fs.put_atomic(str(tmp_path / "_current"), "1")
    fs.put_atomic(str(tmp_path / "_current"), "2")
    assert fs.read_text(str(tmp_path / "_current")) == "2"
