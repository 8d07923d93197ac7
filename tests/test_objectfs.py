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
