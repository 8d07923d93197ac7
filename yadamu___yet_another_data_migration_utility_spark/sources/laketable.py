"""LakeTable -- a minimal transactional, hash-bucketed lake table format.

Why this exists
---------------
The north rule targets Iceberg ``MERGE INTO`` upserts, but this sandbox
ships no Iceberg/Delta runtime jar, so the engine implements the
*minimal subset of an Iceberg-shaped table format* it needs, from
scratch, Spark-first:

- **atomic snapshot commits** -- an immutable JSON manifest per version
  plus an atomically-renamed ``_current`` pointer (Iceberg: metadata
  file + catalog pointer swap);
- **hash-bucket partitioning on the merge key** (Iceberg:
  ``PARTITIONED BY (bucket(N, url))``) so a MERGE only rewrites the
  buckets its keys touch -- the copy-on-write analogue of Iceberg
  partition pruning on the merge join;
- **batch-id fencing inside the same atomic commit** -- the applied
  batch-id ledger lives in the manifest, so "data visible" and "batch
  recorded" are one rename: exactly-once without the two-commit hazard
  (SURVEY.md §7.2 step 4 flags this as the high-risk part; storing the
  fence in the snapshot removes the risk entirely);
- **additive schema evolution** -- the manifest carries the current
  schema; old data files lacking new columns are read with the current
  schema so missing columns surface as NULL (Iceberg: UpdateSchema);
- **time travel** -- any manifest version remains readable;
- **per-commit audit + per-bucket lineage** embedded in the manifest
  and reconstructable as DataFrames.

Reference provenance (behavior, not code): the commit-window +
reconciliation model of /root/reference/src/YADAMU/common/yadamuWriter.js
:506-576 (processBatch txn windows) and :813-815 (rowsRead ==
committed + lost + skipped); partition-level parallel copy
/root/reference/src/YADAMU/oracle/node/oracleDBI.js:1256-1267.

Scale notes (100 TB / 1000 executors)
-------------------------------------
- ``bucket_count`` is the unit of merge parallelism and of rewrite
  amplification: at 100 TB you set it to O(10k) so a micro-batch
  touching 1% of keys rewrites ~1% of data. Manifests stay small (file
  lists per bucket, not per row).
- The merge itself is one shuffle (union + groupBy key) over ONLY the
  touched buckets' data + the batch -- the same I/O shape as Iceberg
  copy-on-write MERGE. At higher update locality you would switch to
  merge-on-read deletes; noted as future work, not needed for replay
  correctness.
- Driver-side metadata operations (manifest read/write, file listing)
  are O(bucket_count), never O(rows).
- On a real cluster the filesystem calls below go through the Hadoop
  FileSystem API (S3A rename-safe commit via metadata pointer swap);
  the sandbox uses the local FS.

Single-writer assumption: one streaming query owns a table (the
reference is likewise single-process per job). The optimistic parent
check turns a lost race into a clean error instead of corruption.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORMAT_VERSION = 1
MANIFEST_DIR = "manifests"
DATA_DIR = "data"
CURRENT = "_current"
# Internal engine columns stored in the table alongside user columns.
LSN_COL = "_lsn"  # last applied LSN per key -> LSN-monotonic idempotent merge


def _bucket_expr(key: str, n: int):
    """Deterministic bucket id for a key. xxhash64 is a Catalyst builtin
    (JVM-side, codegen); pmod keeps it non-negative."""
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n)).cast("int")


@dataclass
class MergeResult:
    """Outcome of one merge/append commit (audit row)."""

    batch_id: int
    version: int | None  # None if fenced (already applied)
    fenced: bool
    rows_in: int
    rows_applied: int
    rows_deleted: int
    min_lsn: int | None
    max_lsn: int | None
    touched_buckets: int
    duration_ms: int

    def as_dict(self) -> dict[str, Any]:
        return dict(self.__dict__)


class LakeTable:
    """A transactional hash-bucketed parquet table with MERGE semantics."""

    def __init__(self, root: str):
        self.root = root

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        root: str,
        schema: T.StructType,
        key: str,
        bucket_count: int = 32,
        overwrite: bool = False,
    ) -> "LakeTable":
        """Create an empty table (snapshot v1, no data files)."""
        if os.path.exists(root):
            if not overwrite:
                raise FileExistsError(f"LakeTable already exists at {root}")
            shutil.rmtree(root)
        if key not in schema.fieldNames():
            raise ValueError(f"merge key {key!r} not in schema")
        if LSN_COL not in schema.fieldNames():
            schema = T.StructType(list(schema.fields) + [T.StructField(LSN_COL, T.LongType())])
        os.makedirs(os.path.join(root, MANIFEST_DIR))
        os.makedirs(os.path.join(root, DATA_DIR))
        tbl = cls(root)
        manifest = {
            "format_version": FORMAT_VERSION,
            "version": 1,
            "parent": None,
            "key": key,
            "bucket_count": bucket_count,
            "schema": schema.jsonValue(),
            "buckets": {},
            "applied_batches": {},
            "audit": None,
            "lineage": [],
            "summary": {"operation": "create", "total_rows": 0},
            "committed_at": _utc_now_iso(),
        }
        tbl._write_manifest(manifest, expected_parent=None)
        return tbl

    @classmethod
    def load(cls, root: str) -> "LakeTable":
        if not os.path.exists(os.path.join(root, MANIFEST_DIR, CURRENT)):
            raise FileNotFoundError(f"no LakeTable at {root}")
        return cls(root)

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, MANIFEST_DIR, CURRENT))

    # ------------------------------------------------------------------
    # manifest I/O
    # ------------------------------------------------------------------
    def current_version(self) -> int:
        with open(os.path.join(self.root, MANIFEST_DIR, CURRENT)) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        v = self.current_version() if version is None else version
        path = os.path.join(self.root, MANIFEST_DIR, f"v{v:012d}.json")
        with open(path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict[str, Any], expected_parent: int | None) -> None:
        """Atomic commit: write immutable vN.json, then swap _current.

        Optimistic concurrency: if another writer advanced _current past
        ``expected_parent`` we abort -- a clean conflict error, matching
        Iceberg's commit-conflict semantics.
        """
        mdir = os.path.join(self.root, MANIFEST_DIR)
        v = manifest["version"]
        mpath = os.path.join(mdir, f"v{v:012d}.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, mpath)
        cur = os.path.join(mdir, CURRENT)
        if expected_parent is not None:
            actual = self.current_version()
            if actual != expected_parent:
                os.remove(mpath)
                raise RuntimeError(
                    f"commit conflict: expected parent v{expected_parent}, found v{actual}"
                )
        ctmp = cur + f".tmp-{uuid.uuid4().hex}"
        with open(ctmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.rename(ctmp, cur)  # POSIX-atomic pointer swap == the commit

    # ------------------------------------------------------------------
    # read path
    # ------------------------------------------------------------------
    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(self.manifest(version)["schema"])

    def _files(self, manifest: dict[str, Any], buckets: list[int] | None = None) -> list[str]:
        out: list[str] = []
        for b, files in manifest["buckets"].items():
            if buckets is None or int(b) in buckets:
                out.extend(os.path.join(self.root, f) for f in files)
        return out

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        buckets: list[int] | None = None,
        public: bool = False,
    ) -> DataFrame:
        """Snapshot read (optionally time-traveled / bucket-pruned).

        Reading with the *current* schema makes additive evolution work:
        parquet files written before a column existed yield NULL for it
        (Spark fills missing columns when an explicit schema is given).
        """
        m = self.manifest(version)
        schema = T.StructType.fromJson(m["schema"])
        files = self._files(m, buckets)
        if not files:
            df = spark.createDataFrame([], schema)
        else:
            df = spark.read.schema(schema).parquet(*files)
        if public:
            df = df.drop(LSN_COL)
        return df

    # ------------------------------------------------------------------
    # audit / lineage as DataFrames (engine metrics tables)
    # ------------------------------------------------------------------
    def audit_entries(self) -> list[dict[str, Any]]:
        """All audit rows across the snapshot chain (newest last)."""
        out = []
        v: int | None = self.current_version()
        chain = []
        while v is not None:
            m = self.manifest(v)
            chain.append(m)
            v = m["parent"]
        for m in reversed(chain):
            if m.get("audit"):
                out.append(m["audit"])
        return out

    def lineage_entries(self) -> list[dict[str, Any]]:
        out = []
        v: int | None = self.current_version()
        while v is not None:
            m = self.manifest(v)
            for row in m.get("lineage", []):
                out.append({"version": m["version"], **row})
            v = m["parent"]
        return out

    def is_applied(self, batch_id: int) -> bool:
        return str(batch_id) in self.manifest()["applied_batches"]

    def audit_df(self, spark: SparkSession) -> DataFrame:
        """The engine's metrics table as a DataFrame: one row per commit
        (batch_id, operation, rows_in/applied/deleted, lsn range,
        touched buckets, version). North-rule 'metrics tables';
        reference analogue: reportPerformance rows
        (/root/reference/src/YADAMU/common/yadamuWriter.js:749-841)."""
        rows = self.audit_entries()
        schema = ("batch_id long, operation string, rows_in long, rows_applied long, "
                  "rows_deleted long, min_lsn long, max_lsn long, touched_buckets long, "
                  "version long, rows_batch_in long, rows_quarantined long")
        return spark.createDataFrame(
            [{k: r.get(k) for k in
              ("batch_id", "operation", "rows_in", "rows_applied", "rows_deleted",
               "min_lsn", "max_lsn", "touched_buckets", "version",
               "rows_batch_in", "rows_quarantined")} for r in rows],
            schema,
        )

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        """Per-partition lineage as a DataFrame: applied LSN ranges +
        row counts per (version, batch, bucket) -- the north rule's
        per-partition lineage table."""
        return spark.createDataFrame(
            self.lineage_entries() or [],
            "version long, batch_id long, bucket int, row_count long, min_lsn long, max_lsn long",
        )

    # ------------------------------------------------------------------
    # write paths
    # ------------------------------------------------------------------
    def append(self, spark: SparkSession, df: DataFrame, batch_id: int | None = None) -> int:
        """Bulk snapshot path (initial seed): plain bucketed append, no
        merge -- the analogue of the reference's staged-COPY fast path
        (/root/reference/src/YADAMU/common/yadamu.js:872-884: choose
        bulk load over row pipeline when possible)."""
        m = self.manifest()
        if batch_id is not None and str(batch_id) in m["applied_batches"]:
            return -1
        schema = T.StructType.fromJson(m["schema"])
        df = _align(df, schema)
        v = m["version"] + 1
        new_files, n_rows = self._write_bucketed(spark, df, m, v)
        buckets = dict(m["buckets"])
        for b, files in new_files.items():
            buckets[b] = buckets.get(b, []) + files
        applied = dict(m["applied_batches"])
        if batch_id is not None:
            applied[str(batch_id)] = {"version": v, "op": "append"}
        manifest = {
            **m,
            "version": v,
            "parent": m["version"],
            "buckets": buckets,
            "applied_batches": _cap(applied),
            "audit": {
                "batch_id": batch_id,
                "operation": "append",
                "rows_in": n_rows,
                "rows_applied": n_rows,
                "rows_deleted": 0,
                "version": v,
            },
            "lineage": [],
            "summary": {"operation": "append", "rows_written": n_rows},
            "committed_at": _utc_now_iso(),
        }
        self._write_manifest(manifest, expected_parent=m["version"])
        return v

    def merge(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int,
        op_col: str = "op",
        lsn_col: str = "lsn",
        collect_lineage: bool = True,
        extra_audit: dict[str, Any] | None = None,
        pre_write_hook: Any = None,
    ) -> MergeResult:
        """Copy-on-write CDC MERGE -- the engine's core operator (W5 in
        SURVEY.md §2.a; absent from the reference, which is insert-only).

        ``batch_df`` must be pre-reduced to one winning lsn per key
        (last LSN wins -- see operators.apply); byte-identical
        redelivered duplicates of the winner may remain (the resolution
        below collapses them via a benign max_by tie). It carries
        ``op`` ('I'/'U'/'D') and ``lsn``. Semantics == Iceberg::

            MERGE INTO t USING s ON t.url = s.url AND s.lsn > t._lsn
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

        LSN-monotonicity (only apply events newer than the stored
        ``_lsn``) makes replay of a duplicated batch a no-op row-wise,
        and the batch-id fence in the same manifest commit makes it a
        no-op commit-wise: exactly-once from at-least-once delivery.

        ``pre_write_hook`` (if given) is a zero-arg callable invoked
        after the per-bucket stats job (which materializes the source
        and fires any Observation attached upstream by the caller) and
        BEFORE any data file is written or committed. If it raises, the
        merge aborts cleanly: no data files, no manifest, no fence --
        the abort-policy seam used by operators.apply (side-effects the
        hook performed, e.g. an idempotent quarantine write, stand).
        """
        t0 = time.monotonic()
        _dbg = os.environ.get("SPARK_GRAFT_DEBUG_TIMING")

        def _tick(label, _last=[t0]):
            if _dbg:
                now = time.monotonic()
                print(f"    merge.{label}: {now - _last[0]:.1f}s", flush=True)
                _last[0] = now

        m = self.manifest()
        key = m["key"]
        nb = m["bucket_count"]

        # ---- fence: already-applied batch => exact no-op -------------
        if str(batch_id) in m["applied_batches"]:
            return MergeResult(batch_id, None, True, 0, 0, 0, None, None, 0, 0)

        # ---- additive schema evolution -------------------------------
        table_schema = T.StructType.fromJson(m["schema"])
        payload_cols = [c for c in batch_df.columns if c not in (op_col, lsn_col)]
        known = set(table_schema.fieldNames())
        new_fields = [
            T.StructField(f.name, f.dataType, True)
            for f in batch_df.schema.fields
            if f.name in payload_cols and f.name not in known
        ]
        if new_fields:
            table_schema = T.StructType(list(table_schema.fields) + new_fields)
        data_cols = [f.name for f in table_schema.fields if f.name != LSN_COL]

        # ---- source: align to evolved schema, rename lsn -> _lsn -----
        src = batch_df.withColumnRenamed(lsn_col, LSN_COL)
        src = _align(src, table_schema, keep=[op_col]).persist()
        try:
            # ---- ONE job: touched buckets + audit numbers per bucket --
            # (bucket discovery for pruning and the audit stats share a
            # scan; the groupBy on ~nb groups collects a tiny result)
            bstats = (
                src.groupBy(_bucket_expr(key, nb).alias("_b"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min(LSN_COL).alias("mn"),
                    F.max(LSN_COL).alias("mx"),
                    F.sum(F.when(F.col(op_col) == "D", 1).otherwise(0)).alias("dels"),
                )
                .collect()
            )
            touched = [r["_b"] for r in bstats]
            _tick("bstats")
            if pre_write_hook is not None:
                pre_write_hook()  # may raise -> clean abort, nothing committed
            # read target files with the EVOLVED schema so new columns
            # surface as typed NULLs on pre-evolution rows
            tgt_files = self._files(m, touched)
            if tgt_files:
                tgt = spark.read.schema(table_schema).parquet(*tgt_files)
            else:
                tgt = spark.createDataFrame([], table_schema)
            tgt = tgt.withColumn(op_col, F.lit("K"))

            # ---- last-writer-wins resolution (one shuffle on key) ----
            # union(target rows, batch rows) -> max_by(payload, _lsn).
            # Replayed rows tie on _lsn with identical payloads, so ties
            # are benign; tombstone replays have no target row to tie with.
            all_cols = data_cols + [LSN_COL, op_col]
            unioned = tgt.select(*all_cols).unionByName(src.select(*all_cols))
            winner = F.max_by(F.struct(*[c for c in all_cols if c != key]), F.col(LSN_COL))
            resolved = (
                unioned.groupBy(key)
                .agg(winner.alias("_w"))
                .select(key, "_w.*")
            )
            result = resolved.filter(F.col(op_col) != "D").drop(op_col)

            # ---- lineage: per-bucket applied-LSN ranges + row counts,
            # from the SAME per-bucket stats job that found the touched
            # buckets (no extra pass; "what this batch applied per
            # partition" is the north-rule lineage semantics)
            lineage: list[dict[str, Any]] = []
            if collect_lineage:
                lineage = [
                    {
                        "batch_id": batch_id,
                        "bucket": r["_b"],
                        "row_count": r["n"],
                        "min_lsn": r["mn"],
                        "max_lsn": r["mx"],
                    }
                    for r in bstats
                ]

            # ---- write touched buckets (the only job over the
            # resolution; no persist needed). The writer splits each
            # task's rows into per-bucket files via partitionBy, so no
            # extra repartition-by-bucket shuffle is needed: that
            # second wide shuffle of the full payload bought nothing
            # but one-file-per-bucket cosmetics. Files per commit are
            # bounded by (AQE-coalesced resolve partitions x touched
            # buckets), and each commit REPLACES the touched buckets'
            # file lists in the manifest, so counts never accumulate;
            # compact() exists for pathological cases. ----------------
            v = m["version"] + 1
            new_files, n_out = self._write_bucketed(
                spark, result, {**m, "schema": table_schema.jsonValue()}, v
            )
            _tick("write_bucketed")
        finally:
            src.unpersist()

        # ---- audit numbers (folded from the per-bucket stats job) -----
        agg = {
            "rows_in": sum(r["n"] for r in bstats),
            "min_lsn": min((r["mn"] for r in bstats), default=None),
            "max_lsn": max((r["mx"] for r in bstats), default=None),
            "dels": sum(r["dels"] for r in bstats),
        }

        # ---- manifest: new files for touched buckets, inherit rest ---
        buckets = dict(m["buckets"])
        for b in touched:
            buckets[str(b)] = new_files.get(str(b), [])
        applied = dict(m["applied_batches"])
        audit = {
            "batch_id": batch_id,
            "operation": "merge",
            "rows_in": agg["rows_in"],
            "rows_applied": agg["rows_in"] - agg["dels"],
            "rows_deleted": agg["dels"],
            "min_lsn": agg["min_lsn"],
            "max_lsn": agg["max_lsn"],
            "touched_buckets": len(touched),
            "version": v,
            **(extra_audit or {}),
        }
        applied[str(batch_id)] = {"version": v, "op": "merge"}
        manifest = {
            **m,
            "version": v,
            "parent": m["version"],
            "schema": table_schema.jsonValue(),
            "buckets": buckets,
            "applied_batches": _cap(applied),
            "audit": audit,
            "lineage": lineage,
            "summary": {"operation": "merge", "rows_written": n_out},
            "committed_at": _utc_now_iso(),
        }
        self._write_manifest(manifest, expected_parent=m["version"])
        dt = int((time.monotonic() - t0) * 1000)
        return MergeResult(
            batch_id, v, False, agg["rows_in"], agg["rows_in"] - agg["dels"],
            agg["dels"], agg["min_lsn"], agg["max_lsn"], len(touched), dt,
        )

    def compact(self, spark: SparkSession, max_files_per_bucket: int = 4) -> int | None:
        """Rewrite buckets holding too many small files (Iceberg:
        rewrite_data_files; reference analogue: Vertica mergeout every N
        inserts, /root/reference/src/YADAMU/vertica/node/verticaWriter.js
        :467-484)."""
        m = self.manifest()
        fat = [int(b) for b, fl in m["buckets"].items() if len(fl) > max_files_per_bucket]
        if not fat:
            return None
        df = self.read(spark, buckets=fat).repartition(
            len(fat), _bucket_expr(m["key"], m["bucket_count"])
        )
        v = m["version"] + 1
        new_files, _ = self._write_bucketed(spark, df, m, v)
        buckets = dict(m["buckets"])
        for b in fat:
            buckets[str(b)] = new_files.get(str(b), [])
        manifest = {
            **m,
            "version": v,
            "parent": m["version"],
            "buckets": buckets,
            "audit": None,
            "lineage": [],
            "summary": {"operation": "compact", "buckets_rewritten": len(fat)},
            "committed_at": _utc_now_iso(),
        }
        self._write_manifest(manifest, expected_parent=m["version"])
        return v

    # ------------------------------------------------------------------
    def _write_bucketed(
        self, spark: SparkSession, df: DataFrame, m: dict[str, Any], version: int
    ) -> tuple[dict[str, list[str]], int]:
        """Write df partitioned by bucket under data/c{version}; return
        {bucket: [relative file paths]} and the row count (via observe,
        no extra job)."""
        key, nb = m["key"], m["bucket_count"]
        from pyspark.sql import Observation

        obs = Observation(f"write_v{version}")
        out_dir = os.path.join(self.root, DATA_DIR, f"c{version:012d}")
        (
            df.withColumn("_b", _bucket_expr(key, nb))
            .observe(obs, F.count(F.lit(1)).alias("rows"))
            .write.partitionBy("_b")
            .parquet(out_dir)
        )
        n_rows = obs.get["rows"]
        rel = os.path.join(DATA_DIR, f"c{version:012d}")
        files: dict[str, list[str]] = {}
        if os.path.exists(out_dir):
            for d in os.listdir(out_dir):
                if d.startswith("_b="):
                    b = d.split("=", 1)[1]
                    files[b] = [
                        os.path.join(rel, d, f)
                        for f in os.listdir(os.path.join(out_dir, d))
                        if f.endswith(".parquet")
                    ]
        return files, n_rows


# ----------------------------------------------------------------------
def _align(df: DataFrame, schema: T.StructType, keep: list[str] | None = None) -> DataFrame:
    """Project df onto schema column order, adding missing columns as
    typed NULLs and casting to the table types (the engine's analogue of
    the reference's canonical type conversion layer,
    /root/reference/src/YADAMU/common/yadamuLibrary.js:10-67)."""
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    for k in keep or []:
        if k in df.columns:
            cols.append(F.col(k))
    return df.select(*cols)


def _cap(applied: dict[str, Any], keep: int = 1000) -> dict[str, Any]:
    """Bound the fencing ledger. Streaming batch ids are monotonic, so
    only recent ids can ever be replayed; 1000 is far beyond any
    realistic replay window."""
    if len(applied) <= keep:
        return applied
    items = sorted(applied.items(), key=lambda kv: kv[1]["version"])
    return dict(items[-keep:])


def _utc_now_iso() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
