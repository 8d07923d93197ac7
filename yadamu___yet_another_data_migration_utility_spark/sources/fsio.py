"""Filesystem seam for LakeTable metadata/data I/O.

LakeTable's correctness rests on exactly TWO storage primitives, both
isolated here so an object-store port swaps one class, not the table:

1. ``put_if_absent(path, data)`` -- publish an IMMUTABLE object at a
   unique name, failing if the name is taken. This is the commit CAS:
   manifest names encode the version (``v{N}.json``), so whoever
   publishes ``v{N}`` first owns version N; the loser rebases.
   - Local: write a tmp file, fsync, ``os.link`` to the final name
     (atomic on POSIX; EEXIST == lost the race). The linked file is
     complete-or-absent -- readers never see a torn manifest.
   - S3 port point: conditional ``PUT`` with ``If-None-Match: *``
     (natively supported; 412 == lost the race). No rename involved --
     the classic "S3 rename is not atomic" problem never arises
     because nothing here renames a visible object.
2. ``put_atomic(path, data)`` -- overwrite a small mutable HINT object
   (the ``_current`` pointer). The pointer is a cache, not the source
   of truth: readers roll forward past it by probing for newer
   manifests (see LakeTable.current_version), so a stale or lost
   pointer write costs a few existence checks, never correctness.
   - Local: tmp + fsync + rename. S3: plain PUT (strongly consistent).

Everything else (listdir/walk/remove for retention, open_read for
parquet footers) is plain namespace traversal with direct object-store
analogues (LIST/DELETE/GET). Data files are written by Spark itself --
point the table root at an ``s3a://`` URI and Spark's committers handle
the data plane; this seam covers the metadata plane.

Reference capability this replaces: the loader's pluggable storage
services -- /root/reference/src/YADAMU/loader/node/cloudDBI.js:1-194
(one DBI, swappable file/S3/Azure backends) and
loader/awsS3/awsS3StorageService.js (PUT/GET/LIST primitives).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import IO, Iterator


class CommitConflict(RuntimeError):
    """Another writer published this manifest version first (or the
    claimed name already exists). Retryable: re-read the head and
    rebase -- see LakeTable._commit_with_rebase."""


class LocalFS:
    """POSIX implementation. All paths are plain local paths."""

    # -- commit primitives ---------------------------------------------
    def put_if_absent(self, path: str, data: str) -> None:
        """Publish an immutable object at ``path``; raise CommitConflict
        if the name is already taken. Complete-or-absent: the content is
        durable (fsync) before the name becomes visible (link)."""
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)  # atomic claim: EEXIST == lost the race
        except FileExistsError:
            raise CommitConflict(
                f"commit conflict: {os.path.basename(path)} already published"
            ) from None
        finally:
            os.remove(tmp)

    def put_atomic(self, path: str, data: str) -> None:
        """Overwrite a small mutable object (pointer hint) atomically."""
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    # -- reads -----------------------------------------------------------
    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def open_read(self, path: str) -> IO[bytes]:
        """Binary reader (parquet footer stats). S3 analogue: ranged GET
        via pyarrow.fs.S3FileSystem.open_input_file."""
        return open(path, "rb")

    # -- namespace traversal ----------------------------------------------
    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        # idempotent by contract: object stores have no directories (a
        # "mkdir" is a no-op there), and crash-retried creators (e.g.
        # create_branch, which CASes on the metadata put AFTER the
        # mkdir) must be able to re-run past a half-created dir
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def walk_bottom_up(self, path: str) -> Iterator[tuple[str, list[str], list[str]]]:
        yield from os.walk(path, topdown=False)

    # -- deletes (retention / abort cleanup) ------------------------------
    def remove(self, path: str) -> None:
        os.remove(path)

    def rmdir_if_empty(self, path: str) -> None:
        if not os.listdir(path):
            os.rmdir(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    # -- Spark handoff -----------------------------------------------------
    def spark_path(self, path: str) -> str:
        """URI Spark should use for this path (identity locally; an
        object-store FS returns the s3a:// form)."""
        return path
