"""The pure micro-batch apply function (SURVEY.md §7.1 minimum slice).

``apply_batch(table, batch_df, batch_id)`` is the entire data plane of
the engine, kept pure so the Structured Streaming ``foreachBatch`` body
is exactly this function (SURVEY.md §7.1: "keep it pure").

Stages (each one shuffle at most; lineage in the commit manifest):

1. **validate / quarantine split** -- poison events (NULL url, NULL lsn,
   unknown op, missing html on I/U) are routed to a side quarantine
   table instead of failing the batch. Reference analogue: the reject
   manager + iterative-mode fallback
   (/root/reference/src/YADAMU/common/yadamuRejectManager.js:48-108,
   /root/reference/src/YADAMU/common/yadamuWriter.js:467-504) -- in
   Spark there is no row-at-a-time retry, so the batch is *split* into
   good/bad DataFrames up front. ON_ERROR=ABORT analogue: abort when
   quarantined rows exceed ``max_errors``
   (TABLE_MAX_ERRORS=10, /root/reference/src/YADAMU/common/
   dbiConstants.js:12).
2. **extract** -- html -> text via the Arrow-vectorized pandas UDF
   (functions.extract), only for I/U events.
3. **last-LSN-wins dedup** -- two-phase *salted* reduction: first
   groupBy(url, salt) (spreads a hot url over S reducers), then
   groupBy(url). With skewed keys (one url carrying a large share of a
   batch) the single-phase reduction serializes on one task; the salted
   pre-reduce is the classic two-phase combiner. Salting applies ONLY
   to this reduction shuffle, never to the merge key itself
   (SURVEY.md §7.2 risk note).
4. **MERGE** into the LakeTable (LSN-monotonic, batch-id fenced,
   copy-on-write on touched buckets only).

Exactly-once: the quarantine write is made idempotent by overwriting a
per-batch partition directory; the merge is fenced in the manifest. A
replayed batch therefore leaves every output byte-identical.

Metrics invariant (tested):
``rows_in == rows_merged_in + rows_deduped + rows_quarantined``
-- the reference's writer reconciliation ``rowsRead == committed + lost
+ skipped`` (/root/reference/src/YADAMU/common/yadamuWriter.js:813-815).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.extract import extract_text
from ..sources.laketable import LakeTable, MergeResult

QUARANTINE_DIR = "quarantine"


class BatchAborted(RuntimeError):
    """Raised when quarantined rows exceed the max-errors policy
    (ON_ERROR=ABORT, /root/reference/src/YADAMU/common/yadamuWriter.js
    :678-708)."""


@dataclass
class BatchMetrics:
    batch_id: int
    rows_in: int
    rows_quarantined: int
    rows_deduped: int
    rows_merged_in: int
    rows_deleted: int
    fenced: bool
    version: int | None
    duration_ms: int

    def check_invariant(self) -> None:
        assert self.rows_in == self.rows_merged_in + self.rows_deduped + self.rows_quarantined, (
            f"Inconsistent Metrics: in={self.rows_in} merged={self.rows_merged_in} "
            f"deduped={self.rows_deduped} quarantined={self.rows_quarantined}"
        )

    def as_dict(self) -> dict[str, Any]:
        return dict(self.__dict__)


def _tag_quarantine(df: DataFrame, op_col: str = "op", key: str = "url",
                    lsn_col: str = "lsn", html_col: str = "html") -> DataFrame:
    """Add a ``_reason`` column (NULL == valid row). The payload-presence
    check applies only when the payload column exists in this changelog's
    schema."""
    reason = (
        F.when(F.col(key).isNull(), "null_key")
        .when(F.col(lsn_col).isNull(), "null_lsn")
        .when(~F.col(op_col).isin("I", "U", "D"), "bad_op")
    )
    if html_col in df.columns:
        reason = reason.when(
            (F.col(op_col) != "D") & F.col(html_col).isNull(), "null_html"
        )
    return df.withColumn("_reason", reason)


def quarantine_split(df: DataFrame, op_col: str = "op", key: str = "url",
                     lsn_col: str = "lsn", html_col: str = "html") -> tuple[DataFrame, DataFrame]:
    """Split a raw event batch into (valid, quarantined-with-reason)."""
    tagged = _tag_quarantine(df, op_col, key, lsn_col, html_col)
    return (
        tagged.filter(F.col("_reason").isNull()).drop("_reason"),
        tagged.filter(F.col("_reason").isNotNull()),
    )


def last_lsn_dedup(df: DataFrame, key: str = "url", lsn_col: str = "lsn",
                   salt_buckets: int = 0) -> DataFrame:
    """Last-writer-wins: keep the max-lsn event per key.

    Exact duplicates (same lsn re-delivered) collapse here too: max_by
    picks one of the identical rows.

    Skew note (measured, sandbox local[32], 100k-event batch):
    ``max_by`` has a *partial* aggregate, so every map task combines its
    hot-key rows to one row BEFORE the shuffle -- map-side combine is
    the skew defense for algebraic aggregations, and an extra salt
    phase only doubles the work. Because the payload struct (html
    binary) is not fixed-width, Catalyst lowers max_by to
    SortAggregate; the salted two-phase variant therefore sorts the
    wide batch four times instead of two, measured 40.5s vs 1.6s per
    100k-row batch. ``salt_buckets > 0`` keeps the two-phase path
    available for operators WITHOUT partial aggregation (window-rank
    style), which is where salting genuinely pays; the engine default
    is 0.
    """
    payload = [c for c in df.columns if c != key]
    if salt_buckets > 0:
        salt = F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(salt_buckets))
        partial = (
            df.groupBy(F.col(key), salt.alias("_salt"))
            .agg(F.max_by(F.struct(*payload), F.col(lsn_col)).alias("_w"))
            .select(key, "_w.*")
        )
    else:
        partial = df
    return (
        partial.groupBy(key)
        .agg(F.max_by(F.struct(*[c for c in partial.columns if c != key]),
                      F.col(lsn_col)).alias("_w"))
        .select(key, "_w.*")
    )


def apply_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: int,
    key: str = "url",
    op_col: str = "op",
    lsn_col: str = "lsn",
    salt_buckets: int = 0,
    max_errors: int | None = None,
    run_extract: bool = True,
) -> BatchMetrics:
    """Apply one micro-batch of change events to ``table``. Pure:
    (table, df, batch_id) -> metrics; safe to replay."""
    spark = batch_df.sparkSession

    # fence first: a replayed batch must not even re-count
    if table.is_applied(batch_id):
        return BatchMetrics(batch_id, 0, 0, 0, 0, 0, True, None, 0)

    # Input/quarantine counts ride on an Observation attached above the
    # validity filter; the merge's per-bucket stats job (which
    # materializes the reduced batch) fires it, so a clean batch costs
    # exactly TWO Spark jobs: merge stats + merge write. The quarantine
    # write is a third job only when bad rows actually exist -- it runs
    # inside the merge's pre-write hook, i.e. still strictly BEFORE the
    # commit, so a crash between quarantine write and merge commit
    # replays both (the quarantine write is an idempotent per-batch
    # directory overwrite).
    from pyspark.sql import Observation

    obs = Observation(f"apply_batch_{batch_id}")
    tagged = _tag_quarantine(batch_df, op_col, key, lsn_col).observe(
        obs, F.count(F.lit(1)).alias("n_in"), F.count("_reason").alias("n_bad")
    )
    valid = tagged.filter(F.col("_reason").isNull()).drop("_reason")

    # last-writer-wins, scale path: a NARROW argmax shuffle (key + lsn
    # only, ~tens of bytes/row, map-side combined) finds each key's
    # winning lsn, then a semi-join fetches the winner payloads. AQE
    # broadcasts the winner set when small (64 MB threshold in
    # session.py/bench.py), so the wide html payload is never shuffled
    # by the dedup at all in the common case; past the threshold it
    # falls back to a shuffle join -- either way no SortAggregate over
    # wide structs (measured: the wide max_by shuffle was the dominant
    # non-scaling cost at 1M-event batches). Exact redelivered
    # duplicates (same key AND lsn -- by CDC contract byte-identical
    # events) survive this reduction; the merge's resolution collapses
    # them via a benign max_by tie. The strict one-row-per-key operator
    # remains last_lsn_dedup (public catalog); passing salt_buckets > 0
    # selects it with two-phase salting.
    if salt_buckets > 0:
        reduced = last_lsn_dedup(valid, key, lsn_col, salt_buckets)
    else:
        winners = valid.groupBy(key).agg(F.max(lsn_col).alias(lsn_col))
        reduced = valid.join(winners, on=[key, lsn_col], how="leftsemi")

    # extract AFTER dedup: text is a pure function of html, so only
    # winner rows need the pandas UDF (fewer rows through Python),
    # and the dedup reduction sorts/shuffles a narrower payload
    if run_extract and "html" in reduced.columns:
        reduced = reduced.withColumn(
            "text",
            F.when(F.col(op_col) != "D", extract_text(F.col("html"))),
        )

    # filled by the hook once the observation has fired; doubles as the
    # extra_audit dict (merge reads it at manifest-build time, after the
    # hook has populated it)
    counts: dict[str, int] = {}

    def _pre_write() -> None:
        got = obs.get
        counts["rows_batch_in"] = got["n_in"]
        counts["rows_quarantined"] = got["n_bad"]
        if max_errors is not None and got["n_bad"] > max_errors:
            raise BatchAborted(
                f"batch {batch_id}: {got['n_bad']} quarantined > max_errors={max_errors}"
            )
        if got["n_bad"] > 0:
            qdir = os.path.join(table.root, QUARANTINE_DIR, f"batch_id={batch_id}")
            (
                _tag_quarantine(batch_df, op_col, key, lsn_col)
                .filter(F.col("_reason").isNotNull())
                .withColumn("_batch_id", F.lit(batch_id))
                .withColumnRenamed("_reason", "reason")
                .write.mode("overwrite")  # idempotent on replay
                .parquet(qdir)
            )

    res: MergeResult = table.merge(
        spark,
        reduced,
        batch_id,
        op_col=op_col,
        lsn_col=lsn_col,
        extra_audit=counts,
        pre_write_hook=_pre_write,
    )
    n_in, n_bad = counts["rows_batch_in"], counts["rows_quarantined"]

    metrics = BatchMetrics(
        batch_id=batch_id,
        rows_in=n_in,
        rows_quarantined=n_bad,
        rows_deduped=n_in - n_bad - res.rows_in,
        rows_merged_in=res.rows_in,
        rows_deleted=res.rows_deleted,
        fenced=res.fenced,
        version=res.version,
        duration_ms=res.duration_ms,
    )
    metrics.check_invariant()
    return metrics


def quarantine_df(spark, table: LakeTable) -> DataFrame | None:
    """Read the quarantine side table (None if empty)."""
    qroot = os.path.join(table.root, QUARANTINE_DIR)
    if not os.path.exists(qroot) or not os.listdir(qroot):
        return None
    return spark.read.option("basePath", qroot).parquet(qroot)
