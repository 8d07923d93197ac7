"""Temporal operators: distributed as-of join and sessionization.

Two time-semantics operators a CDC/web-event pipeline needs beyond
tumbling windows:

- ``cdc_asof_join``: point-in-time lookup -- for every probe event,
  the state of its key AS OF the probe's (ts, lsn) position in the
  changelog. Spark has no ASOF JOIN operator; the scalable composition
  is the union-then-window trick: tag changes and probes, sort each
  key's timeline once, and carry the last-seen change forward with
  ``last(..., ignorenulls=True)``. ONE shuffle on the key + one
  per-key sort -- no range join, no per-probe scan, no O(probes x
  versions) blow-up. (A join-based spelling is what the oracle runs;
  at 100 TB it degenerates into exactly the quadratic the union-window
  avoids.)
- ``events_sessionization``: gaps-and-islands session assembly (30-min
  inactivity gap) -- LAG to flag session starts, running SUM to number
  sessions, then an algebraic rollup. One shuffle on user_id; window
  and rollup share the partitioning, so Catalyst plans a single
  Exchange.

Reference tie-in: the reference replicates only the LATEST state
(yadamuDBI round-trip); as-of reconstruction and sessionization are the
CDC re-framing's temporal additions, like cdc_scd2_history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..streaming.stream import SESSION_GAP_US
from .catalog import _CDC_SQL_SRC, _register, _sum_dbl, cdc_changelog, load

#: SESSION_GAP_US is shared with the streaming twin (streaming/stream.py
#: start_url_sessions) -- ONE source of truth for the 30-min gap; both
#: engines compare integer microseconds, no sub-second truncation
#: ambiguity


@_register(
    "cdc_asof_join",
    f"""
    WITH chg AS ({_CDC_SQL_SRC}),
    probes AS (
      SELECT lsn AS probe_lsn, url, ts AS probe_ts
      FROM chg WHERE event_type = 'purchase'
    ),
    matched AS (
      SELECT p.probe_lsn, p.url, p.probe_ts,
             c.lsn AS asof_lsn, c.op AS asof_op,
             c.event_type AS asof_event_type, c.value AS asof_value,
             ROW_NUMBER() OVER (PARTITION BY p.probe_lsn
                                ORDER BY c.ts DESC, c.lsn DESC) AS rn
      FROM probes p JOIN chg c
        ON c.url = p.url
       AND (c.ts < p.probe_ts OR (c.ts = p.probe_ts AND c.lsn <= p.probe_lsn))
    )
    SELECT probe_lsn, url, probe_ts, asof_lsn, asof_op, asof_event_type, asof_value
    FROM matched WHERE rn = 1
    """,
)
def cdc_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for every purchase probe, the latest change to its
    url with changelog position (ts, lsn) <= the probe's -- i.e. the
    row state the purchase actually saw. The probe's own change event
    counts (<=), so every probe matches and the result is total.

    Spark composition (see module docstring): union changes + probes,
    ONE window per url ordered by (ts, lsn, is_probe) -- the change
    copy of an event sorts before its probe copy, so equality
    semantics match the oracle's lexicographic (ts, lsn) max -- and
    ``last(state_struct, ignorenulls=True)`` carries state forward.
    The state rides ONE nullable struct column, so all asof_* fields
    come from the SAME matched row even when payload fields are null.
    The oracle spells the declarative (quadratic) join+ROW_NUMBER form.
    """
    chg = cdc_changelog(spark, sf_dir)
    state = F.struct(
        F.col("lsn").alias("asof_lsn"),
        F.col("op").alias("asof_op"),
        F.col("event_type").alias("asof_event_type"),
        F.col("value").alias("asof_value"),
    )
    changes = chg.select(
        "url", "ts", "lsn", F.lit(0).alias("is_probe"), state.alias("_st")
    )
    probes = chg.filter(F.col("event_type") == "purchase").select(
        "url", "ts", "lsn", F.lit(1).alias("is_probe"),
        F.when(F.lit(False), state).alias("_st"),  # typed NULL struct
    )
    w = (
        W.partitionBy("url")
        .orderBy("ts", "lsn", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    timeline = changes.unionByName(probes).withColumn(
        "_asof", F.last("_st", ignorenulls=True).over(w)
    )
    return timeline.filter(F.col("is_probe") == 1).select(
        F.col("lsn").alias("probe_lsn"),
        "url",
        F.col("ts").alias("probe_ts"),
        "_asof.asof_lsn", "_asof.asof_op", "_asof.asof_event_type", "_asof.asof_value",
    )


@_register(
    "events_sessionization",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ),
    sess AS (
      SELECT *,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,3))), 4) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, session_idx
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization by 30-min inactivity gap (gaps-and-islands): LAG
    flags session starts, a running SUM numbers each user's sessions,
    then a per-session rollup. Gap compare runs in integer MICROseconds
    on both engines (no sub-second truncation drift). Scale: the LAG
    window, the running SUM and the final groupBy all partition by
    user_id -- one Exchange total, per-key sort, spill-safe; this is
    the batch shape of the streaming session_window aggregation."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # timestamp_diff on TIMESTAMP_NTZ is pure wall-clock microseconds
    # (tested DST-immune even under a zoned session) -- exactly DuckDB's
    # epoch_us(a) - epoch_us(b)
    gap_us = F.timestamp_diff("MICROSECOND", prev, F.col("ts"))
    new_s = (prev.isNull() | (gap_us > SESSION_GAP_US)).cast("long")
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = e.select("user_id", "event_id", "ts", "value").withColumn(
        "session_idx", F.sum(new_s).over(run)
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.timestamp_diff("MICROSECOND", F.min("ts"), F.max("ts")).alias("duration_us"),
        _sum_dbl(F.col("value").cast("decimal(18,3)")).alias("sum_value"),
    )
