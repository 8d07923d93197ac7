"""OLAP surface shapes the relational catalog didn't cover yet:
multi-level grouping sets (Spark's Expand operator), pivot
(conditional-aggregation rewrite), and running-total window frames.

Reference parity: the reference's QA harness validates replicated
tables with arbitrary user aggregations (/root/reference/src/YADAMU/qa/
utilities/yadamuQA.js:327-470); these are the remaining core SQL
aggregation forms an analyst would run over a migrated schema.

Cross-engine exactness: subtotal rows from ROLLUP put NULLs in the
grouped columns, indistinguishable from genuine NULL group values --
both sides emit GROUPING() markers so the compare is unambiguous; all
money stays DECIMAL until one final round->double; running totals sum
DECIMAL over a deterministic total order (ts, event_id).

Scale notes: ROLLUP is one Expand (row replication factor = #grouping
sets) feeding ONE hash aggregate -- no per-level re-scan; pivot is a
single groupBy with conditional partial aggs (never one job per pivot
value); the running total shuffles once on user_id and sorts within
partitions -- per-user frames never cross partitions, so no global
sort and no partition-less window."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .catalog import _dec, _register, load


@_register(
    "olap_rollup_hierarchy",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(GROUPING(r.r_name) AS INT) * 2
             + CAST(GROUPING(n.n_name) AS INT) AS gid,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(15,2))), 4)
                AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def olap_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: order count + total price by
    region -> nation -> grand total in ONE pass (GROUP BY ROLLUP).
    The gid column (Spark grouping_id == bit-packed GROUPING() flags)
    disambiguates subtotal NULLs from genuine NULL dims, and is
    computed identically in the DuckDB oracle from GROUPING() bits.
    Scale: Catalyst plans one Expand (3 grouping sets -> 3x row
    replication of only the two grouping columns + agg inputs) into a
    single hash aggregate with map-side partial agg -- not one scan
    per level; dims broadcast onto the orders scan."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    df = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            _dec("o_totalprice").alias("price"),
        )
    )
    return (
        df.rollup("region", "nation")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 4).cast("double").alias("total_price"),
        )
        .select("region", "nation", "gid", "n_orders", "total_price")
    )


@_register(
    "olap_pivot_status_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS P
    FROM orders
    GROUP BY 1
    """,
)
def olap_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts cross-tabulated priority x status. The pivot
    value list is EXPLICIT (['F','O','P']) -- with an inferred list
    Spark runs an extra distinct job and the output schema becomes
    data-dependent, which breaks both scale and a stable driver
    contract. Catalyst rewrites this to exactly the oracle's shape: one
    groupBy with three conditional partial aggs, one shuffle on a
    5-value key."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@_register(
    "olap_running_total",
    """
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW), 6)
                AS DOUBLE) AS running_value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS seq
    FROM events
    WHERE user_id % 97 = 0
    """,
)
def olap_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window frame: per-user cumulative value over event
    time (the account-balance / usage-meter query). The frame order is
    the total key (ts, event_id) so ties are deterministic, and the
    accumulator is DECIMAL so the prefix sums are order-exact across
    engines. The user sample keeps the verified result bounded; the
    operator itself is full-table-shaped. Scale: one shuffle on
    user_id (never a global order), in-partition sort, single window
    operator computing both frames; the modulo filter pushes to the
    scan."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") % 97 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum(_dec("value", 18, 6)).over(frame), 6)
        .cast("double").alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@_register(
    "events_windowed_topk",
    """
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
             COUNT(*) AS n_events,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
               AS value_sum
      FROM events GROUP BY 1, 2
    )
    SELECT day, user_id, n_events, value_sum, rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY day
                                       ORDER BY n_events DESC, user_id) AS rank
          FROM daily)
    WHERE rank <= 2
    """,
)
def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per time window (the 'trending' query): daily top-2 users
    by event count with a deterministic (count DESC, user_id) tiebreak.
    Day keys are emitted as yyyy-MM-dd STRINGS -- DuckDB DATE and Spark
    date stringify differently through the compare layers.

    Scale: the pre-aggregation is algebraic (map-side combine collapses
    the 10^10-event scan to |days x users| partials), and the ranked
    window partitions BY DAY -- thousands of independent groups, never
    a global order. This is the shape TakeOrderedAndProject cannot
    cover (top-k per group, not overall); the per-group row count
    after pre-agg is bounded by the user population, so no group
    funnels the corpus through one task."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(_dec("value", 18, 6)), 4).cast("double").alias("value_sum"),
    )
    w = W.partitionBy("day").orderBy(F.col("n_events").desc(), "user_id")
    return (
        daily.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("day", "user_id", "n_events", "value_sum", "rank")
    )


@_register(
    "olap_value_percentiles",
    """
    WITH cd AS (
      SELECT event_type, value,
             CUME_DIST() OVER (PARTITION BY event_type ORDER BY value) AS cd
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           MIN(CASE WHEN cd >= 0.5 THEN value END) AS p50,
           MIN(CASE WHEN cd >= 0.9 THEN value END) AS p90,
           MIN(CASE WHEN cd >= 0.99 THEN value END) AS p99
    FROM cd GROUP BY event_type
    """,
)
def olap_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles per group via the ANSI
    ``percentile_disc(p) WITHIN GROUP (ORDER BY v)`` aggregate (the
    monitoring-dashboard staple). Discrete -- the result is an actual
    data value, so the cross-engine compare is exact where an
    interpolated ``percentile_cont`` would differ in the last ulp; the
    oracle replicates the ANSI definition (smallest value whose
    cumulative distribution reaches p) with a window, pinning Spark's
    semantics rather than trusting DuckDB's rounding convention.

    Scale: one shuffle on event_type; percentile_disc aggregates
    buffer per-group sorted values -- bounded by group cardinality
    (here 5 groups), the same cost class as Spark's own percentile. A
    sketch alternative (t-digest/KLL) is the approximate path at
    unbounded group width."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
        """
    )
