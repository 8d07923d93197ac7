"""Mergeable approximate sketches: HyperLogLog distinct counting and a
Count-Min frequency sketch, both deterministic across engines.

Why sketches belong in a 100 TB engine: COUNT(DISTINCT) over 10^10
events shuffles every distinct value; a sketch is an ALGEBRAIC
aggregate -- per-partition partial states (a handful of integers)
merge associatively, so the whole job is one map-side-combined pass
with O(registers) bytes per group crossing the wire. Spark's own
approx_count_distinct is exactly this shape but its hash (xxhash64
with engine-private seeding) cannot be replicated in the oracle;
these sketches use the suite's md5 contract so every register value,
counter cell and final estimate is bit-identical in DuckDB and the
hash gate checks the SKETCH, not just a tolerance.

Cross-engine determinism rules (hard-won, see plans/catalog.py):
- hashes: md5 -> 60-bit integer (the shared _MD5_LONG_SQL contract);
- no transcendentals (ln/log2 differ in the last ulp between libms):
  HLL's harmonic sum is computed as an INTEGER (each 2^-rho term
  scaled by 2^55 via shiftleft), and register rho values come from
  the length of bin(x), not floor(log2); hash-splitting uses integer
  DIV, never float division (the 60-bit hash exceeds double range);
- the only float ops are literal-constant arithmetic and one final
  multiply/divide -- IEEE-exact given identical inputs -- rounded to
  4 decimals at the very end.

Reference: the reference engine has no sketch layer (its rowCount
parity checks are exact, src/YADAMU/qa/yadamuQA.js); this extends the
correctness-harness family (SURVEY §2.b) with the estimators a
web-scale changelog pipeline actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketchlib import (
    MD5_LONG_SQL as _MD5_LONG_SQL,
    hll_denom_term,
    hll_rho,
    md5_long as _md5_long,
)
from .catalog import _register, load

HLL_M = 64           # registers per sketch (2^6)
HLL_REST_BITS = 54   # md5-long is 60 bits; 6 go to the bucket index
# alpha_64 per Flajolet et al. 2007; spelled as the same literal
# arithmetic in both engines so the doubles are identical
_ALPHA_EXPR = "0.709 * {m} * {m}".format(m=HLL_M)

CMS_W = 32           # counter width per hash row
CMS_D = 3            # independent hash rows
CMS_PROBE_MOD = 19   # probe shard: user_id % CMS_PROBE_MOD == 0

_HLL_SQL = f"""
    WITH h AS (
      SELECT event_type,
             user_id,
             {_MD5_LONG_SQL.format(x="concat('hll:', CAST(user_id AS VARCHAR))")} AS hv
      FROM events
    ),
    parts AS (
      SELECT event_type, user_id,
             hv % {HLL_M} AS bucket,
             hv // {HLL_M} AS rest
      FROM h
    ),
    regs AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN rest = 0 THEN {HLL_REST_BITS} + 1
                      ELSE {HLL_REST_BITS} - length(bin(rest)) + 1 END) AS m
      FROM parts GROUP BY event_type, bucket
    ),
    sums AS (
      SELECT event_type,
             COUNT(*) AS nonzero,
             SUM(1::BIGINT << ({HLL_REST_BITS} + 1 - m)) AS denom_used
      FROM regs GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.n_events, e.exact_distinct,
           CAST(s.nonzero AS INT) AS nonzero_registers,
           ROUND(({_ALPHA_EXPR}) * (1::BIGINT << ({HLL_REST_BITS} + 1))
                 / (s.denom_used + ({HLL_M} - s.nonzero)
                    * (1::BIGINT << ({HLL_REST_BITS} + 1))), 4) AS hll_raw_est
    FROM exact e JOIN sums s USING (event_type)
"""


@_register("events_distinct_hll", _HLL_SQL)
def events_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event_type, next to the
    exact count. Register index = md5(user)%64; register value rho =
    leading-zero rank of the remaining 54 hash bits (via length(bin),
    never floor(log2)); the harmonic denominator is summed as exact
    integers (2^(55-rho) per register, empty registers contribute
    2^55) so the raw estimate alpha*m^2/sum(2^-rho_j) is bit-identical
    in both engines. Raw HLL only -- the small-range linear-counting patch
    needs ln(), which is not ulp-stable cross-engine; nonzero_registers
    is emitted so a consumer can apply it.

    Scale: two algebraic aggs (MAX per register, then SUM per group).
    Partials are 64 small ints per group per partition -- map-side
    combine eats the 10^10-event scan and the shuffle moves sketches,
    not users. Sketches for disjoint slices MERGE by register-max, so
    per-day partial sketches roll up to any window for free."""
    ev = load(spark, sf_dir, "events")
    hv = _md5_long(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    # integer DIV, never float division: hv is up to 2^60 -- beyond
    # double exactness -- and the oracle's // is exact
    parts = ev.select("event_type", "user_id", hv.alias("hv")).select(
        "event_type", "user_id",
        (F.col("hv") % HLL_M).alias("bucket"),
        F.expr(f"hv DIV {HLL_M}").alias("rest"),
    )
    rho = hll_rho(F.col("rest"), HLL_REST_BITS)
    regs = parts.groupBy("event_type", "bucket").agg(F.max(rho).alias("m"))
    sums = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(hll_denom_term("m", HLL_REST_BITS)).alias("denom_used"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    scale = 1 << (HLL_REST_BITS + 1)
    est = (
        F.expr(_ALPHA_EXPR) * F.lit(float(scale))
        / (F.col("denom_used") + (F.lit(HLL_M) - F.col("nonzero")) * F.lit(scale))
    )
    return exact.join(sums, "event_type").select(
        "event_type", "n_events", "exact_distinct",
        F.col("nonzero").cast("int").alias("nonzero_registers"),
        F.round(est, 4).alias("hll_raw_est"),
    )


_CMS_SQL = f"""
    WITH rows_ AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r),
    cells AS (
      SELECT r.r,
             {_MD5_LONG_SQL.format(
                 x="concat('cms', CAST(r.r AS VARCHAR), ':', CAST(e.user_id AS VARCHAR))"
             )} % {CMS_W} AS c,
             COUNT(*) AS cnt
      FROM events e, rows_ r
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % {CMS_PROBE_MOD} = 0
    ),
    probe_cells AS (
      SELECT p.user_id, r.r,
             {_MD5_LONG_SQL.format(
                 x="concat('cms', CAST(r.r AS VARCHAR), ':', CAST(p.user_id AS VARCHAR))"
             )} % {CMS_W} AS c
      FROM probes p, rows_ r
    ),
    est AS (
      SELECT pc.user_id, MIN(cells.cnt) AS cms_est
      FROM probe_cells pc JOIN cells ON cells.r = pc.r AND cells.c = pc.c
      GROUP BY pc.user_id
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_cnt FROM events
      WHERE user_id % {CMS_PROBE_MOD} = 0 GROUP BY user_id
    )
    SELECT e.user_id, e.exact_cnt, est.cms_est,
           CAST(est.cms_est - e.exact_cnt AS BIGINT) AS overcount
    FROM exact e JOIN est USING (user_id)
"""


@_register("events_user_cms", _CMS_SQL)
def events_user_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over event users: a 3x32 grid of
    integer counters (cell = md5('cms{{row}}:'+user) % 32, value =
    SUM of hits), queried for a deterministic probe shard
    (user_id % CMS_PROBE_MOD = 0) as MIN over the 3 rows -- always >= the true
    count, so `overcount` is the per-probe bias the sketch admits.
    Integer-only end to end; the oracle checks every counter the
    probes touch.

    Scale: building the sketch is ONE algebraic groupBy on (row,
    cell) -- 96 counters total regardless of key cardinality, the
    canonical heavy-hitter/frequency primitive when per-key exact
    counts would shuffle 10^10 keys. Partial grids merge by cell-wise
    SUM (partial agg does this for free); the probe lookup joins
    against the 96-row grid (broadcast)."""
    ev = load(spark, sf_dir, "events")
    rows = spark.range(CMS_D).select(F.col("id").cast("int").alias("r"))

    def cell(user_col: F.Column, r_col: F.Column) -> F.Column:
        return _md5_long(
            F.concat(F.lit("cms"), r_col.cast("string"), F.lit(":"),
                     user_col.cast("string"))
        ) % CMS_W

    tagged = ev.select("user_id").crossJoin(F.broadcast(rows))
    cells = tagged.groupBy(
        "r", cell(F.col("user_id"), F.col("r")).alias("c")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    probes = (
        ev.filter(F.col("user_id") % CMS_PROBE_MOD == 0).select("user_id").distinct()
    )
    probe_cells = probes.crossJoin(F.broadcast(rows)).select(
        "user_id", "r", cell(F.col("user_id"), F.col("r")).alias("c")
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["r", "c"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = (
        ev.filter(F.col("user_id") % CMS_PROBE_MOD == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return exact.join(est, "user_id").select(
        "user_id", "exact_cnt", "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )
