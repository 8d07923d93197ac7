"""Relational breadth: the remaining TPC-H-shape analytics over the
replicated tables, adapted to this corpus's reduced schema (no partsupp,
no commit/receipt dates, no containers -- predicates are re-based on the
columns that exist; the PLAN SHAPES are the point).

Reference parity: YADAMU's QA harness validates migrations by running
relational aggregations over replicated tables and comparing engines
(/root/reference/src/YADAMU/qa/utilities/yadamuQA.js:327-470 compare
pipeline). These queries are that contract exercised across every core
relational plan shape Spark offers:

- q2  argmin      -> correlated per-part MIN-cost subquery as a
                     groupBy joined back on exact DECIMAL equality;
                     deterministic LIMIT via a total sort key.
- q4  EXISTS      -> broadcast the filtered order window onto the fact
                     scan, distinct-on-key instead of a correlated probe.
- q6  scan-agg    -> pure predicate-pushdown showcase, zero joins.
- q7  multi-join  -> two-fact shuffle join with every dimension broadcast,
                     disjunctive nation-pair filter evaluated post-join.
- q8  mkt share   -> conditional DECIMAL ratio (the q14 exact pattern).
- q9  profit      -> rev-minus-cost DECIMAL algebra per nation/year.
- q12 late lines  -> conditional SUM splits priorities in one pass;
                     2-value group key (linestatus as the 2-mode proxy).
- q11 threshold   -> share-of-total via broadcast scalar; the comparison
                     is multiplied through (rev * K > total) so it stays
                     in exact DECIMAL -- no cross-engine float drift.
- q13 distribution-> left outer join + two-level groupBy.
- q15 argmax      -> scalar MAX joined back (exact DECIMAL equality).
- q16 count-distinct + NOT IN anti-join (partsupp re-derived as the
                     DISTINCT (partkey, suppkey) pairs in lineitem).
- q17 per-group threshold -> avg rewritten multiplied-through:
                     5 * qty * cnt < sum(qty), all DECIMAL/BIGINT exact.
- q19 disjunctive OR-of-ANDs pushed to one scan + broadcast part.
- q20 nested IN   -> two same-scan aggregates, share threshold
                     multiplied through, LEFT SEMI onto supplier.
- q21 exists/not-exists -> ONE per-order aggregate (n_suppliers,
                     n_late_suppliers) replaces both correlated
                     self-joins; late = shipped >60 days after order.
- q22 anti-join   -> dormant above-average customers; the average is
                     multiplied through (bal * cnt > total) for exactness.

Scale notes: every dimension side is broadcast; the only shuffles are
fact-fact joins on their natural keys and final groupBys (all algebraic,
partial-agg friendly). Money stays in DECIMAL until one final ROUND ->
DOUBLE (see catalog._sum_dbl for why scale-4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _dec, _register, _sum_dbl, load

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (1 - CAST(l_discount AS DECIMAL(7,4)))"
)


def _rev() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 7, 4))


@_register(
    "q6_revenue_delta",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                          * CAST(l_discount AS DECIMAL(7,4))), 4) AS DOUBLE)
             AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue change if one discount band were dropped.
    Zero joins -- the whole query is filters + one algebraic sum, so at
    100 TB it is exactly one pushed-down scan (all four predicates reach
    the parquet reader as PushedFilters) with map-side partial agg."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        _sum_dbl(_dec("l_extendedprice") * _dec("l_discount", 7, 4))
        .alias("revenue_delta")
    )


@_register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM (
      SELECT DISTINCT o.o_orderkey, o.o_orderpriority
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY 1
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority with at least one late line
    (shipped >60 days after ordering; this schema has no commit/receipt
    dates). EXISTS becomes: broadcast the quarter's order window onto
    the lineitem scan, DISTINCT on the order key, then count -- no
    correlated probe, no shuffle of the fact table on a new key."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    hit = (
        l.join(
            F.broadcast(o),
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@_register(
    "q7_volume_shipping",
    f"""
    WITH shipping AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
             {_REV_SQL} AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS revenue
    FROM shipping GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Scale: ONE fact-fact shuffle (lineitem join orders on the
    order key); supplier/customer/nation are broadcast; the disjunctive
    nation-pair predicate filters after the cheap broadcast joins."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    df = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        df.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_sum_dbl(_rev()).alias("revenue"))
    )


@_register(
    "q8_market_share",
    f"""
    WITH allrev AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
             {_REV_SQL} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                                ELSE CAST(0 AS DECIMAL(24,6)) END)
                      / SUM(volume), 6) AS DOUBLE) AS mkt_share
    FROM allrev GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of PROMO-part revenue
    sold to ASIA customers, by order year. The ratio stays in DECIMAL
    and divides once (the q14 exact-money pattern). Scale: lineitem join
    orders is the only fact-fact shuffle; part/supplier/customer/nation/
    region broadcast."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    df = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    )
    zero = F.lit(0).cast("decimal(24,6)")
    vol = _rev()
    nat = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(zero)
    return (
        df.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(F.round(F.sum(nat) / F.sum(vol), 6).cast("double").alias("mkt_share"))
    )


@_register(
    "q9_product_profit",
    f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM({_REV_SQL}
                          - CAST(p.p_retailprice AS DECIMAL(15,2))
                            * CAST(l.l_quantity AS DECIMAL(15,2))), 4)
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus retail cost of the shipped
    quantity; this schema has no partsupp supplycost) on 'widget' parts
    per supplier nation per order year. All money algebra in DECIMAL,
    rounded once. Scale: part filter broadcast-semi-prunes the fact scan
    before the single fact-fact shuffle with orders."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = _rev() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(_sum_dbl(profit).alias("sum_profit"))
    )


@_register(
    "q11_revenue_concentration",
    f"""
    WITH pr AS (
      SELECT p.p_brand, SUM({_REV_SQL}) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    ), tot AS (SELECT SUM(rev) AS total FROM pr)
    SELECT pr.p_brand, CAST(ROUND(pr.rev, 4) AS DOUBLE) AS revenue
    FROM pr, tot
    WHERE pr.rev * 24 > tot.total
    """,
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value -> lineitem revenue): brands
    whose revenue exceeds 1/24 of total revenue. Grouping is by brand --
    a FIXED 25-value domain at every scale factor -- so the threshold
    stays selective-but-non-empty at 100 TB, unlike a per-part share
    that vanishes as the part count grows. The share threshold is
    multiplied through (rev * 24 > total) so the comparison stays in
    exact DECIMAL -- no float ratio to drift across engines. Scale: one
    groupBy shuffle on a 25-value key (map-side combine makes the
    exchange 25 rows x partitions) + a broadcast 1-row scalar."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    pr = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand").agg(F.sum(_rev()).alias("rev"))
    )
    # the 1-row scalar joins via broadcast nested loop -- O(1) build
    # side, exempted in the suite's cartesian gate like hot_domains
    tot = pr.agg(F.sum("rev").alias("total"))
    return (
        pr.join(F.broadcast(tot))
        .filter(F.col("rev") * 24 > F.col("total"))
        .select(
            "p_brand",
            F.round(F.col("rev"), 4).cast("double").alias("revenue"),
        )
    )


@_register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    GROUP BY 1
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of non-urgent order counts per
    customer, including zero-order customers (the LEFT OUTER is the
    point). Scale: the outer join shuffles on the customer key; both
    groupBys are algebraic counts with map-side partial agg."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(rev.r, 4) AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter. The scalar MAX joins back via a broadcast 1-row cross join;
    equality is on the exact DECIMAL sum, so ties and the argmax itself
    are engine-independent. Scale: one groupBy shuffle on l_suppkey,
    then two broadcasts (the scalar, the supplier dim)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(F.sum(_rev()).alias("r"))
    # 1-row scalar broadcast (gate-exempt, see q11)
    mx = rev.agg(F.max("r").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("r") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("r"), 4).cast("double").alias("total_revenue"),
        )
    )


@_register(
    "q16_supplier_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) --
    partsupp re-derived as the DISTINCT (partkey, suppkey) pairs present
    in lineitem; low-balance suppliers excluded via NOT IN. Scale: the
    exclusion list is tiny -> broadcast LEFT ANTI join; the distinct and
    the count-distinct shuffle on the same natural keys."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000).select("s_suppkey")
    ps = (
        l.select("l_partkey", "l_suppkey").distinct()
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        ps.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "q17_small_quantity_revenue",
    """
    WITH pq AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(15,2))) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))), 4)
                AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND CAST(l.l_quantity AS DECIMAL(15,2)) * 5 * pq.cnt < pq.sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of the part's average quantity. The correlated AVG subquery is
    rewritten as one per-part aggregate joined back, and the threshold
    is multiplied through (5 * qty * cnt < sum_qty) so it stays in exact
    DECIMAL x BIGINT arithmetic -- a float average would be summation-
    order-dependent across engines. Scale: both sides shuffle on the
    same key (l_partkey), so AQE plans one exchange reuse; part is
    broadcast."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pq = l.groupBy(F.col("l_partkey").alias("pq_key")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(pq, F.col("l_partkey") == F.col("pq_key"))
        .filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(_sum_dbl(_dec("l_extendedprice")).alias("total_revenue"))
    )


@_register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(ROUND(SUM({_REV_SQL}), 4) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 25 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    part and lineitem columns. Catalyst extracts the common join key and
    pushes the derivable disjunction (brand/size on part, quantity range
    on lineitem) below the broadcast join; the residual OR evaluates
    post-join. One scan each side, one agg."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & sz.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & sz.between(25, 50) & q.between(20, 40))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_sum_dbl(_rev()).alias("revenue"))
    )


@_register(
    "q21_waiting_suppliers",
    """
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ), st AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM lo GROUP BY 1
    )
    SELECT s_name, numwait FROM (
      SELECT s.s_name, COUNT(*) AS numwait,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, s.s_name) AS rn
      FROM lo
      JOIN st ON st.l_orderkey = lo.l_orderkey
      JOIN supplier s ON s.s_suppkey = lo.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE lo.late AND st.n_supp >= 2 AND st.n_late = 1
        AND n.n_name = 'NATION_3'
      GROUP BY 1
    ) WHERE rn <= 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order (late = shipped >60 days after the
    order date). The classic EXISTS / NOT-EXISTS pair of correlated
    self-joins collapses into ONE per-order aggregate -- n_suppliers and
    n_late_suppliers -- joined back to the flagged rows: 'exists another
    supplier' = n_supp >= 2, 'no other late supplier' = n_late = 1.
    Scale: two shuffles on l_orderkey (the join and the per-order agg;
    same key -> exchange reuse) instead of three fact self-joins;
    supplier/nation broadcast; top-10 is TakeOrderedAndProject."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    lo = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate")
             > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
        )
    )
    st = lo.groupBy(F.col("l_orderkey").alias("st_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    hits = (
        lo.filter("late")
        .join(st, F.col("l_orderkey") == F.col("st_key"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        hits.orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
        .select("s_name", "numwait")
    )


@_register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(15,2))) AS cost
      FROM lineitem GROUP BY 1, 2
    ), elig AS (
      SELECT ps.l_partkey, ps.cost, s.s_name, s.s_acctbal,
             n.n_name AS nation
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), minc AS (
      SELECT l_partkey AS mk, MIN(cost) AS mincost FROM elig GROUP BY 1
    )
    SELECT e.s_acctbal, e.s_name, e.nation, p.p_partkey, p.p_name
    FROM elig e
    JOIN minc ON minc.mk = e.l_partkey AND e.cost = minc.mincost
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_type = 'PROMO' AND p.p_size >= 25
    ORDER BY e.s_acctbal DESC, e.nation, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest EUROPE supplier(s) for each large
    PROMO part. partsupp's supplycost is re-derived as the per
    (part, supplier) MIN(l_extendedprice) observed in lineitem -- an
    exact DECIMAL min, so the correlated 'cost = (SELECT MIN ...)'
    argmin resolves identically across engines (a derived float unit
    price would not). The correlated subquery becomes one per-part
    aggregate joined back on exact DECIMAL equality. Scale: the
    (part, supplier) reduction and the per-part min shuffle on the same
    key (exchange reuse under AQE); supplier/nation/region/part all
    broadcast; top-100 is TakeOrderedAndProject, and the sort key
    (acctbal, nation, name, partkey) is total because s_name is unique
    per supplier -- the LIMIT is deterministic."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") >= 25)
    )
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("cost"))
    elig = (
        ps.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "cost", "s_name", "s_acctbal",
                F.col("n_name").alias("nation"))
    )
    minc = elig.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("cost").alias("mincost"))
    return (
        elig.join(minc, (F.col("l_partkey") == F.col("mk"))
                  & (F.col("cost") == F.col("mincost")))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name")
    )


@_register(
    "q12_late_lines_by_status",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: among 1997 lines shipped late (>60 days after
    the order; this schema has no commit/receipt dates or shipmodes, so
    lateness is ship-vs-order and the 2-value l_linestatus stands in for
    the 2-shipmode group). Counts split urgent/high priorities from the
    rest via conditional SUM -- one pass, no second join. Scale: the
    year filter prunes the fact scan; one fact-fact shuffle on the order
    key; the groupBy key has 2 values so the final exchange is trivial
    after map-side partial agg."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@_register(
    "q20_dominant_suppliers",
    """
    WITH w AS (
      SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(15,2)) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ), pq AS (
      SELECT l_partkey AS pk, SUM(q) AS tot FROM w GROUP BY 1
    ), psq AS (
      SELECT l_partkey, l_suppkey, SUM(q) AS sq FROM w GROUP BY 1, 2
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT psq.l_suppkey
      FROM psq
      JOIN pq   ON pq.pk = psq.l_partkey
      JOIN part p ON p.p_partkey = psq.l_partkey
      WHERE p.p_name LIKE '%widget%' AND psq.sq * 2 > pq.tot
    )
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped the majority (>50%) of
    some 'widget' part's 1997 volume (partsupp availqty is re-derived
    from shipped quantities, and 'excess stock' becomes 'dominant
    share'). The nested IN subqueries collapse to: two aggregates over
    the SAME filtered scan keyed (part) and (part, supplier), the share
    threshold multiplied through in DECIMAL (sq * 2 > tot), then a LEFT
    SEMI join onto supplier. Scale: both aggs shuffle on l_partkey
    (exchange reuse); part is broadcast; the semi-join probe list is
    tiny and broadcasts."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load(spark, sf_dir, "supplier")
    w = l.select("l_partkey", "l_suppkey", _dec("l_quantity").alias("q"))
    pq = w.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("q").alias("tot"))
    psq = w.groupBy("l_partkey", "l_suppkey").agg(F.sum("q").alias("sq"))
    dominant = (
        psq.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pq, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("sq") * 2 > F.col("tot"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(dominant),
               F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@_register(
    "q22_dormant_customers",
    """
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS tot, COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(15,2))), 4) AS DOUBLE)
             AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(15,2)) * pos.cnt > pos.tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY 1
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balances
    and no orders since 1999 (every synthetic customer has SOME order,
    so dormancy is a window, not never-ordered; no phone country codes
    in this schema -> group by nation). The global average is multiplied
    through (bal * cnt > total) so the threshold is exact DECIMAL;
    dormant is a LEFT ANTI join against the recent-order window on the
    customer key. Scale: the anti-join shuffles on c_custkey; the date
    filter prunes the orders scan first; the scalar and nation
    broadcast."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate")
                >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    # 1-row scalar broadcast (gate-exempt, see q11)
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("tot"), F.count("*").alias("cnt"))
    return (
        c.join(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("cnt") > F.col("tot"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            _sum_dbl(_dec("c_acctbal")).alias("totacctbal"),
        )
    )
