"""Generic analytical operator checks over the TPC-H-ish driver tables.

The reference's query surface is single-table (SURVEY §2.4: joins are absent);
these queries cover the generic operator inventory the engine must still
provide — multi-way joins (broadcast for small dims), partial-aggregation
group-bys, top-k, windows, rollup, set ops — each with an exact DuckDB oracle.

Scale notes (100 TB stance): every join below either broadcasts a small
dimension (region/nation/customer/supplier auto-broadcast under the 10 MB AQE
threshold; explicit hints where it matters) or shuffles on the natural join
key; aggregates are expressed so Catalyst plans partial_then_merge HashAggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..ext.hashing import md5_long_sql
from ..views import load_table
from . import QuerySpec


# --- Q1-style pricing summary (scan + filter + 8-agg group-by) --------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style shipping priority (3-way join + top-k) ------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.filter(F.col("l_shipdate") > "1998-06-15")
        .join(o.filter(F.col("o_orderdate") < "1998-06-15"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate > TIMESTAMP '1998-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5-style local-supplier volume (6-way join chain) ----------------------
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(o.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(revenue, 2).alias("revenue"))
    )


SQL_Q5 = """
SELECT n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --- Q6-style forecast revenue (pure filter + single agg) -------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.05))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue")
        )
    )


SQL_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


# --- Q10-style returned-item ranking (join + group + top-k) -----------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(o.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- window: rank orders per customer ---------------------------------------
def q_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    running = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.withColumn("price_rank", F.row_number().over(w))
        .withColumn("running_spend", F.round(F.sum("o_totalprice").over(running), 2))
        .filter(F.col("price_rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "price_rank",
                "running_spend")
    )


SQL_ORDER_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice, price_rank, running_spend FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
         round(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_spend
  FROM orders
) WHERE price_rank <= 3
"""


# --- rollup (A6) ------------------------------------------------------------
def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


SQL_ORDERS_ROLLUP = """
SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the third multi-grouping shape next to rollup/cube:
    per-priority totals, per-status totals, and the grand total in ONE pass
    (Catalyst expands to a single Expand + partial-aggregated exchange, not
    three scans). grouping_id disambiguates the all-NULL grand-total row
    from any genuine NULL dimension value."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


SQL_ORDERS_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
            AS BIGINT) AS gid,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


# --- Q4-style order priority check (correlated EXISTS -> semi join) ---------
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# --- Q18-style large-volume customers (subquery + HAVING + join) ------------
def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.col("total_qty"), 2).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(50)
    )


SQL_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


# --- cube (A6) --------------------------------------------------------------
def q_lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
    )


SQL_LINEITEM_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       round(avg(l_discount), 6) AS avg_disc
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- window lead: inter-order gaps per customer -----------------------------
def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap_days = (
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate"))
    )
    return (
        o.withColumn("gap", gap_days)
        .filter(F.col("gap").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap"), 4).alias("avg_gap_days"),
            F.max("gap").alias("max_gap_days"),
        )
    )


SQL_ORDER_GAPS = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day', o_orderdate,
                   LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey))
           AS gap
  FROM orders
)
SELECT o_custkey, count(*) AS n_gaps,
       round(avg(gap), 4) AS avg_gap_days, max(gap) AS max_gap_days
FROM g WHERE gap IS NOT NULL GROUP BY o_custkey
"""


# --- set ops: customers with orders in '97 but not '98 ----------------------
def q_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    in97 = o.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    in98 = o.filter(
        (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1999-01-01")
    ).select("o_custkey")
    # subtract == EXCEPT (distinct set semantics), matching the SQL oracle
    return in97.subtract(in98).select(F.col("o_custkey").alias("custkey"))


SQL_CHURNED = """
SELECT DISTINCT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
"""


# --- semi/anti joins: parts never ordered -----------------------------------
def q_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(l, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_PARTS_NEVER_ORDERED = """
SELECT count(*) AS cnt FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


# --- sessionization over events (gap-based, pure window functions) ----------
def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sessions = (
        ev.withColumn("new_s", new_session)
        .withColumn(
            "session_id",
            F.sum("new_s").over(
                by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


SQL_EVENT_SESSIONS = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
FROM per_session GROUP BY user_id
"""


# --- Q12-style priority-by-class counts (join + dual conditional agg) -------
# The driver testdata carries no l_shipmode column, so l_returnflag stands in
# for the mode dimension; the operator shape under test — fact-fact equi-join
# feeding two CASE-sums per group — is TPC-H Q12's exactly.
def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


# --- Q14-style promotion revenue share (join + conditional-sum ratio) -------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-03-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100
                * F.sum(
                    F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
                )
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


SQL_Q14 = """
SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --- Q19-style disjunctive revenue (join + OR-of-ANDs multi-range) ----------
# Adapted to the available columns (no p_container/l_shipmode in testdata):
# three brand/size/quantity conjunction arms OR-ed together — the disjunctive
# join-predicate shape of TPC-H Q19.
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    arm = (
        lambda brand, size_hi, q_lo, q_hi: (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        # manual coarse pushdown: every arm requires quantity <= 30, so the
        # big fact scan prunes before the join regardless of the disjunction
        # (Catalyst won't derive a common bound across OR arms on its own)
        l.filter(F.col("l_quantity").between(1, 30))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            arm("Brand#12", 15, 1, 11)
            | arm("Brand#23", 25, 10, 20)
            | arm("Brand#34", 35, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


SQL_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        AND l_quantity BETWEEN 20 AND 30))
"""


# --- Q7-style volume shipping (bidirectional nation pair + year rollup) -----
Q7_NATIONS = ("NATION_1", "NATION_2")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    a, b = Q7_NATIONS
    return (
        l.filter(F.col("l_shipdate").between("1996-01-01", "1997-12-31"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


SQL_Q7 = f"""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = '{Q7_NATIONS[0]}' AND n2.n_name = '{Q7_NATIONS[1]}')
      OR (n1.n_name = '{Q7_NATIONS[1]}' AND n2.n_name = '{Q7_NATIONS[0]}'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY 1, 2, 3
"""


# --- Q8-style market share (8-way join + conditional share per year) --------
Q8_NATION = "NATION_2"   # in ASIA (the customer-region filter below)


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o.filter(F.col("o_orderdate").between("1996-01-01", "1997-12-31")),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p.filter(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, volume)
                      .otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


SQL_Q8 = f"""
SELECT o_year,
       round(sum(CASE WHEN nation = '{Q8_NATION}' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'PROMO'
)
GROUP BY o_year
"""


# --- Q13-style customer order-count distribution (left join + 2-level agg) --
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_Q13 = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- Q22-style dormant high-balance customers (scalar subquery + anti join) -
Q22_DORMANT_SINCE = "1999-01-01"


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and no RECENT orders,
    grouped by nation (stand-ins for Q22's phone country code / 7-year
    window — testdata has no c_phone and every customer has some order).
    Scalar average via a broadcast 1-row aggregate crossJoin; 'no recent
    orders' is a left-anti join (never a correlated per-row subquery)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    recent = o.filter(F.col("o_orderdate") >= Q22_DORMANT_SINCE)
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


SQL_Q22 = f"""
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{Q22_DORMANT_SINCE}')
GROUP BY c_nationkey
"""


# --- Q17-style small-quantity revenue (correlated scalar avg) ---------------
# Adapted columns (testdata lacks p_container): the part filter is
# p_brand = 'Brand#4' AND p_size < 15; the shape — per-part correlated
# average threshold, then a single summed revenue — is Q17's.
Q17_BRAND = "Brand#4"
Q17_MAX_SIZE = 15


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery as aggregate-then-broadcast-join: compute
    0.2*avg(l_quantity) per part once (map-side partial agg), broadcast the
    small per-part threshold table back onto lineitem, keep rows under the
    threshold, sum. No per-row subquery execution — at 100 TB the threshold
    table is |parts| rows, not |lineitem|, and the probe is one broadcast.
    l_quantity is integral so avg() is order-independent in both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_size") < Q17_MAX_SIZE)
    )
    thresholds = (
        l.join(F.broadcast(p.select("p_partkey")),
               F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_threshold"))
    )
    return (
        l.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


SQL_Q17 = f"""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = '{Q17_BRAND}' AND p_size < {Q17_MAX_SIZE}
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem
                    WHERE l_partkey = p_partkey)
"""


# --- Q21-style waiting-supplier check (EXISTS + NOT EXISTS chain) ------------
# Adapted columns (testdata lacks l_receiptdate/l_commitdate): a line "failed"
# its order when l_returnflag = 'R'; Q21's shape — the only supplier whose
# line failed on a multi-supplier finished order — is preserved exactly:
# one semi join (another supplier participated) + one anti join (no other
# supplier's line failed).
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT EXISTS as left-semi / left-anti joins on (orderkey) with a
    supplier-inequality residual condition — Spark extracts the equi key for
    the shuffle and applies the <> as a join residual, so both probes are
    hash joins on l_orderkey, never a cartesian. Supplier dim broadcasts."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    l1 = (
        l.filter(F.col("l_returnflag") == "R")
        .join(o.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waited = (
        l1.join(l2, (F.col("l_orderkey") == F.col("k2"))
                & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("k3"))
              & (F.col("l_suppkey") != F.col("s3")), "left_anti")
    )
    return (
        waited.join(F.broadcast(s),
                    F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


SQL_Q21 = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --- Q15: top supplier over a quarterly revenue view ------------------------
# Adapted columns (testdata supplier lacks s_address/s_phone): output is
# (s_suppkey, s_name, total_revenue); the shape — revenue view + scalar-max
# selection of the top supplier(s) — is Q15's.
Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15's CREATE VIEW revenue is just a reusable aggregate: one shuffle
    on l_suppkey with map-side partial sums. The scalar max is a 1-row
    aggregate broadcast back onto the view (no re-aggregation, no per-row
    subquery), and the supplier dim broadcasts — at 100 TB the only big
    exchange is the |suppliers|-key revenue shuffle. Revenue is rounded to
    2dp on both engines BEFORE the max so tie selection is identical."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.filter((F.col("l_shipdate") >= Q15_START)
                 & (F.col("l_shipdate") < Q15_END))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.join(F.broadcast(max_rev),
                     F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
    AND l_shipdate < TIMESTAMP '{Q15_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- events: funnel + retention cohorts (EXT product analytics) -------------
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase per user: each
    stage's timestamp is the user's FIRST qualifying event STRICTLY AFTER
    the previous stage and within a 24-hour conversion deadline of it
    (min-aggregate per stage, no window sort, no explode).

    Scale shape: three user-keyed aggregations and two user-keyed equi-joins
    — everything shuffles once on user_id, the natural key; no event-level
    self-join. Output is one row of stage counts."""
    ev = load_table(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter((F.col("ts") > F.col("t1"))
                & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter((F.col("ts") > F.col("t2"))
                & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


SQL_EVENTS_FUNNEL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
    AND e.ts <= t1.t1 + INTERVAL 24 HOUR
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
    AND e.ts <= t2.t2 + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_view,
       (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_click,
       (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_purchase
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort triangle: users grouped by first-activity day
    (cohort), counted by distinct active day offset from that cohort day.

    Scale shape: one user-keyed aggregation for cohort assignment, broadcast
    back onto events (the cohort map is |users|-sized — tiny next to the
    event stream), then one (cohort, offset) aggregation. At 100 TB the only
    event-level exchange is the final rollup, which map-side combines."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .filter(F.col("day_offset").isin(0, 1, 7, 14, 28))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


SQL_EVENTS_RETENTION = """
WITH cohort AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT c.cohort_day,
       datediff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN cohort c ON e.user_id = c.user_id
WHERE datediff('day', c.cohort_day, CAST(e.ts AS DATE)) IN (0, 1, 7, 14, 28)
GROUP BY 1, 2
"""


def q_orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — per-year revenue pivoted over order status (the operator
    family rollup/cube/grouping-sets doesn't cover). Values are enumerated
    explicitly so Catalyst plans ONE pass (pivot without values costs an
    extra distinct scan to discover them — never do that at 100 TB); the
    pivot itself compiles to conditional sums inside a single
    partial-aggregated HashAggregate, no extra shuffle vs a plain group-by."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return piv.select(
        "o_year",
        F.col("O").alias("rev_open"),
        F.col("F").alias("rev_filled"),
        F.col("P").alias("rev_partial"),
    )


SQL_ORDERS_PIVOT = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       round(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 2) AS rev_open,
       round(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 2) AS rev_filled,
       round(sum(o_totalprice) FILTER (o_orderstatus = 'P'), 2) AS rev_partial
FROM orders
GROUP BY 1
"""


EMA_WINDOW_DAYS = 16  # dyadic half-life decay: weight 2^(15-j) for lag j


def q_revenue_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue — the
    time-series smoothing shape the frame windows (ma7) don't cover.

    Cross-engine float discipline, one step further than the cents trick:
    with alpha = 0.5 the decay weights are exact powers of two, so the
    whole EMA is INTEGER arithmetic end-to-end — rev_cents * 2^(15-j)
    summed as bigints (order-independent, no float sum drift), and the
    normalized value is emitted via integer division (millicents). A
    general-alpha EMA would be an order-sensitive double sum; the dyadic
    variant is the hash-checkable one.

    Scale shape: the range self-join is |days| x window — bounded by the
    calendar, not the order count (same argument as the frame windows)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice") * 100, 0).cast("long")
            .alias("rev_cents")
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    j = F.datediff(F.col("a.day"), F.col("b.day"))
    weight = F.pow(F.lit(2.0), (EMA_WINDOW_DAYS - 1) - j).cast("long")
    return (
        a.join(
            b,
            (F.col("b.day") >= F.date_sub(F.col("a.day"), EMA_WINDOW_DAYS - 1))
            & (F.col("b.day") <= F.col("a.day")),
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.col("b.rev_cents") * weight).alias("ema_scaled"),
            F.sum(weight).alias("wsum"),
        )
        .select(
            "day",
            "n_days",
            "ema_scaled",
            F.expr("CAST((ema_scaled * 1000) div wsum AS BIGINT)").alias(
                "ema_millicents"
            ),
        )
    )


SQL_REVENUE_EMA = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS rev_cents
  FROM orders
  GROUP BY 1
),
w AS (
  SELECT a.day,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(b.rev_cents *
              CAST(power(2, {EMA_WINDOW_DAYS - 1} - (a.day - b.day)) AS BIGINT))
           AS BIGINT) AS ema_scaled,
         CAST(sum(CAST(power(2, {EMA_WINDOW_DAYS - 1} - (a.day - b.day))
              AS BIGINT)) AS BIGINT) AS wsum
  FROM daily a JOIN daily b
    ON b.day >= a.day - {EMA_WINDOW_DAYS - 1} AND b.day <= a.day
  GROUP BY a.day
)
SELECT day, n_days, ema_scaled,
       CAST(ema_scaled * 1000 // wsum AS BIGINT) AS ema_millicents
FROM w
"""


def q_rolling_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day p95 of daily order count — the rolling-QUANTILE shape:
    frame windows give rolling sums/averages, but a windowed percentile has
    no native frame form, so it plans as a bounded calendar-range self-join
    feeding the exact percentile aggregate (cross-engine percentile parity
    is already pinned by the logs percentile queries). |days| x 7 rows —
    bounded by the calendar, not the order count."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    return (
        a.join(
            b,
            (F.col("b.day") >= F.date_sub(F.col("a.day"), 6))
            & (F.col("b.day") <= F.col("a.day")),
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.expr("percentile(b.n_orders, 0.95)"), 4).alias(
                "p95_orders"
            ),
            F.max(F.col("b.n_orders")).alias("max_orders"),
        )
    )


SQL_ROLLING_P95 = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT a.day,
       CAST(count(*) AS BIGINT) AS n_days,
       round(percentile_cont(0.95) WITHIN GROUP (ORDER BY b.n_orders), 4)
         AS p95_orders,
       max(b.n_orders) AS max_orders
FROM daily a JOIN daily b ON b.day >= a.day - 6 AND b.day <= a.day
GROUP BY a.day
"""


def q_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based windows (ROWS BETWEEN) — 7-day moving average and running
    cumulative total of daily order revenue. The rank/lag queries cover
    ordered windows; this covers sliding/unbounded FRAMES.

    Cross-engine float discipline: daily revenue is snapped to integer CENTS
    before any window math, so the frame sums are exact integer arithmetic in
    both engines (windowed double sums are order-sensitive; windowed bigint
    sums are not). The moving average divides cents by (100 * frame rows),
    which provably cannot land on a round-half boundary at 6 decimals.

    Scale shape: one shuffle for the daily pre-aggregation (map-side
    combined), then a single-partition window over |days| rows — the window
    input is days, not orders, so the unpartitioned ORDER BY is safe even at
    100 TB of orders (~10^4 days)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice") * 100, 0).cast("long")
            .alias("rev_cents")
        )
    )
    # calendar-bounded windows (|days| rows); the non-foldable constant
    # key keeps the benign case out of WindowExec's single-partition
    # scale warning (ext.sampling.bounded_window_key)
    from ..ext.sampling import bounded_window_key

    bk = bounded_window_key(F.col("day"))
    w7 = Window.partitionBy(bk).orderBy("day").rowsBetween(-6, 0)
    wcum = (
        Window.partitionBy(bk)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "day",
        "rev_cents",
        F.round(
            F.sum("rev_cents").over(w7)
            / (F.count(F.lit(1)).over(w7) * 100.0),
            6,
        ).alias("ma7"),
        F.sum("rev_cents").over(wcum).alias("cum_cents"),
    )


SQL_DAILY_REVENUE_TREND = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS rev_cents
  FROM orders
  GROUP BY 1
)
SELECT day,
       rev_cents,
       round(CAST(sum(rev_cents) OVER w7 AS BIGINT)
             / (count(*) OVER w7 * 100.0), 6) AS ma7,
       CAST(sum(rev_cents) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS cum_cents
FROM daily
WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile() distribution buckets — quartile customers by account balance
    (deterministic tiebreak on the unique key) and profile each quartile.
    Per-bucket balance totals are emitted as exact integer cents, not a
    float average, so the result is order-insensitive.

    Scale shape: a global ntile needs a total order; at 100 TB replace with
    approx percentile boundaries + a broadcast bucket lookup. Here |customer|
    is dimension-sized, so the single-partition window is the honest plan."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            F.ntile(4).over(w).alias("quartile"),
            "c_acctbal",
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
            .alias("sum_bal_cents"),
        )
    )


SQL_BALANCE_QUARTILES = """
SELECT quartile,
       count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_bal_cents
FROM (
  SELECT ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile, c_acctbal
  FROM customer
)
GROUP BY quartile
"""


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution: for each converting
    user (first purchase = conversion), which channel (view/click) touched
    them first and last BEFORE the conversion, rolled up to a (first, last)
    transition matrix. min_by/max_by keep this a single user-keyed aggregate
    — no window sort, no self-join (event timestamps are unique in the
    fixture, so the arg-extrema are deterministic).

    Scale shape: two shuffles on user_id (conversion times, then touch
    extrema) and a final tiny matrix rollup; everything map-side combines."""
    ev = load_table(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .join(conv, "user_id")
        .filter(F.col("ts") < F.col("conv_ts"))
    )
    per_user = touches.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_touch"),
        F.max_by("event_type", "ts").alias("last_touch"),
    )
    return per_user.groupBy("first_touch", "last_touch").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )


SQL_EVENTS_ATTRIBUTION = """
WITH conv AS (
  SELECT user_id, min(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
per_user AS (
  SELECT e.user_id,
         arg_min(e.event_type, e.ts) AS first_touch,
         arg_max(e.event_type, e.ts) AS last_touch
  FROM events e JOIN conv USING (user_id)
  WHERE e.event_type IN ('view', 'click') AND e.ts < conv.conv_ts
  GROUP BY e.user_id
)
SELECT first_touch, last_touch, count(*) AS n_conversions
FROM per_user
GROUP BY 1, 2
"""


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users cohorted by first-seen week, cumulative
    per-user value by week offset — the curve every growth team plots.
    Value is exact integer cents (x100 before summing); the cumulative
    window runs over the (cohort, offset) AGGREGATE — bounded by
    weeks^2/2 rows, not events. The broadcast cohort map is user-count
    sized (same shape as events_retention_cohorts)."""
    ev = load_table(spark, sf_dir, "events")
    week = (F.floor(F.unix_timestamp(F.col("ts")) / (7 * 86400))).cast("long")
    firsts = (
        ev.select("user_id", week.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_w"))
    )
    cohort_sizes = firsts.groupBy("cohort_w").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    per = (
        ev.select(
            "user_id",
            week.alias("w"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .join(F.broadcast(firsts), "user_id")
        .withColumn("offset_w", (F.col("w") - F.col("cohort_w")).cast("int"))
        .groupBy("cohort_w", "offset_w")
        .agg(F.sum("cents").alias("week_cents"))
    )
    cum = Window.partitionBy("cohort_w").orderBy("offset_w").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.withColumn("cum_cents", F.sum("week_cents").over(cum))
        .join(F.broadcast(cohort_sizes), "cohort_w")
        .select(
            "cohort_w", "offset_w", "week_cents", "cum_cents",
            F.round(F.col("cum_cents") / F.col("cohort_users"), 4).alias(
                "ltv_per_user"
            ),
        )
    )


SQL_COHORT_LTV = """
WITH wk AS (
  SELECT user_id, CAST(floor(epoch(ts) / (7 * 86400)) AS BIGINT) AS w,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
firsts AS (SELECT user_id, min(w) AS cohort_w FROM wk GROUP BY 1),
sizes AS (SELECT cohort_w, count(*) AS cohort_users FROM firsts GROUP BY 1),
per AS (
  SELECT f.cohort_w, CAST(wk.w - f.cohort_w AS INT) AS offset_w,
         sum(wk.cents) AS week_cents
  FROM wk JOIN firsts f ON wk.user_id = f.user_id
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_w, offset_w, week_cents,
         SUM(week_cents) OVER (PARTITION BY cohort_w ORDER BY offset_w
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM per
)
SELECT cum.cohort_w, offset_w, CAST(week_cents AS BIGINT) AS week_cents,
       CAST(cum_cents AS BIGINT) AS cum_cents,
       round(cum_cents / CAST(sizes.cohort_users AS DOUBLE), 4) AS ltv_per_user
FROM cum JOIN sizes ON cum.cohort_w = sizes.cohort_w
"""


RFM_ASOF = "1998-12-31"  # pinned "today" for recency


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order at a
    pinned as-of date), frequency (order count), monetary (cents-exact
    spend), each cut into quartiles by ntile with the customer key as the
    deterministic tiebreak, composed into a segment code (e.g. '144') and
    aggregated to segment profiles. One groupBy over orders plus three
    customer-cardinality ntile windows — the windows run over the customer
    AGGREGATE (one row per customer), not the order fact table. Honest
    scale note: exact ntile over all customers is a single-partition sort;
    at billions of customers the production form swaps it for
    approx-quantile boundary thresholds broadcast into CASE buckets (the
    same swap as logs_approx_percentiles) — ntile here is the exact form
    the oracle can replicate."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("date"), F.max(F.to_date("o_orderdate"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        # cents-exact BEFORE summing (the q_cohort_ltv pattern): a float
        # sum rounded after is summation-order-sensitive across engines,
        # and a 1-cent boundary flip would reorder the ntile input
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .alias("monetary_c"),
    )
    # recency quartile 1 = most recent; frequency/monetary quartile 4 = top
    rq = Window.orderBy("recency_days", "o_custkey")
    fq = Window.orderBy("frequency", "o_custkey")
    mq = Window.orderBy("monetary_c", "o_custkey")
    scored = per_cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_c",
        F.ntile(4).over(rq).alias("r_q"),
        F.ntile(4).over(fq).alias("f_q"),
        F.ntile(4).over(mq).alias("m_q"),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("recency_days"), 4).alias("avg_recency"),
            F.round(F.avg("frequency"), 4).alias("avg_frequency"),
            F.sum("monetary_c").alias("segment_cents"),
        )
    )


SQL_RFM_SEGMENTS = f"""
WITH per_cust AS (
  SELECT o_custkey,
         datediff('day', max(CAST(o_orderdate AS DATE)),
                  DATE '{RFM_ASOF}') AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_c
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary_c,
         NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_q,
         NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
         NTILE(4) OVER (ORDER BY monetary_c, o_custkey) AS m_q
  FROM per_cust
)
SELECT r_q, f_q, m_q, count(*) AS n_customers,
       round(avg(recency_days), 4) AS avg_recency,
       round(avg(frequency), 4) AS avg_frequency,
       CAST(sum(monetary_c) AS BIGINT) AS segment_cents
FROM scored GROUP BY 1, 2, 3
"""


def q_rfm_segments_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe form of q_rfm_segments — identical output (it
    hash-matches the SAME exact-NTILE oracle), but every quartile is
    derived from a two-phase distributed global rank
    (ext.sampling.global_rank: range-bucketed row_number, offsets from a
    bounded <=buckets-row aggregate) plus the closed-form ANSI NTILE
    (ntile_from_rank). NO unpartitioned window anywhere: at billions of
    customers each reducer sorts only its range bucket, where the exact
    form's three ``Window.orderBy`` each serialize every customer through
    one reducer. This retires the named r8 scale-killer without giving up
    external hash verification — the usual price of the approx-threshold
    swap.

    Crossover honesty (the global_prefix_sum discipline), now MEASURED
    (BENCH_SF1.json, bench_sf1.py's 10x replication): at sf0.1 (150k
    customers) the exact form wins 0.42s vs 2.74s — six extra exchanges
    dominate while all customers fit one reducer — and at sf1 (1.5M) it
    still wins 0.93s vs 4.06s, but the gap closes fast: 10x data costs
    the exact form 2.23x and this form only 1.48x (fixed exchange
    latency amortizes; per-row cost 2.7us vs 18.3us at sf0.1 becomes
    0.62us vs 2.7us at sf1). Extrapolating the measured per-row costs,
    the crossover on this 32-core box sits around 10^8 customers — and
    on a real cluster the exact form's single-reducer sort hits its
    memory wall long before wall-clock parity. Both ship; pick by
    cardinality."""
    from ..ext.caching import cache_tracked
    from ..ext.sampling import global_rank, ntile_from_rank

    o = load_table(spark, sf_dir, "orders")
    per_cust = cache_tracked(
        o.groupBy("o_custkey").agg(
            F.datediff(
                F.lit(RFM_ASOF).cast("date"), F.max(F.to_date("o_orderdate"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("monetary_c"),
        )
    )
    # ONE driver action covers the NTILE row count and every rank's
    # bucketing bounds (vs one min/max collect per rank + a count)
    stats = per_cust.agg(
        F.count(F.lit(1)),
        F.min("recency_days"), F.max("recency_days"),
        F.min("frequency"), F.max("frequency"),
        F.min("monetary_c"), F.max("monetary_c"),
    ).first()
    n = stats[0]
    ranked = per_cust
    for i, (out, col) in enumerate((
        ("_rrk", "recency_days"),
        ("_frk", "frequency"),
        ("_mrk", "monetary_c"),
    )):
        ranked = global_rank(
            ranked, [col, "o_custkey"], out_col=out,
            bounds=(stats[1 + 2 * i], stats[2 + 2 * i]),
        )
    scored = ranked.select(
        "recency_days",
        "frequency",
        "monetary_c",
        ntile_from_rank(F.col("_rrk"), n, 4).alias("r_q"),
        ntile_from_rank(F.col("_frk"), n, 4).alias("f_q"),
        ntile_from_rank(F.col("_mrk"), n, 4).alias("m_q"),
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("recency_days"), 4).alias("avg_recency"),
        F.round(F.avg("frequency"), 4).alias("avg_frequency"),
        F.sum("monetary_c").alias("segment_cents"),
    )


def q_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct via MERGED HLL partials — the scale form of
    events_active_users' WAU: one engine-exact register table PER DAY
    (<= 256 rows/day regardless of user volume), each contributing to its
    7 trailing target days through the bounded day-grid, merged by
    register max. At billions of users/day the exact day-grid distinct
    explodes (7x the daily-user table through a distinct), while the
    sketch path moves only KILOBYTES of registers per day — and because
    the HLL here is engine-exact (md5 hashing, integer rho), the merged
    ESTIMATE itself hash-matches the oracle, alongside the exact WAU for
    honest error visibility."""
    from ..ext.text import HLL_ALPHA, HLL_M, HLL_P, _hll_rho
    from ..ext.hashing import md5_long

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.col("user_id").alias("u"), F.to_date("ts").alias("d")
    ).distinct()
    wbits = 32 - HLL_P
    h = md5_long(F.col("u").cast("string"))
    day_regs = (
        ud.select(
            "d",
            (h / (1 << wbits)).cast("int").alias("idx"),
            (h % (1 << wbits)).alias("w"),
        )
        .select("d", "idx", _hll_rho(F.col("w")).alias("r"))
        .groupBy("d", "idx")
        .agg(F.max("r").alias("rho"))
    )
    contrib = day_regs.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "d", "idx", "rho",
    ).select(F.date_add(F.col("d"), F.col("off")).alias("d"), "idx", "rho")
    merged = contrib.groupBy("d", "idx").agg(F.max("rho").alias("rho"))
    agg = merged.groupBy("d").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
        F.count(F.lit(1)).alias("np"),
    )
    zeros = (HLL_M - F.col("np")).cast("double")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (F.col("s") + (HLL_M - F.col("np")))
    est = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0), HLL_M * F.log(HLL_M / zeros)
    ).otherwise(raw)
    # exact WAU via the bounded day-grid (the events_active_users path)
    grid = ud.select(
        "u", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "d"
    ).select("u", F.date_add(F.col("d"), F.col("off")).alias("d"))
    exact = grid.groupBy("d").agg(F.count_distinct("u").alias("wau_exact"))
    # restrict to days with actual activity (the grid extends 6 days past)
    live = ud.select("d").distinct()
    return (
        exact.join(agg, "d")
        .join(live, "d")
        .select(
            F.col("d").alias("day"),
            "wau_exact",
            F.round(est, 4).alias("wau_hll"),
        )
    )


def _wau_hll_sql() -> str:
    """Oracle for q_wau_hll — the identical register pipeline keyed by
    target day, built from the shared text-module HLL constants."""
    from ..ext.hashing import md5_long_sql
    from ..ext.text import HLL_ALPHA, HLL_M, HLL_W

    rho = "CASE WHEN w = 0 THEN 25 " + " ".join(
        f"WHEN w >= {1 << (HLL_W - r)} THEN {r}" for r in range(1, HLL_W + 1)
    ) + " END"
    return f"""
WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
hw AS (
  SELECT d, CAST(floor(h / {1 << HLL_W}.0) AS INT) AS idx, h % {1 << HLL_W} AS w
  FROM (SELECT d, {md5_long_sql("CAST(u AS VARCHAR)")} AS h FROM ud)
),
day_regs AS (SELECT d, idx, max({rho}) AS rho FROM hw GROUP BY 1, 2),
contrib AS (
  SELECT d + CAST(o.off AS INT) AS d, idx, rho
  FROM day_regs, generate_series(0, 6) AS o(off)
),
merged AS (SELECT d, idx, max(rho) AS rho FROM contrib GROUP BY 1, 2),
agg AS (
  SELECT d, sum(power(2.0, -rho)) AS s, count(*) AS np
  FROM merged GROUP BY 1
),
est AS (
  SELECT d, ({HLL_M} - np) * 1.0 AS zeros,
         {HLL_ALPHA * HLL_M * HLL_M!r} / (s + ({HLL_M} - np)) AS raw
  FROM agg
),
grid AS (
  SELECT u, d + CAST(o.off AS INT) AS d
  FROM ud, generate_series(0, 6) AS o(off)
),
exact AS (SELECT d, count(DISTINCT u) AS wau_exact FROM grid GROUP BY 1)
SELECT exact.d AS day,
       CAST(exact.wau_exact AS BIGINT) AS wau_exact,
       round(CASE WHEN raw <= {2.5 * HLL_M} AND zeros > 0
                  THEN {HLL_M} * ln({HLL_M} / zeros)
                  ELSE raw END, 4) AS wau_hll
FROM exact
JOIN est ON exact.d = est.d
JOIN (SELECT DISTINCT d FROM ud) live ON exact.d = live.d
"""


CONCENTRATION_PCTS = (1, 5, 10, 25)


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the Pareto board): the exact share of total
    revenue captured by the top 1/5/10/25 percent of customers — integer
    ppm, cents-exact. Customer ranks come from the distributed global_rank
    (descending spend via the negated cents column, custkey tiebreak), so
    there is no unpartitioned sort of the customer aggregate at any
    cardinality; the percent grid and the (n, total) scalars broadcast."""
    from ..ext.caching import cache_tracked
    from ..ext.sampling import global_rank

    o = load_table(spark, sf_dir, "orders")
    per = cache_tracked(
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("cents")
        )
        .withColumn("_neg", -F.col("cents"))
    )
    totals = per.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    ranked = global_rank(per, ["_neg", "o_custkey"], out_col="_rk")
    pcts = spark.range(len(CONCENTRATION_PCTS)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in CONCENTRATION_PCTS]),
            (F.col("id") + 1).cast("int"),
        ).alias("pct")
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(pcts))
        .withColumn("_cut", F.expr("(n * pct + 99) DIV 100"))
        .groupBy("pct")
        .agg(
            F.max("_cut").alias("n_top"),
            F.sum(
                F.when(F.col("_rk") <= F.col("_cut"), F.col("cents"))
                .otherwise(F.lit(0))
            ).alias("top_cents"),
            F.expr(
                "CAST(sum(CASE WHEN _rk <= _cut THEN cents ELSE 0 END) "
                "* 1000000 DIV max(total) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


SQL_REVENUE_CONCENTRATION = f"""
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rk,
         (SELECT count(*) FROM per) AS n,
         (SELECT sum(cents) FROM per) AS total
  FROM per
)
SELECT p.pct,
       CAST(max((n * p.pct + 99) // 100) AS BIGINT) AS n_top,
       CAST(sum(CASE WHEN rk <= (n * p.pct + 99) // 100
                     THEN cents ELSE 0 END) AS BIGINT) AS top_cents,
       CAST(sum(CASE WHEN rk <= (n * p.pct + 99) // 100
                     THEN cents ELSE 0 END) * 1000000 // max(total)
            AS BIGINT) AS share_ppm
FROM r, (VALUES {", ".join(f"({p})" for p in CONCENTRATION_PCTS)}) p(pct)
GROUP BY p.pct
"""


EQUIDEPTH_BUCKETS = 8


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of the event value column —
    the optimizer-statistics / quantile-binning primitive — built
    scale-safely: bucket membership comes from the distributed
    global_rank + closed-form NTILE (no unpartitioned window anywhere,
    the same machinery as the scaled RFM quartiles), then one keyed
    aggregate profiles each bucket (count, min, max, cents-exact sum).
    Hash-equal to the exact NTILE oracle — an equi-depth histogram whose
    boundaries are EXACT, not sketch-approximate, at any corpus size."""
    from ..ext.caching import cache_tracked
    from ..ext.sampling import global_rank, ntile_from_rank

    ev = cache_tracked(
        load_table(spark, sf_dir, "events").select("event_id", "value")
    )
    n = ev.count()
    ranked = global_rank(ev, ["value", "event_id"], out_col="_rk")
    return (
        ranked.select(
            ntile_from_rank(F.col("_rk"), n, EQUIDEPTH_BUCKETS).alias(
                "bucket"
            ),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .alias("val_cents"),
        )
    )


SQL_EQUIDEPTH_HISTOGRAM = f"""
WITH s AS (
  SELECT NTILE({EQUIDEPTH_BUCKETS}) OVER (ORDER BY value, event_id) AS bucket,
         value
  FROM events
)
SELECT bucket, count(*) AS n,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
FROM s GROUP BY 1
"""


def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via BUCKETED tables — Spark's native
    pre-partitioned-storage primitive (the content-keyed upgrade of the
    reference's rand()-sharded Distributed table, schema.sql:21): both
    sides are written ``bucketBy`` the join key with equal bucket counts
    and in-bucket sort, so the merge join's required distribution and
    ordering are ALREADY satisfied by the layout — the plan carries ZERO
    Exchange over either input (asserted in tests/test_plans.py). At
    100 TB this is the recurring fact/dim join that never reshuffles:
    the shuffle was paid once, at write time, for every future join."""
    import tempfile

    from ..table import write_bucketed

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = tempfile.mkdtemp(prefix="klogs-bucketed-")
    write_bucketed(
        o, "klogs_b_orders", ["o_custkey"], num_buckets=8,
        path=f"{base}/orders", sort_cols=["o_custkey"],
    )
    write_bucketed(
        c, "klogs_b_customer", ["c_custkey"], num_buckets=8,
        path=f"{base}/customer", sort_cols=["c_custkey"],
    )
    ob = spark.table("klogs_b_orders")
    cb = spark.table("klogs_b_customer")
    joined = ob.hint("merge").join(cb, ob.o_custkey == cb.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .alias("rev_cents"),
    )


SQL_BUCKETED_JOIN = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def q_balance_quartiles_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of q_customer_balance_quartiles: same output, same
    exact-NTILE oracle, quartiles from global_rank + ntile_from_rank —
    no single-partition sort of the customer table."""
    from ..ext.caching import cache_tracked
    from ..ext.sampling import global_rank, ntile_from_rank

    c = cache_tracked(
        load_table(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    )
    n = c.count()
    ranked = global_rank(c, ["c_acctbal", "c_custkey"], out_col="_brk")
    return (
        ranked.select(
            ntile_from_rank(F.col("_brk"), n, 4).alias("quartile"),
            "c_acctbal",
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
            .alias("sum_bal_cents"),
        )
    )


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAU/WAU/cumulative-uniques board: per day — distinct actives,
    NEW users (first-ever-seen that day), running total of uniques, and the
    7-day sliding distinct actives (WAU).

    Scale shapes, one per metric: DAU is a keyed distinct aggregate;
    new-users avoids any running-distinct state via the first-day trick
    (min(day) per user, then count per day — cumulative uniques is just
    the running sum of those); WAU's sliding DISTINCT — not expressible as
    a window aggregate — is the day-grid pattern: each (user, day) pair
    joins to the <= 7 calendar days it can contribute to (a bounded
    explode, 7x the daily-user table, NOT events), then a distinct count
    per target day. The only unpartitioned window runs over the per-day
    aggregate — bounded by the calendar, not the data."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.col("user_id").alias("u"), F.to_date("ts").alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    first = ud.groupBy("u").agg(F.min("d").alias("d"))
    news = first.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    # bounded: one row per calendar day (constant non-foldable partition
    # key = same result, no spurious single-partition warning)
    from ..ext.sampling import bounded_window_key

    w = (
        Window.partitionBy(bounded_window_key(F.col("d")))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = (
        dau.join(news, "d", "left")
        .select(
            "d", "dau", F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users")
        )
        .withColumn("cum_users", F.sum("new_users").over(w))
    )
    contrib = ud.select(
        "u", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "d"
    ).select("u", F.date_add(F.col("d"), F.col("off")).alias("d"))
    wau = contrib.groupBy("d").agg(F.count_distinct("u").alias("wau"))
    return base.join(wau, "d").select(
        F.col("d").alias("day"), "dau", "new_users", "cum_users", "wau"
    )


SQL_ACTIVE_USERS = """
WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY 1),
first AS (SELECT u, min(d) AS d FROM ud GROUP BY 1),
news AS (SELECT d, count(*) AS new_users FROM first GROUP BY 1),
base AS (
  SELECT dau.d, dau.dau, COALESCE(news.new_users, 0) AS new_users,
         SUM(COALESCE(news.new_users, 0)) OVER (ORDER BY dau.d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_users
  FROM dau LEFT JOIN news ON dau.d = news.d
),
contrib AS (
  SELECT u, d + CAST(o.off AS INT) AS d
  FROM ud, generate_series(0, 6) AS o(off)
),
wau AS (SELECT d, count(DISTINCT u) AS wau FROM contrib GROUP BY 1)
SELECT base.d AS day, dau, new_users,
       CAST(cum_users AS BIGINT) AS cum_users, wau
FROM base JOIN wau ON base.d = wau.d
"""


PR_DAMPING_NUM, PR_DAMPING_DEN = 85, 100  # d = 0.85 as an exact ratio
PR_ITERS = 2


def q_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph: which event types are
    the "sinks" of user behavior. The corpus-sized work is ONE pass — the
    lag-window edge extraction and the (src, dst) count aggregate; the
    graph itself is event-type x event-type (bounded by type cardinality,
    broadcastable), so the power iterations run on the aggregated matrix,
    never the events. Two unrolled damped iterations from the uniform
    vector, every step rounded at 8 so the oracle's identically-unrolled
    CTE chain matches digit-for-digit. Dangling mass is redistributed
    uniformly (the standard correction) — here every node has out-edges,
    and the oracle shares the same redistribution term."""
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("dst", F.lead("event_type").over(by_user))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    out_tot = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    # transition probability, rounded once — both engines iterate on the
    # same rounded matrix
    trans = (
        edges.join(out_tot, "src")
        .select(
            "src", "dst",
            F.round(F.col("w") / F.col("w_out"), 8).alias("p"),
        )
    )
    nodes = trans.select(F.col("src").alias("node")).union(
        trans.select("dst")
    ).distinct()
    n = nodes.count()  # type cardinality — bounded, driver-side by design
    d = PR_DAMPING_NUM / PR_DAMPING_DEN
    rank = nodes.select("node", F.lit(round(1.0 / n, 8)).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            trans.join(
                rank.select(F.col("node").alias("src"), "r"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("p") * F.col("r")).alias("inflow"))
        )
        rank = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    (1.0 - d) / n
                    + d * F.coalesce(F.col("inflow"), F.lit(0.0)),
                    8,
                ).alias("r"),
            )
        )
    return rank.select("node", F.col("r").alias("pagerank"))


def _sql_pagerank() -> str:
    d = PR_DAMPING_NUM / PR_DAMPING_DEN
    steps = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        steps.append(
            f"""c{i} AS (
  SELECT trans.dst AS node, sum(trans.p * {prev}.r) AS inflow
  FROM trans JOIN {prev} ON trans.src = {prev}.node GROUP BY 1
),
r{i} AS (
  SELECT nodes.node,
         round((1.0 - {d!r}) / n.n + {d!r} * COALESCE(c{i}.inflow, 0.0), 8)
           AS r
  FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node, n
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(steps)
    return f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
edges AS (
  SELECT event_type AS src, dst, count(*) AS w
  FROM ordered WHERE dst IS NOT NULL GROUP BY 1, 2
),
trans AS (
  SELECT e.src, e.dst, round(e.w / CAST(t.w_out AS DOUBLE), 8) AS p
  FROM edges e JOIN (SELECT src, sum(w) AS w_out FROM edges GROUP BY 1) t
    ON e.src = t.src
),
nodes AS (SELECT DISTINCT src AS node FROM trans
          UNION SELECT DISTINCT dst FROM trans),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, round(1.0 / n.n, 8) AS r FROM nodes, n),
{chain}
SELECT node, r AS pagerank FROM {prev}
"""


SQL_PAGERANK_TRANSITIONS = _sql_pagerank()


PATH_TOP_K = 20


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type paths (3-step sequences) inside gap-based sessions —
    the "common user journeys" product-analytics question. Sessions reuse
    the 30-minute-gap assignment; within each session events order by
    (ts, event_id) — the id tiebreak makes simultaneous events
    deterministic, which plain ts ordering is not. The per-session path
    list collapses to one row per session (bounded by session length),
    3-grams are a narrow array-slice transform (same shape as text
    shingles), and the count is one keyed aggregate — no event-level
    self-joins anywhere."""
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    seqs = (
        ev.withColumn("new_s", new_session)
        .withColumn(
            "session_id",
            F.sum("new_s").over(
                by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("ts", "event_id", F.col("event_type").alias("et"))
                )
            ).alias("evs")
        )
        .select(F.transform(F.col("evs"), lambda s: s["et"]).alias("ets"))
    )
    grams = seqs.filter(F.size("ets") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ets") - 3),
                lambda i: F.concat_ws(">", F.slice(F.col("ets"), i + 1, 3)),
            )
        ).alias("path")
    )
    return (
        grams.groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "path")
        .limit(PATH_TOP_K)
    )


SQL_SESSION_PATHS = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
), seqs AS (
  SELECT list(event_type ORDER BY ts, event_id) AS ets
  FROM sess GROUP BY user_id, session_id
), grams AS (
  SELECT unnest(list_transform(
           generate_series(1, len(ets) - 2),
           i -> array_to_string(ets[i:i+2], '>'))) AS path
  FROM seqs WHERE len(ets) >= 3
)
SELECT path, count(*) AS cnt FROM grams
GROUP BY 1 ORDER BY cnt DESC, path LIMIT {PATH_TOP_K}
"""


PAIR_MIN_SUPPORT = 2  # orders containing both parts


def q_frequent_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in at
    least PAIR_MIN_SUPPORT orders, with support counts — the first pass of
    any frequent-itemset miner (the candidate-pair step of Apriori).

    Scale shape: the pair generation is a self-equi-join on the order key,
    and TPC-H-like baskets are small (<= 7 items), so each order emits at
    most C(7,2) pairs — the join output is linear in orders, never
    corpus-quadratic. Items are deduped per order first (a part can appear
    on multiple lines), and the (a < b) ordering halves the pairs. The
    support filter is applied post-aggregate (standard Apriori prune
    point). A skewed mega-basket upstream would be capped by basket size
    in a real pipeline — baskets here are bounded by the data model."""
    l = load_table(spark, sf_dir, "lineitem")
    items = l.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= PAIR_MIN_SUPPORT)
    )


SQL_FREQUENT_ITEM_PAIRS = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS support
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {PAIR_MIN_SUPPORT}
"""


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from the frequent pairs: confidence(a->b) =
    support(a,b)/support(a) and lift = confidence / P(b) — the scoring
    step after candidate mining. Item supports are one aggregate over the
    deduped (order, part) table and BROADCAST onto the pair table twice
    (item-support tables are vocabulary-sized); the order count is a 1-row
    broadcast. Ratios round at 6 with integer inputs — cross-engine exact.
    Top-50 by lift keeps the result bounded."""
    l = load_table(spark, sf_dir, "lineitem")
    items = l.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    item_support = items.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("s_item")
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= PAIR_MIN_SUPPORT)
    )
    sa = item_support.select(
        F.col("part").alias("part_a"), F.col("s_item").alias("s_a")
    )
    sb = item_support.select(
        F.col("part").alias("part_b"), F.col("s_item").alias("s_b")
    )
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .select(
            "part_a", "part_b", "support",
            F.round(F.col("support") / F.col("s_a"), 6).alias("confidence"),
            F.round(
                (F.col("support") / F.col("s_a"))
                / (F.col("s_b") / F.lit(float(n_orders))),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(50)
    )


SQL_ASSOCIATION_RULES = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items),
isup AS (SELECT l_partkey AS part, count(*) AS s_item FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {PAIR_MIN_SUPPORT}
)
SELECT part_a, part_b, support,
       round(support / CAST(sa.s_item AS DOUBLE), 6) AS confidence,
       round((support / CAST(sa.s_item AS DOUBLE))
             / (sb.s_item / n.n_orders), 6) AS lift
FROM pairs
JOIN isup sa ON pairs.part_a = sa.part
JOIN isup sb ON pairs.part_b = sb.part, n
ORDER BY lift DESC, part_a, part_b
LIMIT 50
"""


TS_START = "2024-01-01 00:00:00"
TS_HOURS = 240  # 10 days of hourly buckets


def q_series_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-normalized time-series similarity between entities (cf. the
    distributed streaming-similarity literature, e.g. EDBT'19): build each
    namespace's hourly event-count series over a fixed 240-hour window
    (dense grid, missing hours are true zeros), z-normalize with the
    EXPLICIT sum/sum-of-squares formula (never the engine's stddev — the
    two engines' implementations differ in summation order), and rank
    entity pairs by squared euclidean distance of the aligned normalized
    series.

    Scale shape: series build is one keyed aggregate; the dense grid is
    |keys| x window-length (bounded by the window, not the data); the
    pairwise join is |keys|^2 aligned-index equi-rows — fine for
    dashboard-cardinality keys, and for many keys the corpus's sign-LSH
    bucketing (ext/similarity) applies to the normalized series vectors
    unchanged. Z-scores round at 6 before the distance sum, distance at 4
    — cross-engine exact."""
    ev = load_table(spark, sf_dir, "events")
    ns = F.concat(F.lit("ns-"), (F.col("user_id") % 5).cast("string"))
    hour = F.floor(
        (F.col("ts").cast("long") - F.unix_timestamp(F.lit(TS_START))) / 3600
    ).cast("int")
    counts = (
        ev.select(ns.alias("nsk"), hour.alias("h"))
        .filter((F.col("h") >= 0) & (F.col("h") < TS_HOURS))
        .groupBy("nsk", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = counts.select("nsk").distinct()
    grid = keys.crossJoin(
        spark.range(TS_HOURS).select(F.col("id").cast("int").alias("h"))
    )
    series = grid.join(counts, ["nsk", "h"], "left").select(
        "nsk", "h", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    stats = series.groupBy("nsk").agg(
        F.sum("c").alias("s1"), F.sum(F.col("c") * F.col("c")).alias("s2")
    )
    z = (
        series.join(F.broadcast(stats), "nsk")
        .select(
            "nsk",
            "h",
            F.round(
                (F.col("c") - F.col("s1") / TS_HOURS)
                / F.sqrt(
                    F.col("s2") / TS_HOURS
                    - (F.col("s1") / TS_HOURS) * (F.col("s1") / TS_HOURS)
                ),
                6,
            ).alias("z"),
        )
    )
    # the z table feeds both sides of the pair join and is bounded
    # (|keys| x window) — cache it so the counts aggregate runs once, and
    # broadcast the right side so the pair join never sort-merges
    from ..ext.caching import cache_tracked

    z = cache_tracked(z)
    a = z.select(F.col("nsk").alias("ns_a"), "h", F.col("z").alias("za"))
    b = z.select(F.col("nsk").alias("ns_b"), "h", F.col("z").alias("zb"))
    return (
        a.join(F.broadcast(b), "h")
        .filter(F.col("ns_a") < F.col("ns_b"))
        .groupBy("ns_a", "ns_b")
        .agg(
            F.round(
                F.sum((F.col("za") - F.col("zb")) * (F.col("za") - F.col("zb"))),
                4,
            ).alias("sq_dist")
        )
    )


SQL_SERIES_SIMILARITY = f"""
WITH e AS (
  SELECT 'ns-' || CAST(user_id % 5 AS VARCHAR) AS nsk,
         CAST(floor(epoch(ts - TIMESTAMP '{TS_START}') / 3600) AS INT) AS h
  FROM events
),
counts AS (
  SELECT nsk, h, count(*) AS c FROM e
  WHERE h >= 0 AND h < {TS_HOURS} GROUP BY 1, 2
),
grid AS (
  SELECT k.nsk, g.h FROM (SELECT DISTINCT nsk FROM counts) k,
       (SELECT i AS h FROM generate_series(0, {TS_HOURS - 1}) t(i)) g
),
series AS (
  SELECT grid.nsk, grid.h, COALESCE(counts.c, 0) AS c
  FROM grid LEFT JOIN counts ON grid.nsk = counts.nsk AND grid.h = counts.h
),
stats AS (
  SELECT nsk, CAST(sum(c) AS DOUBLE) AS s1,
         CAST(sum(c * c) AS DOUBLE) AS s2
  FROM series GROUP BY 1
),
z AS (
  SELECT series.nsk, series.h,
         round((series.c - stats.s1 / {TS_HOURS})
               / sqrt(stats.s2 / {TS_HOURS}
                      - (stats.s1 / {TS_HOURS}) * (stats.s1 / {TS_HOURS})),
               6) AS z
  FROM series JOIN stats ON series.nsk = stats.nsk
)
SELECT a.nsk AS ns_a, b.nsk AS ns_b,
       round(sum((a.z - b.z) * (a.z - b.z)), 4) AS sq_dist
FROM z a JOIN z b ON a.h = b.h AND a.nsk < b.nsk
GROUP BY 1, 2
"""


# --- gap-fill / LOCF downsample + peak concurrency (EXT time-series ops) ----
GAPFILL_T0, GAPFILL_T1 = "2024-01-01 00:00:00", "2024-01-07 23:00:00"


def q_events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring-style downsample with gap fill: hourly value series per
    event_type over a sparse user slice, with missing hours materialized
    from a calendar grid and filled with the last observed value — the
    fill(previous)/LOCF of PromQL, InfluxDB and TimescaleDB gapfill,
    which the reference's ClickHouse users get via WITH FILL. Emits both
    the raw observation (NULL in gaps) and the carried-forward value plus
    an is_gap flag, cents-exact per repo convention (per-row x100 before
    summing). Scale shape: the grid is |series| x calendar hours — both
    bounded — so the crossJoin is a declared bounded grid; the LOCF
    window partitions per series (no global sort); the observed
    aggregate is an ordinary map-side-combinable groupBy."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") % 50 == 3)
        & (F.col("ts") >= GAPFILL_T0)
        & (F.col("ts") < "2024-01-08 00:00:00")
    )
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "observed_cents"
        ),
    )
    hours = spark.sql(
        f"SELECT explode(sequence(timestamp'{GAPFILL_T0}', "
        f"timestamp'{GAPFILL_T1}', interval 1 hour)) AS hour"
    )
    grid = obs.select("event_type").distinct().crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(obs, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n_obs", F.lit(0)).alias("n"),
        "observed_cents",
        F.last("observed_cents", ignorenulls=True).over(w).alias(
            "filled_cents"
        ),
        F.col("n_obs").isNull().alias("is_gap"),
    )


SQL_EVENTS_GAPFILL_LOCF = f"""
WITH filt AS (
  SELECT * FROM events
  WHERE user_id % 50 = 3
    AND ts >= TIMESTAMP '{GAPFILL_T0}' AND ts < TIMESTAMP '2024-01-08 00:00:00'
), obs AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_obs,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS observed_cents
  FROM filt GROUP BY 1, 2
), grid AS (
  SELECT s.event_type, h.hour
  FROM (SELECT DISTINCT event_type FROM filt) s,
       generate_series(TIMESTAMP '{GAPFILL_T0}', TIMESTAMP '{GAPFILL_T1}',
                       INTERVAL 1 HOUR) AS h(hour)
)
SELECT g.event_type, g.hour,
       coalesce(o.n_obs, 0) AS n,
       o.observed_cents,
       last_value(o.observed_cents IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
       o.n_obs IS NULL AS is_gap
FROM grid g
LEFT JOIN obs o ON g.event_type = o.event_type AND g.hour = o.hour
"""


KMV_SET_K = 64


def q_events_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra on user segments
    (ext.text.kmv_intersection — Dasgupta et al. 2016): estimate the
    distinct-user UNION and INTERSECTION of the day-1 and day-2
    purchaser segments (56/57 users, 16 shared at sf0.01 — genuinely
    partial overlap, so the intersection path cannot hide behind the
    union's numbers) from two 64-value KMV sketches, next to the exact answers
    so the external check pins the estimator's arithmetic AND its
    accuracy. All integer over the shared md5-prefix hash; a theta
    boundary off-by-one, a union sketch that isn't the re-sketch of
    ka ∪ kb, or a scaling slip all break the single hash-checked row."""
    from ..ext.text import kmv_intersection

    ev = load_table(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase")
    return kmv_intersection(
        pur.filter(F.col("ts") < "2024-01-02 00:00:00").select("user_id"),
        pur.filter(
            (F.col("ts") >= "2024-01-02 00:00:00")
            & (F.col("ts") < "2024-01-03 00:00:00")
        ).select("user_id"),
        "user_id",
        k=KMV_SET_K,
    )


SQL_EVENTS_KMV_INTERSECTION = f"""
WITH ha AS (
  SELECT DISTINCT {md5_long_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'purchase'
    AND ts < TIMESTAMP '2024-01-02 00:00:00'
),
hb AS (
  SELECT DISTINCT {md5_long_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-02 00:00:00'
    AND ts < TIMESTAMP '2024-01-03 00:00:00'
),
ka AS (SELECT h FROM ha ORDER BY h LIMIT {KMV_SET_K}),
kb AS (SELECT h FROM hb ORDER BY h LIMIT {KMV_SET_K}),
ku AS (
  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
  ORDER BY h LIMIT {KMV_SET_K}
),
usk AS (
  SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS theta,
         CAST((count(*) - 1) * CAST(4294967296 AS BIGINT) // max(h)
              AS BIGINT) AS est_union
  FROM ku
),
nb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_both
  FROM ka JOIN kb USING (h), usk
  WHERE ka.h <= usk.theta
),
ex AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM ha) AS exact_a,
         (SELECT CAST(count(*) AS BIGINT) FROM hb) AS exact_b,
         (SELECT CAST(count(*) AS BIGINT) FROM ha JOIN hb USING (h))
           AS exact_intersection
)
SELECT usk.k_used, usk.theta, nb.n_both, usk.est_union,
       CAST(nb.n_both * usk.est_union // usk.k_used AS BIGINT)
         AS est_intersection,
       ex.exact_a, ex.exact_b, ex.exact_intersection
FROM usk, nb, ex
"""


def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the hourly event-count series —
    the classic sequential drift detector (Page 1954), the alerting
    family's entry beyond the existing z-score/MAD/seasonal anomaly
    queries: per event_type, the one-sided CUSUM statistic
    S_t = max(0, S_{t-1} + x_t - k) with integer allowance k just above
    the series mean, alarm when S_t exceeds h = 3k.

    The recursion is NOT a window primitive, but the prefix identity
    S_t = P_t - min(0, min_{j<=t} P_j) (P = running sum of x - k) turns
    it into two ordinary cumulative windows — running sum + running min
    — partitioned PER SERIES over the bounded calendar grid, so nothing
    global is ever sorted and every value stays an exact integer.
    Returns per type: n_hours, k, n_alarms, first_alarm (timestamp,
    NULL when never), max_stat."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= GAPFILL_T0) & (F.col("ts") <= GAPFILL_T1)
    )
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    hours = spark.sql(
        f"SELECT explode(sequence(timestamp'{GAPFILL_T0}', "
        f"timestamp'{GAPFILL_T1}', interval 1 hour)) AS hour"
    )
    grid = obs.select("event_type").distinct().crossJoin(F.broadcast(hours))
    x = grid.join(obs, ["event_type", "hour"], "left").select(
        "event_type", "hour",
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n"),
    )
    kd = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        (F.expr("sum(n) div count(*)") + 1).cast("long").alias("k"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = x.join(kd, "event_type").withColumn(
        "pp", F.sum(F.col("n") - F.col("k")).over(w)
    )
    s = p.withColumn(
        "stat",
        F.col("pp") - F.least(F.lit(0).cast("long"), F.min("pp").over(w)),
    )
    alarm = F.col("stat") > 3 * F.col("k")
    return s.groupBy("event_type").agg(
        F.max("n_hours").alias("n_hours"),
        F.max("k").alias("k"),
        F.sum(alarm.cast("long")).cast("bigint").alias("n_alarms"),
        F.min(F.when(alarm, F.col("hour"))).alias("first_alarm"),
        F.max("stat").cast("bigint").alias("max_stat"),
    )


SQL_EVENTS_CUSUM_CHANGEPOINT = f"""
WITH filt AS (
  SELECT * FROM events
  WHERE ts >= TIMESTAMP '{GAPFILL_T0}' AND ts <= TIMESTAMP '{GAPFILL_T1}'
),
obs AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM filt GROUP BY 1, 2
),
grid AS (
  SELECT s.event_type, h.hour
  FROM (SELECT DISTINCT event_type FROM filt) s,
       generate_series(TIMESTAMP '{GAPFILL_T0}', TIMESTAMP '{GAPFILL_T1}',
                       INTERVAL 1 HOUR) AS h(hour)
),
x AS (
  SELECT g.event_type, g.hour, coalesce(o.n_obs, 0) AS n
  FROM grid g LEFT JOIN obs o
    ON g.event_type = o.event_type AND g.hour = o.hour
),
kd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(n) // count(*) + 1 AS BIGINT) AS k
  FROM x GROUP BY 1
),
p AS (
  SELECT x.event_type, x.hour, x.n, kd.n_hours, kd.k,
         sum(x.n - kd.k) OVER (
           PARTITION BY x.event_type ORDER BY x.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
  FROM x JOIN kd USING (event_type)
),
s AS (
  SELECT *, pp - least(0, min(pp) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS stat
  FROM p
)
SELECT event_type,
       CAST(max(n_hours) AS BIGINT) AS n_hours,
       CAST(max(k) AS BIGINT) AS k,
       CAST(sum(CASE WHEN stat > 3 * k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms,
       min(CASE WHEN stat > 3 * k THEN hour END) AS first_alarm,
       CAST(max(stat) AS BIGINT) AS max_stat
FROM s GROUP BY 1
"""


def q_events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent sessions per day — the ops "how many users were on
    at once" gauge. Sessions are the 30-minute-gap sessionize intervals;
    each contributes +1 at its start and -1 at its end, and concurrency
    is the running sum of those deltas. Distributed form: the running
    sum partitions PER DAY (calendar-bounded — never a global sort),
    and sessions already open at each midnight join in as a per-day
    baseline — the two-phase split that keeps a global interval count
    shuffle-free at 100 TB. Tie discipline: starts sort before ends at
    the same instant (delta DESC), so zero-length single-event sessions
    still register; the per-day peak includes the midnight baseline
    itself (greatest(local_peak, 0)) for days that only close sessions."""
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts")
    gap = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long")).over(by_user)
    )
    sess = (
        ev.withColumn(
            "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(
                by_user.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    )
    deltas = sess.select(
        F.col("start_ts").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        sess.select(F.col("end_ts").alias("ts"), F.lit(-1).alias("delta"))
    )
    byday = (
        Window.partitionBy("day")
        .orderBy(F.col("ts").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peaks = (
        deltas.withColumn("day", F.to_date("ts"))
        .withColumn("cum", F.sum("delta").over(byday))
        .groupBy("day")
        .agg(F.max("cum").alias("local_peak"))
    )
    opens = (
        sess.filter(F.to_date("start_ts") < F.to_date("end_ts"))
        .select(
            F.explode(
                F.sequence(
                    F.date_add(F.to_date("start_ts"), 1),
                    F.to_date("end_ts"),
                )
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("baseline"))
    )
    starts = sess.groupBy(F.to_date("start_ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_sessions_started")
    )
    return (
        peaks.join(opens, "day", "full_outer")
        .join(starts, "day", "left")
        .select(
            "day",
            (
                F.coalesce("baseline", F.lit(0))
                + F.greatest(F.coalesce("local_peak", F.lit(0)), F.lit(0))
            ).cast("long").alias("peak_concurrency"),
            F.coalesce("n_sessions_started", F.lit(0))
            .cast("long")
            .alias("n_sessions_started"),
        )
    )


SQL_EVENTS_PEAK_CONCURRENCY = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
), sess AS (
  SELECT user_id, session_id,
         min(ts) AS start_ts, max(ts) AS end_ts
  FROM numbered GROUP BY user_id, session_id
), deltas AS (
  SELECT start_ts AS ts, 1 AS delta FROM sess
  UNION ALL
  SELECT end_ts, -1 FROM sess
), running AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(delta) OVER (PARTITION BY CAST(ts AS DATE)
                          ORDER BY ts, delta DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM deltas
), peaks AS (
  SELECT day, max(cum) AS local_peak FROM running GROUP BY day
), opens AS (
  SELECT d.day, count(*) AS baseline
  FROM (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                           DATE '2024-01-31',
                                           INTERVAL 1 DAY)) AS DATE)
          AS day) d
  JOIN sess s
    ON d.day > CAST(s.start_ts AS DATE) AND d.day <= CAST(s.end_ts AS DATE)
  GROUP BY 1
), starts AS (
  SELECT CAST(start_ts AS DATE) AS day, count(*) AS n_sessions_started
  FROM sess GROUP BY 1
)
SELECT coalesce(p.day, o.day) AS day,
       CAST(coalesce(o.baseline, 0)
            + greatest(coalesce(p.local_peak, 0), 0) AS BIGINT)
         AS peak_concurrency,
       CAST(coalesce(st.n_sessions_started, 0) AS BIGINT)
         AS n_sessions_started
FROM peaks p
FULL JOIN opens o ON p.day = o.day
LEFT JOIN starts st ON coalesce(p.day, o.day) = st.day
"""


def q_events_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware counter rate — PromQL increase() semantics: the input
    is a SAMPLED monotonic counter (hourly samples of a per-(series, day)
    cumulative count, so every midnight is a genuine counter restart),
    and the operator recovers per-day increase by differencing adjacent
    samples with reset correction (a drop means the counter restarted:
    the increase since the reset is the new value itself, Prometheus's
    rule). Emits daily_increase + n_resets per series. Scale shape: the
    cumulative window runs over the hourly AGGREGATE (never raw events)
    partitioned per (series, day); the cross-day lag partitions per
    series over calendar-bounded hours."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wday = (
        Window.partitionBy("event_type", "day")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sampled = hourly.withColumn("counter", F.sum("n").over(wday))
    series = Window.partitionBy("event_type").orderBy("hour")
    prev = F.lag("counter").over(series)
    inc = (
        F.when(prev.isNull(), F.col("counter"))
        .when(F.col("counter") >= prev, F.col("counter") - prev)
        .otherwise(F.col("counter"))
    )
    rst = F.when(prev.isNotNull() & (F.col("counter") < prev), 1).otherwise(0)
    return (
        sampled.withColumn("inc", inc)
        .withColumn("rst", rst)
        .groupBy("event_type", "day")
        .agg(
            F.sum("inc").cast("long").alias("daily_increase"),
            F.sum("rst").cast("long").alias("n_resets"),
        )
    )


SQL_EVENTS_COUNTER_RATE = """
WITH hourly AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2, 3
), sampled AS (
  SELECT event_type, day, hour,
         SUM(n) OVER (PARTITION BY event_type, day ORDER BY hour
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS counter
  FROM hourly
), diffed AS (
  SELECT event_type, day, counter,
         lag(counter) OVER (PARTITION BY event_type ORDER BY hour) AS prev
  FROM sampled
)
SELECT event_type, day,
       CAST(sum(CASE WHEN prev IS NULL THEN counter
                     WHEN counter >= prev THEN counter - prev
                     ELSE counter END) AS BIGINT) AS daily_increase,
       CAST(sum(CASE WHEN prev IS NOT NULL AND counter < prev
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
FROM diffed GROUP BY 1, 2
"""


SPECS = {
    "tpch_q1_pricing_summary": QuerySpec(q1_pricing_summary, SQL_Q1,
                                         "scan+filter+multi-agg group-by"),
    "tpch_q3_shipping_priority": QuerySpec(q3_shipping_priority, SQL_Q3,
                                           "3-way join + top-k"),
    "tpch_q5_local_supplier": QuerySpec(q5_local_supplier, SQL_Q5,
                                        "6-way broadcast join chain"),
    "tpch_q6_forecast_revenue": QuerySpec(q6_forecast_revenue, SQL_Q6,
                                          "selective filter + single agg"),
    "tpch_q10_returned_items": QuerySpec(q10_returned_items, SQL_Q10,
                                         "join + group + top-k"),
    "tpch_q18_big_orders": QuerySpec(q18_big_orders, SQL_Q18,
                                     "HAVING subquery + joins + top-k"),
    "tpch_q4_priority_check": QuerySpec(q4_priority_check, SQL_Q4,
                                        "correlated EXISTS as semi join"),
    "tpch_q12_priority_counts": QuerySpec(q12_priority_counts, SQL_Q12,
                                          "fact-fact join + dual CASE-sums"),
    "tpch_q14_promo_revenue": QuerySpec(q14_promo_revenue, SQL_Q14,
                                        "conditional-sum ratio over join"),
    "tpch_q19_disjunctive_revenue": QuerySpec(q19_disjunctive_revenue, SQL_Q19,
                                              "OR-of-ANDs multi-range join"),
    "tpch_q7_volume_shipping": QuerySpec(q7_volume_shipping, SQL_Q7,
                                         "bidirectional nation pair + year"),
    "tpch_q8_market_share": QuerySpec(q8_market_share, SQL_Q8,
                                      "8-way join + conditional share"),
    "tpch_q13_customer_distribution": QuerySpec(q13_customer_distribution,
                                                SQL_Q13,
                                                "left join + 2-level agg"),
    "tpch_q22_dormant_customers": QuerySpec(q22_dormant_customers, SQL_Q22,
                                            "scalar subquery + anti join"),
    "tpch_q17_small_quantity": QuerySpec(q17_small_quantity, SQL_Q17,
                                         "correlated scalar avg as "
                                         "broadcast threshold join"),
    "tpch_q21_waiting_suppliers": QuerySpec(q21_waiting_suppliers, SQL_Q21,
                                            "EXISTS+NOT EXISTS semi/anti "
                                            "chain"),
    "tpch_q15_top_supplier": QuerySpec(q15_top_supplier, SQL_Q15,
                                       "revenue view + scalar-max top "
                                       "supplier"),
    "window_order_rank": QuerySpec(q_order_rank, SQL_ORDER_RANK,
                                   "row_number + running sum"),
    "agg_orders_rollup": QuerySpec(q_orders_rollup, SQL_ORDERS_ROLLUP,
                                   "A6 rollup"),
    "agg_lineitem_cube": QuerySpec(q_lineitem_cube, SQL_LINEITEM_CUBE,
                                   "A6 cube"),
    "window_order_gaps": QuerySpec(q_order_gaps, SQL_ORDER_GAPS,
                                   "lead() inter-order gaps"),
    "setop_churned_customers": QuerySpec(q_churned_customers, SQL_CHURNED,
                                         "EXCEPT set op"),
    "join_parts_never_ordered": QuerySpec(q_parts_never_ordered,
                                          SQL_PARTS_NEVER_ORDERED,
                                          "anti join"),
    "events_sessionize": QuerySpec(q_event_sessions, SQL_EVENT_SESSIONS,
                                   "gap-based sessionization"),
    "agg_orders_grouping_sets": QuerySpec(
        q_orders_grouping_sets, SQL_ORDERS_GROUPING_SETS,
        "GROUPING SETS in one Expand pass with grouping_id disambiguation"),
    "events_funnel": QuerySpec(q_events_funnel, SQL_EVENTS_FUNNEL,
                               "ordered view->click->purchase conversion "
                               "funnel (user-keyed min-aggregates)"),
    "events_counter_rate": QuerySpec(
        q_events_counter_rate, SQL_EVENTS_COUNTER_RATE,
        "reset-aware counter rate (PromQL increase): sampled cumulative "
        "counters differenced with restart correction"),
    "events_kmv_intersection": QuerySpec(
        q_events_kmv_intersection, SQL_EVENTS_KMV_INTERSECTION,
        "theta-sketch set algebra: distinct-user union AND intersection "
        "of two segments from 64-value KMV sketches, integer estimators "
        "pinned next to the exact answers"),
    "events_cusum_changepoint": QuerySpec(
        q_events_cusum_changepoint, SQL_EVENTS_CUSUM_CHANGEPOINT,
        "CUSUM drift detection (Page 1954) per event-type hourly series: "
        "the max-recursion as two cumulative windows via the prefix "
        "identity, integer allowance/threshold, per-series partitions"),
    "events_gapfill_locf": QuerySpec(
        q_events_gapfill_locf, SQL_EVENTS_GAPFILL_LOCF,
        "hourly downsample with calendar gap fill + LOCF carry-forward "
        "(fill(previous)), per-series window only"),
    "events_peak_concurrency": QuerySpec(
        q_events_peak_concurrency, SQL_EVENTS_PEAK_CONCURRENCY,
        "max concurrent sessions per day: +1/-1 interval deltas, per-day "
        "running sum + midnight-baseline join (no global sort)"),
    "events_retention_cohorts": QuerySpec(
        q_events_retention, SQL_EVENTS_RETENTION,
        "first-activity-day retention cohorts at offsets 0/1/7/14/28 "
        "(broadcast cohort map)"),
    "agg_orders_pivot": QuerySpec(
        q_orders_pivot, SQL_ORDERS_PIVOT,
        "PIVOT with enumerated values (single-pass conditional sums)"),
    "window_daily_revenue_trend": QuerySpec(
        q_daily_revenue_trend, SQL_DAILY_REVENUE_TREND,
        "ROWS-frame windows: 7-day moving average + cumulative sum in "
        "exact integer cents"),
    "window_revenue_ema": QuerySpec(
        q_revenue_ema, SQL_REVENUE_EMA,
        "dyadic-weight EMA of daily revenue — integer arithmetic "
        "end-to-end"),
    "window_rolling_p95": QuerySpec(
        q_rolling_p95, SQL_ROLLING_P95,
        "rolling 7-day p95 of daily order counts (calendar-bounded "
        "range self-join + exact percentile)"),
    "window_balance_quartiles": QuerySpec(
        q_customer_balance_quartiles, SQL_BALANCE_QUARTILES,
        "ntile quartiles with deterministic tiebreak + exact-cents "
        "profile"),
    "events_attribution": QuerySpec(
        q_events_attribution, SQL_EVENTS_ATTRIBUTION,
        "first/last-touch attribution matrix via min_by/max_by"),
    "events_series_similarity": QuerySpec(
        q_series_similarity, SQL_SERIES_SIMILARITY,
        "z-normalized hourly-series pairwise similarity (explicit "
        "moment formula, dense zero-filled grid)"),
    "tpch_frequent_item_pairs": QuerySpec(
        q_frequent_item_pairs, SQL_FREQUENT_ITEM_PAIRS,
        "market-basket co-occurrence pairs with Apriori support prune "
        "(basket-bounded self-join, linear in orders)"),
    "tpch_association_rules": QuerySpec(
        q_association_rules, SQL_ASSOCIATION_RULES,
        "confidence/lift rule scoring over the frequent pairs "
        "(broadcast item supports, top-50 by lift)"),
    "events_session_paths": QuerySpec(
        q_session_paths, SQL_SESSION_PATHS,
        "top 3-step event paths within gap sessions (narrow array-slice "
        "grams, no event self-joins)"),
    "events_pagerank_transitions": QuerySpec(
        q_pagerank_transitions, SQL_PAGERANK_TRANSITIONS,
        "PageRank on the event-type transition graph (one corpus pass for "
        "edges; iterations on the bounded matrix)"),
    "events_active_users": QuerySpec(
        q_active_users, SQL_ACTIVE_USERS,
        "DAU / new users / cumulative uniques (first-day trick) / sliding "
        "7-day WAU (day-grid distinct)"),
    "tpch_rfm_segments": QuerySpec(
        q_rfm_segments, SQL_RFM_SEGMENTS,
        "RFM quartile segmentation (ntile windows over the customer "
        "aggregate, cents-exact monetary)"),
    "events_cohort_ltv": QuerySpec(
        q_cohort_ltv, SQL_COHORT_LTV,
        "cohort LTV curves: cents-exact weekly value, cumulative window "
        "over the bounded (cohort, offset) aggregate"),
    "tpch_bucketed_join": QuerySpec(
        q_bucketed_colocated_join, SQL_BUCKETED_JOIN,
        "shuffle-free co-located join via bucketed tables (equal bucket "
        "count + key both sides; zero Exchange, plan-asserted)"),
    "events_equidepth_histogram": QuerySpec(
        q_equidepth_histogram, SQL_EQUIDEPTH_HISTOGRAM,
        "exact equi-depth histogram via distributed global_rank + "
        "closed-form NTILE (no unpartitioned window)"),
    "tpch_revenue_concentration": QuerySpec(
        q_revenue_concentration, SQL_REVENUE_CONCENTRATION,
        "Pareto revenue concentration (top 1/5/10/25 percent shares, "
        "integer ppm) via distributed descending global_rank"),
    "events_wau_hll": QuerySpec(
        q_wau_hll, _wau_hll_sql(),
        "sliding 7-day distinct via merged per-day HLL partials "
        "(registers move, not users); engine-exact estimate + exact WAU"),
    "tpch_rfm_segments_scaled": QuerySpec(
        q_rfm_segments_scaled, SQL_RFM_SEGMENTS,
        "scale-safe RFM: distributed global_rank + closed-form NTILE, "
        "no unpartitioned window; hash-matches the exact-ntile oracle"),
    "window_balance_quartiles_scaled": QuerySpec(
        q_balance_quartiles_scaled, SQL_BALANCE_QUARTILES,
        "scale-safe balance quartiles via global_rank + closed-form "
        "NTILE; same exact oracle as the window form"),
}
