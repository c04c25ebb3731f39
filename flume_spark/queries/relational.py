"""Engine-native relational surface (SURVEY.md §2.3-2.7).

The reference performs no relational processing (scripbox/flume is a job
queue — SURVEY.md §2.3 "Joins: none"); this module declares the standard
Catalyst-provided surface our engine exposes, verified against DuckDB.

Float policy: any *computed* double aggregate is wrapped in round(_, k) in
BOTH the Spark query and the oracle so summation-order nondeterminism
(partial aggregation across partitions) cannot flip the value hash.  Raw
doubles read from parquet pass through untouched (bit-identical by
construction).  Queries with LIMIT order by the rounded value + a unique
tie-break key so both engines select the same row set.

Scale notes (100 TB): every query here is a declarative plan — filters and
projections push down to the parquet scan, small dimensions broadcast
(`F.broadcast`), aggregation is partial (map-side combine) by default, and
AQE handles skew/partition sizing at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_spark.queries._util import T, register_views

# ---------------------------------------------------------------------------
# Aggregation queries
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan aggregate with partial (map-side) combine."""
    li = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
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


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                          AS sum_qty,
       round(sum(l_extendedprice), 2)                                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
       round(avg(l_quantity), 4)                                          AS avg_qty,
       round(avg(l_extendedprice), 4)                                     AS avg_price,
       round(avg(l_discount), 4)                                          AS avg_disc,
       count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-K.

    customer is small -> broadcast; the orders⋈lineitem join shuffles on
    orderkey (co-partitioned by key at scale).
    """
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; dims broadcast, facts shuffle on keys."""
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = T(spark, sf_dir, "nation")
    cust = T(spark, sf_dir, "customer")
    supp = T(spark, sf_dir, "supplier")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Scans / filters / projections
# ---------------------------------------------------------------------------


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection — both push down to the parquet scan."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.09)
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 10
"""


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint — no shuffle of orders."""
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_acctbal"
    )


JOIN_BROADCAST_SQL = """
SELECT o_orderkey, o_totalprice, c_name, c_acctbal
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'AUTOMOBILE'
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers having at least one high-value order."""
    cust = T(spark, sf_dir, "customer")
    big = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 50000)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no orders at all."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate join (band join on price vs retail price)."""
    part = T(spark, sf_dir, "part")
    li = T(spark, sf_dir, "lineitem")
    joined = li.join(
        F.broadcast(part),
        (li.l_partkey == part.p_partkey)
        & (li.l_extendedprice >= part.p_retailprice * 0.5)
        & (li.l_extendedprice <= part.p_retailprice * 20.0),
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


JOIN_RANGE_SQL = """
SELECT p_brand, count(*) AS n_lines, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem JOIN part
  ON l_partkey = p_partkey
 AND l_extendedprice >= p_retailprice * 0.5
 AND l_extendedprice <= p_retailprice * 20.0
GROUP BY p_brand
"""


def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every nation with its (possibly zero) customer count."""
    nation = T(spark, sf_dir, "nation")
    cust = T(spark, sf_dir, "customer")
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left_outer")
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.sum(F.coalesce(F.col("c_acctbal"), F.lit(0.0))), 2).alias(
                "sum_acctbal"
            ),
        )
    )


JOIN_OUTER_SQL = """
SELECT n_nationkey, n_name, count(c_custkey) AS n_customers,
       round(sum(coalesce(c_acctbal, 0.0)), 2) AS sum_acctbal
FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
GROUP BY n_nationkey, n_name
"""


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


AGG_DISTINCT_SQL = """
SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderstatus
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by balance (row_number / rank / dense_rank)."""
    cust = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


WINDOW_RANK_SQL = """
SELECT * FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         row_number() OVER w AS rn,
         rank()       OVER w AS rnk,
         dense_rank() OVER w AS drnk
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
) WHERE rn <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag over each customer's order history."""
    orders = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
    )


WINDOW_RUNNING_SUM_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(lag(o_totalprice, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
       round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price
FROM orders WHERE o_custkey < 100
"""


def window_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: 4-event moving sum + min/max per user."""
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("moving_sum"),
        F.min("value").over(w).alias("moving_min"),
        F.max("value").over(w).alias("moving_max"),
    )


WINDOW_MOVING_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 4) AS moving_sum,
       min(value) OVER w AS moving_min,
       max(value) OVER w AS moving_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value analytics with default fill."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value", 1, 0.0).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT event_id, user_id,
       lag(value, 1, 0.0) OVER w  AS prev_value,
       lead(value, 1) OVER w      AS next_value,
       first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS first_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: coalesce / nullif / nvl2-style / nan guards."""
    ev = T(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 1000).select(
        "event_id",
        F.coalesce(F.col("props"), F.lit("{}")).alias("props_or_empty"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_unless_error"),
        F.when(F.col("value").isNull(), -1.0)
        .otherwise(F.col("value"))
        .alias("value_filled"),
        F.isnull(F.col("value")).alias("value_is_null"),
    )


SCALAR_NULL_SQL = """
SELECT event_id,
       coalesce(props, '{}')            AS props_or_empty,
       nullif(event_type, 'error')      AS type_unless_error,
       CASE WHEN value IS NULL THEN -1.0 ELSE value END AS value_filled,
       value IS NULL                    AS value_is_null
FROM events WHERE event_id < 1000
"""


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT — Spark plans TakeOrderedAndProject (no full sort)."""
    orders = T(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)
    )


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return a.union(b).distinct()


SET_UNION_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 9000
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


SET_INTERSECT_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.subtract(b)


SET_EXCEPT_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity = min of the two sides)
    over line items' (orderkey, quantity) multisets — a DISTINCT Catalyst
    path from the set-semantics ops (planned as a row_number-tagged join,
    not an Aggregate+join), and the variant reconciliation jobs need when
    duplicate rows are information."""
    li = T(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linestatus") == "O").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    b = li.filter(F.col("l_returnflag") == "N").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    return a.intersectAll(b)


SET_INTERSECT_ALL_SQL = """
SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS qty FROM lineitem
WHERE l_linestatus = 'O'
INTERSECT ALL
SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS qty FROM lineitem
WHERE l_returnflag = 'N'
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity = left minus right, floored
    at zero) on the same multisets — the duplicate-aware difference that
    catches 'row lost one copy' reconciliation drift an EXCEPT DISTINCT
    hides."""
    li = T(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linestatus") == "O").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    return a.exceptAll(b)


SET_EXCEPT_ALL_SQL = """
SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS qty FROM lineitem
WHERE l_linestatus = 'O'
EXCEPT ALL
SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS qty FROM lineitem
WHERE l_returnflag = 'R'
"""


# ---------------------------------------------------------------------------
# Scalar function surface (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("name_novowel"),
        F.instr(F.col("p_name"), "a").alias("pos_a"),
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_pad"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


SCALAR_STRING_SQL = """
SELECT p_partkey,
       upper(p_name)                         AS name_upper,
       lower(p_brand)                        AS brand_lower,
       length(p_name)                        AS name_len,
       substring(p_type, 1, 5)               AS type_head,
       concat_ws('|', p_brand, p_type)       AS brand_type,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
       strpos(p_name, 'a')                   AS pos_a,
       lpad(p_brand, 12, '*')                AS brand_pad,
       trim(p_name)                          AS name_trim,
       reverse(p_brand)                      AS brand_rev
FROM part WHERE p_partkey < 200
"""


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 2 MONTH")).alias("plus_2m"),
        (F.col("o_orderdate") - F.expr("INTERVAL 7 DAY")).alias("minus_7d"),
    )


SCALAR_DATE_SQL = """
SELECT o_orderkey,
       year(o_orderdate)                  AS yr,
       month(o_orderdate)                 AS mo,
       day(o_orderdate)                   AS dy,
       quarter(o_orderdate)               AS qtr,
       date_trunc('month', o_orderdate)   AS month_start,
       datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_95,
       o_orderdate + INTERVAL 2 MONTH     AS plus_2m,
       o_orderdate - INTERVAL 7 DAY       AS minus_7d
FROM orders WHERE o_orderkey < 500
"""


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.round(F.col("l_extendedprice"), 1).alias("round_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


SCALAR_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)          AS abs_disc,
       CAST(ceil(l_extendedprice) AS BIGINT)  AS ceil_price,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
       round(l_extendedprice, 1)       AS round_price,
       round(sqrt(l_quantity), 6)      AS sqrt_qty,
       round(ln(l_extendedprice), 6)   AS ln_price,
       round(pow(l_quantity, 2), 2)    AS qty_sq,
       l_linenumber % 3                AS line_mod,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       greatest(l_tax, l_discount)     AS max_rate,
       least(l_tax, l_discount)        AS min_rate
FROM lineitem WHERE l_orderkey < 100
"""


def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_int"),
    )


SCALAR_JSON_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k')           AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int
FROM events WHERE event_id < 1000
"""


def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


CASE_WHEN_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS bucket,
       count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
FROM orders GROUP BY 1
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance.
    6dp rounding absorbs partial-aggregation summation-order noise."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6)                 AS sd_qty,
       round(var_samp(l_discount), 6)                    AS var_disc,
       round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
FROM lineitem GROUP BY l_returnflag
"""


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch — no oracle (approximate by design; driver
    records a rows-only check)."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# ---------------------------------------------------------------------------
# Subqueries, pivot/unpivot, lateral explode, ordered array agg
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join."""
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1995-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
        """
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1995-01-01'
  AND o_orderdate < DATE '1995-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filter + single aggregate; every predicate
    reaches the parquet scan (PushedFilters)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery -> broadcast of a 1-row aggregate."""
    register_views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > 1.5 * (SELECT avg(p_retailprice) FROM part)
        """
    )


SCALAR_SUBQUERY_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > 1.5 * (SELECT avg(p_retailprice) FROM part)
"""


def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2 shape) — Catalyst decorrelates
    it into an aggregate + join, no per-row re-execution."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal = (
          SELECT max(c2.c_acctbal) FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


CORRELATED_SUBQUERY_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer c
WHERE c_acctbal = (
  SELECT max(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
"""


def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit values (no discovery scan)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_linestatus",
            F.col("A").alias("qty_a"),
            F.col("N").alias("qty_n"),
            F.col("R").alias("qty_r"),
        )
    )


PIVOT_SQL = """
SELECT l_linestatus,
       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
FROM lineitem GROUP BY l_linestatus
"""


def unpivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt wide columns into (metric, value) rows."""
    orders = T(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 1000)
        .select("o_orderkey", "o_totalprice", "o_custkey")
        .unpivot(
            "o_orderkey",
            ["o_totalprice", "o_custkey"],
            "metric",
            "value",
        )
    )


UNPIVOT_SQL = """
SELECT o_orderkey, 'o_totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS value
FROM orders WHERE o_orderkey < 1000
UNION ALL
SELECT o_orderkey, 'o_custkey', CAST(o_custkey AS DOUBLE)
FROM orders WHERE o_orderkey < 1000
"""


def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode with position (posexplode ≙ unnest WITH ORDINALITY)."""
    docs = T(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return (
        docs.filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(toks).alias("pos", "token"))
    )


EXPLODE_SQL = """
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, i - 1 AS pos, words[i] AS token
FROM w, unnest(range(1, len(words) + 1)) AS t(i)
"""


def array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect: per-order line numbers as a sorted CSV string
    (string form so the value hash is engine-independent)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 500)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("l_linenumber"))), ","
            ).alias("linenumbers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ARRAY_AGG_SQL = """
SELECT l_orderkey,
       string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS linenumbers,
       count(*) AS n_lines
FROM lineitem WHERE l_orderkey < 500
GROUP BY l_orderkey
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join, revenue agg, top-20 — dims broadcast,
    the lineitem returnflag filter pushes to the scan."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1994-07-01").cast("timestamp"))
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate < TIMESTAMP '1994-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio over a broadcast join."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(0.0)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo), 2).alias("promo_revenue"),
            F.round(F.sum(revenue), 2).alias("total_revenue"),
        )
    )


Q14_SQL = """
SELECT round(sum(CASE WHEN p_type LIKE 'PROMO%'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
         AS promo_revenue,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate < TIMESTAMP '1995-10-01'
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped join (agg pushed before the
    orders join via the inner groupBy)."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(50)
    )


Q18_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
) big
JOIN orders ON l_orderkey = o_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame (vs the ROWS frame of window_moving_agg): per
    customer, order spend over the trailing 30 days BY DATE VALUE — frame
    membership is determined by the timestamp, so equal-date ties all join
    the frame regardless of physical order (deterministic across engines;
    a ROWS frame would not be)."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ), 2) AS spend_30d
        FROM orders
        """
    )


WINDOW_RANGE_SQL = """
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW
       ), 2) AS spend_30d
FROM orders
"""


# ---------------------------------------------------------------------------
# Skew toolkit queries — salted physical plans, unsalted semantics
# ---------------------------------------------------------------------------


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join (operators/skew.py): lineitem's supplier key scattered
    across 8 salt sub-partitions, supplier replicated 8x.  The oracle is the
    PLAIN join — salting must not change a single row, only the shuffle
    distribution.  At 100 TB this is the shape for a hot-key fact-dim join
    too big to broadcast."""
    from flume_spark.operators.skew import salted_join

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, on=["l_suppkey"], salt_src="l_orderkey", n_salt=8)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


JOIN_SKEW_SALTED_SQL = """
SELECT s_nationkey, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


def agg_count_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase exact distinct count (operators/skew.py): each priority's
    customer-id space is hash-sliced into 16 disjoint buckets whose distinct
    counts are additive.  Identical result to COUNT(DISTINCT); no reducer
    ever builds one giant per-key distinct set."""
    from flume_spark.operators.skew import salted_count_distinct

    orders = T(spark, sf_dir, "orders")
    return salted_count_distinct(
        orders, ["o_orderpriority"], "o_custkey", n_salt=16, out_col="n_customers"
    )


AGG_CD_SALTED_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderpriority
"""


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram — single partial-agg pass; bucket boundaries on
    exact integer multiples so double division can't flip a bucket."""
    li = T(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000).cast("bigint")
    return li.groupBy(bucket.alias("price_bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


AGG_HISTOGRAM_SQL = """
SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS price_bucket,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY 1
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "filter_project": filter_project,
    "join_broadcast": join_broadcast,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_range": join_range,
    "join_outer": join_outer,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "window_rank": window_rank,
    "window_running_sum": window_running_sum,
    "window_moving_agg": window_moving_agg,
    "window_lag_lead": window_lag_lead,
    "scalar_null_funcs": scalar_null_funcs,
    "topk_orders": topk_orders,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_intersect_all": set_intersect_all,
    "set_except_all": set_except_all,
    "scalar_string_funcs": scalar_string_funcs,
    "scalar_date_funcs": scalar_date_funcs,
    "scalar_math_funcs": scalar_math_funcs,
    "scalar_json_funcs": scalar_json_funcs,
    "case_when_bucketing": case_when_bucketing,
    "agg_stats": agg_stats,
    "approx_distinct": approx_distinct,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume": q18_large_volume,
    "scalar_subquery": scalar_subquery,
    "correlated_subquery": correlated_subquery,
    "pivot_returnflag": pivot_returnflag,
    "unpivot_orders": unpivot_orders,
    "explode_tokens": explode_tokens,
    "array_agg_sorted": array_agg_sorted,
    "window_range_frame": window_range_frame,
    "join_skew_salted": join_skew_salted,
    "agg_count_distinct_salted": agg_count_distinct_salted,
    "agg_histogram": agg_histogram,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "filter_project": FILTER_PROJECT_SQL,
    "join_broadcast": JOIN_BROADCAST_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_range": JOIN_RANGE_SQL,
    "join_outer": JOIN_OUTER_SQL,
    "agg_distinct": AGG_DISTINCT_SQL,
    "agg_rollup": AGG_ROLLUP_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "agg_grouping_sets": AGG_GROUPING_SETS_SQL,
    "window_rank": WINDOW_RANK_SQL,
    "window_running_sum": WINDOW_RUNNING_SUM_SQL,
    "window_moving_agg": WINDOW_MOVING_SQL,
    "window_lag_lead": WINDOW_LAG_LEAD_SQL,
    "scalar_null_funcs": SCALAR_NULL_SQL,
    "topk_orders": TOPK_ORDERS_SQL,
    "set_union": SET_UNION_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "set_intersect_all": SET_INTERSECT_ALL_SQL,
    "set_except_all": SET_EXCEPT_ALL_SQL,
    "scalar_string_funcs": SCALAR_STRING_SQL,
    "scalar_date_funcs": SCALAR_DATE_SQL,
    "scalar_math_funcs": SCALAR_MATH_SQL,
    "scalar_json_funcs": SCALAR_JSON_SQL,
    "case_when_bucketing": CASE_WHEN_SQL,
    "agg_stats": AGG_STATS_SQL,
    # approx_distinct: intentionally no oracle (HLL is approximate).
    "q4_order_priority": Q4_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_volume": Q18_SQL,
    "scalar_subquery": SCALAR_SUBQUERY_SQL,
    "correlated_subquery": CORRELATED_SUBQUERY_SQL,
    "pivot_returnflag": PIVOT_SQL,
    "unpivot_orders": UNPIVOT_SQL,
    "explode_tokens": EXPLODE_SQL,
    "array_agg_sorted": ARRAY_AGG_SQL,
    "window_range_frame": WINDOW_RANGE_SQL,
    "join_skew_salted": JOIN_SKEW_SALTED_SQL,
    "agg_count_distinct_salted": AGG_CD_SALTED_SQL,
    "agg_histogram": AGG_HISTOGRAM_SQL,
}
