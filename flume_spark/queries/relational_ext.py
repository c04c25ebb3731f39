"""Round-3 relational surface extensions.

- q11_important_stock: the one classic TPC-H shape the suite lacked (Q11,
  group-having vs a global-total scalar).  The synthetic schema has no
  partsupp, so value = lineitem revenue per part (surrogate policy as in
  tpch_extra.py); the threshold compare runs in EXACT integer cents-x-pct
  space so no floating-point boundary can flip membership across engines.
- window_ntile_dist: distribution window functions (ntile / percent_rank /
  cume_dist) — ratios of ints, IEEE-identical across engines.
- scalar_array_funcs: array built-in coverage (sort/distinct/slice/contains/
  position/zip) verified against DuckDB list functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_spark.queries._util import T, register_views

# ---------------------------------------------------------------------------
# TPC-H Q11 shape: per-part revenue share above a global-total fraction
# ---------------------------------------------------------------------------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by + HAVING against a broadcast scalar total.

    Scale shape: one partial-agg shuffle on l_partkey; the corpus total is a
    second 1-row aggregate over the SAME partial aggregates (reused plan
    subtree), broadcast back via crossJoin.  Exact math: revenue in
    cents x (100 - discount_pct) units (bigint), threshold = total / 2000
    (0.05% of corpus revenue) compared as value * 2000 > total — integers
    end to end."""
    li = T(spark, sf_dir, "lineitem")
    value_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(value_e4).alias("value_e4"))
    total = per_part.agg(F.sum("value_e4").alias("total_e4"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_e4") * 2000 > F.col("total_e4"))
        .select(
            "l_partkey",
            F.round(F.col("value_e4") / 1e4, 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS value_e4
  FROM lineitem GROUP BY 1
),
total AS (SELECT sum(value_e4) AS total_e4 FROM per_part)
SELECT l_partkey,
       round(CAST(value_e4 AS DOUBLE) / 1e4, 2) AS part_value
FROM per_part, total
WHERE value_e4 * 2000 > total_e4
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Distribution window functions
# ---------------------------------------------------------------------------


def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist within order priority, total-ordered by
    (o_totalprice desc, o_orderkey) so ranks are deterministic.  One
    shuffle on the partition key; each partition sorts independently."""
    orders = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


WINDOW_NTILE_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER w AS INT)        AS quartile,
       round(percent_rank() OVER w, 6)     AS pct_rank,
       round(cume_dist() OVER w, 6)        AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


# ---------------------------------------------------------------------------
# Array built-in coverage
# ---------------------------------------------------------------------------


def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over the first 12 document tokens: sort, distinct,
    slice, contains, position, reverse, element access.  Map-only."""
    docs = T(spark, sf_dir, "documents")
    arr = F.slice(F.split(F.lower(F.trim("text")), r"\s+"), 1, 12)
    out = docs.select(F.col("doc_id"), arr.alias("_a"))
    return out.select(
        "doc_id",
        F.size("_a").alias("n"),
        F.array_join(F.array_sort("_a"), " ").alias("sorted_join"),
        F.size(F.array_distinct("_a")).alias("n_distinct"),
        F.array_join(F.slice("_a", 3, 4), " ").alias("mid_slice"),
        F.array_contains("_a", "table").cast("int").alias("has_table"),
        F.array_position("_a", "scan").cast("int").alias("scan_pos"),
        F.element_at("_a", -1).alias("last_tok"),
        F.array_join(F.reverse("_a"), " ").alias("reversed_join"),
    )


SCALAR_ARRAY_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_slice(regexp_split_to_array(lower(trim(text)), '\s+'), 1, 12) AS a
  FROM documents
)
SELECT doc_id,
       len(a)                                        AS n,
       array_to_string(list_sort(a), ' ')            AS sorted_join,
       len(list_distinct(a))                         AS n_distinct,
       array_to_string(list_slice(a, 3, 6), ' ')     AS mid_slice,
       CAST(list_contains(a, 'table') AS INT)        AS has_table,
       CAST(coalesce(list_position(a, 'scan'), 0) AS INT) AS scan_pos,
       a[-1]                                         AS last_tok,
       array_to_string(list_reverse(a), ' ')         AS reversed_join
FROM w
"""


# ---------------------------------------------------------------------------
# first/last/nth_value window frame coverage
# ---------------------------------------------------------------------------


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over a full-partition frame — the explicit
    UNBOUNDED FOLLOWING bound matters: the default frame ends at CURRENT
    ROW, which silently turns last_value into the current row's value."""
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.first_value("o_orderkey").over(w).alias("first_key"),
        F.last_value("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT o_orderkey, o_orderpriority,
       first_value(o_orderkey) OVER w  AS first_key,
       last_value(o_orderkey) OVER w   AS last_key,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WHERE o_orderkey < 500
WINDOW w AS (
  PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


# ---------------------------------------------------------------------------
# Bitwise scalar coverage
# ---------------------------------------------------------------------------


def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_255"),
        k.bitwiseOR(F.lit(4096)).alias("or_4096"),
        k.bitwiseXOR(F.lit(1234)).alias("xor_1234"),
        F.bit_count(k).cast("int").alias("popcount"),
        F.shiftleft(k, 3).alias("shl_3"),
        F.shiftright(k, 2).alias("shr_2"),
    )


SCALAR_BITWISE_SQL = """
SELECT o_orderkey,
       o_orderkey & 255                  AS and_255,
       o_orderkey | 4096                 AS or_4096,
       xor(o_orderkey, 1234)             AS xor_1234,
       CAST(bit_count(o_orderkey) AS INT) AS popcount,
       o_orderkey << 3                   AS shl_3,
       o_orderkey >> 2                   AS shr_2
FROM orders WHERE o_orderkey < 200
"""


# ---------------------------------------------------------------------------
# Regex scalar coverage
# ---------------------------------------------------------------------------


def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple patterns only — Spark compiles Java regex, DuckDB RE2; the
    subset here (char classes, groups, anchors) behaves identically.
    DuckDB's regexp_replace needs the 'g' flag to match Spark's
    replace-all default."""
    part = T(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("gear|bolt").cast("int").alias("is_hardware"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_tail"),
    )


SCALAR_REGEX_SQL = """
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+)', 1)          AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g')     AS devoweled,
       CAST(regexp_matches(p_name, 'gear|bolt') AS INT) AS is_hardware,
       regexp_extract(p_type, '([A-Z]+)$', 1)          AS type_tail
FROM part
"""


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (top-N per key without a window)
# ---------------------------------------------------------------------------


def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via LATERAL — the correlated-subquery
    formulation of top-N-per-group.  Catalyst rewrites it to the same
    shuffle+rank the window form plans, so this is API coverage, not a
    new physical strategy; customers without orders drop (inner lateral
    semantics in both engines)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        WHERE c.c_custkey < 50
        """
    )


JOIN_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) o
WHERE c.c_custkey < 50
"""


# ---------------------------------------------------------------------------
# min_by / max_by aggregates with deterministic composite tie-breaks
# ---------------------------------------------------------------------------


def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/max per segment: ONE partial-aggregable struct per group
    (the 1e9-group-safe alternative to a rank window); ties resolved
    inside the ordering struct — max side tie -> LOWEST custkey via
    negation (numeric keys), min side naturally ascending."""
    cust = T(spark, sf_dir, "customer")
    # NULL balances coalesce toward "never wins" on BOTH extremes: Spark
    # struct ordering is NULLS FIRST while the oracle's ORDER BY defaults
    # to NULLS LAST, so an uncoalesced NULL would win min_by here but lose
    # the oracle's rn_min — a latent cross-engine divergence even though
    # the current fixtures carry no NULLs.
    bal_min = F.coalesce(F.col("c_acctbal"), F.lit(float("inf")))
    bal_max = F.coalesce(F.col("c_acctbal"), F.lit(float("-inf")))
    return cust.groupBy("c_mktsegment").agg(
        F.max_by(
            "c_custkey", F.struct(bal_max.alias("b"), (-F.col("c_custkey")).alias("nk"))
        ).alias("top_custkey"),
        F.max("c_acctbal").alias("top_acctbal"),
        F.min_by(
            "c_custkey", F.struct(bal_min.alias("b"), F.col("c_custkey"))
        ).alias("bottom_custkey"),
    )


AGG_MINMAX_BY_SQL = """
WITH ranked AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn_max,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal ASC, c_custkey)  AS rn_min
  FROM customer
)
SELECT c_mktsegment,
       max(CASE WHEN rn_max = 1 THEN c_custkey END) AS top_custkey,
       max(c_acctbal)                               AS top_acctbal,
       max(CASE WHEN rn_min = 1 THEN c_custkey END) AS bottom_custkey
FROM ranked GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Z-order clustering key (operators/zorder.py)
# ---------------------------------------------------------------------------


def zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleaved clustering key over (custkey, orderdate) — the
    multi-dimensional layout key OPTIMIZE...ZORDER computes, as pure
    integer shift/and/or Catalyst arithmetic (oracle runs the IDENTICAL
    generated expression, z_value_sql/bucketize_sql share the loop with
    the Spark builder).  Fixed bucketize bounds — not per-corpus min/max —
    so the key is stable across ingests at any scale factor; writing is
    zorder.zorder_write (range-partition + sort-within, file pruning
    gated in test_round4_ops.py::test_zorder_layout_prunes_both_dims)."""
    from flume_spark.operators import zorder

    orders = T(spark, sf_dir, "orders")
    xb = zorder.bucketize(F.col("o_custkey"), 0, 1_000_000, bits=16)
    yb = zorder.bucketize(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")),
        0,
        4000,  # 1992..~2002 — covers the synthetic 1995-2001 date range
        bits=16,
    )
    keyed = orders.select(
        "o_orderkey", xb.alias("xb"), yb.alias("yb")
    )
    return keyed.select(
        "o_orderkey",
        "xb",
        "yb",
        zorder.z_value(F.col("xb"), F.col("yb"), bits=16).alias("z_key"),
    )


def _zorder_sql() -> str:
    from flume_spark.operators import zorder

    xb = zorder.bucketize_sql("o_custkey", 0, 1_000_000, bits=16)
    yb = zorder.bucketize_sql(
        "date_diff('day', DATE '1992-01-01', o_orderdate)", 0, 4000, bits=16
    )
    return f"""
WITH b AS (
  SELECT o_orderkey, {xb} AS xb, {yb} AS yb FROM orders
)
SELECT o_orderkey, xb, yb, {zorder.z_value_sql("xb", "yb", bits=16)} AS z_key
FROM b
"""


ZORDER_ORDERS_SQL = _zorder_sql()


# ---------------------------------------------------------------------------
# Conditional aggregates (count_if / bool_and / bool_or / sum-CASE)
# ---------------------------------------------------------------------------


def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conditional-aggregate family per order priority: count_if,
    boolean every/any, and the sum-CASE idiom — exact integer cents for
    the conditional sum so no float accumulation crosses engines."""
    orders = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 150000).alias("n_large"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", cents).otherwise(F.lit(0)))
        .alias("open_cents"),
    )


AGG_CONDITIONAL_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(*) FILTER (WHERE o_totalprice > 150000) AS n_large,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderstatus = 'F')  AS any_finished,
       CAST(sum(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(round(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS open_cents
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Date-spine gap filling (generated calendar LEFT JOIN facts)
# ---------------------------------------------------------------------------


def date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reporting gap-fill: a generated 90-day calendar LEFT JOINed to
    daily order revenue, missing days filled with zero — the shape every
    time-series dashboard needs (a groupBy alone silently drops empty
    days).  The spine is a literal sequence (no aggregate-derived bounds,
    so the plan is static and the broadcast side is 90 rows); revenue in
    exact integer cents."""
    orders = T(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
            )
        ).alias("day")
    )
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") <= F.lit("1995-03-31").cast("date"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            # string, not DATE: pandas maps DuckDB DATE to datetime64 but
            # Spark DATE to datetime.date, so the value-canon forms differ
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("cents", F.lit(0)) / 100.0, 2).alias("revenue"),
        )
    )


DATE_SPINE_SQL = """
WITH spine AS (
  SELECT CAST(gs AS DATE) AS day
  FROM generate_series(DATE '1995-01-01', DATE '1995-03-31',
                       INTERVAL 1 DAY) AS t(gs)
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate <= DATE '1995-03-31'
  GROUP BY 1
)
SELECT strftime(spine.day, '%Y-%m-%d') AS day,
       coalesce(n_orders, 0) AS n_orders,
       round(coalesce(cents, 0) / 100.0, 2) AS revenue
FROM spine LEFT JOIN daily ON spine.day = daily.day
"""


# ---------------------------------------------------------------------------
# Blocked fuzzy matching (Levenshtein under a blocking key)
# ---------------------------------------------------------------------------


def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names by edit distance — with the BLOCKING
    pattern that makes fuzzy joins survive scale: candidates must share a
    prefix block (first 6 chars), so the self-join is an equi-join on the
    block key (shuffle = Σ block²) instead of the all-pairs cartesian a
    bare levenshtein predicate would plan.  Levenshtein is exact integer
    — engine-identical.  The trade is recall at the block boundary
    (edits inside the first 6 chars escape the block), the same
    candidate-generation-vs-recall deal as LSH banding.  Scoped to a
    partkey slice: the synthetic names are formulaic enough that the
    full corpus yields 30k+ pairs — correct but a bulky value-hash."""
    part = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 400)
        .select("p_partkey", "p_name")
    )
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.substring("p_name", 1, 6).alias("blk"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.substring("p_name", 1, 6).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("key_a", "key_b", "edit_dist")
    )


FUZZY_PART_SQL = """
WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 400)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM p a JOIN p b
  ON substring(a.p_name, 1, 6) = substring(b.p_name, 1, 6)
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


# ---------------------------------------------------------------------------
# Declarative data-quality checks (operators/quality.py)
# ---------------------------------------------------------------------------


def table_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt-style constraint pass over orders: not-null / unique /
    accepted-values / range / custom-expr rules, all row-level rules in
    ONE fused aggregate scan, violation counts as exact integers."""
    from flume_spark.operators.quality import Rule, check_rules

    orders = T(spark, sf_dir, "orders")
    rules = [
        Rule("orderkey_not_null", "not_null", "o_orderkey"),
        Rule("orderkey_unique", "unique", "o_orderkey"),
        Rule("status_accepted", "accepted_values", "o_orderstatus",
             values=("O", "F", "P")),
        Rule("totalprice_range", "in_range", "o_totalprice", lo=0.0,
             hi=1_000_000.0),
        Rule("date_not_future", "expr",
             expr="o_orderdate > timestamp'2002-01-01 00:00:00'"),
    ]
    return check_rules(orders, rules)


TABLE_CHECKS_SQL = """
SELECT 'orderkey_not_null' AS rule,
       CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_violations FROM orders
UNION ALL
SELECT 'status_accepted',
       CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                       OR o_orderstatus IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'totalprice_range',
       CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                       OR o_totalprice > 1000000 THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'date_not_future',
       CAST(coalesce(sum(CASE WHEN o_orderdate > TIMESTAMP '2002-01-01 00:00:00'
                     THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderkey_unique',
       CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
FROM orders
"""


def stream_contract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING data contract exercised deterministically end to end
    (operators/quality.py `streaming_checks`): orders replayed as four
    micro-batches (o_orderkey mod 4 — deterministic, engine-agnostic)
    plus one EMPTY batch, each through the real foreachBatch handler —
    per-batch report partitions, idempotent ledger (batch 2 is replayed;
    the second delivery must be a no-op), and the empty batch must report
    0 violations per rule, never NULL (the round-4 coalesce fix).
    Result: (ingest_batch, rule, n_violations) — exact integers.

    The reports land in a per-call temp dir (the handler is a writer; a
    few KB of parquet per call).  The dir must outlive the RETURNED lazy
    frame, so it is not deleted here — an atexit hook reclaims every
    dir at process exit (bounded: calls-per-process x ~KB), and the OS
    tmp reaper covers abnormal exits."""
    import atexit
    import os
    import shutil
    import tempfile

    from flume_spark.operators.quality import Rule, streaming_checks

    orders = T(spark, sf_dir, "orders")
    rules = [
        Rule("orderkey_not_null", "not_null", "o_orderkey"),
        Rule("orderkey_unique", "unique", "o_orderkey"),
        Rule("priority_subset", "accepted_values", "o_orderpriority",
             values=("1-URGENT", "2-HIGH")),
        Rule("totalprice_capped", "in_range", "o_totalprice", lo=0.0,
             hi=100_000.0),
    ]
    tmp = tempfile.mkdtemp(prefix="flume_contract_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    handler = streaming_checks(
        spark, os.path.join(tmp, "reports"), os.path.join(tmp, "ledger"), rules
    )
    for b in range(4):
        handler(orders.filter(F.col("o_orderkey") % 4 == b), b)
    handler(orders.filter(F.col("o_orderkey") % 4 == 2), 2)  # replay: no-op
    handler(orders.filter(F.col("o_orderkey") < 0), 4)       # empty batch
    return spark.read.parquet(os.path.join(tmp, "reports")).select(
        F.col("ingest_batch").cast("int").alias("ingest_batch"),
        "rule",
        "n_violations",
    )


STREAM_CONTRACT_SQL = """
WITH b AS (
  SELECT CAST(o_orderkey % 4 AS INT) AS ingest_batch, o_orderkey,
         o_orderpriority, o_totalprice
  FROM orders
),
spine AS (SELECT CAST(ingest_batch AS INT) AS ingest_batch
          FROM range(0, 5) t(ingest_batch)),
agg AS (
  SELECT ingest_batch,
         CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS v_notnull,
         CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
           AS v_unique,
         CAST(coalesce(sum(CASE WHEN o_orderpriority NOT IN
                                     ('1-URGENT', '2-HIGH')
                                  OR o_orderpriority IS NULL
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_accept,
         CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                                  OR o_totalprice > 100000
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_range
  FROM b GROUP BY 1
)
SELECT s.ingest_batch, r.rule,
       coalesce(CASE r.rule
                  WHEN 'orderkey_not_null' THEN a.v_notnull
                  WHEN 'orderkey_unique'   THEN a.v_unique
                  WHEN 'priority_subset'   THEN a.v_accept
                  WHEN 'totalprice_capped' THEN a.v_range
                END, 0) AS n_violations
FROM spine s
CROSS JOIN (VALUES ('orderkey_not_null'), ('orderkey_unique'),
                   ('priority_subset'), ('totalprice_capped')) r(rule)
LEFT JOIN agg a ON a.ingest_batch = s.ingest_batch
"""


# ---------------------------------------------------------------------------
# Windowed-channel family (round 5): windows composed OVER grouping-set
# frames — the TPC-DS Q67 composition (rank-within-rollup-level) and a
# share-of-level window aggregate over GROUPING SETS.  No current query
# composed these two Catalyst paths (Expand -> Aggregate -> Window).
# ---------------------------------------------------------------------------


def rollup_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape over orders: revenue rolled up through the
    (status, priority, month) hierarchy, then row_number() PARTITIONED BY
    GROUPING LEVEL picks each level's top 5 — a window whose input is the
    rollup's Expand+Aggregate output, not a base table.

    Scale shape: the rollup is ONE Expand + one partial-agg shuffle (4
    grouping levels fused — never 4 scans); the window partitions by
    `lvl` (4 partitions of at most |status x priority x month| rows —
    aggregate-sized, not corpus-sized).  Exact integer cents; the rank's
    order is fully tie-broken (sum desc, then keys NULLS FIRST on both
    engines) so row_number is engine-identical."""
    orders = T(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderstatus",
        "o_orderpriority",
        F.month("o_orderdate").alias("mon"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rolled = base.rollup("o_orderstatus", "o_orderpriority", "mon").agg(
        F.sum("cents").alias("sum_cents"),
        F.grouping_id().cast("int").alias("lvl"),
    )
    w = Window.partitionBy("lvl").orderBy(
        F.col("sum_cents").desc(),
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
        F.col("mon").asc_nulls_first(),
    )
    return rolled.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 5
    )


ROLLUP_TOPK_SQL = """
WITH base AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(month(o_orderdate) AS INT) AS mon,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
rolled AS (
  SELECT o_orderstatus, o_orderpriority, mon,
         CAST(sum(cents) AS BIGINT) AS sum_cents,
         CAST(GROUPING(o_orderstatus, o_orderpriority, mon) AS INT) AS lvl
  FROM base GROUP BY ROLLUP(o_orderstatus, o_orderpriority, mon)
)
SELECT o_orderstatus, o_orderpriority, mon, sum_cents, lvl,
       CAST(row_number() OVER (
              PARTITION BY lvl
              ORDER BY sum_cents DESC, o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST, mon ASC NULLS FIRST
            ) AS INT) AS rnk
FROM rolled
QUALIFY rnk <= 5
"""


def channel_share_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-level window aggregate over GROUPING SETS: events summed
    at four channel granularities — (type, weekday), (type), (weekday),
    grand total — in ONE Expand+Aggregate, then each cell's share of its
    LEVEL's total via an unbounded window sum partitioned by grouping
    level.  Exact integer micro-units; share is a single division of two
    exact bigints (IEEE-identical cross-engine, no rounding — the repo
    float policy).  Spark dayofweek is 1=Sunday; the oracle shifts
    DuckDB's 0=Sunday by one."""
    ev = T(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = ev.select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    g = base.groupingSets(
        [["event_type", "dow"], ["event_type"], ["dow"], []],
        "event_type",
        "dow",
    ).agg(
        F.sum("v4").alias("sum_v4"),
        F.grouping_id().cast("int").alias("lvl"),
    )
    w = Window.partitionBy("lvl")
    return g.select(
        "event_type",
        "dow",
        "lvl",
        "sum_v4",
        (F.col("sum_v4") / F.sum("sum_v4").over(w).cast("double")).alias("share"),
    )


CHANNEL_SHARE_SQL = """
WITH base AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow,
         CAST(round(value * 10000) AS BIGINT) AS v4
  FROM events WHERE ts IS NOT NULL
),
g AS (
  SELECT event_type, dow, CAST(sum(v4) AS BIGINT) AS sum_v4,
         CAST(GROUPING(event_type, dow) AS INT) AS lvl
  FROM base
  GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow), ())
)
SELECT event_type, dow, lvl, sum_v4,
       sum_v4 / CAST(sum(sum_v4) OVER (PARTITION BY lvl) AS DOUBLE) AS share
FROM g
"""


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the one
    §2.3 join predicate no other query exercises: NULL keys MATCH each
    other instead of dropping out.  Keys derived deterministically
    (NULLIF(user_id % 10, 7): one residue class becomes NULL), each side
    a per-key channel aggregate, so the null bucket carries real rows and
    a plain equi-join would silently lose it.  EqualNullSafe keys remain
    hash-partitionable, so Catalyst still plans a hash join — no
    nested-loop fallback (the reason engines bother with the operator)."""
    ev = T(spark, sf_dir, "events")
    key = F.nullif((F.col("user_id") % 10).cast("int"), F.lit(7))

    def chan(t: str, alias: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .select(key.alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    a = chan("click", "clicks")
    b = chan("view", "views")
    return a.join(b, a["key"].eqNullSafe(b["key"]), "inner").select(
        a["key"].alias("key"), "clicks", "views"
    )


JOIN_NULL_SAFE_SQL = """
WITH a AS (
  SELECT NULLIF(CAST(user_id % 10 AS INT), 7) AS key, count(*) AS clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
b AS (
  SELECT NULLIF(CAST(user_id % 10 AS INT), 7) AS key, count(*) AS views
  FROM events WHERE event_type = 'view' GROUP BY 1
)
SELECT a.key, clicks, views
FROM a JOIN b ON a.key IS NOT DISTINCT FROM b.key
"""


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-release diff: simulate release A (every 10th order not yet
    crawled; every 7th order's totalprice off by exactly +1.0 — an exact
    IEEE increment, no rounding, so both engines see bit-identical
    doubles) vs release B (the table as shipped), then audit what the
    merge would do via sources.merge.snapshot_diff.  One full-outer SMJ on
    the key; with both releases bucketed on o_orderkey the exchanges
    vanish.  Summarized per status with the exact key sum so one
    misclassified row flips the hash."""
    from flume_spark.sources.merge import snapshot_diff

    orders = T(spark, sf_dir, "orders")
    release_a = orders.filter(F.col("o_orderkey") % 10 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(
        release_a, orders, "o_orderkey", ["o_totalprice", "o_orderstatus"]
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
    )


SNAPSHOT_DIFF_SQL = """
WITH a AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS price,
         o_orderstatus AS st
  FROM orders WHERE o_orderkey % 10 <> 0
),
b AS (
  SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st
  FROM orders
),
d AS (
  SELECT coalesce(a.k, b.k) AS k,
         CASE WHEN a.k IS NULL THEN 'added'
              WHEN b.k IS NULL THEN 'removed'
              WHEN (a.price IS DISTINCT FROM b.price)
                OR (a.st IS DISTINCT FROM b.st) THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b ON a.k = b.k
)
SELECT status, count(*) AS n_rows, CAST(sum(k) AS BIGINT) AS key_sum
FROM d GROUP BY status
"""


def stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass column profile of orders
    (operators/quality.py::profile_table): row count, exact NDV + null
    count per key/categorical column, native-typed min/max for the
    measure and date columns — the table statistics a CBO and a corpus
    drift monitor both consume.  One scan, one fused Aggregate (the NDVs
    share a single Expand); at 100 TB the approx_distinct sibling is the
    same plan minus the Expand."""
    from flume_spark.operators.quality import profile_table

    orders = T(spark, sf_dir, "orders")
    return profile_table(
        orders,
        ndv_cols=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
        min_max_cols=["o_totalprice", "o_orderdate"],
    )


STATS_PROFILE_SQL = """
SELECT count(*) AS n_rows,
       count(DISTINCT o_orderkey) AS ndv_o_orderkey,
       CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS nulls_o_orderkey,
       count(DISTINCT o_custkey) AS ndv_o_custkey,
       CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS nulls_o_custkey,
       count(DISTINCT o_orderstatus) AS ndv_o_orderstatus,
       CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS nulls_o_orderstatus,
       count(DISTINCT o_orderpriority) AS ndv_o_orderpriority,
       CAST(coalesce(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS nulls_o_orderpriority,
       min(o_totalprice) AS min_o_totalprice,
       max(o_totalprice) AS max_o_totalprice,
       min(o_orderdate) AS min_o_orderdate,
       max(o_orderdate) AS max_o_orderdate
FROM orders
"""


QUERIES = {
    "join_null_safe": join_null_safe,
    "snapshot_diff_orders": snapshot_diff_orders,
    "q11_important_stock": q11_important_stock,
    "stream_contract_orders": stream_contract_orders,
    "rollup_topk_window": rollup_topk_window,
    "channel_share_gsets": channel_share_gsets,
    "zorder_orders": zorder_orders,
    "agg_conditional": agg_conditional,
    "date_spine_fill": date_spine_fill,
    "fuzzy_part_names": fuzzy_part_names,
    "table_checks_orders": table_checks_orders,
    "join_lateral": join_lateral,
    "agg_minmax_by": agg_minmax_by,
    "window_first_last": window_first_last,
    "scalar_bitwise_funcs": scalar_bitwise_funcs,
    "scalar_regex_funcs": scalar_regex_funcs,
    "window_ntile_dist": window_ntile_dist,
    "scalar_array_funcs": scalar_array_funcs,
    "stats_profile": stats_profile,
}

ORACLES = {
    "join_null_safe": JOIN_NULL_SAFE_SQL,
    "snapshot_diff_orders": SNAPSHOT_DIFF_SQL,
    "q11_important_stock": Q11_SQL,
    "stream_contract_orders": STREAM_CONTRACT_SQL,
    "rollup_topk_window": ROLLUP_TOPK_SQL,
    "channel_share_gsets": CHANNEL_SHARE_SQL,
    "zorder_orders": ZORDER_ORDERS_SQL,
    "agg_conditional": AGG_CONDITIONAL_SQL,
    "date_spine_fill": DATE_SPINE_SQL,
    "fuzzy_part_names": FUZZY_PART_SQL,
    "table_checks_orders": TABLE_CHECKS_SQL,
    "join_lateral": JOIN_LATERAL_SQL,
    "agg_minmax_by": AGG_MINMAX_BY_SQL,
    "window_first_last": WINDOW_FIRST_LAST_SQL,
    "scalar_bitwise_funcs": SCALAR_BITWISE_SQL,
    "scalar_regex_funcs": SCALAR_REGEX_SQL,
    "window_ntile_dist": WINDOW_NTILE_SQL,
    "scalar_array_funcs": SCALAR_ARRAY_SQL,
    "stats_profile": STATS_PROFILE_SQL,
}
