"""Relational operator pack.

Fills SURVEY.md §2.2's ABSENT rows — joins (inner/semi/anti/range), hash
aggregation, distinct, rollup/cube/grouping-sets, window functions, set
operations, global sort/limit/top-k, and the scalar function packs — as
idiomatic DataFrame programs over the TPC-H-ish testdata tables.

Scale notes baked into each query:
* Dimension tables (region/nation/supplier/customer at log-scale) are
  broadcast (`F.broadcast`) so fact-side scans never shuffle for the join.
* Aggregations are expressed as groupBy().agg() -> Catalyst plans partial
  (map-side) aggregation automatically; no collect()-side loops anywhere.
* Top-k = orderBy(total order).limit(k): Spark executes TakeOrderedAndProject,
  which is O(k) memory per partition and never materializes a global sort.
* AQE (session default) coalesces shuffle partitions and handles skew joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import davg, dsum, sql_davg, sql_dsum
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filtered scan + hash aggregate with 8 aggregates.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_orders_by_priority",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority, o_orderstatus
    """,
    doc="Filtered multi-key hash aggregate with min/max (exact on doubles).",
)
def q02_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join (broadcast customer dim) + agg + top-10.",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_region_volume",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join, all dims broadcast, local-supplier condition.",
)
def q05_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"))
    )


@register(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    doc="Left-semi join: customers having at least one large order.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join: customers with no orders at all.",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_acctbal")


@register(
    "q_range_join",
    oracle="""
    SELECT o.o_orderkey, COUNT(e.event_id) AS n_events
    FROM orders o
    LEFT JOIN events e
      ON e.value >= o.o_totalprice / 10000.0
     AND e.value <  o.o_totalprice / 10000.0 + 5.0
    WHERE o.o_orderkey <= 100
    GROUP BY o.o_orderkey
    """,
    doc="Non-equi (range) join: broadcast the small side, band-predicate match.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    e = _t(spark, sf_dir, "events")
    lo = o.o_totalprice / 10000.0
    cond = (e.value >= lo) & (e.value < lo + 5.0)
    return (
        F.broadcast(o)
        .join(e, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "q_window_topn_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
    FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INTEGER) AS rn
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    ) WHERE rn <= 3
    """,
    doc="Window top-N per group: each customer's 3 priciest orders.",
)
def q_window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )


@register(
    "q_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           (CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 100.0) AS running_spend
    FROM orders
    """,
    doc="Running total per customer over time (exact decimal accumulation).",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from ..functions.numeric import cents

    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / F.lit(100.0)).alias(
            "running_spend"
        ),
    )


@register(
    "q_window_lag_events",
    oracle="""
    SELECT user_id, event_id, ts,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id
    FROM events
    """,
    doc="Sessionization primitive: previous event per user via LAG.",
)
def q_window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", "ts", F.lag("event_id").over(w).alias("prev_event_id")
    )


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets / distinct
# ---------------------------------------------------------------------------


@register(
    "q_rollup_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (flag, flag+status, grand total).",
)
def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", "sum_qty")
    )


@register(
    "q_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over status x priority.",
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@register(
    "q_grouping_sets",
    oracle="""
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (strftime(ts, '%Y-%m-%d')))
    """,
    doc="Explicit GROUPING SETS: by type and by day, in one pass.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS day, COUNT(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (date_format(ts, 'yyyy-MM-dd')))
        """
    )


@register(
    "q_distinct_agg",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
    doc="COUNT(DISTINCT) aggregation (expand-based distinct aggregates).",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count_distinct("c_nationkey").alias("n_nations"),
        F.count_distinct("c_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "q_set_ops",
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     UNION
     SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="UNION (distinct) then EXCEPT, mixed sources.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.where(F.col("c_acctbal") > 8000).select("c_custkey")
    finished = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.union(rich).distinct().exceptAll(finished.distinct())


@register(
    "q_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
    """,
    doc="INTERSECT distinct of two key sets.",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    b = o.where(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "q_top_orders",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="Global top-k: TakeOrderedAndProject, no full sort at scale.",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"), "o_orderdate"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Scalar function packs
# ---------------------------------------------------------------------------


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           REPLACE(p_type, ' ', '_') AS type_snake
    FROM part
    WHERE p_name LIKE '%a%' AND p_size BETWEEN 5 AND 40
    """,
    doc="String scalar pack: upper/lower/length/substr/concat/replace + LIKE.",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.where(F.col("p_name").like("%a%") & F.col("p_size").between(5, 40)).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
    doc="Datetime scalar pack: year/month extract, trunc, day arithmetic.",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    ).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (CAST(round(l_extendedprice * l_discount * 100) AS BIGINT) / 100.0) AS disc_amount,
           ABS(l_quantity - 25.0) AS qty_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           l_orderkey % 7 AS key_mod,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_band
    FROM lineitem
    WHERE l_linenumber <= 3
    """,
    doc="Math scalar pack: round/abs/ceil/floor/modulo/case-when.",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.where(F.col("l_linenumber") <= 3).select(
        "l_orderkey",
        "l_linenumber",
        # round-to-2dp via integral rounding: ROUND(x,2) rounds .xx5 boundary
        # cases differently across engines; round-to-integer does not.
        (F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("bigint") / F.lit(100.0)).alias("disc_amount"),
        F.abs(q - 25.0).alias("qty_dev"),
        F.ceil(q).alias("qty_ceil"),
        F.floor(q).alias("qty_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.when(q < 10, "low").when(q < 30, "mid").otherwise("high").alias("qty_band"),
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (
      SELECT (CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0)
             / COUNT(o_totalprice)
      FROM orders
    )
    """,
    doc="Scalar subquery: orders above 1.5x the (exact) average price.",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # Single-plan scalar subquery: the 1-row aggregate is broadcast and
    # cross-joined, so the whole query is ONE job with no driver round-trip
    # (a driver-side collect()-then-inline would serialize the pipeline at
    # scale). Catalyst plans the broadcast side first via BroadcastExchange.
    avg_df = o.agg(davg("o_totalprice", "_avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .where(F.col("o_totalprice") > 1.5 * F.col("_avg_price"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )


@register(
    "q_union_all",
    oracle="""
    SELECT 'order' AS kind, o_orderkey AS key, o_orderdate AS ts_col FROM orders WHERE o_orderkey <= 500
    UNION ALL
    SELECT 'line' AS kind, l_orderkey AS key, l_shipdate AS ts_col FROM lineitem WHERE l_orderkey <= 500
    """,
    doc="UNION ALL (bag semantics) of heterogeneous sources, tagged.",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    a = o.select(
        F.lit("order").alias("kind"),
        F.col("o_orderkey").alias("key"),
        F.col("o_orderdate").alias("ts_col"),
    )
    b = li.select(
        F.lit("line").alias("kind"),
        F.col("l_orderkey").alias("key"),
        F.col("l_shipdate").alias("ts_col"),
    )
    return a.unionByName(b)


@register(
    "q_approx_sketches",
    oracle=None,  # approximate results are engine-specific -> rows-only check
    doc="Approximate sketches: HLL++ distinct count + approximate percentiles.",
)
def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
            "price_quantiles"
        ),
    )


# ---------------------------------------------------------------------------
# Events: time-series / JSON
# ---------------------------------------------------------------------------


@register(
    "q_events_daily",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {sql_dsum('value')} AS total_value
    FROM events GROUP BY strftime(ts, '%Y-%m-%d'), event_type
    """,
    doc="Daily per-type rollup — the canonical log-analytics query shape.",
)
def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            dsum("value", "total_value"),
        )
    )


@register(
    "q_events_hourly_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events GROUP BY date_trunc('hour', ts)
    """,
    doc="Tumbling 1-hour window aggregate (F.window -> window.start).",
)
def q_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("hour_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_events_json",
    oracle="""
    SELECT event_type,
           CAST(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events GROUP BY event_type
    """,
    doc="JSON field extraction from the props column + aggregate.",
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    # avg over ints is exact in both engines (sum is integral, division IEEE)
    return e.groupBy("event_type").agg(
        F.avg(k).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_events_sessionize",
    oracle=f"""
    WITH flags AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="Session windows (30-min gap) per user — batch twin of streaming/events.sessionized.",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Array functions (on embeddings)
# ---------------------------------------------------------------------------


@register(
    "q_array_funcs",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS FLOAT) AS first_component
    FROM embeddings
    WHERE vec_id < 100
    """,
    doc="Array scalar pack: size and element access on the vector column.",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    return em.where(F.col("vec_id") < 100).select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
    )


@register(
    "q06_revenue_delta",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape: tight multi-predicate scan feeding a single "
        "aggregate — the canonical predicate-pushdown/codegen showcase."
    ),
)
def q06_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q_gap_fill_hourly",
    oracle="""
    WITH b AS (
        SELECT event_type,
               date_trunc('hour', MIN(ts)) AS h0,
               date_trunc('hour', MAX(ts)) AS h1
        FROM events GROUP BY event_type
    ),
    hours AS (
        SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM b
    ),
    c AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT h.event_type,
           strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM hours h LEFT JOIN c ON h.event_type = c.event_type AND h.hour = c.hour
    """,
    doc=(
        "Time-series gap fill: per-type dense hourly grid built with "
        "sequence()+explode, zero-filled via left join — the grid side is "
        "per-group bounds only (tiny, broadcast), so the one shuffle is the "
        "counts aggregate."
    ),
)
def q_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("hour", F.date_trunc("hour", "ts"))
    # The hourly aggregate is cached: both the spine (per-type min/max hour)
    # and the probe side read it, and column pruning rewrites the aggregate
    # differently per branch, so ReuseExchange's canonical-plan match fails
    # and each branch would re-scan raw events. The cache holds
    # |types x hours| rows — bounded by the time span, not event volume.
    counts = ev.groupBy("event_type", "hour").agg(F.count("*").alias("n")).cache()
    hours = (
        counts.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
        )
    )
    # no broadcast hint: the build side of a LEFT join must be the right
    # side (Spark ignores a left-side broadcast hint with a warning), and
    # both inputs here are same-cardinality tiny aggregates anyway.
    return hours.join(counts, ["event_type", "hour"], "left").select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


@register(
    "q_unpivot_lineitem",
    oracle=f"""
    WITH u AS (
        SELECT l_returnflag, 'l_extendedprice' AS measure, l_extendedprice AS value FROM lineitem
        UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    SELECT l_returnflag, measure,
           {sql_dsum('value')} AS total,
           COUNT(*) AS n
    FROM u GROUP BY l_returnflag, measure
    """,
    doc=(
        "Unpivot/melt (inverse of q_pivot_events): wide money columns to "
        "long (measure, value) rows, then re-aggregate — unpivot is a "
        "narrow per-row expand, so the only shuffle is the final group-by."
    ),
)
def q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
            ["l_returnflag"],
            ["l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
        .groupBy("l_returnflag", "measure")
        .agg(dsum("value", "total"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# TPC-H round-out pack (Q4/Q10/Q14/Q18/Q19 shapes, adapted to the testdata
# schema: no l_commitdate/l_receiptdate/l_shipmode columns exist, so Q4's
# lateness predicate uses shipdate-vs-orderdate and Q12 is not expressible).
# ---------------------------------------------------------------------------


@register(
    "q04_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join "
        "(orders ⋉ late lineitems) then a tiny hash aggregate. The semi join "
        "shuffles both sides on orderkey once; no row duplication ever "
        "reaches the aggregate. Lateness = shipped >90 days after order "
        "date (the testdata has no commit/receipt dates)."
    ),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape: who returned the most revenue. lineitem filters "
        "to returnflag='R' before the orderkey join (pushdown), revenue is "
        "pre-aggregated by o_custkey BEFORE the customer join (the narrow "
        "custkey/revenue pairs — not fat joined rows — are what shuffles "
        "into the dimension join; c_custkey is a PK so the grouping is "
        "equivalent), nation is a broadcast dim, and the top-20 runs as "
        "TakeOrderedAndProject with c_custkey as the deterministic tiebreak."
    ),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev_by_cust = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(rev, "revenue"))
    )
    return (
        rev_by_cust.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
            / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-03-01 00:00:00'
    """,
    doc=(
        "TPC-H Q14 shape: promo share of revenue for one shipping window. "
        "part is broadcast (fits any executor at TPC-H scale ratios), so "
        "the filtered lineitem scan never shuffles; the global two-sum "
        "aggregate is a single partial+final reduction to one row. Both "
        "sums are exact cent-sums, so the final division is bit-stable."
    ),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * dsum(promo_rev) / dsum(rev)).alias("promo_revenue_pct"))
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING {sql_dsum('l_quantity')} > 200
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           big.total_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
    doc=(
        "TPC-H Q18 shape: large-volume orders (sum qty > 200) joined back "
        "to orders+customer. The HAVING aggregate runs first and shrinks "
        "the join input by ~100x, so the orderkey join is cheap; top-50 is "
        "TakeOrderedAndProject with o_orderkey tiebreak."
    ),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .where(F.col("total_qty") > 200)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
    )


@register(
    "q19_disjunctive_join",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    doc=(
        "TPC-H Q19 shape: equi-join with an OR-of-ANDs residual mixing "
        "both sides' columns. Catalyst keeps partkey as the equi key and "
        "evaluates the disjunction as a post-join filter; part stays "
        "broadcast so the disjunction never forces a shuffle plan."
    ),
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(dsum(rev, "revenue"))
    )


@register(
    "q_lateral_topk",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t ON TRUE
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc=(
        "Correlated LATERAL subquery (top-2 orders per customer) through "
        "the spark.sql surface. Catalyst decorrelates it into a broadcast "
        "join + per-key window rather than executing the subquery per row "
        "— asserted in tests/test_plans.py: no nested-loop/cartesian "
        "product appears, so the plan scales like the window top-n it is."
    ),
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "q07_nation_pair_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             strftime(l.l_shipdate, '%Y') AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7 shape: bilateral trade volume between two nations by "
        "year. supplier and both nation copies broadcast (so the nation "
        "filter prunes lineitem rows before any shuffle); the only wide "
        "joins are the two fact-fact equi-joins on orderkey/custkey, which "
        "AQE coalesces. The nation-pair disjunction is a residual on "
        "broadcast columns — zero extra exchanges."
    ),
)
def q07_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(dsum(vol, "revenue"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc=(
        "TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue. "
        "The revenue aggregate is computed once and reused for both the "
        "max scalar subquery (one-row broadcast) and the equality filter — "
        "exact cent-sums make the float equality deterministic across "
        "engines. Ties (multiple max suppliers) all surface, ordered by "
        "s_suppkey."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    # max-vs-self via a window over the AGGREGATED rows: a separate
    # rev.agg(max) subtree prunes columns differently, defeating Catalyst's
    # ReuseExchange (canonical plans differ) and re-scanning lineitem.
    # The window costs one exchange of (l_suppkey, total_revenue) pairs —
    # |suppliers| narrow rows — while the fact table is scanned ONCE.
    w = Window.partitionBy(F.lit(1))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.withColumn("mx", F.max("total_revenue").over(w))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q_recursive_date_spine",
    oracle="""
    WITH RECURSIVE days(d) AS (
      SELECT DATE '1996-01-01'
      UNION ALL
      SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '1996-02-29'
    )
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           COALESCE(o.n_orders, 0) AS n_orders
    FROM days LEFT JOIN (
      SELECT CAST(o_orderdate AS DATE) AS dd, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ) o ON days.d = o.dd
    """,
    doc=(
        "Recursive CTE (Spark 4 WITH RECURSIVE): a 60-day date spine "
        "unrolled by the UnionLoop operator, zero-filled against daily "
        "order counts. Recursion depth = spine length (bounded, driver-"
        "controlled), while the data-sized side stays a single aggregate; "
        "the spine is a few dozen rows and broadcasts into the left join. "
        "Unbounded-depth recursion over data-sized inputs belongs in the "
        "iterative-DataFrame pattern instead (operators/graph.py)."
    ),
)
def q_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
          SELECT DATE '1996-01-01'
          UNION ALL
          SELECT date_add(d, 1) FROM days WHERE d < DATE '1996-02-29'
        )
        SELECT date_format(days.d, 'yyyy-MM-dd') AS day,
               COALESCE(o.n_orders, 0) AS n_orders
        FROM days LEFT JOIN (
          SELECT to_date(o_orderdate) AS dd, COUNT(*) AS n_orders
          FROM orders GROUP BY 1
        ) o ON days.d = o.dd
        """
    )


@register(
    "q_set_ops_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
    doc=(
        "Multiset INTERSECT ALL (min-multiplicity semantics): physically a "
        "count-per-key aggregate on each side + a generate of "
        "min(count_l, count_r) copies — distinct from the distinct-set "
        "INTERSECT plan (left-semi). Duplicates are part of the contract, "
        "so the hash compare covers multiplicities."
    ),
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    b = li.where(F.col("l_linestatus") == "F").select("l_orderkey")
    return a.intersectAll(b)


@register(
    "q_right_join",
    oracle="""
    SELECT n.n_name,
           COALESCE(c.n_customers, 0) AS n_customers
    FROM (
      SELECT c_nationkey, COUNT(*) AS n_customers
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ) c RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc=(
        "RIGHT OUTER join preserving every nation (zero-filled counts for "
        "nations with no rich customers) — completes the join-flavor set. "
        "The preserved side of a right outer join cannot be the broadcast "
        "build (its unmatched rows must all surface), so the hint goes on "
        "the non-preserved aggregate side: BuildLeft broadcast, no shuffle."
    ),
)
def q_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )
    n = _t(spark, sf_dir, "nation")
    return (
        F.broadcast(c).join(n, F.col("c_nationkey") == F.col("n_nationkey"), "right")
        .select("n_name", F.coalesce("n_customers", F.lit(0)).alias("n_customers"))
    )


@register(
    "q_rollup_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc=(
        "ROLLUP with GROUPING() markers: the g_* columns disambiguate "
        "'NULL because subtotal' from 'NULL because the data was NULL' — "
        "required for correct downstream consumption of any rollup/cube at "
        "scale, where subtotal rows and genuinely-null groups coexist. "
        "Expansion happens after partial aggregation, as with plain rollup."
    ),
)
def q_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count("*").alias("n"),
    )


@register(
    "q_range_join_banded",
    oracle="""
    SELECT o.o_orderkey, COUNT(e.event_id) AS n_events
    FROM orders o
    LEFT JOIN events e
      ON e.value >= o.o_totalprice / 10000.0
     AND e.value <  o.o_totalprice / 10000.0 + 5.0
    WHERE o.o_orderkey <= 100
    GROUP BY o.o_orderkey
    """,
    doc=(
        "Banded range join — the scale path when NEITHER side broadcasts: "
        "quantize both sides to width-5 bands (an interval of width 5 spans "
        "at most 2 bands, so the interval side explodes x2), equi-join on "
        "the band index, exact residual filter. Same oracle as "
        "q_range_join proves identical semantics; the plan is a shuffled "
        "HASH join on the band key (AQE-splittable, partition-parallel) "
        "instead of a BroadcastNestedLoopJoin that requires one side to "
        "fit in memory and compares every row pair. Each event lands in "
        "exactly ONE band, so no dedup pass is needed after the residual."
    ),
)
def q_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    e = _t(spark, sf_dir, "events")
    lo = (F.col("o_totalprice") / 10000.0).alias("lo")
    bands = o.select("o_orderkey", lo).select(
        "o_orderkey",
        "lo",
        F.explode(
            F.array(F.floor(F.col("lo") / 5.0), F.floor(F.col("lo") / 5.0) + 1)
        ).alias("band"),
    )
    e2 = e.select("event_id", "value", F.floor(F.col("value") / 5.0).alias("band"))
    residual = (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("lo") + 5.0)
    return (
        bands.join(e2, (bands.band == e2.band) & residual, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events"))
    )


@register(
    "q_union_schema_drift",
    oracle="""
    SELECT o_orderkey AS key, o_orderpriority AS priority, NULL AS qty
    FROM orders WHERE o_orderkey <= 200
    UNION ALL BY NAME
    SELECT l_orderkey AS key, NULL AS priority, CAST(l_quantity AS DOUBLE) AS qty
    FROM lineitem WHERE l_orderkey <= 200
    """,
    doc=(
        "Schema-drift union: unionByName(allowMissingColumns=True) aligns "
        "relations whose column sets diverged (a later pipeline generation "
        "added/dropped fields) by NAME with NULL backfill — positional "
        "UNION would silently misalign. The narrow-union analog of the "
        "mergeSchema read audit; zero shuffle, pure scan-concat."
    ),
)
def q_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 200)
        .select(F.col("o_orderkey").alias("key"), F.col("o_orderpriority").alias("priority"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= 200)
        .select(
            F.col("l_orderkey").alias("key"),
            F.col("l_quantity").cast("double").alias("qty"),
        )
    )
    return o.unionByName(li, allowMissingColumns=True)


@register(
    "q_percent_of_total",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name, {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    SELECT n_name, revenue,
           round(revenue / SUM(revenue) OVER (), 8) AS share
    FROM rev
    """,
    doc=(
        "Share-of-total: per-nation revenue divided by the grand total via "
        "an unpartitioned window over the AGGREGATE rows (|nations| rows "
        "through one partition — trivially safe; over raw rows it would "
        "not be). One fact scan; the alternative agg-then-crossjoin-scalar "
        "plan scans the aggregate twice. Division order fixed and rounded "
        "to 8dp so both engines emit identical doubles."
    ),
)
def q_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    w = Window.partitionBy(F.lit(1))
    return rev.select(
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 8).alias("share"),
    )


@register(
    "q_pipe_syntax",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc=(
        "Spark 4 SQL pipe syntax (|> WHERE / |> AGGREGATE ... GROUP BY): "
        "the linear dataflow dialect parses to exactly the classic "
        "filter->aggregate plan (same Catalyst tree, same pushdown), so "
        "the plain-SQL oracle applies unchanged — pinned here so the "
        "engine's SQL surface provably includes the pipe dialect."
    ),
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |> AGGREGATE COUNT(*) AS n_items,
                     {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
           GROUP BY l_returnflag
        """
    )


@register(
    "q_except_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
    doc=(
        "Multiset EXCEPT ALL (multiplicity-subtraction semantics: a key "
        "appearing m times left and n times right survives max(m-n, 0) "
        "times) — the remaining set-op flavor after q_set_ops (distinct "
        "set) and q_set_ops_all (INTERSECT ALL). Physically a per-key "
        "count on each side + a generate of the count difference; "
        "duplicates are part of the hash-checked contract."
    ),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    b = li.where(F.col("l_linestatus") == "F").select("l_orderkey")
    return a.exceptAll(b)


@register(
    "q_count_distinct_two_phase",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Two-phase COUNT(DISTINCT) rewrite: dedupe (key, value) pairs "
        "first (map-side partial distinct collapses duplicates BEFORE the "
        "shuffle), then count per key. Spark plans direct multi-column "
        "count_distinct (q_distinct_agg) via Expand — multiplying every "
        "input row by the number of distinct aggregates before the "
        "exchange; with hot keys and high row-to-distinct ratios the "
        "explicit two-phase form shuffles |distinct pairs| per column "
        "instead of |rows| x |aggregates|. Same oracle as the direct "
        "form would use — the rewrite is semantics-preserving."
    ),
)
def q_count_distinct_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")

    def per_col(col: str, alias: str) -> DataFrame:
        return (
            li.select("l_returnflag", col)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count("*").alias(alias))
        )

    return per_col("l_partkey", "n_parts").join(
        per_col("l_suppkey", "n_suppliers"), "l_returnflag"
    )


@register(
    "q_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 25.0 THEN NULL
                ELSE l_extendedprice / (l_quantity - 25.0) END AS safe_ratio,
           CASE WHEN CAST(l_orderkey AS HUGEINT) * 9223372036854775
                     BETWEEN -9223372036854775808 AND 9223372036854775807
                THEN CAST(CAST(l_orderkey AS HUGEINT) * 9223372036854775 AS BIGINT)
                ELSE NULL END AS big_product
    FROM lineitem
    """,
    doc=(
        "ANSI-mode safe arithmetic: this engine runs Spark 4 with ANSI ON "
        "(errors, not silent wraparound), so the try_* family IS the "
        "null-on-failure escape hatch — try_divide maps divide-by-zero to "
        "NULL row-locally, try_multiply maps bigint overflow to NULL "
        "(the oracle reproduces overflow detection with HUGEINT range "
        "checks). Row-level, codegen, no shuffle; the pattern every "
        "ingest-adjacent computed column should use under ANSI."
    ),
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - F.lit(25.0)).alias(
            "safe_ratio"
        ),
        F.try_multiply(F.col("l_orderkey"), F.lit(9223372036854775)).alias(
            "big_product"
        ),
    )
