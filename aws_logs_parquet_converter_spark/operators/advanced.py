"""Advanced relational pack: as-of join, outer joins, subqueries, map
functions, pivot, exact percentiles, and window frames.

Fills the remaining SURVEY.md §2.2 gaps beyond the core relational pack
(`relational.py`): the reference has no joins at all
(`/root/reference/converters/s3-server-access-log/s3_server_access_logs.py`
contains zero `join` calls — SURVEY §2.2), so every operator here is a
Spark-first design, not a translation.

Scale notes:
* **As-of join** uses the union+window merge pattern, NOT a range join: a
  range join (`l.ts >= r.ts` band) explodes to O(|L|·|R|) per key before
  picking the winner, while union+sort+last_value(ignorenulls) is one shuffle
  on the key and an O(n log n) partition-local sort — the same plan shape
  at 100 TB, with AQE handling partition sizing. Hot keys can additionally be
  range-repartitioned on (key, time) since the window only needs
  unboundedPreceding..current.
* **NOT IN / EXISTS** are expressed in SQL so Catalyst plans null-aware anti
  joins and semi joins (broadcast when the subquery side is small).
* **Pivot** passes the explicit value list — without it Spark runs an extra
  distinct job over the pivot column before planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import cents, dsum, sql_dsum
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# As-of join (time-series point-in-time lookup)
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_value: str,
) -> DataFrame:
    """For each left row, the ``right_value`` of the latest right row with
    the same key and ``right_time <= left_time`` (inclusive); NULL if none.

    Union-merge implementation: tag both sides, sort each key partition by
    (time, side) with right rows first at equal timestamps, then propagate the
    last non-null right value forward. One shuffle, no row explosion.
    """
    lcols = left.columns
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(dict(right.dtypes)[right_value]).alias("__rv"),
        *[F.col(c) for c in lcols],
    )
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_value).alias("__rv"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l.unionByName(r)
        .withColumn(right_value, F.last("__rv", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select(*lcols, right_value)
    )


@register(
    "q_asof_join",
    oracle="""
    WITH o2 AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey
    FROM events e ASOF LEFT JOIN o2 o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="As-of join: each event matched to the user's latest order at or "
    "before the event time (union+window merge, not a range join).",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # one row per (key, time): ties broken toward the max orderkey, so the
    # as-of winner is deterministic in both engines
    o2 = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    return asof_join(
        ev, o2,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
        right_value="o_orderkey",
    )


# ---------------------------------------------------------------------------
# Outer joins
# ---------------------------------------------------------------------------


@register(
    "q_left_join_agg",
    oracle=f"""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE({sql_dsum('o.o_totalprice')}, 0.0) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    doc="Left outer join keeping customers with zero orders (count=0, spend=0).",
)
def q_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@register(
    "q_full_outer_join",
    oracle="""
    WITH ed AS (SELECT strftime(ts, '%Y-%m-%d') AS d, COUNT(*) AS n_events
                FROM events GROUP BY 1),
         od AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, COUNT(*) AS n_orders
                FROM orders GROUP BY 1)
    SELECT COALESCE(ed.d, od.d) AS d,
           COALESCE(ed.n_events, 0) AS n_events,
           COALESCE(od.n_orders, 0) AS n_orders
    FROM ed FULL OUTER JOIN od ON ed.d = od.d
    """,
    doc="Full outer join of daily event counts vs daily order counts.",
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ed = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("ed_d"))
        .agg(F.count("*").alias("n_events"))
    )
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("od_d"))
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        ed.join(od, ed.ed_d == od.od_d, "full_outer")
        .select(
            F.coalesce("ed_d", "od_d").alias("d"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Subqueries (null-aware anti join, correlated EXISTS)
# ---------------------------------------------------------------------------

_NOT_IN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 400000
)
"""

_EXISTS_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
"""


def _sql_query(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@register(
    "q_not_in_subquery",
    oracle=_NOT_IN_SQL,
    doc="NOT IN subquery — Catalyst plans a null-aware anti join "
    "(broadcast: the subquery side is an aggregated key set).",
)
def q_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_query(spark, sf_dir, _NOT_IN_SQL, ["customer", "orders"])


@register(
    "q_exists_correlated",
    oracle=_EXISTS_SQL,
    doc="Correlated EXISTS + NOT EXISTS — planned as left-semi then "
    "left-anti hash joins on the correlation key.",
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_query(spark, sf_dir, _EXISTS_SQL, ["customer", "orders"])


# ---------------------------------------------------------------------------
# Map functions
# ---------------------------------------------------------------------------


@register(
    "q_map_funcs",
    oracle="""
    SELECT user_id,
           COALESCE(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS clicks,
           COALESCE(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS views,
           COUNT(DISTINCT event_type) AS n_types,
           (COUNT(*) FILTER (WHERE event_type = 'error') > 0) AS has_error
    FROM events GROUP BY user_id
    """,
    doc="Map construction + lookup: per-user event_type->count map via "
    "map_from_entries, probed with try_element_at / map_contains_key. "
    "Deterministic because map lookups are order-insensitive.",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    return m.select(
        "user_id",
        F.coalesce(F.try_element_at("m", F.lit("click")), F.lit(0)).alias("clicks"),
        F.coalesce(F.try_element_at("m", F.lit("view")), F.lit(0)).alias("views"),
        F.size(F.map_keys("m")).cast("bigint").alias("n_types"),
        F.map_contains_key("m", F.lit("error")).alias("has_error"),
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "q_pivot_events",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           COALESCE(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS click,
           COALESCE(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS view,
           COALESCE(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchase,
           COALESCE(COUNT(*) FILTER (WHERE event_type = 'signup'), 0) AS signup,
           COALESCE(COUNT(*) FILTER (WHERE event_type = 'error'), 0) AS error
    FROM events GROUP BY 1
    """,
    doc="Pivot event_type to columns per day; explicit value list avoids "
    "Spark's extra distinct-values job.",
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# Exact percentiles
# ---------------------------------------------------------------------------


@register(
    "q_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
    "DuckDB quantile_cont; rounded to cents to absorb interpolation ULPs).",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 2).alias("p75"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


@register(
    "q_percentiles_scalable",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "Exact interpolated percentiles per group, SCALABLE rewrite of "
        "q_percentiles: rank rows with a per-group window, then select + "
        "interpolate the two rows straddling each target rank. Identical "
        "values to percentile()/quantile_cont, but the heavy operator is "
        "a window SORT, which spills to disk — Spark's exact percentile() "
        "aggregate instead buffers EVERY group value in an in-memory "
        "array (ObjectHashAggregate, collect_list memory class), which "
        "OOMs a task when one group holds billions of rows at 100 TB. "
        "Shuffle cost: one hash exchange on the group key (same as the "
        "aggregate) + a K-row count broadcast; only the 6 straddling rows "
        "per group survive the rank filter."
    ),
)
def q_percentiles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    counts = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("__n"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = o.withColumn("__rn", F.row_number().over(w)).join(
        F.broadcast(counts), "o_orderpriority"
    )
    qs = {"p25": 0.25, "p50": 0.50, "p75": 0.75}
    # 1-based fractional target rank: pos = 1 + (n-1)*q; keep the floor and
    # ceil rows, interpolate between their values by the fractional part
    pos = {k: F.lit(1.0) + (F.col("__n") - 1) * F.lit(q) for k, q in qs.items()}
    keep = None
    for k in qs:
        hit = (F.col("__rn") == F.floor(pos[k])) | (F.col("__rn") == F.ceil(pos[k]))
        keep = hit if keep is None else (keep | hit)
    picked = ranked.where(keep)

    def interp(k: str):
        p = pos[k]
        v_lo = F.max(F.when(F.col("__rn") == F.floor(p), F.col("o_totalprice")))
        v_hi = F.max(F.when(F.col("__rn") == F.ceil(p), F.col("o_totalprice")))
        frac = F.first(p - F.floor(p))
        return F.round(v_lo + frac * (v_hi - v_lo), 2).alias(k)

    return picked.groupBy("o_orderpriority").agg(
        interp("p25"),
        interp("p50"),
        interp("p75"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )


# ---------------------------------------------------------------------------
# Window frames: ntile, first_value, sliding frame
# ---------------------------------------------------------------------------


@register(
    "q_window_frames",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           (CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                 OVER (PARTITION BY o_orderpriority
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
            / 100.0) AS mov_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Window frame pack: ntile quartiles, first_value, and an exact "
    "3-row sliding sum (integer cents) per priority partition.",
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_key"),
        (F.sum(cents("o_totalprice")).over(wf).cast("double") / F.lit(100.0)).alias(
            "mov_sum"
        ),
    )


# ---------------------------------------------------------------------------
# Global sort + salted skew join
# ---------------------------------------------------------------------------


@register(
    "q_global_sort",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_quantity >= 49
    ORDER BY l_shipdate, l_orderkey, l_linenumber
    """,
    doc="Global total-order sort (range-exchange + per-partition sort; the "
    "one sort shape TakeOrderedAndProject doesn't cover).",
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") >= 49)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    )


N_SALTS = 8


def salted_join_count(
    facts: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Per-key fact counts via an explicitly SALTED join.

    For a hot key whose rows overwhelm one shuffle partition, append a random
    salt in [0, N_SALTS) to the fact side and explode the (small) dim side to
    all N_SALTS salts, so each hot key spreads over N_SALTS reducers. AQE's
    skew-join split handles mid-size skew automatically; explicit salting is
    the pattern for the pathological keys AQE can't split (single-key joins,
    streaming state). Deterministic output: counts are aggregated after the
    join, so the random salt never affects the result.
    """
    salted_facts = facts.withColumn(
        "salt", (F.rand(seed=7) * N_SALTS).cast("int")
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
    )
    return (
        salted_facts.join(
            salted_dim,
            (salted_facts[fact_key] == salted_dim[dim_key])
            & (salted_facts["salt"] == salted_dim["salt"]),
        )
        .groupBy(dim_key)
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "q_salted_skew_join",
    oracle="""
    SELECT o.o_custkey, COUNT(*) AS n_rows
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_custkey
    """,
    doc="Skew-resistant salted join: lineitem->orders then salted "
    "orders->customer; salt spreads hot customers over N_SALTS reducers, "
    "aggregation after the join makes the salt invisible in the result.",
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    facts = li.join(o, li.l_orderkey == o.o_orderkey).select("o_custkey")
    out = salted_join_count(facts, c, "o_custkey", "c_custkey")
    return out.select(F.col("c_custkey").alias("o_custkey"), "n_rows")


# ---------------------------------------------------------------------------
# Cross join, min_by/max_by, RANGE frames, LIKE-family filters
# ---------------------------------------------------------------------------


@register(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="Deliberate cartesian product of two tiny dims (5 x 25) — the one "
    "join shape where CartesianProduct/BroadcastNestedLoop is correct.",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").select("r_name")
    n = _t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "q_minmax_by",
    oracle="""
    SELECT o_orderpriority,
           arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS cheapest_order,
           arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS priciest_order
    FROM orders GROUP BY o_orderpriority
    """,
    doc="min_by/max_by (argmin/argmax) per group; the ordering value embeds "
    "the unique orderkey so ties cannot make the answer engine-dependent.",
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rank_val = cents("o_totalprice") * F.lit(10_000_000) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.min_by("o_orderkey", rank_val).alias("cheapest_order"),
        F.max_by("o_orderkey", rank_val).alias("priciest_order"),
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(COUNT(*) OVER (
             PARTITION BY o_orderpriority
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
             RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_within_50k_below
    FROM orders
    """,
    doc="RANGE window frame (value-based, includes peers): per priority, how "
    "many orders price within $50k at or below this one. NOTE: Spark "
    "re-aggregates the sliding frame per row (no retraction) — "
    "O(n x frame_width); q_window_range_frame_scalable is the "
    "difference-of-growing-frames rewrite for wide frames at scale.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(cents("o_totalprice"))
        .rangeBetween(-5_000_000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.count("*").over(w).alias("n_within_50k_below"),
    )


@register(
    "q_like_filters",
    oracle="""
    SELECT lang,
           COUNT(*) FILTER (WHERE text LIKE '%the%') AS n_like,
           COUNT(*) FILTER (WHERE text ILIKE '%THE%') AS n_ilike,
           COUNT(*) FILTER (WHERE regexp_matches(text, '[0-9]{2,}')) AS n_rlike,
           COUNT(*) FILTER (WHERE starts_with(text, 'The')) AS n_prefix
    FROM documents GROUP BY lang
    """,
    doc="LIKE / ILIKE / RLIKE / prefix predicate pack over documents.",
)
def q_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.when(F.col("text").like("%the%"), 1)).alias("n_like"),
        F.count(F.when(F.col("text").ilike("%THE%"), 1)).alias("n_ilike"),
        F.count(F.when(F.col("text").rlike("[0-9]{2,}"), 1)).alias("n_rlike"),
        F.count(F.when(F.col("text").startswith("The"), 1)).alias("n_prefix"),
    )


# ---------------------------------------------------------------------------
# Rank functions, conditional aggregates, string aggregation
# ---------------------------------------------------------------------------


@register(
    "q_rank_functions",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           round(PERCENT_RANK() OVER w, 8) AS prnk,
           round(CUME_DIST() OVER w, 8) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
    """,
    doc="rank / dense_rank / percent_rank / cume_dist over an exact integer "
    "ordering key (ties are real and handled identically in both engines).",
)
def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(cents("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 8).alias("prnk"),
        F.round(F.cume_dist().over(w), 8).alias("cdist"),
    )


@register(
    "q_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
           bool_or(l_tax > 0.07) AS any_high_tax,
           bool_and(l_quantity > 0) AS all_positive_qty,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Conditional aggregation: count_if, bool_or/bool_and, case-sum.",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_finished"),
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Deterministic string aggregation: collect_list -> array_sort -> "
    "array_join == string_agg(ORDER BY) (explicit order, never relies on "
    "collection order).",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


# ---------------------------------------------------------------------------
# Array higher-order functions + struct operations
# ---------------------------------------------------------------------------


@register(
    "q_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x),
                                'sum'), 6) AS sum_sq,
           CAST(len(list_filter(embedding, x -> x < -0.5)) > 0 AS BOOLEAN) AS has_big_neg
    FROM embeddings WHERE vec_id < 300
    """,
    doc="Array higher-order functions: filter, transform+aggregate (sum of "
    "squares), exists — all row-level, zero shuffle.",
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return em.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x), 6).alias("sum_sq"),
        F.exists("embedding", lambda x: x < -0.5).alias("has_big_neg"),
    )


@register(
    "q_struct_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS priority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           (o_orderstatus = 'O') AS is_open
    FROM orders WHERE o_orderkey < 3000
    """,
    doc="Struct construction + field access: build a named struct per row, "
    "project its fields back out (nested data shape round-trip).",
)
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 3000)
    s = F.struct(
        F.col("o_orderpriority").alias("priority"),
        cents("o_totalprice").alias("price_cents"),
        (F.col("o_orderstatus") == "O").alias("is_open"),
    )
    built = o.select("o_orderkey", s.alias("s"))
    return built.select(
        "o_orderkey",
        F.col("s.priority").alias("priority"),
        F.col("s.price_cents").alias("price_cents"),
        F.col("s.is_open").alias("is_open"),
    )


@register(
    "q_events_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
           COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
             AS n_view_click,
           COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                            AND t_purchase > t_click) AS n_funnel_complete
    FROM per_user
    """,
    doc=(
        "Ordered conversion funnel (view -> click -> purchase): one "
        "conditional min-aggregate per stage collapses events to a row per "
        "user, then a single-row conditional count — two aggregates, one "
        "shuffle on user_id, no self-joins (the naive per-stage-join plan "
        "would shuffle the events table once per stage). NULL comparisons "
        "are falsy in both engines, so missing stages drop out identically."
    ),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def stage_min(stage: str, alias: str):
        return F.min(F.when(F.col("event_type") == stage, F.col("ts"))).alias(alias)

    per_user = ev.groupBy("user_id").agg(
        stage_min("view", "t_view"),
        stage_min("click", "t_click"),
        stage_min("purchase", "t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    completed = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("n_view"),
        F.count(F.when(clicked, 1)).alias("n_view_click"),
        F.count(F.when(completed, 1)).alias("n_funnel_complete"),
    )


@register(
    "q_events_retention",
    oracle="""
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
    c AS (SELECT user_id, MIN(d) AS cohort FROM d GROUP BY user_id)
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', c.cohort, d.d) AS INTEGER) AS day_offset,
           COUNT(DISTINCT d.user_id) AS n_users
    FROM d JOIN c ON d.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc=(
        "Cohort retention matrix: users bucketed by first-seen day, "
        "counted distinct at each day offset. The cohort date comes from a "
        "min-window over user_id rather than an aggregate+self-join — one "
        "shuffle on user_id serves both the cohort assignment and (after "
        "the narrow datediff projection) feeds the final distinct count. "
        "At 100 TB, pre-bucketing events by user_id makes the window "
        "shuffle-free."
    ),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn("cohort", F.min("d").over(w))
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", F.col("cohort")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER))
             AS n_distinct_k
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "Semi-structured VariantType path (Spark 4): parse_json once into "
        "a variant column, then typed variant_get extraction — the "
        "shredded binary encoding is parsed once per row instead of "
        "re-tokenizing the JSON string per extracted field, which is the "
        "at-scale advantage over get_json_object chains (q_events_json "
        "keeps the classic string-path surface for comparison)."
    ),
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count_distinct("k").alias("n_distinct_k"),
        )
    )


@register(
    "q_events_anomaly_hours",
    oracle="""
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS c
               FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, COUNT(*) AS n,
                  CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS s2
           FROM h GROUP BY 1)
    SELECT h.event_type, strftime(h.hr, '%Y-%m-%d %H:%M:%S') AS hour,
           h.c AS n_events
    FROM h JOIN st ON h.event_type = st.event_type
    WHERE st.n > 1
      AND h.c > (CAST(s AS DOUBLE) / n)
                + 2.5 * sqrt(CAST(n * s2 - s * s AS DOUBLE) / (n * (n - 1)))
    """,
    doc=(
        "Volume-anomaly detection: hours whose event count exceeds the "
        "per-type mean by >2.5 sample standard deviations. The variance "
        "comes from exact integer count/sum/sum-of-squares moments "
        "((n*S2 - S^2)/(n*(n-1))) rather than stddev_samp's streaming "
        "double accumulation, so the threshold is bit-identical across "
        "engines and partitionings. The per-type moment table is tiny and "
        "broadcasts back onto the hourly counts — two aggregates and one "
        "broadcast join, no window over the full table."
    ),
)
def q_events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count("*").alias("c"))
    )
    st = h.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast("double") / (
        F.col("n") * (F.col("n") - 1)
    )
    return (
        h.join(F.broadcast(st), "event_type")
        .where((F.col("n") > 1) & (F.col("c") > mean + F.lit(2.5) * F.sqrt(var)))
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("c").alias("n_events"),
        )
    )


@register(
    "q_events_transitions",
    oracle="""
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    doc=(
        "Behavioral transition matrix: counts of consecutive event-type "
        "bigrams per user (first-order Markov transitions). One lag window "
        "over user_id feeds a tiny |types|^2 aggregate — the window shuffle "
        "on user_id dominates and disappears entirely over a user-bucketed "
        "table; event_id breaks timestamp ties so the sequence (and thus "
        "the counts) is deterministic."
    ),
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_ntile_buckets",
    oracle="""
    WITH t AS (
      SELECT CAST(NTILE(10) OVER (ORDER BY CAST(round(c_acctbal * 100) AS BIGINT),
                             c_custkey) AS INTEGER) AS decile,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer)
    SELECT decile, COUNT(*) AS n,
           MIN(bal_cents) AS min_cents, MAX(bal_cents) AS max_cents
    FROM t GROUP BY decile
    """,
    doc=(
        "NTILE(10) decile assignment over a global total order (exact integer "
        "cents + unique custkey tiebreak), then per-decile count/min/max. "
        "NTILE needs a single total order, and Spark executes an "
        "unpartitioned window by moving ALL rows to ONE partition — this "
        "exact form is the correctness baseline, viable only because the "
        "projection shrinks input to (bal_cents, custkey) pairs first. The "
        "100 TB path is two-pass decile cutoffs: percentile_approx over the "
        "column (map-side mergeable sketch, one tiny result row) broadcast "
        "back as range predicates — fully parallel, no single-partition "
        "stage, at the cost of approximate boundaries."
    ),
)
def q_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = c.select(cents("c_acctbal").alias("bal_cents"), "c_custkey")
    w = Window.orderBy("bal_cents", "c_custkey")
    return (
        t.select(F.ntile(10).over(w).alias("decile"), "bal_cents")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("bal_cents").alias("min_cents"),
            F.max("bal_cents").alias("max_cents"),
        )
    )


@register(
    "q_events_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, state, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to
    FROM changes
    """,
    doc=(
        "SCD type-2 interval table from an event stream: change detection "
        "(lag over user history drops consecutive repeats) then interval "
        "construction (lead over the COMPRESSED stream; open intervals end "
        "NULL). Both windows partition by user_id with the same ordering, "
        "so Spark plans ONE shuffle — the change filter runs between two "
        "window operators over the same exchange. event_id breaks ts ties, "
        "making the run-length compression deterministic. At scale this is "
        "the standard CDC-events -> dimension-history build; over a "
        "user-bucketed table even the single shuffle disappears."
    ),
)
def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id", "event_type", "ts", "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


@register(
    "q_window_range_frame_scalable",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(COUNT(*) OVER (
             PARTITION BY o_orderpriority
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
             RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_within_50k_below
    FROM orders
    """,
    doc=(
        "Same answer as q_window_range_frame (same oracle), restructured "
        "for scale: Spark evaluates a sliding RANGE frame by RECOMPUTING "
        "the aggregate over the frame contents for every row — O(n x "
        "frame_width) per partition (measured 7s at sf0.1 vs 1.5s for "
        "this form). Rewrite as a DIFFERENCE OF TWO GROWING FRAMES, both "
        "incremental O(n): rank_le(v) = ties-inclusive running count; "
        "cnt_below(v - band) = running data-count at a probe row sorted "
        "at (v - band - 1, after ties); n_within = rank_le - cnt_below. "
        "Probes ride the SAME exchange as data rows (union before the "
        "shuffle); a final hash-agg on the row key pairs the two counts."
    ),
)
def q_window_range_frame_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", cents("o_totalprice").alias("v")
    )
    data = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("v").alias("sort_v"),
        F.lit(1).alias("is_data"),
    )
    probes = o.select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("v") - 5_000_000 - 1).alias("sort_v"),
        F.lit(0).alias("is_data"),
    )
    u = data.unionByName(probes)
    # growing frame 1: ties-inclusive count of data rows with value <= v
    w_le = (
        Window.partitionBy("o_orderpriority")
        .orderBy("sort_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # growing frame 2: count of data rows sorted strictly before this row
    # (data rows sort before probes at equal sort_v via is_data desc)
    w_cnt = (
        Window.partitionBy("o_orderpriority")
        .orderBy("sort_v", F.col("is_data").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = u.select(
        "o_orderkey",
        "o_orderpriority",
        "is_data",
        F.when(F.col("is_data") == 1, F.sum("is_data").over(w_le)).alias("rank_le"),
        F.when(F.col("is_data") == 0, F.sum("is_data").over(w_cnt)).alias("cnt_below"),
    )
    return (
        scored.groupBy("o_orderkey", "o_orderpriority")
        .agg(
            (F.max("rank_le") - F.coalesce(F.max("cnt_below"), F.lit(0))).alias(
                "n_within_50k_below"
            )
        )
    )


@register(
    "q_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value, ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT user_id, value,
             CAST(date_diff('second', ts, next_ts) AS BIGINT) AS dur_s
      FROM seg WHERE next_ts IS NOT NULL)
    SELECT user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT) * dur_s) AS BIGINT)
             AS weighted_cents_seconds,
           CAST(SUM(dur_s) AS BIGINT) AS total_seconds,
           round(CAST(SUM(CAST(round(value * 100) AS BIGINT) * dur_s) AS DOUBLE)
                 / 100.0 / NULLIF(SUM(dur_s), 0), 8) AS time_weighted_avg
    FROM w GROUP BY user_id
    """,
    doc=(
        "Time-weighted average (telemetry staple — a reading holds until "
        "the next one): each value weighted by its holding duration via "
        "ONE lead window per user, then exact integer (cents x seconds) "
        "sums — order-independent, so the average is bit-identical at any "
        "partitioning. The naive approach joins each reading to a time "
        "grid (explodes rows by grid resolution); the lead-window form is "
        "O(n) after one shuffle on the key, exact at native resolution."
    ),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).where(F.col("next_ts").isNotNull())
    dur = (F.unix_timestamp("next_ts") - F.unix_timestamp("ts")).alias("dur_s")
    cw = (cents("value") * F.col("dur_s")).alias("cw")
    agg = seg.select("user_id", dur, cents("value").alias("c")).groupBy("user_id").agg(
        F.sum(F.col("c") * F.col("dur_s")).alias("weighted_cents_seconds"),
        F.sum("dur_s").alias("total_seconds"),
    )
    return agg.select(
        "user_id",
        "weighted_cents_seconds",
        "total_seconds",
        F.round(
            F.col("weighted_cents_seconds").cast("double")
            / 100.0
            / F.nullif(F.col("total_seconds"), F.lit(0)),
            8,
        ).alias("time_weighted_avg"),
    )


_OVERLAP_K = 16


@register(
    "q_audience_overlap",
    oracle=f"""
    WITH hs AS (
      SELECT DISTINCT event_type, user_id,
             (CAST(('0x' || substr(md5('ov:' || CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1099511627689) AS h1,
             (CAST(('0x' || substr(md5('ov:' || CAST(user_id AS VARCHAR)), 16, 15))
                   AS BIGINT) % 1099511627689) AS h2
      FROM events),
    sig AS (SELECT event_type,
      {", ".join(f"MIN((h1 + {k} * h2) % 1099511627689) AS s{k}" for k in range(16))}
      FROM hs GROUP BY event_type),
    ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_inter
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT event_type, user_id FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type)
    SELECT i.type_a, i.type_b,
           round(CAST(({" + ".join(f"(CASE WHEN sa.s{k} = sb.s{k} THEN 1 ELSE 0 END)" for k in range(16))})
                 AS DOUBLE) / 16, 8) AS est_jaccard,
           round(CAST(i.n_inter AS DOUBLE)
                 / (ea.n_users + eb.n_users - i.n_inter), 8) AS exact_jaccard
    FROM inter i
    JOIN sig sa ON sa.event_type = i.type_a
    JOIN sig sb ON sb.event_type = i.type_b
    JOIN ex ea ON ea.event_type = i.type_a
    JOIN ex eb ON eb.event_type = i.type_b
    """,
    doc=(
        "Audience overlap between event-type segments: per-segment MinHash "
        "signature of the distinct-user set (16 md5-derived universal "
        "hashes, map-side-mergeable mins) gives O(|segments| x 16) "
        "sketches whose matching-coordinate fraction estimates Jaccard — "
        "the segment-overlap dashboard primitive that never joins user "
        "sets. The exact intersection (distinct-pair self-join) rides "
        "along here as the accuracy reference; at 100 TB you ship ONLY "
        "the sketch path (tiny state, any pair queryable after one pass) "
        "and skip the quadratic exact join entirely. Deterministic: "
        "md5-derived hashes make the estimate itself oracle-checkable."
    ),
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import HASH_P

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    digest = F.md5(F.concat(F.lit("ov:"), F.col("user_id").cast("string")).cast("binary"))
    hs = ev.select(
        "event_type",
        "user_id",
        (F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % HASH_P).alias("h1"),
        (F.conv(F.substring(digest, 16, 15), 16, 10).cast("bigint") % HASH_P).alias("h2"),
    )
    sig = hs.groupBy("event_type").agg(
        *[
            F.min((F.col("h1") + F.lit(k) * F.col("h2")) % HASH_P).alias(f"s{k}")
            for k in range(_OVERLAP_K)
        ]
    )
    ex = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))
    a, b = ev.alias("a"), ev.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sig.select(F.col("event_type").alias("type_a"), *[F.col(f"s{k}").alias(f"a{k}") for k in range(_OVERLAP_K)])
    sb = sig.select(F.col("event_type").alias("type_b"), *[F.col(f"s{k}").alias(f"b{k}") for k in range(_OVERLAP_K)])
    ea = ex.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("na"))
    eb = ex.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("nb"))
    matches = sum(
        F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
        for k in range(_OVERLAP_K)
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.round(matches.cast("double") / _OVERLAP_K, 8).alias("est_jaccard"),
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                8,
            ).alias("exact_jaccard"),
        )
    )


@register(
    "q_events_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type, 1) OVER w AS p1,
             LAG(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT p2 AS step1, p1 AS step2, event_type AS step3, COUNT(*) AS n
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY p2, p1, event_type
    ORDER BY n DESC, step1, step2, step3
    LIMIT 20
    """,
    doc=(
        "Top user journey paths: 3-step event sequences (trigrams) per "
        "user from TWO lag offsets over ONE window — the same single "
        "user_id shuffle as the bigram transition matrix, never a "
        "per-step self-join (which would shuffle events once per path "
        "step and explode on power users). The |types|^3 aggregate is "
        "tiny; top-k is TakeOrderedAndProject with full tiebreak."
    ),
)
def q_events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).where(F.col("p2").isNotNull())
    return (
        seq.groupBy(
            F.col("p2").alias("step1"),
            F.col("p1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(20)
    )


@register(
    "q_pit_features",
    oracle="""
    WITH labels AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    o3 AS (
      SELECT o_custkey, o_orderdate,
             MAX(o_totalprice) AS last_order_total,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS orders_to_date
      FROM orders GROUP BY o_custkey, o_orderdate),
    clicks AS (
      SELECT user_id AS cu, ts AS cts, MAX(value) AS last_click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    f1 AS (
      SELECT l.event_id, l.user_id, l.ts, o.last_order_total, o.orders_to_date
      FROM labels l ASOF LEFT JOIN o3 o
        ON l.user_id = o.o_custkey AND l.ts >= o.o_orderdate)
    SELECT f1.event_id, f1.user_id,
           strftime(f1.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           f1.last_order_total, f1.orders_to_date, c.last_click_value
    FROM f1 ASOF LEFT JOIN clicks c
      ON f1.user_id = c.cu AND f1.ts >= c.cts
    """,
    doc=(
        "Point-in-time (feature-store) join: every purchase label enriched "
        "with features AS OF the label timestamp — the user's latest order "
        "total, cumulative order count to date, and last click value — "
        "never a future value, so the training table is leakage-free by "
        "construction. Each feature attach is the union+window as-of merge "
        "(one shuffle per feature table, no row explosion, no range "
        "explosion); at scale, pack multiple features of one table into a "
        "struct value so N features cost one merge, and pre-bucket "
        "feature tables by entity key so the merges are shuffle-free."
    ),
)
def q_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    labels = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    o3 = (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("last_order_total"), F.count("*").alias("__n"))
        .withColumn("orders_to_date", F.sum("__n").over(w).cast("bigint"))
        .select("o_custkey", "o_orderdate", "last_order_total", "orders_to_date")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
        .agg(F.max("value").alias("last_click_value"))
    )
    f1 = asof_join(
        labels, o3, "user_id", "o_custkey", "ts", "o_orderdate", "last_order_total"
    )
    f2 = asof_join(
        f1, o3, "user_id", "o_custkey", "ts", "o_orderdate", "orders_to_date"
    )
    f3 = asof_join(f2, clicks, "user_id", "cu", "ts", "cts", "last_click_value")
    return f3.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "last_order_total",
        "orders_to_date",
        "last_click_value",
    )
