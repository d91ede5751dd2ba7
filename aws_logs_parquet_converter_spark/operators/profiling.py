"""Statistical moments + data-quality profiling operators.

Two capabilities a standalone analytics engine owes its users that the
reference delegates entirely to Athena (SURVEY.md §2.2 — the reference has
no aggregation surface at all):

* ``q_stats_moments`` — covariance / correlation / stddev. Spark's built-in
  ``corr``/``covar_samp`` sum doubles in partition order, so their low bits
  differ run-to-run and engine-to-engine. Here every raw moment (n, Sx, Sy,
  Sxx, Syy, Sxy) is an EXACT integer sum — order-independent — and the
  classic textbook formulas are applied as scalar IEEE double arithmetic on
  those exact moments, which is bit-deterministic in any engine that
  evaluates the same expression tree.

* ``dq_profile`` — per-column null counts, distinct counts, and min/max as
  two single-purpose wide aggregates (not one mixed aggregate — see the
  registered doc for the measured Expand-tax) unpivoted from their one-row
  results. This is the shape of every data-quality / profiling tool's core
  query; at 100 TB the difference between a constant number of scans and
  one-scan-per-column is the whole game.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_stats_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(l_extendedprice) AS BIGINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                      * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(round(l_extendedprice) AS BIGINT)
                      * CAST(round(l_extendedprice) AS BIGINT)) AS DOUBLE) AS syy,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                      * CAST(round(l_extendedprice) AS BIGINT)) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           (sxy / n - (sx / n) * (sy / n)) * (n / (n - 1)) / (100.0 * 1.0) AS covar_qty_price,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
           sqrt((sxx / n - (sx / n) * (sx / n)) * (n / (n - 1))) / 100.0 AS stddev_qty
    FROM m
    """,
    doc=(
        "Per-group covariance, Pearson correlation, and stddev of "
        "(l_quantity, l_extendedprice) from exact integer moments: "
        "quantity in exact cents, price rounded to exact whole dollars "
        "(so the cross/square moment sums stay far inside BIGINT at any "
        "scale - ~1e9 rows of dollar-squared terms is ~1e19/row-group "
        "headroom; at larger scale the same sums would move to "
        "DECIMAL(38,0)). The six sums are order-independent integers; "
        "everything after is scalar IEEE arithmetic on identical doubles, "
        "identical in any engine. Correlation is scale-invariant, so the "
        "unit choices cancel; covariance/stddev divide the units back "
        "out. One hash aggregate, map-side partials, no second pass."
    ),
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("bigint")  # exact centi-units
    y = F.round(F.col("l_extendedprice")).cast("bigint")  # exact dollars
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        ((sxy / n - (sx / n) * (sy / n)) * (n / (n - 1)) / (F.lit(100.0) * F.lit(1.0))).alias(
            "covar_qty_price"
        ),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
        (F.sqrt((sxx / n - (sx / n) * (sx / n)) * (n / (n - 1))) / F.lit(100.0)).alias(
            "stddev_qty"
        ),
    )


_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]


@register(
    "dq_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col,
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderstatus) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderstatus) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           printf('%.2f', MIN(o_totalprice)), printf('%.2f', MAX(o_totalprice))
    FROM orders
    """,
    doc=(
        "Table profile: per-column null count, exact distinct count, and "
        "min/max over orders, as TWO single-purpose wide aggregates whose "
        "one-row results cross-join (free) and unpivot with stack(). "
        "Splitting is deliberate: mixing count_distinct with regular "
        "aggregates in one agg forces Catalyst's Expand to drag every "
        "regular aggregate through the expanded rows - measured 3x slower "
        "than the split form at sf0.1 (1.29s vs 0.41s). Separated, the "
        "null/min/max agg stays in whole-stage codegen and the "
        "multi-column exact distinct plans its usual two-phase "
        "(partial-dedup map-side) aggregate; both scan the same pruned "
        "columns. The oracle is the semantically-equal UNION-ALL-of-scans "
        "form DuckDB optimizes on its own. Values are stringified for a "
        "uniform schema; doubles via printf('%.2f') on both sides so the "
        "rendering is engine-independent."
    ),
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    reg_aggs, dist_aggs = [], []
    for c in _PROFILE_COLS:
        reg_aggs.append((F.count("*") - F.count(c)).cast("bigint").alias(f"{c}__null"))
        dist_aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__distinct"))
        if c == "o_totalprice":
            reg_aggs.append(F.format_string("%.2f", F.min(c)).alias(f"{c}__min"))
            reg_aggs.append(F.format_string("%.2f", F.max(c)).alias(f"{c}__max"))
        else:
            reg_aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            reg_aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    wide = o.agg(*reg_aggs).crossJoin(o.agg(*dist_aggs))
    stack_args = ", ".join(
        f"'{c}', `{c}__null`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col, n_null, n_distinct, min_val, max_val)"
    )


@register(
    "q_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    doc=(
        "Forward-fill / LOCF (last observation carried forward): every "
        "event carries the value of the user's most recent purchase — the "
        "canonical sparse-to-dense time-series imputation. last() with "
        "ignorenulls over a running window is a single window pass: one "
        "shuffle on user_id, per-partition sort, O(1) state per row (the "
        "naive as-of self-join against the purchase subset shuffles twice "
        "and explodes on users with many purchases). No arithmetic touches "
        "the carried value, so doubles compare exactly cross-engine. "
        "(ts, event_id) is a total order, making the fill deterministic."
    ),
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "q_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           printf('%.2f', MIN(o_totalprice)) AS lo,
           printf('%.2f', MAX(o_totalprice)) AS hi
    FROM orders
    GROUP BY 1
    """,
    doc=(
        "Equi-width histogram with a clamped overflow bucket: floor-divide "
        "into 50k-wide bins, top bin open-ended — the profiling primitive "
        "behind every distribution dashboard. One hash aggregate over the "
        "bucket expression (10 groups regardless of table size, so the "
        "shuffle is constant-size); floor() of an IEEE division is "
        "bit-deterministic, and bin edges are stringified min/max via "
        "printf on both engines."
    ),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.format_string("%.2f", F.min("o_totalprice")).alias("lo"),
            F.format_string("%.2f", F.max("o_totalprice")).alias("hi"),
        )
    )


@register(
    "q_events_sliding_window",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws,
             event_type
      FROM events)
    GROUP BY 1, 2
    """,
    doc=(
        "Sliding (hopping) windows: 1-hour windows every 30 minutes, so "
        "each event lands in exactly window/slide = 2 windows. Spark's "
        "window(ts, '1 hour', '30 minutes') plans an internal explode of "
        "that factor BEFORE the partial aggregate - the shuffle carries "
        "(window, type, partial count), never 2x raw events. The oracle "
        "derives the same two window starts per event arithmetically "
        "(time_bucket and its 30-minute predecessor). Overlap factor is "
        "the state/compute multiplier to budget at scale: a 24h window "
        "sliding hourly is 24x, better served by hourly tumbling + a "
        "24-row rolling window over the aggregates (q_window_frames "
        "pattern)."
    ),
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@register(
    "q_skew_keys",
    oracle="""
    WITH c AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
         t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total, CAST(MAX(n) AS DOUBLE) AS mx,
                      CAST(COUNT(*) AS DOUBLE) AS nkeys FROM c)
    SELECT o_custkey, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / t.total AS share,
           t.mx / (t.total / t.nkeys) AS max_skew_ratio
    FROM c, t
    ORDER BY n DESC, o_custkey
    LIMIT 10
    """,
    doc=(
        "Skew diagnostics: the operational pre-join query behind every "
        "salting decision - top-10 heaviest join keys with their share of "
        "total rows, plus the global max/mean skew ratio (>> 1 means AQE "
        "skew-split or explicit salting, see q_salted_skew_join). Two "
        "stacked aggregates: per-key counts (map-side partial, one "
        "shuffle), then a one-row total broadcast back. Top-k executes as "
        "TakeOrderedAndProject with a unique key tiebreak; shares are "
        "exact-integer ratios so the doubles match cross-engine."
    ),
)
def q_skew_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    t = c.agg(
        F.sum("n").cast("double").alias("total"),
        F.max("n").cast("double").alias("mx"),
        F.count("*").cast("double").alias("nkeys"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "o_custkey",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n").cast("double") / F.col("total")).alias("share"),
            (F.col("mx") / (F.col("total") / F.col("nkeys"))).alias("max_skew_ratio"),
        )
        .orderBy(F.col("n").desc(), "o_custkey")
        .limit(10)
    )


@register(
    "q_window_distinct_running",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(DISTINCT event_type)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS INTEGER) AS n_types_seen
    FROM events
    """,
    doc=(
        "Running distinct count per key (how many distinct event types "
        "has this user produced so far) - a window shape Spark has no "
        "direct function for (count_distinct is not a window function): "
        "the idiom is size(collect_set() OVER running-frame), whose set "
        "state is bounded by the attribute's cardinality (event types "
        "here), NOT by history length - safe at any scale for "
        "low-cardinality attributes, switch to approx sketches for "
        "high-cardinality ones. One shuffle on user_id, one sort."
    ),
)
def q_window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"),
    )


@register(
    "q_sketch_rollup",
    # No oracle: HLL estimates are sketch-implementation-specific (Spark uses
    # Apache DataSketches; DuckDB its own HLL) — driver runs the rows-only
    # check; tests/test_extensions.py pins <2% relative error vs exact.
    doc=(
        "Sketch rollup table: per-day HLL sketches of distinct users "
        "(hll_sketch_agg), re-aggregated to weekly estimates by merging the "
        "DAILY SKETCHES (hll_union_agg) — never rescanning raw events. This "
        "is the 100 TB pattern for distinct-count dashboards: the daily "
        "sketch table is KBs per day regardless of event volume, sketches "
        "merge associatively map-side like any partial aggregate, and any "
        "rollup grain (week/month/rolling-28d) derives from the sketch "
        "table at interactive cost. Exact count_distinct can't do this: "
        "COUNT(DISTINCT) partials are the full key sets themselves."
    ),
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )
    return (
        daily.groupBy(F.date_trunc("week", "day").cast("date").alias("week"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
            F.sum("n_events").alias("n_events"),
        )
        .select("week", "est_users", "n_events")
    )


@register(
    "q_incremental_rollup",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
             COUNT(*) AS n
      FROM orders GROUP BY 1)
    SELECT strftime(date_trunc('month', day), '%Y-%m') AS month,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(SUM(n) AS BIGINT) AS n_orders
    FROM daily GROUP BY 1
    """,
    doc=(
        "Incremental aggregate maintenance, exact-sum sibling of "
        "q_sketch_rollup: the monthly rollup is computed FROM the daily "
        "partial table (sum/count are algebraic — partials merge by "
        "addition), not from raw orders. At 100 TB the daily partial table "
        "is the materialization point: each day's batch appends one tiny "
        "partial row per group, any coarser grain (month/quarter/rolling) "
        "re-aggregates partials at interactive cost, and a late-arriving "
        "day is repaired by overwriting ONE day's partials (the reference's "
        "idempotent per-date overwrite, lifted to aggregates). Integer "
        "cents keep re-aggregation bit-identical under any partitioning."
    ),
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import cents

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(cents("o_totalprice")).alias("cents"),
        F.count("*").alias("n"),
    )
    return daily.groupBy(
        F.date_format("day", "yyyy-MM").alias("month")
    ).agg(
        F.sum("cents").alias("revenue_cents"),
        F.sum("n").alias("n_orders"),
    )


# --- seeded incremental rollup: partials persisted, one late day repaired ---

#: the "late-arriving" day whose partial row is poisoned at seed time and
#: repaired by a single-partition overwrite (exists at every test SF)
_LATE_DAY = "1995-06-17"

#: per-sf_dir cache of seeded daily-partials paths (setup state, like
#: dedup._band_index_for / stream_upsert_merge's seeded destination)
_ROLLUP_PARTIALS_PATHS: dict[str, str] = {}


def _seeded_partials_for(spark: SparkSession, sf_dir: str) -> str:
    """Seed a day-partitioned daily-partials parquet table with ONE day's
    partial poisoned (stale cents/count), then repair it the incremental
    way: recompute only that day from orders (pushed date filter) and
    overwrite only that day's partition directory. Mirrors the reference's
    idempotent per-date overwrite, lifted to aggregate partials."""
    path = _ROLLUP_PARTIALS_PATHS.get(sf_dir)
    if path is not None:
        return path
    import tempfile

    from ..functions.numeric import cents

    path = tempfile.mkdtemp(prefix="rollup_partials_")
    o = load_table(spark, sf_dir, "orders")
    late = F.lit(_LATE_DAY).cast("date")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(cents("o_totalprice")).alias("cents"),
        F.count("*").alias("n"),
    )
    stale = daily.select(
        "day",
        F.when(F.col("day") == late, F.lit(0)).otherwise(F.col("cents"))
        .cast("bigint").alias("cents"),
        F.when(F.col("day") == late, F.lit(0)).otherwise(F.col("n"))
        .cast("bigint").alias("n"),
    )
    stale.write.mode("overwrite").partitionBy("day").parquet(path)
    repair = (
        o.where(F.to_date("o_orderdate") == late)
        .groupBy()
        .agg(
            F.sum(cents("o_totalprice")).cast("bigint").alias("cents"),
            F.count("*").cast("bigint").alias("n"),
        )
        .where(F.col("n") > 0)
    )
    repair.write.mode("overwrite").parquet(f"{path}/day={_LATE_DAY}")
    _ROLLUP_PARTIALS_PATHS[sf_dir] = path
    return path


@register(
    "q_incremental_rollup_seeded",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
             COUNT(*) AS n
      FROM orders GROUP BY 1)
    SELECT strftime(date_trunc('month', day), '%Y-%m') AS month,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(SUM(n) AS BIGINT) AS n_orders
    FROM daily GROUP BY 1
    """,
    doc=(
        "Incremental rollup with PERSISTED state: the monthly rollup reads "
        "ONLY a pre-written day-partitioned daily-partials parquet table "
        "(plan-asserted: no orders scan in the query plan). Seeding "
        "poisons one day's partial and repairs it by recomputing just "
        "that day from orders (pushed date filter) and overwriting only "
        "that day's partition — the reference's idempotent per-date "
        "overwrite lifted to aggregates. At 100 TB each day's batch "
        "appends/overwrites one tiny partial partition; every coarser "
        "grain re-aggregates partials at interactive cost, and raw rows "
        "are read at most once per repaired day."
    ),
)
def q_incremental_rollup_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _seeded_partials_for(spark, sf_dir)
    partials = spark.read.parquet(path)
    return partials.groupBy(
        F.date_format("day", "yyyy-MM").alias("month")
    ).agg(
        F.sum("cents").alias("revenue_cents"),
        F.sum("n").alias("n_orders"),
    )


@register(
    "q_winsorize_mad",
    oracle="""
    WITH c AS (SELECT l_returnflag,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem),
    med AS (SELECT median(cents) AS m FROM c),
    mad AS (SELECT median(abs(cents - (SELECT m FROM med))) AS d FROM c),
    b AS (SELECT (SELECT m FROM med) - 3 * (SELECT d FROM mad) AS lo,
                 (SELECT m FROM med) + 3 * (SELECT d FROM mad) AS hi)
    SELECT l_returnflag,
           CAST(SUM(CAST(LEAST(GREATEST(CAST(cents AS DOUBLE), b.lo), b.hi)
                         AS BIGINT)) AS BIGINT) AS winsorized_cents,
           CAST(COUNT(*) FILTER (WHERE CAST(cents AS DOUBLE) < b.lo
                                    OR CAST(cents AS DOUBLE) > b.hi)
                AS BIGINT) AS n_clamped
    FROM c CROSS JOIN b
    GROUP BY l_returnflag
    """,
    doc=(
        "Robust-statistics winsorization: clamp values to median ± 3·MAD "
        "(median absolute deviation), the outlier treatment feature "
        "pipelines apply before normalization. Exact and cross-engine "
        "deterministic because every intermediate — integer cents, exact "
        "medians (integer or half-integer), MAD, bounds — is exactly "
        "representable in doubles: no interpolation ULP drift. Cost is two "
        "median passes + one clamp pass; exact median is the correctness "
        "baseline (Spark sorts per group), approx_percentile partials are "
        "the 100 TB path, same plan shape."
    ),
)
def q_winsorize_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import cents

    li = load_table(spark, sf_dir, "lineitem")
    c = li.select("l_returnflag", cents("l_extendedprice").alias("cents"))
    m = c.agg(F.median("cents").alias("m"))
    d = c.crossJoin(F.broadcast(m)).agg(
        F.median(F.abs(F.col("cents") - F.col("m"))).alias("d")
    )
    b = m.crossJoin(d).select(
        (F.col("m") - 3 * F.col("d")).alias("lo"),
        (F.col("m") + 3 * F.col("d")).alias("hi"),
    )
    v = F.col("cents").cast("double")
    clamped = F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    return (
        c.crossJoin(F.broadcast(b))
        .groupBy("l_returnflag")
        .agg(
            F.sum(clamped.cast("bigint")).alias("winsorized_cents"),
            F.count_if((v < F.col("lo")) | (v > F.col("hi"))).alias("n_clamped"),
        )
    )


@register(
    "dq_expectations",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS n,
             COUNT(o_orderkey) AS n_key,
             COUNT(DISTINCT o_orderkey) AS n_key_distinct,
             COUNT(*) FILTER (WHERE o_totalprice <= 0 OR o_totalprice > 600000)
               AS n_price_oob,
             COUNT(*) FILTER (WHERE o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'))
               AS n_bad_priority,
             COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
                                 OR o_orderdate >= TIMESTAMP '2026-01-01')
               AS n_bad_date
      FROM orders)
    SELECT rule, n_violations, n_violations = 0 AS pass
    FROM (
      SELECT 'orderkey_not_null' AS rule, CAST(n - n_key AS BIGINT) AS n_violations FROM agg
      UNION ALL SELECT 'orderkey_unique', CAST(n_key - n_key_distinct AS BIGINT) FROM agg
      UNION ALL SELECT 'totalprice_in_range', CAST(n_price_oob AS BIGINT) FROM agg
      UNION ALL SELECT 'priority_in_domain', CAST(n_bad_priority AS BIGINT) FROM agg
      UNION ALL SELECT 'orderdate_in_range', CAST(n_bad_date AS BIGINT) FROM agg
    )
    """,
    doc=(
        "Declarative data-quality expectations (not-null, uniqueness, "
        "range, domain membership, date sanity) evaluated in ONE scan: "
        "every rule is a conditional count inside a single wide aggregate "
        "(uniqueness adds the one distinct), then the 1-row result "
        "unpivots to (rule, n_violations, pass). The per-rule-query "
        "alternative scans the table once per rule; at 100 TB a five-rule "
        "suite must not cost five scans. Compose with df.observe (the "
        "compaction write path) to get the same gates for free on write."
    ),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count("*").alias("n"),
        F.count("o_orderkey").alias("n_key"),
        F.count_distinct("o_orderkey").alias("n_key_distinct"),
        F.count_if(
            (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 600000)
        ).alias("n_price_oob"),
        F.count_if(
            ~F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            )
        ).alias("n_bad_priority"),
        F.count_if(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2026-01-01").cast("timestamp"))
        ).alias("n_bad_date"),
    )
    rules = agg.select(
        F.expr(
            "stack(5,"
            "'orderkey_not_null', CAST(n - n_key AS BIGINT),"
            "'orderkey_unique', CAST(n_key - n_key_distinct AS BIGINT),"
            "'totalprice_in_range', CAST(n_price_oob AS BIGINT),"
            "'priority_in_domain', CAST(n_bad_priority AS BIGINT),"
            "'orderdate_in_range', CAST(n_bad_date AS BIGINT)"
            ") AS (rule, n_violations)"
        )
    )
    return rules.select("rule", "n_violations", (F.col("n_violations") == 0).alias("pass"))


@register(
    "dq_drift",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01' THEN 'ref' ELSE 'cur' END AS period,
             LEAST(9, CAST(round(o_totalprice * 100) AS BIGINT) // 6000000) AS bucket
      FROM orders),
    c AS (SELECT period, bucket, COUNT(*) AS n FROM b GROUP BY period, bucket),
    t AS (SELECT period, SUM(n) AS tot FROM c GROUP BY period),
    sh AS (
      SELECT c.bucket,
             MAX(CASE WHEN c.period = 'ref' THEN CAST(c.n AS DOUBLE) / t.tot END) AS share_ref,
             MAX(CASE WHEN c.period = 'cur' THEN CAST(c.n AS DOUBLE) / t.tot END) AS share_cur
      FROM c JOIN t ON c.period = t.period
      GROUP BY c.bucket)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           round(COALESCE(share_ref, 0), 8) AS share_ref,
           round(COALESCE(share_cur, 0), 8) AS share_cur,
           round((COALESCE(share_cur, 1e-9) - COALESCE(share_ref, 1e-9))
                 * ln(COALESCE(share_cur, 1e-9) / COALESCE(share_ref, 1e-9)), 8)
             AS psi_term
    FROM sh
    """,
    doc=(
        "Distribution drift (population-stability-index terms) between a "
        "reference and a current period over fixed integer price buckets — "
        "the dataset-version drift monitor ML pipelines run before "
        "retraining. FIXED bucket edges (not per-period percentiles) keep "
        "bucket membership an exact integer function — comparable across "
        "runs and engines; per-bucket PSI terms are emitted unsummed so "
        "no cross-bucket double-sum order exists to drift (sum the column "
        "for the scalar PSI). One scan, one (period, bucket) aggregate, "
        "tiny join on the two period totals."
    ),
)
def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import cents

    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.when(
            F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"), "ref"
        ).otherwise("cur").alias("period"),
        F.least(F.lit(9), F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 6000000")).alias("bucket"),
    )
    c = b.groupBy("period", "bucket").agg(F.count("*").alias("n"))
    t = c.groupBy("period").agg(F.sum("n").alias("tot"))
    sh = (
        c.join(F.broadcast(t), "period")
        .groupBy("bucket")
        .agg(
            F.max(
                F.when(F.col("period") == "ref", F.col("n").cast("double") / F.col("tot"))
            ).alias("share_ref"),
            F.max(
                F.when(F.col("period") == "cur", F.col("n").cast("double") / F.col("tot"))
            ).alias("share_cur"),
        )
    )
    sr = F.coalesce(F.col("share_ref"), F.lit(1e-9))
    sc = F.coalesce(F.col("share_cur"), F.lit(1e-9))
    return sh.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.round(F.coalesce(F.col("share_ref"), F.lit(0.0)), 8).alias("share_ref"),
        F.round(F.coalesce(F.col("share_cur"), F.lit(0.0)), 8).alias("share_cur"),
        F.round((sc - sr) * F.log(sc / sr), 8).alias("psi_term"),
    )


@register(
    "q_equidepth_histogram",
    oracle="""
    WITH r AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                            o_orderkey) AS bucket
      FROM orders)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM r GROUP BY bucket
    """,
    doc=(
        "Equi-DEPTH histogram (8 buckets of equal row count with their "
        "value ranges) — the optimizer-statistics / drift-baseline "
        "companion to q_histogram's equi-WIDTH buckets: equal-width "
        "buckets starve on skewed money columns (most rows land in two "
        "buckets), equal-depth adapts the boundaries to the mass. NTILE "
        "over an exact-cents order with the unique orderkey tiebreak "
        "makes bucket membership bit-stable cross-engine. Single-column "
        "global NTILE funnels through one window partition — at corpus "
        "scale swap in the two-pass percentile-cutoff rewrite documented "
        "at q_ntile_buckets."
    ),
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.numeric import cents

    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(cents("o_totalprice"), F.col("o_orderkey"))
    return (
        o.select("o_totalprice", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .select(F.col("bucket").cast("int").alias("bucket"), "n", "lo", "hi")
    )


#: drift geometry: reference = first event_id half, current = second;
#: 10 fixed-width bins over the GLOBAL value range
DRIFT_SPLIT_FRAC = 0.5
DRIFT_BINS = 10


@register(
    "dq_drift_tvd",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(value) AS mn, MAX(value) AS mx,
             CAST(MAX(event_id) + 1 AS BIGINT) AS n_ids FROM events),
    binned AS (
      SELECT e.event_type,
             CASE WHEN e.event_id < b.n_ids * {DRIFT_SPLIT_FRAC}
                  THEN 'ref' ELSE 'cur' END AS side,
             LEAST(CAST(floor((e.value - b.mn)
                              / ((b.mx - b.mn) / {DRIFT_BINS})) AS BIGINT),
                   {DRIFT_BINS - 1}) AS bin
      FROM events e CROSS JOIN bounds b),
    cnt AS (
      SELECT event_type, side, bin, COUNT(*) AS n
      FROM binned GROUP BY event_type, side, bin),
    per_bin AS (
      SELECT event_type, bin,
             SUM(CASE WHEN side = 'ref' THEN n ELSE 0 END) AS rn,
             SUM(CASE WHEN side = 'cur' THEN n ELSE 0 END) AS cn
      FROM cnt GROUP BY event_type, bin),
    tot AS (
      SELECT event_type,
             SUM(rn) AS nr, SUM(cn) AS nc FROM per_bin GROUP BY event_type)
    SELECT p.event_type,
           CAST(SUM(abs(p.rn * t.nc - p.cn * t.nr)) AS DOUBLE)
             / (2.0 * t.nr * t.nc) AS tvd
    FROM per_bin p JOIN tot t ON t.event_type = p.event_type
    GROUP BY p.event_type, t.nr, t.nc
    """,
    doc=(
        "Distribution DRIFT detection per segment — total-variation "
        "distance between a REFERENCE slice (first event_id half) and "
        "the CURRENT slice over 10 fixed-width value bins, grouped by "
        "event_type: the day-over-day data-quality monitor that catches "
        "an upstream change (new client version, schema drift, "
        "truncated feed) before it poisons training data. TVD is "
        "chosen over PSI deliberately: it is pure count arithmetic "
        "(|p - q| sums — IEEE-exact, bit-identical across engines at "
        "any partitioning), where PSI's ln() differs in ULPs between "
        "libm implementations and would break value-hash parity. Scale "
        "shape: one bounds aggregate + one (segment, side, bin)-keyed "
        "count — two scans, shuffle keyed on a few hundred groups, no "
        "row-level state."
    ),
)
def dq_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    b = e.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        (F.max("event_id") + 1).cast("bigint").alias("n_ids"),
    )
    binned = e.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(
            F.col("event_id") < F.col("n_ids") * DRIFT_SPLIT_FRAC, F.lit("ref")
        )
        .otherwise(F.lit("cur"))
        .alias("side"),
        F.least(
            F.floor(
                (F.col("value") - F.col("mn"))
                / ((F.col("mx") - F.col("mn")) / DRIFT_BINS)
            ).cast("bigint"),
            F.lit(DRIFT_BINS - 1),
        ).alias("bin"),
    )
    # ALL-INTEGER until one final division: sum |rn*Nc - cn*Nr| exactly
    # (order-independent bigints), divide once — bit-identical across
    # engines and partitionings, unlike summing per-bin double ratios
    per_bin = (
        binned.groupBy("event_type", "side", "bin")
        .agg(F.count("*").alias("n"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("side") == "ref", F.col("n")).otherwise(0)).alias("rn"),
            F.sum(F.when(F.col("side") == "cur", F.col("n")).otherwise(0)).alias("cn"),
        )
    )
    tot = per_bin.groupBy("event_type").agg(
        F.sum("rn").alias("nr"), F.sum("cn").alias("nc")
    )
    return (
        per_bin.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "nr", "nc")
        .agg(
            (
                F.sum(F.abs(F.col("rn") * F.col("nc") - F.col("cn") * F.col("nr")))
                .cast("double")
                / (F.lit(2.0) * F.col("nr") * F.col("nc"))
            ).alias("tvd")
        )
        .select("event_type", "tvd")
    )


@register(
    "dq_drift_categorical",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(MAX(event_id) + 1 AS BIGINT) AS n_ids FROM events),
    cnt AS (
      SELECT e.event_type,
             SUM(CASE WHEN e.event_id < b.n_ids * {DRIFT_SPLIT_FRAC}
                      THEN 1 ELSE 0 END) AS rn,
             SUM(CASE WHEN e.event_id >= b.n_ids * {DRIFT_SPLIT_FRAC}
                      THEN 1 ELSE 0 END) AS cn
      FROM events e CROSS JOIN bounds b GROUP BY e.event_type),
    tot AS (SELECT SUM(rn) AS nr, SUM(cn) AS nc FROM cnt)
    SELECT CAST(SUM(abs(c.rn * t.nc - c.cn * t.nr)) AS DOUBLE)
             / (2.0 * t.nr * t.nc) AS tvd,
           CAST(SUM(CASE WHEN c.rn = 0 AND c.cn > 0 THEN 1 ELSE 0 END)
                AS INTEGER) AS n_new_categories,
           CAST(SUM(CASE WHEN c.cn = 0 AND c.rn > 0 THEN 1 ELSE 0 END)
                AS INTEGER) AS n_gone_categories
    FROM cnt c CROSS JOIN tot t
    GROUP BY t.nr, t.nc
    """,
    doc=(
        "CATEGORICAL drift — total-variation distance between the "
        "reference and current slices' event_type FREQUENCY "
        "distributions, plus appeared/vanished category counts (the "
        "failure a numeric-bin monitor can't name: a new client "
        "version emitting a new enum value, or a feed silently "
        "dropping one). Same all-integer TVD formulation as "
        "dq_drift_tvd (exact count arithmetic, one final division — "
        "bit-identical across engines); one count aggregate keyed on "
        "the category, one 1-row totals broadcast."
    ),
)
def dq_drift_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    b = e.agg((F.max("event_id") + 1).cast("bigint").alias("n_ids"))
    cnt = (
        e.crossJoin(F.broadcast(b))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("event_id") < F.col("n_ids") * DRIFT_SPLIT_FRAC, 1
                ).otherwise(0)
            ).alias("rn"),
            F.sum(
                F.when(
                    F.col("event_id") >= F.col("n_ids") * DRIFT_SPLIT_FRAC, 1
                ).otherwise(0)
            ).alias("cn"),
        )
    )
    tot = cnt.groupBy().agg(F.sum("rn").alias("nr"), F.sum("cn").alias("nc"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .groupBy("nr", "nc")
        .agg(
            (
                F.sum(F.abs(F.col("rn") * F.col("nc") - F.col("cn") * F.col("nr")))
                .cast("double")
                / (F.lit(2.0) * F.col("nr") * F.col("nc"))
            ).alias("tvd"),
            F.sum(
                F.when((F.col("rn") == 0) & (F.col("cn") > 0), 1).otherwise(0)
            )
            .cast("int")
            .alias("n_new_categories"),
            F.sum(
                F.when((F.col("cn") == 0) & (F.col("rn") > 0), 1).otherwise(0)
            )
            .cast("int")
            .alias("n_gone_categories"),
        )
        .select("tvd", "n_new_categories", "n_gone_categories")
    )
