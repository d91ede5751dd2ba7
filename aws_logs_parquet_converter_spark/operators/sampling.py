"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus pipeline needs *reproducible* sampling: train/val/test splits
that never move when the job re-runs or the cluster re-partitions, and
stratified samples whose membership is a pure function of the row key. Spark's
``df.sample()`` / ``TABLESAMPLE`` are seeded per-partition and change with the
physical plan, so every operator here derives its randomness from an md5 hash
of the row key instead — stable across engines, partitionings, and re-runs,
and therefore DuckDB-oracle-checkable.

Scale notes: hash-split and hash-sample are narrow (per-row) transforms — no
shuffle, fully inside whole-stage codegen except the md5 call itself. The
only exchange in the gate queries below is the final tiny aggregation.

Reference scope: the reference repo (converters/s3-server-access-log/
s3_server_access_logs.py) has no sampling surface; these implement the
training-data extension ops required by the driver brief (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

#: number of hash buckets used for split/sample assignment
N_BUCKETS = 100


def hash_bucket(key: Column | str, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of the key.

    Uses the first 15 hex digits (60 bits) of md5 so the value fits a signed
    bigint identically in Spark (``conv``) and DuckDB (``'0x' || substr``).
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")
    return h % F.lit(n_buckets)


def sql_hash_bucket(expr: str, n_buckets: int = N_BUCKETS) -> str:
    """DuckDB fragment computing the same bucket as :func:`hash_bucket`."""
    return (
        f"(CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {n_buckets})"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    *,
    train: int = 80,
    val: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to train/val/test by hash bucket of ``key_col``.

    ``train`` + ``val`` are percentages; the remainder is test. Assignment is
    a pure function of the key — re-runs, repartitions, and incremental
    appends all agree, which is the property ``df.randomSplit`` lacks.
    """
    if not 0 <= train + val <= N_BUCKETS:
        raise ValueError("train + val percentages must be within [0, 100]")
    b = hash_bucket(key_col)
    return df.withColumn(
        split_col,
        F.when(b < train, F.lit("train"))
        .when(b < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def hash_sample(df: DataFrame, key_col: str, percent: int) -> DataFrame:
    """Keep a deterministic ~percent% of rows by hash bucket of ``key_col``."""
    if not 0 < percent <= N_BUCKETS:
        raise ValueError("percent must be in (0, 100]")
    return df.where(hash_bucket(key_col) < percent)


@register(
    "q_hash_split",
    oracle=f"""
    SELECT CASE WHEN {sql_hash_bucket("doc_id")} < 80 THEN 'train'
                WHEN {sql_hash_bucket("doc_id")} < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1
    """,
    doc="Deterministic 80/10/10 train/val/test split via md5-bucket of doc_id.",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@register(
    "q_stratified_sample",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM documents
    WHERE {sql_hash_bucket("doc_id")} < 10
    GROUP BY lang
    """,
    doc="Deterministic ~10% sample, audited per language stratum.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = hash_sample(load_table(spark, sf_dir, "documents"), "doc_id", 10)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@register(
    "q_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars
    FROM documents
    WHERE (CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 10000) < (n_chars * 10000) // 1200
    """,
    doc=(
        "Weight-proportional deterministic sampling: inclusion probability "
        "~ n_chars/1200 (longer documents sampled more often — the standard "
        "quality/length-weighted corpus draw), membership a pure function "
        "of md5(doc_id). Exact INTEGER threshold compare (hash mod 10^4 vs "
        "scaled weight) — no float rounding to drift between engines. Same "
        "scale properties as hash_split: narrow, shuffle-free, stable "
        "under re-runs/repartitioning, nestable by scaling the threshold."
    ),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")).cast("binary")),
                1, 15,
            ),
            16, 10,
        ).cast("bigint")
        % 10000
    )
    return d.select("doc_id", "n_chars").where(
        u < F.expr("CAST(n_chars AS BIGINT) * 10000 div 1200")
    )


# Domain-mix targets: up-weighted "curated" sources get 2x the budget of the
# long tail; K docs per weight unit at the sf0.01 reference point.
_MIX_WEIGHTS = {f"src{i}": 2 for i in range(5)}
_MIX_DEFAULT_W = 1
_MIX_K = 15


def _mix_weight_sql() -> str:
    pairs = " ".join(f"WHEN '{s}' THEN {w}" for s, w in sorted(_MIX_WEIGHTS.items()))
    return f"CASE source {pairs} ELSE {_MIX_DEFAULT_W} END"


@register(
    "q_domain_mix",
    oracle=f"""
    WITH counted AS (
      SELECT doc_id, source,
             COUNT(*) OVER (PARTITION BY source) AS n_src,
             {_mix_weight_sql()} AS w
      FROM documents),
    kept AS (
      SELECT source, n_src, w,
             CASE WHEN (CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 10000)
                  < LEAST(10000, (w * {_MIX_K} * 10000) // n_src)
                  THEN 1 ELSE 0 END AS keep
      FROM counted)
    SELECT source,
           CAST(MAX(n_src) AS BIGINT) AS n_total,
           CAST(SUM(keep) AS BIGINT) AS n_kept
    FROM kept GROUP BY source
    """,
    doc=(
        "Domain mixing: rebalance a multi-source corpus toward target "
        "weights (curated sources 2x the tail) by per-source deterministic "
        "hash sampling — keep probability min(1, w*K/n_src) as an exact "
        "INTEGER threshold on md5(doc_id). The per-source counts are a "
        "tiny aggregate joined back broadcast; membership is a pure "
        "function of (doc_id, per-source count), so the mix is stable "
        "under re-runs and repartitioning, and nested budgets (K' < K) "
        "carve subsets of the same sample. This is the data-mixture "
        "rebalancing step (e.g. up-weighting curated sources) every "
        "multi-source training corpus build runs."
    ),
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_src"))
    w = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(wt)) for s, wt in sorted(_MIX_WEIGHTS.items())],
        F.lit(_MIX_DEFAULT_W),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")).cast("binary")),
                1, 15,
            ),
            16, 10,
        ).cast("bigint")
        % 10000
    )
    thresh = F.least(
        F.lit(10000),
        F.expr(f"CAST(w * {_MIX_K} * 10000 div n_src AS BIGINT)"),
    )
    kept = (
        d.join(F.broadcast(counts), "source")
        .withColumn("w", w)
        .withColumn("keep", F.when(u < thresh, 1).otherwise(0))
    )
    return kept.groupBy("source").agg(
        F.max("n_src").alias("n_total"),
        F.sum("keep").alias("n_kept"),
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 64 AS bucket,
             CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM documents),
    packed AS (
      SELECT doc_id, bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM toks)
    SELECT doc_id, bucket,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin_in_bucket,
           CAST((cum - n_tokens) % 2048 AS BIGINT) AS start_offset,
           n_tokens
    FROM packed
    """,
    doc=(
        "Sequence packing: assign documents to fixed-capacity (2048-token) "
        "training bins via a running token-count cumsum in md5-shuffled "
        "order — the standard pack-short-docs-into-context-windows step. "
        "Packing is inherently order-dependent, so the order is made "
        "deterministic (md5 of doc_id), and the corpus first hash-buckets "
        "64 ways so each bucket packs independently in parallel — one "
        "shuffle, 64-way parallel cumsum windows, no global sort. Bins "
        "overflow at bucket boundaries only (docs spanning a bin boundary "
        "start mid-bin; a strict no-split variant rounds cum up to the "
        "next bin before assignment — same plan shape)."
    ),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")).cast("binary")),
            1, 15,
        ),
        16, 10,
    ).cast("bigint")
    toks = d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).cast("bigint").alias("n_tokens"),
        (h % 64).alias("bucket"),
        h.alias("h"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return packed.select(
        "doc_id",
        "bucket",
        F.expr("(cum - n_tokens) div 2048").alias("bin_in_bucket"),
        (start % 2048).alias("start_offset"),
        "n_tokens",
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling (contrastive-training prep)
# ---------------------------------------------------------------------------

from ..functions.text import hash60 as _hash60  # noqa: E402
from ..functions.text import sql_hash60 as _sql_hash60  # noqa: E402

_NEG_K = 5
_NEG_QUERIES = 4


@register(
    "q_negative_sample",
    oracle=f"""
    WITH q AS (SELECT doc_id AS query_id, source AS q_source
               FROM documents WHERE doc_id < {_NEG_QUERIES}),
    c AS (
      SELECT q.query_id, d.doc_id,
             {_sql_hash60("CAST(q.query_id AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")} AS h
      FROM q JOIN documents d ON d.source <> q.q_source)
    SELECT query_id, neg_doc_id, rn FROM (
      SELECT query_id, doc_id AS neg_doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY h, doc_id) AS INTEGER) AS rn
      FROM c) WHERE rn <= {_NEG_K}
    """,
    doc=(
        "Deterministic negative sampling for contrastive training: per "
        "query document, 5 negatives drawn from OTHER sources, ranked by "
        "a per-(query, candidate) md5 hash — the draw is stable under "
        "re-runs, repartitioning, and corpus append-order changes, which "
        "rand()-based sampling is not. The tiny query set broadcasts "
        "against the corpus (the source<>source predicate rides the "
        "broadcast join); the per-query hash ranking is the only "
        "shuffle. Hard-negative mining composes on top: replace the "
        "hash order with an ANN-score order from sim_ann_pq_adc."
    ),
)
def q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    q = d.where(F.col("doc_id") < _NEG_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("source").alias("q_source")
    )
    cand = F.broadcast(q).join(d, d["source"] != q["q_source"]).select(
        "query_id",
        F.col("doc_id"),
        _hash60(
            F.concat(
                F.col("query_id").cast("string"), F.lit(":"), F.col("doc_id").cast("string")
            )
        ).alias("h"),
    )
    w = Window.partitionBy("query_id").orderBy("h", "doc_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _NEG_K)
        .select("query_id", F.col("doc_id").alias("neg_doc_id"), "rn")
    )


@register(
    "q_global_ids_scalable",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
             AS curriculum_id
    FROM documents
    """,
    doc=(
        "Scalable dense global-id assignment (curriculum ordering by "
        "length): range-partition on the sort key, rank WITHIN each "
        "partition, then add per-partition offsets computed from a "
        "32-row count table that joins back broadcast — no "
        "single-partition window (the naive Window.orderBy global rank "
        "funnels the corpus through ONE task) and no "
        "monotonically_increasing_id (whose values depend on partition "
        "layout and are neither dense nor stable). The result is "
        "IDENTICAL for any partition count/boundaries because the sort "
        "key is unique: boundary placement moves rows between offsets "
        "and local ranks in lockstep. The partitioned frame is pinned "
        "with an eager localCheckpoint so the counts branch and the "
        "local-rank branch provably read ONE materialized assignment — "
        "correctness must not hinge on ReuseExchange deduping the two "
        "instances of the range exchange (range boundaries are sampled "
        "per-exchange; with reuse disabled the branches could disagree)."
    ),
)
def q_global_ids_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    parts = (
        d.repartitionByRange(32, F.col("n_chars").desc(), F.col("doc_id"))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin ONE partition assignment for both branches
    )
    counts = parts.groupBy("__pid").agg(F.count("*").alias("__n"))
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__off")
    )
    wloc = Window.partitionBy("__pid").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        parts.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "curriculum_id",
            (F.col("__off") + F.row_number().over(wloc)).cast("bigint"),
        )
        .select("doc_id", "curriculum_id")
    )
