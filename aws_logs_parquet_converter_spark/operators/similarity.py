"""Similarity search over the ``embeddings`` table (64-dim float vectors).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against a single pass over the corpus; per-row cost is one fused
zip_with/aggregate dot product in the JVM. The LSH-bucketed scale path
(IVF-style candidate pruning) is layered on top in later rounds.

Determinism: cosine is computed in DOUBLE with left-to-right summation in both
engines; results expose only (query_id, neighbor_id, rank) — ranks are robust
to sub-ULP float divergence, raw scores are not part of the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


def dot(a: Column, b: Column) -> Column:
    """Deterministic (sequential) double-precision dot product of two arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (exclude self).

    ``queries`` must be small enough to broadcast; corpus side streams.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("e_vec")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("e_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "rn")
    )


@register(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.embedding, e.embedding)
             / (sqrt(list_dot_product(q.embedding, q.embedding))
                * sqrt(list_dot_product(e.embedding, e.embedding))) AS cos
      FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, rn FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
    doc="Brute-force cosine top-5 for query vectors vec_id<5 (ranks only).",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(em, em.where(F.col("vec_id") < 5), k=5)
