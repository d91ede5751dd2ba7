"""Retrieval-quality pins for the RP-LSH ANN path (VERDICT r1 #9).

Two guarantees, so a future banding change (tables/bits) cannot silently
degrade retrieval:

1. **Near-dup band (the operator's purpose):** planted near-duplicates at
   cos ~0.9 — theory for 8 tables x 8 sign-bits predicts ~93% collision
   probability at theta = 25.8 deg — must be retrieved with recall >= 0.80.
2. **Mid-band honesty:** corpus recall at cos >= 0.3 is LOW by design
   (measured 0.148 at sf0.01; one 8-bit table catches ~1.6%, eight catch
   ~6x that). The test pins it >= 0.10 AND <= 0.40: if it drifts above,
   someone widened the buckets and the candidate volume is no longer
   linear; below, someone tightened them and the near-dup band suffers.
   Mid-band retrieval belongs to the IVF path (sim_topk_ivf_label).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.catalog import load_table
from aws_logs_parquet_converter_spark.operators.similarity import (
    dot,
    rplsh_pairs,
    spread_input,
)

SF = "/root/testdata/sf0.01"


def _truth_pairs(spark, em, threshold):
    base = spread_input(em).select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"), F.col("nrm").alias("nb")
    )
    rows = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .where(dot(F.col("va"), F.col("vb")) >= threshold * F.col("na") * F.col("nb"))
        .select("vec_a", "vec_b")
        .collect()
    )
    return {(r.vec_a, r.vec_b) for r in rows}


def test_planted_near_dup_recall(spark):
    """Plant 60 near-duplicates at cos ~0.9 of real corpus vectors; the LSH
    must find >= 80% of the (original, clone) pairs at threshold 0.8."""
    em = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    originals = em.where(F.col("vec_id") < 60).collect()
    rng = np.random.RandomState(1234)
    planted = []
    for r in originals:
        v = np.asarray(r.embedding, dtype=np.float64)
        g = rng.randn(v.shape[0])
        g -= g.dot(v) / v.dot(v) * v  # orthogonalize -> cos is exactly planned
        g *= (0.48 * np.linalg.norm(v)) / np.linalg.norm(g)  # tan(theta)=0.48
        w = v + g  # cos(v, w) = 1/sqrt(1+0.48^2) ~ 0.902
        planted.append((100_000 + r.vec_id, [float(x) for x in w]))
    clones = spark.createDataFrame(planted, "vec_id bigint, embedding array<double>")
    corpus = em.select("vec_id", F.col("embedding").cast("array<double>")).unionByName(
        clones
    )

    # bits pinned to the fixture-scale 8 the registered query uses; the
    # auto-sizing path (bits=None -> rplsh_bits) is covered by
    # test_autosized_bits_keep_planted_recall below
    got = {
        (r.vec_a, r.vec_b)
        for r in rplsh_pairs(corpus, threshold=0.8, bits=8).collect()
    }
    want = {(r.vec_id, 100_000 + r.vec_id) for r in originals}
    recall = len(got & want) / len(want)
    assert recall >= 0.80, f"planted near-dup recall degraded: {recall:.3f}"


def test_autosized_bits_keep_planted_recall(spark):
    """The corpus-sized bucket width (bits=None -> rplsh_bits) exists to
    keep candidate volume linear WITHOUT losing the near-dup band: tight
    near-dups (cos ~0.999 — the dedup-miner target) must still be found
    at the wider auto width."""
    from aws_logs_parquet_converter_spark.operators.similarity import rplsh_bits

    em = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    originals = em.where(F.col("vec_id") < 40).collect()
    rng = np.random.RandomState(77)
    planted = []
    for r in originals:
        v = np.asarray(r.embedding, dtype=np.float64)
        g = rng.randn(v.shape[0])
        g -= g.dot(v) / v.dot(v) * v
        g *= (0.04 * np.linalg.norm(v)) / np.linalg.norm(g)  # cos ~0.9992
        planted.append((100_000 + r.vec_id, [float(x) for x in v + g]))
    clones = spark.createDataFrame(planted, "vec_id bigint, embedding array<double>")
    corpus = em.select("vec_id", F.col("embedding").cast("array<double>")).unionByName(
        clones
    )
    assert rplsh_bits(540) > 8  # the auto width actually widens here
    got = {(r.vec_a, r.vec_b) for r in rplsh_pairs(corpus, threshold=0.99).collect()}
    want = {(r.vec_id, 100_000 + r.vec_id) for r in originals}
    recall = len(got & want) / len(want)
    assert recall >= 0.95, f"auto-width near-dup recall degraded: {recall:.3f}"


def test_midband_recall_window(spark):
    em = load_table(spark, SF, "embeddings")
    truth = _truth_pairs(spark, em, 0.3)
    assert truth, "fixture drift: no cos>=0.3 pairs at sf0.01"
    got = {(r.vec_a, r.vec_b) for r in rplsh_pairs(em, threshold=0.3, bits=8).collect()}
    recall = len(got & truth) / len(truth)
    assert 0.10 <= recall <= 0.40, (
        f"mid-band recall {recall:.3f} left the documented window "
        "(0.148 measured at sf0.01) — banding geometry changed"
    )
    # every returned pair must be a TRUE pair: the exact-confirm stage
    # guarantees precision 1.0 regardless of banding
    assert got <= truth


def test_pq_adc_recall_floor(spark):
    """PQ-ADC top-5 vs exact brute-force top-5 for the same queries.

    Quantization loses information by design; the pin is that the PQ
    ranking still recovers a substantial share of the true neighbors
    (and deterministically — the parity suite pins exactness of the
    ranking itself, this pins retrieval QUALITY against the exact path).
    """
    from aws_logs_parquet_converter_spark.operators.similarity import (
        brute_force_topk,
        pq_adc_topk,
        pq_train_codebooks,
    )

    em = load_table(spark, SF, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(em, em.where(F.col("vec_id") < 8), k=5).collect()
    }
    cb = pq_train_codebooks(em, k=16, n_iters=3)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(em, n_queries=8, k=5, codebook=cb).collect()
    }
    recall = len(exact & approx) / len(exact)
    # trained 16-codeword codebooks: 0.825 measured at sf0.01, shortlist 100
    # (label-slice stand-in measured 0.75 on the same fixture)
    assert recall >= 0.8, f"PQ-ADC recall@5 degraded: {recall:.3f}"

    # the stand-in codebook path (pq_codebook) must stay a working, lower-
    # recall baseline: measured 0.75 at shortlist=100
    approx_standin = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(em, n_queries=8, k=5).collect()
    }
    recall_standin = len(exact & approx_standin) / len(exact)
    assert recall_standin >= 0.7, f"stand-in recall degraded: {recall_standin:.3f}"


def test_ivf_pq_planted_near_dup_and_nprobe_dial(spark):
    """IVF-PQ retrieval quality, pinned honestly for both regimes.

    1. **Planted near-dups (the property that matters):** queries that
       ARE tiny perturbations of corpus vectors land in their source's
       coarse cell (or its nprobe-neighbor) and must retrieve the source
       in the top-5 — near-identical vectors are exactly what a dedup/
       RAG pipeline needs found.
    2. **nprobe is the recall/cost dial:** on this near-structureless
       synthetic fixture, corpus-wide recall tracks probe COVERAGE
       (nprobe/nlist ~ 9% at nprobe=2) — that is the IVF trade, not a
       bug. The pin is monotonicity (more probes never hurt) plus loose
       floors, so a banding regression still trips it.
    """
    from aws_logs_parquet_converter_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_topk,
    )

    em = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # queries 0..7 = vectors 100..107 nudged by +0.01 per dim (cosine to
    # the source ~0.999; scaling alone would be cosine-invariant)
    planted = em.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 108)).select(
        (F.col("vec_id") - 100).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    corpus = em.where(F.col("vec_id") >= 8).unionByName(planted)
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_topk(corpus, n_queries=8, k=5).collect()
    }
    found = sum((i, 100 + i) in got for i in range(8))
    assert found >= 7, f"planted near-dup recall degraded: {found}/8"

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(em, em.where(F.col("vec_id") < 8), k=5).collect()
    }
    recalls = []
    for nprobe in (1, 2, 4):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_pq_topk(em, n_queries=8, k=5, nprobe=nprobe).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    # measured at sf0.01 (n=500, nlist=23): 0.125 / 0.25 / 0.375
    assert recalls == sorted(recalls), f"nprobe dial not monotonic: {recalls}"
    assert recalls[1] >= 0.15 and recalls[2] >= 0.3, f"recall floors: {recalls}"


def test_pagerank_star_graph(spark):
    """Hub of a star graph must out-rank every leaf; ranks are exact ints."""
    from aws_logs_parquet_converter_spark.operators.graph import PR_SCALE, pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "doc_a bigint, doc_b bigint"
    )
    ranks = {r.node: r.pr_e12 for r in pagerank(edges, n_iters=3).collect()}
    assert set(ranks) == set(range(9))
    hub, leaves = ranks[0], [ranks[i] for i in range(1, 9)]
    assert len(set(leaves)) == 1  # symmetry: all leaves identical (exact ints)
    assert hub > leaves[0] * 3  # 8 contributions vs 1/8th of the hub's
    assert all(isinstance(v, int) for v in ranks.values())
    # re-run is bit-identical (integer arithmetic end-to-end)
    again = {r.node: r.pr_e12 for r in pagerank(edges, n_iters=3).collect()}
    assert again == ranks
