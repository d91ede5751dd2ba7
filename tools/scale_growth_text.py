#!/usr/bin/env python
"""Decade growth probe for the TEXT family (VERDICT r4 task #5).

The r4 probe measured the dedup/ANN trio linear through 100x; the text
family (token aggregation + the prefix/inverted-index blocked pair ops)
had no probe. Same harness: synthesize documents at 1x/10x/100x the sf0.1
row count (5k -> 500k docs) in Spark, time each op min-of-2 per decade,
and count the CANDIDATE volume its blocking produces — the quantity whose
growth decides 100-TB viability (the RP-LSH saturation class of bug).

Two corpora per decade:

* **uniform** — synth_documents with the near-dup variant token at the
  LAST position (so levenshtein's first-4-token prefix block actually
  captures the planted pairs; minhash-class ops are position-blind).
  Expected: everything linear.
* **boilerplate** — 20%% of docs share one templated 4-token preamble
  (license-header pathology). Expected: levenshtein's prefix block goes
  QUADRATIC in the boilerplate subset — measured, then re-measured with
  the max_block_size cap that restores linearity (the documented recall
  trade, dedup.py: levenshtein_pairs).

Ops: text_top_terms, text_doc_freq (Zipf-bounded token aggregates),
dedup_ngram_jaccard (inverted-index equi-join; candidates = sum over
shingles of C(df,2)), dedup_levenshtein (prefix block; candidates = sum
over blocks of C(B,2)).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark import operators
from aws_logs_parquet_converter_spark.session import build_session
from scale_growth_synth import (
    N_DOCS_BASE,
    TOKENS_PER_DOC,
    synth_documents,
    time_min_of,
)

DECADES = [
    int(x) for x in os.environ.get("SCALE_SYNTH_DECADES", "1,10,100").split(",")
]
BOILER_MOD, BOILER_RES = 5, 3  # docs with id%5==3 carry the preamble
# (residue 3 never hits a planted base (ids ending 0) or dup (ending 1),
# so the uniform near-dup pairs survive the boilerplate overlay)
LEV_BLOCK_CAP = 64


def synth_boilerplate_documents(spark: SparkSession, n: int) -> DataFrame:
    """Uniform corpus, but every 5th doc's first 4 tokens are replaced by
    one shared templated preamble — the license-header pathology that
    makes any fixed-prefix block key a hot key."""
    base = synth_documents(spark, n, variant_pos=TOKENS_PER_DOC - 1)
    pre = "lorem ipsum dolor sit"
    rest = F.array_join(
        F.slice(F.split(F.col("text"), " "), 5, TOKENS_PER_DOC), " "
    )
    return base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % BOILER_MOD == BOILER_RES,
            F.concat(F.lit(pre + " "), rest),
        ).otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast("bigint"))


def _noop(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def lev_candidates(docs: DataFrame) -> int:
    """Candidate volume of levenshtein's prefix blocking: sum_B C(B,2)."""
    from aws_logs_parquet_converter_spark.functions.text import tokens

    key = F.md5(
        F.array_join(F.slice(tokens(F.col("text")), 1, 4), " ").cast("binary")
    )
    return (
        docs.select(key.alias("k"))
        .groupBy("k")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c"))
        .collect()[0]
        .c
    )


def jaccard_candidates(docs: DataFrame) -> int:
    """Candidate volume of the shingle inverted index: sum_sh C(df,2)."""
    from aws_logs_parquet_converter_spark.operators.dedup import shingles

    return (
        shingles(docs)
        .groupBy("shingle")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c"))
        .collect()[0]
        .c
    )


def main() -> None:
    spark = build_session(
        app_name="scale_growth_text",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    from aws_logs_parquet_converter_spark.operators.dedup import levenshtein_pairs

    queries = operators.all_queries()
    ops = [
        "text_top_terms",
        "text_doc_freq",
        "dedup_ngram_jaccard",
        "dedup_levenshtein",
    ]
    for q in ops:  # JVM/codegen warmup on the real smallest fixture
        _noop(queries[q](spark, "/root/testdata/sf0.001"))

    wall: dict[str, dict] = {}
    cands: dict[str, dict] = {}
    root = tempfile.mkdtemp(prefix="scale_text_")
    try:
        for dec in DECADES:
            n = N_DOCS_BASE * dec
            key = f"x{dec}"
            sf_dir = os.path.join(root, key)
            synth_documents(spark, n, variant_pos=TOKENS_PER_DOC - 1).write.mode(
                "overwrite"
            ).parquet(f"{sf_dir}/documents.parquet")
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            for q in ops:
                wall.setdefault(q, {})[key] = time_min_of(
                    2, lambda: _noop(queries[q](spark, sf_dir))
                )
                spark.catalog.clearCache()
            cands.setdefault("levenshtein_prefix_block", {})[key] = int(
                lev_candidates(docs)
            )
            cands.setdefault("ngram_inverted_index", {})[key] = int(
                jaccard_candidates(docs)
            )

            # boilerplate pathology: shared 4-token preamble on 20% of docs
            bdir = os.path.join(root, f"boiler_{key}")
            synth_boilerplate_documents(spark, n).write.mode("overwrite").parquet(
                f"{bdir}/documents.parquet"
            )
            bdocs = spark.read.parquet(f"{bdir}/documents.parquet")
            cands.setdefault("levenshtein_boilerplate", {})[key] = int(
                lev_candidates(bdocs)
            )
            wall.setdefault("dedup_levenshtein_boiler_capped", {})[key] = (
                time_min_of(
                    2,
                    lambda: _noop(
                        levenshtein_pairs(bdocs, max_block_size=LEV_BLOCK_CAP)
                    ),
                )
            )
            # uncapped boilerplate wall only while the quadratic is
            # affordable: already ~0.5M O(len^2) confirms at x1; x10 is
            # 100x that (~50M). The candidates counter above still
            # measures the quadratic at every decade.
            if n <= N_DOCS_BASE:
                wall.setdefault("dedup_levenshtein_boiler_uncapped", {})[key] = (
                    time_min_of(2, lambda: _noop(levenshtein_pairs(bdocs)))
                )
            else:
                wall.setdefault("dedup_levenshtein_boiler_uncapped", {})[key] = (
                    "capped(quadratic measured at x1; candidate counts "
                    "above show the growth)"
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "rows": {f"x{d}": N_DOCS_BASE * d for d in DECADES},
                "wall_sec_min_of_2": wall,
                "candidates": cands,
                "lev_block_cap": LEV_BLOCK_CAP,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
