#!/usr/bin/env python
"""Decade growth probe for the MULTIMODAL near-dup family (VERDICT r5
task #5).

Image and audio near-dup share one join skeleton — band_near_dup_pairs:
64 perceptual-hash bits as 4 x 16-bit bands, candidates = pairs sharing
any band bucket, Hamming confirm. The decode/hash stages are
embarrassingly parallel Arrow batches (measured per-row elsewhere); the
SCALE question is the band-bucket JOIN, so this probe synthesizes the
hash frames directly — (name, b0..b3) — at 1x/10x/100x a 2k base:

* **uniform** — xxhash64-derived band values, ~10% planted near-dups
  (one band copied from the base, one low bit flipped in another).
  A 16-bit bucket over n rows holds ~n/65536 rows, so candidate pairs
  carry an irreducible ~4 * C(n,2)/65536 ~ n^2/2^17 RANDOM-collision
  term: expected quadratic once n approaches 2^16 — the fixed RP-LSH
  bits class, except this hash CANNOT widen (64 bits / pigeonhole).
* **dark** — uniform plus 5% of rows sharing ONE constant band value
  (black frames / digital silence: the real-corpus hot-bucket shape).
  Expected: the hot bucket alone contributes C(0.05n, 2) pairs.

Measured candidates per decade (sum over buckets of C(size,2) — a cheap
aggregate, nothing materializes) for uncapped vs max_bucket_size=64
(the dedup_levenshtein_capped remedy), plus min-of-2 full-operator walls
at the decades where the uncapped join is still tractable. Results in
SCALE.md "Multimodal near-dup decade probe".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.session import build_session
from scale_growth_synth import time_min_of

N_BASE = 2_000
DECADES = [
    int(x) for x in os.environ.get("SCALE_SYNTH_DECADES", "1,10,100").split(",")
]
CAP = 64
DARK_MOD = 20  # 5% of rows land in the hot bucket
#: full uncapped joins stop here (candidate count predicts the rest)
UNCAPPED_FULL_RUN_MAX_N = 20_000


def synth_hashes(spark: SparkSession, n: int, dark: bool) -> DataFrame:
    d = spark.range(n).withColumn(
        "base", F.when(F.col("id") % 10 == 1, F.col("id") - 1).otherwise(F.col("id"))
    )
    cols = []
    for i in range(4):
        v = F.pmod(F.xxhash64(F.col("base") * 10 + i), F.lit(65536))
        if i == 3:  # planted near-dups flip one low bit of the last band
            v = F.when(
                F.col("id") % 10 == 1, v.bitwiseXOR(F.lit(1))
            ).otherwise(v)
        if dark and i == 0:  # black-frame pile-up: one constant band value
            v = F.when(F.col("id") % DARK_MOD == 0, F.lit(7)).otherwise(v)
        cols.append(v.cast("int").alias(f"b{i}"))
    return d.select(
        F.concat(F.lit("f"), F.col("id")).alias("name"), *cols
    )


def count_candidates(hashes: DataFrame, cap: int | None) -> int:
    bands = hashes.select(
        "name",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band_id", "band_val"),
    )
    sizes = bands.groupBy("band_id", "band_val").count()
    if cap is not None:
        sizes = sizes.where(F.col("count") <= cap)
    return int(
        sizes.agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)).collect()[0][0]
        or 0
    )


def main() -> None:
    spark = build_session(
        app_name="scale_growth_multimodal",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    from aws_logs_parquet_converter_spark.operators.multimodal import (
        band_near_dup_pairs,
    )

    results = []
    for d in DECADES:
        n = N_BASE * d
        for corpus in ("uniform", "dark"):
            h = synth_hashes(spark, n, dark=(corpus == "dark")).localCheckpoint()
            row: dict = {"decade": d, "n": n, "corpus": corpus}
            row["cand_uncapped"] = count_candidates(h, None)
            row["cand_capped"] = count_candidates(h, CAP)
            row["wall_capped"] = time_min_of(
                2, lambda: band_near_dup_pairs(h, max_bucket_size=CAP).count()
            )
            if n <= UNCAPPED_FULL_RUN_MAX_N:
                row["wall_uncapped"] = time_min_of(
                    2, lambda: band_near_dup_pairs(h).count()
                )
            results.append(row)
            print(json.dumps(row), flush=True)
    spark.stop()
    print(json.dumps({"probe": "multimodal_near_dup_decades", "rows": results}))


if __name__ == "__main__":
    main()
