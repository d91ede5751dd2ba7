#!/usr/bin/env python
"""Measured skew-join experiment for SCALE.md.

Synthesizes a pathologically skewed fact table (60% of 50M rows share ONE
join key; the rest spread over 100k keys) joined against a 100k-row
dimension too large to broadcast (threshold forced to -1), and times three
strategies min-of-2:

  plain      AQE off  -> one sort-merge task owns the 30M-row hot key
  aqe_skew   AQE on   -> runtime skew-join split carves the hot partition
  salted     AQE off  -> explicit N_SALTS salting (operators/advanced.py)

Prints one JSON line. Deterministic input (keys from id arithmetic, no
rand in the data); the salted path's rand(seed=7) affects placement only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.operators.advanced import salted_join_count
from aws_logs_parquet_converter_spark.session import build_session

N_FACTS = 50_000_000
N_KEYS = 100_000


def main() -> None:
    spark = build_session(
        app_name="skew_experiment",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    facts = (
        spark.range(N_FACTS)
        .select(
            F.when(F.col("id") % 10 < 6, F.lit(0))
            .otherwise(F.col("id") % N_KEYS)
            .alias("k"),
        )
        .localCheckpoint()  # materialize once; timings exclude generation
    )
    dim = (
        spark.range(N_KEYS)
        .select(F.col("id").alias("dk"), (F.col("id") * 3).alias("attr"))
        .localCheckpoint()
    )

    def time_min2(fn):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    def plain():
        (
            facts.join(dim, facts["k"] == dim["dk"])
            .groupBy("dk")
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def salted():
        salted_join_count(facts, dim, "k", "dk").write.mode("overwrite").format(
            "noop"
        ).save()

    out = {}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["plain_smj_aqe_off"] = time_min2(plain)
    out["salted_aqe_off"] = time_min2(salted)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    out["plain_aqe_skew_split"] = time_min2(plain)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
