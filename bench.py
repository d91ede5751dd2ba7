#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries are materialized with the `noop` writer so the full plan executes
(count() alone would let Catalyst prune projections).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_logs_parquet_converter_spark import operators
from aws_logs_parquet_converter_spark.session import build_session

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_volume",
    "q_window_topn_per_group",
    "q_window_running_total",
    "q_events_daily",
    "q_events_sessionize",
    "q_top_orders",
    "q_asof_join",
    "q_left_join_agg",
    "q_percentiles",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_stats",
    "sim_topk_bruteforce",
    "mm_binary_features",
]

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_session(
        app_name="bench",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    queries = operators.all_queries()
    # JVM/codegen warmup at the smallest SF so timings measure the engine,
    # not first-query classloading.
    for name in HEADLINE:
        queries[name](spark, WARMUP_SF_DIR).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()  # drop warmup caches before timing

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
