#!/usr/bin/env python
"""Graph-family decade growth: x1/x10/x100 walls + wedge-volume audit.

The dedup/ANN and text families have measured growth slopes (SCALE.md);
the graph family (connected components, star components, pagerank,
triangles) did not. This tool synthesizes pair graphs IN SPARK at 1x /
10x / 100x and times each operator min-of-2 per decade, on two families:

* **block** — the healthy near-dup-graph regime: bounded components
  (blocks of 8: a chain plus skip edges, 6 triangles per block), so
  edges, triangles, and label-propagation rounds are all constant per
  block and totals grow LINEARLY with n. Any super-linear wall here is
  an implementation bug, not a data property.
* **hub** — the skew pathology: one node of degree n/10 (the template
  hub every real dup graph has) plus a spoke ring closing n/10 - 1
  triangles at the hub, over a block background. This family exists to
  expose wedge-enumeration strategies that let a hub keep its edges
  outgoing: orienting edges by NODE ID gives C(deg_hub, 2) wedges when
  the hub's id sorts low — quadratic in the hub degree — while true
  degree-ordering (Suri & Vassilvitskii, WWW'11) bounds wedge work by
  sum(min-degree-endpoint out-degrees squared).
* **chain** — the diameter pathology: one path of n nodes (diameter
  n-1). Min-label propagation needs diameter rounds, so it is SKIPPED
  here (it raises at its cap by design — returning split components
  silently is the bug the cap guards); connected_components_star must
  label it in O(log n) ROUNDS — the per-decade `rounds` field is the
  probe's point: +~3 rounds per decade, never 10x.

For each decade the probe prints wall clocks plus the ANALYTIC wedge
volumes under both orientations (computed from degree histograms, no
enumeration), so a blowup is attributable before it is felt.

Env: GRAPH_DECADES=1,10 (default 1,10,100), GRAPH_BASE_N (default 20000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.session import build_session

BASE_N = int(os.environ.get("GRAPH_BASE_N", "20000"))
DECADES = [int(x) for x in os.environ.get("GRAPH_DECADES", "1,10,100").split(",")]
BLOCK = 8


def block_graph(spark: SparkSession, n: int) -> DataFrame:
    """Blocks of 8: chain (i, i+1) + skip (i, i+2) within each block —
    bounded components, 6 triangles/block, everything linear in n."""
    ids = spark.range(n)
    chain = ids.where((F.col("id") % BLOCK) < BLOCK - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    skip = ids.where((F.col("id") % BLOCK) < BLOCK - 2).select(
        F.col("id").alias("doc_a"), (F.col("id") + 2).alias("doc_b")
    )
    return chain.unionByName(skip)


def chain_graph(spark: SparkSession, n: int) -> DataFrame:
    """One path of n nodes — diameter n-1, the adversarial regime for
    min-label propagation (rounds = diameter; it now RAISES at its cap
    instead of returning split components) and the case
    connected_components_star exists for: its round count is the number
    of HALVINGS, so it grows by ~constant per decade (log n), not 10x."""
    return spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )


def hub_graph(spark: SparkSession, n: int) -> DataFrame:
    """Node 0 spokes to 1..n/10 (degree n/10), consecutive spokes ring
    (closing n/10 - 1 triangles at the hub), block background elsewhere."""
    d = n // 10
    spokes = spark.range(1, d + 1)
    hub = spokes.select(
        F.lit(0).cast("bigint").alias("doc_a"), F.col("id").alias("doc_b")
    )
    ring = spark.range(1, d).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    background = (
        spark.range(d + 1, n)
        .where((F.col("id") % BLOCK) < BLOCK - 1)
        .where(F.col("id") + 1 < n)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    return hub.unionByName(ring).unionByName(background)


def wedge_volumes(edges: DataFrame) -> dict[str, int]:
    """Analytic wedge counts under id-orientation vs degree-orientation:
    sum over nodes of C(out_degree, 2) for each rule, from the degree
    table only (no wedge enumeration)."""
    und = (
        edges.select("doc_a", "doc_b")
        .unionByName(
            edges.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .where(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    deg = und.groupBy("doc_a").agg(F.count("*").alias("deg"))
    d2 = deg.select(F.col("doc_a").alias("doc_b"), F.col("deg").alias("degb"))
    ann = und.join(deg, "doc_a").join(d2, "doc_b")
    out = {}
    for key, cond in [
        ("wedges_id_oriented", F.col("doc_a") < F.col("doc_b")),
        (
            "wedges_deg_oriented",
            (F.col("deg") < F.col("degb"))
            | ((F.col("deg") == F.col("degb")) & (F.col("doc_a") < F.col("doc_b"))),
        ),
    ]:
        od = ann.where(cond).groupBy("doc_a").agg(F.count("*").alias("o"))
        out[key] = int(
            od.agg(
                F.sum(F.col("o") * (F.col("o") - 1) / 2).cast("bigint").alias("w")
            ).collect()[0].w
        )
    return out


def main() -> None:
    spark = build_session(
        app_name="scale_growth_graph",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    from aws_logs_parquet_converter_spark.operators.graph import (
        connected_components,
        connected_components_star,
        pagerank,
        triangle_count,
    )

    rounds_seen: dict[str, int] = {}

    def with_rounds(fn, key):
        def run(e):
            st: dict = {}
            out = fn(e, stats=st)
            rounds_seen[key] = st.get("rounds")
            return out

        return run

    ops = {
        "components": with_rounds(
            lambda e, stats: connected_components(e, stats=stats),
            "components",
        ),
        "components_star": with_rounds(
            lambda e, stats: connected_components_star(e, stats=stats),
            "components_star",
        ),
        "pagerank3": lambda e: pagerank(e),
        "triangles": lambda e: triangle_count(e),
    }
    skip_ops = set(
        x for x in os.environ.get("GRAPH_SKIP_OPS", "").split(",") if x
    )
    #: chain diameter exceeds propagation's cap BY DESIGN — only the
    #: log-round variant is expected to finish (wedge audit is moot on a
    #: triangle-free path, so triangles still runs as a degenerate check)
    family_skips = {"chain": {"components"}}

    families = [
        ("block", block_graph),
        ("hub", hub_graph),
        ("chain", chain_graph),
    ]
    only = os.environ.get("GRAPH_FAMILIES")
    if only:
        families = [f for f in families if f[0] in only.split(",")]
    for family, gen in families:
        for dec in DECADES:
            n = BASE_N * dec
            edges = gen(spark, n).localCheckpoint(eager=True)
            row = {
                "family": family,
                "decade": dec,
                "n_nodes": n,
                "n_edges": edges.count(),
            }
            row.update(wedge_volumes(edges))
            walls: dict[str, float] = {}
            for name, fn in ops.items():
                if name in skip_ops or name in family_skips.get(family, ()):
                    continue
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = fn(edges)
                    if name == "triangles":
                        row["n_triangles"] = int(
                            (out.agg(F.sum("n_triangles").alias("s"))
                             .collect()[0].s or 0) // 3
                        )
                    else:
                        out.write.mode("overwrite").format("noop").save()
                    w = round(time.perf_counter() - t0, 2)
                    best = w if best is None or w < best else best
                walls[name] = best
            row["wall_s"] = walls
            row["rounds"] = {
                k: v for k, v in rounds_seen.items() if v is not None
            }
            rounds_seen.clear()
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
