"""Physical-plan audits: the optimizations we rely on at 100 TB must actually
appear in the executed plan — filter/column pushdown into the parquet scan,
broadcast joins for dimension tables, no accidental cartesian products."""

import re

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.operators import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_and_column_pushdown(spark):
    plan = _plan(spark, "q01_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # only the 7 needed columns are read (no l_orderkey/l_partkey/...)
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    assert "l_quantity" in scan and "l_shipdate" in scan
    # the shipdate predicate reaches the scan
    assert "l_shipdate" in plan.split("DataFilters")[1][:200]


def test_q05_broadcasts_all_dimensions(spark):
    plan = _plan(spark, "q05_region_volume")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q03_broadcasts_customer(spark):
    plan = _plan(spark, "q03_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_top_orders_is_take_ordered(spark):
    plan = _plan(spark, "q_top_orders")
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"\bSort\b.*global=true", plan)


def test_parse_path_has_no_python_and_no_shuffle(spark, tmp_path):
    from aws_logs_parquet_converter_spark.sources.generator import write_log_files
    from aws_logs_parquet_converter_spark.sources.logs import read_s3_access_logs

    write_log_files(str(tmp_path), n_lines=100, n_files=1, seed=1)
    df = read_s3_access_logs(spark, str(tmp_path) + "/*.txt")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # whole parse is native expressions: no Python eval, no exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in _plan(spark, "q_semi_join")
    assert "LeftAnti" in _plan(spark, "q_anti_join")


def test_asof_join_is_union_window_not_range_join(spark):
    """As-of join must be the union+window merge: no join node at all, and
    only two shuffles (orders pre-agg + window partitioning)."""
    plan = _plan(spark, "q_asof_join")
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_not_in_is_null_aware_anti_join(spark):
    plan = _plan(spark, "q_not_in_subquery")
    # BroadcastHashJoin ..., LeftAnti, BuildRight, true  <- trailing flag is
    # isNullAwareAntiJoin
    assert re.search(r"LeftAnti, BuildRight, true", plan)


def test_exists_correlated_plans_semi_and_anti(spark):
    plan = _plan(spark, "q_exists_correlated")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_full_outer_join_is_sort_merge(spark):
    # full outer cannot broadcast; must be a shuffle join, never a cartesian
    plan = _plan(spark, "q_full_outer_join")
    assert "SortMergeJoin" in plan and "FullOuter" in plan


def test_pivot_plans_pivotfirst_aggregate(spark):
    # explicit pivot values -> pivotfirst aggregate, two shuffles
    # (pre-agg on (day, type), then pivot by day) and no separate
    # distinct-values job before planning
    plan = _plan(spark, "q_pivot_events")
    assert "pivotfirst" in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketing both sides by the join key at write time eliminates the
    query-time shuffle entirely — the core fact-fact join strategy at 100 TB."""
    from aws_logs_parquet_converter_spark.catalog import load_table
    from aws_logs_parquet_converter_spark.plans.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # zero shuffles: bucketed scan on both sides
        # and the answer is right
        expected = (
            load_table(spark, SF, "orders")
            .join(
                load_table(spark, SF, "lineitem"),
                F.expr("o_orderkey = l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_q06_pushes_all_predicates_to_scan(spark):
    from aws_logs_parquet_converter_spark.operators.relational import q06_revenue_delta

    plan = q06_revenue_delta(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in plan.split("PushedFilters")[1][:400], col
    # projection pruned to the four referenced columns
    assert "l_extendedprice" in plan.split("ReadSchema")[1][:300]
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:300]


def test_zorder_clusters_both_dimensions(spark):
    from pyspark.sql import functions as F

    from aws_logs_parquet_converter_spark.plans.zorder import quantize, zorder_key

    rows = [(b, t) for b in range(64) for t in range(64)]
    df = spark.createDataFrame(rows, ["bucket", "t"])
    n_files = 16

    def avg_span(d, col):
        return (
            d.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .collect()[0][0]
        )

    linear = df.repartitionByRange(n_files, F.col("t"))
    zk = zorder_key(quantize("bucket", 0, 63, 6), quantize("t", 0, 63, 6), bits=6)
    z = df.withColumn("zk", zk).repartitionByRange(n_files, F.col("zk"))

    # time-sorted layout: every file spans (almost) all buckets
    assert avg_span(linear, "bucket") > 50
    # z-order layout: each file covers a small tile in BOTH dimensions
    assert avg_span(z, "bucket") <= 24
    assert avg_span(z, "t") <= 24


def test_zorder_key_is_monotone_per_dimension(spark):
    from pyspark.sql import functions as F

    from aws_logs_parquet_converter_spark.plans.zorder import zorder_key

    df = spark.range(32).select(F.col("id").cast("bigint").alias("x"))
    keys = [
        r[0]
        for r in df.select(zorder_key(F.col("x"), F.lit(0).cast("bigint"), bits=6))
        .orderBy("x")
        .collect()
    ]
    assert keys == sorted(keys)  # fixing one dim, key is monotone in the other


def test_q04_exists_plans_left_semi_join(spark):
    plan = _plan(spark, "q04_order_priority")
    assert "LeftSemi" in plan
    # orders-side date filter must reach the parquet scan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_q14_q19_broadcast_part(spark):
    for name in ("q14_promo_revenue", "q19_disjunctive_join"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_q10_q18_top_k_is_take_ordered(spark):
    for name in ("q10_returned_revenue", "q18_large_volume_customers"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        # lineitem-side filters (returnflag / none) must not force extra joins
        assert "CartesianProduct" not in plan, name


def test_contamination_benchmark_side_broadcasts(spark):
    plan = _plan(spark, "dedup_contamination")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_funnel_is_two_aggregates_no_join(spark):
    plan = _plan(spark, "q_events_funnel")
    assert "Join" not in plan  # no per-stage self-joins
    assert plan.count("HashAggregate") >= 2


def test_lateral_topk_decorrelates(spark):
    plan = _plan(spark, "q_lateral_topk")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivf_assign_broadcasts_centroids(spark):
    plan = _plan(spark, "sim_ivf_assign")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_text_repetition_has_no_key_shuffle(spark):
    # fully row-level (sort+fold per doc): no hash shuffle, no aggregate.
    # (spread_input's round-robin spread of the single-row-group testdata
    # parquet is allowed — it's data-independent and disappears at scale.)
    plan = _plan(spark, "text_repetition")
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan


def test_partitioned_join_uses_dynamic_partition_pruning(spark, tmp_path):
    """Partition-pruning through a join: filtering the dim side prunes the
    partitioned fact scan at RUNTIME (dynamicpruningexpression in the scan's
    PartitionFilters). At 100 TB this is what keeps 'join logs to a filtered
    dim' from scanning every date/priority directory."""
    from aws_logs_parquet_converter_spark.catalog import load_table

    dest = str(tmp_path / "orders_by_priority")
    load_table(spark, SF, "orders").write.partitionBy("o_orderpriority").parquet(dest)
    fact = spark.read.parquet(dest)
    dim = spark.createDataFrame(
        [("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop")],
        "p string, tag string",
    )
    joined = fact.join(dim.where(F.col("tag") == "keep"), fact.o_orderpriority == dim.p)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    expected = (
        load_table(spark, SF, "orders").where(F.col("o_orderpriority") == "1-URGENT").count()
    )
    assert joined.count() == expected


def test_aqe_splits_skewed_join_at_runtime(spark):
    """AQE skew-join handling actually fires: a hot key (75% of the fact
    table) gets its shuffle partition split at runtime — `skew=true` on the
    SortMergeJoin and a `skewed` AQEShuffleRead in the FINAL adaptive plan.
    This is the default-on safety net for key skew at 100 TB; explicit
    salting (q_salted_skew_join) remains for single-key hotspots AQE can't
    split (e.g. when the join's output partitioning is reused by a same-key
    aggregate, where splitting is suppressed unless forceOptimizeSkewedJoin)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(200_000).select(
            F.when(F.col("id") < 150_000, F.lit(7)).otherwise(F.col("id") % 97).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("attr")
        )
        j = fact.join(dim, "k")
        assert j.count() == 200_000
        j.collect()  # materialize the adaptive plan for THIS query object
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan.splitlines()[0]
        assert "skew=true" in plan
        assert "AQEShuffleRead coalesced and skewed" in plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_nested_schema_pruning_reaches_scan(spark, tmp_path):
    """Selecting one struct field prunes the OTHER fields out of the parquet
    ReadSchema — nested column pruning, the struct-typed analog of column
    pruning. Matters once multimodal metadata rides in struct columns: a
    query touching meta.lang must not deserialize meta.source or the
    payload stats at 100 TB."""
    from aws_logs_parquet_converter_spark.catalog import load_table

    dest = str(tmp_path / "docs_nested")
    load_table(spark, SF, "documents").select(
        "doc_id",
        F.struct("lang", "source", F.length("text").alias("n_chars")).alias("meta"),
    ).write.parquet(dest)
    df = spark.read.parquet(dest).select("doc_id", F.col("meta.lang").alias("lang"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" in read_schema
    assert "source" not in read_schema and "n_chars" not in read_schema


def test_q15_scans_lineitem_once(spark):
    """Q15's max-vs-self is a window over the aggregated rows, not a second
    aggregate subtree: the fact table is scanned ONCE (a separate agg(max)
    subtree prunes differently, defeats ReuseExchange, and re-scans
    lineitem — at 100 TB that is a second full pass of the fact table)."""
    plan = _plan(spark, "q15_top_supplier")
    li_scans = [
        l for l in plan.splitlines() if "FileScan parquet" in l and "lineitem" in l
    ]
    assert len(li_scans) == 1


def test_gap_fill_reads_hourly_aggregate_from_cache(spark):
    """Both consumers of the hourly aggregate (spine min/max + probe side)
    hit the cache (InMemoryTableScan) instead of re-scanning raw events —
    column pruning rewrites the aggregate differently per branch, so
    ReuseExchange alone cannot deduplicate this shape."""
    df = all_queries()["q_gap_fill_hourly"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_schema_evolution_merge_read(spark, tmp_path):
    """Parquet schema evolution: day-2 files add a column; mergeSchema reads
    both generations with NULL backfill, and a query touching only original
    columns still prunes to them (ReadSchema). This is the contract that
    lets a year of compacted log partitions survive a format addition
    (e.g. the reference's acl_required column arriving mid-history)."""
    from aws_logs_parquet_converter_spark.catalog import load_table

    dest = str(tmp_path / "evolving")
    o = load_table(spark, SF, "orders")
    o.select("o_orderkey", "o_totalprice").write.parquet(dest + "/day=2024-01-01")
    o.select(
        "o_orderkey", "o_totalprice", F.lit("web").alias("channel")
    ).write.parquet(dest + "/day=2024-01-02")

    df = spark.read.option("mergeSchema", "true").parquet(dest)
    assert set(df.columns) == {"o_orderkey", "o_totalprice", "channel", "day"}
    n = o.count()
    assert df.count() == 2 * n
    assert df.where(F.col("channel").isNull()).count() == n  # old gen backfills NULL

    pruned = df.select("o_orderkey").where(F.col("o_orderkey") > 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "channel" not in read_schema


def test_banded_range_join_avoids_nested_loop(spark):
    """The banded range join plans a HASH join on the band key (shuffled,
    AQE-splittable) — not the BroadcastNestedLoopJoin of the direct
    band-predicate form, which requires one side in memory and compares
    every row pair."""
    plan = _plan(spark, "q_range_join_banded")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_incremental_minhash_reads_index_not_corpus(spark):
    """The 100-TB claim of dedup_incremental_minhash in plan form: the only
    `documents` scan carries the pushed batch filter (doc_id >= 400), so the
    corpus text is never re-read; the corpus enters only via the persisted
    parquet band index (signatures + bands)."""
    from aws_logs_parquet_converter_spark.operators.dedup import INCR_SPLIT

    plan = _plan(spark, "dedup_incremental_minhash")
    doc_scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "documents" in ln
    ]
    assert doc_scans, "expected a pushed-down batch scan of documents"
    for ln in doc_scans:
        assert f"GreaterThanOrEqual(doc_id,{INCR_SPLIT})" in ln, ln
    # and the persisted index is what supplies the corpus side
    assert "band_index_" in plan and "signatures" in plan and "/bands" in plan


def test_incremental_rollup_seeded_scans_partials_only(spark):
    """q_incremental_rollup_seeded's plan reads the persisted daily-partials
    table only — the orders scan happens once, at seed/repair time, never in
    the rollup query itself."""
    plan = _plan(spark, "q_incremental_rollup_seeded")
    assert "rollup_partials_" in plan
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scans and all("rollup_partials_" in ln for ln in scans), scans
    assert not any("orders.parquet" in ln for ln in scans)


def test_pq_indexed_serving_plan_has_no_training(spark):
    """sim_ann_pq_indexed is the serving shape: codebook + codes come from
    the persisted parquet index; no k-means localCheckpoint (ExistingRDD)
    and no encode stage appear in the query plan. The only embeddings
    scans are the pushed query-vector scans and the shortlist re-rank."""
    plan = _plan(spark, "sim_ann_pq_indexed")
    assert "pq_index_" in plan and "/codebook" in plan and "/codes" in plan
    assert "ExistingRDD" not in plan  # training's localCheckpoint artifact
    emb_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "embeddings" in ln
    ]
    assert emb_scans
    pushed = [ln for ln in emb_scans if "LessThan(vec_id,8)" in ln]
    assert pushed, "query-vector scans must push vec_id < 8"


def test_ivf_pq_indexed_serving_plan_has_no_training(spark):
    """sim_ann_ivf_pq_indexed serves from the persisted TWO-quantizer
    index: coarse centroids, assignment, codebook, and codes all come
    from parquet; neither Lloyd's loop (no ExistingRDD localCheckpoint
    artifact) nor a full-corpus encode appears in the plan — embeddings
    scans are only the pushed query reads and the shortlist re-rank."""
    plan = _plan(spark, "sim_ann_ivf_pq_indexed")
    for piece in ("ivf_pq_index_", "/coarse", "/assign", "/codebook", "/codes"):
        assert piece in plan, piece
    assert "ExistingRDD" not in plan  # training's localCheckpoint artifact
    emb_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "embeddings" in ln
    ]
    assert emb_scans
    pushed = [ln for ln in emb_scans if "LessThan(vec_id,8)" in ln]
    assert pushed, "query-vector scans must push vec_id < 8"


def test_incremental_exact_dedup_reads_index_not_corpus(spark):
    """dedup_incremental_exact's only documents scan carries the pushed
    batch filter; the corpus enters via the digest-only fingerprint index."""
    from aws_logs_parquet_converter_spark.operators.dedup import INCR_SPLIT

    plan = _plan(spark, "dedup_incremental_exact")
    doc_scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "documents" in ln
    ]
    assert doc_scans
    for ln in doc_scans:
        assert f"GreaterThanOrEqual(doc_id,{INCR_SPLIT})" in ln, ln
    assert "fp_index_" in plan


def test_percentiles_scalable_avoids_value_buffer_aggregate(spark):
    """q_percentiles uses the exact percentile() aggregate, which plans an
    ObjectHashAggregate buffering every group value in memory; the scalable
    rewrite must not — its heavy operator is a spillable window sort."""
    baseline = _plan(spark, "q_percentiles")
    assert "ObjectHashAggregate" in baseline  # the buffer the rewrite removes
    plan = _plan(spark, "q_percentiles_scalable")
    assert "ObjectHashAggregate" not in plan
    assert "Window" in plan


def test_incremental_minhash_broadcasts_batch_bands(spark):
    """The candidate join must broadcast the (tiny) batch band set so the
    persisted index side streams map-side — the index is never shuffled by
    a daily run."""
    plan = _plan(spark, "dedup_incremental_minhash")
    assert "BroadcastHashJoin" in plan


def test_pq_append_serving_plan_has_no_training(spark):
    """sim_ann_pq_append serves from the appended persisted index: no
    k-means localCheckpoint artifact, codebook + codes from parquet, and
    the only embeddings scans are the pushed query vectors / re-rank —
    old vectors are never re-encoded in the query."""
    plan = _plan(spark, "sim_ann_pq_append")
    assert "pq_append_index_" in plan and "/codebook" in plan and "/codes" in plan
    assert "ExistingRDD" not in plan
    emb_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "embeddings" in ln
    ]
    assert emb_scans
    assert any("LessThan(vec_id,8)" in ln for ln in emb_scans)


def test_rplsh_append_reads_index_not_corpus(spark):
    """sim_ann_rplsh_append's 100-TB claim in plan form: every embeddings
    scan carries the pushed batch filter (vec_id >= 400) — yesterday's
    vectors are never re-read or re-hashed; the corpus enters only via the
    persisted bucket index (buckets for candidates, vectors for the cosine
    confirm), and the batch's bucket set broadcasts so the index side never
    shuffles."""
    from aws_logs_parquet_converter_spark.operators.similarity import PQ_APPEND_SPLIT

    plan = _plan(spark, "sim_ann_rplsh_append")
    emb_scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "embeddings" in ln
    ]
    assert emb_scans, "expected a pushed-down batch scan of embeddings"
    for ln in emb_scans:
        assert f"GreaterThanOrEqual(vec_id,{PQ_APPEND_SPLIT})" in ln, ln
    assert "rplsh_index_" in plan and "/buckets" in plan and "/vectors" in plan
    assert "BroadcastHashJoin" in plan


def test_pq_append_batch_plan_encodes_only_the_batch(spark):
    """The daily append op itself: its plan scans embeddings ONCE with the
    pushed batch filter (vec_id >= PQ_APPEND_SPLIT), broadcasts the frozen
    codebook, and contains no training stage — per-day cost is O(|batch|)."""
    import tempfile

    from aws_logs_parquet_converter_spark.catalog import load_table
    from aws_logs_parquet_converter_spark.operators.similarity import (
        PQ_APPEND_SPLIT,
        build_pq_index,
        pq_encode,
    )

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    path = tempfile.mkdtemp(prefix="pq_plan_idx_")
    build_pq_index(e.where(F.col("vec_id") < PQ_APPEND_SPLIT), path)
    cb = spark.read.parquet(f"{path}/codebook")
    enc = pq_encode(e.where(F.col("vec_id") >= PQ_APPEND_SPLIT), cb)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    emb_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "embeddings" in ln
    ]
    assert len(emb_scans) == 1, emb_scans
    assert f"GreaterThanOrEqual(vec_id,{PQ_APPEND_SPLIT})" in emb_scans[0]
    assert "BroadcastHashJoin" in plan
    assert "ExistingRDD" not in plan


def test_levenshtein_capped_blocks_filtered_before_self_join(spark):
    """dedup_levenshtein_capped's hot-block cap must be a broadcast
    anti-join applied BEFORE the candidate self-join (one tiny aggregate,
    no extra shuffle of the corpus), so an oversized boilerplate block
    never reaches the O(len^2) confirm."""
    plan = _plan(spark, "dedup_levenshtein_capped")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_simhash_reads_index_not_corpus(spark):
    """dedup_incremental_simhash's only documents scan carries the pushed
    batch filter; the corpus enters via the persisted band index, and the
    batch bands broadcast so the index never shuffles."""
    from aws_logs_parquet_converter_spark.operators.dedup import INCR_SPLIT

    plan = _plan(spark, "dedup_incremental_simhash")
    doc_scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "documents" in ln
    ]
    assert doc_scans
    for ln in doc_scans:
        assert f"GreaterThanOrEqual(doc_id,{INCR_SPLIT})" in ln, ln
    assert "simhash_index_" in plan and "/bands" in plan
    assert "BroadcastHashJoin" in plan


def test_incremental_semantic_reads_index_not_corpus(spark):
    """dedup_incremental_semantic's 100-TB claim in plan form: every
    embeddings scan carries the pushed batch filter (vec_id >= 400) — no
    retraining (no iterative Lloyd's artifacts feeding the query), no
    old-vector re-assign; yesterday's corpus enters ONLY via the
    persisted centroids + assignment index, and the assigned batch
    broadcasts so the index side never shuffles."""
    from aws_logs_parquet_converter_spark.operators.similarity import (
        SEM_APPEND_SPLIT,
    )

    plan = _plan(spark, "dedup_incremental_semantic")
    emb_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "embeddings" in ln
    ]
    assert emb_scans, "expected a pushed-down batch scan of embeddings"
    for ln in emb_scans:
        assert f"GreaterThanOrEqual(vec_id,{SEM_APPEND_SPLIT})" in ln, ln
    assert "semantic_index_" in plan and "/centroids" in plan and "/assign" in plan
    assert "BroadcastHashJoin" in plan
