"""End-to-end corpus curation: the composed training-data pipeline.

Every stage exists as its own audited operator (dedup.py, graph.py,
textops.py, sampling.py); this module composes them the way a real corpus
build runs them, as ONE declarative-plus-iterative job:

    exact dedup (md5 survivors)
      -> near-dup clustering (MinHash-LSH pairs -> connected components)
         -> survivor election (keep the min doc_id per cluster)
      -> quality gate (length + token-count thresholds)
      -> deterministic train/val/test split (md5 buckets)
      -> per-(split, lang) corpus accounting

Scale shape: stages 1/3/4 are narrow or single-shuffle; the clustering
stage inherits graph.py's iterative loop. Nothing collects to the driver —
the pipeline output is the small accounting aggregate, and the survivor
set itself stays a DataFrame a caller can write out.

The DuckDB oracle mirrors the whole chain (recursive CTE for the
components stage), so the composition — not just each piece — is
hash-checked against an independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register
from .sampling import hash_split, sql_hash_bucket

#: quality gate thresholds (documented policy, mirrored in the oracle)
MIN_CHARS, MAX_CHARS, MIN_TOKENS = 50, 10_000, 10

_WS_TOKEN = r"\S+"


def curate_corpus(docs: DataFrame) -> DataFrame:
    """Surviving, quality-gated, split-labeled documents."""
    from .dedup import minhash_lsh_pairs
    from .graph import connected_components

    # 1. exact dedup: keep the smallest doc_id per identical text
    exact_keep = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(exact_keep, "doc_id", "left_semi")

    # 2. near-dup clusters over the full corpus; drop non-minimal members
    labels = connected_components(minhash_lsh_pairs(docs).select("doc_a", "doc_b"))
    near_drop = labels.where(F.col("label") < F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    survivors = survivors.join(near_drop, "doc_id", "left_anti")

    # 3. quality gate
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(_WS_TOKEN), 0))
    survivors = survivors.where(
        F.col("n_chars").between(MIN_CHARS, MAX_CHARS) & (n_tokens >= MIN_TOKENS)
    )

    # 4. deterministic split
    return hash_split(survivors, "doc_id")


@register(
    "pipeline_corpus_curation",
    oracle=None,  # assembled below — needs the dedup CTE fragments
    doc="Composed corpus build: exact dedup -> near-dup survivor election "
    "-> quality gate -> hash split -> per-(split, lang) accounting.",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    curated = curate_corpus(load_table(spark, sf_dir, "documents"))
    return curated.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


def _curation_oracle() -> str:
    from .dedup import _SQL_BANDS, _SQL_CAND, _SQL_SHINGLES, _SQL_SIG

    return (
        "WITH RECURSIVE "
        + ",".join([_SQL_SHINGLES, _SQL_SIG, _SQL_BANDS, _SQL_CAND])
        + f""",
        und AS (SELECT doc_a AS a, doc_b AS b FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
        reach(node, label) AS (
            SELECT a, a FROM und
            UNION
            SELECT u.b, r.label FROM und u JOIN reach r ON r.node = u.a
        ),
        comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
        near_drop AS (SELECT node FROM comp WHERE component < node),
        exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        surv AS (
            SELECT d.* FROM documents d
            JOIN exact_keep k ON d.doc_id = k.doc_id
            WHERE d.doc_id NOT IN (SELECT node FROM near_drop)
              AND d.n_chars BETWEEN {MIN_CHARS} AND {MAX_CHARS}
              AND len(regexp_extract_all(d.text, '{_WS_TOKEN}')) >= {MIN_TOKENS}
        )
        SELECT CASE WHEN {sql_hash_bucket("doc_id")} < 80 THEN 'train'
                    WHEN {sql_hash_bucket("doc_id")} < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MIN(doc_id) AS min_doc_id
        FROM surv
        GROUP BY 1, 2
        """
    )


# attach the assembled oracle (kept out of the decorator so the dedup CTE
# fragments resolve after module import order is settled)
from . import REGISTRY as _REGISTRY  # noqa: E402
from . import QuerySpec as _QuerySpec  # noqa: E402

_spec = _REGISTRY["pipeline_corpus_curation"]
_REGISTRY["pipeline_corpus_curation"] = _QuerySpec(
    fn=_spec.fn, oracle=_curation_oracle(), doc=_spec.doc
)


# ---------------------------------------------------------------------------
# RAG indexing pipeline: gate -> chunk -> fingerprint -> metadata
# ---------------------------------------------------------------------------


@register(
    "pipeline_rag_index",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, text, lang, source FROM documents
      WHERE LENGTH(text) BETWEEN {MIN_CHARS} AND {MAX_CHARS}
        AND len(regexp_extract_all(text, '{_WS_TOKEN}')) >= {MIN_TOKENS}),
    d AS (SELECT doc_id, lang, source,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM gated),
    nn AS (SELECT doc_id, lang, source, toks, len(toks) AS n
           FROM d WHERE len(toks) > 0),
    c AS (SELECT doc_id, lang, source, toks,
                 unnest(range(0, 1 + (greatest(n - 32, 0) + 23) // 24)) AS chunk_id
          FROM nn)
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id, lang, source,
           CAST(len(list_slice(toks, chunk_id*24+1, chunk_id*24+32)) AS INTEGER) AS n_tokens,
           md5(array_to_string(list_slice(toks, chunk_id*24+1, chunk_id*24+32), ' ')) AS chunk_md5
    FROM c
    """,
    doc=(
        "Composed RAG indexing pipeline: quality gate (length + token "
        "floors) -> sliding-window chunking (32 tokens, stride 24) -> "
        "per-chunk content fingerprint, with document metadata (lang, "
        "source) carried through — the table a retrieval index is built "
        "FROM (embed chunk_md5-keyed chunks, join hits back on doc_id). "
        "Entirely narrow: gate and chunker are per-row expressions, so "
        "the whole pipeline is one scan with zero shuffles; the oracle "
        "checks the COMPOSITION end-to-end, not just the pieces."
    ),
)
def pipeline_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from .textops import CHUNK_STRIDE, CHUNK_TOKENS

    d = load_table(spark, sf_dir, "documents")
    n_ws = F.size(F.regexp_extract_all("text", F.lit(_WS_TOKEN), 0))
    gated = d.where(
        F.length("text").between(MIN_CHARS, MAX_CHARS) & (n_ws >= MIN_TOKENS)
    )
    base = gated.select(
        "doc_id", "lang", "source", tokens(F.col("text")).alias("toks")
    ).where(F.size("toks") > 0)
    last_chunk = F.expr(
        f"(greatest(size(toks) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1}) DIV {CHUNK_STRIDE}"
    )
    piece = F.expr(f"slice(toks, chunk_id*{CHUNK_STRIDE}+1, {CHUNK_TOKENS})")
    return (
        base.select(
            "doc_id", "lang", "source", "toks",
            F.explode(F.sequence(F.lit(0), last_chunk)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            "lang",
            "source",
            F.size(piece).alias("n_tokens"),
            F.md5(F.array_join(piece, " ").cast("binary")).alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# Day-2 ops pipeline: streaming ingest -> scheduled OPTIMIZE
# ---------------------------------------------------------------------------


from .logetl import _duck_parsed_cte as _ops_pipe_oracle_cte


@register(
    "pipeline_stream_then_optimize",
    oracle=_ops_pipe_oracle_cte() + "SELECT * FROM parsed",
    doc=(
        "The day-2 operations loop composed end-to-end: raw log files "
        "stream in one per micro-batch (streaming/events.py: "
        "run_log_file_stream — each commit is an idempotent (day, batch) "
        "dynamic overwrite, one small file per touched day), then the "
        "OPTIMIZE maintenance op (plans/optimize.py) bin-packs every "
        "fragmented day via swap-by-rename, collapsing the batch "
        "bookkeeping dirs into one batch=-1 leaf. The registered query reads the OPTIMIZED "
        "table, so matching the same independent DuckDB regex re-parse "
        "oracle as stream_log_compaction proves the ingest->maintenance "
        "composition is lossless (dead letters included); file-count "
        "reduction itself is pinned in tests/test_optimize.py and "
        "tests/test_streaming.py. At scale this is the standing pattern: "
        "arrival-driven ingest commits small files all day, a scheduled "
        "OPTIMIZE packs yesterday's partitions, and readers never see a "
        "half-rewritten partition."
    ),
)
def pipeline_stream_then_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..functions.s3_log_parse import OUTPUT_COLUMNS
    from ..plans.optimize import optimize_partitions
    from ..streaming.events import _write_line_files, run_log_file_stream
    from .logetl import RAW_LINES

    raw_dir = _write_line_files(RAW_LINES, 4, "ops_pipe_raw_")
    dest = tempfile.mkdtemp(prefix="ops_pipe_dest_")
    run_log_file_stream(spark, raw_dir, dest)
    # collapse folds the stream's per-batch bookkeeping partitions
    # (day=X/batch=N) into one packed batch=-1 leaf per day
    optimize_partitions(
        spark, dest, "day", target_file_mb=128, collapse=("batch", "-1")
    )
    out = spark.read.parquet(dest)
    cols = [
        F.date_format("request_time", "yyyy-MM-dd HH:mm:ss").alias(
            "request_time_str"
        )
        if c == "request_time"
        else F.col(c)
        for c in OUTPUT_COLUMNS
    ]
    return out.select(*cols)


# ---------------------------------------------------------------------------
# Day-2 incremental curation into a governed snapshot table
# ---------------------------------------------------------------------------

#: per-sf_dir cache of seeded incremental-curation table roots
_INCR_CURATION_PATHS: dict[str, str] = {}


def _incr_curation_table_for(spark: SparkSession, sf_dir: str) -> str:
    """The day-2 corpus build, composed from round-5/6 primitives: the
    curated corpus lives in a CONSTRAINED snapshot-manifest table; a new
    batch flows through the PERSISTED incremental dedup indexes (exact
    fingerprints + MinHash bands — the same memoized state the
    dedup_incremental_* queries probe, corpus text never re-read) and
    only the survivors are appended as version 2. Drop rules, mirrored
    exactly by the oracle: a batch doc is dropped if its md5 repeats the
    corpus or an earlier batch doc (exact), or if it is the HIGHER id of
    any LSH band collision (near-dup)."""
    path = _INCR_CURATION_PATHS.get(sf_dir)
    if path is not None:
        return path
    import tempfile

    from ..plans.snapshots import current_version, snapshot_write
    from .dedup import (
        INCR_SPLIT,
        _band_index_for,
        _fp_index_for,
        incremental_exact_dedup,
        incremental_minhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") < INCR_SPLIT)
    batch = docs.where(F.col("doc_id") >= INCR_SPLIT)
    path = tempfile.mkdtemp(prefix="incr_curation_tbl_")
    snapshot_write(corpus, path, constraints={"doc_nonneg": "doc_id >= 0"})
    exact_keep = (
        incremental_exact_dedup(spark, batch, _fp_index_for(spark, sf_dir))
        .where(F.col("keep"))
        .select("doc_id")
    )
    near_drop = (
        incremental_minhash_pairs(spark, batch, _band_index_for(spark, sf_dir))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = batch.join(exact_keep, "doc_id", "left_semi").join(
        near_drop, "doc_id", "left_anti"
    )
    snapshot_write(survivors, path)
    assert current_version(spark, path) == 2
    _INCR_CURATION_PATHS[sf_dir] = path
    return path


@register(
    "pipeline_incremental_curation",
    oracle=None,  # assembled below — needs the dedup CTE fragments
    doc=(
        "Day-2 INCREMENTAL corpus curation into a governed table — the "
        "composition that ties the engine's table layer to its dedup "
        "indexes: the curated corpus is a snapshot-manifest table with a "
        "CHECK constraint; today's batch probes the PERSISTED exact-"
        "fingerprint and MinHash-band indexes (batch-sized cost, corpus "
        "text never re-read — the plan property the dedup_incremental_* "
        "queries pin individually), and only survivors append as v2. "
        "The registered read returns the latest table; the oracle "
        "rebuilds the identical final corpus from scratch in DuckDB "
        "(corpus half UNION batch docs that neither repeat a fingerprint "
        "nor collide in any LSH band with a lower id). At 100 TB this is "
        "the daily shape: O(batch) curation cost, an exactly-once "
        "governed append, and time travel to yesterday's corpus for "
        "training reproducibility."
    ),
)
def pipeline_incremental_curation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.snapshots import snapshot_read

    return snapshot_read(spark, _incr_curation_table_for(spark, sf_dir))


def _incr_curation_oracle() -> str:
    from .dedup import (
        _SQL_BANDS,
        _SQL_CAND,
        _SQL_SHINGLES,
        _SQL_SIG,
        INCR_SPLIT,
    )

    return (
        "WITH "
        + ",".join([_SQL_SHINGLES, _SQL_SIG, _SQL_BANDS, _SQL_CAND])
        + f""",
        idx AS (
          SELECT DISTINCT md5(text) AS fingerprint
          FROM documents WHERE doc_id < {INCR_SPLIT}),
        b AS (
          SELECT doc_id, md5(text) AS fingerprint
          FROM documents WHERE doc_id >= {INCR_SPLIT}),
        exact_keep AS (
          SELECT b.doc_id FROM b
          LEFT JOIN idx i ON i.fingerprint = b.fingerprint
          QUALIFY i.fingerprint IS NULL
              AND b.doc_id = MIN(b.doc_id) OVER (PARTITION BY b.fingerprint)),
        near_drop AS (
          SELECT DISTINCT doc_b AS doc_id FROM cand
          WHERE doc_b >= {INCR_SPLIT})
        SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE d.doc_id < {INCR_SPLIT}
           OR (d.doc_id IN (SELECT doc_id FROM exact_keep)
               AND d.doc_id NOT IN (SELECT doc_id FROM near_drop))
        """
    )


_spec2 = _REGISTRY["pipeline_incremental_curation"]
_REGISTRY["pipeline_incremental_curation"] = _QuerySpec(
    fn=_spec2.fn, oracle=_incr_curation_oracle(), doc=_spec2.doc
)
