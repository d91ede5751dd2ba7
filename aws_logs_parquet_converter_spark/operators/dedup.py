"""Deduplication operators over the ``documents`` table.

Training-data pipeline staples:

* exact dedup            — md5-fingerprint hash aggregate
* MinHash + LSH          — shingle -> 16 minhashes -> 4 bands -> bucket join
* n-gram Jaccard         — exact set overlap via inverted-index join
* SimHash                — 60-bit sign-sketch, banded candidate pairs + Hamming

All hashing is md5-derived (functions/text.py) so DuckDB oracles compute
bit-identical values; similarity scores are integer ratios (exact doubles).

Scale design (100 TB):
* Shuffle keys are digests/band-keys/shingles — never document bodies.
* MinHash: one explode + one hash-aggregate per doc (16 mins computed in the
  same aggregate), then an equi-join on band keys: O(n·shingles) map side,
  candidate-pair output only. No all-pairs stage anywhere.
* n-gram Jaccard uses the classic inverted-index (shingle) equi-join, which
  Spark executes as a shuffled hash join keyed on the shingle — skew from
  ultra-common shingles is handled by AQE skew-join splitting.
* SimHash pairs come from 15-bit band buckets (4 bands), again equi-joins.

Reference parity note: the reference engine has no dedup surface at all
(SURVEY.md §2.2); these are the §2.4 north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import HASH_P, hash60, sql_hash60, sql_tokens, tokens
from . import register

# MinHash configuration: K signatures in B bands of R rows (K = B*R).
K_MINHASH = 16
N_BANDS = 4
R_ROWS = K_MINHASH // N_BANDS
# 60-bit sketch (the full width hash60 yields) in 4 bands of 15 bits: 32768
# band values keep bucket occupancy ~corpus/32768 per band, so candidate
# pairs grow LINEARLY with the corpus. The previous 32-bit/8-bit-band config
# saturated its 256 bucket values — occupancy grew linearly and candidate
# pairs quadratically (measured 6.7x runtime for 10x rows at sf0.1).
# Guarantee: any pair with Hamming <= 3 shares >= 1 of the 4 bands
# (pigeonhole) — the classic 64-bit/k=3 block-permutation design. Above 3
# recall is probabilistic; short documents sketch noisily (1-2 word edits
# on ~40-token docs land at Hamming ~7/60), so near-dup detection for
# short docs belongs to MinHash-LSH, and simhash is the cheap tight-dup /
# boilerplate detector.
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15
SIMHASH_MAX_HAMMING = 8
SHINGLE_W = 3


# ---------------------------------------------------------------------------
# Shared shingle / signature builders (Spark side)
# ---------------------------------------------------------------------------


def _parse_bytes(v: str) -> int:
    """Parse a Spark size conf value ('134217728', '128m', '128MB', '1g')."""
    s = str(v).strip().lower()
    for suf, mul in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                     ("tb", 1 << 40), ("k", 1 << 10), ("m", 1 << 20),
                     ("g", 1 << 30), ("t", 1 << 40), ("b", 1)):
        if s.endswith(suf):
            return max(1, int(float(s[: -len(suf)].strip()) * mul))
    return max(1, int(float(s)))


def spread_input(docs: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the source is under-partitioned
    (e.g. one unsplittable parquet row group) so per-row tokenize/hash work
    can use every core. At production scale the input has >= cores
    partitions already and this is a no-op — document bodies are never
    shuffled unnecessarily.

    The under-partitioned test derives the scan's natural split count
    from the optimizer's size statistics (``bytes / maxPartitionBytes``)
    instead of converting the frame to an RDD: ``df.rdd.getNumPartitions``
    forces full physical planning + RDD conversion, measured ~150 ms of
    driver time PER CALL (r12) — this helper runs several times in most
    query constructions, so the probe itself was costing more than many
    legs' task time. The stats read is ~8 ms and launches no job; frames
    whose estimate is unusable (checkpointed RDDs report the defaulted
    max) fall back to the exact RDD probe."""
    sc = docs.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nbytes = int(
            docs._jdf.queryExecution().analyzed().stats().sizeInBytes()
        )
    except Exception:
        nbytes = -1
    if 0 < nbytes <= (1 << 50):
        raw = docs.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"
        )
        max_split = _parse_bytes(raw)
        natural = max(1, -(-nbytes // max(max_split, 1)))
        if natural < max(2, target // 2):
            return docs.repartition(target)
        return docs
    if docs.rdd.getNumPartitions() < max(2, target // 2):
        return docs.repartition(target)
    return docs


def shingle_array(text_col: Column) -> Column:
    """Distinct 3-token shingles of a text as an array — fully narrow.

    Built from three shifted ``slice``s of the token array combined with
    ``zip_with`` instead of a per-doc window, so shingling costs ZERO
    shuffles. Each slice references the token array at ROW level (evaluated
    once per row); putting token lookups inside a per-element lambda would
    let CollapseProject inline the regexp tokenizer into every element —
    measured 50x slower.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    m = n - (SHINGLE_W - 1)  # number of shingles
    a = F.slice(toks, 1, m)
    b = F.slice(toks, 2, m)
    c = F.slice(toks, 3, m)
    pair = F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(" "), y))
    tri = F.zip_with(pair, c, lambda p, z: F.concat(p, F.lit(" "), z))
    return F.when(n >= SHINGLE_W, F.array_distinct(tri)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct 3-token shingles per document: (doc_id, shingle).

    ``array_distinct`` inside :func:`shingle_array` already dedupes per doc,
    so no global distinct (= no shuffle) is needed after the explode.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingle_array(F.col(text_col))).alias("shingle"),
    )


def minhash_signature(sh: DataFrame) -> DataFrame:
    """(doc_id, s0..s15): 16 minhashes from ONE md5 per shingle.

    The md5 digest is computed once per shingle row and split into two
    60-bit halves; the k-th hash is the universal-family combination
    (h1 + k*h2) mod P — 16x fewer digests than seeding md5 per signature.
    The groupBy plans a map-side partial min, so only (doc_id, 16 longs)
    per doc ever shuffles.
    """
    digest = F.md5(F.col("shingle").cast("binary"))
    halves = sh.select(
        "doc_id",
        (F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % HASH_P).alias("h1"),
        (F.conv(F.substring(digest, 16, 15), 16, 10).cast("bigint") % HASH_P).alias("h2"),
    )
    return halves.groupBy("doc_id").agg(
        *[
            F.min((F.col("h1") + F.lit(k) * F.col("h2")) % HASH_P).alias(f"s{k}")
            for k in range(K_MINHASH)
        ]
    )


def lsh_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key): md5 over each band's R signature values."""
    bands = []
    for b in range(N_BANDS):
        cols = [F.col(f"s{b * R_ROWS + r}").cast("string") for r in range(R_ROWS)]
        parts: list[Column] = []
        for i, c in enumerate(cols):
            if i:
                parts.append(F.lit(","))
            parts.append(c)
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band_id"),
                F.md5(F.concat(*parts).cast("binary")).alias("band_key"),
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one LSH band bucket."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Shared DuckDB oracle fragments (kept in lockstep with the Spark builders)
# ---------------------------------------------------------------------------

_SQL_SHINGLES = f"""
d AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
p AS (SELECT doc_id, toks, unnest(range(1, len(toks)+1)) AS pos FROM d),
tok AS (SELECT doc_id, pos, toks[pos] AS tok FROM p),
sh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok,1) OVER (PARTITION BY doc_id ORDER BY pos)
             || ' ' || LEAD(tok,2) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
  FROM tok),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL)
"""

_SQL_SIG = (
    f"""halves AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {HASH_P} AS h1,
             CAST(('0x' || substr(md5(shingle), 16, 15)) AS BIGINT) % {HASH_P} AS h2
      FROM sh),
    sig AS (SELECT doc_id, """
    + ", ".join(f"MIN((h1 + {k} * h2) % {HASH_P}) AS s{k}" for k in range(K_MINHASH))
    + " FROM halves GROUP BY doc_id)"
)


def _sql_band_select(b: int) -> str:
    key = " || ',' || ".join(
        f"CAST(s{b * R_ROWS + r} AS VARCHAR)" for r in range(R_ROWS)
    )
    return f"SELECT doc_id, {b} AS band_id, md5({key}) AS band_key FROM sig"


_SQL_BANDS = "bands AS (" + " UNION ALL ".join(
    _sql_band_select(b) for b in range(N_BANDS)
) + ")"

_SQL_CAND = """
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
"""


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------


def exact_dedup_keys(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: fingerprint, canonical (min) id, dup count."""
    fp = F.md5(F.col(text_col).cast("binary")).alias("fingerprint")
    return (
        docs.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: md5-fingerprint hash-aggregate, canonical id = min(doc_id).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_keys(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact_only_dupes",
    oracle="""
    SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
    doc="Duplicate clusters only (HAVING over the dedup aggregate).",
)
def dedup_exact_only_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_keys(load_table(spark, sf_dir, "documents")).where(F.col("n_copies") > 1)


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """LSH candidate pairs with minhash-estimated Jaccard (matches/16)."""
    sig = minhash_signature(shingles(spread_input(docs))).cache()
    cand = candidate_pairs(lsh_bands(sig))
    x = sig.alias("x")
    y = sig.alias("y")
    n_match: Column = sum(
        F.when(F.col(f"x.s{k}") == F.col(f"y.s{k}"), 1).otherwise(0)
        for k in range(K_MINHASH)
    )
    return (
        cand.join(x, F.col("doc_a") == F.col("x.doc_id"))
        .join(y, F.col("doc_b") == F.col("y.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            n_match.cast("int").alias("n_matching_minhashes"),
            (n_match / F.lit(float(K_MINHASH))).alias("est_jaccard"),
        )
    )


@register(
    "dedup_minhash_lsh",
    oracle="WITH "
    + ",".join([_SQL_SHINGLES, _SQL_SIG, _SQL_BANDS, _SQL_CAND])
    + f"""
    SELECT c.doc_a, c.doc_b,
           CAST({' + '.join(f'(CASE WHEN x.s{k} = y.s{k} THEN 1 ELSE 0 END)' for k in range(K_MINHASH))} AS INTEGER)
             AS n_matching_minhashes,
           ({' + '.join(f'(CASE WHEN x.s{k} = y.s{k} THEN 1 ELSE 0 END)' for k in range(K_MINHASH))}) / {float(K_MINHASH)}
             AS est_jaccard
    FROM cand c
    JOIN sig x ON x.doc_id = c.doc_a
    JOIN sig y ON y.doc_id = c.doc_b
    """,
    doc="MinHash(16)+LSH(4 bands): near-dup candidate pairs with estimated Jaccard.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.1, max_doc_frequency: float | None = None
) -> DataFrame:
    """Exact shingle-set Jaccard >= threshold via inverted-index equi-join.

    ``max_doc_frequency`` (e.g. 0.01) drops shingles present in more than
    that fraction of documents BEFORE the self-join — the standard
    stop-shingle cap for corpora where ultra-common boilerplate shingles
    create quadratic hot keys the skew-split can only shard, not shrink.
    Dropping them changes the Jaccard denominator for affected docs, so
    the cap is OFF by default (the registered oracle-checked query uses
    the exact form) and is the documented knob for corpus-scale runs;
    the DF table is one tiny aggregate broadcast into a filter.

    The shingle frame is deliberately NOT cached: it feeds three
    consumers (sizes + both join sides), but at corpus scale the
    recompute (tokenize+explode, linear, fully pipelined) beats pinning
    a shingle-count-sized block in executor storage — measured at 500k
    docs / 24M shingles: min-of-3 17.9 s uncached vs 20.8 s cached
    (tools/scale_growth_text.py corpus), and an uncached plan leaves no
    storage residue across repeated calls (the rplsh_pairs leak class,
    ADVICE r4).
    """
    sh = shingles(spread_input(docs))
    if max_doc_frequency is not None:
        n_docs = docs.count()
        cap = int(n_docs * max_doc_frequency)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count_distinct("doc_id").alias("df"))
            .where(F.col("df") > cap)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_inter")
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_inter").cast("int").alias("n_common_shingles"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


@register(
    "dedup_ngram_jaccard",
    oracle="WITH "
    + _SQL_SHINGLES
    + """,
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS INTEGER) AS n_common_shingles,
           (CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE (CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)) >= 0.1
    """,
    doc="Exact 3-gram-shingle Jaccard >= 0.1 via inverted-index join.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.1)


def simhash_sketch(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit sign sketch over distinct-shingle hashes.

    Features are 3-gram shingles (not raw tokens): token vocabularies overlap
    heavily across documents, which collapses token-feature sketches together;
    shingles keep unrelated documents far apart in Hamming space.
    """
    th = shingles(spread_input(docs)).select(
        "doc_id", hash60(F.col("shingle"), seed="sim").alias("h")
    )
    bit_sums = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    simhash: Column = sum(
        F.when(F.col(f"b{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(SIMHASH_BITS)
    )
    return bit_sums.select("doc_id", simhash.cast("bigint").alias("simhash"))


def simhash_bands(sk: DataFrame) -> DataFrame:
    """(doc_id, simhash, band_id, band_key) rows: the sketch split into
    its 15-bit bands. The simhash rides along so candidate pairs can
    compute Hamming without a join back to the sketch table."""
    bands = None
    for b in range(SIMHASH_BITS // SIMHASH_BAND_BITS):
        band = sk.select(
            "doc_id",
            "simhash",
            F.lit(b).alias("band_id"),
            F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
            .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
            .alias("band_key"),
        )
        bands = band if bands is None else bands.unionByName(band)
    return bands


def simhash_pairs(docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Near-dup pairs: share a 15-bit simhash band, Hamming <= max_hamming."""
    sk = simhash_sketch(docs).cache()
    bands = simhash_bands(sk)
    a = bands.alias("a")
    b = bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


_SQL_SIMHASH = (
    _SQL_SHINGLES
    + f""",
    th AS (SELECT doc_id, {sql_hash60('shingle', 'sim')} AS h FROM sh),
    bits AS (SELECT doc_id, """
    + ", ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    + """ FROM th GROUP BY doc_id),
    sk AS (SELECT doc_id, CAST("""
    + " + ".join(
        f"(CASE WHEN b{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    + """ AS BIGINT) AS simhash FROM bits),
    bands AS ("""
    + " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_id, (simhash >> {b * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1} AS band_key FROM sk"
        for b in range(SIMHASH_BITS // SIMHASH_BAND_BITS)
    )
    + ")"
)


@register(
    "dedup_simhash",
    oracle="WITH "
    + _SQL_SIMHASH
    + f"""
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
    doc="SimHash(32-bit) near-dup pairs: banded candidates, Hamming <= 8.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(load_table(spark, sf_dir, "documents"))


def embedding_cosine_dupes(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Embedding-based near-dup: vectors whose cosine to an earlier (smaller
    id) same-cluster vector exceeds ``threshold``; canonical = min such id.

    Blocked by the coarse ``label`` cluster so the self-join is per-block
    O(n_b^2) instead of global O(n^2) — at 100 TB the corpus is partitioned
    by label and each block joins co-located, no broadcast of the corpus.
    """
    from .similarity import dot  # local import: avoid module cycle

    # Precompute each vector's norm ONCE (per row, before the join) and test
    # dot(a,b) >= t * |a| * |b| — a per-pair cosine would recompute both
    # norms inside the pair loop, tripling the interpreted array work.
    # spread_input: the probe side of the (broadcast) pair join must not run
    # as a single task when the source is one parquet row group.
    embeddings = spread_input(embeddings)
    n = embeddings.select(
        "vec_id",
        "label",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    a = n.select(
        F.col("vec_id").alias("canon_cand"),
        F.col("label").alias("la"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("dup_id"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("canon_cand") < F.col("dup_id")))
        .where(
            dot(F.col("va"), F.col("vb"))
            >= F.lit(threshold) * F.col("na") * F.col("nb")
        )
        .groupBy("dup_id")
        .agg(F.min("canon_cand").alias("keep_vec_id"))
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH n AS (
      SELECT vec_id, label, embedding,
             sqrt(list_dot_product(embedding, embedding)) AS nrm
      FROM embeddings
    )
    SELECT b.vec_id AS dup_id, MIN(a.vec_id) AS keep_vec_id
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding, b.embedding) >= 0.35 * a.nrm * b.nrm
    GROUP BY b.vec_id
    """,
    doc="Embedding-cosine near-dup (>=0.35 within label block): dup vector "
    "-> canonical keeper (min earlier id).",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_cosine_dupes(load_table(spark, sf_dir, "embeddings"))


@register(
    "dedup_latest_by_key",
    oracle="""
    SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    doc=(
        "CDC-style versioned dedup: keep the latest record per key "
        "(row_number over user_id ordered by ts desc, event_id as the "
        "deterministic tiebreak). One shuffle on the key; at 100 TB "
        "pre-bucket the table by user_id (plans/bucketing.py) and the "
        "window runs shuffle-free. max_by cannot express multi-column "
        "payload carry-along; row_number does."
    ),
)
def dedup_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_type",
        )
    )


def word_ngram_array(text_col: Column, n: int = 4) -> Column:
    """All word n-grams (space-tokenized, duplicates kept) as an array.

    Same narrow slice+zip_with construction as :func:`shingle_array` — the
    token split stays a ROW-level expression evaluated once per row, never
    inlined into a per-element lambda (the measured-50x CollapseProject
    trap). Tokenization is a plain single-space split to match SQL
    ``string_split(text, ' ')`` exactly.
    """
    w = F.split(text_col, " ")
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))
    out = F.slice(w, 1, m)
    for k in range(2, n + 1):
        out = F.zip_with(
            out, F.slice(w, k, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return out


@register(
    "dedup_contamination",
    oracle="""
    WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS w
                   FROM documents),
    grams AS (
      SELECT doc_id, source, array_to_string(w[i:i+3], ' ') AS g
      FROM (SELECT doc_id, source, w,
                   unnest(generate_series(1, greatest(len(w) - 3, 0))) AS i
            FROM words)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
    SELECT grams.doc_id, COUNT(*) AS n_contaminated_grams
    FROM grams JOIN bench ON grams.g = bench.g
    WHERE grams.source <> 'src0'
    GROUP BY grams.doc_id
    """,
    doc=(
        "Benchmark decontamination: flag corpus docs sharing any word "
        "4-gram with the held-out set (source='src0' stands in for the "
        "eval benchmark). The benchmark's distinct-gram set is tiny "
        "relative to the corpus, so it broadcasts and the corpus side "
        "left-semi probes it with NO shuffle of document text; the only "
        "wide op is the per-doc count. This is the standard "
        "train-set-decontamination shape at 100 TB."
    ),
)
def dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", "source", F.explode(word_ngram_array(F.col("text"), 4)).alias("g")
    )
    bench = grams.where(F.col("source") == "src0").select("g").distinct()
    return (
        grams.where(F.col("source") != "src0")
        .join(F.broadcast(bench), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )


@register(
    "dedup_ngram_containment",
    oracle="WITH "
    + _SQL_SHINGLES
    + """,
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           (CAST(i.n_inter AS DOUBLE) / sa.n) AS containment
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    WHERE (CAST(i.n_inter AS DOUBLE) / sa.n) >= 0.5
    """,
    doc=(
        "Asymmetric shingle containment |A∩B|/|A| >= 0.5: catches "
        "sub-document duplication (doc_a mostly contained in doc_b) that "
        "symmetric Jaccard misses when sizes differ wildly — the standard "
        "quote/boilerplate detector. Same inverted-index equi-join shape "
        "as the Jaccard pass (shuffle on shingle, then on the pair), but "
        "directional: both (a,b) and (b,a) can surface, normalized only "
        "by the left side's shingle count."
    ),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles(spread_input(load_table(spark, sf_dir, "documents"))).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    cont = F.col("n_inter").cast("double") / F.col("n")
    return (
        inter.join(sizes, F.col("doc_a") == F.col("doc_id"))
        .select("doc_a", "doc_b", cont.alias("containment"))
        .where(F.col("containment") >= 0.5)
    )


@register(
    "dedup_levenshtein",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, LENGTH(text) AS n,
             md5(array_to_string(({sql_tokens('text')})[1:4], ' ')) AS block_key
      FROM documents)
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           CAST(levenshtein(a.text, c.text) AS INTEGER) AS edit_dist
    FROM b a JOIN b c
      ON a.block_key = c.block_key AND a.doc_id < c.doc_id
    WHERE levenshtein(a.text, c.text) * 5 <= GREATEST(a.n, c.n)
    """,
    doc=(
        "Edit-distance near-dup: prefix-blocked candidate pairs confirmed by "
        "levenshtein(a,b) <= 20% of the longer length. Blocking key = md5 of "
        "the first 4 word tokens, so candidate generation is a plain shuffled "
        "equi-join on the block key — never all-pairs. Edit distance runs "
        "JVM-side (codegen StringUtils), exact in both engines. Scale knobs: "
        "the block key bounds pair fan-out to O(sum block^2); for adversarial "
        "block sizes add a per-block cap or switch to the banded variant "
        "F.levenshtein(l, r, threshold) (O(n*k) bounded-distance, returns -1 "
        "above threshold — then ALSO filter edit_dist >= 0, since the -1 "
        "sentinel would pass a relative-cutoff comparison)."
    ),
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    return levenshtein_pairs(spread_input(load_table(spark, sf_dir, "documents")))


@register(
    "dedup_levenshtein_capped",
    oracle=f"""
    WITH b0 AS (
      SELECT doc_id, text, LENGTH(text) AS n,
             md5(array_to_string(({sql_tokens('text')})[1:4], ' ')) AS block_key
      FROM documents),
    hot AS (
      SELECT block_key FROM b0 GROUP BY block_key HAVING COUNT(*) > 2),
    b AS (
      SELECT * FROM b0 WHERE block_key NOT IN (SELECT block_key FROM hot))
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           CAST(levenshtein(a.text, c.text) AS INTEGER) AS edit_dist
    FROM b a JOIN b c
      ON a.block_key = c.block_key AND a.doc_id < c.doc_id
    WHERE levenshtein(a.text, c.text) * 5 <= GREATEST(a.n, c.n)
    """,
    doc=(
        "dedup_levenshtein with the HOT-BLOCK CAP engaged (max_block_size="
        "2): prefix blocks larger than the cap are dropped before the "
        "self-join via one tiny block-size aggregate broadcast into an "
        "anti-join — the bounded-candidate production form for corpora "
        "with shared boilerplate preambles, where one B-doc block costs "
        "B(B-1)/2 O(len^2) edit-distance confirmations. Measured in "
        "tools/scale_growth_text.py: a 20%-boilerplate corpus is "
        "quadratic uncapped (C(n/5, 2) candidates) and linear capped. "
        "The documented recall trade, same pattern as ngram_jaccard's "
        "max_doc_frequency."
    ),
)
def dedup_levenshtein_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return levenshtein_pairs(
        spread_input(load_table(spark, sf_dir, "documents")), max_block_size=2
    )


def levenshtein_pairs(
    docs: DataFrame, max_block_size: int | None = None
) -> DataFrame:
    """(doc_a, doc_b, edit_dist) pairs with edit distance <= 20% of the
    longer text, candidates blocked by the md5 of the first 4 word tokens.

    ``max_block_size`` is the hot-block cap for corpora with shared
    boilerplate prefixes (license headers, templated preambles): a block
    of B docs yields B(B-1)/2 candidates each paying an O(len^2) edit
    distance, so one 10k-doc boilerplate block costs ~50M confirmations —
    measured quadratic in tools/scale_growth_text.py. Blocks larger than
    the cap are DROPPED before the self-join (the documented recall trade,
    same pattern as ngram_jaccard_pairs' max_doc_frequency); the block
    sizes are one tiny aggregate broadcast into a semi-join filter. OFF by
    default — the registered oracle-checked query uses the exact form."""
    blocked = docs.select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        F.md5(
            F.array_join(F.slice(tokens(F.col("text")), 1, 4), " ").cast("binary")
        ).alias("block_key"),
    )
    if max_block_size is not None:
        hot = (
            blocked.groupBy("block_key")
            .agg(F.count("*").alias("b"))
            .where(F.col("b") > max_block_size)
            .select("block_key")
        )
        blocked = blocked.join(F.broadcast(hot), "block_key", "left_anti")
    a = blocked.alias("a")
    c = blocked.alias("c")
    ed = F.levenshtein(F.col("a.text"), F.col("c.text"))
    return (
        a.join(
            c,
            (F.col("a.block_key") == F.col("c.block_key"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            ed.alias("edit_dist"),
            F.greatest(F.col("a.n"), F.col("c.n")).alias("max_len"),
        )
        .where(F.col("edit_dist") * 5 <= F.col("max_len"))
        .select("doc_a", "doc_b", "edit_dist")
    )


@register(
    "dedup_repeated_segments",
    oracle=f"""
    WITH d AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    p AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS pos FROM d),
    seg AS (SELECT DISTINCT doc_id,
                   array_to_string(toks[pos:pos+7], ' ') AS segment
            FROM p)
    SELECT segment,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM seg GROUP BY segment HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    doc=(
        "Sub-document boilerplate mining: 8-token segments appearing in >= 2 "
        "distinct documents — the repeated-segment table used to strip "
        "shared headers/footers/templates before near-dup scoring (sentence "
        "splitting is punctuation-fragile; fixed token windows are not). "
        "Narrow slice-window expansion per row (same zero-shuffle shape as "
        "the 3-gram shingler), one hash aggregate keyed on the segment; "
        "map-side partial aggregation + HAVING >= 2 bound the output by the "
        "Zipf-bounded repeated-segment set, not corpus token volume."
    ),
)
def dedup_repeated_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_input(load_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    n = F.size(toks)
    m = n - 7  # number of 8-token windows
    parts = [F.slice(toks, k + 1, m) for k in range(8)]
    seg = parts[0]
    for q in parts[1:]:
        seg = F.zip_with(seg, q, lambda a, b: F.concat(a, F.lit(" "), b))
    segments = d.select(
        "doc_id",
        F.explode(
            F.when(n >= 8, F.array_distinct(seg)).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("segment"),
    )
    return (
        segments.groupBy("segment")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
    )


@register(
    "dedup_survivorship",
    oracle="""
    SELECT md5(text) AS fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS canonical_doc_id,
           arg_max(source, CAST(n_chars AS BIGINT) * 10000000 - doc_id) AS best_source,
           arg_max(lang, CAST(n_chars AS BIGINT) * 10000000 - doc_id) AS best_lang,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY md5(text)
    """,
    doc=(
        "Survivorship / golden-record merge: duplicate groups (exact text "
        "fingerprint) collapse to one record whose per-column values are "
        "chosen by explicit rules — max_by(col, quality-with-embedded-id): best "
        "metadata wins, unique doc_id breaks ties so the golden record is "
        "deterministic in any engine at any partitioning. One hash "
        "aggregate (max_by/min partials merge map-side); no self-join, no "
        "window. The MDM companion to dedup_exact: that op elects a "
        "surviving ROW, this one assembles the best COLUMN VALUES across "
        "the duplicate group."
    ),
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # quality key with unique tiebreak embedded as one integer (doc_id
    # < 1e7 at every test SF; same embedding trick as q_minmax_by)
    pref = F.col("n_chars").cast("bigint") * 10000000 - F.col("doc_id")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("fingerprint"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.max_by("source", pref).alias("best_source"),
            F.max_by("lang", pref).alias("best_lang"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental near-dup: new batch vs stored signature index
# ---------------------------------------------------------------------------

#: documents with doc_id >= this are "today's batch"; below it, the corpus
#: whose LSH band table is the stored index (in production: a parquet table
#: keyed (band_id, band_key) maintained by each daily run).
INCR_SPLIT = 400


def build_band_index(docs: DataFrame, path: str, split: int = INCR_SPLIT) -> None:
    """Materialize the corpus LSH index (the state a daily dedup job
    maintains): ``<path>/signatures`` = (doc_id, s0..s15) and
    ``<path>/bands`` = (doc_id, band_id, band_key), parquet. The corpus
    text is shingled exactly ONCE — here, at index-build/append time; the
    daily query (:func:`incremental_minhash_pairs`) reads only these two
    narrow tables plus the day's batch.
    """
    corpus = docs.where(F.col("doc_id") < split)
    sig = minhash_signature(shingles(spread_input(corpus)))
    sig.write.mode("overwrite").parquet(f"{path}/signatures")
    # derive bands from the WRITTEN signatures (one shingle pass total)
    sig_r = docs.sparkSession.read.parquet(f"{path}/signatures")
    lsh_bands(sig_r).write.mode("overwrite").parquet(f"{path}/bands")


def incremental_minhash_pairs(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
) -> DataFrame:
    """Near-dup pairs INVOLVING the new batch only — the daily-increment
    dedup: yesterday's corpus is represented purely by its persisted band
    INDEX (signatures + band keys, no text — see :func:`build_band_index`);
    today's docs shingle/sign/band and probe it.

    Scale property this pins — and the plan now proves
    (tests/test_plans.py::test_incremental_minhash_reads_index_not_corpus):
    the only ``documents`` scan in the physical plan carries the batch's
    pushed doc_id filter; the corpus enters ONLY via the two parquet
    index tables. Per-day cost is O(|new batch|) map work plus an
    equi-join whose NEW side is batch-sized; the corpus text is never
    re-read and never re-shingled. Output = new-vs-old pairs plus
    new-vs-new pairs (both needed: a doc duplicated within today's batch
    must not slip through), which equals the full-corpus candidate set
    restricted to pairs whose HIGHER id is in the batch.
    """
    batch_sig = minhash_signature(shingles(spread_input(batch))).cache()
    batch_bands = lsh_bands(batch_sig)
    idx_sig = spark.read.parquet(f"{index_path}/signatures")
    idx_bands = spark.read.parquet(f"{index_path}/bands")
    a = idx_bands.unionByName(batch_bands).alias("a")  # index ∪ today
    b = batch_bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = idx_sig.unionByName(batch_sig).alias("x")  # doc_a may be old or new
    y = batch_sig.alias("y")  # doc_b is always in the batch
    n_match: Column = sum(
        F.when(F.col(f"x.s{k}") == F.col(f"y.s{k}"), 1).otherwise(0)
        for k in range(K_MINHASH)
    )
    return (
        cand.join(x, F.col("doc_a") == F.col("x.doc_id"))
        .join(y, F.col("doc_b") == F.col("y.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            n_match.cast("int").alias("n_matching_minhashes"),
        )
    )


#: per-sf_dir cache of built band-index paths (setup state, built once per
#: process like stream_upsert_merge's seeded destination table)
_BAND_INDEX_PATHS: dict[str, str] = {}


def _band_index_for(spark: SparkSession, sf_dir: str) -> str:
    path = _BAND_INDEX_PATHS.get(sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="band_index_")
        build_band_index(load_table(spark, sf_dir, "documents"), path)
        _BAND_INDEX_PATHS[sf_dir] = path
    return path


#: per-sf_dir cache of persisted exact-fingerprint index paths
_FP_INDEX_PATHS: dict[str, str] = {}


def build_fingerprint_index(docs: DataFrame, path: str, split: int = INCR_SPLIT) -> None:
    """Materialize the exact-dedup state: the DISTINCT md5 fingerprints of
    the corpus half (doc_id < split) as one digest-only parquet table. The
    daily job appends each batch's new fingerprints; corpus text is read
    exactly once, here."""
    (
        docs.where(F.col("doc_id") < split)
        .select(F.md5(F.col("text").cast("binary")).alias("fingerprint"))
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )


def _fp_index_for(spark: SparkSession, sf_dir: str) -> str:
    path = _FP_INDEX_PATHS.get(sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="fp_index_") + "/fingerprints"
        build_fingerprint_index(load_table(spark, sf_dir, "documents"), path)
        _FP_INDEX_PATHS[sf_dir] = path
    return path


def incremental_exact_dedup(
    spark: SparkSession, batch: DataFrame, index_path: str
) -> DataFrame:
    """Per new document: is it a copy of anything already ingested (the
    persisted fingerprint index) or of an earlier doc in today's batch?
    ``keep`` marks exactly the rows a curation pipeline admits. Shuffle
    payload is digests only; the index side never touches text. At 100 TB
    the index is the md5 table (32 bytes/distinct doc), the join is a
    digest equi-join AQE can split, and each day appends only the kept
    fingerprints."""
    from pyspark.sql import Window

    b = batch.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fingerprint")
    )
    idx = spark.read.parquet(index_path).select(
        "fingerprint", F.lit(True).alias("__in_idx")
    )
    w_min = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    return (
        b.join(idx, "fingerprint", "left")
        .withColumn("seen_in_corpus", F.coalesce(F.col("__in_idx"), F.lit(False)))
        .withColumn("first_in_batch", F.col("doc_id") == w_min)
        .withColumn(
            "keep", (~F.col("seen_in_corpus")) & F.col("first_in_batch")
        )
        .select("doc_id", "fingerprint", "seen_in_corpus", "first_in_batch", "keep")
    )


@register(
    "dedup_incremental_exact",
    oracle=f"""
    WITH idx AS (
      SELECT DISTINCT md5(text) AS fingerprint
      FROM documents WHERE doc_id < {INCR_SPLIT}),
    batch AS (
      SELECT doc_id, md5(text) AS fingerprint
      FROM documents WHERE doc_id >= {INCR_SPLIT}),
    j AS (
      SELECT b.doc_id, b.fingerprint,
             (i.fingerprint IS NOT NULL) AS seen_in_corpus,
             b.doc_id = MIN(b.doc_id) OVER (PARTITION BY b.fingerprint)
               AS first_in_batch
      FROM batch b LEFT JOIN idx i ON i.fingerprint = b.fingerprint)
    SELECT doc_id, fingerprint, seen_in_corpus, first_in_batch,
           (NOT seen_in_corpus AND first_in_batch) AS keep
    FROM j
    """,
    doc=(
        "Incremental EXACT dedup against a persisted fingerprint index "
        "(the exact sibling of dedup_incremental_minhash): today's batch "
        "(doc_id >= 400) md5s its text, left-joins the digest-only corpus "
        "index, and flags per document whether it repeats the corpus, "
        "repeats an earlier batch row, or is kept. Plan-asserted: the only "
        "documents scan carries the pushed batch filter — corpus text is "
        "never re-read, the index is 32 bytes per distinct doc."
    ),
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_path = _fp_index_for(spark, sf_dir)
    batch = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") >= INCR_SPLIT
    )
    return incremental_exact_dedup(spark, batch, index_path)


@register(
    "dedup_incremental_minhash",
    oracle="WITH "
    + ",".join([_SQL_SHINGLES, _SQL_SIG, _SQL_BANDS, _SQL_CAND])
    + f"""
    SELECT c.doc_a, c.doc_b,
           CAST({' + '.join(f'(CASE WHEN x.s{k} = y.s{k} THEN 1 ELSE 0 END)' for k in range(K_MINHASH))} AS INTEGER)
             AS n_matching_minhashes
    FROM cand c
    JOIN sig x ON x.doc_id = c.doc_a
    JOIN sig y ON y.doc_id = c.doc_b
    WHERE c.doc_b >= {INCR_SPLIT}
    """,
    doc=(
        "Incremental near-dup (daily-increment shape): today's batch "
        "(doc_id >= 400) probes a PERSISTED parquet LSH band index "
        "(signatures + band keys, built once by build_band_index as setup "
        "state); output = the full-corpus candidate set restricted to "
        "pairs whose higher id is new. Per-day cost is batch-sized map "
        "work + a batch-driven equi-join — the corpus enters the query "
        "plan only through the index tables (plan-asserted: the single "
        "documents scan carries the pushed doc_id >= 400 filter), so the "
        "corpus text is never re-read and never re-shingled."
    ),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_path = _band_index_for(spark, sf_dir)
    batch = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") >= INCR_SPLIT
    )
    return incremental_minhash_pairs(spark, batch, index_path)


# ---------------------------------------------------------------------------
# Incremental SimHash: persisted sketch-band index + daily batch probe
# ---------------------------------------------------------------------------


def build_simhash_index(docs: DataFrame, path: str, split: int = INCR_SPLIT) -> None:
    """Materialize the corpus SimHash band index: ``<path>/bands`` =
    (doc_id, simhash, band_id, band_key), parquet. The sketch rides in the
    band rows, so the daily probe computes Hamming straight off the
    candidate join — no sketch-table join-back, and the corpus text is
    shingled exactly once, here."""
    sk = simhash_sketch(docs.where(F.col("doc_id") < split))
    simhash_bands(sk).write.mode("overwrite").parquet(f"{path}/bands")


def incremental_simhash_pairs(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """Near-dup pairs INVOLVING the new batch only — the SimHash member of
    the day-2 dedup family (exact: dedup_incremental_exact; MinHash:
    dedup_incremental_minhash). Yesterday's corpus is purely its persisted
    band index; today's docs sketch and probe it. The batch band set
    broadcasts, so the index streams map-side and never shuffles; per-day
    cost is O(|batch|) sketch work + an index scan. Output = full-corpus
    simhash pairs restricted to pairs whose HIGHER id is in the batch
    (new-vs-old plus new-vs-new)."""
    # No cache: batch bands appear twice in the plan (union side and
    # broadcast probe side) but a day-batch is small and the sketch is
    # pure expression work — recompute is cheaper than pinning a cached
    # frame in executor storage per call (the storage-residue class the
    # r5 rplsh_pairs/ngram fixes removed).
    batch_bands = simhash_bands(simhash_sketch(batch))
    idx_bands = spark.read.parquet(f"{index_path}/bands")
    a = idx_bands.unionByName(batch_bands).alias("a")  # index ∪ today
    b = batch_bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


#: per-sf_dir cache of built simhash-index paths (seeded state)
_SIMHASH_INDEX_PATHS: dict[str, str] = {}


def _simhash_index_for(spark: SparkSession, sf_dir: str) -> str:
    path = _SIMHASH_INDEX_PATHS.get(sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="simhash_index_")
        build_simhash_index(load_table(spark, sf_dir, "documents"), path)
        _SIMHASH_INDEX_PATHS[sf_dir] = path
    return path


@register(
    "dedup_incremental_simhash",
    oracle="WITH "
    + _SQL_SIMHASH
    + f"""
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
      AND b.doc_id >= {INCR_SPLIT}
    """,
    doc=(
        "Day-2 SimHash dedup: today's batch (doc_id >= 400) sketches and "
        "probes a PERSISTED band index of yesterday's corpus "
        "(build_simhash_index — bands carry the sketch, so Hamming "
        "computes on the candidate join with no join-back). Completes the "
        "incremental dedup trio alongside the exact-fingerprint and "
        "MinHash-LSH indexes; the oracle is the full-corpus simhash pair "
        "set restricted to pairs whose higher id is in the batch, proving "
        "the index probe loses nothing vs recompute. Plan-asserted: the "
        "only documents scan carries the pushed batch filter and the "
        "batch bands broadcast."
    ),
)
def dedup_incremental_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _simhash_index_for(spark, sf_dir)
    batch = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") >= INCR_SPLIT
    )
    return incremental_simhash_pairs(spark, batch, path)
