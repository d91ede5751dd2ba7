"""Text-analysis operators over the ``documents`` table.

Language-ID heuristics, quality scoring, token counting, fingerprinting —
all as native JVM expressions (regexp_extract_all / length / case-when), no
Python UDFs: at 100 TB the text pass must stay inside whole-stage codegen.

Cross-engine notes: token counts use ``regexp_extract_all`` + length, which
Java regex and DuckDB's RE2 evaluate identically for the character classes
used here; ratios divide integers into IEEE doubles (exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

_WS_TOKEN = r"\S+"
# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation marks
_BPE_TOKEN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
_STOPWORDS = r"\b(the|and|of|to|a|in|is|for|on|with)\b"


def _n_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_chars,
           CAST(len(regexp_extract_all(text, '{_WS_TOKEN}')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_TOKEN}')) AS INTEGER) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS INTEGER) AS n_punct
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish regex tokens + punctuation.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        _n_matches(t, _WS_TOKEN).alias("n_ws_tokens"),
        _n_matches(t, _BPE_TOKEN).alias("n_bpe_tokens"),
        _n_matches(t, "[.!?,;:]").alias("n_punct"),
    )


@register(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_STOPWORDS}')) AS INTEGER) AS n_stopwords,
           (CAST(len(regexp_extract_all(lower(text), '{_STOPWORDS}')) AS DOUBLE)
            / NULLIF(len(regexp_extract_all(text, '{_WS_TOKEN}')), 0)) AS stopword_ratio,
           (CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
            / NULLIF(LENGTH(text), 0)) AS punct_ratio,
           CASE WHEN LENGTH(text) >= 100
                 AND len(regexp_extract_all(text, '{_WS_TOKEN}')) >= 20
                 AND (CAST(len(regexp_extract_all(lower(text), '{_STOPWORDS}')) AS DOUBLE)
                      / NULLIF(len(regexp_extract_all(text, '{_WS_TOKEN}')), 0)) > 0.01
                THEN 'keep' ELSE 'filter' END AS quality_gate
    FROM documents
    """,
    doc="Quality scoring: stopword/punct ratios + keep/filter gate.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_stop = _n_matches(F.lower(t), _STOPWORDS)
    n_tok = _n_matches(t, _WS_TOKEN)
    n_punct = _n_matches(t, "[.!?,;:]")
    stop_ratio = n_stop.cast("double") / F.nullif(n_tok, F.lit(0))
    punct_ratio = n_punct.cast("double") / F.nullif(F.length(t), F.lit(0))
    gate = F.when(
        (F.length(t) >= 100) & (n_tok >= 20) & (stop_ratio > 0.01), "keep"
    ).otherwise("filter")
    return d.select(
        "doc_id",
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        gate.alias("quality_gate"),
    )


_LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|that|it|was|for)\b",
    "de": r"\b(der|die|das|und|nicht|ist|ich|sie|mit|ein)\b",
    "fr": r"\b(le|la|les|et|est|une|que|pour|dans|pas)\b",
    "es": r"\b(el|los|las|y|es|una|que|por|con|para)\b",
}


@register(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                WHEN de >= fr AND de >= es THEN 'de'
                WHEN fr >= es THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM (
      SELECT doc_id, lang,
             len(regexp_extract_all(lower(text), '{_LANG_STOPWORDS["en"]}')) AS en,
             len(regexp_extract_all(lower(text), '{_LANG_STOPWORDS["de"]}')) AS de,
             len(regexp_extract_all(lower(text), '{_LANG_STOPWORDS["fr"]}')) AS fr,
             len(regexp_extract_all(lower(text), '{_LANG_STOPWORDS["es"]}')) AS es
      FROM documents
    )
    """,
    doc="Heuristic language-ID: stopword-hit argmax over en/de/fr/es, fixed tiebreak order.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    hits = {lang: _n_matches(low, pat) for lang, pat in _LANG_STOPWORDS.items()}
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    predicted = (
        F.when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return d.select("doc_id", "lang", predicted.alias("predicted_lang"))


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_full,
           md5(lower(regexp_replace(text, '[^0-9A-Za-z]+', '', 'g'))) AS md5_normalized
    FROM documents
    """,
    doc="Document fingerprinting: raw digest + normalization-insensitive digest.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    norm = F.lower(F.regexp_replace(t, "[^0-9A-Za-z]+", ""))
    return d.select(
        "doc_id",
        F.md5(t.cast("binary")).alias("md5_full"),
        F.md5(norm.cast("binary")).alias("md5_normalized"),
    )


@register(
    "text_top_terms",
    oracle="""
    SELECT term, COUNT(*) AS n
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
          FROM documents)
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 50
    """,
    doc=(
        "Corpus heavy hitters: explode lowercase letter-run tokens, count, "
        "top-50. The explode is a narrow per-row expand; the count gets "
        "map-side partial aggregation so the shuffle carries one row per "
        "distinct term per partition, not per token — at 100 TB the "
        "distinct-term set (Zipf-bounded) is what crosses the wire, and "
        "top-50 is TakeOrderedAndProject, never a global sort."
    ),
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(50)
    )


@register(
    "text_repetition",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY doc_id, term)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct_terms,
           CAST(MAX(c) AS BIGINT) AS max_term_freq,
           (CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT)) AS distinct_ratio,
           (CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT)) AS max_term_ratio
    FROM tf GROUP BY doc_id
    """,
    doc=(
        "Repetition quality signals (Gopher-style): distinct-token ratio "
        "and top-term mass per doc. Entirely row-level — ZERO shuffles: "
        "sort the token array once, then max term frequency is the longest "
        "equal-run via a struct-accumulator fold over adjacent-equality "
        "flags, and distinct count is array_distinct. The alternative "
        "explode -> (doc,term) count -> per-doc rollup plan shuffles token "
        "rows twice; this version measured 1.5x faster at bench scale and "
        "scales embarrassingly parallel. Ratios are integer/integer IEEE "
        "divisions — exact in both engines (the oracle computes the same "
        "quantities relationally; results are plan-independent)."
    ),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import spread_input

    d = spread_input(load_table(spark, sf_dir, "documents"))
    w = F.array_sort(F.split(F.col("text"), " "))
    step1 = d.select("doc_id", w.alias("w"))
    n = F.size(F.col("w"))
    m = F.greatest(n - 1, F.lit(0))
    eqs = F.zip_with(
        F.slice(F.col("w"), 1, m),
        F.slice(F.col("w"), 2, m),
        lambda x, y: (x == y).cast("int"),
    )
    acc0 = F.struct(F.lit(1).cast("int").alias("cur"), F.lit(1).cast("int").alias("best"))

    def merge(acc, e):
        nxt = F.when(e == 1, acc["cur"] + 1).otherwise(F.lit(1))
        return F.struct(nxt.alias("cur"), F.greatest(acc["best"], nxt).alias("best"))

    fold = F.aggregate(eqs, acc0, merge)
    return step1.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.col("w"))).cast("long").alias("n_distinct_terms"),
        F.when(n > 0, fold["best"]).otherwise(F.lit(0)).cast("long").alias("max_term_freq"),
    ).select(
        "*",
        (F.col("n_distinct_terms").cast("double") / F.col("n_tokens")).alias("distinct_ratio"),
        (F.col("max_term_freq").cast("double") / F.col("n_tokens")).alias("max_term_ratio"),
    )


@register(
    "text_doc_freq",
    oracle="""
    SELECT term, COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
          FROM documents)
    GROUP BY term
    """,
    doc=(
        "Document-frequency table (the df half of TF-IDF; idf = ln(N/df) "
        "is a one-column map the caller applies — kept out of the contract "
        "because ln() is not bit-identical across libm builds). Distinct "
        "per (term, doc) is array_distinct PER ROW before the explode — "
        "the shuffle then carries each (term, doc) pair once, and no "
        "global count-distinct state is needed: a plain count aggregates "
        "the pre-deduped pairs."
    ),
)
def text_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
                )
            ).alias("term"),
        )
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH tainted AS (
      SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-0199 from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IPV4_RE}', '<IP>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS INTEGER) AS n_ips
    FROM tainted
    """,
    doc=(
        "PII redaction: emails, North-American phone patterns, and IPv4 "
        "addresses replaced with typed placeholder tokens, plus per-doc "
        "redaction counts for audit. The synthetic corpus contains no PII, "
        "so the query first plants deterministic doc_id-derived PII — both "
        "engines build the identical tainted string, then scrub it, making "
        "the redaction itself the thing under test. Three chained "
        "regexp_replaces stay native JVM expressions (one projection, no "
        "shuffle, no Python); phone runs before IPv4 so the digit-group "
        "patterns can't partially overlap. The regexes use only syntax "
        "Java regex and DuckDB's RE2 evaluate identically (classes, "
        "bounded repeats, word boundaries)."
    ),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tainted = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-0199 from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(tainted, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IPV4_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        _n_matches(tainted, _EMAIL_RE).alias("n_emails"),
        _n_matches(tainted, _PHONE_RE).alias("n_phones"),
        _n_matches(tainted, _IPV4_RE).alias("n_ips"),
    )


@register(
    "text_extract_structured",
    oracle=r"""
    SELECT doc_id,
           regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS emails,
           regexp_extract_all(text, 'https?://[^\s]+') AS urls,
           regexp_extract_all(text, '[0-9]{4}-[0-9]{2}-[0-9]{2}') AS iso_dates,
           CAST(len(regexp_extract_all(text, '[0-9]+(\.[0-9]+)?')) AS INTEGER) AS n_numbers
    FROM documents
    """,
    doc=(
        "Structured-entity extraction: emails / URLs / ISO dates as array "
        "columns plus a numeric-literal count — the inverse of "
        "text_pii_scrub (that op redacts; this one harvests, e.g. for link "
        "graphs or contactability audits). Pure per-row regexp_extract_all "
        "in codegen: no shuffle, no Python, arrays stay columnar for "
        "downstream explode/dedup."
    ),
)
def text_extract_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), 0).alias("emails"),
        F.regexp_extract_all(t, F.lit(r"https?://[^\s]+"), 0).alias("urls"),
        F.regexp_extract_all(t, F.lit(r"[0-9]{4}-[0-9]{2}-[0-9]{2}"), 0).alias("iso_dates"),
        F.size(F.regexp_extract_all(t, F.lit(r"[0-9]+(\.[0-9]+)?"), 0)).alias("n_numbers"),
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (RAG / context-window packing prep)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks

from ..functions.text import sql_tokens, tokens  # noqa: E402


@register(
    "text_chunk_sliding",
    oracle=f"""
    WITH d AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    nn AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
    c AS (SELECT doc_id, toks,
                 unnest(range(0, 1 + (greatest(n - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE})) AS chunk_id
          FROM nn)
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(list_slice(toks, chunk_id*{CHUNK_STRIDE}+1,
                               chunk_id*{CHUNK_STRIDE}+{CHUNK_TOKENS})) AS INTEGER) AS n_tokens,
           md5(array_to_string(list_slice(toks, chunk_id*{CHUNK_STRIDE}+1,
                                          chunk_id*{CHUNK_STRIDE}+{CHUNK_TOKENS}), ' ')) AS chunk_md5
    FROM c
    """,
    doc=(
        "Sliding-window chunking: 32-token chunks, stride 24 (8-token "
        "overlap) — the RAG-indexing / context-packing prep step. "
        "sequence+explode per row, slice per chunk: fully narrow, zero "
        "shuffles, no Python; chunk count per doc is "
        "1 + ceil(max(n-32,0)/24) so every token lands in >=1 chunk and "
        "the final partial chunk is kept. Chunks surface as md5 + token "
        "count (compact, hashable contract; the text itself would bloat "
        "the comparison without adding coverage)."
    ),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens(F.col("text")).alias("toks")).where(
        F.size("toks") > 0
    )
    last_chunk = F.expr(
        f"(greatest(size(toks) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1}) DIV {CHUNK_STRIDE}"
    )
    piece = F.expr(f"slice(toks, chunk_id*{CHUNK_STRIDE}+1, {CHUNK_TOKENS})")
    return (
        base.select(
            "doc_id", "toks", F.explode(F.sequence(F.lit(0), last_chunk)).alias("chunk_id")
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size(piece).alias("n_tokens"),
            F.md5(F.array_join(piece, " ").cast("binary")).alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# GPT-2-style pre-tokenizer piece statistics
# ---------------------------------------------------------------------------

# The GPT-2/tiktoken pre-tokenizer split, minus the \s+(?!\S) lookahead
# (RE2 — the oracle's engine — has no lookahead; for piece COUNTING the
# simplified trailing-whitespace handling is equivalent on all inputs
# without a trailing-space/letter boundary corner). ASCII classes instead
# of \p{L}/\p{N}: identical in Java regex and RE2.
_PRETOKEN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


@register(
    "text_pretokenize",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             regexp_extract_all(text, '{_PRETOKEN.replace("'", "''")}') AS pieces,
             len(regexp_extract_all(text, '\\S+')) AS n_words
      FROM documents)
    SELECT doc_id,
           CAST(len(pieces) AS INTEGER) AS n_pieces,
           CAST(len(list_filter(pieces, x -> regexp_matches(x, '^ ?[A-Za-z]+$'))) AS INTEGER) AS n_word_pieces,
           CAST(len(list_filter(pieces, x -> regexp_matches(x, '^ ?[0-9]+$'))) AS INTEGER) AS n_number_pieces,
           CAST(len(list_filter(pieces, x -> regexp_matches(x, '^'''))) AS INTEGER) AS n_contraction_pieces,
           CAST(CASE WHEN n_words > 0
                THEN CAST(len(pieces) AS DOUBLE) / n_words ELSE NULL END AS DOUBLE) AS fertility
    FROM p
    """,
    doc=(
        "Token-budget estimation with the GPT-2 pre-tokenizer split "
        "(contractions / space-prefixed letter runs / digit runs / "
        "punctuation runs / whitespace): piece counts by class plus "
        "fertility = pieces per whitespace word — the cost model for "
        "context-window packing and per-doc pricing. One "
        "regexp_extract_all per row in codegen; class counts are "
        "filter-lambdas over the piece array (no re-scan of the text)."
    ),
)
def text_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.col("text"), F.lit(_PRETOKEN), 0)
    n_words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    base = d.select("doc_id", pieces.alias("pieces"), n_words.alias("n_words"))

    def n_class(pat: str) -> Column:
        return F.size(F.filter(F.col("pieces"), lambda x: x.rlike(pat)))

    return base.select(
        "doc_id",
        F.size("pieces").alias("n_pieces"),
        n_class("^ ?[A-Za-z]+$").alias("n_word_pieces"),
        n_class("^ ?[0-9]+$").alias("n_number_pieces"),
        n_class("^'").alias("n_contraction_pieces"),
        F.when(
            F.col("n_words") > 0,
            F.size("pieces").cast("double") / F.col("n_words"),
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# Lexical retrieval (BM25-family scoring, deterministic rational idf)
# ---------------------------------------------------------------------------

_LEX_TERMS = ("vector", "join", "stream")
_LEX_K1, _LEX_B = 1.2, 0.75


@register(
    "text_lexical_topk",
    oracle=f"""
    WITH d AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 CAST(SUM(len(toks)) AS DOUBLE) AS sum_len,
                 {', '.join(f"CAST(SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}" for i, t in enumerate(_LEX_TERMS))}
          FROM d),
    scored AS (
      SELECT d.doc_id,
             ({' + '.join(
                f"((s.n_docs - s.df{i} + 0.5) / (s.df{i} + 0.5))"
                f" * (CAST(len(list_filter(d.toks, x -> x = '{t}')) AS DOUBLE) * ({_LEX_K1} + 1))"
                f" / (CAST(len(list_filter(d.toks, x -> x = '{t}')) AS DOUBLE)"
                f"    + {_LEX_K1} * (1 - {_LEX_B} + {_LEX_B} * CAST(len(d.toks) AS DOUBLE) / (s.sum_len / s.n_docs)))"
                for i, t in enumerate(_LEX_TERMS))}) AS score
      FROM d CROSS JOIN s)
    SELECT doc_id, rn FROM (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rn
      FROM scored) WHERE rn <= 20
    """,
    doc=(
        "Lexical retrieval: BM25-shaped scoring (k1=1.2, b=0.75, doc-length "
        "normalization vs corpus avgdl) for a fixed query-term set, top-20 "
        "by score. idf is the RATIONAL Robertson form (N-df+0.5)/(df+0.5) "
        "WITHOUT the log: ln() is not IEEE-specified and differs in the "
        "last ulp between the JVM and DuckDB's libm, which would flip "
        "tie-adjacent ranks; +,-,*,/ are exactly specified, so the whole "
        "score is bit-identical cross-engine. One corpus pass computes "
        "(N, avgdl, per-term df) in a single 1-row aggregate that "
        "broadcasts back over the corpus; per-doc term frequencies are "
        "array filters in codegen. At scale the stats row is metadata and "
        "the scan is one narrow pass — the classic two-phase "
        "collect-statistics-then-score retrieval plan."
    ),
)
def text_lexical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(F.size("toks")).cast("double").alias("sum_len"),
        *[
            F.sum(F.array_contains("toks", t).cast("int")).cast("double").alias(f"df{i}")
            for i, t in enumerate(_LEX_TERMS)
        ],
    )
    j = d.crossJoin(F.broadcast(stats))
    dl = F.size("toks").cast("double")
    avgdl = F.col("sum_len") / F.col("n_docs")
    def _tf(term: str) -> Column:
        # NB: one-arg lambda only — F.filter treats a two-arg lambda as
        # (element, index), so a `t=t` capture default would be shadowed
        # by the index column.
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term))).cast(
            "double"
        )

    score = None
    for i, t in enumerate(_LEX_TERMS):
        tf = _tf(t)
        idf = (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5)) / (
            F.col(f"df{i}") + F.lit(0.5)
        )
        term = (
            idf
            * (tf * F.lit(_LEX_K1 + 1))
            / (tf + F.lit(_LEX_K1) * (F.lit(1 - _LEX_B) + F.lit(_LEX_B) * dl / avgdl))
        )
        score = term if score is None else score + term
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        j.select("doc_id", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("doc_id", "rn")
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve
# ---------------------------------------------------------------------------

_VOCAB_SIZES = (8, 16, 24)


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({sql_tokens('text')}) AS tok FROM documents),
    tf AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
    ranked AS (
      SELECT tok, n,
             row_number() OVER (ORDER BY n DESC, tok) AS rnk,
             SUM(n) OVER (ORDER BY n DESC, tok
                          ROWS UNBOUNDED PRECEDING) AS cum_n,
             SUM(n) OVER () AS total_n
      FROM tf)
    SELECT CAST(v.v AS INTEGER) AS vocab_size,
           CAST(r.cum_n AS BIGINT) AS covered_tokens,
           CAST(r.total_n AS BIGINT) AS total_tokens,
           CAST(r.cum_n AS DOUBLE) / r.total_n AS coverage
    FROM (SELECT unnest([{', '.join(str(v) for v in _VOCAB_SIZES)}]) AS v) v
    JOIN ranked r ON r.rnk = v.v
    """,
    doc=(
        "Vocabulary coverage curve: for top-V corpus vocabularies "
        f"(V in {_VOCAB_SIZES}) the exact fraction of all token "
        "occurrences covered — the tokenizer-vocab sizing / OOV-rate "
        "curve. One explode + one hash aggregate builds the term-frequency "
        "table (map-side combine: shuffle is |vocab|-sized, not "
        "corpus-sized), then a single-partition window over the TINY "
        "vocab table ranks and cumulates. Exact integer counts; the "
        "coverage division is IEEE-exact cross-engine."
    ),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = tf.select(
        "tok",
        "n",
        F.row_number().over(w).alias("rnk"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_n"),
        F.sum("n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total_n"),
    )
    sizes = F.explode(F.array(*[F.lit(v) for v in _VOCAB_SIZES])).alias("vocab_size")
    vs = spark.range(1).select(sizes)
    return (
        F.broadcast(vs)
        .join(ranked, vs["vocab_size"] == ranked["rnk"])
        .select(
            F.col("vocab_size").cast("int").alias("vocab_size"),
            F.col("cum_n").alias("covered_tokens"),
            F.col("total_n").alias("total_tokens"),
            (F.col("cum_n").cast("double") / F.col("total_n")).alias("coverage"),
        )
    )


@register(
    "text_bpe_merges",
    oracle=f"""
    WITH d AS (SELECT {sql_tokens('text')} AS toks FROM documents),
    p AS (SELECT toks, unnest(range(1, len(toks))) AS pos FROM d),
    big AS (SELECT toks[pos] || ' ' || toks[pos+1] AS pair FROM p)
    SELECT pair, COUNT(*) AS n FROM big
    GROUP BY pair ORDER BY n DESC, pair LIMIT 30
    """,
    doc=(
        "BPE merge-candidate mining: corpus-wide counts of ADJACENT token "
        "pairs (not distinct-per-doc — BPE ranks by occurrence), top-30 "
        "with a total-order tiebreak. This is one iteration of the "
        "byte-pair-encoding training loop's pair-statistics step at token "
        "granularity; re-running it after applying the top merge trains "
        "the vocabulary. Bigrams come from two shifted slices fused with "
        "zip_with (same zero-shuffle trick as shingle_array); the count "
        "gets map-side partial aggregation, so the shuffle carries one "
        "row per distinct pair per partition — Zipf-bounded, not "
        "corpus-sized — and top-30 is TakeOrderedAndProject."
    ),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = d.select(toks.alias("toks")).where(F.size("toks") >= 2)
    m = F.size("toks") - 1
    a = F.slice("toks", 1, m)
    b = F.slice("toks", 2, m)
    pairs = F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(" "), y))
    return (
        base.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Cross-source shingle-overlap matrix (contamination across sources)
# ---------------------------------------------------------------------------


def _source_overlap_oracle() -> str:
    from .dedup import _SQL_SHINGLES

    return (
        "WITH "
        + _SQL_SHINGLES
        + """,
        ss AS (SELECT DISTINCT dd.source, sh.shingle
               FROM sh JOIN documents dd ON dd.doc_id = sh.doc_id),
        sizes AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
        pairs AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 COUNT(*) AS n_common
          FROM ss a JOIN ss b
            ON a.shingle = b.shingle AND a.source < b.source
          GROUP BY a.source, b.source)
        SELECT p.source_a, p.source_b,
               CAST(p.n_common AS BIGINT) AS n_common,
               CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
               CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) AS jaccard
        FROM pairs p
        JOIN sizes sa ON sa.source = p.source_a
        JOIN sizes sb ON sb.source = p.source_b
        """
    )


@register(
    "text_source_overlap",
    oracle=_source_overlap_oracle(),
    doc=(
        "Cross-source contamination matrix: pairwise 3-token-shingle "
        "overlap between sources (|A∩B|, set sizes, Jaccard) — the "
        "mixture-design diagnostic for 'are these two crawls the same "
        "content?'. Per-source distinct shingle sets come from one "
        "explode + distinct (shuffle keyed on (source, shingle)); the "
        "pair counts are a shingle-keyed inverted-index equi-join (the "
        "same shape as dedup's candidate stage, so AQE handles hot "
        "boilerplate shingles); the 20-row size table broadcasts back. "
        "Shuffle volume is vocabulary-bounded, never corpus-bounded."
    ),
)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingle_array

    d = load_table(spark, sf_dir, "documents")
    ss = (
        d.select("source", F.explode(shingle_array(F.col("text"))).alias("sh"))
        .distinct()
    )
    sizes = ss.groupBy("source").agg(F.count("*").alias("n"))
    a = ss.alias("a")
    b = ss.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
