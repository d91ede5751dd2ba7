"""Invariant tests for the round-3 text operators.

The oracle parity suite proves Spark==DuckDB; these prove the operators
uphold their structural contracts:

* pre-tokenizer: the GPT-2-style split PARTITIONS the text — concatenating
  the pieces reproduces the input byte-for-byte (no char lost or doubled),
  for arbitrary hypothesis strings (pure-Python re; pattern-logic level)
  AND for the whole documents corpus through Spark (Java-regex level).
* chunking: every token lands in >=1 chunk; chunks are CHUNK_TOKENS wide
  except the last; consecutive chunks advance by CHUNK_STRIDE.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.operators.textops import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    _PRETOKEN,
)

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=9, max_codepoint=126), max_size=300
)


@given(ascii_text)
@settings(max_examples=300, deadline=None)
def test_pretokenizer_partitions_text(s):
    pieces = re.findall(_PRETOKEN, s)
    assert "".join(pieces) == s


def test_pretokenizer_partitions_corpus_in_spark(spark):
    from aws_logs_parquet_converter_spark.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    pieces = F.regexp_extract_all(F.col("text"), F.lit(_PRETOKEN), 0)
    bad = d.where(F.array_join(pieces, "") != F.col("text")).count()
    assert bad == 0


def test_chunking_covers_every_token(spark):
    from aws_logs_parquet_converter_spark.operators.textops import (
        text_chunk_sliding,
    )
    from aws_logs_parquet_converter_spark.catalog import load_table
    from aws_logs_parquet_converter_spark.functions.text import tokens

    sf = "/root/testdata/sf0.01"
    chunks = text_chunk_sliding(spark, sf)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_id").alias("max_id"),
            F.min("n_tokens").alias("min_len"),
            F.max("n_tokens").alias("max_len"),
            F.sum(
                F.when(F.col("n_tokens") != CHUNK_TOKENS, 1).otherwise(0)
            ).alias("n_partial"),
        )
        .collect()
    )
    doc_len = {
        r.doc_id: r.n
        for r in load_table(spark, sf, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    for r in per_doc:
        n = doc_len[r.doc_id]
        assert r.n_chunks == r.max_id + 1  # chunk ids dense from 0
        # every token covered: last chunk reaches the end of the doc
        assert (r.n_chunks - 1) * CHUNK_STRIDE + r.max_len >= n or r.max_len == CHUNK_TOKENS
        last_len = n - (r.n_chunks - 1) * CHUNK_STRIDE
        assert r.min_len == min(CHUNK_TOKENS, last_len)
        assert r.n_partial <= 1  # at most the final chunk is short
