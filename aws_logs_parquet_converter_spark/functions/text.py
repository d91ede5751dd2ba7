"""Shared text-hashing primitives with exact DuckDB-SQL twins.

Everything cross-engine here is built on md5 (the one hash both Spark and
DuckDB implement identically): a 60-bit integer hash is the first 15 hex chars
of md5, parsed base-16. Spark's native xxhash64/murmur3 are NOT portable to
DuckDB, so they are reserved for engine-internal use (salting, bucketing)
where no oracle comparison happens.

Each Spark expression builder has an ``sql_*`` twin producing the equivalent
DuckDB fragment, so operators keep both dialects in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"


def hash60(col: Column, seed: str = "") -> Column:
    """Deterministic 60-bit integer hash of a string (portable to DuckDB)."""
    payload = F.concat(F.lit(f"{seed}:"), col) if seed else col
    return F.conv(F.substring(F.md5(payload.cast("binary")), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str, seed: str = "") -> str:
    payload = f"'{seed}:' || ({expr})" if seed else f"({expr})"
    return f"CAST(('0x' || substr(md5({payload}), 1, 15)) AS BIGINT)"


# Universal-hash family derived from ONE md5 per input (16x fewer digest
# computations than seeding md5 per hash): split the 128-bit digest into two
# 60-bit halves (h1, h2) and take h_k = (h1 + k*h2') mod P. P is a prime near
# 2^40: k*h2' stays < 2^45, far from bigint overflow in either engine, and
# 40-bit hash space is ample for minhash signatures.
HASH_P = 1_099_511_627_689  # prime just above 2^40


def hash_family(col: Column, k: int) -> Column:
    """k-th universal hash of a string from a single md5 digest (portable)."""
    digest = F.md5(col.cast("binary"))
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % HASH_P
    h2 = F.conv(F.substring(digest, 16, 15), 16, 10).cast("bigint") % HASH_P
    return (h1 + F.lit(k) * h2) % HASH_P


def sql_hash_family(expr: str, k: int) -> str:
    return (
        f"((CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {HASH_P}) "
        f"+ {k} * (CAST(('0x' || substr(md5({expr}), 16, 15)) AS BIGINT) % {HASH_P})) % {HASH_P}"
    )


def tokens(text_col: Column) -> Column:
    """Lowercased word tokens (letters+digits runs)."""
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), 0)


def sql_tokens(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{TOKEN_PATTERN}')"
