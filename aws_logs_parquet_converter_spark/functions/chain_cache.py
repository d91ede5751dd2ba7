"""Per-session memo for parse-expression chains.

Building a log parser's Column tree costs ~150 py4j round trips
(~0.2-0.3 s measured for every format in the registry) and the tree is a
pure function of ``value_col`` — it never depends on the input DataFrame.
Batch queries pay that once, but the streaming foreachBatch paths rebuilt
it for EVERY micro-batch, a fixed ~0.3 s per trigger on top of the actual
work (guide §1: per-micro-batch fixed cost dominates the streaming legs
at bench scale). This decorator hoists the build: the Column objects are
constructed once per (SparkContext, value_col) and re-applied to each
micro-batch's frame — unresolved Columns are plain expression trees, so
re-use across DataFrames is exactly how Catalyst intends them to be used.

Keyed by ``applicationId`` so a stopped/restarted context (test suites
spin up several) never serves another context's objects by id() reuse.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame


def session_chain_cache(
    builder: Callable[[str], Callable[[DataFrame], DataFrame]],
) -> Callable[..., DataFrame]:
    """Turn ``builder(value_col) -> (lines -> parsed)`` into the public
    ``parse(lines, value_col="value")`` shape, memoizing the built chain
    per active SparkContext."""
    cache: dict[tuple[str | None, str], Callable[[DataFrame], DataFrame]] = {}

    @functools.wraps(builder)
    def parse(lines: DataFrame, value_col: str = "value") -> DataFrame:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        key = (sc.applicationId if sc is not None else None, value_col)
        fn = cache.get(key)
        if fn is None:
            fn = builder(value_col)
            cache[key] = fn
            if len(cache) > 16:  # drop chains from dead contexts
                for k in [k for k in cache if k[0] != key[0]]:
                    del cache[k]
        return fn(lines)

    return parse
