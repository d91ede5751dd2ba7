"""Query/operator registry.

Every operator the engine claims is registered here as a named query:
a DataFrame-producing callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle SQL string computing the same result on the
same parquet tables. The driver contract (``__spark_entry__.py``) exposes this
registry directly; tests run the same comparison locally.

Cross-engine determinism rules used throughout (see tests/test_oracle_parity.py):

* Sums/averages of DOUBLE columns are computed over ``CAST(x AS DECIMAL(18,2))``
  in BOTH engines (exact decimal arithmetic, identical rounding of the same
  IEEE double inputs), then cast back to DOUBLE — bit-identical results
  regardless of summation order. Plain double sums would drift by ULPs between
  engines/partitionings.
* DuckDB ``SUM(integer)`` returns HUGEINT — oracles cast to BIGINT to match
  Spark's LongType.
* ``date_trunc`` returns TIMESTAMP in Spark but DATE in DuckDB for day+
  granularities — both sides cast explicitly.
* Deterministic hashing across engines uses md5 hex (available in both) taken
  as a 60-bit integer.
* Every top-k query carries a unique tiebreak key so LIMIT is well-defined.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the engine registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_loaded = False


def _load_all() -> None:
    """Import every operator module so registration side effects run."""
    global _loaded
    if _loaded:
        return
    from . import (  # noqa: F401
        advanced,
        dedup,
        graph,
        layouts,
        logetl,
        logformats,
        pipeline,
        profiling,
        python_udfs,
        relational,
        sampling,
        similarity,
        textops,
        tpch_more,
    )

    try:  # optional modules may arrive later
        from . import multimodal  # noqa: F401
    except ImportError:
        pass
    from ..streaming import events as _streaming_events

    _streaming_events._register_gate_queries()
    _loaded = True
