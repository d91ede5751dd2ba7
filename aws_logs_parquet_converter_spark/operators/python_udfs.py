"""Python UDF surface: grouped-agg pandas UDAF and Python UDTF.

Completes the UDF/UDAF/UDTF triple (SURVEY.md §2.2): scalar pandas UDF in
`multimodal.py` (`q_pandas_udf_score`), iterator `mapInPandas` in
`multimodal.py`, stateful `applyInPandasWithState` in `streaming/events.py`,
and here the remaining two shapes. The reference ships its per-line parser as
a pickled closure over an RDD (`s3_server_access_logs.py:157-228`) — these
are the modern Arrow-batched equivalents, used ONLY where native expressions
can't express the logic; everything SQL-expressible stays JVM-side.

Determinism: the UDAF reduces to exact int64 arithmetic (floor to cents,
integer sum — order-independent); the UDTF's split/strip semantics are
mirrored exactly by the DuckDB oracle (same separator, space-only strip).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf
from pyspark.sql.types import LongType

from ..catalog import load_table
from . import register


@F.pandas_udf(LongType())
def _floor_cents_total(v: pd.Series) -> int:
    """Exact order-independent reduction: floor each value to integer cents,
    sum as int64. (floor, not round: pandas .round() is half-to-even while
    SQL round() is half-away-from-zero — floor is identical everywhere.)"""
    import numpy as np

    return int(np.floor(v.to_numpy() * 100).astype("int64").sum())


@register(
    "q_pandas_udaf_cents",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events WHERE value IS NOT NULL GROUP BY user_id
    """,
    doc="Grouped-aggregate pandas UDAF (Arrow batch per group): per-user "
    "value total in exact integer cents.",
)
def q_pandas_udaf_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.groupBy("user_id").agg(_floor_cents_total("value").alias("total_cents"))


_SEP = " the "


@udtf(returnType="pos int, fragment string")
class _SplitOnThe:
    """1 row -> N rows: split text on a separator, keep non-empty fragments
    with their original part index. The table-function shape of the
    reference's s3_read_file (1 path -> many rows), minus the I/O."""

    def eval(self, text: str):  # noqa: D102
        for i, frag in enumerate((text or "").split(_SEP)):
            frag = frag.strip(" ")
            if frag:
                yield i, frag


@register(
    "q_udtf_text_split",
    oracle=f"""
    WITH parts AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, '{_SEP}'), 1) - 1 AS pos,
             unnest(string_split(text, '{_SEP}')) AS raw
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, CAST(pos AS INTEGER) AS pos, trim(raw, ' ') AS fragment
    FROM parts WHERE trim(raw, ' ') <> ''
    """,
    doc="Python UDTF via SQL LATERAL join: explode each document into "
    "separator-delimited fragments with their part index.",
)
def q_udtf_text_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("split_on_the", _SplitOnThe)
    load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100).createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.fragment "
        "FROM udtf_docs d, LATERAL split_on_the(d.text) s"
    )


def _fulfillment(orders: pd.DataFrame, lines: pd.DataFrame) -> pd.DataFrame:
    """Per-order fulfillment stats from the cogrouped (orders, lineitem) pair."""
    key = orders["o_orderkey"].iloc[0]
    if len(lines):
        first = lines["l_shipdate"].min()
        last = lines["l_shipdate"].max()
        days_to_first = (first - orders["o_orderdate"].iloc[0]).days
        span = (last - first).days
        n = len(lines)
    else:
        days_to_first, span, n = None, None, 0
    return pd.DataFrame(
        {
            "o_orderkey": [key],
            "n_lines": [n],
            "days_to_first_ship": [days_to_first],
            "ship_span_days": [span],
        }
    )


@register(
    "q_cogroup_fulfillment",
    oracle="""
    SELECT o.o_orderkey,
           CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
           CAST(date_diff('day', o.o_orderdate, MIN(l.l_shipdate)) AS BIGINT)
             AS days_to_first_ship,
           CAST(date_diff('day', MIN(l.l_shipdate), MAX(l.l_shipdate)) AS BIGINT)
             AS ship_span_days
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey < 1000
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    doc=(
        "Cogrouped applyInPandas (the last Pandas-API shape after scalar UDF, "
        "grouped UDAF, mapInPandas, applyInPandasWithState, UDTF): both "
        "relations hash-partition on the key, each key's pair of Arrow "
        "batches lands in one Python call. This logic IS SQL-expressible — "
        "registered as the API-surface demonstration with the relational "
        "oracle proving the cogroup path computes exactly the join+agg "
        "answer; reach for cogroup only when per-key logic needs real "
        "imperative Python (e.g. per-key model scoring over aligned "
        "series). Keyed on a small key range so the Python-side cost stays "
        "a demonstration, not a tax."
    ),
)
def q_cogroup_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 1000)
        .select("o_orderkey", "o_orderdate")
    )
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_shipdate")
    )
    return orders.groupBy("o_orderkey").cogroup(
        lines.groupBy("l_orderkey")
    ).applyInPandas(
        _fulfillment,
        schema="o_orderkey bigint, n_lines bigint, "
        "days_to_first_ship bigint, ship_span_days bigint",
    )
