"""Local mirror of the driver's DuckDB-oracle correctness gate.

For every registered query with an oracle: run the Spark DataFrame program and
the DuckDB SQL on the same parquet tables, then compare row count, column
names, and order-insensitive values (columns sorted by name, rows sorted by
all columns) — stricter than the driver's hash, so passing here implies
passing there.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from aws_logs_parquet_converter_spark.catalog import TABLES
from aws_logs_parquet_converter_spark.operators import REGISTRY, _load_all

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")

_load_all()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return str([_canon_value(x) for x in v])
    return str(v)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make values comparable across engines
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates / decimals / arrays arrive as objects; stringify
            # deterministically. Array columns come back as numpy arrays
            # WITHOUT Arrow (vanilla sessions) but as Python lists WITH it —
            # canonicalize both to the list repr or sort order diverges
            # between engines.
            df[c] = df[c].map(_canon_value)
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, na_position="first").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, mirrors driver
        return
    duck_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
